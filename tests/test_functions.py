"""Unit vectors from FIXTURES.md §B6 — scalar function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2o_transform_spark.functions.text import (
    codelist_explode,
    path_segment,
    prefix_strip,
    truncate_source_value,
)
from i2o_transform_spark.functions.textstats import (
    doc_fingerprint,
    predicted_lang,
    token_count,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_path_segment(spark):
    # stringpart('\A\B\C\','\',2)='B' (MSSQL/OMOPLoader.sql:259-282)
    df = spark.createDataFrame([("\\A\\B\\C\\",)], ["p"])
    row = df.select(
        path_segment("p", 1).alias("s1"),
        path_segment("p", 2).alias("s2"),
        path_segment("p", 3).alias("s3"),
    ).collect()[0]
    assert (row.s1, row.s2, row.s3) == ("A", "B", "C")


def test_prefix_strip(spark):
    # 'ICD9:250.00' -> '250.00'; no-colon passthrough; only FIRST colon
    df = spark.createDataFrame(
        [("ICD9:250.00",), ("nocolon",), ("a:b:c",)], ["c"]
    )
    got = [r.v for r in df.select(prefix_strip("c").alias("v")).collect()]
    assert got == ["250.00", "nocolon", "b:c"]


def test_codelist_explode(spark):
    df = spark.createDataFrame(
        [("'01','02'",), ("",), (None,), ("'x'",)], ["cl"]
    )
    got = df.select(codelist_explode("cl").alias("v")).collect()
    assert [r.v for r in got] == [["01", "02"], [], [], ["x"]]


def test_truncate50(spark):
    df = spark.createDataFrame([("x" * 80,)], ["t"])
    assert len(df.select(truncate_source_value("t").alias("v")).collect()[0].v) == 50


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("  ",), ("one",)], ["t"])
    got = [r.v for r in df.select(token_count("t").alias("v")).collect()]
    assert got == [3, 0, 1]


def test_predicted_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog",),       # en
            ("el perro y la casa que",),    # es
            ("der hund und die katze",),    # de
            ("xyzzy plugh",),               # no evidence -> default en
        ],
        ["t"],
    )
    got = [r.v for r in df.select(predicted_lang("t").alias("v")).collect()]
    assert got == ["en", "es", "de", "en"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",)], ["t"]
    )
    a, b = [r.v for r in df.select(doc_fingerprint("t").alias("v")).collect()]
    assert a == b  # whitespace + case normalized before hashing


# --- batch-vectorized signature UDF equivalence -------------------------------


def _ref_minhash_one(text, n, a, b):
    """Per-doc reference formulation (pre-vectorization r01 implementation)."""
    import numpy as np
    import pandas as pd

    from i2o_transform_spark.functions.hashing import _py_shingles

    sh = sorted(set(_py_shingles(text, n)))
    h = pd.util.hash_array(np.array(sh, dtype=object))
    with np.errstate(over="ignore"):
        m = h[None, :] * a[:, None] + b[:, None]
    return m.min(axis=1).astype(np.int64)


def _ref_simhash_one(text, n):
    import numpy as np
    import pandas as pd

    from i2o_transform_spark.functions.hashing import _py_shingles

    sh = sorted(set(_py_shingles(text, n)))
    h = pd.util.hash_array(np.array(sh, dtype=object))
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    packed = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            packed |= np.uint64(1) << np.uint64(i)
    return int(np.int64(packed.astype(np.int64)))


def test_batched_signatures_bit_identical(spark):
    """VERDICT r01 #4: the whole-batch flatten/reduceat formulation must be
    bit-identical to the per-doc formulation on messy real-ish docs."""
    import numpy as np
    import pandas as pd

    from i2o_transform_spark.functions.hashing import (
        _batch_shingle_hashes,
        _perm_coeffs,
        make_minhash_udf,
        make_simhash_udf,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "one two",                       # short doc -> whole-text shingle
        "",                              # empty doc
        "solo",                          # 1 token
        "a b c",                         # == n tokens -> whole-text shingle
        "a b c d",                       # exactly one extra
        "repeat repeat repeat repeat repeat",   # duplicate shingles
        "tab\tseparated words here stay  split on any whitespace",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    a, b = _perm_coeffs(32)
    mh = make_minhash_udf(n=3, num_hashes=32)
    sh = make_simhash_udf(n=3)
    got = {
        r.id: (list(r.sig), r.sim)
        for r in df.select(
            "id", mh(df.t).alias("sig"), sh(df.t).alias("sim")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i][0] == list(_ref_minhash_one(t, 3, a, b)), f"minhash doc {i}"
        assert got[i][1] == _ref_simhash_one(t, 3), f"simhash doc {i}"
    # and the batch helper segments line up: one segment per doc
    h, segs = _batch_shingle_hashes(pd.Series(texts), 3)
    assert len(segs) == len(texts) and segs[0] == 0
    assert np.all(np.diff(segs) >= 1)
