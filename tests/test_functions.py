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


def test_doc_chunking_covers_every_token(spark):
    """Chunking invariants on real tiny data: (1) chunk starts advance by
    the stride; (2) every token position is covered by some chunk; (3) the
    reconstruction from stride-aligned chunk prefixes equals the original
    token stream; (4) only the last chunk may be short."""
    from i2o_transform_spark.queries import _CHUNK_S, _CHUNK_W, QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["ta_doc_chunking"](spark, sf).collect()
    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        rebuilt: list[str] = []
        for c in chunks:
            got = c.chunk_text.split(" ") if c.chunk_text else []
            start = c.chunk_idx * _CHUNK_S
            assert got == toks[start : start + _CHUNK_W]
            assert c.chunk_tokens == len(got)
            rebuilt = rebuilt[:start] + got
        assert rebuilt == toks  # full coverage, no token lost
        short = [c for c in chunks if c.chunk_tokens < _CHUNK_W]
        assert all(c is chunks[-1] for c in short)  # only the tail is short


def test_bpe_merges_vs_python_counter(spark):
    """Top-20 BPE pair counts == a brute-force python Counter over the same
    corpus (vocab-weighted aggregation is an optimization, not a semantic
    change)."""
    from collections import Counter

    from i2o_transform_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["ta_bpe_merges"](spark, sf).collect()
    c: Counter = Counter()
    for r in spark.read.parquet(f"{sf}/documents.parquet").collect():
        for w in r.text.strip().split():
            for i in range(len(w) - 1):
                c[f"{w[i]} {w[i + 1]}"] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.pair, r.n) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == want


def test_span_dedup_planted_copies_fully_flagged(spark):
    """Planted exact copies (doc_id%7) must appear with dup_ratio 1.0 on
    both the copy and its source; a doc with no duplicated spans must not
    appear."""
    from i2o_transform_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r.doc_id: r for r in QUERIES["dd_span_dedup"](spark, sf).collect()}
    docs = [r.doc_id for r in
            spark.read.parquet(f"{sf}/documents.parquet").collect()]
    planted = [d for d in docs if d % 7 == 0]
    assert planted
    for d in planted:
        assert rows[d].dup_ratio == 1.0
        assert rows[d + 1000000].dup_ratio == 1.0
        assert rows[d].n_windows == rows[d].dup_windows


def _py_bpe_train(words: dict[str, int], n_merges: int):
    """Pure-python BPE reference (leftmost-first non-overlapping merge,
    lexicographic tie-break) — ground truth for functions/bpe.bpe_train."""
    vocab = {w: list(w) for w in words}

    def merge_word(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in vocab.items():
            f = words[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {w: merge_word(s, *best) for w, s in vocab.items()}
    return merges, vocab


def test_bpe_train_vs_python_reference(spark):
    """Distributed merge loop == pure-python BPE on a corpus with merge
    interactions (repeated chars, overlapping candidates, ties)."""
    from i2o_transform_spark.functions.bpe import bpe_train

    words = {
        "aaaa": 10, "aaab": 8, "banana": 7, "bandana": 5,
        "low": 5, "lower": 2, "lowest": 6, "newer": 3, "wider": 3,
        "x": 1,
    }
    vocab = spark.createDataFrame(list(words.items()), "word string, freq long")
    got = bpe_train(vocab, n_merges=15)
    want, _ = _py_bpe_train(words, 15)
    assert got == want


def test_bpe_segment_matches_training_state(spark):
    """Segmenting the training words with the learned merges reproduces the
    training-time final symbol state (rank-order apply == iterative
    rewrite), and every word round-trips losslessly."""
    from i2o_transform_spark.functions.bpe import bpe_segment, bpe_train

    words = {"banana": 4, "bandana": 3, "ban": 5, "nab": 2, "aaaa": 6}
    vocab = spark.createDataFrame(list(words.items()), "word string, freq long")
    merges = bpe_train(vocab, n_merges=8)
    want_state = {w: _py_bpe_train(words, 8)[1][w] for w in words}
    docs = spark.createDataFrame([(w,) for w in words], "text string")
    got = {r.text: list(r.bpe_tokens) for r in bpe_segment(docs, merges).collect()}
    assert got == want_state
    for w, toks in got.items():
        assert "".join(toks) == w


def test_bpe_first_merge_equals_top_pair_query(spark):
    """bpe_train iteration 1 == the oracled ta_bpe_merges rank-1 pair on
    the same tiny corpus."""
    from i2o_transform_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    top = QUERIES["ta_bpe_merges"](spark, sf).orderBy("rank").first()
    train = QUERIES["ta_bpe_train"](spark, sf).orderBy("rank").first()
    assert f"{train.left} {train.right}" == top.pair


def test_z_value_matches_python_morton(spark):
    """Bit interleave == a python Morton reference on hand-picked and
    boundary values (bounds exactly representable, no normalization loss)."""
    from i2o_transform_spark.functions.zorder import z_value

    # bounds 0..255 with bits=8: scale factor is exact (255*255/255)
    rows = [(0, 0), (255, 255), (1, 2), (170, 85), (255, 0), (0, 255), (37, 200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            z_value(["x", "y"], [0, 0], [255, 255], bits=8).alias("z"),
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)


def test_zorder_layout_tightens_both_dims(spark):
    """The point of Z-ordering: after zorder_by on (x, y), every output
    partition's min/max envelope is tight on BOTH dimensions (so min/max
    stats prune scans for predicates on EITHER column); a plain range sort
    on x leaves the y envelope spanning the full value range.  Metric: the
    mean per-partition span fraction per dimension — the expected fraction
    of partitions a uniform point predicate on that dimension fails to
    prune."""
    import random

    from pyspark.sql import functions as F

    from i2o_transform_spark.functions.zorder import zorder_by

    rng = random.Random(11)
    n, parts = 4096, 16
    rows = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")

    def mean_spans(d):
        stats = (
            d.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        fx = sum((r.sx + 1) / 1024 for r in stats) / len(stats)
        fy = sum((r.sy + 1) / 1024 for r in stats) / len(stats)
        return fx, fy

    zx, zy = mean_spans(zorder_by(df, ["x", "y"], parts))
    lx, ly = mean_spans(
        df.repartitionByRange(parts, "x").sortWithinPartitions("x")
    )
    # 1-D clustering: tight on x, hopeless on y
    assert lx < 0.2 and ly > 0.9, (lx, ly)
    # z-order: BOTH dimensions simultaneously bounded (quadrant-sized
    # envelopes, modulo partitions straddling a z-boundary)
    assert zx < 0.55 and zy < 0.55, (zx, zy)


def test_z_value_rejects_sign_bit_overflow(spark):
    """bits*k > 63 would flip codes negative (or wrap the Java shift
    amount) and silently corrupt the layout — must raise instead."""
    import pytest

    from i2o_transform_spark.functions.zorder import z_value

    with pytest.raises(ValueError, match="63"):
        z_value(["a", "b", "c", "d"], [0] * 4, [255] * 4, bits=16)
    # 4 cols x 15 bits = 60 -> fine
    z_value(["a", "b", "c", "d"], [0] * 4, [255] * 4, bits=15)


def test_zorder_by_empty_input_is_noop(spark):
    from i2o_transform_spark.functions.zorder import zorder_by

    df = spark.createDataFrame([], "x long, y long")
    out = zorder_by(df, ["x", "y"], 4)
    assert out.count() == 0 and out.columns == ["x", "y"]


def test_bpe_segment_ascii_whitespace_boundaries_match_vocab(spark):
    """Word boundaries must match word_vocab's Java \\s+ (ASCII) split: a
    NBSP inside a 'word' stays INSIDE the word for both training and
    segmentation, and the character-lossless roundtrip holds on messy
    unicode input."""
    from i2o_transform_spark.functions.bpe import bpe_segment, bpe_train, word_vocab

    texts = ["a\u00a0b a\u00a0b xy", "xy\tza  za\r\nxy"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    vocab = word_vocab(docs)
    words = {r.word for r in vocab.collect()}
    assert "a\u00a0b" in words  # NBSP is not a separator
    merges = bpe_train(vocab, n_merges=5)
    seg = {r.text: list(r.bpe_tokens) for r in bpe_segment(docs, merges).collect()}
    for t, toks in seg.items():
        # lossless modulo ASCII whitespace: every non-ws char survives
        import re

        expect = "".join(re.split(r"\s+", t, flags=re.ASCII))
        assert "".join(toks) == expect, (t, toks)


# --- property-based tests (hypothesis) ---------------------------------------


def test_bpe_train_property_random_corpora(spark):
    """Property: for random word/freq vocabularies, the distributed merge
    loop equals the pure-python BPE reference (ties, repeats, interacting
    merges all covered by generation)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    vocab_st = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=12)

    @given(words=vocab_st)
    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    def prop(words):
        from i2o_transform_spark.functions.bpe import bpe_train

        vocab = spark.createDataFrame(
            list(words.items()), "word string, freq long"
        )
        got = bpe_train(vocab, n_merges=6)
        want, _ = _py_bpe_train(words, 6)
        assert got == want, (words, got, want)

    prop()


def test_z_value_property_random_points(spark):
    """Property: z_value == python Morton for random in-range points and
    clamps out-of-range points to the edge cells."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        pts=st.lists(
            st.tuples(st.integers(-50, 300), st.integers(-50, 300)),
            min_size=1, max_size=20,
        )
    )
    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    def prop(pts):
        from i2o_transform_spark.functions.zorder import z_value

        df = spark.createDataFrame(pts, "x long, y long")
        got = [
            r.z for r in df.select(
                z_value(["x", "y"], [0, 0], [255, 255], bits=8).alias("z")
            ).collect()
        ]

        def morton(x, y):
            x = min(255, max(0, x))
            y = min(255, max(0, y))
            z = 0
            for i in range(8):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        assert got == [morton(x, y) for x, y in pts]

    prop()
