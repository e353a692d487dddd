"""Term-dictionary encoding (operators/dictenc.py).

Dense ids must equal the naive global ROW_NUMBER exactly while planning
no single-partition stage; hash ids must round-trip the triples and the
collision audit must observe zero collisions on a real vocabulary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from i2o_transform_spark.operators.dictenc import (
    build_term_dictionary,
    collision_audit,
    decode_triples,
    encode_triples,
)


def _triples(spark):
    rows = [
        ("http://ex.org/a", "http://ex.org/p", "http://ex.org/b"),
        ("http://ex.org/a", "http://ex.org/p", 'lit with "quote"\n'),
        ("http://ex.org/b", "http://ex.org/q", "http://ex.org/a"),
        ("http://ex.org/b", "http://ex.org/q", "http://ex.org/a"),  # dup row
        ("http://ex.org/c", "http://ex.org/p", "\tweird\tliteral"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_dense_ids_equal_global_row_number(spark):
    t = _triples(spark)
    d = build_term_dictionary(t, method="dense", num_partitions=4)
    got = {r["term"]: r["term_id"] for r in d.collect()}
    terms = sorted(
        {v for r in t.collect() for v in (r["subj"], r["pred"], r["obj"])}
    )
    assert got == {term: i for i, term in enumerate(terms)}


def test_dense_ids_partition_count_invariant(spark):
    t = _triples(spark)
    one = sorted(map(tuple, build_term_dictionary(t, method="dense",
                                                  num_partitions=1).collect()))
    eight = sorted(map(tuple, build_term_dictionary(t, method="dense",
                                                    num_partitions=8).collect()))
    assert one == eight


def test_dense_plan_has_no_single_partition_stage(spark):
    t = _triples(spark)
    d = build_term_dictionary(t, method="dense", num_partitions=4)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_hash_roundtrip_and_join_free_encode(spark):
    t = _triples(spark)
    encoded = encode_triples(t)  # no dictionary
    plan = encoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan  # pure map
    d = build_term_dictionary(t, method="hash")
    back = decode_triples(encoded, d)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, t.collect())
    )


def test_dense_dictionary_encode_decode_roundtrip(spark):
    t = _triples(spark)
    d = build_term_dictionary(t, method="dense", num_partitions=3)
    encoded = encode_triples(t, d)
    assert encoded.columns == ["s_id", "p_id", "o_id"]
    mx = encoded.agg(F.max(F.greatest("s_id", "p_id", "o_id"))).first()[0]
    assert mx == d.count() - 1  # compact id space actually used
    back = decode_triples(encoded, d)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, t.collect())
    )


def test_collision_audit_counts(spark):
    t = _triples(spark)
    row = collision_audit(t).first()
    # 5 rows, dup row collapses; distinct terms: 3 subj + 2 pred + 4 obj
    # with overlap (a, b appear as subj and obj) -> count them exactly
    terms = {v for r in t.collect() for v in (r["subj"], r["pred"], r["obj"])}
    assert row["n_terms"] == len(terms)
    assert row["n_ids"] == len(terms)
    assert row["n_collisions"] == 0


def test_passthrough_columns_survive(spark):
    t = _triples(spark).withColumn("src", F.lit("crawl-1"))
    encoded = encode_triples(t)
    assert "src" in encoded.columns
    d = build_term_dictionary(t, method="hash")
    back = decode_triples(encoded, d)
    assert back.columns == ["subj", "pred", "obj", "src"]
    assert back.where(F.col("src") != "crawl-1").count() == 0


def test_unknown_method_raises(spark):
    t = _triples(spark)
    try:
        build_term_dictionary(t, method="sorted")
    except ValueError as e:
        assert "sorted" in str(e)
    else:
        raise AssertionError("expected ValueError")
