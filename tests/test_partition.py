"""Graph partition planning (operators/partition): portable bucket,
strategy invariants (grid replication bound, src-locality, hub spread),
and report consistency."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.operators.partition import (
    bucket,
    bucket_sql,
    plan_partitions,
)


@pytest.fixture(scope="module")
def edges(spark):
    # star into hub 'h' (in-degree 40) + a sparse ring of 20 low-degree
    # vertices — the adversarial shape for 1D src-hash layouts
    rows = [(f"s{i}", "h") for i in range(40)]
    rows += [(f"r{i}", f"r{(i + 1) % 20}") for i in range(20)]
    return spark.createDataFrame(rows, "src string, dst string").cache()


def test_bucket_matches_md5_nibbles(spark):
    df = spark.createDataFrame(
        [("s1",), ("p42",), ("hello",), ("",)], "x string"
    ).select("x", bucket(F.col("x"), 7).alias("b"))
    for x, b in df.collect():
        assert b == int(hashlib.md5(x.encode()).hexdigest()[:4], 16) % 7


def test_bucket_sql_twin_matches(spark):
    import duckdb

    vals = ["s1", "p42", "hello"]
    got = dict(
        spark.createDataFrame([(v,) for v in vals], "x string")
        .select("x", bucket(F.col("x"), 13).alias("b"))
        .collect()
    )
    for v, b in duckdb.sql(
        f"SELECT x, {bucket_sql('x', 13)} AS b FROM (VALUES ('s1'),"
        "('p42'),('hello')) t(x)"
    ).fetchall():
        assert got[v] == b


def test_report_shape_and_edge_conservation(edges):
    rep = {r["strategy"]: r for r in plan_partitions(edges, parts=16).collect()}
    assert set(rep) == {"src_hash", "grid_2d", "hybrid_degree"}
    for r in rep.values():
        assert r["edges"] == 60
        # 40 spoke srcs + hub + 20 ring vertices = 61 distinct endpoints
        assert r["vertices"] == 61


def test_grid_replication_bound(edges):
    rep = {r["strategy"]: r for r in plan_partitions(edges, parts=16).collect()}
    # 2D grid: replicas per vertex <= R + C - 1 = 7, regardless of degree
    assert rep["grid_2d"]["max_replicas"] <= 7
    # 1D src hash: the hub (in-degree 40) mirrors wherever its sources
    # land — far beyond the grid bound on 16 parts
    assert rep["src_hash"]["max_replicas"] > 7


def test_hybrid_spreads_hub_load(edges):
    rep = {r["strategy"]: r
           for r in plan_partitions(edges, parts=16,
                                    hub_threshold=8).collect()}
    # dst-hash would put all 40 hub in-edges in ONE part (667k ppm of 60);
    # hybrid reroutes edges into hubs by src hash, so the straggler bound
    # must drop well below that
    assert rep["hybrid_degree"]["max_load_ppm"] < 400_000
