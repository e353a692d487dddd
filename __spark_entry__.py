"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship KG triple-extraction query at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 plus the
               training-data operators (dedup / similarity / text analysis /
               multimodal / KG), registered in i2o_transform_spark.queries.
oracle_sql() — matching DuckDB SQL for each query that is SQL-expressible;
               approximate/hash-family operators (minhash, simhash, LSH ANN)
               are rows-only here and verified in tests/ against exact
               ground truth instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from i2o_transform_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["kg_extract_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query."""
    return dict(ORACLES)
