"""N-gram language-model quality scoring — the CCNet-style perplexity
filter of web-scale training-data pipelines.

A reference-corpus n-gram LM scores every candidate document; low scores
flag out-of-domain / low-quality / wrong-language text.  Spark-first shape:

* **Training is one pass of map-side-combining aggregations** — trigram /
  bigram / unigram counts over the reference slice (the distributed twin of
  KenLM's count phase).  The shuffle moves one row per DISTINCT n-gram,
  never per token.
* **Scoring never touches the token stream twice**: per-document trigram
  multiplicities are aggregated first (again map-side combining), each
  DISTINCT trigram is scored once against the count tables via
  key-partitioned equi-joins (AQE broadcasts them when vocabulary-sized),
  and the per-doc score is one final hash aggregation.  Work is
  O(distinct trigrams), not O(corpus positions) — the property that keeps
  the join side sub-linear at 100 TB.
* **Stupid backoff** (Brants et al. 2007 — the large-scale choice precisely
  because it needs no normalization pass): s = c3/c2p, backing off to
  0.4 * c2/c1p, then 0.4^2 * c1/N.

Scores are **integer-quantized** (ratios scaled by 1e6 with integer
division, backoff factors as exact integer arithmetic) so the result is
bit-reproducible across engines — the same exactness contract as the NB
classifier's integer weights; an SQL oracle reproduces every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1_000_000  # score quantization: ratios in millionths


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.split(F.trim(F.col(text_col)), r"\s+").alias("w")
    )


def _ngrams(toks: DataFrame, n: int, names: list[str]) -> DataFrame:
    """All order-n grams via one JVM-side transform over the carried token
    array — no window, no self-join, no Python."""
    fields = ", ".join(
        f"element_at(w, i + {j + 1}) AS {c}" for j, c in enumerate(names)
    )
    return (
        toks.where(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, size(w) - {n}), i -> struct({fields}))")
            ).alias("g"),
        )
        .select("doc_id", "g.*")
    )


def train_ngram_counts(
    reference_docs: DataFrame, text_col: str = "text"
) -> dict[str, DataFrame | int]:
    """Count tables of the reference-corpus LM: trigrams, bigrams, unigrams
    and the total token count.  Each is a single map-side-combining
    aggregation; shuffled rows = distinct n-grams."""
    toks = _tokens(reference_docs, text_col)
    tri = _ngrams(toks, 3, ["t1", "t2", "t3"]).groupBy("t1", "t2", "t3").agg(
        F.count("*").alias("c3")
    )
    bi = _ngrams(toks, 2, ["b1", "b2"]).groupBy("b1", "b2").agg(
        F.count("*").alias("c2")
    )
    uni = _ngrams(toks, 1, ["t"]).groupBy("t").agg(F.count("*").alias("c1"))
    total = uni.agg(F.sum("c1")).collect()[0][0] or 0
    return {"tri": tri, "bi": bi, "uni": uni, "total": int(total)}


def lm_quality_score(
    docs: DataFrame, counts: dict, text_col: str = "text"
) -> DataFrame:
    """Per-document quantized stupid-backoff quality:
    (doc_id, n_trigrams, score_sum, avg_q) — avg_q is the filter column
    (millionths; higher = closer to the reference corpus).  Documents with
    fewer than 3 tokens emit no row (no trigram evidence)."""
    dtri = (
        _ngrams(_tokens(docs, text_col), 3, ["t1", "t2", "t3"])
        .groupBy("doc_id", "t1", "t2", "t3")
        .agg(F.count("*").alias("k"))
    )
    dt = dtri.select("t1", "t2", "t3").distinct()

    tri, bi, uni, total = counts["tri"], counts["bi"], counts["uni"], counts["total"]
    scored = (
        dt.join(tri, ["t1", "t2", "t3"], "left")
        .join(
            bi.select(
                F.col("b1").alias("t1"), F.col("b2").alias("t2"),
                F.col("c2").alias("c2p"),
            ),
            ["t1", "t2"],
            "left",
        )
        .join(
            bi.select(
                F.col("b1").alias("t2"), F.col("b2").alias("t3"),
                F.col("c2").alias("c2s"),
            ),
            ["t2", "t3"],
            "left",
        )
        .join(uni.select(F.col("t").alias("t3"), F.col("c1").alias("c1s")),
              ["t3"], "left")
        .join(uni.select(F.col("t").alias("t2"), F.col("c1").alias("c1p")),
              ["t2"], "left")
    )
    scored = scored.withColumn(
        "q",
        F.when(F.col("c3").isNotNull(), F.expr(f"(c3 * {Q}) div c2p"))
        .when(
            F.col("c2s").isNotNull(),
            F.expr(f"(4 * ((c2s * {Q}) div c1p)) div 10"),
        )
        .when(
            F.col("c1s").isNotNull(),
            F.expr(f"(16 * ((c1s * {Q}) div {max(total, 1)})) div 100"),
        )
        .otherwise(F.lit(0)),
    ).select("t1", "t2", "t3", "q")

    return (
        dtri.join(scored, ["t1", "t2", "t3"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            F.sum(F.col("k") * F.col("q")).cast("long").alias("score_sum"),
        )
        .withColumn("avg_q", F.expr("score_sum div n_trigrams").cast("long"))
    )
