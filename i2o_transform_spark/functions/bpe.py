"""Byte-pair-encoding tokenizer training + segmentation, Spark-native.

The reference engine routes source values through config-driven code tables
(codelist parse/explode, MSSQL/OMOPLoader.sql:200-260); the LLM-pipeline
analogue is learning the code table itself from the corpus — BPE merge
training — and then applying it as a vectorized segmenter.

Scale design:

* Training never touches the corpus after the first aggregation: the corpus
  (10^12 docs) collapses to the word-frequency VOCAB in one map-side-combined
  hash agg (~10^6-10^7 rows for real text), and every merge iteration is two
  tiny jobs over that vocab — an adjacent-pair hash agg and a 1-row
  ``takeOrdered`` — plus a narrow higher-order-function rewrite (no UDF, no
  shuffle).  Lineage is truncated with ``localCheckpoint`` every few
  iterations so the plan stays O(1) deep.
* The chosen merge per iteration is a 1-row driver artifact (like a model
  checkpoint), not a data collect.
* Segmentation is the hot path (runs over the full corpus), so it is an
  Arrow-batched pandas UDF applying the learned ranks greedily per word with
  a word-level memo — one Python call per Arrow batch, vectorized hashing of
  repeated words via the memo dict (real corpora are Zipfian: the memo hit
  rate is the token frequency curve).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) vocabulary: the one corpus-wide aggregation
    of BPE training (whitespace pre-tokenization, as GPT-2-style BPE does
    before byte merges)."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_expr(syms, a: str, b: str):
    """Fold the symbol array, replacing adjacent (a, b) with a+b —
    leftmost-first non-overlapping, the standard BPE merge rule.  Pure
    higher-order function: JVM-side expression evaluation, no Python UDF,
    no serialization boundary."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) vocabulary.

    Returns the ordered merge list [(left, right), ...] — a small driver
    artifact (the tokenizer model).  Ties break lexicographically so the
    learned tokenizer is a pure function of the vocabulary (deterministic
    across runs/cluster sizes — the engine-wide reproducibility rule).
    """
    state = vocab.select(
        F.split(F.col(word_col), "").alias("syms"),
        F.col(freq_col).alias("freq"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        pairs = (
            state.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "a", "b").take(1)
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        state = state.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "freq"
        )
        if (it + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # apply the best-ranked merge at ALL its non-overlapping sites
        # (leftmost-first), matching the training-time rewrite
        a, b = syms[best_i], syms[best_i + 1]
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges to the corpus: text -> array of BPE tokens.

    Arrow-batched pandas UDF (the corpus-scale hot path); per-batch word
    memo exploits the Zipfian repeat rate so each distinct word is
    segmented once per batch, not once per occurrence.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    # the SAME word boundaries as word_vocab's Java `\s+` split: ASCII
    # whitespace only (Python str.split() would also split on Unicode
    # whitespace like NBSP, silently dropping characters the trained vocab
    # kept inside words — and breaking the char-lossless roundtrip gate)
    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf(ArrayType(StringType()))
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            out: list[str] = []
            for w in filter(None, ws.split(t or "")):
                toks = memo.get(w)
                if toks is None:
                    toks = _segment_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(one)

    return df.withColumn(out_col, seg(F.col(text_col)))
