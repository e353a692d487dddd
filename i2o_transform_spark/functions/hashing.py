"""Content hashing: deterministic ids, shingles, minhash, simhash.

The reference generates surrogate keys with engine identity columns /
ROW_NUMBER (MSSQL/OMOPLoader.sql:347-426, 1561) — non-resumable and
single-node.  At 10^12 rows we use *content-derived* ids instead: xxhash64 of
the natural-key tuple is deterministic across retries, partitions and cluster
sizes (SURVEY.md §1.3).

Minhash/simhash primitives back the near-duplicate operators
(operators/dedup.py).  All column-level; zero Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# Distinct seeds for the minhash permutation family; any fixed odd constants
# work — these are arbitrary but frozen so signatures are stable.
MINHASH_SEED_BASE = 0x9E3779B1


def stable_hash(*cols: Column | str, seed: int = 42) -> Column:
    """xxhash64 of the given columns — deterministic surrogate key."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*cs, F.lit(seed))


def content_id(*cols: Column | str) -> Column:
    """Non-negative content-derived id (hash-of-natural-key, SURVEY §1.3)."""
    return F.pmod(stable_hash(*cols), F.lit(2**62)).cast("long")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingle strings over whitespace tokens.

    Documents shorter than ``n`` tokens yield a single shingle of the whole
    text so they still participate in similarity joins.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    k = F.size(toks)
    return F.when(k <= n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - F.lit(n)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def minhash_signature(shingle_arr: Column, num_hashes: int = 32) -> Column:
    """Array of ``num_hashes`` minhash values over a shingle array.

    h_i(x) = xxhash64(x, seed_i); signature[i] = min over shingles.
    Pure built-ins: transform + array_min — one pass, no shuffle.

    NB: seeds are bound via a closure factory, NOT lambda default args — a
    default arg changes the lambda arity and Spark would pass the array
    index as the extra parameter.
    """

    def _hash_at(i: int):
        return lambda s: F.xxhash64(s, F.lit(MINHASH_SEED_BASE + i))

    return F.array(
        *[
            F.array_min(F.transform(shingle_arr, _hash_at(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: array of ``bands`` bucket keys, each hashing
    ``rows_per_band`` consecutive signature entries.  Two docs collide in a
    band iff that band's slice matches exactly."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )


def simhash64(shingle_arr: Column) -> Column:
    """64-bit SimHash over a shingle array, as pure column expressions.

    For each bit b: sum over shingles of (+1 if bit set else -1); the result
    bit is 1 iff the sum is positive.  Expressed as 64 aggregate expressions
    over the array — heavy on expression count but fully JVM-vectorized and
    shuffle-free.
    """
    hashed = F.transform(shingle_arr, lambda s: F.xxhash64(s, F.lit(7)))

    def _vote_at(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sum_terms = []
    for b in range(64):
        vote = F.aggregate(hashed, F.lit(0).cast("long"), _vote_at(b))
        # bit 63 of a signed long is the sign bit: 1<<63 overflows, use its
        # two's-complement value
        bit_val = (1 << b) if b < 63 else -(1 << 63)
        bit_sum_terms.append(
            F.when(vote > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_sum_terms[0]
    for t in bit_sum_terms[1:]:
        out = out + t
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Arrow-vectorized signature UDFs — the throughput path.
#
# The pure-expression variants above are correct but Catalyst evaluates
# higher-order functions (transform/aggregate) interpreted per element: 32
# hash passes per shingle never reach codegen and run ~50x slower than the
# numpy formulation below.  Per input_hint, vectorized pandas/Arrow UDFs are
# the sanctioned escape hatch — one Arrow batch in, numpy matrix math inside.
# ---------------------------------------------------------------------------

def _py_shingles(text: str, n: int) -> list[str]:
    """Python mirror of shingles(): whitespace word n-grams, whole-text
    fallback for short docs."""
    toks = (text or "").split()
    if len(toks) <= n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _perm_coeffs(num_hashes: int, seed: int = 42):
    rs = np.random.RandomState(seed)
    a = rs.randint(1, 2**62, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rs.randint(0, 2**62, size=num_hashes, dtype=np.uint64)
    return a, b


def make_minhash_udf(n: int = 3, num_hashes: int = 32):
    """pandas_udf: text -> minhash signature (array<long>).

    Shingle -> one 64-bit base hash (pandas' vectorized cython hasher) ->
    ``num_hashes`` universal-hash permutations as a single numpy matrix op
    (uint64 wrap-around multiply-add) -> per-permutation min.
    """
    a, b = _perm_coeffs(num_hashes)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        err = np.seterr(over="ignore")
        try:
            for t in texts:
                sh = sorted(set(_py_shingles(t, n)))
                h = pd.util.hash_array(np.array(sh, dtype=object))
                m = h[None, :] * a[:, None] + b[:, None]
                out.append(m.min(axis=1).astype(np.int64))
        finally:
            np.seterr(**err)
        return pd.Series(out)

    return sig


def make_simhash_udf(n: int = 3):
    """pandas_udf: text -> 64-bit simhash (long), numpy bit-plane voting."""
    from pyspark.sql.functions import pandas_udf

    bitpos = np.arange(64, dtype=np.uint64)

    @pandas_udf(LongType())
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = sorted(set(_py_shingles(t, n)))
            h = pd.util.hash_array(np.array(sh, dtype=object))
            bits = (h[:, None] >> bitpos[None, :]) & np.uint64(1)  # (n, 64)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            packed = np.uint64(0)
            for i in range(64):
                if votes[i] > 0:
                    packed |= np.uint64(1) << np.uint64(i)
            out.append(np.int64(packed.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return sig
