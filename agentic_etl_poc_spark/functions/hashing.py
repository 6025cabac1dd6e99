"""Cross-engine deterministic hashing & vector-math primitives.

The dedup / similarity batteries need hash functions and float reductions
that produce BIT-IDENTICAL results in Spark and in the DuckDB oracle.
Native hashes differ (Spark murmur3 vs DuckDB's internal hash), so:

- ``H(s)`` = first 12 hex chars of md5(s) as a 48-bit integer.  Both
  engines ship md5; 48 bits fits exact integer arithmetic everywhere
  (and stays below 2^53 so even a double round-trip can't corrupt it).
- MinHash permutations are ``(a*h + b) mod P`` with P = 2^31-1 and h
  pre-reduced mod P, keeping products < 2^62 (no int64 overflow).
- Float folds (dot products, norms) are SEQUENTIAL left-to-right
  double-precision folds in both engines — Spark ``aggregate`` HOF and
  DuckDB ``list_reduce`` both fold sequentially, so sums match bit-for-bit
  (never rely on SUM(double) across rows, whose order is engine-chosen).

Each primitive has a Spark Column builder and a DuckDB SQL-snippet builder
side by side so the two definitions can't drift apart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (pandas-UDF type hints resolve via module globals)
from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 - 1

#: MinHash permutation constants (fixed arbitrary odd multipliers < 2^31).
#: 12 permutations → 4 LSH bands of 3 rows.
MINHASH_PERMS: list[tuple[int, int, int]] = [
    (0, 1103515245, 12345),
    (1, 1234567891, 54321),
    (2, 1076767861, 98765),
    (3, 1500450271, 13579),
    (4, 2038074743, 24680),
    (5, 1257787007, 86420),
    (6, 1898288651, 11111),
    (7, 1645333507, 22222),
    (8, 1299709003, 33333),
    (9, 1982451653, 44444),
    (10, 1463294431, 55555),
    (11, 2147483629, 66666),
]
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 3


# ---------- Spark builders ----------

def md5_48(col: Column) -> Column:
    """48-bit integer hash of a string column (md5 hex prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def minhash_perm(h_mod_p: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h_mod_p + F.lit(b)) % F.lit(MERSENNE_P)


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/sqrt(norm_a*norm_b) — the exact formula the DuckDB
    snippet uses, so results are bit-identical."""
    return dot_fold(a, b) / F.sqrt(dot_fold(a, a) * dot_fold(b, b))


def _dot_fold_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized twin of ``dot_fold`` — BIT-IDENTICAL by construction.

    Per row the accumulation order is the same sequential left-to-right
    IEEE-double fold ``aggregate()`` performs (acc starts at 0.0, one
    rounded multiply then one rounded add per element, in element
    order); across rows each step is one NumPy vector op, so a batch of
    N pairs costs dim vector ops instead of N*dim interpreted Catalyst
    expression evaluations (the HOF fold is CodegenFallback).  float32
    inputs are widened to float64 first — exact, the same cast the HOF
    fold applies per element.  Pinned against the HOF fold by
    tests/test_fold_vectorized.py (bitwise, all pairs)."""
    if len(a) == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    av = np.vstack(a.to_numpy()).astype(np.float64, copy=False)
    bv = np.vstack(b.to_numpy()).astype(np.float64, copy=False)
    acc = np.zeros(av.shape[0], dtype=np.float64)
    for j in range(av.shape[1]):
        acc += av[:, j] * bv[:, j]
    return pd.Series(acc)


#: Lazily-built pandas UDF wrapper (the decorator parses its DDL return
#: type through the active session, so it cannot run at import time).
_DOT_FOLD_UDF = None


def dot_fold_vec(a: Column, b: Column) -> Column:
    """Arrow-vectorized sequential dot fold (see ``_dot_fold_pd``).

    Use ONLY in pair-scan filters where the fold runs once per candidate
    PAIR: there the per-row Arrow transfer (2 x dim doubles) is amortized
    by removing dim interpreted expression evaluations per row (guide
    §4.2/§4.3 — vectorize the per-batch work, cross the boundary in
    Arrow).  For per-document folds the JVM HOF is fine and avoids the
    Python boundary entirely."""
    global _DOT_FOLD_UDF
    if _DOT_FOLD_UDF is None:
        from pyspark.sql.types import DoubleType

        _DOT_FOLD_UDF = F.pandas_udf(_dot_fold_pd, DoubleType())
    return _DOT_FOLD_UDF(a, b)


# ---------- DuckDB snippet builders (oracle side) ----------

def duck_md5_48(expr: str) -> str:
    # lambda var deliberately obscure: `expr` may reference an OUTER lambda
    # variable (e.g. a position `i`), which a plain `i` here would shadow.
    return (
        "list_sum(list_transform(range(1, 13), "
        f"__h -> (strpos('0123456789abcdef', substr(md5({expr}), __h, 1)) - 1)::BIGINT "
        "* (1::BIGINT << (4 * (12 - __h)))))"
    )


def duck_dot_fold(a: str, b: str, dim: int) -> str:
    """Sequential double fold matching Spark's aggregate()."""
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        "(acc, x) -> acc + x)"
    )


def duck_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({duck_dot_fold(a, b, dim)} / "
        f"sqrt({duck_dot_fold(a, a, dim)} * {duck_dot_fold(b, b, dim)}))"
    )
