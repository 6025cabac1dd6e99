"""Scale-out join strategies: bucketed co-location and skew salting.

The reference runs single-process DuckDB over pandas and needs neither
(reference: etl_agent/templates.py:79-121 — one process, no partitions).
On a 1000-executor cluster both are load-bearing:

- **Bucketing** pre-shuffles a table ONCE at write time (``bucketBy`` on
  the join key).  Any later equi-join or aggregation on that key reads
  co-located buckets and skips its exchange entirely — the write-once,
  join-many amortization that matters when the same 100 TB fact table is
  joined every hour.
- **Salting** spreads ONE pathologically hot key across N reducer
  partitions: the fact side gets a deterministic per-row salt in [0, N),
  the dim side is replicated N times, and the join key becomes
  (key, salt).  AQE's skew-join splitting (enabled in session.py) handles
  moderate skew automatically; explicit salting is the escape hatch for
  the "one key is 30% of the table" case where even a split partition
  won't fit an executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__salt"


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort_key: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Equi-joins and groupBys on ``bucket_key`` between tables bucketed with
    the SAME bucket count then require no shuffle (and with ``sort_key``,
    no sort) — verified by plan assertion in tests/test_scale.py.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_key:
        w = w.sortBy(sort_key)
    w.saveAsTable(table_name, format="parquet")


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def salt_column(*cols: Column, parts: int) -> Column:
    """Deterministic per-row salt in [0, parts): a hash of arbitrary
    row-varying columns (NOT the hot key itself, which is constant within
    the skewed group)."""
    return F.pmod(F.xxhash64(*cols), F.lit(parts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: list[str],
    parts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` to a small-ish ``dim`` on ``key`` with the fact
    side salted across ``parts`` partitions per key.

    ``salt_from`` names fact columns whose hash spreads rows of the same
    hot key (e.g. a row id).  The dim side is exploded ``parts``-fold —
    keep dims small relative to the cluster, or broadcast instead.
    Result equals the plain join exactly (salt columns are internal).
    """
    salted_fact = fact.withColumn(
        SALT_COL, salt_column(*[F.col(c) for c in salt_from], parts=parts)
    )
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(parts - 1)).cast("array<int>"))
    )
    out = salted_fact.join(replicated_dim, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)
