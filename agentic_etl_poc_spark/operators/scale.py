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


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into right-sized files — the small-file
    compaction every streaming/incremental sink eventually needs (each
    micro-batch or tick appends its own files; thousands of tiny files
    ruin scan planning and open-cost at scale).

    Sizing comes from the CURRENT on-disk bytes; ``sort_by`` additionally
    clusters rows within each output file (sortWithinPartitions — no
    global shuffle) so downstream scans get better min/max pruning on
    those columns.  The rewrite goes through a temp dir + atomic-ish swap
    so a crash never leaves the directory half-compacted."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    files = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_files_before = len(files)
    n_out = max(1, total_bytes // target_file_bytes)

    df = spark.read.parquet(path)
    df = df.repartition(int(n_out))
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)

    parent = os.path.dirname(path.rstrip("/")) or "."
    tmp = tempfile.mkdtemp(prefix="compact_", dir=parent)
    old = path.rstrip("/") + "__precompact"
    try:
        df.write.mode("overwrite").parquet(tmp)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    except Exception:
        if os.path.exists(old) and not os.path.exists(path):
            os.rename(old, path)  # roll back
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    n_files_after = len(
        [f for f in os.listdir(path) if f.startswith("part-")]
    )
    return {
        "files_before": n_files_before,
        "files_after": n_files_after,
        "bytes": total_bytes,
    }


ZORDER_BITS = 16


def zorder_key(*cols: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into a single Z-order (Morton) key.

    Sorting/range-partitioning by this key clusters rows so that files
    are simultaneously tight in EVERY interleaved dimension — min/max
    parquet pruning then skips files for predicates on any of the
    columns, not just the leading sort column.  This is the layout trick
    (Delta/Iceberg call it Z-ORDER) for the 100 TB fact table that gets
    filtered by ts one hour and by user_id the next.

    Callers pre-normalize: each column should already be a bounded
    non-negative int (bucket timestamps to epoch-minutes, hash strings
    to ints, etc.).  Values wider than ``bits`` cluster by their low
    bits only.  Pure bit arithmetic, JVM-side, whole-stage-codegen.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet range-partitioned AND sorted by the
    Z-order key of ``cols`` — every output file covers a compact Z-range,
    i.e. a small rectangle in the keyspace, so min/max stats prune on
    all ``cols`` (verified against a row-order layout in
    tests/test_scale.py).  repartitionByRange samples the key (one extra
    pass) — at 100 TB, reuse persisted bounds or bucket the key instead
    of re-sampling every write."""
    z = zorder_key(*[F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
