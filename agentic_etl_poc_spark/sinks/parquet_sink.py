"""Parquet sink — the engine-native load path (extension beyond the
reference's csv/postgres pair).

The reference's sinks are a single CSV file and a Postgres table
(reference: etl_agent/templates.py:135-140); at the 100 TB design ceiling
the landing format is partitioned parquet: distributed write (one file per
task, no single-file funnel), ``partition_by`` for partition-pruned
downstream scans, append/overwrite semantics from the DataFrameWriter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    key_cols: list[str] | None = None,
) -> str:
    if mode == "upsert":
        return upsert_parquet(df, path, key_cols or [], partition_by or [])
    n = df.count()
    if partition_by:
        # cluster rows by the partition columns first — otherwise every
        # upstream task writes a sliver into every partition directory
        # (tasks x partitions tiny files); see upsert_parquet for the
        # at-scale width variant
        from pyspark.sql import functions as F

        df = df.repartition(*[F.col(c) for c in partition_by])
    w = df.write.mode("overwrite" if mode == "replace" else mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return f"wrote {n:,} rows to {path} (parquet)"


def upsert_parquet(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_by: list[str],
) -> str:
    """Copy-on-write MERGE into a hive-partitioned parquet table — the
    lakehouse upsert (what Delta/Iceberg/Hudi call COW ``MERGE INTO``),
    built on plain parquet so it runs on any Spark deployment with zero
    extra jars (Delta/Iceberg are absent here; this is the portable
    equivalent the jdbc_sink docstring points at for the 100 TB target).

    Protocol (mirrors the stage+merge split of the JDBC upsert,
    reference etl_agent/tools.py:83-96, re-expressed for a file table):

    1. **Prune**: the touched partitions are the DISTINCT partition
       values in the batch — a driver-side list (partition counts are
       small by definition; the rows never leave the cluster).
    2. **Merge read**: the target is read WITH a partition filter on the
       touched values, so the scan prunes to exactly the partitions
       being replaced — at 100 TB this is the difference between reading
       3 partitions and reading the table.
    3. **Survivors**: target rows in touched partitions whose key does
       NOT appear in the batch (left_anti on ``key_cols``) survive; the
       batch supplies every other row (update = replaced, insert = new).
    4. **Stage write**: survivors ∪ batch is written partitioned to a
       stage directory sibling of the target — fully distributed, one
       file per task, never through the driver.
    5. **Commit**: each touched ``col=value`` directory is swapped into
       the target by rename (new partitions just move in).  Untouched
       partitions are never read, written, or touched — their files and
       mtimes are provably unchanged (p13's oracle pins this count).

    Contract: exactly ONE partition column (compose a synthetic key for
    multi-column layouts), and a row's partition value must be stable
    per key — a key that migrates partitions between batches would
    escape the pruned anti-join (the same assumption every
    partition-pruned lakehouse MERGE makes).  Single writer per table:
    the swap is atomic per partition directory, not per table — a real
    lakehouse gets table-level atomicity from a metadata commit log,
    which is exactly the piece this portable path trades away."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from agentic_etl_poc_spark import plan_capture

    if not key_cols:
        raise ValueError("parquet upsert requires load.key_cols")
    if len(partition_by) != 1:
        raise ValueError(
            "parquet upsert requires exactly one load.partition_by column "
            "(compose a synthetic partition key for multi-column layouts)"
        )
    pcol = partition_by[0]
    spark = df.sparkSession

    if not os.path.exists(path):
        n = df.count()
        # cluster by the partition column before the partitioned write:
        # without it every upstream task writes a sliver into every
        # partition directory (tasks x partitions tiny files — the
        # small-file problem compact_parquet exists to undo).  One
        # shuffle, one file per partition here; at scale use
        # repartition(n_files_per_partition, pcol) for width.
        df.repartition(F.col(pcol)).write.mode("overwrite").partitionBy(
            pcol
        ).parquet(path)
        return f"upserted {n:,} rows into {path} (parquet COW: bootstrap)"

    # count BEFORE the commit: a batch whose lineage read the target
    # would recompute over swapped files afterwards
    batch_rows = df.count()
    touched = [r[0] for r in df.select(pcol).distinct().collect()]
    if not touched:
        return f"upserted 0 rows into {path} (parquet COW: empty batch)"
    if any(v is None for v in touched):
        # hive encodes a null partition as __HIVE_DEFAULT_PARTITION__,
        # which the isin-pruned merge read would silently miss — refuse
        # rather than lose the anti-join against those rows
        raise ValueError(
            f"parquet upsert batch has NULL {pcol!r} partition values; "
            "the partition column must be non-null"
        )
    target = spark.read.parquet(path).filter(F.col(pcol).isin(touched))
    survivors = target.join(
        df.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    out = survivors.unionByName(df)
    plan_capture.note("parquet_upsert_merge", out)

    parent = os.path.dirname(path.rstrip("/")) or "."
    stage = tempfile.mkdtemp(prefix="upsert_stage_", dir=parent)
    # sweep crash residue from an earlier interrupted commit: the
    # retired-partition dirs are dot-prefixed (invisible to Spark's
    # listing, to partition_signatures, and to this table's readers),
    # so leftovers are harmless — but don't let them accumulate
    for d in os.listdir(path):
        if d.startswith(".precommit_"):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    try:
        # same clustering rule as the bootstrap write (see above)
        out.repartition(F.col(pcol)).write.mode("overwrite").partitionBy(
            pcol
        ).parquet(stage)
        n = 0
        for d in sorted(os.listdir(stage)):
            if not d.startswith(f"{pcol}="):
                continue
            src_dir = os.path.join(stage, d)
            dst_dir = os.path.join(path, d)
            if os.path.exists(dst_dir):
                # retire the old partition under a DOT-PREFIXED name: a
                # crash between the two renames must leave residue that
                # every reader (Spark listing, partition_signatures,
                # the next upsert's merge read) ignores — a bare
                # 'yr=V__precommit' would be discovered as a partition
                # and poison the table with stale duplicate rows
                old = os.path.join(path, ".precommit_" + d)
                os.rename(dst_dir, old)
                os.rename(src_dir, dst_dir)
                shutil.rmtree(old)
            else:
                os.rename(src_dir, dst_dir)
            n += 1
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return (
        f"upserted {batch_rows:,} rows into {path} "
        f"(parquet COW: {n} partitions rewritten)"
    )


def verify_parquet(
    spark: SparkSession,
    path: str,
    min_rows: int = 1,
    nonnull_cols: list[str] | None = None,
) -> dict:
    """Post-load verification of the parquet artifact: re-read what was
    WRITTEN (not the in-memory frame) and check rows / not-null — the
    same artifact-first contract as verify_csv (reference:
    etl_agent/ops.py:49-109), minus the line-count fast path (parquet
    footers make the full check cheap)."""
    if not os.path.exists(path):
        return {"status": False, "error": f"path_not_found: {path}"}
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    cols = [c for c in (nonnull_cols or []) if c in df.columns]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("int")).alias(f"nulls_{c}"))
    row = df.agg(*aggs).collect()[0]
    rows = row["rows"]
    nonnull_ok = all(row[f"nulls_{c}"] == 0 for c in cols)
    status = rows >= min_rows and nonnull_ok
    out = {"rows": rows, "nonnull_ok": nonnull_ok, "status": status}
    if not status:
        out["error"] = (
            f"rows {rows} < min_rows {min_rows}" if rows < min_rows
            else "null values in " + ",".join(c for c in cols if row[f"nulls_{c}"])
        )
    return out


def partition_signatures(path: str, pcol: str) -> dict[str, tuple]:
    """Filesystem signature of every ``pcol=value`` partition directory:
    ``{dir_name: (sorted data filenames, max mtime_ns)}``.

    This is the poor-man's change feed for a plain-parquet table: Spark
    writes fresh UUID part names per job, so a rewritten partition
    ALWAYS changes signature and an untouched one provably cannot.
    ``upsert_parquet``'s commit swaps whole partition directories, which
    makes the signature the exact commit granularity — a downstream
    incremental consumer diffs two snapshots and reads only the changed
    partitions (what Delta's change-data-feed or partition-mtime
    pipelines do; at 100 TB the signature set is one row per partition,
    kilobytes, driver-side by design)."""
    sig: dict[str, tuple] = {}
    if not os.path.isdir(path):
        return sig
    for d in os.listdir(path):
        if not d.startswith(pcol + "="):
            continue
        p = os.path.join(path, d)
        files = sorted(f for f in os.listdir(p) if not f.startswith(("_", ".")))
        mt = max(
            (os.stat(os.path.join(p, f)).st_mtime_ns for f in files),
            default=0,
        )
        sig[d] = (tuple(files), mt)
    return sig


def changed_partitions(
    path: str, pcol: str, since: dict[str, tuple]
) -> list[str]:
    """Partition VALUES (the part after ``pcol=``) whose directory
    signature differs from the ``since`` snapshot — new partitions
    count as changed.  The incremental-consume primitive paired with
    ``partition_signatures``."""
    now = partition_signatures(path, pcol)
    return sorted(
        d[len(pcol) + 1 :]
        for d, s in now.items()
        if since.get(d) != s
    )
