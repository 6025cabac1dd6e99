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
) -> str:
    n = df.count()
    w = df.write.mode("overwrite" if mode == "replace" else mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return f"wrote {n:,} rows to {path} (parquet)"


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
