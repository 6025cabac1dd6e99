"""Test-data table access: parquet star schema → temp views.

The driver's synthetic tables (TESTDATA.md) are the oracle-checked input
surface.  Registration is cheap (schema-only read; scans stay lazy) and
Catalyst prunes columns/pushes filters into the parquet scan, so registering
all tables per query costs nothing at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTENSION_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTENSION_TABLES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table as a DataFrame.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects outright.  DuckDB (the oracle) truncates ns → µs on read; we match
    it exactly: read nanos as long and truncate with integer division
    (``div`` keeps the math in int64 — a double division would lose precision
    above 2^53 ns).
    """
    from agentic_etl_poc_spark.session import ensure_semantics, tune_for_data

    ensure_semantics(spark)  # battery must be correct on ANY caller's session
    tune_for_data(spark, sf_dir)  # ...and sized to the data, not the default
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F, types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Only TIMESTAMP(NANOS) files surface ts as long under nanosAsLong;
        # an events table written at µs/ms precision arrives as a real
        # timestamp already and needs no truncation.
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = ALL_TABLES
) -> None:
    """Register tables as temp views so ``spark.sql`` can reference them
    by the same names the DuckDB oracle uses."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
