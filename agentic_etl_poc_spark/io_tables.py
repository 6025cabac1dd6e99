"""Test-data table access: parquet star schema → temp views.

The driver's synthetic tables (TESTDATA.md) are the oracle-checked input
surface.  Registration is cheap (schema-only read; scans stay lazy) and
Catalyst prunes columns/pushes filters into the parquet scan, so registering
all tables per query costs nothing at runtime.
"""

from __future__ import annotations

import os
import weakref

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


#: Session-scoped LAZY DataFrame handles per (realpath, stat fingerprint)
#: — round-12 optimization: every ``spark.read.parquet`` call rebuilds a
#: file index + re-reads the footer schema (~0.25-0.5 s of driver-side
#: work), and the battery makes hundreds of ``table()`` calls per run
#: (register_views alone makes ten).  The memo stores the UNEXECUTED
#: plan handle only — no persist(), no data, nothing survives the
#: process — so every bench/oracle invocation still computes from the
#: parquet inputs; the fingerprint (mtime_ns + size) makes a rewritten
#: fixture read fresh.  Weak-keyed by the session object (the core.py
#: _SHARED discipline: ids can be reused after GC).
_HANDLES: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _stat_sig(path: str) -> tuple[int, int]:
    """(max mtime_ns, total size) over a parquet file or directory of
    part files — cheap (one stat per file) and regeneration-sensitive."""
    try:
        if os.path.isdir(path):
            mtime = 0
            size = 0
            for root, _, fs in os.walk(path):
                for f in fs:
                    if f.startswith(("_", ".")):
                        continue
                    st = os.stat(os.path.join(root, f))
                    mtime = max(mtime, st.st_mtime_ns)
                    size += st.st_size
            return mtime, size
        st = os.stat(path)
        return st.st_mtime_ns, st.st_size
    except OSError:
        return 0, 0


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
    per = _HANDLES.get(spark)
    if per is None:
        per = {}
        _HANDLES[spark] = per
    key = (os.path.realpath(path), _stat_sig(path))
    df = per.get(key)
    if df is not None:
        return df
    if name == "events":
        from pyspark.sql import functions as F, types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Only TIMESTAMP(NANOS) files surface ts as long under nanosAsLong;
        # an events table written at µs/ms precision arrives as a real
        # timestamp already and needs no truncation.
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    per[key] = df
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = ALL_TABLES
) -> None:
    """Register tables as temp views so ``spark.sql`` can reference them
    by the same names the DuckDB oracle uses."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
