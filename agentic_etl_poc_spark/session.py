"""SparkSession factory with scale-aware defaults.

The reference engine (mounikavas/agentic-etl-poc) delegates execution to
in-process DuckDB over pandas frames (reference: etl_agent/templates.py:79-121)
and therefore has no engine configuration at all.  Here the session *is* the
engine, so the defaults matter:

- ``spark.sql.ansi.enabled=false``: DuckDB's ``TRY_CAST``/``try_strptime``
  return NULL on bad input; Spark 4 defaults to ANSI (errors).  ANSI-off
  restores NULL-on-failure cast semantics for parity (SURVEY.md §2.3).
- ``spark.sql.session.timeZone=UTC``: the reference normalizes naive
  timestamps to UTC (reference: etl_agent/ops.py:96-97); fixing the session
  zone makes timestamp results reproducible across machines.
- AQE on (coalesce partitions + skew-join): at the 100 TB design ceiling,
  runtime re-planning replaces hand-tuned partition counts.
- Arrow on: every pandas/Python boundary (createDataFrame, toPandas,
  pandas UDFs) is vectorized.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

#: Engine defaults.  Values chosen for local[N] testing scale; on a real
#: cluster the same keys are what you'd tune (shuffle.partitions ~ 2-3x
#: total cores, maxPartitionBytes 128-256m for 100 TB parquet scans).
ENGINE_CONF: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": str(DEFAULT_SHUFFLE_PARTITIONS),
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


#: Semantic confs the engine depends on for correctness (not tuning).  All
#: are runtime-settable, so they can be (re)applied to ANY session — in
#: particular one created by an external harness with Spark 4's ANSI-on
#: default, which would otherwise turn DuckDB-style NULL-on-bad-cast into a
#: hard CAST_INVALID_INPUT error mid-query.
SEMANTIC_CONF: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Python DataSource filter pushdown (Spark 4.1 default-off): a reader
    # that implements pushFilters() FAILS analysis without it.  Session
    # semantics, not a per-query side effect: the pushdown rule runs
    # lazily at first action, so a set-then-restore around plan creation
    # would break the query it was set for.
    "spark.sql.python.filterPushdown.enabled": "true",
}


#: Sessions whose semantic confs were already asserted (round-12: the
#: five conf.set RPCs cost ~7 ms and table() calls them hundreds of
#: times per battery run — once per session is enough; these confs are
#: owned by this engine, nothing in the battery flips them back).
_SEMANTICS_SET: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_semantics(spark: SparkSession) -> SparkSession:
    """Apply the correctness-critical confs to an existing session."""
    if spark in _SEMANTICS_SET:
        return spark
    for k, v in SEMANTIC_CONF.items():
        spark.conf.set(k, v)
    _SEMANTICS_SET.add(spark)
    return spark


#: Per-session tuning state: ``dirs`` = data dirs already sized (the
#: stat() walk shouldn't run once per table() call), ``ours`` = the last
#: shuffle-partition value THIS module set (so re-tuning for a new data
#: dir recognizes its own previous setting as overridable).  Weak-keyed
#: by the session object — id(spark) can be reused after GC and would
#: mis-mark a fresh session as already tuned.
_TUNED: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def tune_for_data(
    spark: SparkSession, data_dir: str, force: bool = False
) -> SparkSession:
    """Size shuffle parallelism to the DATA under ``data_dir``, not the
    session default.

    Why this exists: an external harness's vanilla session carries Spark's
    200-partition default, and while AQE re-coalesces ordinary shuffles, it
    does NOT re-plan persisted/cached exchanges
    (``canChangeCachedPlanOutputPartitioning=false``) — so iterative
    operators that persist per round (d07) would schedule 200 near-empty
    tasks per iteration.  Sizing rule: ~64 MB of input per partition,
    floored at the session's total parallelism, capped at 4x cores.  The
    floor matters: parallelism below core count idles cores — round 2's
    floor of 8 on a 32-thread session cost a uniform ~1.35x across the
    whole battery.  At 100 TB the size term dominates and hits the core
    cap, where the cap keeps shuffle waves small.  Runtime-settable, so it
    applies to ANY caller's session.

    A caller who EXPLICITLY configured shuffle parallelism is respected:
    unless ``force``, the override only applies when the current value is
    Spark's 200 default, this engine's own startup default, or a value a
    previous ``tune_for_data`` call set.
    """
    st = _TUNED.get(spark)
    if st is None:
        st = {"dirs": set(), "ours": None}
        _TUNED[spark] = st
    if data_dir in st["dirs"]:
        return spark
    st["dirs"].add(data_dir)
    current = spark.conf.get("spark.sql.shuffle.partitions", "200")
    untouched = current in ("200", str(DEFAULT_SHUFFLE_PARTITIONS), st["ours"])
    if not (force or untouched):
        return spark  # caller pinned an explicit parallelism; keep it
    try:
        total = sum(
            os.path.getsize(os.path.join(data_dir, f))
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
    except OSError:
        total = 0
    cores = spark.sparkContext.defaultParallelism
    parts = max(cores, min(4 * cores, total // (64 * 1024 * 1024) or cores))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    st["ours"] = str(parts)
    return spark


def get_spark(
    app_name: str = "agentic-etl-poc-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster is
    configured; on a real deployment the submitter sets the master and these
    defaults still apply.
    """
    builder = SparkSession.builder.appName(app_name)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
