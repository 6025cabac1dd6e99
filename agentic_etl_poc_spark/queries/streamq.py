"""Driver-facing Structured Streaming battery entries.

The streaming operators themselves live in ``streaming/events.py``
(windowed counts, stateful sessionize, stream-stream join, …) and are
exercised by the pytest suite; these entries make the central three
(v01 windowed agg, v02 stateful sessionize, v03 exact dedup)
**oracle-checkable**: each runs a real Structured Streaming query
(file source → Trigger.AvailableNow drain → memory sink) and returns the
final result frame, which the driver compares against batch SQL on DuckDB.
That is the batch/stream parity contract made first-class: the streaming
pipeline must produce byte-identical results to the batch backfill.

Determinism notes (what makes a *streaming* query oracle-checkable):

- The events table is staged once per (process, sf_dir) as a SINGLE
  NDJSON file, so the AvailableNow drain sees exactly one input batch —
  batch-boundary effects (which rows share a micro-batch) cannot vary
  between runs.  At 100 TB the same operators run continuously and the
  parity contract is checked against windows the watermark has closed.
- v01 runs in **complete** output mode: every window is emitted
  regardless of the watermark, matching the batch aggregation exactly.
- v02 (stateful sessionize) runs in append mode with a watermark delay
  longer than the data span, so **no event-time timeout ever fires**:
  the emitted rows are exactly the sessions closed by an observed
  inactivity gap — every session except each user's last, a set batch
  SQL expresses precisely (gaps-and-islands minus each user's final
  island).  The double ``total_value`` accumulated in Python state stays
  internal: summing floats in arrival order can never match a relational
  engine bit-for-bit, so it is not part of the checked output.

Reference: the closest surface in mounikavas/agentic-etl-poc is
cron-rescheduled batch (etl_agent/operator.py:15-16); Structured
Streaming subsumes it with exactly-once bookkeeping (SURVEY.md §2.5).
"""

from __future__ import annotations

import contextlib
import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agentic_etl_poc_spark.io_tables import table
from agentic_etl_poc_spark.queries.core import register
from agentic_etl_poc_spark.streaming.events import (
    _note_executed_stream_plan,
    dedup_stream,
    dedup_stream_within_watermark,
    noop_state,
    run_to_memory,
    sessionize,
    stream_events,
    windowed_counts,
)

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

#: Memory-sink names must be unique per run within a session (the sink
#: registers a temp view); a monotone suffix keeps reruns independent.
_MEM_SEQ = itertools.count()

#: sf_dir -> staged single-file NDJSON directory (process-lifetime cache;
#: the staged copy is deterministic, so cross-run reuse is safe).
_STAGED: dict[str, str] = {}

#: State-store partition count for the one-shot AvailableNow drains.  The
#: stateful partition count is locked in at stream START from
#: spark.sql.shuffle.partitions, and for a local drain the cost is
#: dominated by per-partition state-store file commits (a stream-stream
#: join keeps FOUR stores per partition), not CPU: v04 at sf0.1/local[32]
#: measures 6.2 s with 32 state partitions vs 2.5 s with 8.  In
#: continuous production the right number is ~cluster cores (state store
#: count scales with throughput, not with this harness constant) — these
#: knobs tune the drain-style battery/bench runs only.
STREAM_DRAIN_PARTITIONS = 8
#: The Python-state sessionize drain keeps more partitions: each state
#: task feeds an applyInPandasWithState worker, and 16 tasks keep the
#: worker pool busy without paying 32 stores' commit I/O (measured:
#: 4.3 s @32, 3.3 s @16, noisy 3.2-4.1 s @8).
STREAM_STATEFUL_PY_PARTITIONS = 16


@contextlib.contextmanager
def _drain_partitions(spark: SparkSession, n: int):
    """Pin spark.sql.shuffle.partitions for a stream start, then restore
    (the drained query keeps the pinned count; later batch stages get the
    session's tuned value back)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _drain_parts_for(spark: SparkSession, dirs: list[str], floor: int) -> int:
    """Size-aware state partition count for a drain: ~8 MB of staged
    NDJSON per partition, clamped to [floor, cores].  Small drains stay at
    the floor (state-store commit I/O dominates: v04 at sf0.1 measured
    6.2 s @32 vs 2.5 s @8); big drains scale back up (v03 at sf1 streams
    a 244 MB doubled topic with ~2M state keys and measures 4.3 s @32 vs
    5.8-9.5 s @8-16 — real state work wants the parallelism again)."""
    total_mb = 0
    for d in dirs:
        try:
            total_mb += sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".json")
            ) // (1024 * 1024)
        except OSError:
            pass
    cores = spark.sparkContext.defaultParallelism
    return min(cores, max(floor, int(total_mb) // 8))


def events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage ``events`` as ONE NDJSON file for use as a file-stream source,
    and — on the same single pass over a persisted events frame — the two
    typed single-file topics (views/clicks) v04 streams, so the whole
    v01-v05 family pays one staging job instead of three.

    The parquet table cannot be streamed directly (TIMESTAMP(NANOS) needs
    the io_tables read shim), and a single file guarantees a single
    AvailableNow micro-batch — the determinism anchor above.
    """
    # Tune UNCONDITIONALLY, not only on the staging miss: the stateful
    # shuffle partition count is fixed at stream start from
    # spark.sql.shuffle.partitions, and a vanilla harness session carries
    # Spark's 200 default — 200 applyInPandasWithState tasks (each a
    # Python state worker) for a drain that wants ~cores tasks.  Measured
    # at sf0.1/local[32]: warm drain 18.1 s at 200 partitions vs 3.8 s at
    # 32.  When the staged NDJSON survives from a previous process, the
    # table() below is skipped, so the tune must happen here.
    from agentic_etl_poc_spark.session import ensure_semantics, tune_for_data

    ensure_semantics(spark)
    tune_for_data(spark, sf_dir)
    from agentic_etl_poc_spark.queries.core import (
        fixture_fingerprint,
        marker_current,
        write_marker,
    )

    fp = fixture_fingerprint(sf_dir, ["events"])
    cached = _STAGED.get(sf_dir)
    if cached is not None and marker_current(
        os.path.join(cached, "_STAGED_FP"), fp
    ):
        return cached
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_streamq",
        sf_dir.strip(os.sep).replace(os.sep, "_"),
    )
    marker = os.path.join(out, "_STAGED_FP")
    if not marker_current(marker, fp):
        ev = table(spark, sf_dir, "events").persist()
        try:
            # a stale fingerprint restages the WHOLE family (base + typed
            # topics): a regenerated events fixture must never pair fresh
            # base files with stale typed ones
            for event_type in ("view", "click"):
                typed_out = out + "_" + event_type
                (
                    ev.filter(F.col("event_type") == event_type)
                    .coalesce(1)
                    .write.mode("overwrite")
                    .json(typed_out)
                )
            ev.coalesce(1).write.mode("overwrite").json(out)
            # marker LAST: it stamps the whole family staged
            write_marker(marker, fp)
        finally:
            ev.unpersist()
    _STAGED[sf_dir] = out
    return out


def state_harness_floor(spark: SparkSession, sf_dir: str) -> float:
    """Measured applyInPandasWithState harness floor: drain a NOOP state
    fn over the same staged topic, watermark, and state-partition pin v02
    uses and return the wall seconds.  Two jobs in one: (a) the number is
    the Arrow/state-machinery cost any stateful-Python operator pays, so
    ``(v02 - floor) / v08`` measures the sessionize PLAN rather than API
    startup; (b) running it before a timed region pre-warms the Python
    state-worker pool and the staged-topic cache, so the timed v02
    reflects marginal cost.  bench.py records it as ``state_floor_sec``."""
    import time

    src = events_stream_dir(spark, sf_dir)
    name = f"v00_floor_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_STATEFUL_PY_PARTITIONS)
    t0 = time.perf_counter()
    with _drain_partitions(spark, parts):
        stream = stream_events(spark, src, watermark="3650 days")
        run_to_memory(noop_state(stream), name)
    return round(time.perf_counter() - t0, 3)


@register(
    "v01_stream_tumbling_agg",
    oracle=f"""
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT)
                               * 21600 * 1000000),
                '{TS_FMT_DUCK}') AS window_start,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    description="Structured Streaming 6-hour tumbling aggregation "
    "(file source -> AvailableNow drain -> memory sink, complete mode), "
    "oracle-checked against the batch SQL — the batch/stream parity "
    "contract as a first-class query.  Same expression as q20; the "
    "decimal partial sums live in the state store, so the streamed total "
    "is exact.",
)
def v01_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = events_stream_dir(spark, sf_dir)
    name = f"v01_win_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        stream = stream_events(spark, src, watermark="10 minutes")
        # complete mode: the watermark never suppresses a window, so the
        # final memory table equals the batch aggregation over all input.
        run_to_memory(windowed_counts(stream), name, output_mode="complete")
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "v02_stream_sessionize",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM flagged
),
sess AS (
  SELECT user_id, sess_no,
         strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
         strftime(MAX(ts), '{TS_FMT_DUCK}') AS session_end,
         COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, sess_no
)
SELECT user_id, session_start, session_end, n_events
FROM sess
QUALIFY sess_no < MAX(sess_no) OVER (PARTITION BY user_id)
ORDER BY user_id, session_start
""",
    description="Custom stateful streaming operator "
    "(applyInPandasWithState sessionize, 30-min gap) drained with "
    "AvailableNow and oracle-checked: with a watermark delay longer than "
    "the data span no timeout fires, so the emitted rows are exactly the "
    "gap-closed sessions — every session except each user's last — which "
    "batch gaps-and-islands SQL expresses.  State is keyed by user, so "
    "store size tracks ACTIVE users, not history (the 100 TB/day "
    "requirement).",
)
def v02_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = events_stream_dir(spark, sf_dir)
    name = f"v02_sess_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_STATEFUL_PY_PARTITIONS)
    with _drain_partitions(spark, parts):
        # Watermark delay >> data span (events cover ~3 months): the
        # watermark stays below every event, so no event-time timeout
        # fires and the output set is closed-by-gap sessions only (see
        # module docstring).
        stream = stream_events(spark, src, watermark="3650 days")
        run_to_memory(sessionize(stream, gap_seconds=1800), name)
    return (
        spark.table(name)
        .select(
            "user_id",
            F.date_format("session_start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("session_end", TS_FMT_SPARK).alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "v08_stream_session_window",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}')
         AS session_end_gap,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
            AS VARCHAR) AS total_value
FROM numbered
GROUP BY user_id, sess_no
ORDER BY user_id, session_start
""",
    description="Spark's BUILT-IN session_window streaming aggregation "
    "(the declarative sibling of v02's custom applyInPandasWithState "
    "operator) drained with AvailableNow in complete mode and "
    "oracle-checked against batch gaps-and-islands SQL over ALL "
    "sessions — including each user's last, which v02's append-mode "
    "contract excludes.  Boundary semantics pinned: session_window "
    "spans [first, last + gap) and merges an event iff it lands "
    "STRICTLY inside the window, so a gap of exactly 30 minutes starts "
    "a NEW session (the oracle's new-session condition is >= 1800 s, "
    "not > — the off-by-one the hash would catch).  State here is "
    "JVM-side (no Python workers): merging session state per user key, "
    "evicted by the watermark in production append mode; the decimal "
    "partial sums live in the state store so the streamed totals are "
    "exact.  Scale: state tracks ACTIVE sessions only; complete mode is "
    "the drain-for-parity harness, append+watermark is the unbounded "
    "deployment shape (v05 proves that eviction path).",
)
def v08_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = events_stream_dir(spark, sf_dir)
    name = f"v08_sw_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        stream = stream_events(spark, src, watermark="10 minutes")
        agg = stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("total_value"),
        )
        run_to_memory(agg, name, output_mode="complete")
    return (
        spark.table(name)
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("session_end_gap"),
            "n_events",
            F.col("total_value").cast("string").alias("total_value"),
        )
        .orderBy("user_id", "session_start")
    )


def _doubled_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events NDJSON TWICE (two identical files) — a stream
    with every record duplicated, the input that makes exact streaming
    dedup non-vacuous."""
    import shutil

    from agentic_etl_poc_spark.queries.core import (
        fixture_fingerprint,
        marker_current,
        write_marker,
    )

    src = events_stream_dir(spark, sf_dir)
    out = src + "_x2"
    marker = os.path.join(out, "_STAGED")
    fp = fixture_fingerprint(sf_dir, ["events"])
    if not marker_current(marker, fp):
        os.makedirs(out, exist_ok=True)
        part = next(
            f for f in sorted(os.listdir(src)) if f.endswith(".json")
        )
        shutil.copy(os.path.join(src, part), os.path.join(out, "a.json"))
        shutil.copy(os.path.join(src, part), os.path.join(out, "b.json"))
        write_marker(marker, fp)
    return out


@register(
    "v03_stream_dedup_exact",
    oracle=f"""
SELECT event_id, user_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s, event_type
FROM events
ORDER BY event_id
""",
    description="Streaming exact deduplication as a first-class oracle "
    "query: the events stream is staged with EVERY record duplicated "
    "(two identical input files), drained through watermark-bounded "
    "dropDuplicates keyed on (event_id, ts), and the surviving rows "
    "must equal the single-copy batch table exactly.  State is keyed by "
    "id and evicted past the watermark horizon, so at 100 TB/day the "
    "store tracks the late-data window, not stream history — the "
    "in-flight half of the dedup story (batch MinHash/SimHash d03-d05 "
    "runs on landed data).",
)
def v03_stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _doubled_stream_dir(spark, sf_dir)
    name = f"v03_dedup_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        stream = stream_events(spark, src, watermark="3650 days")
        run_to_memory(dedup_stream(stream), name)
    return (
        spark.table(name)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
            "event_type",
        )
        .orderBy("event_id")
    )


def _eviction_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage a THREE-file topic for the watermark-eviction entry (v05),
    mtime-ordered so maxFilesPerTrigger=1 yields three deterministic
    micro-batches:

    1. ``a_base.json`` — the full events table (event-time max = M).
    2. ``b_settle.json`` — re-keyed (+20M) copies of the last-30-min rows:
       max ts still M, and every row lands in a window whose end is past
       the final watermark cut (M - 1h), i.e. a window that is NEVER
       emitted.  Its only job is to let the watermark (one-batch filter
       lag, measured on Spark 4.1) take effect before the late file.
    3. ``c_late.json`` — re-keyed (+10M) copies of ALL events: every copy
       in a window closed by the watermark must be DROPPED as late.  If
       the filter failed, those rows would re-create the evicted window
       state and the final no-data batch would re-emit duplicate window
       rows — so the oracle (base-only counts over closed windows)
       proves the suppression.
    """
    from agentic_etl_poc_spark.queries.core import (
        fixture_fingerprint,
        marker_current,
        write_marker,
    )

    src = events_stream_dir(spark, sf_dir)
    out = src + "_evict"
    marker = os.path.join(out, "_STAGED")
    fp = fixture_fingerprint(sf_dir, ["events"])
    if not marker_current(marker, fp):
        import shutil
        import time

        os.makedirs(out, exist_ok=True)
        part = next(f for f in sorted(os.listdir(src)) if f.endswith(".json"))
        shutil.copy(os.path.join(src, part), os.path.join(out, "a_base.json"))
        ev = table(spark, sf_dir, "events")
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        rekey = lambda off: [  # noqa: E731
            (F.col("event_id") + off).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        ]
        for fname, frame in (
            (
                "b_settle.json",
                ev.filter(
                    F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
                ).select(*rekey(20_000_000)),
            ),
            ("c_late.json", ev.select(*rekey(10_000_000))),
        ):
            tmp = os.path.join(out, "_tmp_" + fname)
            frame.coalesce(1).write.mode("overwrite").json(tmp)
            p = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".json"))
            os.replace(os.path.join(tmp, p), os.path.join(out, fname))
            shutil.rmtree(tmp)
        now = time.time()
        for i, fname in enumerate(
            ("a_base.json", "b_settle.json", "c_late.json")
        ):
            os.utime(os.path.join(out, fname), (now - 180 + 60 * i,) * 2)
        write_marker(marker, fp)
    return out


@register(
    "v05_stream_watermark_eviction",
    oracle=f"""
WITH win AS (
  SELECT CAST(floor(epoch(ts) / 21600) AS BIGINT) AS wid, event_type, value
  FROM events
)
SELECT strftime(make_timestamp(wid * 21600 * 1000000),
                '{TS_FMT_DUCK}') AS window_start,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM win
GROUP BY wid, event_type
HAVING (wid + 1) * 21600
       <= (SELECT floor(epoch(MAX(ts))) - 3600 FROM events)
ORDER BY window_start, event_type
""",
    description="Watermark EVICTION made oracle-checkable (the round-4 "
    "gap: single-file staging meant the drain never saw a second batch, "
    "so late-row suppression was never exercised under the oracle).  A "
    "three-file staged topic drained with maxFilesPerTrigger=1 gives "
    "three deterministic micro-batches: base events, a settling file "
    "(rows only in never-emitted tail windows), then a full late replay "
    "(every event re-keyed, original timestamps).  The 1-hour watermark "
    "must drop every late copy aimed at a closed 6-hour window — if it "
    "did not, the copies would rebuild evicted state and the final "
    "batch would re-emit duplicate windows, which the oracle (base-only "
    "counts over windows closed by M - 1h) would catch as extra rows.  "
    "Append mode: only watermark-closed windows are emitted, which is "
    "exactly what continuous 100 TB/day operation relies on.",
)
def v05_stream_watermark_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _eviction_stream_dir(spark, sf_dir)
    name = f"v05_evict_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        stream = stream_events(
            spark, src, watermark="1 hour", max_files_per_trigger=1
        )
        run_to_memory(windowed_counts(stream), name, output_mode="append")
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def _typed_stream_dir(spark: SparkSession, sf_dir: str, event_type: str) -> str:
    """Staged ``events WHERE event_type = X`` single-file NDJSON topic —
    the two-topics shape a stream-stream join reads in production.  The
    actual write happens inside :func:`events_stream_dir`'s one staging
    pass (persisted events frame, all topics in one go)."""
    # ALWAYS go through events_stream_dir first: it owns the family
    # fingerprint marker, so a regenerated events fixture restages the
    # typed topics before this cache could hand out a stale one (cheap
    # when current — marker read only).
    base = events_stream_dir(spark, sf_dir)
    out = base + "_" + event_type
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        # base was staged by an EARLIER process whose typed topics were
        # since removed: restage just this topic
        (
            table(spark, sf_dir, "events")
            .filter(F.col("event_type") == event_type)
            .coalesce(1)
            .write.mode("overwrite")
            .json(out)
        )
    return out


@register(
    "v04_stream_stream_join",
    oracle=f"""
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       strftime(v.ts, '{TS_FMT_DUCK}') AS view_ts_s,
       strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts_s
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
ORDER BY view_id, click_id
""",
    description="Stream-stream inner join as a first-class oracle query: "
    "two independent streams over the same staged source (views and "
    "clicks), time-range attribution join (click within 1 hour after "
    "the view), AvailableNow drain, hash-compared against the batch "
    "interval join.  Both sides carry watermarks and the range "
    "predicate bounds the join state: rows older than (watermark - "
    "interval) are evicted, so state size tracks the attribution "
    "window, not stream history — the requirement for an unbounded "
    "100 TB/day stream (streaming/events.py::join_click_to_view; the "
    "drain sees one batch, so no match is watermark-suppressed and the "
    "emitted set equals the batch join exactly).",
)
def v04_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.streaming.events import join_click_to_view

    # Stage each side as its OWN single-file NDJSON (the real shape: two
    # topics), not two full-corpus scans with post-filters — each stream
    # then parses only its ~1/5 slice of the events file.
    name = f"v04_ssj_{next(_MEM_SEQ)}"
    v_dir = _typed_stream_dir(spark, sf_dir, "view")
    c_dir = _typed_stream_dir(spark, sf_dir, "click")
    # 8 state partitions, not the session's 32: a stream-stream join
    # commits FOUR state stores per partition per batch, and this
    # one-shot drain is commit-I/O-bound (6.2 s @32 vs 2.5 s @8 at
    # sf0.1/local[32]); see STREAM_DRAIN_PARTITIONS.
    parts = _drain_parts_for(spark, [v_dir, c_dir], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        views = stream_events(spark, v_dir, watermark="3650 days")
        clicks = stream_events(spark, c_dir, watermark="3650 days")
        run_to_memory(join_click_to_view(views, clicks, within="1 hour"), name)
    return (
        spark.table(name)
        .select(
            "user_id",
            "view_id",
            "click_id",
            F.date_format("view_ts", TS_FMT_SPARK).alias("view_ts_s"),
            F.date_format("click_ts", TS_FMT_SPARK).alias("click_ts_s"),
        )
        .orderBy("view_id", "click_id")
    )


@register(
    "v06_stream_static_enrich",
    oracle=f"""
SELECT e.event_id,
       e.user_id,
       COALESCE(cu.c_mktsegment, '(none)') AS segment,
       strftime(e.ts, '{TS_FMT_DUCK}') AS ts_s,
       e.event_type
FROM events e LEFT JOIN customer cu ON cu.c_custkey = e.user_id
ORDER BY e.event_id
""",
    description="Stream-static enrichment join as a first-class oracle "
    "query (streaming/events.py::enrich_with_dim was pytest-proven but "
    "invisible to the driver's sweep): the events stream left-joins a "
    "broadcast customer dimension per micro-batch — the static side is "
    "re-read each batch (picking up slowly-changing updates) and the "
    "stream side never shuffles, which is the standard shape for joining "
    "a 100 TB/day event stream to reference data.  Stateless, so the "
    "drained output must equal the batch left join row-for-row.",
)
def v06_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.streaming.events import enrich_with_dim

    src = events_stream_dir(spark, sf_dir)
    name = f"v06_enrich_{next(_MEM_SEQ)}"
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    # stateless: no state stores, so the drain needs no partition pin
    stream = stream_events(spark, src, watermark="10 minutes")
    run_to_memory(enrich_with_dim(stream, dim, "user_id"), name)
    return (
        spark.table(name)
        .select(
            "event_id",
            "user_id",
            F.coalesce("segment", F.lit("(none)")).alias("segment"),
            F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
            "event_type",
        )
        .orderBy("event_id")
    )


@register(
    "v07_stream_python_source",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
GROUP BY source
ORDER BY source
""",
    description="Custom Python STREAMING data source under the oracle "
    "(Spark 4 SimpleDataSourceStreamReader): documents.parquet streams "
    "through sources/py_datasource.py::DocsStreamDataSource — offsets "
    "are row-group indices (one micro-batch per row group), replay "
    "between offsets is exact, the cursor is checkpointable — into a "
    "complete-mode aggregation drained with AvailableNow; the final "
    "memory table must equal batch SQL over the same file.  This is the "
    "connector shape for any Python-only external system (queue, ledger, "
    "API cursor) made Spark-native: the engine plans, retries, and "
    "checkpoints; the Python class only answers 'what is at offset X'. "
    "Scale, stated honestly: the SIMPLE reader variant prefetches each "
    "batch driver-side (Spark's documented design for low-throughput "
    "sources; replay via readBetweenOffsets runs from the checkpoint); "
    "a high-throughput source implements the partition-planned "
    "DataSourceStreamReader, the shape u06's row-group partitioning "
    "demonstrates on the batch path.  State is the tiny per-source "
    "aggregate.",
)
def v07_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.sources.py_datasource import register_stream

    register_stream(spark)
    name = f"v07_pysrc_{next(_MEM_SEQ)}"
    path = os.path.join(sf_dir, "documents.parquet")
    with _drain_partitions(spark, STREAM_DRAIN_PARTITIONS):
        stream = (
            spark.readStream.format("pydocs_stream").option("path", path).load()
        )
        agg = stream.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _note_executed_stream_plan(q)
    return spark.table(name).orderBy("source")


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def _state_store_provider(spark: SparkSession, provider: str):
    """Pin spark.sql.streaming.stateStore.providerClass for a stream
    start, then restore.  The provider is locked in per-query at START
    (it names the class each stateful task instantiates for its store),
    so scoping the conf to the drain cannot leak into other streams."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@register(
    "v09_stream_rocksdb_session",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}')
         AS session_end_gap,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
            AS VARCHAR) AS total_value
FROM numbered
GROUP BY user_id, sess_no
ORDER BY user_id, session_start
""",
    description="v08's built-in session_window drain re-run on the "
    "RocksDB state-store provider (spark.sql.streaming.stateStore."
    "providerClass -> RocksDBStateStoreProvider) under the SAME "
    "gaps-and-islands oracle — the provider-portability proof the 100 TB "
    "deployment depends on.  The default HDFS-backed provider keeps "
    "every state key on the executor HEAP (the sf1 audits show x3.5-4.3 "
    "growth on ~2M-key state builds — fine for a drain, fatal for "
    "continuous multi-day state); RocksDB keeps state off-heap on local "
    "SSD with incremental changelog/snapshot uploads, so state size is "
    "bounded by disk, not heap.  The plan is IDENTICAL — the provider "
    "is a per-query conf the stateful tasks instantiate at START, no "
    "operator rewrite — and the oracle hash proves session merging, "
    "boundary semantics (gap of exactly 30 min starts a NEW session), "
    "and decimal state totals survive the provider swap bit-for-bit.  "
    "BASELINE.md records both providers' drain cost at sf0.1/sf1.",
)
def v09_stream_rocksdb_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = events_stream_dir(spark, sf_dir)
    name = f"v09_rocks_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts), _state_store_provider(
        spark, ROCKSDB_PROVIDER
    ):
        stream = stream_events(spark, src, watermark="10 minutes")
        agg = stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("total_value"),
        )
        run_to_memory(agg, name, output_mode="complete")
    return (
        spark.table(name)
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("session_end_gap"),
            "n_events",
            F.col("total_value").cast("string").alias("total_value"),
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "v10_stream_outer_join",
    oracle=f"""
WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
c AS (SELECT user_id AS c_user, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'),
wm AS (
  SELECT make_timestamp((LEAST(
           (SELECT CAST(floor(epoch_ms(MAX(ts))) AS BIGINT)
            FROM events WHERE event_type = 'view'),
           (SELECT CAST(floor(epoch_ms(MAX(ts))) AS BIGINT)
            FROM events WHERE event_type = 'click'))
         - 600000) * 1000) AS w
)
SELECT v.user_id, v.view_id, c.click_id,
       strftime(v.view_ts, '{TS_FMT_DUCK}') AS view_ts_s,
       strftime(c.click_ts, '{TS_FMT_DUCK}') AS click_ts_s
FROM v LEFT JOIN c
  ON v.user_id = c.c_user
 AND c.click_ts >= v.view_ts
 AND c.click_ts <= v.view_ts + INTERVAL 1 HOUR
WHERE c.click_id IS NOT NULL
   OR v.view_ts + INTERVAL 1 HOUR < (SELECT w FROM wm)
ORDER BY view_id, click_id
""",
    description="Stream-stream LEFT OUTER join under the oracle — the "
    "semantics v04's inner join cannot show: a view with NO click inside "
    "its 1-hour attribution window must still emit (click NULL), but "
    "ONLY once the watermark proves no match can arrive.  The oracle "
    "encodes Spark's exact emission rule, empirically pinned like v05's "
    "eviction: matched rows emit immediately; an unmatched view emits "
    "iff view_ts + 1h < global watermark, where the global watermark is "
    "min over BOTH input streams of (side's max event time, "
    "ms-truncated) - 10 min delay (multipleWatermarkPolicy=min), and "
    "the comparison is STRICT (state evicts when wm passes the window "
    "end).  Views inside the final delay horizon stay in state and "
    "never emit — the tail the drain leaves pending, exactly what a "
    "continuous deployment would still be waiting on.  Scale shape: "
    "same bounded join state as v04 (range condition evicts rows older "
    "than wm - interval); the NULL-completion path adds no state, only "
    "eviction-time emission.",
)
def v10_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"v10_soj_{next(_MEM_SEQ)}"
    v_dir = _typed_stream_dir(spark, sf_dir, "view")
    c_dir = _typed_stream_dir(spark, sf_dir, "click")
    parts = _drain_parts_for(spark, [v_dir, c_dir], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        views = stream_events(spark, v_dir, watermark="10 minutes")
        clicks = stream_events(spark, c_dir, watermark="10 minutes")
        v = views.select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        c = clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        j = v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (
                F.col("click_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
            ),
            "left_outer",
        )
        run_to_memory(j, name)
    return (
        spark.table(name)
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            F.date_format("view_ts", TS_FMT_SPARK).alias("view_ts_s"),
            F.date_format("click_ts", TS_FMT_SPARK).alias("click_ts_s"),
        )
        .orderBy("view_id", "click_id")
    )


def _tribatch_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as THREE NDJSON files split by event_id % 3,
    mtime-ordered so maxFilesPerTrigger=1 yields three deterministic
    micro-batches — the multi-batch input that makes an upsert sink's
    merge path non-vacuous (a single batch would never overwrite)."""
    import shutil

    from agentic_etl_poc_spark.queries.core import (
        fixture_fingerprint,
        marker_current,
        write_marker,
    )

    src = events_stream_dir(spark, sf_dir)
    out = src + "_x3"
    marker = os.path.join(out, "_STAGED")
    fp = fixture_fingerprint(sf_dir, ["events"])
    if not marker_current(marker, fp):
        import time

        os.makedirs(out, exist_ok=True)
        ev = table(spark, sf_dir, "events")
        for i in range(3):
            tmp = os.path.join(out, f"_tmp_{i}")
            (
                ev.filter(F.col("event_id") % 3 == i)
                .coalesce(1)
                .write.mode("overwrite")
                .json(tmp)
            )
            part = next(
                f for f in sorted(os.listdir(tmp)) if f.endswith(".json")
            )
            os.replace(os.path.join(tmp, part), os.path.join(out, f"{i}.json"))
            shutil.rmtree(tmp)
        now = time.time()
        for i in range(3):
            os.utime(os.path.join(out, f"{i}.json"), (now - 180 + 60 * i,) * 2)
        write_marker(marker, fp)
    return out


@register(
    "v11_stream_upsert_sink",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
            AS VARCHAR) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="foreachBatch exactly-once UPSERT sink — the production "
    "pattern for streaming aggregates into a keyed store that supports "
    "no native streaming sink: a per-type running aggregate in UPDATE "
    "output mode (each micro-batch emits the keys it touched with their "
    "CUMULATIVE state) is drained over a THREE-batch staged topic "
    "(event_id % 3 split, maxFilesPerTrigger=1), and each batch MERGES "
    "into a parquet store by key — new rows replace the key's old rows "
    "(anti-join + union), written to a staging dir and promoted with an "
    "atomic directory swap, so a crashed or replayed batch re-applies "
    "idempotently (the checkpoint replays the batch, the merge "
    "overwrites the same keys with the same cumulative values — "
    "exactly-once EFFECT without sink transactions).  The final store "
    "must equal the batch aggregate over all events — cumulative "
    "update-mode state makes the LAST write per key the total, however "
    "the input was batched.  Scale shape: the merge is two distributed "
    "ops (broadcast anti-join on the tiny delta + union), never a "
    "driver loop; the store stays partitioned by the merge key at real "
    "key cardinalities; decimal state keeps totals exact.",
)
def v11_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from agentic_etl_poc_spark import plan_capture

    src = _tribatch_stream_dir(spark, sf_dir)
    run_root = tempfile.mkdtemp(prefix="v11_upsert_")
    store = os.path.join(run_root, "store")
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)

    def merge(batch_df, batch_id: int) -> None:
        staged = os.path.join(run_root, f"staged_{batch_id}")
        delta = batch_df.select("event_type", "n", "total_value")
        if os.path.exists(store):
            old = batch_df.sparkSession.read.parquet(store)
            merged = delta.unionByName(
                old.join(
                    F.broadcast(delta.select("event_type")),
                    "event_type",
                    "left_anti",
                )
            )
        else:
            merged = delta
        plan_capture.note("upsert_merge", merged)
        merged.write.mode("overwrite").parquet(staged)
        # atomic promote: readers see the old store or the new one
        prev = store + ".old"
        if os.path.exists(store):
            os.replace(store, prev)
        os.replace(staged, store)
        shutil.rmtree(prev, ignore_errors=True)

    with _drain_partitions(spark, parts):
        stream = stream_events(
            spark, src, watermark="3650 days", max_files_per_trigger=1
        )
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("total_value"),
        )
        q = (
            agg.writeStream.foreachBatch(merge)
            .outputMode("update")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", os.path.join(run_root, "ckpt")
            )
            .start()
        )
        q.awaitTermination()
        _note_executed_stream_plan(q)
    return (
        spark.read.parquet(store)
        .select(
            "event_type",
            "n",
            F.col("total_value").cast("string").alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "v12_stream_sliding_window",
    oracle=f"""
WITH assigned AS (
  SELECT make_timestamp(CAST(floor(epoch(ts) / 10800) AS BIGINT)
                        * 10800 * 1000000) AS w_start,
         event_type, value
  FROM events
  UNION ALL
  SELECT make_timestamp((CAST(floor(epoch(ts) / 10800) AS BIGINT) - 1)
                        * 10800 * 1000000) AS w_start,
         event_type, value
  FROM events
)
SELECT strftime(w_start, '{TS_FMT_DUCK}') AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    description="Structured Streaming SLIDING-window aggregation (6-hour "
    "windows every 3 hours — each event belongs to exactly two "
    "overlapping windows; v01 covers the tumbling special case).  The "
    "batch oracle expresses the overlap as a two-way shifted-tumbling "
    "union, which is literally Spark's physical strategy: the Expand "
    "operator replicates each row once per containing window BEFORE the "
    "keyed state aggregation, so state size is windows x keys, not "
    "events.  Complete-mode drain (the watermark never suppresses), "
    "decimal partial sums in the state store, window starts rendered as "
    "formatted strings.  Scale shape: the Expand doubles rows map-side, "
    "then ONE shuffle on (window, event_type); at 100 TB/day the "
    "watermark in append mode bounds retained state to the slide "
    "horizon.",
)
def v12_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = events_stream_dir(spark, sf_dir)
    name = f"v12_slide_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        stream = stream_events(spark, src, watermark="10 minutes")
        agg = stream.groupBy(
            F.window("ts", "6 hours", "3 hours").alias("w"),
            F.col("event_type"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        run_to_memory(agg, name, output_mode="complete")
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "v14_stream_quarantine",
    oracle="""
SELECT CASE WHEN event_type = 'error' THEN 'quarantined'
            ELSE 'clean' END AS side,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
            AS VARCHAR) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY side, event_type
""",
    description="Streaming QUARANTINE split via foreachBatch — the "
    "pattern _run_stream_plan_tail's error message points at (the batch "
    "plan's checks.quarantine_path cannot re-read a persisted stream): "
    "each micro-batch of a three-batch drain is split ONCE (persist + "
    "filter/anti-filter on the quality rule event_type = 'error') and "
    "written to two parquet areas, clean and quarantined, each batch "
    "into its own overwrite-mode subdirectory so a checkpoint-replayed "
    "batch re-commits idempotently (exactly-once effect, v11's "
    "contract, without sink transactions).  The battery result "
    "re-reads BOTH artifacts and aggregates; matching the single batch "
    "oracle over the raw topic proves the split was lossless AND "
    "disjoint — every row lands on exactly one side.  Scale shape: the "
    "split is map-only (no shuffle before either sink), the per-batch "
    "persist computes the source scan once for both sides, and "
    "quarantine volume is bounded by the bad-row rate, not the stream "
    "rate.",
)
def v14_stream_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from agentic_etl_poc_spark import plan_capture

    src = _tribatch_stream_dir(spark, sf_dir)
    run_root = tempfile.mkdtemp(prefix="v14_quarantine_")
    clean_root = os.path.join(run_root, "clean")
    quar_root = os.path.join(run_root, "quarantined")
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    bad = F.col("event_type") == "error"

    def split(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            ok_rows = batch_df.filter(~bad)
            bad_rows = batch_df.filter(bad)
            plan_capture.note("quarantine_clean", ok_rows)
            plan_capture.note("quarantine_bad", bad_rows)
            # per-batch overwrite subdirs: a replayed batch rewrites its
            # own output instead of double-appending
            ok_rows.write.mode("overwrite").parquet(
                os.path.join(clean_root, f"b{batch_id}")
            )
            bad_rows.write.mode("overwrite").parquet(
                os.path.join(quar_root, f"b{batch_id}")
            )
        finally:
            batch_df.unpersist()

    with _drain_partitions(spark, parts):
        stream = stream_events(
            spark, src, watermark="3650 days", max_files_per_trigger=1
        )
        q = (
            stream.writeStream.foreachBatch(split)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(run_root, "ckpt"))
            .start()
        )
        q.awaitTermination()
        _note_executed_stream_plan(q)

    # explicit schema: a side whose every batch filtered to ZERO rows has
    # only _SUCCESS markers under it (no part files), and a schema-less
    # read would fail inference instead of returning the correct empty
    # frame (latent on fixtures with no 'error' rows)
    from agentic_etl_poc_spark.streaming.events import EVENT_SCHEMA

    clean = (
        spark.read.schema(EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(clean_root)
    )
    quar = (
        spark.read.schema(EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(quar_root)
    )
    both = clean.withColumn("side", F.lit("clean")).unionByName(
        quar.withColumn("side", F.lit("quarantined"))
    )
    return (
        both.groupBy("side", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .cast("string")
            .alias("total_value"),
        )
        .orderBy("side", "event_type")
    )


@register(
    "v13_stream_dedup_within_watermark",
    oracle=f"""
SELECT event_id, user_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s, event_type
FROM events
ORDER BY event_id
""",
    description="Streaming exact dedup on the dropDuplicatesWithin"
    "Watermark API (public Spark 3.5+) — the state-API portability twin "
    "of v03: same doubled topic, same single-copy batch oracle, but the "
    "dedup key is event_id ALONE, which plain dropDuplicates cannot "
    "evict (its state only ages out when the event-time column is in "
    "the key; v03 keys on (event_id, ts) for that reason).  Within"
    "Watermark stamps each key's state with its first-arrival event "
    "time and evicts at watermark > first_seen + delay, so key-only "
    "dedup state is bounded by the delay horizon — the contract a "
    "100 TB/day re-delivery suppressor needs.  The drain watermark "
    "spans the whole staged topic, so every duplicate is within-"
    "watermark and the survivors equal the batch table exactly; the "
    "after-eviction re-emission residue is pinned by a unit test "
    "(tests/test_streaming_multimodal.py).  The reference has no "
    "streaming at all (etl_agent/operator.py:15-16 reschedules batch "
    "runs); this entry exists for the scale story.",
)
def v13_stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = _doubled_stream_dir(spark, sf_dir)
    name = f"v13_dedup_wm_{next(_MEM_SEQ)}"
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)
    with _drain_partitions(spark, parts):
        stream = stream_events(spark, src, watermark="3650 days")
        run_to_memory(dedup_stream_within_watermark(stream), name)
    return (
        spark.table(name)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
            "event_type",
        )
        .orderBy("event_id")
    )


def _twophase_stream_files(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage events split into two NDJSON files by event_id parity (the
    two 'days' of v15's incremental-drain scenario), one-time per fixture
    fingerprint.  Returns the two staged file paths; v15 copies them into
    a fresh per-run topic because the topic MUTATES mid-entry."""
    import shutil

    from agentic_etl_poc_spark.queries.core import (
        fixture_fingerprint,
        marker_current,
        write_marker,
    )

    src = events_stream_dir(spark, sf_dir)
    out = src + "_2ph"
    marker = os.path.join(out, "_STAGED")
    fp = fixture_fingerprint(sf_dir, ["events"])
    if not marker_current(marker, fp):
        os.makedirs(out, exist_ok=True)
        ev = table(spark, sf_dir, "events")
        for i, fname in enumerate(("phase1.json", "phase2.json")):
            tmp = os.path.join(out, f"_tmp_{i}")
            (
                ev.filter(F.col("event_id") % 2 == i)
                .coalesce(1)
                .write.mode("overwrite")
                .json(tmp)
            )
            part = next(
                f for f in sorted(os.listdir(tmp)) if f.endswith(".json")
            )
            shutil.move(os.path.join(tmp, part), os.path.join(out, fname))
            shutil.rmtree(tmp)
        write_marker(marker, fp)
    return os.path.join(out, "phase1.json"), os.path.join(out, "phase2.json")


@register(
    "v15_stream_dim_refresh",
    oracle=f"""
SELECT CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS dim_ver,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(CASE WHEN event_id % 2 = 0 THEN TRIM(n_name)
                ELSE TRIM(n_name) || '_v2' END) AS first_label
FROM events JOIN nation ON n_nationkey = user_id % 25
GROUP BY 1, 2
ORDER BY dim_ver, event_type
""",
    description="Checkpointed INCREMENTAL drains against a REFRESHED "
    "dimension — the nightly-enrichment production pattern made "
    "oracle-checkable (v06 proves one static join; this pins the part "
    "its docstring only claimed: the static side picks up updates "
    "between runs, and the checkpoint processes each input exactly "
    "once).  Drain 1: phase-1 events (even ids) AvailableNow-drained "
    "through a broadcast left join against dim v1 into a parquet sink.  "
    "Between drains the topic gains the phase-2 file and the dimension "
    "is REPLACED with v2 (labels suffixed '_v2').  Drain 2 reuses the "
    "SAME checkpoint, so it consumes ONLY the new file — phase-1 rows "
    "are not reprocessed against the new dim (exactly-once), and "
    "phase-2 rows are enriched with v2.  The artifact re-aggregated "
    "must therefore show even-id groups carrying v1 labels and odd-id "
    "groups carrying v2 labels, which is exactly what the batch oracle "
    "states with a parity CASE.  Scale shape: the dim broadcasts per "
    "batch (stream side never shuffles), the sink is Spark's "
    "transactional file-sink protocol, and an incremental tick costs "
    "only the new files.",
)
def v15_stream_dim_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from agentic_etl_poc_spark.streaming.events import (
        enrich_with_dim,
        run_available_now,
    )

    ph1, ph2 = _twophase_stream_files(spark, sf_dir)
    run_root = tempfile.mkdtemp(prefix="v15_dimref_")
    topic = os.path.join(run_root, "topic")
    out_dir = os.path.join(run_root, "enriched")
    ckpt = os.path.join(run_root, "ckpt")
    os.makedirs(topic)

    def dim(version: int) -> DataFrame:
        label = F.trim(F.col("n_name"))
        if version == 2:
            label = F.concat(label, F.lit("_v2"))
        return table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("k"),
            label.alias("first_label"),
            F.lit(version).alias("dim_ver"),
        )

    parts = _drain_parts_for(spark, [topic], STREAM_DRAIN_PARTITIONS)

    def drain(version: int) -> None:
        with _drain_partitions(spark, parts):
            stream = stream_events(spark, topic, watermark="3650 days")
            enriched = enrich_with_dim(
                stream.withColumn("k", F.col("user_id") % 25),
                dim(version),
                "k",
            ).select("event_id", "event_type", "first_label", "dim_ver")
            run_available_now(enriched, ckpt, out_dir)

    # day 1: phase-1 file only, dim v1
    shutil.copy(ph1, os.path.join(topic, "a_phase1.json"))
    drain(1)
    # day 2: new file arrives AND the dimension is refreshed; the shared
    # checkpoint makes the second drain consume ONLY the new file
    shutil.copy(ph2, os.path.join(topic, "b_phase2.json"))
    drain(2)

    artifact = spark.read.parquet(out_dir)
    return (
        artifact.groupBy("dim_ver", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("first_label").alias("first_label"),
        )
        .select("dim_ver", "event_type", "n", "first_label")
        .orderBy("dim_ver", "event_type")
    )


@register(
    "v16_stream_lakehouse_upsert",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS d,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
            AS VARCHAR) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    description="Streaming CDC apply into the LAKEHOUSE table — v11's "
    "exactly-once upsert pattern re-targeted at the partition-level COW "
    "sink p13 proved (sinks/parquet_sink.py::upsert_parquet): an "
    "update-mode (day, event_type) running aggregate drained over the "
    "three-batch staged topic, where each micro-batch foreachBatch-"
    "MERGES its touched keys into a parquet table PARTITIONED BY "
    "event_type — partition-pruned merge read, left_anti survivors, "
    "atomic partition-directory swap per batch, instead of v11's "
    "whole-store rewrite.  At 100 TB this is the nightly-CDC shape: a "
    "micro-batch touching 3 of 10,000 partitions rewrites 3 directories "
    "(the delta's partition values prune the read AND the write), and a "
    "checkpoint-replayed batch re-merges the same cumulative values "
    "idempotently — exactly-once EFFECT on a plain-parquet lakehouse.  "
    "The final table must equal the batch aggregate over all events "
    "(cumulative update-mode state makes the LAST write per key the "
    "total, however the input was batched); the oracle recomputes that "
    "aggregate from the events table, so a lost batch, double-applied "
    "delta, or partition-swap bug goes driver-red.  The per-batch delta "
    "is persisted around the sink's multi-pass consumption and "
    "unpersisted after the commit.",
)
def v16_stream_lakehouse_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from agentic_etl_poc_spark import plan_capture
    from agentic_etl_poc_spark.sinks.parquet_sink import upsert_parquet

    src = _tribatch_stream_dir(spark, sf_dir)
    run_root = tempfile.mkdtemp(prefix="v16_lake_")
    tbl = os.path.join(run_root, "store")
    parts = _drain_parts_for(spark, [src], STREAM_DRAIN_PARTITIONS)

    def apply_batch(batch_df, batch_id: int) -> None:
        delta = batch_df.select(
            "d", "event_type", "n", "total_value"
        ).persist()
        try:
            plan_capture.note("lakehouse_delta", delta)
            upsert_parquet(
                delta,
                tbl,
                key_cols=["d", "event_type"],
                partition_by=["event_type"],
            )
        finally:
            delta.unpersist()

    with _drain_partitions(spark, parts):
        stream = stream_events(
            spark, src, watermark="3650 days", max_files_per_trigger=1
        )
        agg = stream.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .cast("string")
            .alias("total_value"),
        )
        q = (
            agg.writeStream.foreachBatch(apply_batch)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(run_root, "ckpt"))
            .start()
        )
        q.awaitTermination()
        _note_executed_stream_plan(q)
    return (
        spark.read.parquet(tbl)
        .select("d", "event_type", "n", "total_value")
        .orderBy("d", "event_type")
    )
