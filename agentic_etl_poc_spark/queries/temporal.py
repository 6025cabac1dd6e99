"""Temporal / event battery.

Covers the reference's date semantics — try-parse-with-fallback-to-NULL
(reference: prompt.txt:24-30 ``try_strptime`` chain; SURVEY §0.4) and
Monday-based DATE_TRUNC('week') (reference: prompt.txt:53; SURVEY §0.5) —
plus event-time constructs the reference lacks but a Spark engine gives for
free: running windows, as-of joins, range joins, tumbling windows, JSON
extraction.

Temporal outputs are rendered to strings with explicit patterns on both
engines (determinism rule 3, queries/core.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from agentic_etl_poc_spark.io_tables import table
from agentic_etl_poc_spark.queries.core import register

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "q03_try_dateparse",
    oracle="""
WITH s AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date'
         WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%m/%d/%Y')
         ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw_date
  FROM orders
)
SELECT o_orderkey, raw_date,
  strftime(COALESCE(try_strptime(raw_date, '%m/%d/%Y'),
                    try_strptime(raw_date, '%Y-%m-%d')), '%Y-%m-%d') AS parsed_date
FROM s
ORDER BY o_orderkey
""",
    description="try-parse date with format fallback, NULL on mismatch "
    "(reference: prompt.txt:24-30 try_strptime('%m/%d/%Y') → '%Y-%m-%d'); "
    "Spark to_date with ANSI off + CORRECTED parser = same NULL semantics; "
    "format tokens translated %m/%d/%Y → MM/dd/yyyy (SURVEY §7 dialect shim).",
)
def q03_try_dateparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("not-a-date"))
        .when(F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    parsed = F.coalesce(
        F.to_date(F.col("raw_date"), "MM/dd/yyyy"),
        F.to_date(F.col("raw_date"), "yyyy-MM-dd"),
    )
    return (
        o.select("o_orderkey", raw.alias("raw_date"))
        .select(
            "o_orderkey",
            "raw_date",
            F.date_format(parsed, "yyyy-MM-dd").alias("parsed_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q04_weekly_rollup",
    oracle="""
SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS week_total
FROM orders
GROUP BY 1
ORDER BY week
""",
    description="DATE_TRUNC('week') rollup — Monday-based in both engines "
    "(reference: prompt.txt:53; SURVEY §0.5).",
)
def q04_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    week = F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd")
    return (
        o.groupBy(week.alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("week_total"),
        )
        .orderBy("week")
    )


@register(
    "q11_running_window",
    oracle=f"""
SELECT user_id, event_id,
  strftime(ts, '{TS_FMT_DUCK}') AS ts_s,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
FROM events
ORDER BY user_id, event_id
""",
    description="Running-sum and LAG window frames over event time.",
)
def q11_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(running)
        .cast("double")
        .alias("running_value"),
        F.lag("value", 1).over(order).alias("prev_value"),
    ).orderBy("user_id", "event_id")


@register(
    "q17_hourly_json",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS hour,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
""",
    description="Hourly bucketing + JSON field extraction from a string "
    "column (get_json_object ≡ json_extract_string).",
)
def q17_hourly_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), TS_FMT_SPARK)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.groupBy(hour.alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


@register(
    "q18_asof_join",
    oracle=f"""
WITH u AS (
  SELECT user_id, ts, event_id, value AS view_value,
         0 AS is_click, CAST(NULL AS BIGINT) AS click_id,
         CAST(NULL AS DOUBLE) AS click_value
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE),
         1, event_id, value
  FROM events WHERE event_type = 'click'
), m AS (
  SELECT *,
    LAST_VALUE(view_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_click, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
  FROM u
)
SELECT user_id, click_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s,
       click_value, last_view_value
FROM m WHERE is_click = 1
ORDER BY user_id, click_id
""",
    description="Keyed as-of (backward) join: each click picks the latest "
    "view at-or-before it per user. Implemented as union + last_value-"
    "ignore-nulls window partitioned by key — shuffles once on the key, "
    "scales to any number of keys (no cross/range explosion at 100 TB).",
)
def q18_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("view_value"),
        F.lit(0).alias("is_click"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("double").alias("view_value"),
        F.lit(1).alias("is_click"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    u = views.unionByName(clicks)
    w = Window.partitionBy("user_id").orderBy("ts", "is_click", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        u.withColumn(
            "last_view_value", F.last("view_value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_click") == 1)
        .select(
            "user_id",
            "click_id",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
            "click_value",
            "last_view_value",
        )
        .orderBy("user_id", "click_id")
    )


@register(
    "q19_range_join",
    oracle="""
SELECT o_orderpriority,
  COUNT(*) AS n_lines,
  CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_lag_days,
  CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_lag_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Equi + range (interval) join predicate; the equi key keeps "
    "it a hash join with a residual range filter — no unbounded range "
    "explosion at scale.",
)
def q19_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & F.col("l_shipdate").between(
        F.col("o_orderdate"), F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(lag_days).cast("bigint").alias("total_lag_days"),
            (F.sum(lag_days).cast("double") / F.count(F.lit(1))).alias("avg_lag_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q20_tumbling_window",
    oracle=f"""
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 * 1000000),
                '{TS_FMT_DUCK}') AS window_start,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    description="6-hour tumbling window aggregation via F.window — the same "
    "expression works under Structured Streaming with a watermark "
    "(streaming module); epoch-aligned like Spark's window().",
)
def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q24_sessionize_batch",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT * EXCLUDE (new_sess),
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
  FROM flagged
)
SELECT user_id, sess_no,
       strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
       strftime(MAX(ts), '{TS_FMT_DUCK}') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS total_value
FROM numbered
GROUP BY user_id, sess_no
ORDER BY user_id, sess_no
""",
    description="Batch sessionization via gaps-and-islands (lag + running "
    "sum of session-break flags + groupBy): the batch twin of "
    "streaming/events.py::sessionize — same 30-min inactivity gap, same "
    "per-session aggregates, so batch backfill and the streaming operator "
    "agree.  One shuffle on user_id serves both window functions and the "
    "final aggregation.",
)
def q24_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = (
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800)
    ).cast("int")
    numbered = e.select(
        "user_id", "event_id", "ts", "value", new_sess.alias("new_sess")
    ).withColumn(
        "sess_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "sess_no")
        .agg(
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT_SPARK).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # Decimal-string output: the exact decimal sum is rendered to a
            # fixed-scale string in-engine, so no downstream double
            # canonicalizer can drift (r2 driver hash-red on the double
            # despite bit-exact local replicas).
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .cast("string")
            .alias("total_value"),
        )
        .orderBy("user_id", "sess_no")
    )


@register(
    "q26_sliding_window",
    oracle=f"""
WITH exploded AS (
  SELECT event_type, value,
         make_timestamp((CAST(floor(epoch(ts) / 10800) AS BIGINT) - j)
                        * 10800 * 1000000) AS window_start
  FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS j)
)
SELECT strftime(window_start, '{TS_FMT_DUCK}') AS window_start,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM exploded
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    description="6-hour windows sliding every 3 hours (each event lands in "
    "2 overlapping windows) — completes the event-time trio with q20 "
    "(tumbling) and q24 (session).  Spark's window() expands events into "
    "their windows map-side (Expand), then one aggregation; the same "
    "expression runs under Structured Streaming with a watermark.",
)
def q26_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "6 hours", "3 hours").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q31_date_spine_gapfill",
    oracle=f"""
WITH bounds AS (
  SELECT date_trunc('week', MIN(o_orderdate)) AS lo,
         date_trunc('week', MAX(o_orderdate)) AS hi
  FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 7 DAY)) AS DATE) AS week
  FROM bounds
),
weekly AS (
  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
  FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0
  GROUP BY 1
)
SELECT strftime(s.week, '%Y-%m-%d') AS week,
       COALESCE(w.n_orders, 0) AS n_orders,
       COALESCE(w.total, 0.0) AS total,
       (w.week IS NULL) AS gap_filled
FROM spine s LEFT JOIN weekly w ON s.week = w.week
ORDER BY week
""",
    description="Time-series gap filling: a generated continuous week "
    "spine (sequence + explode — no data needed to enumerate time) LEFT "
    "JOINed to sparse weekly aggregates, missing weeks zero-filled and "
    "flagged.  The spine is tiny (one row per period) and broadcasts; the "
    "aggregate side shuffles once — regular-cadence reporting over "
    "irregular events at any scale.",
)
def q31_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("week", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("week", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 7 DAY"))
        ).alias("week")
    )
    weekly = (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderkey") % 7 == 0)
        )
        .groupBy(
            F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total"),
        )
    )
    w = weekly.alias("w")
    s = spine.alias("s")
    return (
        s.join(w, F.col("s.week") == F.col("w.week"), "left")
        .select(
            F.date_format(F.col("s.week"), "yyyy-MM-dd").alias("week"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
            F.col("w.week").isNull().alias("gap_filled"),
        )
        .orderBy("week")
    )


@register(
    "q33_scd2_versions",
    oracle=f"""
WITH changes AS (
  SELECT user_id, ts, event_type, value FROM events WHERE user_id < 50
)
SELECT user_id,
  event_type AS attr_value,
  strftime(ts, '{TS_FMT_DUCK}') AS valid_from,
  strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type),
           '{TS_FMT_DUCK}') AS valid_to,
  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL)
    AS is_current
FROM changes
ORDER BY user_id, valid_from, attr_value
""",
    description="SCD Type-2 dimension versioning from a change feed: each "
    "change opens a version (valid_from = its timestamp) and closes the "
    "previous one (valid_to = LEAD over the entity's timeline); the open "
    "version is flagged current.  One window over (entity, time) — one "
    "shuffle on the entity key, the standard warehouse history-table "
    "build at any scale.",
)
def q33_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    valid_to = F.lead("ts").over(w)
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("attr_value"),
            F.date_format("ts", TS_FMT_SPARK).alias("valid_from"),
            F.date_format(valid_to, TS_FMT_SPARK).alias("valid_to"),
            valid_to.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "attr_value")
    )


@register(
    "q42_json_struct_parse",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.tag') AS tag,
       (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
FROM events
WHERE event_id < 3000
ORDER BY event_id
""",
    description="Typed JSON parsing via from_json with a declared struct "
    "schema (Jackson parse once, typed fields out) — vs q17's per-path "
    "get_json_object extraction, which re-parses the document per path.  "
    "At scale the single-parse form wins when several fields are read; "
    "same values either way, so one oracle covers both.",
)
def q42_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    parsed = F.from_json(F.col("props"), "k bigint, tag string")
    return (
        e.select("event_id", parsed.alias("p"))
        .select(
            "event_id",
            F.col("p.k").alias("k"),
            F.col("p.tag").alias("tag"),
            F.col("p.k").isNotNull().alias("has_k"),
        )
        .orderBy("event_id")
    )


@register(
    "q52_funnel",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
),
agg AS (
  SELECT
    CAST(COUNT(t_view) AS BIGINT) AS viewed,
    CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked,
    CAST(SUM(CASE WHEN t_click > t_view AND t_purchase > t_click
             THEN 1 ELSE 0 END) AS BIGINT) AS purchased
  FROM per_user
)
SELECT stage, n_users,
       CAST(n_users AS DOUBLE) / viewed AS frac_of_viewers
FROM (
  SELECT 1 AS ord, 'view' AS stage, viewed AS n_users, viewed FROM agg
  UNION ALL
  SELECT 2, 'click', clicked, viewed FROM agg
  UNION ALL
  SELECT 3, 'purchase', purchased, viewed FROM agg
)
ORDER BY ord
""",
    description="Conversion funnel (view -> click -> purchase): one "
    "groupBy(user) computes each user's first time per stage, then a "
    "single-row conditional aggregate counts time-ordered progressions "
    "(t_view < t_click < t_purchase).  The whole funnel is ONE shuffle "
    "keyed on user plus a scalar reduce — the shape that handles 10^9 "
    "users; no per-stage self-joins, no event-sequence explode.",
)
def q52_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    # coalesce(…, 0) mirrors the oracle's CASE … ELSE 0: without it, a
    # corpus where EVERY user misses a stage sums all-NULL comparisons to
    # NULL in Spark while DuckDB's CASE yields 0 — a data-dependent
    # engine/oracle divergence.
    agg = per_user.agg(
        F.count("t_view").alias("viewed"),
        F.sum(
            F.coalesce(
                (F.col("t_click") > F.col("t_view")).cast("long"), F.lit(0)
            )
        ).alias("clicked"),
        F.sum(
            F.coalesce(
                (
                    (F.col("t_click") > F.col("t_view"))
                    & (F.col("t_purchase") > F.col("t_click"))
                ).cast("long"),
                F.lit(0),
            )
        ).alias("purchased"),
    )
    stages = agg.select(
        F.expr(
            "stack(3, 1, 'view', viewed, 2, 'click', clicked, "
            "3, 'purchase', purchased) as (ord, stage, n_users)"
        ),
        F.col("viewed"),
    )
    return (
        stages.select(
            "stage",
            "n_users",
            (F.col("n_users").cast("double") / F.col("viewed")).alias(
                "frac_of_viewers"
            ),
            "ord",
        )
        .orderBy("ord")
        .drop("ord")
    )


@register(
    "q53_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events
),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_week
),
joined AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
           AS week_offset,
         a.user_id
  FROM activity a JOIN firsts f USING (user_id)
)
SELECT strftime(j.cohort_week, '%Y-%m-%d') AS cohort_week,
       j.week_offset,
       CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size AS retention
FROM joined j JOIN cohort_sizes s USING (cohort_week)
GROUP BY j.cohort_week, j.week_offset, s.cohort_size
ORDER BY cohort_week, week_offset
""",
    description="Weekly retention cohorts: users bucketed by first-seen "
    "week, per-cohort active-user counts at each week offset, retention "
    "as a fraction of cohort size.  Three shuffles total (first-seen per "
    "user, distinct user-weeks, cohort re-aggregation) and the cohort "
    "sizes broadcast back — the standard cohort-table shape, linear in "
    "events and independent of the cohort-matrix width.",
)
def q53_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = activity.join(firsts, "user_id").select(
        "cohort_week",
        (
            F.datediff(F.col("active_week"), F.col("cohort_week"))
            / F.lit(7)
        )
        .cast("bigint")
        .alias("week_offset"),
        "user_id",
    )
    return (
        joined.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            (
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )
