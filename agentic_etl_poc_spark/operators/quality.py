"""Data-quality gate — the reference's signature feature, as ONE Spark job.

The reference checks row count then scans each nonnull column separately in
pandas (reference: etl_agent/ops.py:34-47).  Here all checks collapse into
a single aggregate:

    agg(count(*), sum(isnull(c1)), ..., max(ts))

one distributed pass, map-side partial aggregation, no per-column rescans —
the shape that still works when the frame is 100 TB.

Result dict matches the reference's JSON exactly:
``{"rows": n, "status": bool, "error": str|None}`` with first-failure-wins
error text (``min_rows check failed: n < m`` / ``nonnull check failed: c``);
optional freshness adds ``lag_minutes``/``fresh_ok`` (reference:
tools.py:106-118 declares freshness; the executor never passes it —
SURVEY §2.4 — we support it properly).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_check(
    df: DataFrame,
    min_rows: int = 1,
    nonnull_cols: list[str] | None = None,
    freshness_minutes: float | None = None,
    timestamp_col: str = "",
) -> dict:
    # A configured nonnull column that is missing from the frame is itself
    # a DQ FAILURE (misspelled config or a transform dropped the column) —
    # silently skipping it would make the gate vacuously pass, which is
    # the opposite of what a gate is for.  The reference fails loudly here
    # too (tools.py dq_check raises KeyError).
    requested = list(nonnull_cols or [])
    missing = [c for c in requested if c not in df.columns]
    nonnull_cols = [c for c in requested if c in df.columns]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in nonnull_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}"))
    check_fresh = bool(freshness_minutes) and timestamp_col in df.columns
    if check_fresh:
        aggs.append(F.max(F.col(timestamp_col).cast("timestamp")).alias("__max_ts"))

    from agentic_etl_poc_spark import plan_capture

    agg_df = df.agg(*aggs)
    plan_capture.note("dq_agg", agg_df)
    row = agg_df.collect()[0].asDict()
    rows = int(row["__rows"])

    ok, err = True, None
    if missing:
        ok, err = False, f"nonnull column not found: {', '.join(missing)}"
    elif rows < min_rows:
        ok, err = False, f"min_rows check failed: {rows} < {min_rows}"
    else:
        for c in nonnull_cols:
            if int(row[f"__nulls__{c}"] or 0) > 0:
                ok, err = False, f"nonnull check failed: {c}"
                break

    result: dict = {"rows": rows, "status": bool(ok), "error": err}
    if check_fresh:
        max_ts = row["__max_ts"]
        lag_min = None
        fresh_ok = True
        if max_ts is not None:
            if max_ts.tzinfo is None:
                max_ts = max_ts.replace(tzinfo=_dt.timezone.utc)
            now = _dt.datetime.now(_dt.timezone.utc)
            lag_min = (now - max_ts).total_seconds() / 60.0
            fresh_ok = lag_min <= float(freshness_minutes)
        result["lag_minutes"] = lag_min
        result["fresh_ok"] = fresh_ok
        if ok and not fresh_ok:
            result["status"] = False
            result["error"] = f"freshness check failed: lag {lag_min:.1f} min"
    return result


def observed_write(
    df: DataFrame,
    write_fn,
    nonnull_cols: list[str] | None = None,
) -> dict:
    """Single-action write-plus-metrics via Spark's Observation API: the
    row count and per-column null counts are accumulated DURING the sink
    action, so the pipeline pays ONE pass instead of DQ-then-write.

    Trade-off vs the pre-load gate (dq_check): metrics arrive only after
    the write has happened, so this is validate-after-write (pair it with
    a staging path + promote-on-ok), while dq_check aborts BEFORE the sink
    sees any data at the cost of a second pass.  Both shapes are needed;
    the reference only had the two-pass form (reference:
    etl_agent/templates.py:123-140).

    ``write_fn(observed_df)`` must trigger exactly one action.
    """
    from pyspark.sql import Observation

    nonnull_cols = [c for c in (nonnull_cols or []) if c in df.columns]
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in nonnull_cols:
        metrics.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    obs = Observation("dq")
    write_fn(df.observe(obs, *metrics))
    got = obs.get
    null_counts = {c: int(got[f"nulls_{c}"] or 0) for c in nonnull_cols}
    return {
        "rows": int(got["rows"]),
        "null_counts": null_counts,
        "nonnull_ok": all(v == 0 for v in null_counts.values()),
    }
