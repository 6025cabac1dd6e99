"""Benchmark runner — times the query battery at $SPARK_GRAFT_SF_DIR.

Output contract (round 2 — BENCH_r01 had parsed:null because the single
~2.5 KB JSON line overflowed the driver's capture window):

  line 1: short headline  {"metric": "battery_wall_sec", "value": N,
                           "unit": "sec", "sf": 0.1, "n_queries": 73}
  line 2: full record     headline + {"queries": {"q01_...": sec, ...}}
  line 3: headline again  (so a tail-window capture still holds a short,
                           complete JSON line whichever end survives)

The full per-query map is also written to BENCH_QUERIES.json at the repo
root for post-hoc inspection.

Each query is forced end-to-end with a noop sink (full compute, no driver
collect). Session setup/JVM start is excluded; a warmup action precedes
timing so first-query JIT/codegen cost doesn't pollute q01.

Ambient calibration (round 4 — the r2→r3 regression triage burned time
on what was partly machine drift): a fixed, data-independent compute
kernel is timed immediately after warmup and again after the battery,
and both readings ship in the headline as ``calib_sec: [first, last]``.
Cross-round wall comparisons should be normalized by the calibration
ratio before any per-query diff is read as a plan regression; a
first/last spread also flags in-run interference.  Set
``SPARK_GRAFT_BENCH_BASELINE=1`` to additionally write
BENCH_QUERIES_BUILDER.json — the builder-machine reference that driver
runs (which overwrite BENCH_QUERIES.json) must not clobber.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _calibrate(spark) -> float:
    """Fixed, data-independent CPU/JVM kernel: 50M-row range fold across
    32 partitions.  Same work every round on every machine — its wall
    time is the machine-speed yardstick."""
    t0 = time.perf_counter()
    spark.range(0, 50_000_000, 1, 32).selectExpr(
        "sum(id * 3 + id % 7) AS s"
    ).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from agentic_etl_poc_spark.queries import load_all
    from agentic_etl_poc_spark.session import get_spark, tune_for_data

    spark = get_spark(app_name="agentic-etl-poc-spark-bench")
    # Shared data-sized tuning (same rule io_tables.table applies to any
    # caller's session): ~64MB per shuffle partition, floor 8, cap 4x cores.
    tune_for_data(spark, sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    battery = load_all()

    # Warmup: trivial action so JVM/codegen startup isn't billed to q01,
    # and one untimed calibration so the kernel's own codegen JIT isn't
    # billed to the first timed reading (measured: 0.64 s cold vs 0.29 s
    # warm for identical work).
    _force(battery["q01_pricing_summary"].fn(spark, sf_dir).limit(1))
    _calibrate(spark)
    calib_first = _calibrate(spark)

    timings: dict[str, float] = {}
    total = 0.0
    for name in sorted(battery):
        fn = battery[name].fn
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    calib_last = _calibrate(spark)
    headline = {
        "metric": "battery_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "calib_sec": [calib_first, calib_last],
    }
    full = dict(headline, queries=timings)
    print(json.dumps(headline), flush=True)
    print(json.dumps(full), flush=True)
    print(json.dumps(headline), flush=True)
    here = os.path.dirname(__file__)
    targets = ["BENCH_QUERIES.json"]
    if os.environ.get("SPARK_GRAFT_BENCH_BASELINE"):
        targets.append("BENCH_QUERIES_BUILDER.json")
    for fname in targets:
        try:
            with open(os.path.join(here, fname), "w") as f:
                json.dump(full, f, indent=1, sort_keys=True)
        except OSError:
            pass  # bench result on stdout is the contract; files are a courtesy
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
