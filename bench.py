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
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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

    # Warmup: trivial action so JVM/codegen startup isn't billed to q01.
    _force(battery["q01_pricing_summary"].fn(spark, sf_dir).limit(1))

    timings: dict[str, float] = {}
    total = 0.0
    for name in sorted(battery):
        fn = battery[name].fn
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    headline = {
        "metric": "battery_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
    }
    full = dict(headline, queries=timings)
    print(json.dumps(headline), flush=True)
    print(json.dumps(full), flush=True)
    print(json.dumps(headline), flush=True)
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_QUERIES.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # bench result on stdout is the contract; the file is a courtesy
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
