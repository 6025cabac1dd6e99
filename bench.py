"""Benchmark runner — times the query battery at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "battery_wall_sec", "value": <total>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

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
    from agentic_etl_poc_spark.session import get_spark

    # Size shuffle partitions to the DATA, not the core count: at small SF
    # task-launch overhead dominates, so ~64MB per partition with a floor
    # of 8; at large SF this grows toward (and past) the core count.  AQE
    # still re-coalesces adaptively after each shuffle.
    total_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle_parts = max(8, min(4 * cpus, total_bytes // (64 * 1024 * 1024) or 8))

    spark = get_spark(
        app_name="agentic-etl-poc-spark-bench",
        extra_conf={"spark.sql.shuffle.partitions": str(shuffle_parts)},
    )
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

    print(
        json.dumps(
            {
                "metric": "battery_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
