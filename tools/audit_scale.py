"""Targeted per-entry scale audit: time named battery entries IN
ISOLATION at a given sf dir — the probe behind BASELINE.md's sf1/sf10
growth tables (bench.py times the whole battery; a growth audit needs
each data-led entry measured alone, away from shared-frame fan-out and
neighboring-query cache effects).

Each entry runs ``--repeat`` times (default 2) and every reading is
reported; the FIRST reading at a fresh sf dir absorbs one-time staging
(NDJSON topics, bucketed tables) and session warmup, so growth ratios
should be read from the LAST reading.  A machine-speed calibration
kernel (bench.py's 50M-row fold) runs before and after, like bench.

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python tools/audit_scale.py \
        --sf-dir testdata_sf10 --names d04_minhash_lsh,g02_triangle_count

Output: one JSON line per entry + a summary line (machine-readable, so
the BASELINE.md table is a paste of measurements, not a transcription).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--names", required=True, help="comma-separated entries")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]

    from agentic_etl_poc_spark.queries import load_all
    from agentic_etl_poc_spark.queries.core import clear_shared_frames
    from agentic_etl_poc_spark.session import get_spark, tune_for_data

    import bench  # repo-root bench.py: reuse the calibration kernel

    spark = get_spark(
        app_name="agentic-etl-poc-spark-scale-audit",
        # the streaming entries drain to MEMORY sinks (test harness, not
        # the production sink); at sf10 a sessionize result overruns the
        # default 1 GiB driver result cap
        extra_conf={"spark.driver.maxResultSize": "4g"},
    )
    tune_for_data(spark, args.sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    battery = load_all()
    unknown = [n for n in names if n not in battery]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    _force(battery["q01_pricing_summary"].fn(spark, args.sf_dir).limit(1))
    # warm the calibration kernel like bench.py: the first execution pays
    # codegen JIT (~2-3x), which would read as ambient dirt
    bench._calibrate(spark)
    calib_first = bench._calibrate(spark)

    results = {}
    for name in names:
        secs = []
        for _ in range(args.repeat):
            # isolation: shared persisted intermediates (the MinHash
            # candidate-stats frame etc.) are dropped between readings so
            # each one prices the entry's OWN plan, not a warm cache
            clear_shared_frames(spark)
            t0 = time.perf_counter()
            _force(battery[name].fn(spark, args.sf_dir))
            secs.append(round(time.perf_counter() - t0, 3))
        results[name] = secs
        print(json.dumps({"name": name, "secs": secs}), flush=True)

    calib_last = bench._calibrate(spark)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "calib_sec": [calib_first, calib_last],
                "entries": results,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
