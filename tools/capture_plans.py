"""Capture ``explain("formatted")`` for named battery entries into
plans/r<N>/<name>_<tag>.txt — the optimization round's evidence files
(the judge reads the committed plan text against the code's claims;
the plans must come from the same engine session shape bench uses).

Usage:
    python tools/capture_plans.py --names d04_minhash_lsh,g02_triangle_count \
        --tag before [--sf-dir /root/testdata/sf0.1] [--round r12]

Notes:
- The DataFrame is built but NOT executed; ``explain`` shows the
  AQE-initial plan (isFinalPlan=false), which is where Exchange count,
  join strategy, PushedFilters/ReadSchema, and Python-eval nodes live.
- Entries whose build step runs eager work (localCheckpoint loops,
  staged streams) still run that work — capture is only as lazy as the
  entry itself.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True, help="before|after")
    ap.add_argument("--round", default="r12")
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]

    from agentic_etl_poc_spark.queries import load_all
    from agentic_etl_poc_spark.session import get_spark, tune_for_data

    spark = get_spark(app_name="plan-capture")
    tune_for_data(spark, args.sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    battery = load_all()

    out_dir = os.path.join(REPO_ROOT, "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = battery[name].fn(spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
