"""Replica of the external driver's correctness sweep, runnable locally.

The driver builds its OWN vanilla SparkSession (Spark 4 defaults: ANSI on,
machine timezone, 200 shuffle partitions) and walks
``__spark_entry__.queries()`` in registry order, comparing each result
against ``oracle_sql()`` on DuckDB.  Round 2 proved local green does not
imply driver green (t06/q24 hash-red only under the driver): the repo test
session carries engine confs a vanilla session lacks.  This script IS the
missing reproduction path — a subprocess with a vanilla session, walking
the same order, with the same comparison.

Usage:
    python tools/driver_replica.py [--sf-dir DIR] [--limit N] [--names a,b]

Exit code 0 iff every checked query passes.  One JSON line per query on
stdout, summary JSON line last.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--limit",
        type=int,
        default=0,
        help="check only the first N registry entries (0 = all)",
    )
    ap.add_argument("--names", default="", help="comma-separated subset")
    ap.add_argument(
        "--out",
        default="",
        help="also write a CORRECTNESS_r{N}.json-shaped artifact here "
        "(rows_match/schema_match/hash_match per entry)",
    )
    args = ap.parse_args()

    # Vanilla session: NO engine confs — exactly what an external harness
    # builds.  The battery must self-apply its semantics via
    # io_tables.table -> session.ensure_semantics.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from tests.oracle_diff import compare, duckdb_conn

    queries, oracles = E.queries(), E.oracle_sql()
    con = duckdb_conn(args.sf_dir)

    picked = list(queries)
    if args.names:
        want = args.names.split(",")
        missing = [n for n in want if n not in queries]
        if missing:
            print(json.dumps({"error": f"unknown queries: {missing}"}))
            return 2
        picked = want
    if args.limit:
        picked = picked[: args.limit]

    n_fail = 0
    rows_out: dict[str, dict] = {}
    t_all = time.perf_counter()
    for name in picked:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, args.sf_dir)
            if name in oracles:
                r = compare(df, con, oracles[name])
                ok = bool(r["ok"])
                detail = "" if ok else r.get("detail", "")
                rows_out[name] = {
                    "rows_match": r["rows_spark"] == r["rows_duckdb"],
                    "schema_match": r["cols_spark"] == r["cols_duckdb"],
                    "hash_match": ok,
                    "spark_rows": r["rows_spark"],
                    "oracle_rows": r["rows_duckdb"],
                    "err": detail[:300] or None,
                }
            else:
                n_rows = len(df.collect())
                ok = n_rows >= 0  # rows-only check, like the driver
                detail = ""
                rows_out[name] = {
                    "rows_match": ok,
                    "schema_match": True,
                    "hash_match": None,
                    "spark_rows": n_rows,
                    "oracle_rows": None,
                    "err": None,
                }
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            ok, detail = False, f"{type(exc).__name__}: {exc}"[:300]
            rows_out[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": detail,
            }
        n_fail += 0 if ok else 1
        print(
            json.dumps(
                {
                    "name": name,
                    "ok": ok,
                    "sec": round(time.perf_counter() - t0, 3),
                    **({"detail": detail} if detail else {}),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "checked": len(picked),
                "failed": n_fail,
                "wall_sec": round(time.perf_counter() - t_all, 1),
                "sf_dir": args.sf_dir,
            }
        ),
        flush=True,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows_out, f, indent=1)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
