"""CLI — contract parity with the reference (reference: etl_agent/cli.py:21-52):

- ``-p/--prompt`` takes inline text or a file path; stdin is the fallback.
- greeting goes to stderr so STDOUT STAYS PURE JSON.
- ``--greet/--no-greet`` toggles the greeting.
- result dict printed as JSON to stdout; exit 1 on failure status.

Usage::

    python -m agentic_etl_poc_spark.cli -p plan.yaml
    python -m agentic_etl_poc_spark.cli < plan.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="agentic-etl-spark")
    ap.add_argument("-p", "--prompt", help="plan text or a path to a plan file")
    ap.add_argument(
        "--greet", action=argparse.BooleanOptionalAction, default=True,
        help="print a greeting to stderr",
    )
    ap.add_argument("--master", default=None, help="spark master override")
    args = ap.parse_args(argv)

    if args.greet:
        print("agentic-etl-poc-spark: reading plan...", file=sys.stderr)

    text = args.prompt
    if text and os.path.exists(text):
        with open(text, encoding="utf-8") as f:
            text = f.read()
    if not text:
        text = sys.stdin.read()
    if not text.strip():
        print(json.dumps({"status": "failed", "error": "empty prompt"}))
        return 1

    from agentic_etl_poc_spark.runtime import run_prompt
    from agentic_etl_poc_spark.session import get_spark

    spark = get_spark(app_name="agentic-etl-poc-spark-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        result = run_prompt(spark, text)
    except Exception as e:
        print(json.dumps({"status": "failed", "error": str(e)}))
        return 1
    print(json.dumps(result))
    return 0 if result.get("status") == "ok" else 1


if __name__ == "__main__":
    sys.exit(main())
