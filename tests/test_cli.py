"""CLI contract test — the reference's EP1 entry point, end-to-end as a
real subprocess: plan on stdin / -p file, greeting on stderr, PURE JSON on
stdout, exit code tracks the result status."""

from __future__ import annotations

import json
import subprocess
import sys


def _plan(tmp_path) -> str:
    out = tmp_path / "cli_out"
    return f"""
source:
  kind: parquet
  parquet:
    tables:
      orders: /root/testdata/sf0.001/orders.parquet
transform:
  sql: |
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
load:
  to: parquet
  file_path: {out}
  mode: replace
checks:
  min_rows: 3
  nonnull_cols: [o_orderpriority]
"""


def test_cli_stdin_json_stdout(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "agentic_etl_poc_spark.cli", "--master", "local[4]"],
        input=_plan(tmp_path),
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # stdout is PURE JSON (greeting and spark noise go to stderr)
    result = json.loads(proc.stdout)
    assert result["status"] == "ok"
    assert result["dq"]["rows"] == 5
    assert "reading plan" in proc.stderr


def test_cli_plan_file_and_failure_exit(tmp_path):
    bad = tmp_path / "bad_plan.yaml"
    bad.write_text(_plan(tmp_path).replace("min_rows: 3", "min_rows: 99999"))
    proc = subprocess.run(
        [sys.executable, "-m", "agentic_etl_poc_spark.cli", "--no-greet",
         "-p", str(bad), "--master", "local[4]"],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    result = json.loads(proc.stdout)
    assert result["status"] == "failed"
    assert "reading plan" not in proc.stderr


def test_plan_with_leading_comments_routes_to_plan_parser():
    """A plan file that opens with usage comments must be detected as a
    plan, not sent to the NL planner (the CLI's documented invocation of
    examples/weekly_orders.yaml broke exactly this way)."""
    from agentic_etl_poc_spark.plans.parser import looks_like_plan

    assert looks_like_plan("# usage: run me\n\nsource:\n  kind: csv\n")
    assert looks_like_plan(open("examples/weekly_orders.yaml").read())
    assert not looks_like_plan("# a comment\nload the weekly orders report")
    assert not looks_like_plan("summarize sales by region")


def test_cli_runs_weekly_orders_example(tmp_path):
    """The example's own header says `python -m ... -p <this file>` runs
    as-is — hold the CLI to it end-to-end (stdout stays pure JSON)."""
    text = open("/root/repo/examples/weekly_orders.yaml").read()
    out = str(tmp_path / "weekly_out")
    plan = tmp_path / "weekly.yaml"
    plan.write_text(text.replace("/tmp/weekly_orders_out", out))
    proc = subprocess.run(
        [sys.executable, "-m", "agentic_etl_poc_spark.cli", "--no-greet",
         "-p", str(plan), "--master", "local[4]"],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    result = json.loads(proc.stdout)
    assert proc.returncode == 0 and result["status"] == "ok", result
