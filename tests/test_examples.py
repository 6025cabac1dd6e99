"""The shipped example plans must stay parseable and (where they point at
bundled test data) runnable."""

from __future__ import annotations

import glob
import os
import shutil

from agentic_etl_poc_spark.plans.parser import parse_plan
from agentic_etl_poc_spark.runtime import run_from_plan

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")


def test_all_examples_parse(monkeypatch):
    monkeypatch.setenv("DATA_DIR", "/tmp/data")
    monkeypatch.setenv("OUT_DIR", "/tmp/out")
    paths = glob.glob(os.path.join(EXAMPLES, "*.yaml"))
    assert len(paths) >= 3
    for p in paths:
        plan = parse_plan(open(p).read())
        assert plan.transform.sql or plan.transform.steps, p


def test_weekly_orders_example_runs(spark, tmp_path):
    text = open(os.path.join(EXAMPLES, "weekly_orders.yaml")).read()
    out = str(tmp_path / "weekly_out")
    text = text.replace("/tmp/weekly_orders_out", out)
    result = run_from_plan(spark, text)
    assert result["status"] == "ok", result
    assert spark.read.parquet(out).count() >= 10


def test_incremental_example_runs(spark, tmp_path):
    text = open(os.path.join(EXAMPLES, "incremental_orders.yaml")).read()
    out = str(tmp_path / "inc_out")
    ledger = str(tmp_path / "ledger.db")
    text = text.replace("/tmp/orders_increments", out).replace(
        "/tmp/etl_runs_example.db", ledger
    )
    r1 = run_from_plan(spark, text)
    assert r1["status"] == "ok" and r1["dq"]["rows"] > 0
    r2 = run_from_plan(spark, text)  # nothing new on the second tick
    assert r2["status"] == "ok" and r2["dq"]["rows"] == 0
    shutil.rmtree(out, ignore_errors=True)


def test_nl_prompt_example_runs(spark, tmp_path, monkeypatch):
    """The NL-prompt example goes stdin-text -> offline planner -> YAML ->
    executed pipeline, same as `cli -p examples/nl_orders_prompt.txt`."""
    import json

    from agentic_etl_poc_spark.runtime import run_prompt

    monkeypatch.delenv("ETL_AGENT_OFFLINE", raising=False)
    text = open(os.path.join(EXAMPLES, "nl_orders_prompt.txt")).read()
    out = str(tmp_path / "nl_report.csv")
    text = text.replace("/tmp/nl_orders_report.csv", out)
    result = run_prompt(spark, text)
    assert result["status"] == "ok", json.dumps(result)[:400]
    with open(out) as f:
        assert f.readline().strip().split(",") == [
            "o_orderpriority", "n_orders", "revenue",
        ]


def test_json_events_example_runs(spark, tmp_path):
    """The JSON example exercises the nested-object flatten path against
    the bundled NDJSON fixture."""
    text = open(os.path.join(EXAMPLES, "json_events.yaml")).read()
    out = str(tmp_path / "json_out.csv")
    text = text.replace("/tmp/json_events_summary.csv", out).replace(
        "examples/data/events_sample.ndjson",
        os.path.join(EXAMPLES, "data", "events_sample.ndjson"),
    )
    result = run_from_plan(spark, text)
    assert result["status"] == "ok", result
    got = spark.read.option("header", True).csv(out)
    assert got.count() >= 1
    assert set(got.columns) == {"event_type", "n", "n_users", "total_value"}


def test_multi_source_example_runs(spark, tmp_path, monkeypatch):
    # the example uses repo-relative paths (parquet fact + NDJSON dim +
    # file:// rates feed) — run from the repo root like the CLI would
    monkeypatch.chdir(os.path.join(EXAMPLES, ".."))
    text = open(os.path.join(EXAMPLES, "multi_source.yaml")).read()
    out = str(tmp_path / "revenue.csv")
    text = text.replace("/tmp/multi_source_revenue.csv", out)
    result = run_from_plan(spark, text)
    assert result["status"] == "ok", result
    rows = {
        r["category"]: float(r["revenue_usd"])
        for r in spark.read.option("header", True).csv(out).collect()
    }
    assert set(rows) == {"hardware", "media", "electronics"}
    # hand-check one cell: media = ebook 3 qty * 5.0 USD + sticker 5 * 2.5
    assert abs(rows["media"] - (3 * 5.0 + 5 * 2.5)) < 1e-9


def test_quarantine_example_runs(spark, tmp_path):
    text = open(os.path.join(EXAMPLES, "quarantine_orders.yaml")).read()
    out = str(tmp_path / "clean")
    bad = str(tmp_path / "bad")
    text = text.replace("/tmp/quarantine_orders_out", out).replace(
        "/tmp/quarantine_orders_bad", bad
    )
    result = run_from_plan(spark, text)
    assert result["status"] == "ok", result
    assert result["dq"]["quarantined"] > 0
    n_clean = spark.read.parquet(out).count()
    n_bad = spark.read.parquet(bad).count()
    assert n_bad == result["dq"]["quarantined"]
    # lossless split: every transformed row landed in exactly one artifact
    assert n_clean + n_bad == 1500


def test_stream_events_example_runs(spark, tmp_path):
    """The streaming-plan example drains a staged NDJSON topic through the
    full lifecycle; a second run with the same checkpoint must be a no-op
    (exactly-once re-run, the example's headline claim)."""
    import json as _json

    from agentic_etl_poc_spark.runtime import run_from_plan

    topic = tmp_path / "topic"
    topic.mkdir()
    rows = [
        {"event_id": i, "ts": f"2024-01-01T0{i}:00:00", "user_id": i % 3,
         "event_type": t, "value": 1.5 * i, "props": "{}"}
        for i, t in enumerate(["click", "view", "error", "purchase"])
    ]
    (topic / "tick1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n"
    )
    text = open(os.path.join(EXAMPLES, "stream_events.yaml")).read()
    out = tmp_path / "out"
    text = text.replace("/tmp/stream_topic", str(topic)).replace(
        "/tmp/stream_events_out", str(out)
    )
    r1 = run_from_plan(spark, text)
    assert r1["status"] == "ok", r1
    assert r1["dq"]["rows"] == 3  # 'error' filtered out
    r2 = run_from_plan(spark, text)
    assert r2["status"] == "ok", r2
    assert spark.read.parquet(str(out)).count() == 3
