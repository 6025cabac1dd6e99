"""Plan parsing, kind inference, and dialect-shim unit tests."""

from __future__ import annotations

import os

from agentic_etl_poc_spark.functions.dialect import (
    rewrite_duckdb_sql,
    translate_strftime_tokens,
)
from agentic_etl_poc_spark.plans.model import plan_from_dict
from agentic_etl_poc_spark.plans.parser import (
    infer_kind,
    looks_like_plan,
    parse_plan,
    strip_wrappers,
    to_yaml_map,
)

PLAN_MIN = """
source:
  kind: csv
  csv: {path: /tmp/x.csv}
transform:
  sql: SELECT * FROM input_df
load:
  to: csv
  file_path: /tmp/out.csv
"""


def test_parse_minimal_plan():
    plan = parse_plan(PLAN_MIN)
    assert plan.source.kind == "csv"
    assert plan.load.to == "csv"
    assert plan.checks.min_rows == 1  # default
    assert plan.max_input_bytes == 1_000_000_000  # default


def test_fenced_yaml_stripped():
    fenced = f"```yaml\n{PLAN_MIN}\n```"
    assert parse_plan(fenced).source.kind == "csv"


def test_heredoc_stripped():
    hd = f"mel <<EOF\n{PLAN_MIN}\nEOF"
    assert strip_wrappers(hd).startswith("\nsource:") or parse_plan(hd)


def test_env_expansion(monkeypatch):
    monkeypatch.setenv("MY_SECRET_PATH", "/tmp/secret.csv")
    plan = parse_plan(PLAN_MIN.replace("/tmp/x.csv", "$MY_SECRET_PATH"))
    assert plan.source.csv.path == "/tmp/secret.csv"


def test_duplicate_keys_last_wins():
    # the canonical prompt.txt nests `transform:` twice (SURVEY §0.3)
    doc = to_yaml_map(
        "transform:\n  sql: first\ntransform:\n  sql: second\n"
        "source: {kind: csv}\nload: {to: csv}"
    )
    assert doc["transform"]["sql"] == "second"


def test_looks_like_plan():
    assert looks_like_plan(PLAN_MIN)
    assert not looks_like_plan("please build me a pipeline for sales data")


def test_infer_kind_heuristics():
    mk = lambda d: plan_from_dict({"source": d, "transform": {}, "load": {}}).source
    assert infer_kind(mk({"kind": "db", "db": {}})) == "db"
    assert infer_kind(mk({"kind": "auto", "db": {"conn_str": "postgresql://x/y"}})) == "db"
    assert infer_kind(mk({"kind": "auto", "api": {"url": "https://x"}})) == "api"
    assert infer_kind(mk({"kind": "auto", "csv": {"path": "a.CSV"}})) == "csv"
    assert infer_kind(mk({"kind": "auto", "json": {"path": "a.ndjson"}})) == "json"
    assert infer_kind(mk({"kind": "auto"})) == "api"  # conservative default


def test_strftime_token_translation():
    assert translate_strftime_tokens("%m/%d/%Y") == "MM/dd/yyyy"
    assert translate_strftime_tokens("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"


def test_rewrite_try_strptime_nested_args():
    sql = "SELECT COALESCE(try_strptime(CAST(Date AS VARCHAR), '%m/%d/%Y'), try_strptime(CAST(Date AS VARCHAR), '%Y-%m-%d')) AS d FROM t"
    out = rewrite_duckdb_sql(sql, date_trunc_as_date=False)
    assert "try_strptime" not in out
    # bare VARCHAR also rewritten to STRING (Spark requires a length on VARCHAR)
    assert "to_timestamp(CAST(Date AS STRING), 'MM/dd/yyyy')" in out
    assert "to_timestamp(CAST(Date AS STRING), 'yyyy-MM-dd')" in out


def test_rewrite_try_cast_and_date_trunc():
    out = rewrite_duckdb_sql(
        "SELECT TRY_CAST(x AS INT), DATE_TRUNC('week', d) FROM t"
    )
    assert "TRY_CAST" not in out
    assert "CAST(x AS INT)" in out
    assert "CAST(date_trunc('week', d) AS DATE)" in out


def test_json_selector_parsing():
    from agentic_etl_poc_spark.sources.json_source import parse_selector

    assert parse_selector("data['products']") == ["products"]
    assert parse_selector("data[\"a\"][\"b\"]") == ["a", "b"]
    assert parse_selector("$.records") == ["records"]
    assert parse_selector("$.data.products") == ["data", "products"]
    assert parse_selector("records") == ["records"]
    assert parse_selector("") == []
