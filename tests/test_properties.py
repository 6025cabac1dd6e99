"""Property-based tests (hypothesis) for the pure-Python layers: dialect
rewriting, plan parsing, merge-statement generation, salting math.  No
SparkSession needed — these run in milliseconds.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_etl_poc_spark.functions.dialect import (
    rewrite_duckdb_sql,
    translate_strftime_tokens,
)
from agentic_etl_poc_spark.plans.model import plan_from_dict
from agentic_etl_poc_spark.plans.parser import infer_kind, parse_plan
from agentic_etl_poc_spark.sinks.jdbc_sink import merge_statements

_ident = st.text(string.ascii_lowercase, min_size=1, max_size=8)


@given(st.lists(st.sampled_from(["%Y", "%m", "%d", "%H", "%M", "%S", "-", "/", " ", ":"]), max_size=12))
def test_strftime_translation_total(parts):
    """Every strptime-token string translates without leftover % tokens."""
    fmt = "".join(parts)
    out = translate_strftime_tokens(fmt)
    assert "%" not in out
    # separators survive verbatim
    for ch in "-/ :":
        assert fmt.count(ch) == out.count(ch)


@given(
    col=_ident,
    fmt1=st.sampled_from(["%m/%d/%Y", "%Y-%m-%d", "%d.%m.%Y"]),
    fmt2=st.sampled_from(["%Y-%m-%d", "%H:%M:%S"]),
)
def test_rewrite_nested_strptime_balanced(col, fmt1, fmt2):
    """COALESCE(try_strptime(x, a), try_strptime(x, b)) rewrites BOTH calls
    and keeps parens balanced, whatever the identifiers."""
    sql = (
        f"SELECT COALESCE(try_strptime(CAST({col} AS VARCHAR), '{fmt1}'), "
        f"try_strptime(CAST({col} AS VARCHAR), '{fmt2}')) AS d FROM t"
    )
    out = rewrite_duckdb_sql(sql)
    assert "try_strptime" not in out
    assert out.count("(") == out.count(")")
    assert "to_timestamp" in out


@given(st.sampled_from([
    ({"db": {"conn_str": "postgresql://u:p@h/db"}}, "db"),
    ({"api": {"url": "https://api.example.test/x"}}, "api"),
    ({"csv": {"path": "data/file.csv"}}, "csv"),
    ({"json": {"path": "data/file.ndjson"}}, "json"),
    ({"json": {"path": "s3a://bucket/file.json"}}, "json"),
]))
def test_infer_kind_cases(case):
    src_dict, want = case
    src = plan_from_dict(
        {"source": {"kind": "auto", **src_dict}, "transform": {}, "load": {}}
    ).source
    assert infer_kind(src) == want


@given(
    keys=st.lists(_ident, min_size=1, max_size=3, unique=True),
    extras=st.lists(_ident, min_size=0, max_size=4, unique=True),
)
@settings(max_examples=50)
def test_merge_statements_shape(keys, extras):
    cols = keys + [c for c in extras if c not in keys]
    stmts = merge_statements("tgt", "tgt_stg", keys, cols)
    assert len(stmts) == 3
    ddl, idx, merge = stmts
    assert ddl.startswith('CREATE TABLE IF NOT EXISTS "tgt" ')
    assert "UNIQUE INDEX" in idx
    for k in keys:
        assert f'"{k}"' in merge
    # every non-key column gets an EXCLUDED update; keys never do
    non_keys = [c for c in cols if c not in keys]
    for c in non_keys:
        assert f'"{c}" = EXCLUDED."{c}"' in merge
    if non_keys:
        for k in keys:
            assert f'"{k}" = EXCLUDED."{k}"' not in merge


@given(st.integers(min_value=1, max_value=64), st.integers())
def test_salt_range_math(parts, h):
    """pmod semantics: salts always land in [0, parts)."""
    assert 0 <= h % parts < parts


def test_plan_parse_duplicate_keys_and_env(monkeypatch):
    monkeypatch.setenv("PBT_OUT", "/tmp/out.csv")
    plan = parse_plan(
        """
limits: {max_input_bytes: 1000}
transform:
  sql: SELECT 1
transform:
  sql: SELECT 2 AS x
load: {to: csv, file_path: $PBT_OUT}
"""
    )
    assert plan.transform.sql.strip() == "SELECT 2 AS x"
    assert plan.load.file_path == "/tmp/out.csv"


def test_to_jdbc_url_translation():
    from agentic_etl_poc_spark.sources.jdbc_source import to_jdbc_url

    url, props = to_jdbc_url("postgresql+psycopg2://u:pw@dbhost:5433/mydb")
    assert url == "jdbc:postgresql://dbhost:5433/mydb"
    assert props == {"user": "u", "password": "pw"}
    # default port + postgres alias
    url, props = to_jdbc_url("postgres://u@dbhost/mydb")
    assert url == "jdbc:postgresql://dbhost:5432/mydb"
    assert props == {"user": "u"}
    # jdbc passthrough
    url, props = to_jdbc_url("jdbc:mysql://h:3306/d")
    assert url == "jdbc:mysql://h:3306/d" and props == {}
    # garbage rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        to_jdbc_url("not a conn string")
