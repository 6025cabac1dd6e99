"""NL planner adapter (EP2): prompt grammar -> YAML plan -> executed run.

Covers the reference's documented prompt format (etl_agent/agents.py:5-21
greeting), the injected-LLM contract (fenced output stripped), and the
honest failure for free-form NL the offline grammar can't ground.
"""

from __future__ import annotations

import json
import os

import pytest
import yaml

from agentic_etl_poc_spark.plans.planner import (
    PLANNER_SYSTEM,
    offline_plan,
    plan_from_prompt,
)
from agentic_etl_poc_spark.runtime import run_prompt

GREETING_STYLE_PROMPT = """\
limits:
  max_input_bytes: 1073741824  # optional 1 GiB cap
Source: db conn_str=$POSTGRES_URL
Query:
  SELECT sku, name, price AS salePrice, updated_at AS itemUpdateDate FROM upstream.products;
Transform:
  SELECT sku, name, salePrice FROM input_df
Load: conn_str=$POSTGRES_URL, table=analytics.products_db, mode=replace
Checks: min_rows=2, nonnull_cols=[sku,name,sale_price]
Verify: ts_col=loaded_at, max_lag_minutes=60
"""


def test_offline_plan_reference_grammar():
    plan = offline_plan(GREETING_STYLE_PROMPT)
    assert plan["limits"]["max_input_bytes"] == 1073741824
    assert plan["source"]["kind"] == "db"
    assert plan["source"]["db"]["conn_str"] == "$POSTGRES_URL"
    assert "upstream.products" in plan["source"]["db"]["query"]
    assert plan["load"] == {
        "to": "postgres",
        "conn_str": "$POSTGRES_URL",
        "table": "analytics.products_db",
        "mode": "replace",
    }
    assert plan["checks"] == {"min_rows": 2, "nonnull_cols": ["sku", "name", "sale_price"]}
    assert plan["verify"] == {"ts_col": "loaded_at", "max_lag_minutes": 60}


def test_offline_plan_csv_triplet_source():
    plan = offline_plan(
        "Source: csv sales=/d/sales.csv, features=/d/features.csv, stores=/d/stores.csv\n"
        "Load: file_path=/tmp/out.csv\n"
    )
    assert plan["source"]["csv"]["paths"] == {
        "sales": "/d/sales.csv",
        "features": "/d/features.csv",
        "stores": "/d/stores.csv",
    }
    assert plan["load"]["to"] == "csv"


def test_free_form_transform_needs_llm():
    with pytest.raises(ValueError, match="LLM"):
        offline_plan(
            "Source: parquet path=/x.parquet\n"
            "Transform:\n  clean data; aggregate numeric columns\n"
        )
    with pytest.raises(ValueError, match="LLM"):
        offline_plan("make me a sales dashboard")


def test_injected_llm_output_is_unfenced_and_validated():
    def llm(system: str, user: str) -> str:
        assert system == PLANNER_SYSTEM
        return "```yaml\nsource:\n  kind: csv\n```"

    out = plan_from_prompt("whatever", llm=llm)
    assert yaml.safe_load(out) == {"source": {"kind": "csv"}}

    def bad_llm(system: str, user: str) -> str:
        return "- not\n- a\n- mapping"

    with pytest.raises(ValueError, match="mapping"):
        plan_from_prompt("whatever", llm=bad_llm)


def test_run_prompt_nl_to_result(spark, tmp_path, monkeypatch):
    """E2E: NL prompt -> offline planner -> plan run -> verified CSV."""
    monkeypatch.delenv("ETL_AGENT_OFFLINE", raising=False)
    out = tmp_path / "nl_orders.csv"
    prompt = (
        "Source: parquet path=/root/testdata/sf0.001/orders.parquet\n"
        "Transform:\n"
        "  SELECT o_orderkey, o_custkey, o_totalprice FROM input_df\n"
        "  WHERE o_totalprice > 0\n"
        f"Load: file_path={out}, to=csv\n"
        "Checks: min_rows=10, nonnull_cols=[o_orderkey]\n"
        "Verify: min_rows=10\n"
    )
    res = run_prompt(spark, prompt)
    assert res["status"] == "ok", json.dumps(res)[:500]
    assert os.path.exists(out)
    with open(out) as f:
        header = f.readline().strip().split(",")
    assert header == ["o_orderkey", "o_custkey", "o_totalprice"]


def test_kv_grammar_properties():
    """The inline k=v grammar: lists keep embedded commas, ints parse,
    inline comments drop, arbitrary key order round-trips."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from agentic_etl_poc_spark.plans.planner import _parse_kv

    ident = st.text("abcdefghij_", min_size=1, max_size=8)

    @given(
        st.dictionaries(
            ident,
            st.one_of(
                st.integers(-1000, 1000),
                st.text("xyz./$", min_size=1, max_size=10),
                st.lists(st.text("abc", min_size=1, max_size=4), min_size=1, max_size=4),
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=100)
    def check(d):
        parts = []
        for k, v in d.items():
            if isinstance(v, list):
                parts.append(f"{k}=[{','.join(v)}]")
            else:
                parts.append(f"{k}={v}")
        assert _parse_kv(", ".join(parts)) == d

    check()
