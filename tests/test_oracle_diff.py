"""Differential test: every battery query with an oracle must hash-match
DuckDB at sf0.001 (fast) — the local replica of the driver's t2 gate.

Set SPARK_GRAFT_ORACLE_SF=sf0.01 to run at the driver's actual scale.
"""

from __future__ import annotations

import os

import pytest

from agentic_etl_poc_spark.queries import load_all
from tests.conftest import TESTDATA
from tests.oracle_diff import compare, duckdb_conn

SF = os.path.join(TESTDATA, os.environ.get("SPARK_GRAFT_ORACLE_SF", "sf0.001"))

ALL = load_all()
WITH_ORACLE = sorted(name for name, spec in ALL.items() if spec.oracle is not None)
ROWS_ONLY = sorted(name for name, spec in ALL.items() if spec.oracle is None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, con, name):
    spec = ALL[name]
    df = spec.fn(spark, SF)
    result = compare(df, con, spec.oracle)
    assert result["ok"], f"{name}: {result['detail']}"
    assert result["rows_spark"] > 0, f"{name}: query returned no rows"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    df = ALL[name].fn(spark, SF)
    assert df.count() > 0, f"{name}: query returned no rows"
