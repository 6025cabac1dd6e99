"""Local replica of the driver's DuckDB-differential comparison.

Runs a battery query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive exact value multiset — the same three gates
CORRECTNESS_r{N}.json records.  Exact (bit-level) float equality is
intentional: the battery is engineered to be cross-engine deterministic
(see agentic_etl_poc_spark/queries/core.py docstring).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from agentic_etl_poc_spark.io_tables import ALL_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            return "0.0"  # fold -0.0 and 0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return repr(v)


def _normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]

    result = {
        "rows_spark": len(s_rows),
        "rows_duckdb": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duckdb": sorted(d_cols),
        "ok": False,
        "detail": "",
    }
    if sorted(s_cols) != sorted(d_cols):
        result["detail"] = f"column mismatch: {sorted(s_cols)} != {sorted(d_cols)}"
        return result
    if len(s_rows) != len(d_rows):
        result["detail"] = f"row count mismatch: {len(s_rows)} != {len(d_rows)}"
        return result
    _, sn = _normalize(s_cols, s_rows)
    _, dn = _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        result["detail"] = f"value mismatch; first diffs (spark, duckdb): {diffs}"
        return result
    result["ok"] = True
    return result
