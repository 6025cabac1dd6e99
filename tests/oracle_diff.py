"""Local replica of the driver's DuckDB-differential comparison.

Runs a battery query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive exact value multiset — the same three gates
CORRECTNESS_r{N}.json records.

Both sides are fetched THROUGH PANDAS (Spark ``toPandas()``, DuckDB
``.df()``) because that is how the external driver canonicalizes before
hashing (r01 q28 traceback shows pandas ``sort_values``).  This matters:
DuckDB ``.df()`` renders HUGEINT (the result type of ``SUM`` over
integers) and DECIMAL as float64, and DATE as datetime64 — so an oracle
whose ``fetchall()`` values equal Spark's can still hash-mismatch under
the driver.  Rounds 2–3 proved it: t06/q24 were red ONLY under the
driver because the replica compared via ``fetchall()`` (HUGEINT →
Python int) and could not see the int-vs-float skew.  Comparing through
pandas makes the replica reproduce the driver's red/green row-for-row,
and doubles as a standing dtype audit: any oracle that reintroduces an
uncast integer SUM (or a raw DATE/DECIMAL output column) goes red here
before the driver ever sees it.

Exact (bit-level) float equality is intentional: the battery is
engineered to be cross-engine deterministic (see
agentic_etl_poc_spark/queries/core.py docstring).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from typing import Any

import duckdb

from agentic_etl_poc_spark.io_tables import ALL_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # a parquet table may be a directory of part files (sf1 tiles,
            # any engine's output at scale) — same file-or-directory rule
            # as sources/py_datasource.py
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    """Canonicalize one pandas cell into a hashable, comparable token.

    int and float deliberately render DIFFERENTLY (``3`` vs ``3.0``):
    the driver's pandas canonicalizer distinguishes them, and hiding the
    skew is exactly the replica bug that let t06/q24 slip through two
    rounds.  Likewise date vs timestamp and Decimal vs float stay
    distinct — battery outputs must be dtype-stable through pandas on
    both engines (in practice: BIGINT, strings, and decimal-strings).
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or v is pd.NA:
        return "NULL"
    if isinstance(v, np.generic):  # np.int64 / np.float64 / np.bool_ ...
        v = v.item()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            return "0.0"  # fold -0.0 and 0.0
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, float) and math.isnan(v):  # pragma: no cover
        return "NULL"
    try:
        if pd.isna(v):  # catches float('nan') boxed oddly
            return "NULL"
    except (TypeError, ValueError):
        pass
    return repr(v)


def _normalize_pdf(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    ordered = pdf[cols]
    out = sorted(
        tuple(_norm_cell(v) for v in row)
        for row in ordered.itertuples(index=False, name=None)
    )
    return cols, out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    result = {
        "rows_spark": len(s_pdf),
        "rows_duckdb": len(d_pdf),
        "cols_spark": sorted(s_pdf.columns),
        "cols_duckdb": sorted(d_pdf.columns),
        "ok": False,
        "detail": "",
    }
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        result["detail"] = (
            f"column mismatch: {sorted(s_pdf.columns)} != {sorted(d_pdf.columns)}"
        )
        return result
    # Standing dtype guard (the round-2..4 HUGEINT lesson, promoted): the
    # driver hashes through pandas on both engines, so a per-column dtype
    # KIND skew (DuckDB HUGEINT/DECIMAL -> float64 'f' vs Spark int64 'i')
    # is a driver-red even when fetchall values agree — and a zero-row
    # result would otherwise hide it from the cell-level compare below.
    kind_skew = {
        c: (s_pdf[c].dtype.kind, d_pdf[c].dtype.kind)
        for c in s_pdf.columns
        if s_pdf[c].dtype.kind != d_pdf[c].dtype.kind
    }
    if kind_skew:
        result["detail"] = (
            f"pandas dtype-kind mismatch (spark_kind, duckdb_kind): {kind_skew}; "
            f"full dtypes spark={list(s_pdf.dtypes.astype(str))} "
            f"duckdb={list(d_pdf.dtypes.astype(str))} — CAST the oracle "
            f"(integer SUMs to BIGINT; no raw doubles/dates/decimals in "
            f"checked outputs)"
        )
        return result
    if len(s_pdf) != len(d_pdf):
        result["detail"] = f"row count mismatch: {len(s_pdf)} != {len(d_pdf)}"
        return result
    cols, sn = _normalize_pdf(s_pdf)
    _, dn = _normalize_pdf(d_pdf)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        result["detail"] = (
            f"value mismatch (pandas dtypes spark={list(s_pdf.dtypes.astype(str))} "
            f"duckdb={list(d_pdf.dtypes.astype(str))}); "
            f"first diffs (spark, duckdb): {diffs}"
        )
        return result
    result["ok"] = True
    return result
