"""Golden test for the Postgres-dialect upsert merge statements.

The sandbox has no Postgres server, so the exact statement text IS the
contract: schema-qualified targets, reserved-word and mixed-case columns,
and the index-name rule (CREATE INDEX takes a bare name; dots flatten to
underscores) are pinned here character-for-character.  The same shapes
execute for real against SQLite in test_pipeline_e2e.py.
"""

from __future__ import annotations

import sqlite3

from agentic_etl_poc_spark.sinks.jdbc_sink import merge_statements, quote_ident


def test_quote_ident():
    assert quote_ident("orders") == '"orders"'
    assert quote_ident("analytics.orders") == '"analytics"."orders"'
    assert quote_ident('we"ird') == '"we""ird"'


def test_merge_statements_golden_schema_qualified_reserved_words():
    stmts = merge_statements(
        table="analytics.products_db",
        stage="analytics.products_db_stg",
        key_cols=["sku"],
        columns=["sku", "order", "SalePrice"],
    )
    assert stmts == [
        'CREATE TABLE IF NOT EXISTS "analytics"."products_db" '
        'AS SELECT * FROM "analytics"."products_db_stg" WHERE 1=0',
        'CREATE UNIQUE INDEX IF NOT EXISTS "analytics_products_db_upsert_key" '
        'ON "analytics"."products_db" ("sku")',
        'INSERT INTO "analytics"."products_db" ("sku", "order", "SalePrice") '
        'SELECT "sku", "order", "SalePrice" FROM "analytics"."products_db_stg" '
        'WHERE true ON CONFLICT ("sku") DO UPDATE SET '
        '"order" = EXCLUDED."order", "SalePrice" = EXCLUDED."SalePrice"',
    ]


def test_merge_statements_all_key_columns():
    """Degenerate upsert (every column is a key): DO UPDATE needs at least
    one SET, so the first key self-assigns."""
    stmts = merge_statements("t", "t_stg", ["a", "b"], ["a", "b"])
    assert 'DO UPDATE SET "a" = EXCLUDED."a"' in stmts[2]


def test_reserved_word_columns_execute_on_sqlite(tmp_path):
    """The quoted statements actually run: 'order' is a reserved word in
    both dialects and breaks unquoted merges."""
    db = tmp_path / "golden.db"
    con = sqlite3.connect(db)
    with con:
        con.execute('CREATE TABLE stg ("sku" TEXT, "order" INTEGER)')
        con.executemany("INSERT INTO stg VALUES (?, ?)", [("a", 1), ("b", 2)])
        for s in merge_statements("tgt", "stg", ["sku"], ["sku", "order"]):
            con.execute(s)
        con.execute("DELETE FROM stg")
        con.executemany("INSERT INTO stg VALUES (?, ?)", [("b", 22), ("c", 3)])
        for s in merge_statements("tgt", "stg", ["sku"], ["sku", "order"]):
            con.execute(s)
    rows = sorted(con.execute('SELECT "sku", "order" FROM tgt').fetchall())
    con.close()
    assert rows == [("a", 1), ("b", 22), ("c", 3)]


def test_merge_statements_derby_rejects_unsafe_names():
    """Derby merge names are interpolated UNQUOTED (matching Spark's
    verbatim writer emission), so non-identifier names must fail loudly
    before any SQL is formatted."""
    import pytest

    from agentic_etl_poc_spark.sinks.jdbc_sink import merge_statements_derby

    for bad in ("my-table", "a.b", 'we"ird', "1tbl", "t;drop"):
        with pytest.raises(ValueError, match="plain identifier"):
            merge_statements_derby(bad, "stg", ["k"], ["k", "v"])
    # plain names still pass
    assert len(merge_statements_derby("tgt", "tgt_stg", ["k"], ["k", "v"])) == 3


class _FakeBatch:
    """Tiny driver-free stand-in — upsert_parquet validates its arguments
    before ever touching Spark, so a plain object suffices for the
    precondition tests."""


def test_upsert_parquet_preconditions():
    import pytest

    from agentic_etl_poc_spark.sinks.parquet_sink import upsert_parquet

    with pytest.raises(ValueError, match="key_cols"):
        upsert_parquet(_FakeBatch(), "/tmp/x", [], ["yr"])
    with pytest.raises(ValueError, match="partition_by"):
        upsert_parquet(_FakeBatch(), "/tmp/x", ["k"], [])
