"""JDBC sink: append / replace / upsert.

append and replace map directly onto Spark's JDBC writer.  upsert is the
one genuinely custom writer in the whole engine (SURVEY §7): the reference
stages to ``{table}_stg`` then merges with
``INSERT ... ON CONFLICT (keys) DO UPDATE`` in one transaction
(reference: etl_agent/tools.py:83-96).  We reproduce that shape:

1. distributed stage write: ``df.write.jdbc(stage, overwrite)`` — the data
   plane stays parallel (N executor connections),
2. driver-side transactional merge: one ``INSERT ... SELECT ... ON
   CONFLICT DO UPDATE`` running entirely inside the sink DB — no data
   moves through the driver.

That split is exactly how you'd do it against Postgres at scale; with a
lakehouse sink (Delta/Iceberg) the merge would be ``MERGE INTO`` instead.

DB driver libraries aren't bundled here; calls raise a clear error when
the JDBC driver / DB client is missing (import-gated, per environment
constraints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from agentic_etl_poc_spark.sources.jdbc_source import to_jdbc_url


def _jdbc_writer(df: DataFrame, conn_str: str, table: str, mode: str):
    url, props = to_jdbc_url(conn_str)
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    )
    for k, v in props.items():
        writer = writer.option(k, v)
    return writer


def load_to_postgres(
    df: DataFrame,
    conn_str: str,
    table: str,
    mode: str = "append",
    key_cols: list[str] | None = None,
    row_count: int | None = None,
) -> str:
    if row_count is None:
        row_count = df.count()
    if mode == "append":
        _jdbc_writer(df, conn_str, table, "append").save()
    elif mode == "replace":
        _jdbc_writer(df, conn_str, table, "overwrite").save()
    elif mode == "upsert":
        if not key_cols:
            raise ValueError("upsert mode requires key_cols")
        stage = f"{table}_stg"
        _jdbc_writer(df, conn_str, stage, "overwrite").save()
        _merge_on_conflict(conn_str, table, stage, key_cols, df.columns)
    else:
        raise ValueError(f"unknown load mode: {mode!r}")
    return f"loaded {row_count:,} rows into {table} ({mode})"


def quote_ident(name: str) -> str:
    """Double-quote a (possibly schema-qualified) identifier for the
    Postgres/SQLite dialects: each dot-separated part quoted separately
    (``analytics.orders`` → ``"analytics"."orders"``), embedded quotes
    doubled.  Quoting makes reserved words (``order``, ``user``) and
    mixed-case names (Postgres lower-cases unquoted identifiers) safe."""
    return ".".join('"' + p.replace('"', '""') + '"' for p in name.split("."))


def merge_statements(
    table: str, stage: str, key_cols: list[str], columns: list[str]
) -> list[str]:
    """The upsert merge as portable SQL (Postgres and SQLite dialects both
    accept all three statements).  Unlike the reference, we also create the
    unique index ON CONFLICT depends on — ``CREATE TABLE AS SELECT ...
    WHERE 1=0`` alone yields a constraint-less table, on which every
    ON CONFLICT upsert errors (latent in the reference's
    etl_agent/tools.py:92-95, unreachable there because the Postgres path
    never runs — SURVEY §0.2).  All identifiers are quoted (quote_ident);
    the index NAME is derived with dots flattened to underscores because
    ``CREATE INDEX`` takes a bare name (the index lands in the target
    table's schema — a schema-qualified index name is a syntax error in
    Postgres)."""
    non_keys = [c for c in columns if c not in key_cols]
    qt, qs = quote_ident(table), quote_ident(stage)
    col_list = ", ".join(quote_ident(c) for c in columns)
    key_list = ", ".join(quote_ident(c) for c in key_cols)
    idx_name = quote_ident(f"{table.replace('.', '_')}_upsert_key")
    set_list = ", ".join(
        f"{quote_ident(c)} = EXCLUDED.{quote_ident(c)}" for c in non_keys
    ) or f"{quote_ident(key_cols[0])} = EXCLUDED.{quote_ident(key_cols[0])}"
    return [
        f"CREATE TABLE IF NOT EXISTS {qt} AS SELECT * FROM {qs} WHERE 1=0",
        f"CREATE UNIQUE INDEX IF NOT EXISTS {idx_name} ON {qt} ({key_list})",
        # WHERE true disambiguates ON CONFLICT after INSERT..SELECT for
        # SQLite's parser; Postgres accepts it unchanged.
        f"INSERT INTO {qt} ({col_list}) SELECT {col_list} FROM {qs} "
        f"WHERE true ON CONFLICT ({key_list}) DO UPDATE SET {set_list}",
    ]


def _merge_on_conflict(
    conn_str: str, table: str, stage: str, key_cols: list[str], columns: list[str]
) -> None:
    """Driver-side transactional merge from stage into target.

    ``sqlite://`` conn strings use the stdlib driver (always available —
    also how the merge logic is unit-tested); everything else goes through
    SQLAlchemy, matching the reference's engine choice
    (reference: etl_agent/tools.py:76)."""
    stmts = merge_statements(table, stage, key_cols, columns)
    if conn_str.startswith("sqlite://"):
        import sqlite3

        path = conn_str[len("sqlite://") :].lstrip("/")
        con = sqlite3.connect("/" + path if conn_str.startswith("sqlite:////") else path)
        try:
            with con:  # one transaction: DDL + index + merge
                for s in stmts:
                    con.execute(s)
        finally:
            con.close()
        return
    try:
        import sqlalchemy
    except ImportError as e:
        raise RuntimeError(
            "upsert merge requires the 'sqlalchemy' package and a DB driver"
        ) from e
    engine = sqlalchemy.create_engine(conn_str)
    with engine.begin() as conn:  # one transaction: DDL + index + merge
        for s in stmts:
            conn.exec_driver_sql(s)
