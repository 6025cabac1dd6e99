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
        _merge_on_conflict(
            conn_str, table, stage, key_cols, df.columns, spark=df.sparkSession
        )
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


def merge_statements_derby(
    table: str, stage: str, key_cols: list[str], columns: list[str]
) -> list[str]:
    """The upsert merge in the Apache Derby dialect (``MERGE INTO``,
    Derby >= 10.11 — 10.16 ships on Spark's classpath).  Differences from
    the Postgres/SQLite dialect that merge_statements targets:

    - no ``IF NOT EXISTS`` — the executor (_merge_derby) checks table
      existence via DatabaseMetaData and runs the DDL statements only on
      first creation, all inside the same transaction as the merge,
    - ``CREATE TABLE ... AS SELECT ... WITH NO DATA`` instead of
      ``WHERE 1=0`` (Derby's CTAS form),
    - ``MERGE INTO target USING stage ON keys WHEN [NOT] MATCHED``
      instead of ``INSERT ... ON CONFLICT DO UPDATE``.

    Identifier quoting follows what Spark's JDBC writer actually created:
    the TABLE name is left unquoted (the writer emits it verbatim, so
    Derby case-folds it to upper — quoting here would point at a
    different, lower-case table), while COLUMN names are quoted
    exact-case (the writer quotes every column via the dialect).  The
    WHEN MATCHED clause is omitted when every column is a key (nothing
    to update; Derby rejects an empty SET list).  Because the table/stage
    names are interpolated UNQUOTED, they are validated against a safe
    identifier pattern first — a hyphenated, dotted, or quoted name must
    fail loudly here, not as a Derby syntax error mid-transaction.  (A
    reserved WORD still passes the pattern; in practice it never reaches
    the merge — Spark's JDBC writer emits the same unquoted name for the
    stage write and fails there first.)"""
    import re

    for name in (table, stage):
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"Derby merge requires a plain identifier table name, "
                f"got {name!r} (quoted/schema-qualified names are not "
                f"supported on the unquoted-writer path)"
            )
    non_keys = [c for c in columns if c not in key_cols]
    col_list = ", ".join(quote_ident(c) for c in columns)
    key_list = ", ".join(quote_ident(c) for c in key_cols)
    on = " AND ".join(
        f"t.{quote_ident(k)} = s.{quote_ident(k)}" for k in key_cols
    )
    matched = (
        " WHEN MATCHED THEN UPDATE SET "
        + ", ".join(f"{quote_ident(c)} = s.{quote_ident(c)}" for c in non_keys)
        if non_keys
        else ""
    )
    insert_vals = ", ".join(f"s.{quote_ident(c)}" for c in columns)
    return [
        f"CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA",
        f"CREATE UNIQUE INDEX {table}_upsert_key ON {table} ({key_list})",
        f"MERGE INTO {table} t USING {stage} s ON {on}{matched} "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({insert_vals})",
    ]


def derby_exec(spark, url: str, stmts: list[str], ignore_states: tuple = ()) -> None:
    """Run DDL/DML statements on an embedded Derby database through the
    live Spark JVM (py4j), one transaction, commit at the end.  Embedded
    Derby lives INSIDE the Spark driver JVM (a Python-side driver cannot
    reach it), so this is the only correct driver-side execution path —
    the same JVM the Spark JDBC reader/writer already booted the engine
    in.  SQLStates in ``ignore_states`` (e.g. '42Y55' table-does-not-
    exist for a best-effort DROP) are swallowed per statement."""
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    except Exception:
        pass  # JDBC-4 service autoloading already registered the driver
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        for s in stmts:
            try:
                st.executeUpdate(s)
            except Exception as e:
                # Own try/except: py4j JavaObject.__getattr__ fabricates a
                # member for ANY name, so a getattr default never fires —
                # a non-SQLException throwable would raise Py4JError HERE
                # and mask the original error, skipping the rollback.
                try:
                    state = e.java_exception.getSQLState()
                except Exception:
                    state = None
                if state not in ignore_states:
                    conn.rollback()
                    raise
        conn.commit()
    finally:
        conn.close()


def _derby_table_exists(spark, url: str, table: str) -> bool:
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        # Spark's writer created the table unquoted -> Derby upper-cased it
        rs = conn.getMetaData().getTables(None, None, table.upper(), None)
        return bool(rs.next())
    finally:
        conn.close()


def _merge_derby(
    spark, url: str, table: str, stage: str, key_cols: list[str], columns: list[str]
) -> None:
    """Derby-dialect driver-side merge: create-if-absent (metadata probe —
    Derby has no IF NOT EXISTS) + MERGE INTO, one transaction."""
    create_tbl, create_idx, merge = merge_statements_derby(
        table, stage, key_cols, columns
    )
    stmts = [merge]
    ignore: tuple = ()
    if not _derby_table_exists(spark, url, table):
        # Derby DDL is transactional: table + index + merge commit
        # together.  X0Y32 (object already exists) is ignored on the
        # CREATEs so two concurrent upserts racing the metadata probe
        # both proceed to the merge instead of one dying on the DDL.
        stmts = [create_tbl, create_idx, merge]
        ignore = ("X0Y32",)
    derby_exec(spark, url, stmts, ignore_states=ignore)


def _merge_on_conflict(
    conn_str: str,
    table: str,
    stage: str,
    key_cols: list[str],
    columns: list[str],
    spark=None,
) -> None:
    """Driver-side transactional merge from stage into target.

    ``sqlite://`` conn strings use the stdlib driver (always available —
    also how the merge logic is unit-tested); ``jdbc:derby:`` runs MERGE
    INTO through the Spark JVM (the embedded engine lives there);
    everything else goes through SQLAlchemy, matching the reference's
    engine choice (reference: etl_agent/tools.py:76)."""
    if conn_str.startswith("jdbc:derby:"):
        if spark is None:
            raise ValueError("Derby upsert needs the live SparkSession")
        _merge_derby(spark, conn_str, table, stage, key_cols, columns)
        return
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
