"""JDBC (upstream database) source.

The reference runs the user's SQL in the source DB via SQLAlchemy
(reference: etl_agent/tools.py:51-56) — full-query pushdown.  Spark's JDBC
``query`` option has identical semantics: the SQL executes upstream and
only its result crosses the wire.

Conn-string handling: plans carry SQLAlchemy-style URLs
(``postgresql+psycopg2://user:pw@host:5432/db``); we translate to JDBC
(``jdbc:postgresql://host:5432/db``) so the same plans run unmodified.

Scale path: ``partition_column``/``num_partitions`` enable parallel reads —
each executor pulls a key-range slice instead of one connection streaming
everything through the driver.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, unquote, urlsplit

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_PORTS = {"postgresql": 5432, "mysql": 3306, "sqlserver": 1433}


def to_jdbc_url(conn_str: str) -> tuple[str, dict[str, str]]:
    """SQLAlchemy conn string → (jdbc url, properties).

    Parsed with urllib (RFC 3986), not a regex: percent-encoded
    credentials (``p%40ss`` for a password containing ``@``) decode
    correctly, and ``?sslmode=require``-style query parameters are carried
    into the JDBC properties instead of being dropped.  Characters that
    must be percent-encoded inside userinfo (``@ / :``) raise a clear
    error if left raw — such a string is ambiguous to every URL parser.
    """
    if conn_str.startswith("jdbc:"):
        return conn_str, {}
    parts = urlsplit(conn_str)
    if not parts.scheme or "//" not in conn_str:
        raise ValueError(f"cannot parse conn_str: {conn_str!r}")
    dialect = parts.scheme.split("+", 1)[0].lower()
    if dialect.startswith("postgres"):
        dialect = "postgresql"
    try:
        host = parts.hostname or ""
        port = parts.port
    except ValueError as e:  # e.g. non-numeric port from an unencoded '@'
        raise ValueError(
            f"cannot parse conn_str {conn_str!r}: {e}; percent-encode "
            "special characters in credentials (e.g. '@' -> '%40')"
        ) from e
    if not host:
        raise ValueError(f"cannot parse conn_str: {conn_str!r} (no host)")
    db = unquote(parts.path.lstrip("/"))
    url = f"jdbc:{dialect}://{host}:{port or _DEFAULT_PORTS.get(dialect, '')}/{db}"
    props: dict[str, str] = {}
    if parts.username:
        props["user"] = unquote(parts.username)
    if parts.password:
        props["password"] = unquote(parts.password)
    # ?sslmode=require&connect_timeout=10 → JDBC driver properties
    for k, v in parse_qsl(parts.query, keep_blank_values=True):
        props.setdefault(k, v)
    return url, props


def fetch_db(
    spark: SparkSession,
    conn_str: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    url, props = to_jdbc_url(conn_str)
    reader = spark.read.format("jdbc").option("url", url)
    if partition_column:
        # Spark rejects `query` + `partitionColumn` together: a
        # partitioned read needs `dbtable`, so the user's SQL becomes a
        # derived table and Spark appends one key-range WHERE clause per
        # partition — N executors each pull their own slice upstream
        # instead of one connection streaming everything.
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned fetch_db needs lower_bound/upper_bound for "
                f"{partition_column!r} (probe them with a MIN/MAX query)"
            )
        reader = (
            reader.option("dbtable", f"({query}) AS spark_src")
            .option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    else:
        reader = reader.option("query", query)
    for k, v in props.items():
        reader = reader.option(k, v)
    return reader.load()
