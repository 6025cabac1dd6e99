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

import re

from pyspark.sql import DataFrame, SparkSession

_SQLALCHEMY_RE = re.compile(
    r"^(?P<dialect>[a-z0-9]+)(?:\+[a-z0-9]+)?://"
    r"(?:(?P<user>[^:@/]+)(?::(?P<pw>[^@/]*))?@)?"
    r"(?P<host>[^:/@]+)(?::(?P<port>\d+))?/(?P<db>[^?]+)",
    re.IGNORECASE,
)

_DEFAULT_PORTS = {"postgresql": 5432, "mysql": 3306, "sqlserver": 1433}


def to_jdbc_url(conn_str: str) -> tuple[str, dict[str, str]]:
    """SQLAlchemy conn string → (jdbc url, properties)."""
    if conn_str.startswith("jdbc:"):
        return conn_str, {}
    m = _SQLALCHEMY_RE.match(conn_str)
    if not m:
        raise ValueError(f"cannot parse conn_str: {conn_str!r}")
    d = m.groupdict()
    dialect = d["dialect"].lower()
    if dialect.startswith("postgres"):
        dialect = "postgresql"
    port = d["port"] or _DEFAULT_PORTS.get(dialect, "")
    url = f"jdbc:{dialect}://{d['host']}:{port}/{d['db']}"
    props = {}
    if d["user"]:
        props["user"] = d["user"]
    if d["pw"]:
        props["password"] = d["pw"]
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
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    return reader.load()
