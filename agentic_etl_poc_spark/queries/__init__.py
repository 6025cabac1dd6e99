from agentic_etl_poc_spark.queries.core import QUERIES, QuerySpec, load_all, register

__all__ = ["QUERIES", "QuerySpec", "load_all", "register"]
