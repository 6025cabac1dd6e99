"""REST API source.

Fetch happens on the driver (Spark has no REST datasource; pagination and
auth are control-plane work), then rows become a distributed DataFrame.
Parity with the reference: query params, 120 s timeout, raise on HTTP
error, row selector, flattening (reference: etl_agent/tools.py:29-41).

At scale: the API payload is the *small* side by construction (limits cap
it); heavy lifting happens after ``createDataFrame`` in the cluster.  For
truly large paginated pulls, pass a page list and fetch per-partition via
``mapInPandas`` (``fetch_pages_distributed``).
"""

from __future__ import annotations

import json as _json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

API_TIMEOUT_SECONDS = 120


def _select_path(doc, selector: str):
    from agentic_etl_poc_spark.sources.json_source import parse_selector

    node = doc
    for seg in parse_selector(selector):
        node = node[seg]
    return node


def fetch_api(
    spark: SparkSession,
    url: str,
    params: dict | str | None = None,
    json_path: str = "",
) -> DataFrame:
    """Fetch a JSON document and project rows via the selector.

    ``file://`` URLs read a local JSON document instead of the network —
    the offline transport for fixtures, air-gapped runs, and
    deterministic tests (params are ignored for file URLs)."""
    if isinstance(params, str):
        params = _json.loads(params) if params else {}
    if url.startswith("file://"):
        # everything after the scheme is the path: file:///abs/p -> /abs/p,
        # file://rel/p -> rel/p (plan-relative fixture feeds) — simpler
        # than RFC authority parsing and right for an offline transport
        with open(url[len("file://") :]) as f:
            doc = _json.load(f)
    else:
        try:
            import requests
        except ImportError as e:  # pragma: no cover - requests is present
            raise RuntimeError("api source requires the 'requests' package") from e

        r = requests.get(url, params=params or {}, timeout=API_TIMEOUT_SECONDS)
        r.raise_for_status()
        doc = r.json()
    rows = _select_path(doc, json_path)
    if isinstance(rows, dict):
        rows = [rows]
    pdf = pd.json_normalize(rows)
    return spark.createDataFrame(pdf)


def fetch_pages_distributed(
    spark: SparkSession,
    urls: list[str],
    json_path: str = "",
    schema: str | None = None,
) -> DataFrame:
    """Scale path: one URL per task, fetched inside executors via
    mapInPandas.  ``schema`` (DDL string) is required because the result
    schema can't be inferred without fetching."""
    if schema is None:
        raise ValueError("distributed fetch requires an explicit DDL schema")
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(
        max(1, min(len(urls), 64))
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import requests

        for pdf in batches:
            for u in pdf["url"]:
                r = requests.get(u, timeout=API_TIMEOUT_SECONDS)
                r.raise_for_status()
                yield pd.json_normalize(_select_path(r.json(), json_path))

    return urls_df.mapInPandas(fetch, schema=schema)
