"""CSV source.

Parity notes (SURVEY §1.3, §2.1):
- header row + schema inference, like ``pd.read_csv`` (reference:
  etl_agent/ops.py:25).
- ``nullValue="NA"``: pandas treats the literal string ``NA`` as null by
  default; Spark does NOT — must be set explicitly for parity with the
  reference's fixtures (Features_dataset.csv MarkDown1..5).
- driver-side size guard before read (reference: etl_agent/ops.py:23-24,
  templates.py:66-70): a *declared* limit of the plan language.  At the
  100 TB design ceiling the guard is a soft admission-control config —
  checked per-file on the driver, never by scanning data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def check_size(path: str, max_bytes: int | None) -> None:
    """Admission control: reject inputs above ``max_bytes``.  A directory
    input (e.g. a Spark-written multi-part dataset) is measured as the
    SUM of its files — ``getsize`` on the directory inode itself would
    silently make the limit a no-op."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if max_bytes is None:
        return
    if os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    else:
        size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(f"input too large: {size} > {max_bytes}")


def read_csv(
    spark: SparkSession,
    path: str,
    max_bytes: int | None = 1_000_000_000,
    delimiter: str = ",",
    header: bool = True,
    infer_schema: bool = True,
    schema: str | None = None,
) -> DataFrame:
    """``schema`` (a DDL string) declares the column types up front and
    skips the inference pass — ONE scan per source instead of two
    (guide §6.2).  Meant for files whose types the caller knows by
    construction (e.g. staged by the same pipeline); without it the
    reference's header+inference behavior is unchanged."""
    check_size(path, max_bytes)
    reader = spark.read.option("header", header).option(
        "nullValue", "NA"
    ).option("sep", delimiter)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", infer_schema).csv(path)


def read_csv_triplet(
    spark: SparkSession,
    paths: dict[str, str],
    max_bytes: int | None = 1_000_000_000,
    required: tuple[str, ...] = ("sales", "features", "stores"),
    schemas: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Multi-file named CSV source with a COMBINED size cap; each frame is
    registered as a temp view under its name by the caller (reference:
    etl_agent/templates.py:59-82).  ``schemas`` optionally declares a DDL
    schema per name (see ``read_csv``); names without one keep
    inference."""
    if not set(required).issubset(paths.keys()):
        raise ValueError(
            f"csv.paths must include keys: {', '.join(required)}"
        )
    for name in paths:
        check_size(paths[name], None)
    total = sum(os.path.getsize(p) for p in paths.values())
    if max_bytes is not None and total > max_bytes:
        raise ValueError(f"input too large: {total} bytes > {max_bytes}")
    schemas = schemas or {}
    return {
        name: read_csv(spark, p, max_bytes=None, schema=schemas.get(name))
        for name, p in paths.items()
    }


def read_csv_b64(
    spark: SparkSession,
    content_b64: str,
    max_bytes: int | None = 1_000_000_000,
    delimiter: str = ",",
) -> DataFrame:
    """Inline-content variant of the CSV source (reference:
    etl_agent/tools.py:23-27 accepts ``content_b64``): decode on the
    driver, parse with pandas (same inference the reference used), ship to
    the cluster via Arrow.  Inline payloads are small by construction —
    for anything sizable the caller should land a file and use
    ``read_csv``."""
    import base64
    import io

    import pandas as pd

    raw = base64.b64decode(content_b64)
    if max_bytes is not None and len(raw) > max_bytes:
        raise ValueError(f"input too large: {len(raw)} > {max_bytes}")
    pdf = pd.read_csv(io.BytesIO(raw), sep=delimiter)
    return spark.createDataFrame(pdf)
