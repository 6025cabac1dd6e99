"""JSON source with a SAFE row selector and struct flattening.

The reference evaluates the row selector with ``eval()`` (reference:
etl_agent/tools.py:39,47 — e.g. ``"data['products']"``), a code-injection
hole.  We accept the same selector strings but parse them into a path and
navigate declaratively — no eval (SURVEY §7 step 3 calls this out).

Selector grammar accepted (superset of what shipped plans use):
- ``data['products']`` / ``data["products"]["items"]``  (the tools.py style)
- ``$.records`` / ``$.data.products``                    (plan.yaml jsonpath style)
- ``records`` / ``data.products``                        (bare dotted)

Semantics: navigate into the document; if the target is an array, explode
to rows; flatten nested structs to dotted column names like
``pd.json_normalize`` does (reference: tools.py:40,48).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

_BRACKET_RE = re.compile(r"\[\s*['\"]([^'\"]+)['\"]\s*\]")


def parse_selector(selector: str) -> list[str]:
    """Selector string → path segments.  Empty selector → []."""
    s = (selector or "").strip()
    if not s:
        return []
    if "[" in s:  # data['products'] style: leading identifier is the root doc
        segs = _BRACKET_RE.findall(s)
        if not segs:
            raise ValueError(f"cannot parse selector: {selector!r}")
        return segs
    if s.startswith("$."):
        s = s[2:]
    elif s.startswith("$"):
        s = s[1:]
    return [seg for seg in s.split(".") if seg]


def _flatten(df: DataFrame) -> DataFrame:
    """Flatten struct columns to dotted names, recursively (json_normalize
    parity: nested objects become ``a.b`` columns)."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fields:
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}.{sub.name}")
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(cols)


def select_rows(df: DataFrame, selector: str) -> DataFrame:
    """Navigate a document DataFrame down ``selector`` and explode arrays."""
    for seg in parse_selector(selector):
        field = dict((f.name, f.dataType) for f in df.schema.fields).get(seg)
        if field is None:
            raise ValueError(f"selector segment {seg!r} not found in {df.columns}")
        if isinstance(field, ArrayType):
            df = df.select(F.explode(F.col(f"`{seg}`")).alias(seg))
        else:
            df = df.select(F.col(f"`{seg}`").alias(seg))
        if isinstance(df.schema.fields[0].dataType, StructType):
            df = df.select(F.col(f"`{seg}`.*"))
    return _flatten(df)


_NDJSON_SUFFIXES = (".ndjson", ".jsonl")


def _first_line_is_json(path: str) -> bool:
    """Content sniff: a complete JSON value on the first non-blank line
    means line-delimited; a pretty-printed document's first line ('{')
    does not parse.  (For a single-line compact document the two read
    modes produce the same rows, so 'True' is safe there too.)"""
    import json as _json

    with open(path, "rb") as fh:
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            try:
                _json.loads(line)
                return True
            except ValueError:
                return False
    return False


def _infer_ndjson(path: str) -> bool:
    """True → read as line-delimited (NDJSON), False → multiLine document.

    NDJSON suffixes (.ndjson/.jsonl) win outright; everything else is
    sniffed by CONTENT, not name — a directory of NDJSON part files not
    named '*.ndjson' used to be read multiLine (one record per file,
    silently wrong rows), and a single NDJSON file named '*.json' (what
    most engines write) silently yielded only its first record.  Single
    compact one-line '*.json' documents sniff as line-delimited, which
    reads identically for object/array roots (see _first_line_is_json).
    Directories are sniffed on their first few data files; if those
    DISAGREE (a mixed NDJSON + pretty-printed-document layout) auto mode
    refuses with a ValueError naming the fix — set ``source.json.mode``
    explicitly — rather than letting the first file silently decide for
    files it never looked at."""
    import os

    if not os.path.isdir(path):
        if path.lower().endswith(_NDJSON_SUFFIXES):
            return True
        return _first_line_is_json(path)
    data_files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    )
    if any(f.lower().endswith(_NDJSON_SUFFIXES) for f in data_files):
        return True
    verdicts = [_first_line_is_json(f) for f in data_files[:8]]
    if not verdicts:
        return False
    if all(verdicts) or not any(verdicts):
        return verdicts[0]
    raise ValueError(
        f"mixed JSON layouts under {path!r}: both line-delimited and "
        f"multi-line documents among the first {len(verdicts)} data files "
        f"— auto mode cannot read them with one parser; set "
        f"source.json.mode to 'ndjson' or 'document' explicitly"
    )


def read_json(
    spark: SparkSession,
    path: str,
    json_path: str = "",
    max_bytes: int | None = 1_000_000_000,
    mode: str = "auto",
) -> DataFrame:
    """Read a JSON document (multiLine) or NDJSON (line-delimited) and
    apply the row selector + flattening.  ``mode`` is 'auto' (NDJSON
    suffixes win, everything else is content-sniffed; mixed directories
    are refused — see ``_infer_ndjson``), 'ndjson', or 'multiline';
    plans set it via ``source.json.mode``."""
    from agentic_etl_poc_spark.sources.csv_source import check_size

    check_size(path, max_bytes)
    if mode == "auto":
        ndjson = _infer_ndjson(path)
    elif mode in ("ndjson", "jsonl", "lines"):
        ndjson = True
    elif mode in ("multiline", "document"):
        ndjson = False
    else:
        raise ValueError(
            f"unknown JSON mode {mode!r}; expected auto|ndjson|multiline"
        )
    df = spark.read.option("multiLine", not ndjson).json(path)
    return select_rows(df, json_path)
