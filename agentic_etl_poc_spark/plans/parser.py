"""Plan-text parsing: fences, heredocs, env vars, duplicate keys, kind inference.

Behavioral parity targets (all verified against the reference's observable
behavior, SURVEY §0.3, §2.1):

- ```yaml fenced blocks and a ``mel <<EOF ... EOF`` heredoc wrapper are
  stripped before YAML parsing (reference: etl_agent/templates.py:25-34).
- ``$ENV`` placeholders are expanded before parsing (reference:
  etl_agent/runtime.py:15 os.path.expandvars).
- Duplicate mapping keys resolve last-wins (the canonical prompt.txt nests
  ``transform:`` twice — PyYAML's safe_load already does last-wins; we rely
  on it and regression-test it).
- ``kind: auto`` inference: db if conn_str, api if http(s) url, csv if
  .csv path, json if .json/.ndjson path, else api (reference:
  etl_agent/templates.py:39-48).
- Offline detection: text whose first meaningful line starts with a plan
  section key is a plan, not an NL prompt (reference: etl_agent/runtime.py:19-21).
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

from agentic_etl_poc_spark.plans.model import Plan, Source, plan_from_dict

_FENCE_RE = re.compile(r"```(?:yaml|yml)?\s*\n(.*?)\n```", re.DOTALL | re.IGNORECASE)
_HEREDOC_RE = re.compile(r"^mel <<EOF\n?(.*)\nEOF\s*$", re.DOTALL)
_PLAN_KEYS = ("limits:", "source:", "transform:", "load:", "checks:", "verify:", "alerts:")


def strip_wrappers(text: str) -> str:
    """Remove markdown fences / heredoc wrappers around a YAML plan."""
    s = str(text or "").strip()
    m = _FENCE_RE.search(s)
    if m:
        s = m.group(1).strip()
    if s.startswith("mel <<EOF"):
        s = _HEREDOC_RE.sub(r"\1", s)
    return s


def expand_env(text: str) -> str:
    """``$POSTGRES_URL``-style secret expansion."""
    return os.path.expandvars(text)


def looks_like_plan(text: str) -> bool:
    """Offline-mode detection: is this YAML-plan text (vs an NL prompt)?

    Decided by the first non-blank, non-comment line — a plan file that
    opens with ``# usage`` comments (e.g. examples/weekly_orders.yaml)
    must still route to the plan parser, not the NL planner (a plain
    ``startswith`` check mis-routed exactly that file through the CLI).
    """
    s = strip_wrappers(text)
    for line in s.splitlines():
        ls = line.strip()
        if not ls or ls.startswith("#"):
            continue
        return ls.startswith(_PLAN_KEYS) or os.environ.get("ETL_AGENT_OFFLINE") == "1"
    return os.environ.get("ETL_AGENT_OFFLINE") == "1"


def to_yaml_map(text: str) -> dict[str, Any]:
    s = strip_wrappers(expand_env(text))
    doc = yaml.safe_load(s)  # duplicate keys: last-wins (PyYAML behavior)
    if not isinstance(doc, dict):
        raise ValueError(f"Plan YAML must be a mapping; got {type(doc).__name__}")
    return doc


def parse_plan(text: str) -> Plan:
    return plan_from_dict(to_yaml_map(text))


def infer_kind(src: Source) -> str:
    """``kind: auto`` source-type heuristics."""
    if src.kind != "auto":
        return src.kind
    if src.multi:
        return "multi"
    if src.db and src.db.conn_str:
        return "db"
    if src.api and src.api.url.startswith(("http://", "https://")):
        return "api"
    if src.csv and (
        (src.csv.path or "").lower().endswith(".csv") or src.csv.paths
    ):
        return "csv"
    if src.json and src.json.path.lower().endswith((".json", ".ndjson")):
        return "json"
    if src.parquet and (src.parquet.path or src.parquet.tables):
        return "parquet"
    if src.stream and src.stream.path:
        return "stream"
    return "api"  # conservative default, matching the reference
