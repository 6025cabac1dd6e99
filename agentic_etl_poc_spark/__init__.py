"""agentic_etl_poc_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of ``mounikavas/agentic-etl-poc``
(reference surveyed in /root/repo/SURVEY.md) on idiomatic Spark:

- declarative YAML plans (limits / source / transform / load / checks /
  verify / alerts) parsed by :mod:`agentic_etl_poc_spark.plans`,
- extract from CSV / JSON / REST API / JDBC (:mod:`.sources`),
- SQL transforms executed lazily by Catalyst over temp views
  (:mod:`.operators.transform`),
- data-quality and post-load verification gates (:mod:`.operators.quality`,
  :mod:`.operators.verify`),
- CSV / JDBC sinks incl. staged upsert (:mod:`.sinks`),
- LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal plumbing (:mod:`.operators.dedup`, ``.similarity``, ``.text``),
- a DuckDB-oracle-checked query battery (:mod:`.queries`).

Everything here derives from public knowledge only: the Apache Spark API and
the public reference repo's observable behavior.
"""

__version__ = "0.1.0"

from agentic_etl_poc_spark.session import get_spark  # noqa: F401
