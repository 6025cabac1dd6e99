"""Query-battery registry.

Each named query is a (spark_fn, oracle_sql) pair:

- ``fn(spark, sf_dir) -> DataFrame`` — the idiomatic-Spark implementation
  (DataFrame API or spark.sql over temp views), lazy until the driver acts.
- ``oracle`` — equivalent SQL DuckDB runs over the same parquet tables.
  ``None`` marks a genuinely non-SQL-expressible operator (the driver then
  records a weaker rows-only check).

Cross-engine determinism rules used throughout the battery (the driver
hash-compares values, so results must match bit-for-bit, not just
approximately):

1. Aggregates over DOUBLE columns are computed as
   ``SUM(CAST(x AS DECIMAL(p,s)))`` then cast back to DOUBLE.  Plain
   ``SUM(double)`` is order-dependent (Spark's partial aggregation adds in
   partition order, DuckDB in its own order) and differs in final ULPs;
   decimal addition is exact and associative, so both engines agree exactly.
   Per-ROW double arithmetic (x*(1-y)) is IEEE-deterministic and safe before
   the cast.
2. AVG is SUM(decimal)::DOUBLE / COUNT — one deterministic double division.
3. DATE/TIMESTAMP outputs are formatted to strings with an explicit pattern
   (engines disagree on native temporal rendering/dtypes).
4. Every ORDER BY ... LIMIT has a total tie-break key.
5. Comparisons/rounding on computed doubles happen on values far from the
   decision boundary by construction, or after rounding to a coarse grid.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


QUERIES: dict[str, QuerySpec] = {}

#: Session-scoped persisted intermediates shared across query families
#: (dedup shingles/pairs/labels, similarity signatures/norms).  In a real
#: pipeline these are computed ONCE and fanned out; the battery does the
#: same when several queries run in one session (a correctness sweep,
#: bench).  Keyed by (session, data dir, name); persist() keeps the
#: logical plan visible to Catalyst while caching the data.  CAVEAT
#: (learned on d03): do NOT feed a cached frame into a plan whose
#: efficiency depends on ReuseExchange across self-join consumers — AQE
#: wraps the cache in TableCacheQueryStages and stops unifying the
#: identical exchanges above it.
#:
#: Weak-keyed by the SESSION OBJECT, not id(spark): after a session is
#: stopped and garbage-collected, a new session can reuse the same id()
#: and would inherit a persisted frame bound to the dead JVM state; a
#: WeakKeyDictionary entry dies with the session instead.
_SHARED: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def shared_frame(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    per = _SHARED.get(spark)
    if per is None:
        per = {}
        _SHARED[spark] = per
    df = per.get((sf_dir, name))
    if df is None:
        df = build().persist()
        per[(sf_dir, name)] = df
    return df


def clear_shared_frames(spark: SparkSession | None = None) -> None:
    """Unpersist and drop the shared intermediates (for ``spark``, or for
    every live session) — frees executor storage between data dirs or at
    the end of a battery run."""
    sessions = [spark] if spark is not None else list(_SHARED.keys())
    for s in sessions:
        for df in (_SHARED.pop(s, None) or {}).values():
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped; nothing to free


def register(name: str, oracle: str | None, description: str = ""):
    """Decorator: add a query to the battery."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, description=description)
        return fn

    return deco


#: Explicit registry order.  The external correctness sweep walks this
#: order and records only the FIRST ~50 entries per round (rounds 1-4
#: each recorded exactly 50).  Round-5 rotation, three bands:
#:
#: 1. Slots 1-50 (the sweep window) — every never-driver-sampled entry
#:    first (the 8 round-4 additions, replica-green in REPLICA_r04.json,
#:    plus the six new round-5 entries v05/v06/p02/p03/t18/s10 — all 14
#:    replica-green in REPLICA_r05.json), then the 36 cheapest of the 48
#:    entries whose latest driver-green row is r03.  Streaming entries
#:    sit adjacent so the staged-topic cache is shared.
#: 2. The 12 r03-era spillovers that did not fit — they lead round 6's
#:    window (with anything new in round 6).
#: 3. Entries green in the r04 sweep, cheap-first.
#:
#: tests/test_battery_contract.py::test_sweep_priority_block_leads
#: recomputes this invariant from the CORRECTNESS_r*.json files and goes
#: red the moment a new sweep lands — rotating this tuple is each
#: round's first task.
#:
#: bench.py iterates sorted(battery), so this order never skews
#: per-query bench attribution.
SWEEP_ORDER: tuple[str, ...] = (
    # -- band 1 (sweep window, 50): first the 8 entries never driver-
    # -- sampled (replica-green since r04), cheap-first, streaming last
    # -- so v03/v04 share the staged-topic cache back-to-back ---------
    "u05_arrow_map_batches",
    # new in round 5 (never driver-sampled): Python DataSource API,
    # read and write paths
    "u06_python_datasource",
    "u07_python_writer",
    "m04_image_decode",
    "s09_matryoshka_recall",
    # new in round 5 (never driver-sampled): metadata-filtered kNN
    "s10_filtered_knn",
    # new in round 5 (never driver-sampled): resize / resample kernel
    # round-trips
    "m05_image_resize",
    "m06_audio_resample",
    "m03_audio_decode",
    "t17_chunk_dedup",
    # new in round 5 (never driver-sampled): overlapping RAG chunking,
    # the unigram-LM rarity proxy, and epoch-weighted upsampling
    "t18_sliding_chunks",
    "t19_token_rarity",
    "t20_quality_upsample",
    # new in round 5 (never driver-sampled): MinHash sketch-error eval
    # and product-quantization ADC recall
    "d11_sketch_error",
    "s11_pq_adc",
    # new in round 5 (never driver-sampled): deterministic training
    # shuffle and BPE tokenizer training
    "t21_training_shuffle",
    "t22_bpe_merges",
    "p01_curation_pipeline",
    # new in round 5 (never driver-sampled): the reference's CSV-triplet
    # plan path and the incremental-watermark runs, end-to-end under the
    # oracle
    "p02_plan_csv_pipeline",
    "p03_plan_incremental",
    # new in round 5 (never driver-sampled): the JSON-source plan path
    "p04_plan_json_pipeline",
    "v03_stream_dedup_exact",
    "v04_stream_stream_join",
    # new in round 5 (never driver-sampled): multi-batch watermark
    # eviction and stream-static enrichment — share the staged-topic
    # cache with v01-v04 above
    "v05_stream_watermark_eviction",
    "v06_stream_static_enrich",
    # new in round 5 (never driver-sampled): Python streaming source
    "v07_stream_python_source",
    # -- then the cheapest entries whose latest driver-green row is
    # -- r03 (cheap-first by builder per-query bench) -----------------
    "q08_topk_orders",
    "q39_regexp_groups",
    "q37_map_functions",
    "t12_length_deciles",
    "q16_math_funcs",
    "q02_cast_coalesce_project",
    "t10_source_mixture",
    "q40_union_by_name",
    "q30_null_semantics",
    "q43_rank_family",
    "t08_train_test_split",
    "q47_bitwise_agg",
    "t09_corpus_stats",
    "q38_string_agg",
    "q46_ignore_nulls_fill",
    "q15_string_funcs",
    "q42_json_struct_parse",
    "q33_scd2_versions",
    "m01_multimodal_metadata",
    "q32_histogram",
    "q52_funnel",
    "q36_explode_outer",
    "s01_knn_bruteforce",
    "q35_not_in_null_trap",
    # -- band 2: r03-era spillovers that did not fit the 50-slot window
    # -- (it absorbed the eighteen new round-5 entries) — these lead round 6
    "q29_range_frame_interval",
    "q07_conditional_agg",
    "t13_vocab_by_source",
    "q26_sliding_window",
    "u04_arrow_scalar_udf",
    "q44_arg_extremes",
    "q31_date_spine_gapfill",
    "q49_latest_record_dedup",
    "d10_cluster_survivors",
    "q28_array_map_agg",
    "s07_int8_quantization",
    "q50_higher_order_funcs",
    "s06_knn_join",
    "q51_salted_skew_agg",
    "q48_shipping_priority",
    "t16_sequence_packing",
    "q55_lateral_topn",
    "q54_recursive_year_ladder",
    "q56_local_supplier_volume",
    "q45_grouping_sets",
    "t15_benchmark_decontam",
    "s08_kmeans_refine",
    "v01_stream_tumbling_agg",
    "v02_stream_sessionize",
    # -- band 3: green in r04, cheap-first ----------------------------
    "q20_tumbling_window",
    "q04_weekly_rollup",
    "u02_python_udtf",
    "q13_semi_anti_join",
    "q22_percentiles",
    "q06_join_cast_key_broadcast",
    "u01_grouped_pandas_agg",
    "t01_token_stats",
    "q12_set_ops",
    "q34_full_outer_reconcile",
    "t14_tfidf_keywords",
    "d09_containment",
    "s05_ann_multiprobe",
    "d08_fuzzy_levenshtein",
    "q05_left_join_multikey",
    "s04_ann_recall",
    "q14_rollup",
    "q53_retention_cohorts",
    "q18_asof_join",
    "t07_pii_scan_redact",
    "q41_set_ops_all",
    "q25_pivot_unpivot",
    "q10_window_rank",
    "t05_pandas_tokens",
    "t02_quality_score",
    "q27_correlated_subquery",
    "q09_distinct_agg",
    "q17_hourly_json",
    "q21_cube_grouping",
    "q11_running_window",
    "s02_ann_lsh",
    "t03_langid",
    "q19_range_join",
    "t11_repetition_score",
    "q23_approx_distinct",
    "q24_sessionize_batch",
    "s03_ann_ivf",
    "t06_boilerplate_ratio",
    "d01_dedup_exact",
    "q03_try_dateparse",
    "q01_pricing_summary",
    "d06_embedding_neardup",
    "u03_pandas_udaf_weighted",
    "t04_fingerprint",
    "d07_dedup_clusters",
    "d02_dedup_fingerprint",
    "m02_frame_fingerprints",
    "d05_simhash",
    "d03_ngram_jaccard",
    "d04_minhash_lsh",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every battery module (side effect: registration) and return
    the registry in SWEEP_ORDER (see its docstring for why the order is
    load-bearing).  Names registered but absent from SWEEP_ORDER go last —
    and tests/test_battery_contract.py asserts that never happens, so new
    queries must take an explicit sweep position.
    """
    from agentic_etl_poc_spark.queries import (  # noqa: F401
        dedup,
        pipeline,
        relational,
        similarity,
        streamq,
        temporal,
        text,
        udx,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in SWEEP_ORDER:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        ordered.setdefault(name, spec)
    return ordered
