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
#: order and records only the FIRST ~50 entries per round (rounds 1-5
#: each recorded exactly 50).  Round-6 rotation, three bands:
#:
#: 1. Slots 1-50 (the sweep window) — new round-6 entries first (never
#:    driver-sampled entries must sit inside the window), then the 24
#:    entries whose latest driver-green row is r03 (they have waited
#:    longest), cheap-first with streaming adjacent at the block tail so
#:    v01/v02 share the staged-topic cache, then the cheapest r04-era
#:    entries until the window is full.
#: 2. The r04-era spillovers that did not fit — they lead round 7's
#:    window (with anything new in round 7).
#: 3. Entries green in the r05 sweep, cheap-first.
#:
#: tests/test_battery_contract.py::test_sweep_priority_block_leads
#: recomputes this invariant from the CORRECTNESS_r*.json files and goes
#: red the moment a new sweep lands — rotating this tuple is each
#: round's first task.
#:
#: bench.py iterates sorted(battery), so this order never skews
#: per-query bench attribution.
SWEEP_ORDER: tuple[str, ...] = (
    # -- band 1 (sweep window, 50): new round-6 entries first (never
    # -- driver-sampled must sit inside the window) -------------------
    "p05_plan_multi_source",
    "v08_stream_session_window",
    "q57_returned_items",
    "q58_forecast_revenue",
    "q59_salted_skew_join",
    "u08_polymorphic_udtf",
    "d12_semantic_dedup",
    "q60_dynamic_partition_pruning",
    "p06_plan_multi_step",
    "t23_bigram_novelty",
    "s12_quantized_rerank",
    "m07_shot_detection",
    # -- then the 24 entries whose latest driver-green row is r03,
    # -- cheap-first (builder per-query bench), with the two streaming
    # -- entries adjacent at the tail ---------------------------------
    "q29_range_frame_interval",
    "q07_conditional_agg",
    "u04_arrow_scalar_udf",
    "q44_arg_extremes",
    "s07_int8_quantization",
    "t13_vocab_by_source",
    "q31_date_spine_gapfill",
    "q28_array_map_agg",
    "q49_latest_record_dedup",
    "d10_cluster_survivors",
    "q26_sliding_window",
    "q55_lateral_topn",
    "q51_salted_skew_agg",
    "q50_higher_order_funcs",
    "t16_sequence_packing",
    "s06_knn_join",
    "q48_shipping_priority",
    "q54_recursive_year_ladder",
    "q56_local_supplier_volume",
    "q45_grouping_sets",
    "t15_benchmark_decontam",
    "s08_kmeans_refine",
    "v01_stream_tumbling_agg",
    "v02_stream_sessionize",
    # -- then the 14 cheapest entries whose latest driver-green row is
    # -- r04, cheap-first ---------------------------------------------
    "q04_weekly_rollup",
    "q06_join_cast_key_broadcast",
    "q12_set_ops",
    "q13_semi_anti_join",
    "q20_tumbling_window",
    "q22_percentiles",
    "q14_rollup",
    "d09_containment",
    "s04_ann_recall",
    "q34_full_outer_reconcile",
    "s05_ann_multiprobe",
    "u02_python_udtf",
    "t01_token_stats",
    "q18_asof_join",
    # -- band 2: r04-era spillovers that did not fit the 50-slot window
    # -- (q05/t14/q27/d08/q25/t07/u01/q41/q09/t02/q53/t05 slipped out
    # -- as round-6 entries took window slots)
    "q05_left_join_multikey",
    "t14_tfidf_keywords",
    "q27_correlated_subquery",
    "d08_fuzzy_levenshtein",
    "q25_pivot_unpivot",
    "t07_pii_scan_redact",
    "u01_grouped_pandas_agg",
    "q41_set_ops_all",
    "q09_distinct_agg",
    "t02_quality_score",
    "q53_retention_cohorts",
    "t05_pandas_tokens",
    # -- — these lead round 7 (with anything new in round 7) ----------
    "q10_window_rank",
    "q21_cube_grouping",
    "q19_range_join",
    "q17_hourly_json",
    "q11_running_window",
    "t06_boilerplate_ratio",
    "t03_langid",
    "s02_ann_lsh",
    "q23_approx_distinct",
    "d01_dedup_exact",
    "t11_repetition_score",
    "q24_sessionize_batch",
    "q03_try_dateparse",
    "s03_ann_ivf",
    "u03_pandas_udaf_weighted",
    "q01_pricing_summary",
    "t04_fingerprint",
    "d02_dedup_fingerprint",
    "d06_embedding_neardup",
    "m02_frame_fingerprints",
    "d07_dedup_clusters",
    "d03_ngram_jaccard",
    "d05_simhash",
    "d04_minhash_lsh",
    # -- band 3: green in the r05 sweep, cheap-first ------------------
    "q16_math_funcs",
    "q08_topk_orders",
    "q02_cast_coalesce_project",
    "q30_null_semantics",
    "q37_map_functions",
    "q39_regexp_groups",
    "t12_length_deciles",
    "m01_multimodal_metadata",
    "t09_corpus_stats",
    "q47_bitwise_agg",
    "q32_histogram",
    "q40_union_by_name",
    "q46_ignore_nulls_fill",
    "t10_source_mixture",
    "q42_json_struct_parse",
    "q33_scd2_versions",
    "q15_string_funcs",
    "t08_train_test_split",
    "t20_quality_upsample",
    "q36_explode_outer",
    "t21_training_shuffle",
    "q38_string_agg",
    "q43_rank_family",
    "s01_knn_bruteforce",
    "q52_funnel",
    "u05_arrow_map_batches",
    "d11_sketch_error",
    "q35_not_in_null_trap",
    "s10_filtered_knn",
    "m06_audio_resample",
    "m04_image_decode",
    "t19_token_rarity",
    "t18_sliding_chunks",
    "m05_image_resize",
    "s09_matryoshka_recall",
    "m03_audio_decode",
    "t22_bpe_merges",
    "p04_plan_json_pipeline",
    "v06_stream_static_enrich",
    "v03_stream_dedup_exact",
    "p01_curation_pipeline",
    "t17_chunk_dedup",
    "s11_pq_adc",
    "v05_stream_watermark_eviction",
    "u07_python_writer",
    "v04_stream_stream_join",
    "p03_plan_incremental",
    "v07_stream_python_source",
    "u06_python_datasource",
    "p02_plan_csv_pipeline",
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
