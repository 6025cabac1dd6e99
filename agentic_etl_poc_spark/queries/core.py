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


def fixture_fingerprint(sf_dir: str, tables: list[str]) -> str:
    """mtime/size fingerprint of source fixture tables — written into a
    staging marker so regenerated fixtures RESTAGE instead of silently
    reusing stale /tmp copies (which would surface later as a confusing
    oracle hash mismatch).  A parquet table may be a single file or a
    directory of part files."""
    import os

    parts = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            files = [
                os.path.join(root, f)
                for root, _, fs in os.walk(p)
                for f in fs
                if not f.startswith(("_", "."))
            ]
            size = sum(os.path.getsize(f) for f in files)
            mtime = max((int(os.path.getmtime(f)) for f in files), default=0)
        elif os.path.exists(p):
            size = os.path.getsize(p)
            mtime = int(os.path.getmtime(p))
        else:
            size = mtime = 0
        parts.append(f"{t}:{mtime}:{size}")
    return ";".join(parts)


def marker_current(marker: str, fingerprint: str) -> bool:
    """True iff the staging marker exists and records ``fingerprint``."""
    import os

    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        return f.read() == fingerprint


def write_marker(marker: str, fingerprint: str) -> None:
    import os

    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write(fingerprint)


def register(name: str, oracle: str | None, description: str = ""):
    """Decorator: add a query to the battery."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, description=description)
        return fn

    return deco


#: Explicit registry order.  The external correctness sweep walks this
#: order and records only the FIRST ~50 entries per round (rounds 1-5
#: each recorded exactly 50).  Round-7 rotation, three bands:
#:
#: 1. Slots 1-50 (the sweep window) — new round-7 entries first (never
#:    driver-sampled entries must sit inside the window), then all 36
#:    entries whose latest driver-green row is r04 (they have waited
#:    longest), cheap-first (builder per-query bench), then the cheapest
#:    r05-era entries until the window is full.
#: 2. The remaining r05-era entries, cheap-first — they lead round 8's
#:    window (with anything new in round 8).
#: 3. Entries green in the r06 sweep, cheap-first.
#:
#: tests/test_battery_contract.py::test_sweep_priority_block_leads
#: recomputes this invariant from the CORRECTNESS_r*.json files and goes
#: red the moment a new sweep lands — rotating this tuple is each
#: round's first task.
#:
#: bench.py iterates sorted(battery), so this order never skews
#: per-query bench attribution.
SWEEP_ORDER: tuple[str, ...] = (
    # -- band 1 (sweep window, 50): new round-7 entries first (never
    # -- driver-sampled must sit inside the window) -------------------
    "g02_triangle_count",
    "v12_stream_sliding_window",
    "s14_radius_search",
    "q80_aqe_skew_split",
    "m08_audio_vad",
    "p09_plan_stream",
    "d14_incremental_dedup",
    "u11_arrow_grouped_map",
    "q81_sql_variables",
    "s15_binary_quantization",
    "q82_compaction_roundtrip",
    "g03_bfs_levels",
    "q68_late_shipment_priority",
    "q69_promo_revenue_share",
    "q70_disjunctive_predicate_join",
    "q71_important_part_values",
    "q72_dormant_rich_customers",
    "q73_parts_supplier_counts",
    "q74_top_supplier_revenue",
    "q75_part_promotion_suppliers",
    "q76_volume_shipping",
    "q77_market_share",
    "q78_product_type_profit",
    "q79_min_cost_supplier",
    "s13_ivfadc",
    "q61_small_quantity_avg",
    "v09_stream_rocksdb_session",
    "q62_large_volume_customers",
    "q63_suppliers_kept_waiting",
    "v10_stream_outer_join",
    "d13_perceptual_dhash",
    "q64_customer_distribution",
    "v11_stream_upsert_sink",
    "u09_arrow_udtf",
    "p07_plan_quarantine",
    "q65_bucketed_colocated_join",
    "g01_integer_pagerank",
    "q66_bloom_runtime_filter",
    "q67_variant_extract",
    "p08_xml_roundtrip",
    "u10_python_stream_writer",
    # -- then the 36 entries whose latest driver-green row is r04,
    # -- cheap-first (builder per-query bench) ------------------------
    "t14_tfidf_keywords",
    "d08_fuzzy_levenshtein",
    "t07_pii_scan_redact",
    "q05_left_join_multikey",
    "m02_frame_fingerprints",
    "q27_correlated_subquery",
    "q41_set_ops_all",
    "u01_grouped_pandas_agg",
    "q25_pivot_unpivot",
    "q53_retention_cohorts",
    "t02_quality_score",
    "q09_distinct_agg",
    "t05_pandas_tokens",
    "q21_cube_grouping",
    "q11_running_window",
    "q10_window_rank",
    "q19_range_join",
    "d01_dedup_exact",
    "t03_langid",
    "q17_hourly_json",
    "q23_approx_distinct",
    "t06_boilerplate_ratio",
    "t11_repetition_score",
    "q24_sessionize_batch",
    "s03_ann_ivf",
    "s02_ann_lsh",
    "q03_try_dateparse",
    "u03_pandas_udaf_weighted",
    "d07_dedup_clusters",
    "q01_pricing_summary",
    "d06_embedding_neardup",
    "t04_fingerprint",
    "d02_dedup_fingerprint",
    "d03_ngram_jaccard",
    "d05_simhash",
    "d04_minhash_lsh",
    # -- then the 11 cheapest entries whose latest driver-green row is
    # -- r05, cheap-first ---------------------------------------------
    "q08_topk_orders",
    "q39_regexp_groups",
    "q37_map_functions",
    "q02_cast_coalesce_project",
    "q30_null_semantics",
    "q42_json_struct_parse",
    "t12_length_deciles",
    "t08_train_test_split",
    "m01_multimodal_metadata",
    "q40_union_by_name",
    "q47_bitwise_agg",
    # -- band 2: the remaining r05-era entries, cheap-first — these
    # -- lead round 8 (with anything new in round 8) ------------------
    "t10_source_mixture",
    "t21_training_shuffle",
    "q32_histogram",
    "q43_rank_family",
    "q46_ignore_nulls_fill",
    "t09_corpus_stats",
    "q38_string_agg",
    "q36_explode_outer",
    "q16_math_funcs",
    "q33_scd2_versions",
    "t20_quality_upsample",
    "s01_knn_bruteforce",
    "q52_funnel",
    "q15_string_funcs",
    "q35_not_in_null_trap",
    "d11_sketch_error",
    "s10_filtered_knn",
    "u05_arrow_map_batches",
    "t19_token_rarity",
    "m04_image_decode",
    "m03_audio_decode",
    "m06_audio_resample",
    "m05_image_resize",
    "t18_sliding_chunks",
    "t22_bpe_merges",
    "s09_matryoshka_recall",
    "u07_python_writer",
    "p04_plan_json_pipeline",
    "v06_stream_static_enrich",
    "v03_stream_dedup_exact",
    "t17_chunk_dedup",
    "u06_python_datasource",
    "p01_curation_pipeline",
    "s11_pq_adc",
    "v05_stream_watermark_eviction",
    "v07_stream_python_source",
    "v04_stream_stream_join",
    "p03_plan_incremental",
    "p02_plan_csv_pipeline",
    # -- band 3: green in the r06 sweep, cheap-first ------------------
    "q58_forecast_revenue",
    "q29_range_frame_interval",
    "t13_vocab_by_source",
    "q44_arg_extremes",
    "q28_array_map_agg",
    "d10_cluster_survivors",
    "q07_conditional_agg",
    "q13_semi_anti_join",
    "q31_date_spine_gapfill",
    "q20_tumbling_window",
    "q49_latest_record_dedup",
    "s05_ann_multiprobe",
    "d09_containment",
    "s04_ann_recall",
    "q14_rollup",
    "s07_int8_quantization",
    "q04_weekly_rollup",
    "q55_lateral_topn",
    "q06_join_cast_key_broadcast",
    "u02_python_udtf",
    "q12_set_ops",
    "q60_dynamic_partition_pruning",
    "q26_sliding_window",
    "u04_arrow_scalar_udf",
    "t16_sequence_packing",
    "q34_full_outer_reconcile",
    "s06_knn_join",
    "q18_asof_join",
    "m07_shot_detection",
    "q51_salted_skew_agg",
    "q22_percentiles",
    "t01_token_stats",
    "q50_higher_order_funcs",
    "q54_recursive_year_ladder",
    "q48_shipping_priority",
    "q57_returned_items",
    "q56_local_supplier_volume",
    "q45_grouping_sets",
    "t23_bigram_novelty",
    "q59_salted_skew_join",
    "t15_benchmark_decontam",
    "p06_plan_multi_step",
    "v01_stream_tumbling_agg",
    "s12_quantized_rerank",
    "p05_plan_multi_source",
    "u08_polymorphic_udtf",
    "s08_kmeans_refine",
    "v08_stream_session_window",
    "v02_stream_sessionize",
    "d12_semantic_dedup",
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
        graphq,
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
