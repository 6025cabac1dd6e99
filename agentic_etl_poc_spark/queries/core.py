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
            # nanosecond mtimes: a fixture regenerated within the same
            # second (same byte size) must still read as changed
            mtime = max((os.stat(f).st_mtime_ns for f in files), default=0)
        elif os.path.exists(p):
            size = os.path.getsize(p)
            mtime = os.stat(p).st_mtime_ns
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
#: each recorded exactly 50).  Round-12 rotation, five bands:
#:
#: 1. Slots 1-50 (the sweep window) — never-driver-sampled round-12
#:    entries first, then the full 45-entry cohort whose latest hard
#:    driver row is the r07-era sweep (they have now waited longest),
#:    cheap-first (round-11 per-query bench), then the cheapest
#:    r08-era entries to fill the window to exactly 50.
#: 2. The remaining r08-era entries, cheap-first.
#: 3. Entries green in the r09 sweep (q31, q13).
#: 4. Entries green in the r10 sweep, cheap-first.
#: 5. Entries green in the r11 sweep (freshest), cheap-first.
#:
#: tests/test_battery_contract.py::test_sweep_priority_block_leads
#: recomputes this invariant from the CORRECTNESS_r*.json files and goes
#: red the moment a new sweep lands — rotating this tuple is each
#: round's first task.
#:
#: bench.py iterates sorted(battery), so this order never skews
#: per-query bench attribution.
SWEEP_ORDER: tuple[str, ...] = (
    # -- band 1 (sweep window, 50): never-driver-sampled round-12
    # -- entries first, then the r07-era cohort cheap-first, then
    # -- r08-era fills to reach exactly 50 ---------------------------
    "p15_row_change_feed",
    "p16_schema_evolution",
    "q81_sql_variables",
    "p08_xml_roundtrip",
    "t14_tfidf_keywords",
    "q72_dormant_rich_customers",
    "q70_disjunctive_predicate_join",
    "u01_grouped_pandas_agg",
    "q64_customer_distribution",
    "q05_left_join_multikey",
    "u09_arrow_udtf",
    "q41_set_ops_all",
    "q74_top_supplier_revenue",
    "d08_fuzzy_levenshtein",
    "m02_frame_fingerprints",
    "q68_late_shipment_priority",
    "u11_arrow_grouped_map",
    "q25_pivot_unpivot",
    "s15_binary_quantization",
    "q27_correlated_subquery",
    "q75_part_promotion_suppliers",
    "m08_audio_vad",
    "t07_pii_scan_redact",
    "q73_parts_supplier_counts",
    "s14_radius_search",
    "q76_volume_shipping",
    "q77_market_share",
    "d13_perceptual_dhash",
    "q78_product_type_profit",
    "d14_incremental_dedup",
    "q71_important_part_values",
    "v12_stream_sliding_window",
    "q63_suppliers_kept_waiting",
    "q62_large_volume_customers",
    "p09_plan_stream",
    "q79_min_cost_supplier",
    "q67_variant_extract",
    "p07_plan_quarantine",
    "q65_bucketed_colocated_join",
    "v09_stream_rocksdb_session",
    "v11_stream_upsert_sink",
    "s13_ivfadc",
    "v10_stream_outer_join",
    "g03_bfs_levels",
    "g01_integer_pagerank",
    "g02_triangle_count",
    "u10_python_stream_writer",
    "q08_topk_orders",
    "q39_regexp_groups",
    "q37_map_functions",
    # -- band 2: remaining r08-era entries, cheap-first (q08/q39/q37
    # -- moved up as window fills) -----------------------------------
    "q16_math_funcs",
    "t12_length_deciles",
    "q30_null_semantics",
    "q02_cast_coalesce_project",
    "t10_source_mixture",
    "q42_json_struct_parse",
    "t08_train_test_split",
    "m01_multimodal_metadata",
    "t21_training_shuffle",
    "q83_parameterized_sql",
    "q32_histogram",
    "t09_corpus_stats",
    "q47_bitwise_agg",
    "q52_funnel",
    "m09_image_center_crop",
    "t02_quality_score",
    "q10_window_rank",
    "q53_retention_cohorts",
    "q19_range_join",
    "q09_distinct_agg",
    "q11_running_window",
    "q21_cube_grouping",
    "q17_hourly_json",
    "t03_langid",
    "q24_sessionize_batch",
    "q23_approx_distinct",
    "t05_pandas_tokens",
    "s02_ann_lsh",
    "d01_dedup_exact",
    "t11_repetition_score",
    "s03_ann_ivf",
    "q03_try_dateparse",
    "t06_boilerplate_ratio",
    "v13_stream_dedup_within_watermark",
    "v15_stream_dim_refresh",
    "q01_pricing_summary",
    "t04_fingerprint",
    "d02_dedup_fingerprint",
    "u03_pandas_udaf_weighted",
    "p10_plan_jdbc_roundtrip",
    "v14_stream_quarantine",
    "d03_ngram_jaccard",
    "d07_dedup_clusters",
    "d06_embedding_neardup",
    "d05_simhash",
    # -- band 3: green in the r09 sweep ---------------------------
    "q31_date_spine_gapfill",
    "q13_semi_anti_join",
    # -- band 4: green in the r10 sweep, cheap-first --------------
    "p12_jdbc_live_upsert",
    "t25_bpe_n16",
    "d17_multiprobe_semantic_dedup",
    "d16_semantic_recall_audit",
    "p11_jdbc_partitioned_read",
    "t24_bpe_apply",
    "q61_small_quantity_avg",
    "q40_union_by_name",
    "t20_quality_upsample",
    "q36_explode_outer",
    "q46_ignore_nulls_fill",
    "q38_string_agg",
    "q15_string_funcs",
    "q43_rank_family",
    "q33_scd2_versions",
    "q35_not_in_null_trap",
    "s01_knn_bruteforce",
    "u05_arrow_map_batches",
    "t19_token_rarity",
    "s10_filtered_knn",
    "d11_sketch_error",
    "m03_audio_decode",
    "m04_image_decode",
    "m06_audio_resample",
    "m05_image_resize",
    "t18_sliding_chunks",
    "t22_bpe_merges",
    "u07_python_writer",
    "s09_matryoshka_recall",
    "p04_plan_json_pipeline",
    "v06_stream_static_enrich",
    "v03_stream_dedup_exact",
    "t17_chunk_dedup",
    "v05_stream_watermark_eviction",
    "u06_python_datasource",
    "p01_curation_pipeline",
    "v07_stream_python_source",
    "s11_pq_adc",
    "v04_stream_stream_join",
    "p03_plan_incremental",
    "p02_plan_csv_pipeline",
    "d12_semantic_dedup",
    "q58_forecast_revenue",
    "q29_range_frame_interval",
    "q06_join_cast_key_broadcast",
    "q20_tumbling_window",
    "q07_conditional_agg",
    "q04_weekly_rollup",
    "u04_arrow_scalar_udf",
    "t13_vocab_by_source",
    # -- band 5: green in the r11 sweep (freshest), cheap-first ---
    "q66_bloom_runtime_filter",
    "q80_aqe_skew_split",
    "q69_promo_revenue_share",
    "q82_compaction_roundtrip",
    "q60_dynamic_partition_pruning",
    "d10_cluster_survivors",
    "q26_sliding_window",
    "q12_set_ops",
    "q49_latest_record_dedup",
    "q44_arg_extremes",
    "s07_int8_quantization",
    "s05_ann_multiprobe",
    "q55_lateral_topn",
    "q28_array_map_agg",
    "p14_incremental_partition_consume",
    "q51_salted_skew_agg",
    "q34_full_outer_reconcile",
    "t01_token_stats",
    "q22_percentiles",
    "s04_ann_recall",
    "q14_rollup",
    "q54_recursive_year_ladder",
    "t16_sequence_packing",
    "s06_knn_join",
    "q57_returned_items",
    "q48_shipping_priority",
    "d09_containment",
    "u02_python_udtf",
    "q18_asof_join",
    "q50_higher_order_funcs",
    "t27_stratified_sample",
    "q56_local_supplier_volume",
    "q45_grouping_sets",
    "q59_salted_skew_join",
    "m07_shot_detection",
    "t23_bigram_novelty",
    "t15_benchmark_decontam",
    "v01_stream_tumbling_agg",
    "t26_hashing_embed",
    "p06_plan_multi_step",
    "p05_plan_multi_source",
    "s12_quantized_rerank",
    "u08_polymorphic_udtf",
    "s08_kmeans_refine",
    "v08_stream_session_window",
    "d15_lsh_semantic_dedup",
    "v16_stream_lakehouse_upsert",
    "v02_stream_sessionize",
    "p13_lakehouse_upsert",
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
