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
#: each recorded exactly 50).  Round-8 rotation, four bands:
#:
#: 1. Slots 1-50 (the sweep window) — new round-8 entries first (never
#:    driver-sampled entries must sit inside the window), then all 27
#:    entries whose latest driver-green row is r04 (they have waited
#:    longest), cheap-first (builder per-query bench), then the cheapest
#:    r05-era entries until the window is full.
#: 2. The remaining r05-era entries, cheap-first — they lead round 9's
#:    window (with anything new in round 9).
#: 3. Entries whose latest green is the r06 sweep, cheap-first.
#: 4. Entries green in the r07 sweep (freshest), cheap-first.
#:
#: tests/test_battery_contract.py::test_sweep_priority_block_leads
#: recomputes this invariant from the CORRECTNESS_r*.json files and goes
#: red the moment a new sweep lands — rotating this tuple is each
#: round's first task.
#:
#: bench.py iterates sorted(battery), so this order never skews
#: per-query bench attribution.
SWEEP_ORDER: tuple[str, ...] = (
    # round-9 additions (placeholder slot — full round-9 rotation follows
    # once all new entries land)
    "d16_semantic_recall_audit",
    "p11_jdbc_partitioned_read",
    "t24_bpe_apply",
    # -- band 1 (sweep window, 50): new round-8 entries go at the very
    # -- front (never driver-sampled must sit inside the window), then
    "v13_stream_dedup_within_watermark",
    "p10_plan_jdbc_roundtrip",
    "v14_stream_quarantine",
    "q83_parameterized_sql",
    "m09_image_center_crop",
    "d15_lsh_semantic_dedup",
    "v15_stream_dim_refresh",
    # -- the 27 entries whose latest driver-green row is r04 (waited
    # -- longest), cheap-first (builder per-query bench) --------------
    "q53_retention_cohorts",
    "q19_range_join",
    "q09_distinct_agg",
    "q10_window_rank",
    "d01_dedup_exact",
    "q17_hourly_json",
    "t02_quality_score",
    "s02_ann_lsh",
    "t03_langid",
    "q23_approx_distinct",
    "q21_cube_grouping",
    "q11_running_window",
    "q24_sessionize_batch",
    "t05_pandas_tokens",
    "t06_boilerplate_ratio",
    "s03_ann_ivf",
    "t11_repetition_score",
    "q03_try_dateparse",
    "q01_pricing_summary",
    "t04_fingerprint",
    "d02_dedup_fingerprint",
    "u03_pandas_udaf_weighted",
    "d07_dedup_clusters",
    "d06_embedding_neardup",
    "d03_ngram_jaccard",
    "d05_simhash",
    "d04_minhash_lsh",
    # -- then the 16 cheapest entries whose latest driver-green row
    # -- is r05, cheap-first, filling the window to exactly 50
    # -- (7 round-8 entries + 27 r04-era + 16 r05-era) ----------------
    "q30_null_semantics",
    "q08_topk_orders",
    "t12_length_deciles",
    "q39_regexp_groups",
    "m01_multimodal_metadata",
    "q37_map_functions",
    "q02_cast_coalesce_project",
    "t10_source_mixture",
    "t08_train_test_split",
    "q32_histogram",
    "q16_math_funcs",
    "q42_json_struct_parse",
    "t21_training_shuffle",
    "t09_corpus_stats",
    "q47_bitwise_agg",
    "q52_funnel",
    # -- band 2: the remaining r05-era entries, cheap-first — these
    # -- lead round 9 (with anything new in round 9) ------------------
    "t20_quality_upsample",
    "q43_rank_family",
    "q46_ignore_nulls_fill",
    "q38_string_agg",
    "q36_explode_outer",
    "q40_union_by_name",
    "q15_string_funcs",
    "q35_not_in_null_trap",
    "s01_knn_bruteforce",
    "u05_arrow_map_batches",
    "d11_sketch_error",
    "q33_scd2_versions",
    "s10_filtered_knn",
    "t19_token_rarity",
    "m03_audio_decode",
    "m06_audio_resample",
    "t18_sliding_chunks",
    "m04_image_decode",
    "m05_image_resize",
    "u07_python_writer",
    "s09_matryoshka_recall",
    "p04_plan_json_pipeline",
    "t22_bpe_merges",
    "v06_stream_static_enrich",
    "v03_stream_dedup_exact",
    "u06_python_datasource",
    "t17_chunk_dedup",
    "p01_curation_pipeline",
    "s11_pq_adc",
    "v05_stream_watermark_eviction",
    "v07_stream_python_source",
    "v04_stream_stream_join",
    "p03_plan_incremental",
    "p02_plan_csv_pipeline",
    # -- band 3: latest green in the r06 sweep, cheap-first -----------
    "q58_forecast_revenue",
    "q29_range_frame_interval",
    "q31_date_spine_gapfill",
    "q20_tumbling_window",
    "q06_join_cast_key_broadcast",
    "q60_dynamic_partition_pruning",
    "d10_cluster_survivors",
    "q07_conditional_agg",
    "q28_array_map_agg",
    "t13_vocab_by_source",
    "q26_sliding_window",
    "q55_lateral_topn",
    "q22_percentiles",
    "q13_semi_anti_join",
    "s04_ann_recall",
    "s07_int8_quantization",
    "q49_latest_record_dedup",
    "q04_weekly_rollup",
    "u04_arrow_scalar_udf",
    "q14_rollup",
    "q44_arg_extremes",
    "s05_ann_multiprobe",
    "u02_python_udtf",
    "q57_returned_items",
    "q51_salted_skew_agg",
    "s06_knn_join",
    "d09_containment",
    "t16_sequence_packing",
    "q12_set_ops",
    "q54_recursive_year_ladder",
    "q18_asof_join",
    "q34_full_outer_reconcile",
    "t01_token_stats",
    "q56_local_supplier_volume",
    "m07_shot_detection",
    "q48_shipping_priority",
    "q50_higher_order_funcs",
    "q59_salted_skew_join",
    "q45_grouping_sets",
    "t23_bigram_novelty",
    "p06_plan_multi_step",
    "t15_benchmark_decontam",
    "v01_stream_tumbling_agg",
    "p05_plan_multi_source",
    "s12_quantized_rerank",
    "u08_polymorphic_udtf",
    "s08_kmeans_refine",
    "v08_stream_session_window",
    "v02_stream_sessionize",
    "d12_semantic_dedup",
    # -- band 4: green in the r07 sweep (freshest), cheap-first -------
    "q66_bloom_runtime_filter",
    "q80_aqe_skew_split",
    "q69_promo_revenue_share",
    "q70_disjunctive_predicate_join",
    "q61_small_quantity_avg",
    "q72_dormant_rich_customers",
    "q81_sql_variables",
    "q64_customer_distribution",
    "q82_compaction_roundtrip",
    "p08_xml_roundtrip",
    "q68_late_shipment_priority",
    "t14_tfidf_keywords",
    "d08_fuzzy_levenshtein",
    "u09_arrow_udtf",
    "q05_left_join_multikey",
    "q75_part_promotion_suppliers",
    "u01_grouped_pandas_agg",
    "q74_top_supplier_revenue",
    "m02_frame_fingerprints",
    "q27_correlated_subquery",
    "q25_pivot_unpivot",
    "u11_arrow_grouped_map",
    "q73_parts_supplier_counts",
    "s15_binary_quantization",
    "q41_set_ops_all",
    "d14_incremental_dedup",
    "m08_audio_vad",
    "t07_pii_scan_redact",
    "q76_volume_shipping",
    "s14_radius_search",
    "q77_market_share",
    "q78_product_type_profit",
    "d13_perceptual_dhash",
    "q71_important_part_values",
    "q63_suppliers_kept_waiting",
    "q62_large_volume_customers",
    "v12_stream_sliding_window",
    "q79_min_cost_supplier",
    "p09_plan_stream",
    "p07_plan_quarantine",
    "q67_variant_extract",
    "q65_bucketed_colocated_join",
    "v09_stream_rocksdb_session",
    "v11_stream_upsert_sink",
    "s13_ivfadc",
    "v10_stream_outer_join",
    "g03_bfs_levels",
    "g01_integer_pagerank",
    "u10_python_stream_writer",
    "g02_triangle_count",
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
