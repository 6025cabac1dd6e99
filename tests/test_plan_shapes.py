"""Physical-plan shape assertions for the battery's scale claims.

Correctness is the oracle suite's job; these tests pin the OPTIMIZER
behavior the 100 TB story depends on — filter pushdown into the parquet
scan, column pruning, dimension broadcast, top-k without a global sort.
If a refactor silently turns a broadcast join into a shuffle join or
widens a scan to all columns, this is the suite that goes red.
"""

from __future__ import annotations

from agentic_etl_poc_spark.queries import load_all


from tests.conftest import formatted_plan as _formatted_plan


def test_q01_pushdown_and_pruning(spark, sf_smoke):
    plan = _formatted_plan(load_all()["q01_pricing_summary"].fn(spark, sf_smoke))
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    # the scan reads only needed columns (lineitem has 16; q01 needs 7)
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_q06_dims_broadcast(spark, sf_smoke):
    plan = _formatted_plan(
        load_all()["q06_join_cast_key_broadcast"].fn(spark, sf_smoke)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_s01_topk_no_global_sort(spark, sf_smoke):
    plan = _formatted_plan(load_all()["s01_knn_bruteforce"].fn(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_q08_topk_no_global_sort(spark, sf_smoke):
    plan = _formatted_plan(load_all()["q08_topk_orders"].fn(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_d03_gram_exchange_reused(spark, sf_smoke):
    """The explicit repartition(gram) exchange must be REUSED across its
    consumers — visible only in the AQE final plan, so execute first."""
    df = load_all()["d03_ngram_jaccard"].fn(spark, sf_smoke)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, final[:2000]


def test_d08_blocked_equi_join_not_nested_loop(spark, sf_smoke):
    """d08's candidate generation must be an equi-join on the blocking
    token — a nested-loop/cartesian over the block is the O(n^2) shape
    that dies at scale."""
    plan = _formatted_plan(load_all()["d08_fuzzy_levenshtein"].fn(spark, sf_smoke))
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    ), plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q48_filters_pushed_joins_broadcast_topk_no_sort(spark, sf_smoke):
    """TPC-H Q3 shape: every filter reaches its parquet scan, both joins
    broadcast (post-filter dims are small), top-10 is TakeOrdered."""
    plan = _formatted_plan(load_all()["q48_shipping_priority"].fn(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any("l_shipdate" in line for line in pushed)
    assert any("o_orderdate" in line for line in pushed)
    assert any("c_mktsegment" in line for line in pushed)


def test_window_topk_uses_group_limit(spark, sf_smoke):
    """rank <= k filters must push down as WindowGroupLimit (partial
    per-group top-k BEFORE the window shuffle) — without it every group's
    full contents sort through the exchange."""
    for name in ("q49_latest_record_dedup", "s06_knn_join"):
        plan = _formatted_plan(load_all()[name].fn(spark, sf_smoke))
        assert "WindowGroupLimit" in plan, name


def test_q45_single_expand_aggregate(spark, sf_smoke):
    """GROUPING SETS must plan as ONE Expand + aggregate over one scan of
    the joined input — not a union of three aggregations."""
    plan = _formatted_plan(load_all()["q45_grouping_sets"].fn(spark, sf_smoke))
    assert "Expand" in plan
    assert "Union" not in plan


def test_q56_six_way_join_all_hash_no_nested_loop(spark, sf_smoke):
    """TPC-H Q5: every join is hash-based (broadcast or shuffled) — a
    six-way join that degrades to a nested loop or cartesian is the
    classic 100 TB killer."""
    plan = _formatted_plan(
        load_all()["q56_local_supplier_volume"].fn(spark, sf_smoke)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    ) >= 5


def test_q51_salted_agg_is_two_hash_stages(spark, sf_smoke):
    """The salted rewrite must stay a pure aggregate pipeline: two
    map-side-combinable hash aggregations, no Expand (which a
    distinct-style rewrite would introduce), no join."""
    plan = _formatted_plan(load_all()["q51_salted_skew_agg"].fn(spark, sf_smoke))
    assert plan.count("HashAggregate") >= 4  # partial+final x two stages
    assert "Expand" not in plan
    assert "Join" not in plan


def test_q20_no_python_in_plan(spark, sf_smoke):
    """Pure-relational queries must not fall back to Python evaluation."""
    for name in ("q01_pricing_summary", "q05_left_join_multikey",
                 "q20_tumbling_window"):
        plan = _formatted_plan(load_all()[name].fn(spark, sf_smoke))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_t06_common_grams_broadcast_not_shuffled(spark, sf_smoke):
    """t06's scale claim: the scoring join broadcasts the common-gram
    MINORITY — the gram table must never shuffle on gram for scoring
    (its only shuffles are the map-side-partial doc-frequency agg and
    the per-doc groupBy)."""
    plan = _formatted_plan(load_all()["t06_boilerplate_ratio"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_s03_ivf_assignment_is_aggregate_not_window(spark, sf_smoke):
    """s03's scale claim: centroid assignment is a max_by AGGREGATE with
    map-side partials (one row per vector reaches the exchange), not a
    row_number window over the corpus×N_CELLS expanded frame.  Exactly
    one Window remains — the final per-query top-k."""
    import re

    plan = _formatted_plan(load_all()["s03_ann_ivf"].fn(spark, sf_smoke))
    # \b excludes WindowGroupLimit (the top-k rank-pushdown rewrite)
    windows = re.findall(r"\(\d+\) Window\b", plan)
    assert len(windows) == 1, plan[:3000]
    # the assignment aggregate has a map-side partial stage
    assert "partial_max_by" in plan


def test_t14_df_table_broadcast(spark, sf_smoke):
    """t14's scale claim: the per-term document-frequency table is the
    small side and broadcasts; the doc-term frame never shuffles on term
    for the idf join."""
    plan = _formatted_plan(load_all()["t14_tfidf_keywords"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_s10_filter_pushed_before_distance(spark, sf_smoke):
    """Filtered vector search: the metadata predicate must reach the
    parquet SCAN (pre-filtering), not run after the distance kernel —
    post-filtering is both the classic filtered-ANN correctness bug and
    a full-corpus distance scan at 100 TB."""
    plan = _formatted_plan(load_all()["s10_filtered_knn"].fn(spark, sf_smoke))
    scan_filters = plan.split("PushedFilters")[1].split("\n")[0]
    assert "label" in scan_filters, scan_filters
    # and the query side stays a broadcast, corpus never shuffles
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_t18_chunker_is_shuffle_free_before_sort(spark, sf_smoke):
    """Sliding-window chunking is pure per-row expression work: the only
    Exchange allowed in the plan is the final presentation sort's range
    partitioning — a shuffle before it would mean the chunker
    materializes per-chunk rows through a partitioner at 100 TB."""
    plan = _formatted_plan(load_all()["t18_sliding_chunks"].fn(spark, sf_smoke))
    body = plan.split("== Physical Plan ==")[1]
    assert "hashpartitioning" not in body, body
    tree = body.split("(1) Scan")[0]
    n_exchanges = sum("Exchange" in ln for ln in tree.splitlines())
    assert n_exchanges == 1 and "rangepartitioning" in body, body


def test_s11_pq_encode_is_aggregate_codebook_broadcast(spark, sf_smoke):
    """s11's scale claims: the codebook / distance-table sides of every
    join BROADCAST (the corpus never shuffles against them), and the
    per-subspace argmin encoding is a min AGGREGATE with map-side
    partials — one encoded row per vector reaches the exchange, not 16
    scored candidates."""
    plan = _formatted_plan(load_all()["s11_pq_adc"].fn(spark, sf_smoke))
    assert "partial_min" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_t19_vocab_broadcast_back_onto_tokens(spark, sf_smoke):
    """t19's scale claim: the Heaps-law-bounded term-frequency table
    BROADCASTS back onto the exploded token stream — the corpus tokens
    never shuffle on term for the re-join."""
    plan = _formatted_plan(load_all()["t19_token_rarity"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_t21_shuffle_orders_within_shard_not_globally(spark, sf_smoke):
    """t21's scale claim: exactly one Window (the per-shard position),
    partitioned on the shard key — plus the output presentation sort.
    No window over an unpartitioned frame (that would serialize the
    corpus through one task)."""
    import re

    plan = _formatted_plan(
        load_all()["t21_training_shuffle"].fn(spark, sf_smoke)
    )
    windows = re.findall(r"\(\d+\) Window\b", plan)
    assert len(windows) == 1, plan[:2000]
    # the window's exchange must be a hash partitioning (Catalyst
    # pre-projects the shard expression as a _w0 column, so match the
    # partitioning KIND) — an unpartitioned window would plan
    # SinglePartition instead, serializing the corpus through one task
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(" in plan, plan[:2000]


def test_q60_scan_has_dynamic_pruning(spark, sf_smoke):
    """q60's whole point: the year-partitioned fact scan must carry a
    runtime dynamicpruning partition filter derived from the filtered
    dim side (reusing its broadcast), so the scan reads ONE year's
    partition directory — a static plan without it reads every
    partition and only filters post-join."""
    plan = _formatted_plan(
        load_all()["q60_dynamic_partition_pruning"].fn(spark, sf_smoke)
    )
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    assert "BroadcastHashJoin" in plan


def test_q65_bucketed_join_has_no_exchange_below_join(spark, sf_smoke):
    """q65's whole point: both scans are bucketed by the join key, so
    the SortMergeJoin consumes them with NO exchange on either input —
    the only exchange in the plan is the post-join re-key for the
    nation aggregate.  A plan with 2+ extra exchanges means bucketing
    was ignored and the join reshuffled both sides."""
    import re

    plan = _formatted_plan(
        load_all()["q65_bucketed_colocated_join"].fn(spark, sf_smoke)
    )
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Bucketed: true" in plan, plan[:3000]
    # the tree section: everything below the SortMergeJoin node is its
    # inputs — no Exchange may appear there (the exchanges ABOVE it, the
    # aggregate re-key and the presentation sort, are expected)
    tree = plan.split("\n\n")[0]
    smj_at = tree.index("SortMergeJoin")
    join_inputs = tree[smj_at:]
    assert "Exchange" not in join_inputs, (
        f"exchange below the bucketed join — bucketing was ignored and "
        f"a side reshuffled:\n{tree}"
    )
    assert join_inputs.count("Scan parquet") == 2, tree


def test_q66_join_carries_bloom_runtime_filter(spark, sf_smoke):
    """q66's whole point: under the scoped threshold, Spark builds a
    bloom filter from the filtered dim's join keys and injects
    might_contain(xxhash64(l_orderkey)) into the fact side — row-level
    runtime pruning before the shuffle (the sibling of q60's partition-
    level dynamic pruning)."""
    from agentic_etl_poc_spark.queries.relational import (
        bloom_filter_scope,
        bloom_join_frame,
    )

    with bloom_filter_scope(spark):
        plan = _formatted_plan(bloom_join_frame(spark, sf_smoke))
        assert "bloom_filter_agg" in plan, plan[:3000]
        assert "might_contain" in plan, plan[:3000]
        assert "SortMergeJoin" in plan, plan[:2000]


def test_q80_aqe_splits_skewed_join(spark, sf_smoke):
    """q80's whole point: under the scoped thresholds, AQE measures the
    join shuffle's runtime partition sizes, finds the hot key's
    partition, and splits it across map-output ranges —
    SortMergeJoin(skew=true) in the final adaptive plan, with no salting
    column in the query."""
    from agentic_etl_poc_spark.queries.relational import (
        aqe_skew_scope,
        skew_join_frame,
    )

    with aqe_skew_scope(spark):
        df = skew_join_frame(spark, sf_smoke)
        df.collect()  # AQE finalizes the plan only on execution
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    assert "skew=true" in plan, plan[:3000]
