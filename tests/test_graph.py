"""connected_components contract: correctness, O(log D) convergence via
pointer jumping, and bounded lineage via periodic checkpointing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from agentic_etl_poc_spark.operators.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_path_star_and_pair(spark):
    # path 0-1-2-3-4, star 10-{11,12,13}, pair 20-21
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)]
    got = {
        (r["node"], r["label"])
        for r in connected_components(_edges(spark, pairs)).collect()
    }
    want = {(n, 0) for n in range(5)} | {(n, 10) for n in (10, 11, 12, 13)} | {
        (20, 20),
        (21, 21 - 1),
    }
    assert got == want


def test_pointer_jumping_converges_in_log_rounds(spark):
    # A 64-hop chain: naive propagation needs ~64 rounds; pointer jumping
    # must land in O(log2(64)) ~ 6-8 rounds (+1 to detect the fixpoint).
    n = 65
    chain = [(i, i + 1) for i in range(n - 1)]
    stats: dict = {}
    df = connected_components(_edges(spark, chain), stats=stats)
    assert df.agg(F.max("label")).collect()[0][0] == 0
    assert df.count() == n
    assert stats["rounds"] <= int(math.log2(n)) + 4, stats


def test_checkpoint_cadence_fires_and_result_is_lineage_free(spark):
    n = 33
    chain = [(i, i + 1) for i in range(n - 1)]
    stats: dict = {}
    df = connected_components(
        _edges(spark, chain), checkpoint_every=2, stats=stats
    )
    assert stats["checkpoints"] >= 1, stats
    # result is checkpointed: plan is a bare RDD scan, not a 2^rounds tree
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert {r["label"] for r in df.collect()} == {0}
