"""Pin for the round-13 MinHash exact-overlap restructure.

``_build_candidate_stats`` replaced the per-gram pair-explosion join
(pair x grams(doc1) rows shuffled on (id2, gram)) with a per-run
integer gram dictionary + per-doc gid arrays + a batched NumPy
intersection.  The dictionary argument: any injective gram -> gid map
preserves gram equality, so |g1 ∩ g2| is unchanged.  This test compares
the WHOLE stats frame (n_match, shared, union_sz per candidate pair)
against the retired string-join shape on the sf0.001 corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from agentic_etl_poc_spark.queries.dedup import (
    MINHASH_PERMS,
    _band_candidates,
    _build_candidate_stats,
    _minhash_wide,
    shared_toks,
)


def _retired_stats(spark, toks):
    """The pre-round-13 stats build, verbatim (string-join overlap)."""
    minhash = _minhash_wide(toks).localCheckpoint(eager=True)
    cand = _band_candidates(minhash)
    w1 = minhash.select(
        F.col("doc_id").alias("id1"),
        *[F.col(f"m{i}").alias(f"a{i}") for i, _, _ in MINHASH_PERMS],
    )
    w2 = minhash.select(
        F.col("doc_id").alias("id2"),
        *[F.col(f"m{i}").alias(f"b{i}") for i, _, _ in MINHASH_PERMS],
    )
    n_match = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("bigint")
        for i, _, _ in MINHASH_PERMS
    )
    est = cand.join(w1, "id1").join(w2, "id2").select(
        "id1", "id2", n_match.alias("n_match")
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    t1 = toks.alias("t1")
    t2 = toks.alias("t2")
    inter = (
        cand.join(t1, F.col("id1") == F.col("t1.doc_id"))
        .join(
            t2,
            (F.col("id2") == F.col("t2.doc_id"))
            & (F.col("t1.gram") == F.col("t2.gram")),
        )
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    shared = F.coalesce(F.col("shared"), F.lit(0)).cast("bigint")
    return (
        est.join(inter, ["id1", "id2"], "left")
        .join(s1, F.col("id1") == F.col("s1.doc_id"))
        .join(s2, F.col("id2") == F.col("s2.doc_id"))
        .select(
            "id1",
            "id2",
            "n_match",
            shared.alias("shared"),
            (F.col("s1.sz") + F.col("s2.sz") - shared)
            .cast("bigint")
            .alias("union_sz"),
        )
    )


def test_candidate_stats_match_retired_join(spark, sf_smoke):
    toks = shared_toks(spark, sf_smoke)
    want = {
        (r.id1, r.id2): (r.n_match, r.shared, r.union_sz)
        for r in _retired_stats(spark, toks).collect()
    }
    got = {
        (r.id1, r.id2): (r.n_match, r.shared, r.union_sz)
        for r in _build_candidate_stats(spark, sf_smoke).collect()
    }
    assert want, "no candidate pairs at sf0.001 would make this vacuous"
    assert got == want, (
        f"stats diverged: {len(set(want) ^ set(got))} pair-key diffs; "
        f"value diffs: "
        f"{[(k, want[k], got[k]) for k in want if k in got and want[k] != got[k]][:3]}"
    )
    # schema parity (the oracle hashes through pandas dtypes)
    new = _build_candidate_stats(spark, sf_smoke)
    assert [
        (f.name, f.dataType.simpleString()) for f in new.schema.fields
    ] == [
        ("id1", "bigint"),
        ("id2", "bigint"),
        ("n_match", "bigint"),
        ("shared", "bigint"),
        ("union_sz", "bigint"),
    ]
