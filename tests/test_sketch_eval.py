"""Semantic invariants for d11 (MinHash sketch-error evaluation) — the
oracle diff proves cross-engine equality; these prove the estimate/exact
columns relate the way the eval claims."""

from __future__ import annotations

import pytest

from agentic_etl_poc_spark.functions.hashing import MINHASH_PERMS
from agentic_etl_poc_spark.queries.dedup import (
    d04_minhash_lsh,
    d11_sketch_error,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def sketch_rows(spark):
    return d11_sketch_error(spark, SF_SMOKE).collect()


def test_d11_bounds(sketch_rows):
    n_perms = len(MINHASH_PERMS)
    assert sketch_rows, "no candidate pairs"
    for r in sketch_rows:
        assert 0 <= r.n_match <= n_perms
        assert 0 <= r.shared <= r.union_sz
        assert 0 <= r.est_milli <= 1000
        assert 0 <= r.exact_milli <= 1000
        assert r.err_milli == abs(r.est_milli - r.exact_milli)
        assert r.id1 < r.id2


def test_d11_candidates_contain_verified_pairs(spark, sketch_rows):
    """Every pair d04 verifies (exact Jaccard >= 0.5) must appear among
    d11's candidates with the same exact Jaccard — the eval runs on the
    SAME candidate set the production dedup verifies."""
    verified = {
        (r.id1, r.id2): r.jaccard
        for r in d04_minhash_lsh(spark, SF_SMOKE).collect()
    }
    cand = {(r.id1, r.id2): r for r in sketch_rows}
    assert verified, "d04 found no pairs — corpus construction broken"
    for pair, jac in verified.items():
        assert pair in cand, f"verified pair {pair} missing from candidates"
        # d04's threshold is jaccard >= 0.5; milli floor keeps >= 500
        assert cand[pair].exact_milli >= 500
        assert abs(cand[pair].exact_milli - jac * 1000) <= 1


def test_d11_estimate_tracks_exact(sketch_rows):
    """The sketch is only 12 permutations, but on average it must track
    the exact Jaccard: mean absolute error stays under 250 milli and the
    injected near-dup pairs (id2 = id1 + 1_000_000) estimate high."""
    mean_err = sum(r.err_milli for r in sketch_rows) / len(sketch_rows)
    assert mean_err < 250, f"sketch error too large: {mean_err}"
    injected = [r for r in sketch_rows if r.id2 == r.id1 + 1_000_000]
    assert injected, "no injected near-dup candidates"
    assert all(r.est_milli >= 500 for r in injected)


def test_s11_pq_recall_beats_random(spark):
    """PQ with an untrained 16-entry codebook is lossy, but ADC ranking
    must still land well above chance (random recall@10 over a ~500-vec
    corpus is ~0.02): require >= 0.2, and exactly TOP_K rows per query
    with 0/1 hit flags."""
    from collections import Counter

    from agentic_etl_poc_spark.queries.similarity import (
        N_QUERIES,
        PQ_TOP_K,
        s11_pq_adc,
    )

    rows = s11_pq_adc(spark, SF_SMOKE).collect()
    per_query = Counter(r.query_id for r in rows)
    assert len(per_query) == N_QUERIES
    assert all(v == PQ_TOP_K for v in per_query.values())
    assert all(r.hit in (0, 1) for r in rows)
    assert all(r.approx_d2 >= 0 and r.exact_d2 >= 0 for r in rows)
    recall = sum(r.hit for r in rows) / len(rows)
    assert recall >= 0.2, f"ADC recall {recall} at chance level"
