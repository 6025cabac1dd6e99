"""Exhaustive arithmetic invariants for the two chunkers (t17 fixed
non-overlapping, t18 sliding-window): every doc length from 1 to 60
tokens in one DataFrame, checked row-by-row against a plain-Python
reference.  Complements the oracle edge tests (which sample lengths)
with full coverage of the boundary arithmetic domain."""

from __future__ import annotations

from agentic_etl_poc_spark.queries import load_all
from agentic_etl_poc_spark.queries.pipeline import table  # noqa: F401
from agentic_etl_poc_spark.queries.text import CHUNK_W, SLIDE_S, SLIDE_W

MAX_N = 60


def _docs_df(spark):
    rows = [
        (n, " ".join(f"w{j}" for j in range(n)), "en", "web", 3 * n)
        for n in range(1, MAX_N + 1)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _stage(spark, tmp_path):
    _docs_df(spark).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_t18_sliding_covers_every_token_exactly(spark, tmp_path):
    sf = _stage(spark, tmp_path)
    out = load_all()["t18_sliding_chunks"].fn(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n in range(1, MAX_N + 1):  # doc_id == token count
        chunks = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
        want_k = 1 if n <= SLIDE_W else -(-(n - SLIDE_W) // SLIDE_S) + 1
        assert len(chunks) == want_k, (n, len(chunks), want_k)
        covered = set()
        for i, r in enumerate(chunks, start=1):
            assert r["chunk_idx"] == i
            assert r["start_tok"] == (i - 1) * SLIDE_S + 1
            assert r["n_tok"] == min(SLIDE_W, n - r["start_tok"] + 1)
            assert r["n_tok"] >= 1
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
        assert covered == set(range(1, n + 1)), f"n={n}: gap in coverage"
        last = chunks[-1]
        assert last["start_tok"] + last["n_tok"] - 1 == n


def test_t17_fixed_chunk_counts_exact(spark, tmp_path):
    sf = _stage(spark, tmp_path)
    out = load_all()["t17_chunk_dedup"].fn(spark, sf).collect()
    got = {r["doc_id"]: r for r in out}
    for n in range(1, MAX_N + 1):
        if n < CHUNK_W:
            assert n not in got, f"n={n}: sub-chunk doc must yield no row"
        else:
            assert got[n]["n_chunks"] == n // CHUNK_W, (n, got[n])
    # cross-doc first-occurrence rule: every doc shares the 'w0..w4'
    # prefix chunk; the lowest doc_id (doc 5) keeps it, every later doc's
    # copy is counted as removed
    assert got[CHUNK_W]["n_removed"] == 0
    for n in range(CHUNK_W + 1, MAX_N + 1):
        assert got[n]["n_removed"] >= 1, f"n={n}: shared prefix chunk not deduped"
