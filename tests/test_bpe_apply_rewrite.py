"""Round-12 optimization guard: the vocabulary-sized JVM BPE apply
(_bpe_apply_frame) must reproduce the retired per-occurrence Python
kernel EXACTLY — same per-doc word/pre-token/token/merge counts, same
dropped-doc semantics — for merge lists of any rank order, including
edge-case corpora (NULL text, empty text, multi-space runs, words that
merge repeatedly)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agentic_etl_poc_spark.queries.text import _bpe_apply_frame

MERGES = [
    ("a b", "ab"),       # round 1: pair of single chars
    ("ab c", "abc"),     # round 2: references the round-1 symbol
    ("x x", "xx"),       # round 3: self-pair (overlap skip semantics)
]

TEXTS = [
    (1, "abc abc ab"),          # words that merge through both rounds
    (2, "a b c"),               # single-char words — no in-word pairs
    (3, None),                  # NULL text: no words, doc dropped
    (4, ""),                    # empty text: no words, doc dropped
    (5, "  abc   xxxx "),       # multi-space runs -> empty split tokens
    (6, "xxxxx"),               # odd run: 3-pass replace-all semantics
    (7, "zzz abcabc"),          # untouched word + concatenated symbol
]


def _python_kernel(texts, merges):
    """The retired mapInPandas kernel, verbatim semantics."""
    out = []
    for doc_id, text in texts:
        n_words = pre = post = 0
        words = text.split(" ") if isinstance(text, str) else []
        for w in words:
            if not w:
                continue
            n_words += 1
            pre += len(w)
            seq = " " + " ".join(w) + " "
            for pair, merged in merges:
                pat = f" {pair} "
                rep = f" {merged} "
                for _ in range(3):
                    seq = seq.replace(pat, rep)
            post += len(seq.split())
        if n_words == 0:
            continue
        out.append((doc_id, n_words, pre, post, pre - post))
    return sorted(out)


@pytest.fixture(scope="module")
def tiny_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_docs")
    ids = [t[0] for t in TEXTS]
    texts = [t[1] for t in TEXTS]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["synth"] * len(ids)),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_jvm_apply_matches_python_kernel(spark, tiny_docs_dir):
    got = sorted(
        (r.doc_id, r.n_words, r.pre_tokens, r.n_tokens, r.n_merged)
        for r in _bpe_apply_frame(spark, tiny_docs_dir, MERGES).collect()
    )
    assert got == _python_kernel(TEXTS, MERGES)


def test_jvm_apply_empty_merge_list(spark, tiny_docs_dir):
    got = sorted(
        (r.doc_id, r.n_words, r.pre_tokens, r.n_tokens, r.n_merged)
        for r in _bpe_apply_frame(spark, tiny_docs_dir, []).collect()
    )
    assert got == _python_kernel(TEXTS, [])
    # no merges -> every char is a token, n_merged = 0 everywhere
    assert all(r[4] == 0 for r in got)
