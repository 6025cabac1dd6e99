"""Semantic invariants for the corpus-quality entries t19/t20 (the oracle
diff proves cross-engine equality; these prove the NUMBERS mean what the
operator claims)."""

from __future__ import annotations

import pytest

from agentic_etl_poc_spark.queries.text import (
    UPSAMPLE_TTR_2,
    UPSAMPLE_TTR_3,
    t19_token_rarity,
    t20_quality_upsample,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def rarity(spark):
    return t19_token_rarity(spark, SF_SMOKE).collect()


def test_t19_deciles_are_balanced_and_complete(rarity):
    from collections import Counter

    deciles = Counter(r.rarity_decile for r in rarity)
    assert sorted(deciles) == list(range(1, 11))
    # NTILE guarantees bucket sizes differ by at most one
    assert max(deciles.values()) - min(deciles.values()) <= 1


def test_t19_decile_monotone_in_score(rarity):
    """Every doc in decile k has mean_ctf_milli <= every doc in decile
    k+1 (NTILE over the score order) — i.e. low deciles really are the
    rare-vocabulary docs."""
    by_decile: dict[int, list[int]] = {}
    for r in rarity:
        by_decile.setdefault(r.rarity_decile, []).append(r.mean_ctf_milli)
    for k in range(1, 10):
        assert max(by_decile[k]) <= min(by_decile[k + 1])


def test_t19_mean_is_floor_of_ratio(rarity):
    for r in rarity:
        assert r.mean_ctf_milli == r.sum_ctf * 1000 // r.n_tokens
        # every token occurs at least once in the corpus (itself)
        assert r.sum_ctf >= r.n_tokens


def test_t20_epoch_counts_nest(spark):
    """Replication semantics: a doc emitting epoch k also emits every
    epoch < k, so per-source doc counts are non-increasing in epoch and
    the epoch set is exactly 1..max."""
    rows = t20_quality_upsample(spark, SF_SMOKE).collect()
    by_source: dict[str, dict[int, int]] = {}
    for r in rows:
        by_source.setdefault(r.source, {})[r.epoch] = r.n_docs
    assert by_source, "no output rows"
    for src, per_epoch in by_source.items():
        epochs = sorted(per_epoch)
        assert epochs == list(range(1, epochs[-1] + 1)), (src, epochs)
        counts = [per_epoch[e] for e in epochs]
        assert counts == sorted(counts, reverse=True), (src, counts)


def test_t20_totals_match_corpus(spark):
    """Epoch-1 rows cover every document exactly once: summing n_docs at
    epoch 1 over sources equals the corpus document count."""
    from agentic_etl_poc_spark.io_tables import table

    rows = t20_quality_upsample(spark, SF_SMOKE).collect()
    n_docs_epoch1 = sum(r.n_docs for r in rows if r.epoch == 1)
    assert n_docs_epoch1 == table(spark, SF_SMOKE, "documents").count()
    assert UPSAMPLE_TTR_3 < UPSAMPLE_TTR_2


def test_t21_shuffle_is_balanced_and_a_permutation(spark):
    """The training shuffle must (a) cover every document exactly once,
    (b) number positions 1..n_shard contiguously per shard, and (c) not
    leave any shard pathologically loaded (uniform hash: no shard should
    hold more than 4x the mean at corpus sizes >= 500... smoke data is
    tiny, so assert the looser all-shards-nonempty-ish bound instead)."""
    from collections import Counter

    from agentic_etl_poc_spark.io_tables import table
    from agentic_etl_poc_spark.queries.text import (
        SHUFFLE_SHARDS,
        t21_training_shuffle,
    )

    rows = t21_training_shuffle(spark, SF_SMOKE).collect()
    n_docs = table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    per_shard = Counter(r.shard for r in rows)
    assert all(0 <= s < SHUFFLE_SHARDS for s in per_shard)
    for shard, n in per_shard.items():
        got = sorted(r.pos for r in rows if r.shard == shard)
        assert got == list(range(1, n + 1)), f"shard {shard} positions {got}"


def test_u06_reader_pushdown_contract():
    """pushFilters must CONSUME EqualTo on declared columns and return
    everything else for Spark to evaluate post-scan."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from agentic_etl_poc_spark.sources.py_datasource import DocsPyReader

    r = DocsPyReader({"path": "/nonexistent"})
    leftover = list(
        r.pushFilters(
            [
                EqualTo(("lang",), "en"),
                EqualTo(("nope",), 1),
                GreaterThan(("n_chars",), 10),
            ]
        )
    )
    assert r._pushed == [("lang", "en")]
    assert len(leftover) == 2


def test_u06_source_matches_parquet_scan(spark):
    """Reading through the custom Python source equals the native parquet
    read, filter applied inside the reader."""
    import os

    from agentic_etl_poc_spark.sources.py_datasource import register

    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    path = os.path.join(SF_SMOKE, "documents.parquet")
    custom = (
        spark.read.format("pydocs").option("path", path).load()
        .filter("lang = 'en'")
        .select("doc_id", "n_chars")
        .collect()
    )
    native = (
        spark.read.parquet(path)
        .filter("lang = 'en'")
        .select("doc_id", "n_chars")
        .collect()
    )
    assert sorted(custom) == sorted(native)
    assert len(custom) > 0


def test_u07_manifest_scopes_reads(spark, tmp_path):
    """The ledger sink's exactly-once contract: a stage file NOT listed in
    the manifest (an aborted/speculative task's orphan) is invisible to
    manifest-scoped reads."""
    import json
    import os

    from agentic_etl_poc_spark.sources.py_datasource import (
        read_ledger,
        register_writer,
    )

    register_writer(spark)
    out = str(tmp_path / "ledger")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    df.coalesce(2).write.format("pyledger").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 10 and len(manifest["files"]) == 2
    # plant an orphan stage file: it must NOT appear in the read
    with open(os.path.join(out, "stage-9-deadbeef.ndjson"), "w") as f:
        f.write('{"id": 999, "v": 999}\n')
    back = read_ledger(spark, out)
    assert back.count() == 10
    assert back.filter("id = 999").count() == 0


def test_u07_append_merges_manifest_overwrite_replaces(spark, tmp_path):
    """mode('append') must MERGE with an existing manifest (a second save
    used to overwrite it wholesale, silently orphaning the first commit's
    parts); mode('overwrite') replaces the manifest so only the new parts
    are visible."""
    import json
    import os

    from agentic_etl_poc_spark.sources.py_datasource import (
        read_ledger,
        register_writer,
    )

    register_writer(spark)
    out = str(tmp_path / "ledger")
    df1 = spark.range(10).selectExpr("id", "id * 2 AS v")
    df1.coalesce(2).write.format("pyledger").option("path", out).mode(
        "append"
    ).save()
    df2 = spark.range(100, 105).selectExpr("id", "id * 2 AS v")
    df2.coalesce(1).write.format("pyledger").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 15 and len(manifest["files"]) == 3
    assert read_ledger(spark, out).count() == 15
    # overwrite: manifest lists ONLY the new commit's parts
    df2.coalesce(1).write.format("pyledger").option("path", out).mode(
        "overwrite"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 5 and len(manifest["files"]) == 1
    assert read_ledger(spark, out).count() == 5


def test_parquet_pieces_recurses_and_rejects_strangers(tmp_path):
    """Partitioned (key=value subdir) datasets enumerate recursively;
    engine sidecars are ignored; an unrecognized entry raises instead of
    silently scanning as missing data."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from agentic_etl_poc_spark.sources.py_datasource import _parquet_pieces

    d = tmp_path / "ds"
    (d / "lang=en").mkdir(parents=True)
    (d / "lang=fr").mkdir()
    tbl = pa.table({"doc_id": pa.array([1], pa.int64())})
    pq.write_table(tbl, str(d / "lang=en" / "part-0.parquet"))
    pq.write_table(tbl, str(d / "lang=fr" / "part-0.parquet"))
    (d / "_SUCCESS").write_text("")
    (d / "lang=en" / ".part-0.parquet.crc").write_text("")
    pieces = _parquet_pieces(str(d))
    assert len(pieces) == 2 and all(p.endswith(".parquet") for p in pieces)
    assert pieces == sorted(pieces)
    (d / "lang=fr" / "stray.txt").write_text("not parquet")
    with pytest.raises(ValueError, match="stray.txt"):
        _parquet_pieces(str(d))


def test_t22_bpe_merges_are_wellformed(spark):
    """Each learned merge is a valid adjacent-symbol pair: exactly one
    separator space, merged symbol is its concatenation, frequencies are
    positive, the three merges are distinct, and later-round pairs may
    reference earlier merged symbols (that's the point of BPE)."""
    from agentic_etl_poc_spark.queries.text import t22_bpe_merges

    rows = t22_bpe_merges(spark, SF_SMOKE).collect()
    assert [r.round for r in rows] == [1, 2, 3]
    seen = set()
    for r in rows:
        left, sep, right = r.pair.partition(" ")
        assert sep == " " and left and right and " " not in right
        assert r.merged == left + right
        assert r.freq > 0
        seen.add(r.pair)
    assert len(seen) == 3


def test_t25_trainer_prefix_matches_t22(spark):
    """The driver-loop trainer (bpe_train_merges) and t22's fully-lazy
    3-round chain implement ONE merge semantics: the first three merges —
    pair, merged symbol, and frequency — must be identical.  Also pins
    that 16 rounds complete on the smoke corpus and stay well-formed
    (distinct pairs, positive frequencies, non-increasing is NOT required
    — a merged symbol can create a new high-frequency pair)."""
    from agentic_etl_poc_spark.queries.text import (
        BPE_N16,
        bpe_merge_table,
        bpe_train_merges,
    )

    trained = bpe_train_merges(spark, SF_SMOKE, BPE_N16)
    assert len(trained) == BPE_N16
    t22 = (
        bpe_merge_table(spark, SF_SMOKE)
        .orderBy("round")
        .select("pair", "merged", "freq")
        .collect()
    )
    assert [(p, m, f) for p, m, f in trained[:3]] == [
        (r.pair, r.merged, r.freq) for r in t22
    ]
    assert len({p for p, _, _ in trained}) == BPE_N16
    for pair, merged, freq in trained:
        left, sep, right = pair.partition(" ")
        assert sep == " " and left and right and " " not in right
        assert merged == left + right
        assert freq > 0


def test_check_size_sums_directory_contents(tmp_path):
    """Admission control must measure a DIRECTORY input as the sum of its
    files, not the directory inode (which silently passes any limit)."""
    import pytest as _pytest

    from agentic_etl_poc_spark.sources.csv_source import check_size

    d = tmp_path / "topic.ndjson"
    d.mkdir()
    (d / "part-0.json").write_text("x" * 600)
    (d / "part-1.json").write_text("y" * 600)
    check_size(str(d), 2000)  # under the limit: fine
    with _pytest.raises(ValueError, match="input too large"):
        check_size(str(d), 1000)  # 1200 bytes of parts must trip it


def test_u06_source_reads_empty_parquet_as_empty(spark, tmp_path):
    """A zero-row-group parquet file must scan as EMPTY through the custom
    Python source, not crash the fabricated partition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from agentic_etl_poc_spark.sources.py_datasource import register

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    path = str(tmp_path / "empty.parquet")
    with pq.ParquetWriter(path, schema):
        pass  # no row groups written
    assert pq.ParquetFile(path).metadata.num_row_groups == 0
    register(spark)
    got = spark.read.format("pydocs").option("path", path).load().collect()
    assert got == []


def test_u06_source_reads_directory_datasets(spark, tmp_path):
    """A parquet DIRECTORY (multi-part, as every engine writes at scale)
    must scan through the custom source as the union of its part files —
    this is the sf1-audit regression (single-file readers crash on the
    tiler's directory output)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from agentic_etl_poc_spark.sources.py_datasource import register

    d = tmp_path / "docs.parquet"
    d.mkdir()
    for i in (0, 1):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([i * 10, i * 10 + 1], pa.int64()),
                    "lang": pa.array(["en", "fr"]),
                    "source": pa.array(["s0", "s1"]),
                    "n_chars": pa.array([5, 7], pa.int64()),
                }
            ),
            str(d / f"part-{i}.parquet"),
        )
    register(spark)
    got = (
        spark.read.format("pydocs").option("path", str(d)).load()
        .orderBy("doc_id")
        .collect()
    )
    assert [r.doc_id for r in got] == [0, 1, 10, 11]
    # pushdown still applies inside the reader on the directory path
    en = (
        spark.read.format("pydocs").option("path", str(d)).load()
        .filter("lang = 'en'")
        .collect()
    )
    assert sorted(r.doc_id for r in en) == [0, 10]
