"""Bit-identity pin for d12's vectorized coarse assignment.

``_d12_assigned_vec`` replaced the crossJoin + interpreted-HOF-fold +
max_by chain (round 13).  The oracles hash every downstream decision
(cell_id, is_dup, and d16's recall counters), so the assignment must be
EXACTLY the retired chain: same cell_id, same cent_sim bits, same nsq
bits, for every vector — including max_by's tie rule (equal sims pick
the LOWEST cell_id).  The retired chain is reproduced verbatim here and
compared bitwise on the raw sf0.001 embeddings AND on the planted-twin
audit corpus (double arrays, the d16 path).
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from agentic_etl_poc_spark.functions.hashing import dot_fold
from agentic_etl_poc_spark.io_tables import table
from agentic_etl_poc_spark.queries.dedup import (
    D12_MIN_CELLS,
    _d12_assigned_vec,
    _twin_corpus,
)


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def _retired_chain(corpus):
    """The pre-round-13 assignment, verbatim (crossJoin + HOF fold +
    max_by argmax), kept here as the semantic pin."""
    e = corpus.select(
        "vec_id",
        "embedding",
        dot_fold(F.col("embedding"), F.col("embedding")).alias("nsq"),
    )
    kf = corpus.agg(
        F.greatest(
            F.lit(D12_MIN_CELLS).cast("bigint"),
            F.floor(F.sqrt(F.count(F.lit(1)))).cast("bigint"),
        ).alias("k")
    )
    cents = F.broadcast(
        e.crossJoin(F.broadcast(kf))
        .filter(F.col("vec_id") < F.col("k"))
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("cvec"),
            F.col("nsq").alias("cnsq"),
        )
    )
    scored = e.crossJoin(cents).select(
        "vec_id",
        "nsq",
        "cell_id",
        (
            dot_fold(F.col("embedding"), F.col("cvec"))
            / F.sqrt(F.col("nsq") * F.col("cnsq"))
        ).alias("sim"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("nsq", "cell_id", "sim"),
                F.struct(F.col("sim"), (-F.col("cell_id")).alias("neg_cell")),
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.nsq").alias("nsq"),
            F.col("b.cell_id").alias("cell_id"),
            F.col("b.sim").alias("cent_sim"),
        )
    )


def _assert_identical(corpus):
    old = {r.vec_id: r for r in _retired_chain(corpus).collect()}
    new = {
        r.vec_id: r
        for r in _d12_assigned_vec(corpus)
        .select("vec_id", "nsq", "cell_id", "cent_sim")
        .collect()
    }
    assert old.keys() == new.keys()
    bad = []
    for vid, o in old.items():
        nw = new[vid]
        if (
            o.cell_id != nw.cell_id
            or _bits(o.nsq) != _bits(nw.nsq)
            or _bits(o.cent_sim) != _bits(nw.cent_sim)
        ):
            bad.append((vid, tuple(o), tuple(nw)))
    assert not bad, f"{len(bad)} vectors differ, first: {bad[:3]}"


def test_d12_assign_vec_raw_embeddings(spark, sf_smoke):
    corpus = table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    _assert_identical(corpus)


def test_d12_assign_vec_twin_corpus(spark, sf_smoke):
    raw = table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    corpus, _ = _twin_corpus(raw)
    _assert_identical(corpus)


def _retired_dropped(assigned):
    """The pre-round-13 pair scan, verbatim: self-join on cell_id +
    higher-priority predicate + HOF-fold cosine filter."""
    x = assigned.alias("x")
    y = assigned.alias("y")
    pair_cos = dot_fold(
        F.col("x.embedding"), F.col("y.embedding")
    ) / F.sqrt(F.col("x.nsq") * F.col("y.nsq"))
    higher_priority = (F.col("y.cent_sim") > F.col("x.cent_sim")) | (
        (F.col("y.cent_sim") == F.col("x.cent_sim"))
        & (F.col("y.vec_id") < F.col("x.vec_id"))
    )
    return (
        x.join(
            y, (F.col("x.cell_id") == F.col("y.cell_id")) & higher_priority
        )
        .where(pair_cos > 0.8)
        .select(F.col("x.vec_id").alias("vec_id"))
        .distinct()
    )


def test_d12_grouped_drop_matches_join(spark, sf_smoke):
    """The grouped per-cell kernel must produce EXACTLY the join+filter
    drop set — on the raw embeddings and on the planted-twin corpus."""
    from agentic_etl_poc_spark.queries.dedup import _d12_dropped_grouped

    raw = table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    twin, _ = _twin_corpus(raw)
    # the raw synthetic corpus has no organic cosine>0.8 pairs (by
    # construction — d16's docstring); the twin corpus pins a NON-EMPTY
    # drop set so the comparison is not vacuous
    for corpus, must_drop in ((raw, False), (twin, True)):
        assigned = _d12_assigned_vec(corpus).repartition("cell_id")
        old = {r.vec_id for r in _retired_dropped(assigned).collect()}
        new = {r.vec_id for r in _d12_dropped_grouped(assigned).collect()}
        if must_drop:
            assert old, "twin corpus must yield a non-empty drop set"
        assert old == new, (
            f"grouped kernel drop set diverged: only_old="
            f"{sorted(old - new)[:5]}, only_new={sorted(new - old)[:5]}"
        )


def test_exists_lower_matches_join(spark, sf_smoke):
    """The cogrouped exists-lower-neighbor kernel must produce EXACTLY
    the retired join+filter drop set, on the d15 shape (own cell) and
    the d17 shape (Hamming-1 probe cells) over the twin corpus."""
    from agentic_etl_poc_spark.queries.dedup import (
        _d15_assign,
        _d15_bounds,
        _d15_sample,
        _dropped_exists_lower,
    )

    raw = table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    corpus, _ = _twin_corpus(raw)
    bf = _d15_bounds(corpus)
    assigned = _d15_assign(corpus, bf)
    y = _d15_sample(assigned)

    yr = y.select(
        F.col("cell_id").alias("ycell"),
        F.col("vec_id").alias("yvid"),
        F.col("embedding").alias("yemb"),
        F.col("nsq").alias("ynsq"),
    )

    def retired(xs_keyed):
        xx = xs_keyed.alias("xx")
        yy = yr.alias("yy")
        pair_cos = dot_fold(
            F.col("xx.embedding"), F.col("yy.yemb")
        ) / F.sqrt(F.col("xx.nsq") * F.col("yy.ynsq"))
        return {
            r.vec_id
            for r in xx.join(
                yy,
                (F.col("xx.gk") == F.col("yy.ycell"))
                & (F.col("yy.yvid") < F.col("xx.vec_id")),
            )
            .filter(pair_cos > 0.8)
            .select(F.col("xx.vec_id").alias("vec_id"))
            .distinct()
            .collect()
        }

    ys = y.select(F.col("cell_id").alias("gk"), "vec_id", "embedding", "nsq")
    # d15 shape: group = own cell
    xs15 = assigned.select(
        F.col("cell_id").alias("gk"), "vec_id", "embedding", "nsq"
    )
    got15 = {r.vec_id for r in _dropped_exists_lower(xs15, ys).collect()}
    want15 = retired(xs15)
    assert want15, "twin corpus must yield a non-empty d15 drop set"
    assert got15 == want15
    # d17 shape: group = own cell + b Hamming-1 neighbors
    probes = (
        assigned.crossJoin(F.broadcast(bf.select("b")))
        .select(
            F.explode(
                F.concat(
                    F.array(F.col("cell_id")),
                    F.expr(
                        "transform(sequence(0, CAST(b - 1 AS INT)), "
                        "j -> cell_id ^ shiftleft(CAST(1 AS BIGINT), j))"
                    ),
                )
            ).alias("gk"),
            "vec_id",
            "embedding",
            "nsq",
        )
    )
    got17 = {r.vec_id for r in _dropped_exists_lower(probes, ys).collect()}
    want17 = retired(probes)
    assert want17 >= want15 and want17
    assert got17 == want17


def test_d15_assign_vec_matches_retired(spark, sf_smoke):
    """d15's vectorized sign-cell assignment must reproduce the retired
    crossJoin + HOF-fold chain exactly: same cell_id and bit-identical
    nsq for every vector, on float32 raw embeddings AND the double twin
    corpus."""
    from agentic_etl_poc_spark.queries.dedup import (
        _d15_assign,
        _d15_bounds,
        _d15_projs,
    )

    def retired(e, bf):
        projs = _d15_projs(e, bf)
        bit_term = F.when(
            dot_fold(F.col("embedding"), F.col("wvec")) > 0,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"),
        ).otherwise(F.lit(0).cast("bigint"))
        return (
            e.crossJoin(F.broadcast(projs))
            .groupBy("vec_id")
            .agg(
                F.sum(bit_term).alias("cell_id"),
                F.first("embedding").alias("embedding"),
            )
            .withColumn(
                "nsq", dot_fold(F.col("embedding"), F.col("embedding"))
            )
        )

    raw = table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    twin, _ = _twin_corpus(raw)
    for corpus in (raw, twin):
        bf = _d15_bounds(corpus)
        want = {
            r.vec_id: (r.cell_id, _bits(r.nsq))
            for r in retired(corpus, bf).collect()
        }
        got = {
            r.vec_id: (r.cell_id, _bits(r.nsq))
            for r in _d15_assign(corpus, bf)
            .select("vec_id", "cell_id", "nsq")
            .collect()
        }
        assert want and got == want


def test_d12_assign_vec_embedding_passthrough(spark, sf_smoke):
    """The assigned frame feeds the pair scan — its embedding column
    must round-trip exactly (as doubles)."""
    corpus = table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    orig = {
        r.vec_id: [float(v) for v in r.embedding]
        for r in corpus.collect()
    }
    got = {
        r.vec_id: list(r.embedding)
        for r in _d12_assigned_vec(corpus).select("vec_id", "embedding").collect()
    }
    assert orig.keys() == got.keys()
    for vid in orig:
        assert [_bits(v) for v in orig[vid]] == [_bits(v) for v in got[vid]]
