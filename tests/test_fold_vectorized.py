"""Bit-identity pin for the vectorized pair-scan fold.

``dot_fold_vec`` (Arrow/pandas, NumPy column accumulation) must produce
the EXACT bits of ``dot_fold`` (the JVM HOF sequential fold) for every
pair — the dedup/similarity oracles hash these doubles, so "close" is a
driver red.  The test folds every ordered pair of the sf0.001 embedding
fixtures through both paths and compares the raw IEEE bit patterns.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from agentic_etl_poc_spark.functions.hashing import dot_fold, dot_fold_vec
from agentic_etl_poc_spark.io_tables import table


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def test_dot_fold_vec_bitwise_all_pairs(spark, sf_smoke):
    e = table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    x = e.select(
        F.col("vec_id").alias("id1"), F.col("embedding").alias("e1")
    )
    y = e.select(
        F.col("vec_id").alias("id2"), F.col("embedding").alias("e2")
    )
    pairs = x.crossJoin(y)
    rows = (
        pairs.select(
            "id1",
            "id2",
            dot_fold(F.col("e1"), F.col("e2")).alias("hof"),
            dot_fold_vec(F.col("e1"), F.col("e2")).alias("vec"),
        )
        .collect()
    )
    assert rows, "no pairs folded"
    bad = [
        (r.id1, r.id2, r.hof, r.vec)
        for r in rows
        if _bits(r.hof) != _bits(r.vec)
    ]
    assert not bad, f"{len(bad)} pairs differ bitwise, first: {bad[:3]}"


def test_dot_fold_vec_double_arrays(spark, sf_smoke):
    """The pair scans fold DOUBLE arrays (the twin corpus casts to
    double); pin bit-identity on that dtype too, plus the empty-batch
    guard."""
    e = (
        table(spark, sf_smoke, "embeddings")
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
                "embedding"
            ),
        )
        .limit(50)
    )
    x = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"))
    y = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"))
    pairs = x.crossJoin(y).where(F.col("id1") < F.col("id2"))
    rows = pairs.select(
        dot_fold(F.col("e1"), F.col("e2")).alias("hof"),
        dot_fold_vec(F.col("e1"), F.col("e2")).alias("vec"),
    ).collect()
    assert rows
    assert all(_bits(r.hof) == _bits(r.vec) for r in rows)
    empty = pairs.where(F.lit(False)).select(
        dot_fold_vec(F.col("e1"), F.col("e2")).alias("v")
    )
    assert empty.count() == 0
