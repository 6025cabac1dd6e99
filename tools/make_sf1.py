"""Generate a local sf1 dataset by tiling the driver's sf0.1 tables x10.

The driver ships sf0.001/0.01/0.1 only; the scaling table in BASELINE.md
needs one point where the data term dominates fixed overhead.  sf1 is
synthesized from sf0.1 (never the other way: the driver data stays
read-only) as ten key-shifted tiles, preserving join integrity within
each tile and the original value distributions:

- fact/dim keys shift by tile * 10^k (k chosen above each key's range),
  so per-tile referential integrity is exact and global key cardinality
  scales x10;
- region/nation stay fixed (TPC-H dims are SF-invariant);
- timestamps are left unchanged: same time span, 10x event density —
  the same way TPC-H scales date-ranged facts;
- ``documents.text`` is word-PERMUTED per tile (deterministic md5 sort;
  tile 0 keeps the original order): token/length statistics are
  invariant, but cross-tile n-gram overlap is destroyed, so near-dup
  entries (d03/d04/d05) see x10 the corpus, not 10-way artificial
  near-duplicate groups that would make pair counts super-linear;
- ``embeddings.embedding`` is cyclically rotated by the tile index
  (norm-preserving; high-dim rotated copies decorrelate), for the same
  reason on the cosine side (d06/s0x);
- ``embeddings.label`` shifts per tile like a key: the label plays the
  blocking-bucket role (d06's stand-in for an LSH bucket / IVF cell),
  and bucket COUNT grows with corpus size at real scale while bucket
  occupancy stays bounded.  Keeping labels fixed made label blocks grow
  10x and d06's pair count 100x — the first sf1 run measured exactly
  that (21.6 s vs 1.9 s, an 11.3x wall ratio flagged by the >10x rule).

Output: ``<repo>/testdata_sf1/*.parquet`` (gitignored), readable by
``io_tables.table`` like any driver sf dir.  Run:

    python tools/make_sf1.py [out_dir] [--tiles N]

``--tiles 100`` writes an sf10 dataset (default 10 = sf1) — the round-8
"next decade" audit point.  Above 64 tiles the embedding rotation alone
would repeat (dim=64), so tiles t >= 64 are additionally NEGATED
(norm-preserving, and cosine(x, -x) = -1, so repeated-rotation tiles
cannot masquerade as near-duplicates); label shifts keep every tile in
its own blocking buckets regardless.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
TILES = 10


def main(out_dir: str | None = None, tiles: int = TILES) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    out = out_dir or os.path.join(here, "testdata_sf1")
    # rotate_embedding disambiguates tiles with rotation (t < 64) then
    # rotation+negation (64 <= t < 128); past 2*dim both transforms repeat
    # and identical embedding tiles would silently reintroduce artificial
    # near-dups — fail loudly instead
    if tiles > 128:
        raise SystemExit(
            f"--tiles {tiles} > 128: embedding tile transforms repeat past "
            "2*dim=128 tiles (rotation + negation both cycle); add a third "
            "transform before scaling further"
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from agentic_etl_poc_spark.io_tables import table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        # ad-hoc builders default to a 1 GiB heap, which a 100-tile
        # lineitem shuffle overruns — size the single local JVM properly
        .config("spark.driver.memory", "16g")
        .appName(f"make-sfx{tiles}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def write(df, name, parts=max(8, tiles // 4)):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: {df.count()} rows", flush=True)

    # SF-invariant dims: straight copies
    for name in ("region", "nation"):
        write(table(spark, SRC, name), name, parts=1)

    tile = F.lit(None)  # replaced per-union below

    def tiled(name, shifts, extra=None):
        """Union of ``tiles`` copies with per-tile key shifts.
        shifts: {col: offset_per_tile}; extra: fn(df, t) -> df."""
        base = table(spark, SRC, name)
        pieces = []
        for t in range(tiles):
            df = base
            for col, off in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(t * off))
            if extra is not None:
                df = extra(df, t)
            pieces.append(df)
        unioned = pieces[0]
        for p in pieces[1:]:
            unioned = unioned.unionByName(p)
        return unioned

    write(tiled("customer", {"c_custkey": 1_000_000}), "customer")
    write(tiled("supplier", {"s_suppkey": 1_000_000}), "supplier")
    write(tiled("part", {"p_partkey": 1_000_000}), "part")
    write(
        tiled("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}),
        "orders",
    )
    write(
        tiled(
            "lineitem",
            {
                "l_orderkey": 10_000_000,
                "l_partkey": 1_000_000,
                "l_suppkey": 1_000_000,
            },
        ),
        "lineitem",
        parts=max(16, tiles // 2),
    )
    write(
        tiled("events", {"event_id": 10_000_000, "user_id": 1_000_000}),
        "events",
    )

    def permute_text(df, t):
        if t == 0:
            return df
        # deterministic pseudo-random word permutation, keyed by word,
        # position and tile: destroys n-gram overlap with the original,
        # keeps every token-level statistic
        words = F.split(F.col("text"), " ")
        idx = F.sequence(F.lit(0), F.size(words) - 1)
        keyed = F.transform(
            idx,
            lambda i: F.struct(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.element_at(words, i + 1),
                        i.cast("string"),
                        F.lit(str(t)),
                    )
                ).alias("k"),
                F.element_at(words, i + 1).alias("w"),
            ),
        )
        permuted = F.array_join(
            F.transform(F.array_sort(keyed), lambda s: s["w"]), " "
        )
        return df.withColumn("text", permuted)

    write(
        tiled("documents", {"doc_id": 1_000_000}, extra=permute_text),
        "documents",
    )

    def rotate_embedding(df, t):
        if t == 0:
            return df
        dim = 64
        shift = t % dim
        emb = F.col("embedding")
        rotated = F.concat(
            F.slice(emb, shift + 1, dim - shift), F.slice(emb, 1, shift)
        ) if shift else emb
        if t >= dim:
            # rotation repeats past dim tiles: negate so a repeated
            # rotation can never read as a near-duplicate (cosine = -1)
            rotated = F.transform(rotated, lambda x: -x)
        return df.withColumn("embedding", rotated)

    write(
        tiled(
            "embeddings",
            {"vec_id": 1_000_000, "label": 1_000},
            extra=rotate_embedding,
        ),
        "embeddings",
    )
    spark.stop()
    print(f"sf1 written to {out}", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default=None)
    ap.add_argument("--tiles", type=int, default=TILES)
    ns = ap.parse_args()
    main(ns.out_dir, tiles=ns.tiles)
