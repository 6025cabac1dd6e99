"""Similarity-search battery over the ``embeddings`` table (64-dim float).

- s01: exact brute-force cosine top-k — the correctness baseline.  One
  broadcast of the query vector, one distributed scan, TakeOrdered top-k;
  at 100 TB this is the per-query cost floor and the reference answer for
  recall measurement.
- s02: LSH-bucketed ANN — random-hyperplane signatures (4 planes → 16
  buckets) built from md5-derived deterministic weights, so Spark and the
  DuckDB oracle construct byte-identical planes with no RNG.  Queries only
  score candidates in their own bucket: the scan shrinks ~16x, the plan
  becomes a bucket-equi-join — the shape that scales (more planes →
  smaller buckets; multi-probe for recall).

Cosines use the sequential-fold primitives (functions/hashing.py) so both
engines produce bit-identical doubles; top-k ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from agentic_etl_poc_spark.functions.hashing import (
    cosine,
    duck_cosine,
    duck_md5_48,
)
from agentic_etl_poc_spark.io_tables import table
from agentic_etl_poc_spark.queries.core import register

DIM = 64
N_PLANES = 4
N_QUERIES = 5
TOP_K = 10


@register(
    "s01_knn_bruteforce",
    oracle=f"""
SELECT b.vec_id AS neighbor_id, b.label,
       {duck_cosine('b.embedding', 'q.embedding', DIM)} AS cos_sim
FROM embeddings b
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE b.vec_id <> 0
ORDER BY cos_sim DESC, neighbor_id ASC
LIMIT {TOP_K}
""",
    description="Exact cosine top-k: broadcast query vector, distributed "
    "scan, TakeOrderedAndProject — no shuffle of the corpus, no full sort.",
)
def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "label",
            cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        .limit(TOP_K)
    )


def _plane_weight(j: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]: derived
    from md5 of 'plane{j}_{i}'.  Computed driver-side with hashlib — the
    identical arithmetic the oracle's SQL performs (48-bit md5 prefix,
    % 2001 - 1000, / 1000.0), so the plane matrices are byte-equal while
    the Spark plan sees plain literals instead of 256 md5 calls per row."""
    import hashlib

    h = int(hashlib.md5(f"plane{j}_{i}".encode()).hexdigest()[:12], 16)
    return (h % 2001 - 1000) / 1000.0


def _duck_plane_weight(j: str, i: str) -> str:
    h = duck_md5_48(f"'plane' || CAST({j} AS VARCHAR) || '_' || CAST({i} AS VARCHAR)")
    return f"(({h}) % 2001 - 1000) / 1000.0"


def _plane_dot_spark(vec: Column, j: int) -> Column:
    """Sequential fold of vec · plane_j with the plane as a literal array —
    same accumulation order as the oracle's list_reduce."""
    plane = F.array(*[F.lit(_plane_weight(j, i)) for i in range(1, DIM + 1)])
    return F.aggregate(
        F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _duck_plane_dot(vec: str, j: str) -> str:
    w = _duck_plane_weight(j, "i")
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {DIM + 1}), "
        f"i -> CAST({vec}[i] AS DOUBLE) * ({w}))), (acc, x) -> acc + x)"
    )


@register(
    "s02_ann_lsh",
    oracle=f"""
WITH planes AS (SELECT unnest(range(0, {N_PLANES})) AS j),
sigs AS (
  SELECT vec_id, label, embedding,
         CAST(SUM(CASE WHEN {_duck_plane_dot('embedding', 'j')} > 0
                  THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings CROSS JOIN planes
  GROUP BY vec_id, label, embedding
),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {duck_cosine('q.embedding', 'c.embedding', DIM)} AS cos_sim
  FROM sigs q JOIN sigs c
    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM cand
) WHERE rn <= 3
ORDER BY query_id, neighbor_id
""",
    description="LSH ANN: sign-of-projection signatures on 4 deterministic "
    "hyperplanes bucket the corpus; each query scores only its bucket "
    "(~1/16 of the data) then takes top-3.  Scale path: more planes, "
    "multi-probe neighbors of the bucket for recall.",
)
def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_topk(spark, sf_dir).orderBy("query_id", "neighbor_id")


def lsh_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, embedding, bucket, nsq): LSH sign-bit bucket plus
    squared norm per vector — session-shared (queries/core.py) because the
    four interpreted plane-dot folds per row are the expensive part and
    s02/s04/s05 all start from this exact frame."""
    from agentic_etl_poc_spark.functions.hashing import dot_fold
    from agentic_etl_poc_spark.queries.core import shared_frame

    def build() -> DataFrame:
        e = table(spark, sf_dir, "embeddings")
        # Signature = sign bits of 4 plane dots, all computed in one narrow
        # projection (planes are literal arrays): no crossJoin explosion, no
        # groupBy-on-embedding shuffle — the bucket column is map-side free.
        bucket = F.lit(0).cast("bigint")
        for j in range(N_PLANES):
            bucket = bucket + F.when(
                _plane_dot_spark(F.col("embedding"), j) > 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
        return e.select(
            "vec_id",
            "label",
            "embedding",
            bucket.cast("bigint").alias("bucket"),
            dot_fold(F.col("embedding"), F.col("embedding")).alias("nsq"),
        )

    return shared_frame(spark, sf_dir, "similarity:lsh_sigs", build)


def lsh_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """LSH-bucketed approximate top-k per query — shared by s02 (reports
    neighbors) and s04 (recall evaluation vs the exact baseline)."""
    from agentic_etl_poc_spark.functions.hashing import dot_fold

    sigs = lsh_sigs(spark, sf_dir)
    q = F.broadcast(sigs.filter(F.col("vec_id") < N_QUERIES)).alias("q")
    c = sigs.alias("c")
    cos = dot_fold(F.col("q.embedding"), F.col("c.embedding")) / F.sqrt(
        F.col("q.nsq") * F.col("c.nsq")
    )
    cand = q.join(
        c,
        (F.col("q.bucket") == F.col("c.bucket"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


N_CELLS = 8


@register(
    "s03_ann_ivf",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS cvec FROM embeddings
  WHERE vec_id < {N_CELLS}
),
assigned AS (
  SELECT vec_id, label, embedding, cell_id FROM (
    SELECT e.vec_id, e.label, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {duck_cosine('e.embedding', 'c.cvec', DIM)} DESC,
                      c.cell_id ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {duck_cosine('q.embedding', 'c.embedding', DIM)} AS cos_sim
  FROM assigned q JOIN assigned c
    ON q.cell_id = c.cell_id AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM cand
) WHERE rn <= 3
ORDER BY query_id, neighbor_id
""",
    description="IVF-Flat ANN: a deterministic coarse quantizer (the first "
    f"{N_CELLS} vectors as cell centroids — a stand-in for k-means, which "
    "has no cross-engine-deterministic training) assigns every vector to "
    "its nearest cell via argmax cosine; queries probe ONLY their own cell "
    "then take exact top-3.  The centroid table broadcasts (tiny), "
    "assignment is map-side, and the probe join keys on cell_id — at "
    "scale, cells partition the corpus so each query touches 1/N of the "
    "data; recall is tuned by probing the P nearest cells instead of 1.",
)
def s03_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.functions.hashing import dot_fold

    e = table(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        e.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cvec")
        )
    )
    # assignment: argmax cosine over the broadcast centroid table
    scored = e.crossJoin(cents).select(
        "vec_id",
        "label",
        "embedding",
        "cell_id",
        cosine(F.col("embedding"), F.col("cvec")).alias("sim"),
    )
    # argmax via max_by aggregation, NOT a row_number window: the window
    # would shuffle the corpus×N_CELLS expanded frame on vec_id just to
    # keep rank 1, while max_by gets map-side partial aggregation — each
    # mapper emits ONE row per vector, so the exchange carries 1/N_CELLS
    # the rows.  Tie-break matches the oracle (sim DESC, cell_id ASC) via
    # the (sim, -cell_id) ordering struct.
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("label", "embedding", "cell_id"),
                F.struct(
                    F.col("sim"), (-F.col("cell_id")).alias("neg_cell")
                ),
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.label").alias("label"),
            F.col("b.embedding").alias("embedding"),
            F.col("b.cell_id").alias("cell_id"),
            dot_fold(F.col("b.embedding"), F.col("b.embedding")).alias("nsq"),
        )
    )
    q = F.broadcast(assigned.filter(F.col("vec_id") < N_QUERIES)).alias("q")
    c = assigned.alias("c")
    cos = dot_fold(F.col("q.embedding"), F.col("c.embedding")) / F.sqrt(
        F.col("q.nsq") * F.col("c.nsq")
    )
    cand = q.join(
        c,
        (F.col("q.cell_id") == F.col("c.cell_id"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cos_sim"),
    )
    w_topk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w_topk))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cos_sim")
        .orderBy("query_id", "neighbor_id")
    )


@register(
    "s04_ann_recall",
    oracle=f"""
WITH planes AS (SELECT unnest(range(0, {N_PLANES})) AS j),
sigs AS (
  SELECT vec_id, embedding,
         CAST(SUM(CASE WHEN {_duck_plane_dot('embedding', 'j')} > 0
                  THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings CROSS JOIN planes
  GROUP BY vec_id, embedding
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {duck_cosine('q.embedding', 'c.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rn
    FROM sigs q JOIN sigs c
      ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= 3
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {duck_cosine('q.embedding', 'c.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rn
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= 3
)
SELECT e.query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS recall_at_3
FROM exact e
LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
""",
    description="ANN evaluation: recall@3 of the LSH index (s02) against "
    "the exact brute-force baseline — the measurement loop that justifies "
    "an approximate index before pointing it at 100 TB.  Exact side scans "
    "all pairs for the 5 probe queries (broadcast query block); approx "
    "side reuses the bucketed pipeline; recall joins the two top-k sets.",
)
def s04_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.functions.hashing import dot_fold

    # exact side rides the shared (vec_id, ..., nsq) frame; the extra
    # bucket/label columns are projected away by the explicit selects
    e = lsh_sigs(spark, sf_dir)
    q = F.broadcast(e.filter(F.col("vec_id") < N_QUERIES)).alias("q")
    c = e.alias("c")
    cos = dot_fold(F.col("q.embedding"), F.col("c.embedding")) / F.sqrt(
        F.col("q.nsq") * F.col("c.nsq")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    exact = (
        q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    approx = lsh_topk(spark, sf_dir, k=3).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor_id")
    )
    hit = F.when(F.col("a_neighbor_id").isNotNull(), 1).otherwise(0)
    return (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["a_neighbor_id"]),
            "left",
        )
        .drop(approx["query_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(hit).cast("bigint").alias("n_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_3"),
        )
        .orderBy("query_id")
    )


@register(
    "s05_ann_multiprobe",
    oracle=f"""
WITH planes AS (SELECT unnest(range(0, {N_PLANES})) AS j),
sigs AS (
  SELECT vec_id, embedding,
         CAST(SUM(CASE WHEN {_duck_plane_dot('embedding', 'j')} > 0
                  THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings CROSS JOIN planes
  GROUP BY vec_id, embedding
),
probes AS (
  SELECT vec_id, embedding,
         CASE WHEN p = 0 THEN bucket ELSE xor(bucket, 1::BIGINT << (p - 1)) END
           AS probe_bucket
  FROM sigs CROSS JOIN (SELECT unnest(range(0, {N_PLANES} + 1)) AS p)
  WHERE vec_id < {N_QUERIES}
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {duck_cosine('q.embedding', 'c.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rn
    FROM probes q JOIN sigs c
      ON q.probe_bucket = c.bucket AND q.vec_id <> c.vec_id
  ) WHERE rn <= 3
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {duck_cosine('q.embedding', 'c.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rn
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= 3
)
SELECT e.query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS recall_at_3
FROM exact e
LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
""",
    description="Multi-probe LSH: each query probes its own bucket AND "
    "every Hamming-1 neighbor (flip one plane bit) — 5 of 16 buckets, "
    "~5x the candidates, measurably higher recall@3 than s04's single "
    "probe at a fraction of brute-force cost.  The probe list is a tiny "
    "per-query explode; the corpus is still touched only via the bucket "
    "equi-join — the standard recall/cost dial for LSH at scale.",
)
def s05_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.functions.hashing import dot_fold

    sigs = lsh_sigs(spark, sf_dir)
    probe_arr = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << (p - 1)))
            for p in range(1, N_PLANES + 1)
        ],
    )
    probes = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            "vec_id", "embedding", "nsq",
            F.explode(probe_arr).alias("probe_bucket"),
        )
    )
    q = F.broadcast(probes).alias("q")
    c = sigs.alias("c")
    cos = dot_fold(F.col("q.embedding"), F.col("c.embedding")) / F.sqrt(
        F.col("q.nsq") * F.col("c.nsq")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    approx = (
        q.join(
            c,
            (F.col("q.probe_bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", F.col("neighbor_id").alias("a_neighbor_id"))
    )
    e2 = sigs.select("vec_id", "embedding", "nsq")
    qb = F.broadcast(e2.filter(F.col("vec_id") < N_QUERIES)).alias("q")
    cb = e2.alias("c")
    cos2 = dot_fold(F.col("q.embedding"), F.col("c.embedding")) / F.sqrt(
        F.col("q.nsq") * F.col("c.nsq")
    )
    exact = (
        qb.join(cb, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos2.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    hit = F.when(F.col("a_neighbor_id").isNotNull(), 1).otherwise(0)
    return (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["a_neighbor_id"]),
            "left",
        )
        .drop(approx["query_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(hit).cast("bigint").alias("n_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_3"),
        )
        .orderBy("query_id")
    )


@register(
    "s06_knn_join",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         {duck_cosine('b.embedding', 'q.qvec', DIM)} AS cos_sim
  FROM embeddings b CROSS JOIN q
  WHERE b.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
         ) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""",
    description="Batch kNN JOIN (the many-queries form of s01): all query "
    "vectors broadcast as one small side, a single distributed pass over "
    "the corpus scores every (query, corpus) pair, and per-query top-3 "
    "falls out of a row_number window keyed on query_id.  Scale shape: "
    "the corpus is touched ONCE for the whole query batch (not once per "
    "query), the shuffle is (query_id, k) partial top-k sized, and the "
    "broadcast side is |queries| x dim floats.  For huge query batches "
    "this becomes block-nested-loop over corpus x query tiles — same "
    "plan family, bigger tiles.",
)
def s06_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .orderBy("query_id", "rk")
    )


@register(
    "s07_int8_quantization",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
scaled AS (
  SELECT vec_id, label, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, label, scale,
         list_transform(emb, x -> floor(x / scale + 0.5)) AS qvals,
         emb
  FROM scaled
)
SELECT vec_id, label, scale,
  CAST(list_max(list_transform(qvals, x -> abs(x))) AS BIGINT) AS max_q,
  list_max(list_transform(range(1, {DIM + 1}),
       i -> abs(qvals[i] * scale - emb[i]))) AS max_abs_err,
  CAST(len(list_filter(range(1, {DIM + 1}),
       i -> abs(qvals[i] * scale - emb[i]) > scale * 0.5)) AS BIGINT)
    AS n_bad
FROM q
ORDER BY vec_id
""",
    description="Symmetric int8 embedding quantization (the 4x storage / "
    "bandwidth lever for ANN at scale): per-vector scale = max|x|/127, "
    "quantize with floor(x/scale + 0.5) — floor-plus-half instead of "
    "round() because the engines' round() half-case tie rules differ "
    "while floor is bit-identical — then audit the reconstruction: max "
    "quantized magnitude (must be 127), max absolute dequantization "
    "error, and a count of elements violating the half-step error bound "
    "(0 by construction).  All array-side per row, zero shuffles; at "
    "100 TB this is a map-only rewrite of the vector column.",
)
def s07_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = e.select("vec_id", "label", emb.alias("emb"))
    scale = (
        F.array_max(F.transform(F.col("emb"), lambda x: F.abs(x))) / F.lit(127.0)
    )
    scaled = v.select("vec_id", "label", "emb", scale.alias("scale"))
    qvals = F.transform(
        F.col("emb"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5))
    )
    q = scaled.select("vec_id", "label", "scale", qvals.alias("qvals"), "emb")
    err = F.zip_with(
        F.col("qvals"),
        F.col("emb"),
        lambda qv, x: F.abs(qv * F.col("scale") - x),
    )
    return q.select(
        "vec_id",
        "label",
        "scale",
        F.array_max(F.transform(F.col("qvals"), lambda x: F.abs(x)))
        .cast("bigint")
        .alias("max_q"),
        F.array_max(err).alias("max_abs_err"),
        F.size(F.filter(err, lambda d: d > F.col("scale") * 0.5))
        .cast("bigint")
        .alias("n_bad"),
    ).orderBy("vec_id")


N_CLUSTERS = 8


@register(
    "s08_kmeans_refine",
    oracle=f"""
WITH c0 AS (
  SELECT vec_id AS cluster_id, embedding FROM embeddings
  WHERE vec_id < {N_CLUSTERS}
),
a1 AS (
  SELECT e.vec_id, c.cluster_id,
         {duck_cosine('e.embedding', 'c.embedding', DIM)} AS cos
  FROM embeddings e CROSS JOIN c0 c
),
b1 AS (
  SELECT vec_id, cluster_id FROM a1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY cos DESC, cluster_id) = 1
),
mem AS (
  SELECT b1.cluster_id, e.embedding
  FROM b1 JOIN embeddings e ON e.vec_id = b1.vec_id
),
grouped AS (
  SELECT cluster_id, list(embedding) AS embs, COUNT(*) AS n
  FROM mem GROUP BY cluster_id
),
cent AS (
  SELECT cluster_id,
         list_transform(range(1, {DIM + 1}), i ->
           CAST(list_sum(list_transform(embs,
                v -> CAST(CAST(v[i] AS DOUBLE) AS DECIMAL(28,12))))
             AS DOUBLE) / n) AS centroid
  FROM grouped
),
a2 AS (
  SELECT e.vec_id, c.cluster_id,
         {duck_cosine('e.embedding', 'c.centroid', DIM)} AS cos
  FROM embeddings e CROSS JOIN cent c
),
b2 AS (
  SELECT vec_id, cluster_id, cos FROM a2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY cos DESC, cluster_id) = 1
)
SELECT cluster_id, COUNT(*) AS n_members, MIN(vec_id) AS min_vec_id,
       CAST(CAST(SUM(CAST(cos AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR)
         AS total_cos
FROM b2 GROUP BY cluster_id ORDER BY cluster_id
""",
    description="Spherical k-means refinement (one exact Lloyd step, "
    "unrolled): seed centroids = first k vectors, assign by max cosine "
    "(tie-break on cluster id), recompute per-dim means with exact "
    "decimal sums, re-assign against the refined centroids.  The "
    "distributed shape is the one that scales: centroids BROADCAST to "
    "the corpus scan (assignment is map-only), the update is a "
    "(k x dim)-cell map-side-combined aggregation — iterating just "
    "repeats the step (with localCheckpoint per round, like d07).  "
    "Cosines fold sequentially (functions/hashing.py), so both engines "
    "agree bit-for-bit through BOTH assignment rounds; the checked "
    "output keeps doubles out (counts, ids, fixed-scale decimal string).",
)
def s08_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    c0 = e.where(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("centroid")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cluster_id"))

    def assign(centroids: DataFrame) -> DataFrame:
        scored = e.crossJoin(F.broadcast(centroids)).select(
            "vec_id",
            "cluster_id",
            cosine(F.col("embedding"), F.col("centroid")).alias("cos"),
        )
        return scored.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") == 1
        )

    b1 = assign(c0).select("vec_id", "cluster_id")
    dims = b1.join(e, "vec_id").select(
        "cluster_id", F.posexplode("embedding").alias("pos", "x")
    )
    cd = dims.groupBy("cluster_id", "pos").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(28,12)"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    cent = cd.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    b2 = assign(cent)
    return (
        b2.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_vec_id"),
            F.sum(F.col("cos").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .cast("string")
            .alias("total_cos"),
        )
        .orderBy("cluster_id")
    )



TRUNC_DIM = 8
RECALL_K = 3


@register(
    "s09_matryoshka_recall",
    oracle=f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {{cos_full}} AS cos_full,
         {{cos_trunc}} AS cos_trunc
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {{nq}}
),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_full DESC, neighbor_id ASC) AS rn
    FROM scored) WHERE rn <= {{k}}
),
ap AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_trunc DESC, neighbor_id ASC) AS rn
    FROM scored) WHERE rn <= {{k}}
)
SELECT q.query_id,
       CAST(COUNT(hits.neighbor_id) AS BIGINT) AS n_hits
FROM (SELECT DISTINCT query_id FROM scored) q
LEFT JOIN (SELECT ex.query_id, ex.neighbor_id
           FROM ex JOIN ap USING (query_id, neighbor_id)) hits
  ON q.query_id = hits.query_id
GROUP BY q.query_id
ORDER BY q.query_id
""".format(
        cos_full=duck_cosine("q.embedding", "c.embedding", DIM),
        cos_trunc=duck_cosine("q.embedding", "c.embedding", TRUNC_DIM),
        nq=N_QUERIES,
        k=RECALL_K,
    ),
    description="Matryoshka/truncation recall audit: rank neighbors by "
    f"cosine over the FIRST {TRUNC_DIM} of {DIM} dims (the "
    "matryoshka-embedding serving trick — cheap prefilter on a prefix "
    "slice) and count how many of the exact full-dim top-3 the "
    "truncated ranking keeps, per query.  One corpus pass computes "
    "both scores (the prefix dot product is a byproduct of the full "
    "fold), broadcast query side, rank-pushdown top-k windows.  At "
    "scale this is the evaluation loop that decides how small a "
    "serving slice can be before recall degrades — run on a sample, "
    "not the corpus.",
)
def s09_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.functions.hashing import cosine

    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("embedding"), F.col("qvec")).alias("cos_full"),
            cosine(
                F.slice(F.col("embedding"), 1, TRUNC_DIM),
                F.slice(F.col("qvec"), 1, TRUNC_DIM),
            ).alias("cos_trunc"),
        )
    )
    # Both ranks in ONE pass: the corpus×queries frame (and its two
    # cosine folds) is computed once, both row_number windows share the
    # query_id partitioning (one exchange), and recall is a conditional
    # count — no joins, no recomputation of the scored frame (the
    # ex/ap/base 3-consumer formulation re-ran the broadcast corpus
    # pass three times).
    w_full = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    w_trunc = Window.partitionBy("query_id").orderBy(
        F.desc("cos_trunc"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        F.row_number().over(w_full).alias("rf"),
        F.row_number().over(w_trunc).alias("rt"),
    )
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("rf") <= RECALL_K) & (F.col("rt") <= RECALL_K), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_hits")
        )
        .orderBy("query_id")
    )


#: s10 metadata filter: the corpus-side predicate a filtered vector
#: search applies BEFORE any distance work (label is the stand-in for
#: tenant/source/date metadata).
S10_LABEL_MOD = 3


@register(
    "s10_filtered_knn",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, b.label,
         {duck_cosine('b.embedding', 'q.qvec', DIM)} AS cos_sim
  FROM embeddings b CROSS JOIN q
  WHERE b.label % {S10_LABEL_MOD} = 0 AND b.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, label, cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
         ) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(label AS BIGINT) AS label, cos_sim,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""",
    description="FILTERED vector search (the retrieval shape every "
    "multi-tenant / source-scoped RAG system runs): per-query top-k "
    "restricted to corpus vectors passing a metadata predicate.  The "
    "predicate is applied BEFORE any distance computation — "
    "post-filtering top-k results instead can return fewer than k (or "
    "zero) survivors, the classic filtered-ANN correctness bug — and "
    "sits on the scan side of the broadcast join, so Catalyst pushes "
    "it into the parquet scan and the distance kernel touches only the "
    "qualifying fraction of the corpus (plan-shape-tested).  At IVF "
    "scale the same predicate rides along the s03 cell-probe scan.",
)
def s10_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
    )
    scored = (
        e.filter(F.col("label") % S10_LABEL_MOD == 0)  # before any distance
        .crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").cast("bigint").alias("label"),
            cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .orderBy("query_id", "rk")
    )


# -- s11: product quantization + asymmetric distance computation --------

PQ_SCALE = 200  # fixed int quantization grid: |x| < 0.58 -> |q| <= 116
PQ_SUB = 8  # subspaces
PQ_SUB_DIM = DIM // PQ_SUB
PQ_CODES = 16  # codebook entries per subspace (seed vectors vec_id < 16)
PQ_TOP_K = 10


def _pq_quant(col: Column) -> Column:
    """float array -> integer grid (floor(x*200 + 0.5): floor-plus-half,
    not round(), because the engines' round() half-tie rules differ)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * PQ_SCALE + F.lit(0.5))
    )


def _pq_sub_d2(a: Column, b: Column, s: int) -> Column:
    """Integer squared L2 over subspace s — exact, order-free arithmetic."""
    return F.aggregate(
        F.zip_with(
            F.slice(a, s * PQ_SUB_DIM + 1, PQ_SUB_DIM),
            F.slice(b, s * PQ_SUB_DIM + 1, PQ_SUB_DIM),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _duck_pq_quant(expr: str) -> str:
    return (
        f"list_transform(range(1, {DIM + 1}), "
        f"i -> CAST(floor(CAST({expr}[i] AS DOUBLE) * {PQ_SCALE} + 0.5) AS BIGINT))"
    )


def _duck_pq_sub_d2(a: str, b: str, s: str) -> str:
    lo = f"{PQ_SUB_DIM} * {s} + 1"
    hi = f"{PQ_SUB_DIM} * {s} + {PQ_SUB_DIM + 1}"
    return (
        f"list_sum(list_transform(range({lo}, {hi}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


@register(
    "s11_pq_adc",
    oracle=f"""
WITH emb AS (
  SELECT vec_id, {_duck_pq_quant('embedding')} AS vq FROM embeddings
),
seeds AS (SELECT vec_id AS code, vq AS cq FROM emb WHERE vec_id < {PQ_CODES}),
qs AS (SELECT vec_id AS query_id, vq AS qq FROM emb WHERE vec_id < {N_QUERIES}),
subs AS (SELECT unnest(range(0, {PQ_SUB})) AS s),
enc_scored AS (
  SELECT e.vec_id, s.s, d.code,
         {_duck_pq_sub_d2('e.vq', 'd.cq', 's.s')} AS d2
  FROM emb e CROSS JOIN seeds d CROSS JOIN subs s
),
enc AS (
  SELECT vec_id, s, CAST(MIN(d2 * {PQ_CODES} + code) % {PQ_CODES} AS BIGINT) AS code
  FROM enc_scored GROUP BY vec_id, s
),
dtable AS (
  SELECT q.query_id, s.s, d.code,
         {_duck_pq_sub_d2('q.qq', 'd.cq', 's.s')} AS d2
  FROM qs q CROSS JOIN seeds d CROSS JOIN subs s
),
approx AS (
  SELECT t.query_id, e.vec_id, SUM(t.d2) AS approx_d2
  FROM enc e JOIN dtable t ON e.s = t.s AND e.code = t.code
  WHERE e.vec_id <> t.query_id
  GROUP BY t.query_id, e.vec_id
),
exact AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}),
                  i -> (e.vq[i] - q.qq[i]) * (e.vq[i] - q.qq[i]))) AS exact_d2
  FROM emb e CROSS JOIN qs q
  WHERE e.vec_id <> q.query_id
),
approx_rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY approx_d2, vec_id) AS rk
  FROM approx
),
exact_rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY exact_d2, vec_id) AS erk
  FROM exact
)
SELECT a.query_id, CAST(a.rk AS BIGINT) AS rk, a.vec_id AS neighbor_id,
       CAST(a.approx_d2 AS BIGINT) AS approx_d2,
       CAST(x.exact_d2 AS BIGINT) AS exact_d2,
       CAST(CASE WHEN x.erk <= {PQ_TOP_K} THEN 1 ELSE 0 END AS BIGINT) AS hit
FROM approx_rk a
JOIN exact_rk x ON a.query_id = x.query_id AND a.vec_id = x.vec_id
WHERE a.rk <= {PQ_TOP_K}
ORDER BY a.query_id, a.rk
""",
    description=f"Product quantization + ADC (the billion-scale ANN "
    f"memory lever): vectors are cut into {PQ_SUB} subspaces of "
    f"{PQ_SUB_DIM} dims, each encoded as the nearest of {PQ_CODES} "
    "codebook entries (seed subvectors — a stand-in for per-subspace "
    "k-means trained offline), so a 64-float vector compresses to "
    f"{PQ_SUB} small codes; queries score candidates via a per-query "
    f"distance TABLE ({PQ_SUB}x{PQ_CODES} lookups, never touching the "
    "original floats) and the output audits approx-vs-exact top-10 with "
    "a hit flag per neighbor.  Everything runs on a fixed integer grid "
    "(floor(x*200+0.5)) so every distance, ranking, and SUM is exact "
    "integer arithmetic — order-free, hash-safe by construction.  Scale "
    "shape: the codebook and distance tables are tiny and BROADCAST; "
    "encoding is a crossJoin with 16 broadcast codes reduced by map-side "
    "min-aggregation (one row per vector reaches the shuffle); ADC is a "
    "broadcast lookup-join + integer sum — the corpus is never shuffled "
    "by anything wider than (query_id, vec_id).  Ref parity: extends the "
    "reference's similarity surface the same way s02/s03 do.",
)
def s11_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _pq_quant(F.col("embedding")).alias("vq"))
    seeds = F.broadcast(
        emb.filter(F.col("vec_id") < PQ_CODES).select(
            F.col("vec_id").alias("code"), F.col("vq").alias("cq")
        )
    )
    qs = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("vq").alias("qq")
        )
    )
    # encode: argmin code per (vector, subspace) via min(d2*16+code) % 16 —
    # a single groupBy(vec_id) with 8 agg columns gets map-side partials,
    # so one row per vector reaches the exchange (not 16)
    scored = emb.crossJoin(seeds).select(
        "vec_id",
        "code",
        *[
            _pq_sub_d2(F.col("vq"), F.col("cq"), s).alias(f"d2_{s}")
            for s in range(PQ_SUB)
        ],
    )
    enc = scored.groupBy("vec_id").agg(
        *[
            (F.min(F.col(f"d2_{s}") * PQ_CODES + F.col("code")) % PQ_CODES)
            .cast("bigint")
            .alias(f"c{s}")
            for s in range(PQ_SUB)
        ]
    )
    stack = ", ".join(f"{s}L, c{s}" for s in range(PQ_SUB))
    enc_long = enc.select(
        "vec_id", F.expr(f"stack({PQ_SUB}, {stack}) as (s, code)")
    )
    # per-query distance table: 5 queries x 16 codes x 8 subspaces = 640
    # integer cells — broadcast to the lookup join
    dtable = (
        qs.crossJoin(seeds)
        .select(
            "query_id",
            "code",
            *[
                _pq_sub_d2(F.col("qq"), F.col("cq"), s).alias(f"d2_{s}")
                for s in range(PQ_SUB)
            ],
        )
        .select(
            "query_id",
            "code",
            F.expr(
                "stack({n}, {cols}) as (s, d2)".format(
                    n=PQ_SUB,
                    cols=", ".join(f"{s}L, d2_{s}" for s in range(PQ_SUB)),
                )
            ),
        )
    )
    approx = (
        enc_long.join(F.broadcast(dtable), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("approx_d2"))
    )
    exact = (
        emb.crossJoin(qs)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("vq"), F.col("qq"), lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("exact_d2"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy("approx_d2", "vec_id")
    we = Window.partitionBy("query_id").orderBy("exact_d2", "vec_id")
    approx_rk = approx.withColumn("rk", F.row_number().over(wa).cast("bigint"))
    exact_rk = exact.withColumn("erk", F.row_number().over(we))
    # the approx side is N_QUERIES x TOP_K rows after the rank filter —
    # broadcast it so the full exact ranking never shuffles for the join
    return (
        F.broadcast(approx_rk.filter(F.col("rk") <= PQ_TOP_K))
        .join(exact_rk, ["query_id", "vec_id"])
        .select(
            "query_id",
            "rk",
            F.col("vec_id").alias("neighbor_id"),
            "approx_d2",
            F.col("exact_d2").cast("bigint").alias("exact_d2"),
            (F.col("erk") <= PQ_TOP_K).cast("bigint").alias("hit"),
        )
        .orderBy("query_id", "rk")
    )


R_CAND = 50  # stage-1 candidate pool per query (int8 scan), reranked to TOP_K


@register(
    "s12_quantized_rerank",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
q8 AS (
  SELECT vec_id, embedding,
         list_transform(emb, x -> floor(
           x / (list_max(list_transform(emb, y -> abs(y))) / 127.0) + 0.5
         )) AS qvals
  FROM v
),
queries AS (SELECT * FROM q8 WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.embedding AS c_emb, q.embedding AS q_emb,
         CAST(list_sum(list_transform(range(1, {DIM + 1}),
              i -> CAST(q.qvals[i] AS BIGINT) * CAST(c.qvals[i] AS BIGINT)))
           AS BIGINT) AS int_dot
  FROM queries q JOIN q8 c ON q.vec_id <> c.vec_id
),
stage1 AS (
  SELECT * FROM cand
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY int_dot DESC, neighbor_id ASC) <= {R_CAND}
),
rerank AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY {duck_cosine('c_emb', 'q_emb', DIM)} DESC,
                    neighbor_id ASC) AS rank
  FROM stage1
),
exact AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM queries q JOIN v c ON q.vec_id <> c.vec_id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY {duck_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                     c.vec_id ASC) <= {TOP_K}
)
SELECT r.query_id, CAST(r.rank AS BIGINT) AS rank, r.neighbor_id,
       (e.neighbor_id IS NOT NULL) AS hit_exact
FROM rerank r
LEFT JOIN exact e
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
WHERE r.rank <= {TOP_K}
ORDER BY r.query_id, r.rank
""",
    description="TWO-STAGE retrieval — the production ANN serving shape "
    "(quantized scan, float rerank): stage 1 ranks the whole corpus per "
    f"query by INT8 dot product (s07's floor(x/scale+0.5) quantization; "
    "the score is pure integer arithmetic, so cross-engine exact and "
    "order-independent) and keeps the top-"
    f"{R_CAND} candidates; stage 2 reranks only those by exact float "
    f"cosine to the final top-{TOP_K}, each flagged against the exact "
    "full-scan answer (the recall audit s04 established).  Scale shape: "
    "the int8 scan is the 4x-bandwidth pass (map-side, queries "
    "broadcast, TakeOrdered per query); the float pass touches "
    f"{R_CAND} rows per query instead of the corpus — the two-stage "
    "split is what makes float-precision retrieval affordable when the "
    "corpus is 100 TB of vectors.",
)
def s12_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_etl_poc_spark.functions.hashing import dot_fold

    e = table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(emb, lambda x: F.abs(x))) / F.lit(127.0)
    q8 = e.select(
        "vec_id",
        "embedding",
        F.transform(emb, lambda x: F.floor(x / scale + F.lit(0.5))).alias(
            "qvals"
        ),
        dot_fold(F.col("embedding"), F.col("embedding")).alias("nsq"),
    )
    queries = F.broadcast(
        q8.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("qvals").alias("q_qvals"),
            F.col("nsq").alias("q_nsq"),
        )
    )
    int_dot = F.aggregate(
        F.zip_with(
            F.col("q_qvals"),
            F.col("qvals"),
            lambda a, b: (a.cast("bigint") * b.cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cand = (
        q8.crossJoin(queries)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "embedding",
            "nsq",
            "q_emb",
            "q_nsq",
            int_dot.alias("int_dot"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("int_dot"), F.asc("neighbor_id")
    )
    stage1 = cand.withColumn("rn", F.row_number().over(w1)).where(
        F.col("rn") <= R_CAND
    )
    cos = dot_fold(F.col("embedding"), F.col("q_emb")) / F.sqrt(
        F.col("nsq") * F.col("q_nsq")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    rerank = (
        stage1.select("query_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= TOP_K)
    )
    # exact full-scan top-k for the hit flags (the recall reference)
    exact_cos = dot_fold(F.col("embedding"), F.col("q_emb")) / F.sqrt(
        F.col("nsq") * F.col("q_nsq")
    )
    exact = (
        q8.crossJoin(queries)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            exact_cos.alias("ecos"),
        )
        .withColumn(
            "ern",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("ecos"), F.asc("neighbor_id")
                )
            ),
        )
        .where(F.col("ern") <= TOP_K)
        .select("query_id", "neighbor_id")
        .withColumn("hit_exact", F.lit(True))
    )
    return (
        rerank.join(exact, ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            F.coalesce(F.col("hit_exact"), F.lit(False)).alias("hit_exact"),
        )
        .orderBy("query_id", "rank")
    )


# -- s13: IVFADC — inverted file + PQ on residuals ----------------------

IVFADC_CODE_LO = N_CELLS  # codebook = residuals of vec_id in [8, 24)
IVFADC_CODE_HI = N_CELLS + PQ_CODES


def _int_d2(a: Column, b: Column) -> Column:
    """Full-dimension integer squared L2 — exact, order-free."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _duck_int_d2(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


@register(
    "s13_ivfadc",
    oracle=f"""
WITH emb AS (
  SELECT vec_id, {_duck_pq_quant('embedding')} AS vq FROM embeddings
),
cents AS (SELECT vec_id AS cell_id, vq AS cvec FROM emb
          WHERE vec_id < {N_CELLS}),
asg AS (
  SELECT vec_id, CAST(MIN(d2 * {N_CELLS} + cell_id) % {N_CELLS} AS BIGINT)
           AS cell_id
  FROM (SELECT e.vec_id, c.cell_id,
               {_duck_int_d2('e.vq', 'c.cvec')} AS d2
        FROM emb e CROSS JOIN cents c)
  GROUP BY vec_id
),
resid AS (
  SELECT e.vec_id, a.cell_id,
         list_transform(range(1, {DIM + 1}), i -> e.vq[i] - c.cvec[i]) AS rq
  FROM emb e JOIN asg a USING (vec_id) JOIN cents c USING (cell_id)
),
codebook AS (
  SELECT vec_id - {IVFADC_CODE_LO} AS code, rq AS cq FROM resid
  WHERE vec_id >= {IVFADC_CODE_LO} AND vec_id < {IVFADC_CODE_HI}
),
subs AS (SELECT unnest(range(0, {PQ_SUB})) AS s),
enc AS (
  SELECT vec_id, cell_id, s,
         CAST(MIN(d2 * {PQ_CODES} + code) % {PQ_CODES} AS BIGINT) AS code
  FROM (SELECT r.vec_id, r.cell_id, s.s, d.code,
               {_duck_pq_sub_d2('r.rq', 'd.cq', 's.s')} AS d2
        FROM resid r CROSS JOIN codebook d CROSS JOIN subs s)
  GROUP BY vec_id, cell_id, s
),
qs AS (SELECT vec_id AS query_id, cell_id, rq AS qrq FROM resid
       WHERE vec_id < {N_QUERIES}),
dtable AS (
  SELECT q.query_id, s.s, d.code,
         {_duck_pq_sub_d2('q.qrq', 'd.cq', 's.s')} AS d2
  FROM qs q CROSS JOIN codebook d CROSS JOIN subs s
),
approx AS (
  SELECT q.query_id, e.vec_id, SUM(t.d2) AS approx_d2
  FROM qs q
  JOIN enc e ON e.cell_id = q.cell_id AND e.vec_id <> q.query_id
  JOIN dtable t ON t.query_id = q.query_id AND t.s = e.s AND t.code = e.code
  GROUP BY q.query_id, e.vec_id
),
exact AS (
  SELECT q.vec_id AS query_id, e.vec_id,
         {_duck_int_d2('e.vq', 'q.vq')} AS exact_d2
  FROM emb e CROSS JOIN (SELECT vec_id, vq FROM emb
                         WHERE vec_id < {N_QUERIES}) q
  WHERE e.vec_id <> q.vec_id
),
approx_rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY approx_d2, vec_id) AS rk
  FROM approx
),
exact_rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY exact_d2, vec_id) AS erk
  FROM exact
)
SELECT a.query_id, CAST(a.rk AS BIGINT) AS rk, a.vec_id AS neighbor_id,
       CAST(a.approx_d2 AS BIGINT) AS approx_d2,
       CAST(x.exact_d2 AS BIGINT) AS exact_d2,
       CAST(CASE WHEN x.erk <= {PQ_TOP_K} THEN 1 ELSE 0 END AS BIGINT) AS hit
FROM approx_rk a
JOIN exact_rk x ON a.query_id = x.query_id AND a.vec_id = x.vec_id
WHERE a.rk <= {PQ_TOP_K}
ORDER BY a.query_id, a.rk
""",
    description="IVFADC — the production billion-scale ANN layout "
    "(FAISS IVF-PQ; cf. PAPERS.md product quantization): composes s03's "
    f"inverted-file coarse quantizer ({N_CELLS} cells, argmin integer L2, "
    "a stand-in for trained k-means) with s11's product quantizer applied "
    "to the RESIDUAL vector inside each cell — residuals are smaller and "
    "better-centered than raw vectors, so the same codebook budget yields "
    f"lower distortion.  Every vector stores only (cell_id, {PQ_SUB} "
    "codes); queries compute ONE ADC distance table against the codebook "
    "from their own residual and scan only their probed cell's inverted "
    "list — per-query work is |cell| table lookups, never a float dot "
    "product.  All arithmetic sits on the fixed integer grid "
    "(floor(x*200+0.5)) so distances, rankings, and sums are exact "
    "integers — order-free, hash-safe.  Scale shape: centroids, "
    "codebook, and distance tables are tiny broadcasts; assignment and "
    "encoding reduce via map-side min-aggregation (one row per vector "
    "reaches each exchange); the ADC probe joins on cell_id — the "
    "corpus partitioned by inverted list, exactly how a 100 TB vector "
    "index shards.  Recall audited in-row: `hit` flags whether each "
    "returned neighbor is in the EXACT full-corpus top-10 (nprobe=1 "
    "recall; more probed cells raise it, per s05's multi-probe).",
)
def s13_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _pq_quant(F.col("embedding")).alias("vq"))
    cents = F.broadcast(
        emb.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cell_id"), F.col("vq").alias("cvec")
        )
    )
    # coarse assignment: argmin integer L2 over the broadcast centroids,
    # reduced by min(d2*N+cell) — map-side partials, one row per vector
    # reaches the exchange; residual computed in the same pass via max_by
    # on the negated key (carries the winning centroid out of the agg).
    asg = (
        emb.crossJoin(cents)
        .select(
            "vec_id",
            "vq",
            "cell_id",
            "cvec",
            _int_d2(F.col("vq"), F.col("cvec")).alias("d2"),
        )
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("cell_id", "cvec", "vq"),
                F.col("d2") * N_CELLS + F.col("cell_id"),
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.cell_id").alias("cell_id"),
            F.zip_with(F.col("b.vq"), F.col("b.cvec"), lambda x, y: x - y).alias(
                "rq"
            ),
        )
    )
    codebook = F.broadcast(
        asg.filter(
            (F.col("vec_id") >= IVFADC_CODE_LO) & (F.col("vec_id") < IVFADC_CODE_HI)
        ).select((F.col("vec_id") - IVFADC_CODE_LO).alias("code"), F.col("rq").alias("cq"))
    )
    # PQ-encode residuals: argmin code per (vector, subspace) — a single
    # groupBy(vec_id) with PQ_SUB agg columns (map-side partials), then
    # stack to long form for the ADC lookup join.
    enc_scored = asg.crossJoin(codebook).select(
        "vec_id",
        "cell_id",
        "code",
        *[
            _pq_sub_d2(F.col("rq"), F.col("cq"), s).alias(f"d2_{s}")
            for s in range(PQ_SUB)
        ],
    )
    enc = enc_scored.groupBy("vec_id", "cell_id").agg(
        *[
            (F.min(F.col(f"d2_{s}") * PQ_CODES + F.col("code")) % PQ_CODES)
            .cast("bigint")
            .alias(f"c{s}")
            for s in range(PQ_SUB)
        ]
    )
    stack = ", ".join(f"{s}L, c{s}" for s in range(PQ_SUB))
    enc_long = enc.select(
        "vec_id", "cell_id", F.expr(f"stack({PQ_SUB}, {stack}) as (s, code)")
    )
    qs = F.broadcast(
        asg.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("cell_id").alias("qcell"),
            F.col("rq").alias("qrq"),
        )
    )
    # per-query ADC table: N_QUERIES x PQ_CODES x PQ_SUB integer cells
    dtable = (
        qs.crossJoin(codebook)
        .select(
            "query_id",
            "code",
            *[
                _pq_sub_d2(F.col("qrq"), F.col("cq"), s).alias(f"d2_{s}")
                for s in range(PQ_SUB)
            ],
        )
        .select(
            "query_id",
            "code",
            F.expr(
                "stack({n}, {cols}) as (s, d2)".format(
                    n=PQ_SUB,
                    cols=", ".join(f"{s}L, d2_{s}" for s in range(PQ_SUB)),
                )
            ),
        )
    )
    # probe: only the query's own inverted list (cell_id equi-join), ADC
    # distance = sum of PQ_SUB broadcast table lookups
    approx = (
        enc_long.join(
            F.broadcast(qs.select("query_id", "qcell")),
            enc_long["cell_id"] == F.col("qcell"),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(dtable), ["query_id", "s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("approx_d2"))
    )
    exact = (
        emb.crossJoin(
            F.broadcast(
                emb.filter(F.col("vec_id") < N_QUERIES).select(
                    F.col("vec_id").alias("query_id"), F.col("vq").alias("qq")
                )
            )
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _int_d2(F.col("vq"), F.col("qq")).alias("exact_d2"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy("approx_d2", "vec_id")
    we = Window.partitionBy("query_id").orderBy("exact_d2", "vec_id")
    approx_rk = approx.withColumn("rk", F.row_number().over(wa).cast("bigint"))
    exact_rk = exact.withColumn("erk", F.row_number().over(we))
    return (
        F.broadcast(approx_rk.filter(F.col("rk") <= PQ_TOP_K))
        .join(exact_rk, ["query_id", "vec_id"])
        .select(
            "query_id",
            "rk",
            F.col("vec_id").alias("neighbor_id"),
            "approx_d2",
            F.col("exact_d2").cast("bigint").alias("exact_d2"),
            (F.col("erk") <= PQ_TOP_K).cast("bigint").alias("hit"),
        )
        .orderBy("query_id", "rk")
    )


RADIUS_SIM = 0.25
RADIUS_QUERIES = 5


@register(
    "s14_radius_search",
    oracle=f"""
SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, b.label,
       {duck_cosine('b.embedding', 'q.embedding', DIM)} AS cos_sim
FROM embeddings b
JOIN (SELECT vec_id, embedding FROM embeddings
      WHERE vec_id < {RADIUS_QUERIES}) q
  ON b.vec_id <> q.vec_id
WHERE {duck_cosine('b.embedding', 'q.embedding', DIM)} >= {RADIUS_SIM}
ORDER BY query_id, neighbor_id
""",
    description="Cosine RADIUS (range) search — every corpus vector "
    "within a similarity threshold of each query, the dual of top-k "
    "(s01): result size is data-driven, not k-bounded, which is what "
    "near-duplicate radius sweeps and recall='all within eps' "
    "evaluations need.  The five query vectors broadcast; the corpus "
    "is scanned once with the threshold applied map-side (never "
    "materializing the full similarity matrix), so the shape is a "
    "broadcast-nested-loop prune, and the only shuffle is the final "
    "presentation sort.  Cosines use the sequential-fold primitive "
    "(functions/hashing.py) so both engines emit bit-identical "
    "doubles and the >= threshold admits the identical hit set.  At "
    "100 TB the same plan holds: broadcast Q, map-side filter, "
    "output proportional to true neighbors (an IVF/LSH prefilter "
    "composes in front exactly as s03/s02 do for top-k).",
)
def s14_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < RADIUS_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
    )
    return (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= RADIUS_SIM)
        .orderBy("query_id", "neighbor_id")
    )


BQ_DIMS = 63  # sign bits packed into one BIGINT (bit 63 left clear)
BQ_RERANK = 30
BQ_TOP = 10


@register(
    "s15_binary_quantization",
    oracle=f"""
WITH sigs AS (
  SELECT vec_id, label, embedding,
         list_sum(list_transform(range(0, {BQ_DIMS}),
             i -> CASE WHEN embedding[i + 1] > 0
                       THEN 1::BIGINT << i ELSE 0::BIGINT END)) AS sig
  FROM embeddings
),
q AS (SELECT vec_id, embedding, sig FROM sigs WHERE vec_id < {N_QUERIES}),
ham AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, b.label,
         b.embedding AS bvec, q.embedding AS qvec,
         bit_count(xor(q.sig, b.sig)) AS hamming,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY bit_count(xor(q.sig, b.sig)), b.vec_id)
           AS hrank
  FROM sigs b JOIN q ON b.vec_id <> q.vec_id
),
rerank AS (
  SELECT query_id, neighbor_id, label, CAST(hamming AS BIGINT) AS hamming,
         {duck_cosine('bvec', 'qvec', DIM)} AS cos_sim
  FROM ham WHERE hrank <= {BQ_RERANK}
)
SELECT query_id, neighbor_id, label, hamming, cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS r
  FROM rerank
)
WHERE r <= {BQ_TOP}
ORDER BY query_id, cos_sim DESC, neighbor_id
""",
    description="1-BIT BINARY QUANTIZATION retrieval (the 32x memory "
    "reduction production vector stores ship as 'BQ': each embedding "
    "collapses to its sign bits, packed here into ONE BIGINT — 63 of "
    "64 dims, bit 63 left clear so the packed word stays positive in "
    "both engines' signed BIGINT).  Scan phase ranks by HAMMING "
    "distance, computed as bit_count(XOR) — one popcount per "
    "comparison, the cheapest distance that exists; the top-30 "
    "candidates per query then rerank by exact float cosine and the "
    "top-10 survive (s12's int8 two-stage shape, pushed to the 1-bit "
    "extreme).  Everything before the rerank is integer-exact, and "
    "the rerank cosines use the sequential-fold primitive, so both "
    "engines agree bit-for-bit; both rank windows carry total "
    "tie-breaks.  Scale shape: signatures are 8 bytes/vector (a "
    "billion vectors fit in 8 GB — broadcast or scan-local), the "
    "Hamming scan is map-side vs broadcast query signatures, and the "
    "float vectors are touched ONLY for the 30 rerank candidates per "
    "query — the I/O win that makes BQ the default first stage at "
    "scale.",
)
def s15_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    sig = F.expr(
        f"aggregate(sequence(0, {BQ_DIMS - 1}), 0L, (acc, i) -> "
        f"acc + CASE WHEN element_at(embedding, i + 1) > 0 "
        f"THEN shiftleft(1L, i) ELSE 0L END)"
    )
    sigs = e.select("vec_id", "label", "embedding", sig.alias("sig"))
    q = F.broadcast(
        sigs.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            F.col("sig").alias("qsig"),
        )
    )
    ham = (
        sigs.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.col("embedding").alias("bvec"),
            "qvec",
            F.bit_count(F.col("qsig").bitwiseXOR(F.col("sig"))).alias("hamming"),
        )
    )
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    rerank = (
        ham.withColumn("hrank", F.row_number().over(w_ham))
        .filter(F.col("hrank") <= BQ_RERANK)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.col("hamming").cast("bigint").alias("hamming"),
            cosine(F.col("bvec"), F.col("qvec")).alias("cos_sim"),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rerank.withColumn("r", F.row_number().over(w_cos))
        .filter(F.col("r") <= BQ_TOP)
        .select("query_id", "neighbor_id", "label", "hamming", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )
