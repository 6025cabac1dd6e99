"""Graph-analytics battery entries: iterative fixpoint algorithms as lazy
Catalyst dataflows.

The connected-components operator (operators/graph.py, driven by d07)
covers the driver-loop-until-convergence shape; this module covers the
FIXED-ITERATION shape — a bounded number of join/aggregate rounds
unrolled into ONE lazy plan the optimizer sees whole.  Everything runs
on exact integer arithmetic (floor-division redistribution) so Spark
and the DuckDB oracle agree bit-for-bit — the classic damped-PageRank
double would drift in the last ulp across engines.

Reference parity: the closest surface in mounikavas/agentic-etl-poc is
the SQL pass-through (etl_agent/tools.py transform_sql); iterative graph
analytics is engine-extension surface (SURVEY.md §2.3 "free in Spark").
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agentic_etl_poc_spark.io_tables import table
from agentic_etl_poc_spark.queries.core import register

PR_SCALE = 1_000_000  # initial integer rank per node
PR_ITERS = 3
PR_TOP = 20


#: Session-scoped checkpointed edge frames, keyed (sf_dir,) — g01 and
#: g03 walk the SAME customer<->supplier interaction graph, and the
#: edge derivation (orders⋈lineitem + 58.7M-pair distinct at sf10) is
#: ~90% of each entry's isolated sf10 wall (38 of 42 s measured).  One
#: battery session derives it once; the memo holds the LogicalRDD-backed
#: frame (localCheckpoint blocks die with the session — same lifetime
#: discipline as queries/core.py::shared_frame, weak-keyed so a stopped
#: session's entry dies with it).  This is the compute-once-fan-out
#: shape the dedup family already uses (minhash stats, twin parts).
_EDGES: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def shared_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interaction graph's edge list (src, dst) — BOTH directions of
    the distinct customer<->supplier pairs, hash-partitioned on src and
    localCheckpointed once per (session, sf_dir)."""
    per = _EDGES.get(spark)
    if per is None:
        per = {}
        _EDGES[spark] = per
    e = per.get(sf_dir)
    if e is None:
        o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        pairs = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .select(
                (F.col("o_custkey") * 2).alias("cnode"),
                (F.col("l_suppkey") * 2 + 1).alias("snode"),
            )
            .distinct()
        )
        edges = pairs.select(
            F.col("cnode").alias("src"), F.col("snode").alias("dst")
        ).unionAll(
            pairs.select(
                F.col("snode").alias("src"), F.col("cnode").alias("dst")
            )
        )
        # one explicit exchange on src: every consumer (degree agg, seed
        # min, node distinct, three frontier/rank joins) is src-keyed,
        # and LogicalRDD preserves the hash partitioning
        e = edges.repartition("src").localCheckpoint(eager=True)
        per[sf_dir] = e
    return e


def _duck_pr_iter(prev: str, out: str) -> str:
    """One integer PageRank round: floor-div redistribution + damping.
    rank'(v) = 0.15*SCALE + floor(0.85 * sum(rank(u) // deg(u)))."""
    return f"""
c{out} AS (
  SELECT e.dst, SUM({prev}.rank // deg.d) AS s
  FROM e JOIN deg USING (src) JOIN {prev} ON {prev}.node = e.src
  GROUP BY e.dst
),
r{out} AS (
  SELECT dst AS node,
         CAST(150000 + (85 * s) // 100 AS BIGINT) AS rank
  FROM c{out}
)"""


@register(
    "g01_integer_pagerank",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg),
{_duck_pr_iter('r0', '1')},
{_duck_pr_iter('r1', '2')},
{_duck_pr_iter('r2', '3')}
SELECT node, rank FROM r3
ORDER BY rank DESC, node ASC
LIMIT {PR_TOP}
""",
    description=f"Integer PageRank, {PR_ITERS} damped rounds unrolled "
    "into one lazy plan — the fixed-iteration graph-fixpoint shape "
    "(d07's connected components covers the loop-until-convergence "
    "shape).  The graph is the customer<->supplier interaction graph "
    "(distinct order lineage pairs, both directions, so no dangling "
    "nodes); ranks live on an integer grid and every redistribution is "
    "a FLOOR DIVISION (rank div degree), every damping step integer "
    "(0.15*SCALE + floor(0.85*sum)) — exact in both engines, where the "
    "textbook double formulation would drift in the final ulp under "
    "different summation orders.  Scale shape: each round is one "
    "edge-keyed broadcast-free join (edges co-shuffled with ranks on "
    "src) plus one map-side-combinable sum by dst — the round cost is "
    "O(|E|) shuffle, the plan depth is the iteration count, and "
    "Catalyst sees the whole unrolled dataflow (at larger iteration "
    "counts, localCheckpoint per round bounds lineage — the d07 "
    "discipline).  Top-20 is TakeOrderedAndProject.",
)
def g01_integer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 13: the edge list comes from the session-shared checkpoint
    # (see shared_edges — g03 walks the same graph; deriving it was ~90%
    # of each entry's isolated sf10 wall).  The round-12 shape also
    # materialized a SECOND edge-scale frame (ew = edges ⋈ deg, 3 int64
    # columns, 117M rows at sf10); the degree now annotates the
    # NODE-scale rank frame instead (rank div d is computed after the
    # node-keyed join, same integer arithmetic), so the only edge-scale
    # materialization left is the shared edge list itself and each round
    # joins e against a node-scale (node, contrib-per-edge) frame
    # (guide §2.3 — shuffle node-scale metadata, not edge payloads).
    e = shared_edges(spark, sf_dir)
    # degree agg rides e's src partitioning (no exchange); node-scale,
    # checkpointed once so rounds scan a tiny LogicalRDD
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(PR_ITERS):
        # per-edge contribution = rank(u) div deg(u): computed on the
        # NODE-scale frame, then attached to edges by one src-keyed join.
        # The node frame is BROADCAST (g02's precedent for this graph's
        # dim-scale frames): statically the planner saw an unknown-size
        # aggregate and picked sort-merge, which re-SORTED the 117M-row
        # checkpointed e every round — 3 avoidable edge-scale sorts.
        rankdeg = ranks.join(
            F.broadcast(deg), ranks["node"] == deg["src"]
        ).select(ranks["node"], F.expr("rank div d").alias("contrib"))
        contrib = e.join(
            F.broadcast(rankdeg), e["src"] == rankdeg["node"]
        ).select("dst", "contrib")
        sums = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        ranks = sums.select(
            F.col("dst").alias("node"),
            (F.lit(150000) + F.expr("(85 * s) div 100"))
            .cast("bigint")
            .alias("rank"),
        )
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(PR_TOP)


@register(
    "g02_triangle_count",
    oracle="""
WITH pair_orders AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey AS a, l2.l_suppkey AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
),
co AS (
  SELECT a, b FROM pair_orders
  GROUP BY a, b HAVING COUNT(*) >= 5
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM co UNION ALL SELECT b AS node FROM co) u
  GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b)
              THEN a ELSE b END AS src,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b)
              THEN b ELSE a END AS dst
  FROM co
  JOIN deg da ON da.node = a
  JOIN deg db ON db.node = b
),
keyed AS (
  SELECT src, dst, db.d * 100000000 + dst AS dst_ord
  FROM oriented JOIN deg db ON db.node = dst
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM keyed e1
  JOIN keyed e2 ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord
  JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
wed AS (
  SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_triangles, n_wedges,
       CAST(CASE WHEN n_wedges = 0 THEN 0
                 ELSE (3 * n_triangles * 1000000) // n_wedges END AS BIGINT)
         AS closure_ppm
FROM tri, wed
""",
    description="Distributed triangle counting with DEGREE-ORDERED edge "
    "orientation over the supplier co-supply graph (suppliers are "
    "adjacent when they ship lines of the same order in >= 5 DISTINCT "
    "orders — the standard support threshold that prunes coincidental "
    "co-occurrence, and the knob that keeps edge count near-linear in "
    "data size instead of saturating toward the complete graph: the "
    "round-7 scaling audit measured the unthresholded sf1 graph at "
    "4.5M edges over 10k suppliers with ~2.4G wedges — ~560 s of "
    "exact counting — while support>=5 keeps 477k edges / 1.55M "
    "triangles and runs in seconds; small fixtures stay complete "
    "graphs because every pair co-occurs often).  Orientation "
    "is the load-bearing scale idea: each undirected edge points from "
    "its lower-(degree, id) endpoint to the higher, so every triangle "
    "is counted exactly once at its lowest vertex and the wedge join's "
    "per-key fanout is bounded by max OUT-degree = O(sqrt(edges)) even "
    "on power-law graphs — the unoriented wedge join explodes on hub "
    "nodes.  All counts are exact integers (the closure rate is an "
    "integer-division ppm with a zero-wedge guard), so both engines "
    "agree bit-for-bit.  Scale shape: the co-supply self-join fans out "
    "only within an order (bounded lines per order), the per-(order, "
    "pair) DISTINCT and the support count share one shuffle on (a, b), "
    "degrees broadcast (node set is dim-scale), and the wedge join "
    "shuffles oriented edges once on src.",
)
def g02_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    pair_orders = (
        li.join(
            l2,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_suppkey") < F.col("r_suppkey")),
        )
        .select(
            "l_orderkey",
            F.col("l_suppkey").alias("a"),
            F.col("r_suppkey").alias("b"),
        )
        .distinct()
    )
    # The edge list feeds SIX consumers (two degree scans, orientation,
    # the closing-edge probe, and both wedge sides through keyed).
    # Catalyst reuses EXCHANGES, not arbitrary subplans, and per-consumer
    # column pruning makes each subtree distinct — without a boundary the
    # whole lineitem self-join + support aggregation re-executes per
    # consumer (149 s at sf1, measured).  The explicit repartition pins
    # one shared exchange every consumer reuses (14 s at sf1, 9
    # ReusedExchange nodes in the plan).
    co = (
        pair_orders.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 5)
        .select("a", "b")
        .repartition("a", "b")
        # round-12: materialize the thresholded edge list once — the
        # repartition's runtime exchange reuse already deduplicated the
        # EXECUTION, but the six consumers still re-derived the subtree
        # in the static plan (174 Exchanges / 84 scans, planning cost);
        # the frame is support-thresholded-edge-scale (near-linear in
        # data by the >= 5 support knob)
        .localCheckpoint(eager=True)
    )
    deg = (
        co.select(F.col("a").alias("node"))
        .unionAll(co.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        co.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    dd = deg.select(F.col("node").alias("dst"), F.col("d").alias("dd"))
    keyed = oriented.join(F.broadcast(dd), "dst").select(
        "src", "dst", (F.col("dd") * 100000000 + F.col("dst")).alias("dst_ord")
    )
    e1 = keyed.select(
        F.col("src").alias("s1"), F.col("dst").alias("d1"), F.col("dst_ord").alias("o1")
    )
    e2 = keyed.select(
        F.col("src").alias("s2"), F.col("dst").alias("d2"), F.col("dst_ord").alias("o2")
    )
    wedges = e1.join(e2, (F.col("s1") == F.col("s2")) & (F.col("o1") < F.col("o2")))
    closing = oriented.select(
        F.col("src").alias("c_src"), F.col("dst").alias("c_dst")
    )
    tri = wedges.join(
        closing,
        (F.col("d1") == F.col("c_src")) & (F.col("d2") == F.col("c_dst")),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    wed = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges")
    )
    return tri.crossJoin(wed).select(
        "n_triangles",
        "n_wedges",
        F.expr(
            "CASE WHEN n_wedges = 0 THEN 0"
            "     ELSE (3 * n_triangles * 1000000) div n_wedges END"
        )
        .cast("bigint")
        .alias("closure_ppm"),
    )


@register(
    "g03_bfs_levels",
    oracle="""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS MATERIALIZED (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
l0 AS MATERIALIZED (SELECT MIN(node) AS node FROM nodes),
r1 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM e JOIN l0 ON e.src = l0.node),
l1 AS MATERIALIZED (SELECT node FROM r1 EXCEPT SELECT node FROM l0),
r2 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM e JOIN l1 ON e.src = l1.node),
l2 AS MATERIALIZED (SELECT node FROM r2
       EXCEPT SELECT node FROM l1
       EXCEPT SELECT node FROM l0),
r3 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM e JOIN l2 ON e.src = l2.node),
l3 AS MATERIALIZED (SELECT node FROM r3
       EXCEPT SELECT node FROM l2
       EXCEPT SELECT node FROM l1
       EXCEPT SELECT node FROM l0),
lv AS MATERIALIZED (
  SELECT 0 AS level, node FROM l0
  UNION ALL SELECT 1, node FROM l1
  UNION ALL SELECT 2, node FROM l2
  UNION ALL SELECT 3, node FROM l3
),
unreached AS (
  SELECT 99 AS level, node FROM nodes
  WHERE node NOT IN (SELECT node FROM lv)
)
SELECT CAST(level AS INT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node_ids
FROM (SELECT * FROM lv UNION ALL SELECT * FROM unreached)
GROUP BY level
ORDER BY level
""",
    description="Breadth-first FRONTIER EXPANSION, three levels unrolled "
    "into one lazy plan, over the bipartite customer<->supplier "
    "interaction graph (g01's node encoding: customers even, suppliers "
    "odd — bipartite, so frontiers alternate sides and the graph stays "
    "sparse at every scale where a co-supply projection saturates).  "
    "Each level is one edge join against the previous frontier plus "
    "EXCEPT-dedup against all earlier levels — the iterative frontier "
    "shape (vs g01's full-graph fixpoint and d07's convergence loop); "
    "unreached nodes (other components) report as level 99, so the "
    "output is a complete partition of the node set and the hash "
    "pins every frontier membership decision exactly (levels, counts, "
    "and id-sums are all integers).  Scale shape: each round shuffles "
    "only the FRONTIER keyed on node id (frontier size, not graph "
    "size), the edge list is scanned once per round with the join "
    "pushed on src, and the EXCEPTs are frontier-sized anti-joins; each "
    "round is localCheckpointed (the d07 discipline) — left lazy, the "
    "unrolled plan re-derives the base join ~2^rounds times per "
    "consumer (75 s vs 7 s at sf0.01, measured).",
)
def g03_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 13: the checkpointed edge list is session-shared with g01
    # (see shared_edges); in a battery session only the first consumer
    # pays the orders⋈lineitem + distinct derivation.
    #
    # The d07 discipline for iterative frontier algorithms: each round's
    # frontier is consumed three times (next round's join, the seen
    # accumulator, the level output) and the accumulator k times more —
    # left lazy, every consumer re-derives the whole upstream chain and
    # the unrolled plan recomputes the base join ~2^rounds times
    # (measured 75 s at sf0.01).  localCheckpoint(eager) materializes
    # each round once and resets its plan to a LogicalRDD scan; the
    # frames are frontier-sized (node ids only), so the checkpoint cost
    # is trivial next to the recompute it prevents (~7 s at sf0.01).
    e = shared_edges(spark, sf_dir)
    # node set rides e's src partitioning (distinct groups on the same
    # key the checkpoint preserved — no exchange)
    nodes = e.select(F.col("src").alias("node")).distinct()
    # min over e.src == min over distinct nodes (every node appears as a
    # src — both edge directions are in e), so the seed job skips the
    # distinct's shuffle entirely (round-12: one less exchange per run)
    l0 = e.agg(F.min("src").alias("node")).localCheckpoint(eager=True)
    frontiers = [l0]
    seen = l0
    for _ in range(3):
        reach = (
            e.join(frontiers[-1], e["src"] == frontiers[-1]["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        nxt = reach.join(seen, "node", "left_anti").localCheckpoint(
            eager=True
        )
        frontiers.append(nxt)
        # the accumulator is a lazy union of ALREADY-CHECKPOINTED
        # frontiers: every consumer re-reads materialized blocks, so
        # checkpointing the union itself only added an eager job per
        # round (round-12: 3 fewer jobs, same dataflow)
        seen = seen.unionAll(nxt)
    lv = None
    for level, fr in enumerate(frontiers):
        part = fr.select(F.lit(level).alias("level"), "node")
        lv = part if lv is None else lv.unionAll(part)
    unreached = nodes.join(seen, "node", "left_anti").select(
        F.lit(99).alias("level"), "node"
    )
    return (
        lv.unionAll(unreached)
        .groupBy(F.col("level").cast("int").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("sum_node_ids"),
        )
        .orderBy("level")
    )
