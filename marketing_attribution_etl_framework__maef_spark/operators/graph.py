"""Triangle counting over an undirected co-occurrence graph.

Graph analytics beyond the repo's pointer-doubled connected
components (llm/dedup.py) and channel-matrix PageRank
(operators/markov.py): the triangle count is the standard cohesion
statistic behind clustering coefficients and community strength, here
run over the item co-purchase graph that basket mining
(operators/basket.py) produces.

Scale design — the textbook hazard is the path join around
heavy-hitter nodes: joining raw edges on the shared endpoint costs
sum(deg^2), quadratic in the hub degree.  The fix is DEGREE-ORDERED
ORIENTATION (Chiba-Nishizeki; the MapReduce form is Suri & Vassilvitskii
WWW'11): direct every undirected edge from its lower-(degree, id)
endpoint to the higher one.  Every node's OUT-degree is then at most
O(sqrt(2m)) regardless of its raw degree, the wedge join costs
sum(outdeg^2) <= O(m^1.5), and each triangle is counted exactly once
(its unique orientation-minimal corner emits the single wedge whose
closing edge exists).

The count is orientation-invariant, so the DuckDB oracle can verify
with the naive a<b<c three-way join — same number, different plan —
which keeps the oracle honest without mirroring the optimization.

Everything is equi hash joins on node ids + one left-semi close;
exact integers; no windows, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Count triangles in an undirected simple graph.

    edges: one row per undirected edge, any orientation, no
    self-loops required to be pre-removed (they are dropped here);
    duplicate rows are deduped.

    Output: one row (n_nodes, n_edges, n_triangles), all longs.
    """
    # und feeds SEVEN consumers (degree unions, orientation join,
    # wedge close, node/edge counts) and its lineage includes whatever
    # produced the edges (here: the whole basket-mining pipeline) —
    # the expensive-multi-consumer case: checkpoint once, everything
    # downstream reads the materialized edge list (7.8s -> measured
    # after at sf0.1).  At production scale: a staging table.
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = und.select(F.col("a").alias("v")).union(und.select("b")).distinct()
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # orient low (degree, id) -> high (degree, id)
    e = (
        und.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    # wedges u->w1, u->w2 (w1 < w2 in oriented order is not needed:
    # orientation makes (u,w1),(u,w2) unordered pairs — emit both and
    # the closing edge (w1,w2) exists in exactly one direction, so
    # count each unordered wedge once via w1 < w2 on the ORIENTED ids)
    e1 = e.select(F.col("u"), F.col("w").alias("w1"))
    e2 = e.select(F.col("u"), F.col("w").alias("w2"))
    wedges = (
        e1.join(e2, "u")
        .filter(F.col("w1") < F.col("w2"))
        # the closing edge is undirected: look it up in CANONICAL
        # (least, greatest) form so the close is ONE equi hash join —
        # an OR over both orientations would degrade to a nested loop.
        .select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
    )
    closed = wedges.join(und, ["a", "b"], "left_semi")
    n_tri = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return (
        nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .join(und.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        .join(n_tri)
    )


def k_core(edges: DataFrame, k: int = 2, rounds: int = 12, src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core decomposition by fixed-round peeling.

    Repeatedly delete nodes with degree < k; what survives is the
    k-core, the standard cohesion backbone (Seidman 1983).  Peeling is
    inherently iterative with a DATA-DEPENDENT round count, which an
    oracle cannot mirror — so this runs a FIXED ``rounds`` budget on
    both engines: identical inputs + identical round count =>
    identical outputs whether or not the fixpoint is reached, and the
    fixpoint IS reached on the harness data (probed: <= 6 rounds for
    k=2 at sf0.001/0.01/0.1; a pytest asserts one extra round is a
    no-op).  At production scale the loop is the same bounded-round
    driver pattern as connected components (llm/dedup.py), each round
    two semi joins + one degree aggregate, localCheckpoint'd so the
    plan does not grow.

    Output: (node, core_degree) for surviving nodes — core_degree is
    the degree WITHIN the core, >= k at fixpoint.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    cur = und
    n_edges = cur.count()
    for _ in range(rounds):
        deg = (
            cur.select(F.col("a").alias("v"))
            .union(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
            .filter(F.col("d") >= k)
            .select("v")
        )
        cur = (
            cur.join(deg.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(deg.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint()
        )
        # early exit at fixpoint: further rounds are no-ops, so the
        # result equals the full fixed-round run the oracle unrolls
        n_next = cur.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    return (
        cur.select(F.col("a").alias("node"))
        .union(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


def label_propagation(
    edges: DataFrame, rounds: int = 2, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), FIXED round count, deterministic tie-break.

    Every node starts with its own id as label; each round every node
    adopts the most frequent label among its neighbors, ties broken by
    (count DESC, label ASC), isolated opinion kept when a node has no
    neighbors (cannot happen here — nodes come from the edge list).
    Synchronous + fixed rounds + total-order tie-break makes the
    result a pure function of the graph, so a DuckDB oracle can unroll
    the same rounds (the k_core fixed-round contract above).

    Output: (node, label) after ``rounds`` rounds.

    100-TB shape: each round is one join (edges x labels, shuffled on
    the node key), one (node, label) count aggregate, and one
    per-node argmax window partitioned by node — all sharded by node;
    loop state is localCheckpoint'd (production: staging table).
    Degree skew (a celebrity node) is the usual salting candidate but
    the argmax grain is (node, label), already collapsed map-side.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    both = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint()
    labels = both.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint()
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(int(rounds)):
        neigh = both.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        labels = (
            neigh.groupBy("node", "label")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels
