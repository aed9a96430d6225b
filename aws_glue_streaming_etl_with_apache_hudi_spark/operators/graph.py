"""Distributed graph analytics over DataFrame edge lists.

The engine's relational surface covers most reference queries; graph
shapes (degree stats, triangles, PageRank, connected components) are the
remaining analytics family a large events/orders corpus gets asked for.
Everything here is pure DataFrame algebra — joins and aggregations that
Catalyst plans like any other query — with the iteration structure
(bounded rounds, persist per round) handled Python-side.

Scale notes (the part that matters at 100 TB):

- Edge derivation is two shuffles: co-group on the containing entity
  (order), then distinct/count on the (u, v) pair. Entity group sizes
  are bounded (TPC-H orders have <= 7 lines), so the pair explosion is
  O(lines * avg_lines) with no skew hazard; a social-style dataset with
  mega-entities would cap group size first (same pattern as the LSH
  hot-bucket cap in operators/dedup.py).
- Triangle counting joins the edge list to itself twice. Orienting every
  edge low->high id bounds each wedge to one direction (no triangle is
  counted twice, no back-edges join); the classic refinement — orient by
  (degree, id) instead of id — bounds the join fan-out by max degree and
  is a one-line swap on the `orient` expression.
- PageRank/label-propagation rounds persist their frontier and unpersist
  the previous one: each round is one join + one aggregation on the edge
  partitioning, and AQE coalesces the tiny rank-side shuffles.
- All iteration counts are FIXED (bounded rounds), which keeps results
  deterministic and oracle-checkable: the DuckDB oracle unrolls the same
  rounds as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(lineitem: DataFrame, min_support: int = 2) -> DataFrame:
    """Undirected part co-purchase edges: (u, v) with u < v, kept when
    the pair co-occurs in at least ``min_support`` orders.

    Columns: u long, v long. The support threshold is what keeps the
    graph sparse as the fact table grows — raw co-occurrence densifies
    with volume; repeated co-occurrence measures actual affinity."""
    li = lineitem.select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_support)
        .select("u", "v")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of an undirected edge list: (src, dst)."""
    return edges.selectExpr("u AS src", "v AS dst").unionByName(
        edges.selectExpr("v AS src", "u AS dst")
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, degree) over the undirected graph."""
    return (
        symmetrize(edges)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """One-row (n_nodes, n_edges, n_triangles) for an oriented (u < v)
    edge list.

    Wedge join (u,v)x(v,w) then close with (u,w): with every edge
    oriented low->high each triangle {a<b<c} is found exactly once, as
    the wedge a->b->c closed by a->c."""
    already_cached = edges.storageLevel.useMemory or edges.storageLevel.useDisk
    e = edges if already_cached else edges.persist()
    try:
        n_nodes = degrees(e).count()
        n_edges = e.count()
        e1 = e.alias("e1")
        e2 = e.alias("e2")
        e3 = e.alias("e3")
        tri = (
            e1.join(e2, F.col("e1.v") == F.col("e2.u"))
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.u"))
                & (F.col("e3.v") == F.col("e2.v")),
            )
            .count()
        )
    finally:
        if not already_cached:  # a caller-owned cache is not ours to evict
            e.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, tri)], "n_nodes long, n_edges long, n_triangles long"
    )


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85) -> DataFrame:
    """Bounded-round PageRank on the undirected graph: (node, pr).

    pr_{t+1}(v) = (1-d)/N + d * sum_{u~v} pr_t(u)/deg(u). Undirected
    edges mean no dangling mass (every node has degree >= 1). Each round
    is one join on src + one aggregation on dst — both partition on node
    id, so successive rounds reuse the same hash partitioning."""
    sym = symmetrize(edges)
    deg = degrees(edges).persist()
    try:
        n = deg.count()
        base = (1.0 - damping) / n
        ranks = deg.select("node", F.lit(1.0 / n).alias("pr")).persist()
        ranks.count()
        adj = sym.join(
            deg.withColumnRenamed("node", "src"), "src"
        ).persist()  # (src, dst, degree): static across rounds
        adj.count()
        for _ in range(iters):
            contribs = (
                adj.join(ranks.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("pr") / F.col("degree")).alias("contrib"))
            )
            new_ranks = deg.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("pr"),
            ).persist()
            new_ranks.count()
            ranks.unpersist()
            ranks = new_ranks
        out = ranks.select("node", "pr")
        adj.unpersist()
        return out
    finally:
        deg.unpersist()


def min_label_components(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Bounded-round min-label propagation: (node, component).

    Each round every node takes the minimum label among itself and its
    neighbors; after k rounds labels have propagated k hops. Fixed
    rounds keep the result deterministic and SQL-oracle-checkable; full
    convergence would loop until a round changes nothing (compare
    counts), with the same per-round plan."""
    sym = symmetrize(edges).persist()
    try:
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .persist()
        )
        labels.count()
        for _ in range(iters):
            neighbor_min = (
                sym.join(labels.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.min("lbl").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))
                    ).alias("lbl"),
                )
                .persist()
            )
            new_labels.count()
            labels.unpersist()
            labels = new_labels
        return labels.select("node", F.col("lbl").alias("component"))
    finally:
        sym.unpersist()
