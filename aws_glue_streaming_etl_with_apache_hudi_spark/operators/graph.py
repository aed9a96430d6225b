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
- PageRank/label-propagation rounds unroll lazily into one plan with a
  persist CHECKPOINT every few rounds (not per round): each round is one
  join + one aggregation on the edge partitioning, AQE coalesces the
  tiny rank-side shuffles, and the cadence bounds both job count (the
  local cost) and failure-recovery lineage (the cluster cost).
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
    with volume; repeated co-occurrence measures actual affinity.

    Support counts DISTINCT co-occurring orders: the (orderkey, partkey)
    projection is deduplicated before the self-join, so an order listing
    the same part on k lines contributes one pair occurrence, not k*m —
    "co-occurs in >= min_support orders" means orders, not line-item
    pair products. The distinct is a map-side-combining shuffle on a key
    the join needs anyway, so it also shrinks the self-join input."""
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
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


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    materialize_every: int = 4,
) -> DataFrame:
    """Bounded-round PageRank on the undirected graph: (node, pr).

    pr_{t+1}(v) = (1-d)/N + d * sum_{u~v} pr_t(u)/deg(u). Undirected
    edges mean no dangling mass (every node has degree >= 1). Each round
    is one join on src + one aggregation on dst — both partition on node
    id, so successive rounds reuse the same hash partitioning.

    Iteration structure: rounds are UNROLLED LAZILY into one plan and
    only every ``materialize_every``-th frontier is persisted+counted —
    a checkpoint cadence, not a per-round barrier. Per-round
    materialization cost one Spark job per round for zero benefit at
    small round counts (the profiled local overhead was ~1 s/round on a
    4k-edge graph); pure unrolling at large round counts grows the plan
    and the failure-recovery lineage without bound. The cadence gives
    both: <= ``materialize_every`` rounds ever recompute on a lost
    partition, and a 3-round call is a single job. The final frontier
    lands in a bounded session persist slot (operators/dedup.py) so
    repeated registry runs can't accumulate executor storage.

    ``deg`` and ``adj`` are static per edge list — the same derived
    artifacts every round (and every repeated call) consumes — so they
    live in session slots like ``edges`` itself rather than per-call
    ``persist()``/``unpersist()`` pairs: a repeated call (the bench's
    steady state, or any session issuing several graph queries) reuses
    the materialized frames instead of re-running the degree shuffle and
    re-caching the adjacency every time (measured ~0.9 s/call of pure
    re-materialization at sf0.1; the slot bound still guarantees at most
    one live copy per session). ``adj`` specifically uses the
    lineage-TRUNCATING slot (operators/dedup.py _truncated_slot): the
    unrolled rounds reference it once per round, and with a plain
    persist each reference inlined the whole co-purchase-join lineage
    into the rounds plan — every downstream action then re-analyzed and
    cache-matched a ~10x-inflated tree on the driver (measured ~0.7
    s/call of pure plan work at sf0.1, more than the executor time;
    guide §3.3/§7.3). Its lineage stays pinned through the ``edges`` /
    ``graph.degrees`` slots it is derived from.

    Two algebraic identities keep the round loop lean (both hold
    because nodes are DEFINED by edges, so every node has degree >= 1
    and therefore >= 1 in-neighbor in the symmetrized list):
    round 1 folds the uniform 1/n rank into the aggregate instead of
    joining a constant frame, and no round needs the old
    ``deg LEFT JOIN contribs`` + coalesce(contrib, 0) — ``contribs``
    already covers the full node set, so the join was an identity that
    re-inlined ``deg`` (and one broadcast join) per round."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import (
        _persist_slot,
        _truncated_slot,
    )

    sym = symmetrize(edges)
    deg = _persist_slot(degrees(edges), "graph.degrees")
    n = deg.count()
    base = (1.0 - damping) / n
    adj = _truncated_slot(
        sym.join(deg.withColumnRenamed("node", "src"), "src"),
        "graph.pagerank_adj",
    )  # (src, dst, degree): static across rounds
    checkpoint = None
    ranks = None
    for i in range(iters):
        if ranks is None:
            # round 1: every src's rank is the literal 1/n — same per-row
            # term (1/n)/degree in the same adj-partition fold order as
            # the joined form, so the sums are bit-identical
            contribs = adj.groupBy(F.col("dst").alias("node")).agg(
                F.sum(F.lit(1.0 / n) / F.col("degree")).alias("contrib")
            )
        else:
            contribs = (
                adj.join(ranks.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("pr") / F.col("degree")).alias("contrib"))
            )
        ranks = contribs.select(
            "node",
            (F.lit(base) + F.lit(damping) * F.col("contrib")).alias("pr"),
        )
        if (i + 1) % materialize_every == 0 and i + 1 < iters:
            ranks = ranks.persist()
            ranks.count()  # truncate recompute lineage at the cadence
            if checkpoint is not None:
                checkpoint.unpersist()
            checkpoint = ranks
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _PERSIST_SLOTS

    prev = _PERSIST_SLOTS.get(edges.sparkSession, {}).get("graph.pagerank")
    out = _persist_slot(ranks.select("node", "pr"), "graph.pagerank")
    if out is not prev:
        # fresh slot: materialize before dropping round checkpoints. On a
        # slot HIT (out is prev) the frame is already live — re-counting
        # it was one pure-overhead job per repeated call.
        out.count()
    if checkpoint is not None:
        checkpoint.unpersist()
    return out


def min_label_components(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Bounded-round min-label propagation: (node, component).

    Each round every node takes the minimum label among itself and its
    neighbors; after k rounds labels have propagated k hops. Fixed
    rounds keep the result deterministic and SQL-oracle-checkable; full
    convergence would loop until a round changes nothing (compare
    counts), with the same per-round plan."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    sym = symmetrize(edges).persist()  # one slim frame, referenced per round
    try:
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
        )
        checkpoint = None
        for i in range(iters):
            neighbor_min = (
                sym.join(labels.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.min("lbl").alias("nmin"))
            )
            labels = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))
                ).alias("lbl"),
            )
            # same checkpoint cadence as pagerank: lazy unrolled rounds,
            # lineage truncated every 4th round
            if (i + 1) % 4 == 0 and i + 1 < iters:
                labels = labels.persist()
                labels.count()
                if checkpoint is not None:
                    checkpoint.unpersist()
                checkpoint = labels
        out = _persist_slot(
            labels.select("node", F.col("lbl").alias("component")),
            "graph.components",
        )
        out.count()
        if checkpoint is not None:
            checkpoint.unpersist()
        return out
    finally:
        sym.unpersist()


def khop_hops(edges: DataFrame, seeds: DataFrame, iters: int = 3) -> DataFrame:
    """Minimum-hop distance from a seed set, bounded to ``iters`` hops:
    (node, hop) for every node reachable in at most ``iters`` hops over
    the undirected graph (seeds are hop 0). Bounded BFS as label
    propagation — each round one join + one aggregation, the same
    partitioning-reuse shape as pagerank/min_label_components, and the
    frontier table only ever holds REACHED nodes, so round cost tracks
    the expanding neighborhood, not the graph. Rounds unroll lazily
    (bounded iters keep the result deterministic and the oracle an
    unrolled CTE chain; a convergence loop would reuse the same round
    plan)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    sentinel = iters + 1
    sym = symmetrize(edges)
    labels = seeds.select("node").distinct().withColumn("hop", F.lit(0))
    for _ in range(iters):
        nmin = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("hop") + F.lit(1)).alias("nhop"))
        )
        labels = labels.join(nmin, "node", "full").select(
            "node",
            F.least(
                F.coalesce(F.col("hop"), F.lit(sentinel)),
                F.coalesce(F.col("nhop"), F.lit(sentinel)),
            ).alias("hop"),
        )
    out = _persist_slot(labels.select("node", "hop"), "graph.khop")
    out.count()
    return out


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Bounded-round synchronous label propagation (community
    detection): (node, lbl).

    Every node starts labeled with its own id; each round it adopts the
    most frequent label among its NEIGHBORS, ties broken toward the
    smallest label — fully deterministic synchronous updates, no
    residual randomness, so a SQL oracle can unroll the identical
    rounds. (Classic async LPA is order-dependent; the synchronous
    min-tie variant trades a little convergence speed for
    reproducibility, the house determinism contract.)

    Each round is one join on dst + one (node, lbl) count + one
    per-node argmax — all partitioned by node id, map-side-combinable,
    same reuse-the-partitioning shape as `pagerank`. Rounds unroll
    lazily into one plan (bounded iters; see pagerank's cadence note)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    sym = symmetrize(edges).persist()
    try:
        lbl = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
        )
        for _ in range(iters):
            votes = (
                sym.join(
                    lbl.select(F.col("node").alias("dst"), "lbl"), "dst"
                )
                .groupBy(F.col("src").alias("node"), "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            # winner per node: max count, then smallest label
            lbl = votes.groupBy("node").agg(
                F.max_by(
                    "lbl", F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))
                ).alias("lbl")
            )
        out = _persist_slot(lbl, "graph.lpa")
        out.count()
        return out
    finally:
        sym.unpersist()
