"""Graph operators (operators/graph.py): degrees, triangles, PageRank,
min-label components — verified on hand-built graphs with known answers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_degrees_and_symmetrize(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    deg = {r.node: r.degree for r in G.degrees(e).collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}
    assert G.symmetrize(e).count() == 8


def test_triangle_count_k4(spark):
    # K4 has C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    row = G.triangle_count(_edges(spark, k4)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangle_count_no_triangle(spark):
    row = G.triangle_count(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0]
    assert row.n_triangles == 0


def test_pagerank_mass_conserved_and_symmetric(spark):
    """Undirected graph: total rank mass stays 1; symmetric nodes get
    identical ranks; higher-degree hub outranks leaves."""
    star_plus = [(1, 2), (1, 3), (1, 4), (2, 3)]
    pr = {r.node: r.pr for r in G.pagerank(_edges(spark, star_plus), iters=5).collect()}
    assert math.isclose(sum(pr.values()), 1.0, rel_tol=1e-9)
    assert math.isclose(pr[2], pr[3], rel_tol=1e-12)  # symmetric pair
    assert pr[1] > pr[4]  # hub beats leaf


def test_pagerank_two_cliques_uniform_within(spark):
    tri1 = [(1, 2), (1, 3), (2, 3)]
    tri2 = [(4, 5), (4, 6), (5, 6)]
    pr = {r.node: r.pr for r in G.pagerank(_edges(spark, tri1 + tri2), iters=3).collect()}
    vals = set(round(v, 12) for v in pr.values())
    assert vals == {round(1.0 / 6, 12)}  # regular graph -> uniform rank


def test_min_label_components_two_islands(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)])
    comp = {r.node: r.component for r in G.min_label_components(e, iters=4).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_min_label_components_bounded_rounds_propagate_k_hops(spark):
    # a path graph 1-2-3-4-5-6: after 2 rounds node 6 has seen label from
    # 2 hops away (label 4 at best via min chain), after 5 rounds label 1
    chain = [(i, i + 1) for i in range(1, 6)]
    one_round = {
        r.node: r.component
        for r in G.min_label_components(_edges(spark, chain), iters=1).collect()
    }
    assert one_round[6] == 5  # only the direct neighbor's label
    full = {
        r.node: r.component
        for r in G.min_label_components(_edges(spark, chain), iters=5).collect()
    }
    assert set(full.values()) == {1}


def test_copurchase_edges_support_threshold(spark):
    li = spark.createDataFrame(
        [
            (1, 10), (1, 20),          # order 1: pair (10,20)
            (2, 10), (2, 20),          # order 2: pair (10,20) again
            (3, 10), (3, 30),          # order 3: pair (10,30) only once
        ],
        "l_orderkey long, l_partkey long",
    )
    got = {(r.u, r.v) for r in G.copurchase_edges(li, min_support=2).collect()}
    assert got == {(10, 20)}


def test_graph_plans_have_no_cartesian(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20)], "l_orderkey long, l_partkey long"
    )
    edges = G.copurchase_edges(li)
    for df in (G.triangle_count(edges), G.pagerank(edges, iters=1)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_graph_query_edges_served_from_persist_slot(spark, sf_dir):
    """The shared edge list must serve repeat consumers from the session
    persist slot (InMemoryTableScan), not re-run the orderkey self-join
    per branch (plan audit: 4 FileScan executions without the slot)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

    df = QUERIES["graph_degree_histogram"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_khop_hops_path_graph(spark):
    # path 1-2-3-4-5-6, seed {1}: hops are positional, bounded at 3
    path = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in G.khop_hops(_edges(spark, path), seeds, iters=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 and 6 unreachable in 3 hops


def test_khop_hops_multi_seed_min(spark):
    # seeds at both ends of a path: middle node takes the nearer seed
    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {r.node: r.hop for r in G.khop_hops(_edges(spark, path), seeds, iters=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


# -- r13 optimization: lineage-truncated adjacency + lean round loop --------


def test_truncated_slot_reuses_and_evicts(spark):
    """_truncated_slot contract: same source plan -> the SAME checkpointed
    frame (no rebuild); a different source -> a fresh checkpoint; the
    returned frame's lineage is truncated to a LogicalRDD scan."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import (
        _truncated_slot,
        clear_persist_slots,
    )

    df = spark.range(10).selectExpr("id", "id * 2 AS x")
    a = _truncated_slot(df, "test.trunc")
    assert a.collect() == df.collect()
    # truncated lineage: the plan is an RDD scan, not the range+project
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan and "Range" not in plan
    # same source plan (fresh DataFrame object) -> same checkpoint object
    df2 = spark.range(10).selectExpr("id", "id * 2 AS x")
    assert _truncated_slot(df2, "test.trunc") is a
    # different source -> evict + fresh checkpoint
    other = spark.range(5).selectExpr("id", "id * 3 AS x")
    b = _truncated_slot(other, "test.trunc")
    assert b is not a and b.count() == 5
    # section-boundary hygiene drops truncated slots too
    clear_persist_slots(spark)
    c = _truncated_slot(spark.range(5).selectExpr("id", "id * 3 AS x"), "test.trunc")
    assert c is not b


def test_pagerank_matches_explicit_joined_formulation(spark):
    """The r13 round-loop simplification (fold 1/n into round 1's
    aggregate; drop the deg LEFT JOIN + coalesce) must be an identity:
    nodes are defined BY edges, so contribs always covers the full node
    set. Pin equality against the explicit joined formulation."""
    from pyspark.sql import functions as F

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6)]
    edges = _edges(spark, pairs)
    got = {r.node: r.pr for r in G.pagerank(edges, iters=3, damping=0.85).collect()}

    # reference: the pre-r13 formulation, verbatim
    deg = G.degrees(edges)
    n = deg.count()
    base = (1.0 - 0.85) / n
    adj = G.symmetrize(edges).join(deg.withColumnRenamed("node", "src"), "src")
    ranks = deg.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(3):
        contribs = (
            adj.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("degree")).alias("contrib"))
        )
        ranks = deg.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
        )
    want = {r.node: r.pr for r in ranks.collect()}
    assert set(got) == set(want)
    for node in want:
        assert math.isclose(got[node], want[node], rel_tol=1e-12), node


def test_pagerank_repeat_calls_bound_checkpoint_storage(spark, sf_dir):
    """Repeated pagerank calls on the same edge list must not accumulate
    checkpoint/persist storage: the truncated adj slot reuses one live
    checkpoint per session (sameResult hit), like every persist slot."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    QUERIES["graph_pagerank_3rounds"].fn(spark, sf_dir).count()
    base = n_persistent()
    for _ in range(3):
        QUERIES["graph_pagerank_3rounds"].fn(spark, sf_dir).count()
    assert n_persistent() <= base


def test_min_label_components_matches_explicit_leftjoin_formulation(spark):
    """The r13 self-loop fold — min over {v} ∪ N(v) as ONE aggregate —
    must be an identity vs the explicit least(lbl, coalesce(min-over-
    neighbors, lbl)) left-join rounds (integer min; every node appears
    via its self-loop, so no row is lost). Exact equality, per round
    count."""
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21)]
    edges = _edges(spark, pairs)
    for iters in (1, 2, 4):
        got = {
            r.node: r.component
            for r in G.min_label_components(edges, iters=iters).collect()
        }
        # reference: the pre-r13 formulation, verbatim
        sym = G.symmetrize(edges)
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
        )
        for _ in range(iters):
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
        want = {r.node: r.lbl for r in labels.collect()}
        assert got == want, iters


def test_khop_hops_matches_explicit_fulljoin_formulation(spark):
    """The r13 weighted self-loop fold — min(hop + w) GROUP BY dst —
    must be an identity vs the explicit FULL JOIN + least/coalesce
    rounds: the w=0 self-loop keeps a reached node's own hop, edges
    carry neighbor hop + 1. Exact equality, per round count."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)]
    edges = _edges(spark, pairs)
    seeds = spark.createDataFrame([(1,), (7,)], "node long")
    for iters in (1, 2, 3):
        got = {
            r.node: r.hop
            for r in G.khop_hops(edges, seeds, iters=iters).collect()
        }
        # reference: the pre-r13 formulation, verbatim
        sentinel = iters + 1
        sym = G.symmetrize(edges)
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
        want = {r.node: r.hop for r in labels.collect()}
        assert got == want, iters


def test_components_khop_repeat_calls_bound_storage(spark, sf_dir):
    """Repeated components/khop/LPA calls reuse the shared self-loop
    adjacency checkpoint and their result slots: no persistent-RDD
    growth across calls (slot hit also skips the materialize count)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    names = (
        "graph_components_4rounds",
        "graph_khop_reachability",
        "graph_label_propagation",
    )
    for name in names:
        QUERIES[name].fn(spark, sf_dir).count()
    base = n_persistent()
    for name in names:
        QUERIES[name].fn(spark, sf_dir).count()
    assert n_persistent() <= base
