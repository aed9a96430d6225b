"""Relational query surface (SURVEY.md §2 Part B): scans, filters, joins
(all types incl. broadcast/theta/as-of), aggregations (+cube/rollup/
grouping sets), windows, sorts, set ops, scalar function families.

Scale notes per query live in docstrings: what shuffles, what broadcasts,
what pushes down. All plans are declarative DataFrame/SQL — Catalyst owns
the physical strategy (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import davg, davg_sql, dsum, dsum_sql, register, t

# ---------------------------------------------------------------- aggregation


@register(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 2)}                                          AS sum_qty,
           {dsum_sql('l_extendedprice', 2)}                                     AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}                  AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}    AS sum_charge,
           {davg_sql('l_quantity', 2)}                                          AS avg_qty,
           {davg_sql('l_extendedprice', 2)}                                     AS avg_price,
           {davg_sql('l_discount', 2)}                                          AS avg_disc,
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (dates adapted to the 1995-2001 fixture range).

    Scale: single hash-aggregate with map-side partial aggregation over 6
    groups — shuffles 6 rows per input partition regardless of input size.
    The shipdate filter pushes into the parquet scan. Measures sum as
    exact decimals (base.dsum) so results are order-independent."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = "l_extendedprice * (1 - l_discount)"
    # avg_qty/avg_price are DERIVED post-agg from the exact decimal sums
    # already computed (davg(col, 2) ≡ round(dsum(col, 2)/count, 6) on
    # the same doubles — pure algebra, value-identical), so the one-task
    # scan stage evaluates 5 decimal aggregates instead of 7. On the
    # single-row-group sf0.1 fixture this stage is one core; every agg
    # column removed is wall time (r12 isolated: 0.47 -> ~0.38 s).
    # SQL-text construction: the dsum_sql/davg_sql oracle renderers are
    # ANSI expressions Spark parses to the exact trees dsum/davg built
    # Column-by-Column — one parser roundtrip per aggregate.
    return (
        li.filter("l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"{dsum_sql('l_quantity', 2)} AS sum_qty"),
            F.expr(f"{dsum_sql('l_extendedprice', 2)} AS sum_base_price"),
            F.expr(f"{dsum_sql(disc_price, 4)} AS sum_disc_price"),
            F.expr(f"{dsum_sql(f'({disc_price}) * (1 + l_tax)', 6)} AS sum_charge"),
            F.expr(f"{davg_sql('l_discount', 2)} AS avg_disc"),
            F.expr("count(*) AS count_order"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "round(sum_qty / count_order, 6) AS avg_qty",
            "round(sum_base_price / count_order, 6) AS avg_price",
            "avg_disc",
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    sql="""
    SELECT l_orderkey,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. Scale: customer (filtered on segment) broadcasts
    into orders; lineitem joins orders on the shuffle. Total order
    (revenue DESC, l_orderkey) makes the LIMIT deterministic."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    sql="""
    SELECT n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    headline=True,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. Scale: nation/region/supplier are tiny
    dims -> broadcast; only lineitem⋈orders⋈customer shuffle on keys.
    Catalyst reorders the join tree; AQE fixes misestimates at runtime."""
    cust, orders, li = (t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem"))
    supp, nation, region = (t(spark, sf_dir, n) for n in ("supplier", "nation", "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "filter_predicates",
    sql="""
    SELECT l_returnflag, count(*) AS n,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus <> 'X'
      AND (l_discount < 0.05 OR l_tax >= 0.04)
      AND l_shipdate IS NOT NULL
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def filter_predicates(spark, sf_dir):
    """Arbitrary-predicate filter (=, <>, BETWEEN, IN, AND/OR, IS NULL) —
    all convertible to parquet pushdown filters (verified in plan tests)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(5, 45)
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_linestatus") != "X")
            & ((F.col("l_discount") < 0.05) | (F.col("l_tax") >= 0.04))
            & F.col("l_shipdate").isNotNull()
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum(F.col("l_extendedprice"), 2).alias("total"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_distinct_having",
    sql="""
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(DISTINCT l_partkey) > 3
    ORDER BY l_suppkey
    """,
)
def agg_distinct_having(spark, sf_dir):
    """count_distinct + HAVING. Scale: two-phase distinct aggregation
    (expand on (suppkey, partkey), then count) handled by Catalyst."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("n_parts") > 3)
        .orderBy("l_suppkey")
    )


@register(
    "agg_cube",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE grouping sets (2^2 groupings in one pass via Expand)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "agg_rollup",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_extendedprice"), 2).alias("total"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "agg_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "agg_collect_sorted",
    sql="""
    SELECT l_suppkey,
           array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags,
           count(*) AS n
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect_set made deterministic: sort + join to a string."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias("flags"),
            F.count("*").alias("n"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "agg_stats",
    sql="""
    SELECT o_orderstatus,
           round(min(o_totalprice), 2) AS min_p, round(max(o_totalprice), 2) AS max_p,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_p,
           round(sqrt((CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                        - pow(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) / count(*))
                      / (count(*) - 1)), 2) AS std_p,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_stats(spark, sf_dir):
    """min/max/avg/stddev. stddev via the explicit sum-of-squares formula
    over exact decimal sums so both engines compute identical doubles
    (streaming variance accumulation is summation-order-dependent)."""
    o = t(spark, sf_dir, "orders")
    s1 = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    s2 = F.sum((F.col("o_totalprice") * F.col("o_totalprice")).cast("decimal(28,4)")).cast("double")
    n = F.count(F.lit(1))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("min_p"),
            F.round(F.max("o_totalprice"), 2).alias("max_p"),
            F.round(s1 / n, 6).alias("avg_p"),
            F.round(F.sqrt((s2 - F.pow(s1, 2) / n) / (n - 1)), 2).alias("std_p"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_pivot",
    sql="""
    SELECT l_returnflag,
           round(CAST(sum(CASE WHEN l_linestatus = 'O'
                               THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE), 2) AS qty_O,
           round(CAST(sum(CASE WHEN l_linestatus = 'F'
                               THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot with explicit values (no extra distinct-scan pass); oracle is
    the equivalent conditional aggregation."""
    li = t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity"), 2))
        .orderBy("l_returnflag")
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
    )


# --------------------------------------------------------------------- joins


@register(
    "join_inner_revenue",
    headline=True,
    sql="""
    SELECT o_orderpriority,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_inner_revenue(spark, sf_dir):
    """Plain equi inner join. Scale: both sides shuffle on orderkey
    (sort-merge) unless one side is small enough for AQE to broadcast."""
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_left_outer",
    sql="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE), 2) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)).cast("double"),
                2,
            ).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    sql="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE), 2) AS spend
    FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER join (§2 joins row: left/right/full). Semantically the
    mirror of join_left_outer — Catalyst plans both as the same outer
    hash join with sides swapped — declared so the right-join API
    surface is exercised and oracle-checked in its own right."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)).cast("double"),
                2,
            ).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    sql="""
    WITH a AS (SELECT o_custkey AS k, count(*) AS n95 FROM orders
               WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
         b AS (SELECT o_custkey AS k, count(*) AS n00 FROM orders
               WHERE year(o_orderdate) = 2000 GROUP BY o_custkey)
    SELECT coalesce(a.k, b.k) AS custkey,
           coalesce(n95, 0) AS n95, coalesce(n00, 0) AS n00
    FROM a FULL OUTER JOIN b ON a.k = b.k
    ORDER BY custkey
    """,
)
def join_full_outer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n95"))
    )
    b = (
        o.filter(F.year("o_orderdate") == 2000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n00"))
    )
    return (
        a.join(b, a.k == b.k, "full")
        .select(
            F.coalesce(a.k, b.k).alias("custkey"),
            F.coalesce("n95", F.lit(0)).alias("n95"),
            F.coalesce("n00", F.lit(0)).alias("n00"),
        )
        .orderBy("custkey")
    )


@register(
    "join_semi",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def join_semi(spark, sf_dir):
    """LEFT SEMI = EXISTS. Scale: semi joins shuffle only the distinct keys
    of the right side; no row multiplication."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(o.filter(F.col("o_orderstatus") == "F"), c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    sql="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
    ORDER BY c_custkey
    """,
)
def join_anti(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(
            o.filter(F.year("o_orderdate") == 1995), c.c_custkey == o.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    sql="""
    SELECT r_name, s.o_orderstatus, count(*) AS n_pairs
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r_name, s.o_orderstatus
    ORDER BY r_name, s.o_orderstatus
    """,
)
def join_cross(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        r.crossJoin(s)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("r_name", "o_orderstatus")
    )


@register(
    "join_broadcast_dim",
    sql="""
    SELECT n_name, count(*) AS n_cust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_broadcast_dim(spark, sf_dir):
    """Explicit broadcast of the 25-row nation dim: zero shuffle for the
    join (the fact side streams through map-side). The canonical 100 TB
    pattern for star-schema dims."""
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"), dsum(F.col("c_acctbal"), 2).alias("total_bal"))
        .orderBy("n_name")
    )


@register(
    "join_theta_range",
    sql="""
    SELECT o_orderpriority, count(*) AS n_shipped_90d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_theta_range(spark, sf_dir):
    """Equi key + range predicate (theta). Scale: the equi component keeps
    this a hash/sort-merge join; the range residual filters post-match —
    never a cartesian."""
    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_shipped_90d"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------------------- windows


@register(
    "window_topk_per_group",
    sql="""
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) x
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
    headline=True,
)
def window_topk_per_group(spark, sf_dir):
    """Per-group top-k: the row_number window pattern. Scale: one shuffle
    on the partition key; with AQE, skewed groups split. For huge k-groups
    prefer pre-aggregation (not needed here)."""
    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@register(
    "window_running_sum",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_lead",
    sql="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev,
           CAST(year(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey)) AS BIGINT)
             AS next_order_year
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
                "days_since_prev"
            ),
            F.year(F.lead("o_orderdate").over(w)).cast("long").alias("next_order_year"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_rank_ntile",
    sql="""
    SELECT c_custkey,
           rank()       OVER (ORDER BY round(c_acctbal, 2) DESC, c_custkey) AS rnk,
           dense_rank() OVER (ORDER BY c_mktsegment) AS seg_rank,
           ntile(4)     OVER (ORDER BY round(c_acctbal, 2) DESC, c_custkey) AS quartile
    FROM customer
    ORDER BY c_custkey
    """,
)
def window_rank_ntile(spark, sf_dir):
    """Global-order windows (single-partition window: fine at dim-table
    size; at fact-table scale use range-partitioned sort instead)."""
    c = t(spark, sf_dir, "customer")
    w_bal = W.orderBy(F.desc(F.round(F.col("c_acctbal"), 2)), F.asc("c_custkey"))
    w_seg = W.orderBy("c_mktsegment")
    return (
        c.select(
            "c_custkey",
            F.rank().over(w_bal).alias("rnk"),
            F.dense_rank().over(w_seg).alias("seg_rank"),
            F.ntile(4).over(w_bal).alias("quartile"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------- sort / limit / set


@register(
    "topk_orders",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderstatus
    FROM orders
    ORDER BY price DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    """Global top-k. Scale: Spark's sort+limit plans as TakeOrderedAndProject
    — each partition keeps k rows, driver merges k·p rows; never a full sort."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_orderstatus")
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "set_union_distinct",
    sql="""
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ) ORDER BY k
    """,
)
def set_union_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.union(b).distinct().orderBy("k")


@register(
    "set_intersect",
    sql="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
    ORDER BY k
    """,
)
def set_intersect(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return a.intersect(b).orderBy("k")


@register(
    "set_except",
    sql="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) >= 1999
    ORDER BY k
    """,
)
def set_except(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    a = c.select(F.col("c_custkey").alias("k"))
    b = o.filter(F.year("o_orderdate") >= 1999).select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b).distinct().orderBy("k")


# ---------------------------------------------------------------- scalar fns


@register(
    "scalar_string_funcs",
    sql="""
    SELECT p_partkey,
           upper(p_brand)                                    AS brand_u,
           substring(p_name, 1, 8)                           AS name_head,
           CAST(length(p_name) AS INTEGER)                   AS name_len,
           concat(p_type, '/', p_brand)                      AS type_brand,
           replace(p_brand, 'Brand#', 'B')                   AS brand_short,
           regexp_extract(p_brand, '[0-9]+', 0)              AS brand_num,
           (p_name LIKE '%a%')                               AS has_a,
           trim('  ' || p_brand || ' ')                      AS trimmed
    FROM part ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name_head"),
            F.length("p_name").cast("int").alias("name_len"),
            F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
            F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
            F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
            F.col("p_name").like("%a%").alias("has_a"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_date_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)    AS y,
           CAST(month(o_orderdate) AS BIGINT)   AS m,
           CAST(day(o_orderdate) AS BIGINT)     AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS plus30,
           date_diff('day', o_orderdate, TIMESTAMP '2001-12-31 00:00:00') AS days_to_eoy
    FROM orders ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
            F.dayofmonth("o_orderdate").cast("long").alias("d"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd").alias("plus30"),
            F.datediff(F.lit("2001-12-31").cast("timestamp"), F.col("o_orderdate")).alias("days_to_eoy"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scalar_math_cond",
    sql="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4)        AS net,
           CAST(floor(l_quantity) AS BIGINT)                   AS qty_floor,
           CAST(ceil(l_quantity / 10.0) AS BIGINT)             AS qty_decile,
           round(abs(l_discount - 0.05), 4)                    AS disc_dev,
           round(pow(l_tax + 1.0, 2), 6)                       AS tax_sq,
           round(sqrt(l_extendedprice), 4)                     AS price_root,
           CASE WHEN l_quantity >= 25 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS size_class,
           coalesce(nullif(l_returnflag, 'N'), 'none')         AS flag_or_none
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_cond(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            # round at the product's intrinsic 4dp (2dp x 2dp) — rounding
            # BELOW intrinsic precision is the cross-engine hazard
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
            F.floor("l_quantity").cast("long").alias("qty_floor"),
            F.ceil(F.col("l_quantity") / 10.0).cast("long").alias("qty_decile"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.round(F.pow(F.col("l_tax") + 1.0, 2), 6).alias("tax_sq"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_root"),
            F.when(F.col("l_quantity") >= 25, "bulk")
            .when(F.col("l_quantity") >= 10, "mid")
            .otherwise("small")
            .alias("size_class"),
            F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "json_extract_props",
    sql="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_extract_props(spark, sf_dir):
    """JSON payload extraction (the reference ingests raw JSON —
    Glue_StreamingJob_Hudi_Template.yaml:102-104)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).cast("long").alias("k_total"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "regression_price_quantity",
    sql="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx2,
             CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * sx) / n, 6)
             AS intercept,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6) AS corr
    FROM m ORDER BY l_returnflag
    """,
)
def regression_price_quantity(spark, sf_dir):
    """Distributed least-squares + correlation from exact decimal moment
    sums (sum x, y, xy, x2, y2): one map-side-combinable aggregation,
    then closed-form doubles. Spark's corr()/regr_slope() stream floats
    whose accumulation order varies run to run; moments as DECIMAL are
    exact and order-free, so both engines derive bit-identical results —
    the numerically-robust way to do regression over 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    sy = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
    sxy = F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(28,4)")).cast("double")
    sx2 = F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,4)")).cast("double")
    sy2 = F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(28,4)")).cast("double")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        sx.alias("sx"), sy.alias("sy"), sxy.alias("sxy"),
        sx2.alias("sx2"), sy2.alias("sy2"),
    )
    N, SX, SY = F.col("n").cast("double"), F.col("sx"), F.col("sy")
    slope = (N * F.col("sxy") - SX * SY) / (N * F.col("sx2") - SX * SX)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((SY - slope * SX) / N, 6).alias("intercept"),
        F.round(
            (N * F.col("sxy") - SX * SY)
            / (F.sqrt(N * F.col("sx2") - SX * SX) * F.sqrt(N * F.col("sy2") - SY * SY)),
            6,
        ).alias("corr"),
    ).orderBy("l_returnflag")


@register(
    "calendar_gap_fill",
    sql=f"""
    WITH days AS (
      SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ),
    c AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n,
             {dsum_sql('value', 2)} AS total
      FROM events GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           coalesce(n, 0) AS n,
           coalesce(total, 0.0) AS total
    FROM days LEFT JOIN c USING (day) ORDER BY day
    """,
)
def calendar_gap_fill(spark, sf_dir):
    """Time-series gap fill: generate the full calendar spine
    (F.sequence + explode — no source scan), left-join daily event
    aggregates, zero-fill missing days. The spine side is rows=days
    (tiny, broadcast); the aggregate side shuffles 1 row per day. The
    standard way to make window/trend math safe on sparse data."""
    e = t(spark, sf_dir, "events")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    c = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total")
    )
    return (
        days.join(c, on="day", how="left")
        .select(
            F.col("day").cast("string").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
        )
        .orderBy("day")
    )


@register(
    "fuzzy_match_levenshtein",
    sql="""
    SELECT a.p_brand,
           levenshtein(a.p_name, b.p_name) AS dist,
           count(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    GROUP BY 1, 2 ORDER BY a.p_brand, dist
    """,
)
def fuzzy_match_levenshtein(spark, sf_dir):
    """Blocked fuzzy self-match: candidate pairs come from an equi-join
    on the blocking key (brand) — never a full cross product — then
    edit distance filters within the block. The standard entity-
    resolution shape; the blocking key is what makes it survive scale
    (pairs grow with block size squared, not table size squared).
    Levenshtein is integer-exact in both engines."""
    part = t(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("ak"),
        F.col("p_brand").alias("p_brand"),
        F.col("p_name").alias("an"),
    )
    b = part.select(
        F.col("p_partkey").alias("bk"),
        F.col("p_brand").alias("bb"),
        F.col("p_name").alias("bn"),
    )
    return (
        a.join(b, (F.col("p_brand") == F.col("bb")) & (F.col("ak") < F.col("bk")))
        .withColumn("dist", F.levenshtein(F.col("an"), F.col("bn")))
        .filter(F.col("dist") <= 3)
        .groupBy("p_brand", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("p_brand", "dist")
    )
