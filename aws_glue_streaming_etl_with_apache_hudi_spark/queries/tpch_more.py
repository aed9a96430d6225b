"""Additional TPC-H-shaped coverage (Q7/Q10/Q18 analogues adapted to the
fixture's columns/date range): multi-dim join with derived grouping, a
returned-items report, and the groupBy-HAVING-IN pattern over a fact
table. Revenue sums use the exact DECIMAL form throughout."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import dsum, register, t

_REV = "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4)"


@register(
    "q7_volume_shipping",
    sql=f"""
    SELECT supp_nation, cust_nation, l_year, {_REV} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
        AND n1.n_nationkey <> n2.n_nationkey
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by
    year. Scale: both nation joins broadcast; the fact-side joins shuffle
    once on orderkey; the year derivation is a scan-side projection."""
    s, li, o, c, n = (
        t(spark, sf_dir, x) for x in ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n1_key)
        .join(F.broadcast(n2), c.c_nationkey == n2.n2_key)
        .filter((F.col("n1_key") < 3) & (F.col("n2_key") < 3) & (F.col("n1_key") != F.col("n2_key")))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    sql=f"""
    SELECT c_custkey, c_name, {_REV} AS revenue, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top customers by returned-item revenue in a
    window. Scale: date filter pushes into the orders scan; nation
    broadcasts; deterministic LIMIT via (revenue DESC, custkey)."""
    c, o, li, n = (t(spark, sf_dir, x) for x in ("customer", "orders", "lineitem", "nation"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    sql="""
    SELECT c_custkey, o_orderkey,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (groupBy-HAVING feeding an IN/semi-join). The threshold compares
    exact decimals so membership is engine-identical. Scale: the HAVING
    aggregate reuses the lineitem shuffle; the IN becomes a semi-join."""
    c, o, li = (t(spark, sf_dir, x) for x in ("customer", "orders", "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "q11_important_stock",
    sql="""
    WITH supp_part AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    )
    SELECT partkey, round(val, 2) AS part_value
    FROM supp_part
    WHERE val > (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                        * 0.0005
                 FROM lineitem JOIN supplier ON l_suppkey = s_suppkey)
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose stock value exceeds a global-fraction
    threshold (aggregate + scalar subquery over the same join). Both the
    per-part and global sums are exact decimals cast to double, so the
    threshold comparison is engine-identical. Scale: ONE lazy plan — the
    global sum is a 1-row aggregate crossJoin-broadcast to the per-part
    rows (no mid-plan collect splitting the query into two jobs; the two
    aggregations over the same join reuse the shuffle via
    ReusedExchange/AQE)."""
    li, s = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "supplier")
    joined = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    per_part = joined.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("val")
    )
    total = joined.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("_tv")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("_tv") * 0.0005)
        .select("partkey", F.round("val", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS suppkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 4) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue (aggregate reused as both join input and max subquery —
    the classic 'view used twice' pattern). Exact decimal revenue makes
    the max-equality comparison safe. Scale: the max is a 1-row
    broadcast crossJoin, not a driver collect — one lazy plan, and the
    twice-used revenue subtree is shared via ReusedExchange instead of
    being rebuilt from scratch for the max."""
    li, s = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("total_rev")
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("_m"))
    top = (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("_m"))
        .drop("_m")
    )
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("suppkey"))
        .select("s_suppkey", "s_name", F.round("total_rev", 4).alias("total_rev"))
        .orderBy("s_suppkey")
    )
