"""Remaining TPC-H query shapes (Q2/Q4/Q6/Q8/Q9/Q13/Q14/Q16/Q17/Q19/Q21/Q22
analogues), adapted to the fixture schema: no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, no p_container/p_mfgr, no c_phone.
Each adaptation keeps the ORIGINAL query's structural pattern (correlated
min subquery, EXISTS/NOT EXISTS double correlation, disjunctive pushdown,
outer-join count distribution, anti-join + scalar threshold) on the
columns that exist, so the optimizer-facing shape is faithful even where
the business predicate is synthetic.

Determinism: money sums use the exact-DECIMAL pattern (`base.dsum`);
ratios divide identical exact-sum doubles in both engines and are
emitted UNROUNDED (IEEE division of identical inputs is identical;
rounding the quotient is the cross-engine hazard — ROUND_NOTES.md rule 2/3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import dsum, dsum_sql, register, t

_VOL = "l_extendedprice * (1 - l_discount)"


@register(
    "q2_min_cost_supplier",
    sql="""
    SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, min_price
    FROM lineitem
    JOIN (SELECT l_partkey AS mp_partkey, min(l_extendedprice) AS min_price
          FROM lineitem GROUP BY l_partkey) mp
      ON l_partkey = mp_partkey AND l_extendedprice = min_price
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
    ORDER BY p_partkey, s_suppkey
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each part in a slice, the supplier(s) offering
    the minimum price (correlated-min subquery -> groupBy + equality
    join; reference has no joins at all — this is declared surface,
    SURVEY.md §2B). min() selects an existing double, so the equality
    re-join is engine-exact. Scale: the part slice broadcasts, the
    min-per-part aggregate reuses lineitem's partkey shuffle, DISTINCT
    folds into the final exchange."""
    li, p, s = (t(spark, sf_dir, x) for x in ("lineitem", "part", "supplier"))
    slice_p = p.filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    li2 = li.join(F.broadcast(slice_p), li.l_partkey == slice_p.p_partkey)
    minp = li2.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li2.join(
            minp,
            (li2.l_partkey == minp.mp_partkey) & (li2.l_extendedprice == minp.min_price),
        )
        .join(F.broadcast(s), li2.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "min_price")
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority counts over orders with a correlated
    EXISTS on lineitem (late-shipment proxy: shipdate after orderdate —
    fixture has no commit/receipt dates). EXISTS -> left-semi join with a
    non-equi residual. Scale: the date filter prunes orders before the
    shuffle; the semi join keeps only orderkey columns moving."""
    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    return (
        o_f.join(
            li,
            (o_f.o_orderkey == li.l_orderkey) & (li.l_shipdate > o_f.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    sql=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    headline=True,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-side revenue forecast — every predicate is a
    parquet-pushable range filter and the agg is a single global exact
    sum. Scale: zero shuffles beyond the final partial-agg gather; the
    plan should show PushedFilters on shipdate/discount/quantity."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))


@register(
    "q8_market_share",
    sql=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_7'
                         THEN CAST({_VOL} AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / {dsum_sql(_VOL, 4)} AS mkt_share
    FROM (SELECT year(o_orderdate) AS o_year,
                 l_extendedprice, l_discount, n_name AS nation
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of total supplier revenue by
    order year. Numerator and denominator are exact decimal sums cast to
    double; their IEEE quotient is engine-identical, so the share is
    emitted unrounded. Scale: nation/supplier broadcast; one orderkey
    shuffle; conditional agg avoids a second pass."""
    li, o, s, n = (t(spark, sf_dir, x) for x in ("lineitem", "orders", "supplier", "nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("n_name") == "NATION_7", vol).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    sql="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.25
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    headline=True,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name slice (supply cost synthesized as retailprice*qty*0.25 —
    no partsupp in the fixture; 0.25 is binary-exact so the expression
    stays 4-dp intrinsic and the decimal cast is an identity round).
    Scale: part filter broadcasts; the 5-way join shuffles lineitem once
    on orderkey; nation/supplier stay broadcast."""
    li, p, s, o, n = (
        t(spark, sf_dir, x) for x in ("lineitem", "part", "supplier", "orders", "nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.25)
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p.filter(F.col("p_name").like("%gear%"))), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of orders-per-customer, with the filter
    inside the outer-join condition (zero-order customers must survive).
    Pure counts — engine-exact. Scale: both aggregations are key-local
    after the one custkey shuffle; AQE coalesces the tiny second agg."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_effect",
    sql=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                 THEN CAST({_VOL} AS DECIMAL(18,4))
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / {dsum_sql(_VOL, 4)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: promo revenue share in one month — conditional
    aggregate ratio in a single pass. Both sums are exact decimals; the
    scaled quotient is emitted unrounded (identical doubles both sides).
    Scale: part broadcasts; the month filter pushes into the scan."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q16_supplier_cnt",
    sql="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per part group, excluding a
    supplier denylist (NOT IN -> anti join; lineitem stands in for
    partsupp). Scale: denylist and part slice both broadcast; the
    count-distinct expands to a two-phase agg on the same shuffle."""
    li, p, s = (t(spark, sf_dir, x) for x in ("lineitem", "part", "supplier"))
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    slice_p = p.filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(slice_p), F.col("l_partkey") == slice_p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_qty_revenue",
    sql="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders — correlated avg
    subquery -> per-part aggregate re-joined to the fact. Quantities are
    small integers, so the double avg is exact and the 0.2x threshold is
    engine-identical; the /7.0 quotient is emitted unrounded. Scale: the
    brand slice broadcasts twice (fact filter + avg input); the avg
    reuses the partkey shuffle."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    brand = p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li_b = li.join(F.broadcast(brand), li.l_partkey == F.col("p_partkey"))
    # correlated avg over ALL lineitems of each part; partkey -> brand is
    # functional, so restricting to the brand slice is equivalent
    avgq = li_b.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_b.join(
            avgq,
            (li_b.l_partkey == avgq.aq_partkey)
            & (li_b.l_quantity < F.lit(0.2) * avgq.avg_qty),
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q19_disjunctive",
    sql=f"""
    SELECT {dsum_sql(_VOL, 4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    headline=True,
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19: disjunctive mixed-table predicate over a broadcast
    join. Catalyst extracts the common part-side disjunction
    (brand IN (...) AND size <= 15) below the join — the scan should
    show pushed filters even though the full predicate straddles both
    tables. Single exact-sum output row."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
    )


@register(
    "q21_waiting_supplier",
    sql="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely responsible for returns in
    multi-supplier finished orders — the classic EXISTS + NOT-EXISTS
    double correlation (return flag stands in for the fixture's missing
    receipt/commit dates). EXISTS -> left-semi, NOT EXISTS -> left-anti,
    both with non-equi residuals on the self-joined fact. Scale: all
    three lineitem branches share one orderkey shuffle; supplier
    broadcasts; counts are engine-exact."""
    s, li, o = (t(spark, sf_dir, x) for x in ("supplier", "lineitem", "orders"))
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .alias("l1")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    only_r = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        only_r.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q22_dormant_customers",
    sql="""
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
          FROM customer
          WHERE c_nationkey IN (1, 5, 8, 12, 17, 20, 23)
            AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                    / count(*)
                             FROM customer
                             WHERE c_acctbal > 0.0
                               AND c_nationkey IN (1, 5, 8, 12, 17, 20, 23))) cust
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: wealthy customers with no RECENT orders, grouped
    by country (nationkey stands in for the fixture's missing phone
    prefix; "no orders since 2001-01-01" replaces "never ordered" —
    every fixture customer has ordered at least once, which would make
    the classic anti-join vacuously empty and the oracle check trivial).
    Scalar avg threshold + NOT EXISTS -> anti join. The threshold is an
    exact-decimal sum divided by a count — identical doubles both sides,
    so the > comparison is engine-exact. Scale: the scalar is a 1-row
    aggregate crossJoin-broadcast into the filter (single lazy plan, no
    driver round-trip); the anti join shuffles only custkeys."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    codes = [1, 5, 8, 12, 17, 20, 23]
    in_codes = c.filter(F.col("c_nationkey").isin(codes))
    thr = in_codes.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_thr")
    )
    return (
        in_codes.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_thr"))
        .drop("_thr")
        .join(
            o.filter(
                F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q12_ship_priority",
    sql="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_ship_priority(spark, sf_dir):
    """TPC-H Q12 shape: priority-class line counts by line status
    (linestatus stands in for the fixture's missing shipmode). Pivoted
    conditional counts in one pass — engine-exact integers. Scale: the
    shipdate filter pushes into the lineitem scan before the orderkey
    shuffle; both CASE sums share one aggregation."""
    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q20_excess_suppliers",
    sql="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
    ORDER BY s_suppkey
    """,
)
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped excess volume of a part
    slice in a year — IN over a grouped-HAVING subquery -> aggregate +
    left-semi join (shipped quantity stands in for the fixture's missing
    partsupp availability). The HAVING threshold compares exact decimals.
    Scale: the part slice broadcasts; the HAVING agg shuffles only
    (suppkey, qty); the final semi join broadcasts the small key set."""
    s, li, p = (t(spark, sf_dir, x) for x in ("supplier", "lineitem", "part"))
    keys = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(
            F.broadcast(p.filter(F.col("p_name").like("small%")).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(keys), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
