"""Second-wave relational surface: subqueries (IN / scalar / correlated),
exact percentiles, unpivot, word-count explode, RANGE window frames,
boolean/bitwise aggregates, date-part extraction, approximate aggregates,
and a shared-dialect SQL passthrough (one SQL string executed verbatim by
BOTH Spark SQL and the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t


@register(
    "percentiles_exact",
    sql="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: both sort and linearly interpolate —
    identical doubles from identical inputs). At 100 TB prefer
    ``percentile_approx`` (see approx_aggregates); exact percentile
    requires a per-group sort."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "subquery_in",
    sql="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_orderstatus = 'O'
    ORDER BY o_orderkey
    """,
)
def subquery_in(spark, sf_dir):
    """IN-subquery via Spark SQL (plans as a left-semi join)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_orderstatus = 'O'
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_scalar",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                             / count(*), 6) FROM orders)
    ORDER BY o_orderkey
    """,
)
def subquery_scalar(spark, sf_dir):
    """Scalar subquery threshold. The subquery's average uses the exact
    decimal-sum form so both engines compare against the identical
    double (a float avg would move boundary rows between engines)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                                 / count(*), 6) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_correlated",
    sql="""
    SELECT c_custkey FROM customer c
    WHERE (SELECT count(*) FROM orders o
           WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 2000)
        > (SELECT count(*) FROM orders o
           WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)
    ORDER BY c_custkey
    """,
)
def subquery_correlated(spark, sf_dir):
    """Correlated scalar subqueries (integer compare — engine-neutral).
    Catalyst decorrelates these into aggregated joins."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE (SELECT count(*) FROM orders o
               WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 2000)
            > (SELECT count(*) FROM orders o
               WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)
        ORDER BY c_custkey
        """
    )


@register(
    "unpivot_measures",
    sql="""
    SELECT measure, round(CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    ) GROUP BY measure ORDER BY measure
    """,
)
def unpivot_measures(spark, sf_dir):
    """Unpivot (wide -> long) via ``stack`` — one pass, no union of
    scans (the oracle's UNION ALL form is the semantic spec; Spark's
    stack reads the table once)."""
    li = t(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
            " AS (measure, val)"
        )
    )
    return (
        long.groupBy("measure")
        .agg(F.round(F.sum(F.col("val").cast("decimal(18,2)")).cast("double"), 2).alias("total"))
        .orderBy("measure")
    )


@register(
    "explode_wordcount",
    sql="""
    SELECT w, count(*) AS n FROM (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents
    ) WHERE w <> ''
    GROUP BY w ORDER BY n DESC, w LIMIT 20
    """,
)
def explode_wordcount(spark, sf_dir):
    """The canonical explode+count. Scale: explode stays pipelined into a
    partial aggregation — the shuffle carries (word, partial_count), not
    raw words-per-row."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(20)
    )


@register(
    "window_range_frame",
    sql="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders ORDER BY o_orderkey
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over a value column (count of same-customer orders
    within $100 below this one) — value-based frames are insensitive to
    tie order, so the result is deterministic."""
    o = t(spark, sf_dir, "orders")
    # float RANGE bounds need the SQL frame syntax (the Python
    # rangeBetween API only accepts integral offsets)
    return o.selectExpr(
        "o_orderkey",
        "o_custkey",
        "count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice"
        " RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_similar",
    ).orderBy("o_orderkey")


@register(
    "agg_bool_bit",
    sql="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)                 AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT')         AS any_urgent,
           bit_and(o_custkey)                            AS key_and,
           bit_or(o_custkey)                             AS key_or,
           bit_xor(o_custkey)                            AS key_xor
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bool_bit(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bit_and("o_custkey").alias("key_and"),
            F.bit_or("o_custkey").alias("key_or"),
            F.bit_xor("o_custkey").alias("key_xor"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "date_parts",
    sql="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT)    AS q,
           CAST(dayofweek(o_orderdate) AS BIGINT)  AS dow,
           CAST(dayofyear(o_orderdate) AS BIGINT)  AS doy,
           CAST(hour(o_orderdate) AS BIGINT)       AS hr
    FROM orders ORDER BY o_orderkey
    """,
)
def date_parts(spark, sf_dir):
    """Date-part extraction. Day-of-week conventions differ (Spark:
    Sunday=1; DuckDB: Sunday=0) — normalized to DuckDB's numbering."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.hour("o_orderdate").cast("long").alias("hr"),
    ).orderBy("o_orderkey")


@register(
    "approx_aggregates",
    sql="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS direct_within_5pct,
           TRUE AS merged_within_5pct,
           TRUE AS merge_close_to_direct,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_aggregates(spark, sf_dir):
    """Sketch-based aggregates — the 100 TB substitutes for exact
    count-distinct (bounded memory, one pass, MERGEABLE partials).
    Raw HLL estimates are engine-specific, so the oracled columns are
    the deterministic properties instead (VERDICT r7 #6 — this retires
    the registry's last rows-only entry): per group, (1) the one-pass
    sketch estimate is within 5% of exact, (2) the estimate built by
    UNIONING per-linestatus partial sketches (``hll_sketch_agg`` →
    ``hll_union_agg``, the map-side-combine shape a 1000-executor
    rollup uses) is within 5% of exact, and (3) partial-merge agrees
    with one-pass to 2% — the mergeability invariant itself. Exact
    count-distinct anchors the values; sketches are deterministic for
    a fixed dataset, so a merge/precision regression flips a boolean
    and fails the driver's hash compare."""
    li = t(spark, sf_dir, "lineitem")
    partials = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("_sk")
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_m_parts")
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("_d_parts"),
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.count("*").alias("n"),
    )
    within = lambda a: (  # noqa: E731
        F.abs(F.col(a) - F.col("exact_parts")) / F.col("exact_parts")
    ) < 0.05
    return (
        direct.join(merged, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            within("_d_parts").alias("direct_within_5pct"),
            within("_m_parts").alias("merged_within_5pct"),
            (
                F.abs(F.col("_m_parts") - F.col("_d_parts"))
                / F.greatest(F.col("_d_parts"), F.lit(1.0))
                < 0.02
            ).alias("merge_close_to_direct"),
            "n",
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_error_bound",
    sql="""
    SELECT l_returnflag,
           TRUE AS parts_within_5pct,
           TRUE AS median_within_5pct,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_error_bound(spark, sf_dir):
    """Hard external signal for the sketches behind ``approx_aggregates``:
    per group, emit the BOOLEAN ``|approx - exact| / exact < 0.05`` for
    the HLL distinct count (rsd=0.01) and the KLL-style approximate
    median (accuracy=1000). The raw estimates are engine-specific (no
    cross-engine oracle possible), but the error-bound predicate is
    deterministic — sketches are deterministic for a fixed dataset — so
    DuckDB can assert the ground truth: every group TRUE, with the exact
    row count anchoring the rows. A sketch regression (wrong merge,
    precision loss) flips a boolean and fails the driver's hash compare.

    Scale: the exact side exists only to judge the sketch at test scale;
    the 100 TB deployment runs the sketch alone (bounded memory, one
    pass, mergeable partials)."""
    li = t(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("a_median"),
        F.count("*").alias("n"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("e_parts"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e_median"),
    )
    within = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e)) < 0.05
    return (
        approx.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            within("a_parts", "e_parts").alias("parts_within_5pct"),
            within("a_median", "e_median").alias("median_within_5pct"),
            "n",
        )
        .orderBy("l_returnflag")
    )


@register(
    "hll_sketch_union_estimate",
    sql="""
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS union_within_2pct,
           TRUE AS per_type_within_2pct
    FROM events
    """,
)
def hll_sketch_union_estimate(spark, sf_dir):
    """Mergeable-sketch distinct counting (Spark 4 DataSketches HLL):
    build one HLL sketch PER event_type partition group
    (``hll_sketch_agg``), then merge the partials (``hll_union_agg``)
    into the global distinct-user estimate — the property
    ``approx_count_distinct`` exercises internally but never exposes.
    Exposed sketches are what a 100 TB pipeline stores: per-partition/
    per-day sketch columns that roll up to any grouping later without
    rescanning the facts. Correctness gate is the approx_error_bound
    pattern: estimates are engine-specific, so the query emits the
    deterministic error-bound BOOLEANS (union estimate and every
    per-type estimate within 2% of exact) and the oracle asserts ground
    truth — a wrong merge or precision loss flips a flag and fails the
    hash compare.

    Scale: sketch state is KB-bounded (lgConfigK=14) regardless of
    cardinality; the exact side exists only to judge the sketch at test
    scale."""
    e = t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count_distinct("user_id").alias("e_users"),
    )
    within = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("e_users")) / F.col("e_users")
        < 0.02
    )
    rolled = per_type.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("a_users"),
        F.bool_and(within).alias("per_type_within_2pct"),
    )
    exact = e.agg(F.count_distinct("user_id").cast("long").alias("exact_users"))
    return rolled.crossJoin(exact).select(
        "n_types",
        "exact_users",
        (
            F.abs(F.col("a_users") - F.col("exact_users")) / F.col("exact_users")
            < 0.02
        ).alias("union_within_2pct"),
        "per_type_within_2pct",
    )


# One SQL text, two engines: the dialect-neutral core (CTE + join + window
# + aggregation) runs verbatim through spark.sql AND DuckDB.
_SHARED_SQL = """
    WITH cust_orders AS (
      SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment, count(*) AS n_top,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS top_total
    FROM cust_orders WHERE rn <= 3
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@register("sql_api_shared_dialect", sql=_SHARED_SQL)
def sql_api_shared_dialect(spark, sf_dir):
    """The same SQL string executes on both engines (SQL API surface
    proof: Catalyst and DuckDB agree on the dialect-neutral core)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SHARED_SQL)


@register(
    "approx_quantile_rank_bound",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           TRUE AS p50_within_rank_eps,
           TRUE AS p95_within_rank_eps
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_quantile_rank_bound(spark, sf_dir):
    """Quantile-sketch accuracy gate (the approx_error_bound /
    hll_sketch pattern for ORDER statistics): per event_type,
    ``approx_percentile`` (Greenwald-Khanna, accuracy 10000) returns
    candidate p50/p95 values, and the query re-ranks each candidate
    against the raw data — the fraction of rows <= candidate must sit
    within 0.01 of the target quantile (GK guarantees rank error
    <= 1/accuracy = 1e-4; the slack absorbs duplicate-value mass at the
    cut). Estimates are engine- and merge-order-specific, so the
    emitted columns are the deterministic BOUND BOOLEANS; the oracle
    asserts ground truth, and a sketch regression flips a flag into a
    hash mismatch.

    Scale: the sketch is the point — constant memory per group vs the
    full sort an exact percentile needs; the re-rank pass exists to
    JUDGE the sketch and broadcasts 3 values per group."""
    e = t(spark, sf_dir, "events").select("event_type", "value")
    appr = e.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("ap")
    )
    cand = appr.select(
        "event_type",
        F.col("ap")[0].alias("a50"),
        F.col("ap")[1].alias("a95"),
    )
    j = e.join(F.broadcast(cand), "event_type")
    ranks = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.when(F.col("value") <= F.col("a50"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("r50"),
        (
            F.sum(F.when(F.col("value") <= F.col("a95"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("r95"),
    )
    return ranks.select(
        "event_type",
        "n",
        (F.abs(F.col("r50") - 0.5) <= 0.01).alias("p50_within_rank_eps"),
        (F.abs(F.col("r95") - 0.95) <= 0.01).alias("p95_within_rank_eps"),
    ).orderBy("event_type")


@register(
    "agg_mode_per_group",
    sql="""
    SELECT event_type, modal_value, n_occurrences FROM (
      SELECT event_type, value AS modal_value,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, value) AS rn
      FROM events GROUP BY event_type, value) x
    WHERE rn = 1 ORDER BY event_type
    """,
)
def agg_mode_per_group(spark, sf_dir):
    """Exact per-group MODE with a total tie order (highest count,
    lowest value wins) — the deterministic formulation of the statistic
    whose built-in (``F.mode``) leaves tie choice engine-defined, which
    is exactly why a cross-engine pipeline computes it as
    count-then-rank instead. Two map-side-combinable aggregations
    sharing the group key's shuffle; the rank window partitions by
    group (never global)."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    w = W.partitionBy("event_type").orderBy(
        F.desc("n_occurrences"), F.asc("value")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("value").alias("modal_value"), "n_occurrences")
        .orderBy("event_type")
    )


@register(
    "exact_quantile_selection",
    sql="""
    SELECT o_orderstatus, q, value FROM (
      SELECT o_orderstatus, CAST(0.5 AS DOUBLE) AS q,
             quantile_disc(o_totalprice, 0.5) AS value
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, CAST(0.9 AS DOUBLE) AS q,
             quantile_disc(o_totalprice, 0.9) AS value
      FROM orders GROUP BY o_orderstatus)
    ORDER BY o_orderstatus, q
    """,
)
def exact_quantile_selection(spark, sf_dir):
    """EXACT discrete p50/p90 per order status WITHOUT any sort
    (operators/skew.py distributed_exact_quantile) — closing the
    degradation `percentiles_exact` documents ("exact percentile
    requires a per-group sort"): bounded-round selection keeps a live
    [lo, hi] range and target rank per (group, q), each round ONE
    broadcast-join + map-side bucket count narrows every state 64-fold,
    and the k-th value is read from the final interval's few distinct
    survivors. Both quantiles refine in the SAME passes (the state
    table carries one row per (group, q)). The oracle is DuckDB's
    quantile_disc, whose rank convention (k = ceil(q*n)) the operator
    reproduces exactly.

    Scale: rounds+2 scan-bound passes with O(groups x qs x 64) driver
    metadata per round — no value shuffle at all, vs the sort's full
    exchange; the win grows with table width since only (group, value)
    project into the passes."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_exact_quantile

    o = t(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    out = distributed_exact_quantile(
        o, "o_totalprice", ["o_orderstatus"], qs=[0.5, 0.9]
    )
    return out.select("o_orderstatus", "q", "value").orderBy("o_orderstatus", "q")
