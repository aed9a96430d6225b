"""Graph analytics + distributed statistics queries (round-6 surface).

Graph family: the part co-purchase graph (operators/graph.py) — pairs of
parts bought together in >= 2 orders. Degree profile, triangle census,
bounded-round PageRank, bounded-round connected components; each oracle
unrolls the identical rounds as DuckDB CTEs.

Statistics family: closed-form inference computed in ONE aggregation
pass — Welch's t, chi-square independence, multivariate OLS via normal
equations, weight-of-evidence decile bins. The discipline throughout:
every moment is an exact DECIMAL sum of fixed-point inputs (queries/
base.py), so the double arithmetic that follows starts from bit-identical
values in both engines and the final rounding is safe.

Determinism: fixed iteration counts, total output orders, identical
expression shapes Spark-side and SQL-side.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import graph as G
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t

def _edges(spark, sf_dir):
    """The co-purchase edge list, cached in a session persist slot: every
    graph query in a run derives the SAME edges, and several consume them
    more than once in one plan (symmetrize unions the list with itself) —
    without the cache each branch re-runs the orderkey self-join from the
    parquet scan (plan audit showed 4 FileScans for the degree histogram;
    1 with the slot)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    return _persist_slot(
        G.copurchase_edges(t(spark, sf_dir, "lineitem")), "graphstats_edges"
    )


# shared oracle CTE: the co-purchase edge list (u < v, support >= 2)
_EDGES_CTE = """
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (SELECT u AS src, v AS dst FROM edges
            UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM sym GROUP BY 1)
"""


@register(
    "graph_degree_histogram",
    sql=f"""
    WITH {_EDGES_CTE}
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree distribution of the co-purchase graph: how many parts have
    k affinity partners. Two shuffles to build the edges (orderkey
    co-group, pair distinct), two cheap aggregations after — the edge
    build dominates and scales with the fact table, the histogram with
    the (much smaller) node count."""
    edges = _edges(spark, sf_dir)
    return (
        G.degrees(edges)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


@register(
    "graph_triangle_count",
    sql=f"""
    WITH {_EDGES_CTE}
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM edges e1
            JOIN edges e2 ON e1.v = e2.u
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle census. Edges oriented low->high id, so each triangle is
    one wedge closure — no double counting, no back-edge join fan-out
    (operators/graph.py documents the degree-orientation refinement for
    skewed graphs)."""
    edges = _edges(spark, sf_dir)
    return G.triangle_count(edges)


def _pagerank_round_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT d.node,
             0.15 / (SELECT n FROM nn)
             + 0.85 * coalesce(s.contrib, 0.0) AS pr
      FROM deg d LEFT JOIN (
        SELECT e.dst AS node, sum(p.pr / dd.degree) AS contrib
        FROM sym e
        JOIN {prev} p ON e.src = p.node
        JOIN deg dd ON dd.node = e.src
        GROUP BY e.dst
      ) s ON s.node = d.node
    )"""


@register(
    "graph_pagerank_3rounds",
    headline=True,  # the iterative-join compute shape, new to the bench
    sql=f"""
    WITH {_EDGES_CTE},
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
    {_pagerank_round_sql('pr0', 'pr1')},
    {_pagerank_round_sql('pr1', 'pr2')},
    {_pagerank_round_sql('pr2', 'pr3')}
    SELECT node, round(pr, 6) AS pr FROM pr3 ORDER BY node
    """,
)
def graph_pagerank_3rounds(spark, sf_dir):
    """Three PageRank rounds on the co-purchase graph, every node's rank
    rounded to 6dp, ordered by node id (a total, value-independent order
    — ranking by the float would make tie order engine-dependent). The
    oracle unrolls the identical three rounds as CTEs."""
    edges = _edges(spark, sf_dir)
    return (
        G.pagerank(edges, iters=3, damping=0.85)
        .select("node", F.round("pr", 6).alias("pr"))
        .orderBy("node")
    )


def _lp_round_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT l.node,
             least(l.lbl, coalesce(m.nmin, l.lbl)) AS lbl
      FROM {prev} l LEFT JOIN (
        SELECT e.src AS node, min(p.lbl) AS nmin
        FROM sym e JOIN {prev} p ON e.dst = p.node
        GROUP BY e.src
      ) m ON m.node = l.node
    )"""


@register(
    "graph_components_4rounds",
    sql=f"""
    WITH {_EDGES_CTE},
    lbl0 AS (SELECT node, node AS lbl FROM deg),
    {_lp_round_sql('lbl0', 'lbl1')},
    {_lp_round_sql('lbl1', 'lbl2')},
    {_lp_round_sql('lbl2', 'lbl3')},
    {_lp_round_sql('lbl3', 'lbl4')}
    SELECT lbl AS component, CAST(count(*) AS BIGINT) AS size
    FROM lbl4 GROUP BY lbl ORDER BY size DESC, component
    """,
)
def graph_components_4rounds(spark, sf_dir):
    """Connected components after four min-label rounds (labels propagate
    four hops — bounded rounds keep the result deterministic and
    oracle-checkable; production convergence loops until a round is a
    no-op, same per-round plan)."""
    edges = _edges(spark, sf_dir)
    return (
        G.min_label_components(edges, iters=4)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), "component")
    )


# -- statistics ------------------------------------------------------------


@register(
    "ab_test_welch",
    sql="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS cohort,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT cohort,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxx
      FROM per_user GROUP BY cohort
    ),
    s AS (
      SELECT cohort, n, sx / n AS mean,
             (sxx - sx * sx / n) / (n - 1.0) AS var FROM m
    )
    SELECT round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat,
           round(pow(a.var / a.n + b.var / b.n, 2)
                 / (pow(a.var / a.n, 2) / (a.n - 1.0)
                    + pow(b.var / b.n, 2) / (b.n - 1.0)), 6) AS welch_df
    FROM s a JOIN s b ON a.cohort = 0 AND b.cohort = 1
    """,
)
def ab_test_welch(spark, sf_dir):
    """Welch's unequal-variance t-test between two user cohorts (split by
    user_id parity) on per-user spend. One pass builds per-user sums (2dp
    exact), one pass the cohort moments as exact decimal sums — mean/
    variance/t/df are then identical double arithmetic in both engines.
    At scale: two shuffles total (user, then cohort), the second over two
    rows."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x")
    ).withColumn("cohort", F.col("user_id") % 2)
    m = per_user.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(
            F.col("x").cast("decimal(18,2)") * F.col("x").cast("decimal(18,2)")
        ).cast("double").alias("sxx"),
    )
    s = m.select(
        "cohort",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1.0)).alias("var"),
    )
    a = s.filter(F.col("cohort") == 0).alias("a")
    b = s.filter(F.col("cohort") == 1).alias("b")
    se2 = F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
    return a.crossJoin(b).select(
        F.round(F.col("a.mean"), 6).alias("mean_a"),
        F.round(F.col("b.mean"), 6).alias("mean_b"),
        F.col("a.n").cast("long").alias("n_a"),
        F.col("b.n").cast("long").alias("n_b"),
        F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("a.var") / F.col("a.n"), 2) / (F.col("a.n") - 1.0)
                + F.pow(F.col("b.var") / F.col("b.n"), 2) / (F.col("b.n") - 1.0)
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "chi_square_independence",
    sql="""
    WITH obs AS (
      SELECT event_type, user_id % 2 AS cohort,
             CAST(count(*) AS DOUBLE) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events),
    rows_ AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
    cols_ AS (SELECT cohort, sum(o) AS c FROM obs GROUP BY 1)
    SELECT round(CAST(sum(CAST(round(
                     pow(o.o - (r.r * c.c / (SELECT n FROM tot)), 2)
                     / (r.r * c.c / (SELECT n FROM tot)), 9)
                     AS DECIMAL(24,9))) AS DOUBLE), 6) AS chi2,
           CAST((SELECT count(*) FROM rows_) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM cols_) - 1 AS BIGINT) AS dof
    FROM obs o
    JOIN rows_ r ON r.event_type = o.event_type
    JOIN cols_ c ON c.cohort = o.cohort
    """,
)
def chi_square_independence(spark, sf_dir):
    """Chi-square test of independence between event type and user
    cohort. Observed counts are exact; expected counts and the statistic
    are the same expression tree both sides. One shuffle on the
    contingency key; the cell table is tiny thereafter."""
    ev = t(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count(F.lit(1)).cast("double").alias("o")).persist()
    n = obs.agg(F.sum("o")).collect()[0][0]
    rows_ = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("cohort").agg(F.sum("o").alias("c"))
    n_rows = rows_.count()
    n_cols = cols_.count()
    e = F.col("r") * F.col("c") / F.lit(n)
    out = (
        obs.join(rows_, "event_type")
        .join(cols_, "cohort")
        .agg(
            # cell term quantized to 9dp DECIMAL before the sum: the
            # chi-square is order-free whatever the shuffle does
            F.round(
                F.sum(
                    F.round(F.pow(F.col("o") - e, 2) / e, 9).cast(
                        "decimal(24,9)"
                    )
                ).cast("double"),
                6,
            ).alias("chi2"),
            F.lit((n_rows - 1) * (n_cols - 1)).cast("long").alias("dof"),
        )
    )
    obs.unpersist()
    return out


@register(
    "linreg_normal_equations",
    sql="""
    WITH feat AS (
      SELECT l_orderkey AS k,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS x1,
             CAST(count(*) AS DOUBLE) AS x2
      FROM lineitem GROUP BY l_orderkey
    ),
    d AS (
      SELECT f.x1, f.x2,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS y
      FROM feat f JOIN orders o ON o.o_orderkey = f.k
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x1 AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(x2 AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x1 AS DECIMAL(18,2)) * CAST(x1 AS DECIMAL(18,2))) AS DOUBLE) AS s11,
             CAST(sum(CAST(x1 AS DECIMAL(18,2)) * CAST(x2 AS DECIMAL(18,2))) AS DOUBLE) AS s12,
             CAST(sum(CAST(x2 AS DECIMAL(18,2)) * CAST(x2 AS DECIMAL(18,2))) AS DOUBLE) AS s22,
             CAST(sum(CAST(x1 AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
             CAST(sum(CAST(x2 AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS s2y
      FROM d
    ),
    det_ AS (
      SELECT
        CAST(count(*) AS BIGINT) AS _one,
        (n * (s11 * s22 - s12 * s12)
         - s1 * (s1 * s22 - s12 * s2)
         + s2 * (s1 * s12 - s11 * s2)) AS det,
        (sy * (s11 * s22 - s12 * s12)
         - s1 * (s1y * s22 - s12 * s2y)
         + s2 * (s1y * s12 - s11 * s2y)) AS det0,
        (n * (s1y * s22 - s12 * s2y)
         - sy * (s1 * s22 - s12 * s2)
         + s2 * (s1 * s2y - s1y * s2)) AS det1,
        (n * (s11 * s2y - s1y * s12)
         - s1 * (s1 * s2y - s1y * s2)
         + sy * (s1 * s12 - s11 * s2)) AS det2
      FROM m GROUP BY ALL
    )
    SELECT round(det0 / det, 6) AS beta0,
           round(det1 / det, 6) AS beta1,
           round(det2 / det, 6) AS beta2
    FROM det_
    """,
)
def linreg_normal_equations(spark, sf_dir):
    """Multivariate OLS (o_totalprice ~ total quantity + line count) by
    the closed-form normal equations: ONE aggregation pass collects the
    nine moments as exact decimal sums, Cramer's rule solves the 3x3
    system in scalar arithmetic — no iteration, no driver-side matrix
    library, and the whole regression costs two shuffles (per-order
    features, then a single global agg). The identical determinant
    expressions run both engines, so rounding to 6dp is safe."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    feat = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("x1"),
        F.count(F.lit(1)).cast("double").alias("x2"),
    )
    d = feat.join(orders, feat.k == orders.o_orderkey).select(
        "x1", "x2", F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("y")
    )

    def dec(c):
        return F.col(c).cast("decimal(18,2)")

    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("x1")).cast("double").alias("s1"),
        F.sum(dec("x2")).cast("double").alias("s2"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x1") * dec("x1")).cast("double").alias("s11"),
        F.sum(dec("x1") * dec("x2")).cast("double").alias("s12"),
        F.sum(dec("x2") * dec("x2")).cast("double").alias("s22"),
        F.sum(dec("x1") * dec("y")).cast("double").alias("s1y"),
        F.sum(dec("x2") * dec("y")).cast("double").alias("s2y"),
    )
    c = F.col
    det = (
        c("n") * (c("s11") * c("s22") - c("s12") * c("s12"))
        - c("s1") * (c("s1") * c("s22") - c("s12") * c("s2"))
        + c("s2") * (c("s1") * c("s12") - c("s11") * c("s2"))
    )
    det0 = (
        c("sy") * (c("s11") * c("s22") - c("s12") * c("s12"))
        - c("s1") * (c("s1y") * c("s22") - c("s12") * c("s2y"))
        + c("s2") * (c("s1y") * c("s12") - c("s11") * c("s2y"))
    )
    det1 = (
        c("n") * (c("s1y") * c("s22") - c("s12") * c("s2y"))
        - c("sy") * (c("s1") * c("s22") - c("s12") * c("s2"))
        + c("s2") * (c("s1") * c("s2y") - c("s1y") * c("s2"))
    )
    det2 = (
        c("n") * (c("s11") * c("s2y") - c("s1y") * c("s12"))
        - c("s1") * (c("s1") * c("s2y") - c("s1y") * c("s2"))
        + c("sy") * (c("s1") * c("s12") - c("s11") * c("s2"))
    )
    return m.select(
        F.round(det0 / det, 6).alias("beta0"),
        F.round(det1 / det, 6).alias("beta1"),
        F.round(det2 / det, 6).alias("beta2"),
    )


@register(
    "woe_decile_bins",
    sql="""
    WITH binned AS (
      SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders
    ),
    per_bin AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bad)::BIGINT AS BIGINT) AS n_bad
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_bad) AS DOUBLE) AS tot_bad,
             CAST(sum(n - n_bad) AS DOUBLE) AS tot_good
      FROM per_bin
    )
    SELECT bin, n, n_bad,
           round(ln((CAST(n - n_bad AS DOUBLE) / tot_good)
                    / (CAST(n_bad AS DOUBLE) / tot_bad)), 6) AS woe
    FROM per_bin, tot ORDER BY bin
    """,
)
def woe_decile_bins(spark, sf_dir):
    """Weight-of-evidence per price decile against the 'F' order-status
    outcome — the credit-scoring binning primitive. The decile over the
    TOTAL order (price, key) comes from operators/skew.py
    distributed_ntile (quantile-bucketed per-bucket windows + broadcast
    offsets + the closed-form tile from the unique index) — bit-identical
    to ``ntile(10) OVER (ORDER BY price, key)`` with NO single-partition
    sort, so the bin assignment scales with the cluster. Rates are ratios
    of exact counts, so ln() sees identical doubles."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_ntile

    orders = t(spark, sf_dir, "orders").select(
        "o_totalprice",
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    binned = distributed_ntile(
        orders, 10, "o_totalprice", tie_breakers=["o_orderkey"], out="bin"
    ).select("bin", "bad")
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = per_bin.agg(
        F.sum("n_bad").cast("double").alias("tot_bad"),
        F.sum(F.col("n") - F.col("n_bad")).cast("double").alias("tot_good"),
    )
    return (
        per_bin.crossJoin(tot)
        .select(
            "bin",
            "n",
            "n_bad",
            F.round(
                F.log(
                    ((F.col("n") - F.col("n_bad")).cast("double") / F.col("tot_good"))
                    / (F.col("n_bad").cast("double") / F.col("tot_bad"))
                ),
                6,
            ).alias("woe"),
        )
        .orderBy("bin")
    )


@register(
    "graph_jaccard_neighbors",
    sql=f"""
    WITH {_EDGES_CTE},
    common AS (
      SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS c
      FROM sym e1 JOIN sym e2
        ON e1.src = e2.src AND e1.dst < e2.dst
      GROUP BY 1, 2
    ),
    j AS (
      SELECT c.u, c.v,
             round(CAST(c.c AS DOUBLE)
                   / CAST(du.degree + dv.degree - c.c AS DOUBLE), 6) AS jaccard
      FROM common c
      JOIN deg du ON du.node = c.u
      JOIN deg dv ON dv.node = c.v
    )
    SELECT u, v, jaccard FROM (
      SELECT *, row_number() OVER (ORDER BY jaccard DESC, u, v) AS rn FROM j)
    WHERE rn <= 20 ORDER BY jaccard DESC, u, v
    """,
)
def graph_jaccard_neighbors(spark, sf_dir):
    """Top-20 part pairs by neighbor-set Jaccard similarity — the
    structural-equivalence primitive behind item-item collaborative
    filtering. Common-neighbor counts come from one wedge self-join on
    the shared endpoint (same shape as the triangle census, so the same
    degree-orientation bound applies at scale); the union size is
    deg(u)+deg(v)-common, so no second join over neighbor sets is ever
    materialized. Jaccard is a ratio of exact counts — identical doubles
    both engines."""
    edges = _edges(spark, sf_dir)
    sym = G.symmetrize(edges)
    deg = G.degrees(edges)
    e1 = sym.alias("e1")
    e2 = sym.alias("e2")
    common = (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .groupBy(F.col("e1.dst").alias("u"), F.col("e2.dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("degree", "du")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("degree", "dv")
    j = (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.round(
                F.col("c").cast("double")
                / (F.col("du") + F.col("dv") - F.col("c")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    # top-20 under the TOTAL order (jaccard desc, u, v): row_number<=20
    # == orderBy+limit, which Spark plans as TakeOrderedAndProject
    # (per-partition top-k + driver merge) — never a global window
    return (
        j.select("u", "v", "jaccard")
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(20)
    )


@register(
    "mann_whitney_u",
    sql="""
    WITH per_user AS (
      SELECT user_id % 2 AS cohort,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT cohort,
             CAST(rank() OVER (ORDER BY x) AS DOUBLE)
             + (CAST(count(*) OVER (PARTITION BY x) AS DOUBLE) - 1.0) / 2.0
               AS avg_rank
      FROM per_user
    ),
    agg AS (
      SELECT cohort, CAST(count(*) AS DOUBLE) AS n,
             sum(avg_rank) AS rank_sum
      FROM ranked GROUP BY cohort
    )
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.rank_sum - a.n * (a.n + 1.0) / 2.0, 2) AS u_a,
           round(b.rank_sum - b.n * (b.n + 1.0) / 2.0, 2) AS u_b
    FROM agg a JOIN agg b ON a.cohort = 0 AND b.cohort = 1
    """,
)
def mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U (rank-sum) between the two user cohorts — the
    nonparametric sibling of ab_test_welch. Tied values take the average
    rank (rank() + (ties-1)/2, identical in both engines and exact in
    halves, so the statistic is exact to 2dp by construction). The global
    rank comes from operators/skew.py distributed_rank (the Spearman
    midrank pattern): quantile-bucketed per-bucket windows + broadcast
    offsets — NO single-partition sort anywhere in the plan; the tie
    count is a value-hash partitioned window."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank

    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x")
    ).select((F.col("user_id") % 2).alias("cohort"), "x")
    ranked = distributed_rank(per_user, "x", out="_rk", buckets=32).select(
        "cohort",
        (
            F.col("_rk").cast("double")
            + (F.count(F.lit(1)).over(W.partitionBy("x")).cast("double") - 1.0) / 2.0
        ).alias("avg_rank"),
    )
    agg = ranked.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("avg_rank").alias("rank_sum"),
    )
    a = agg.filter(F.col("cohort") == 0).alias("a")
    b = agg.filter(F.col("cohort") == 1).alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").cast("long").alias("n_a"),
        F.col("b.n").cast("long").alias("n_b"),
        F.round(F.col("a.rank_sum") - F.col("a.n") * (F.col("a.n") + 1.0) / 2.0, 2).alias("u_a"),
        F.round(F.col("b.rank_sum") - F.col("b.n") * (F.col("b.n") + 1.0) / 2.0, 2).alias("u_b"),
    )


@register(
    "ks_two_sample",
    sql="""
    WITH per_user AS (
      SELECT user_id % 2 AS cohort,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM events GROUP BY user_id
    ),
    n AS (
      SELECT CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)::BIGINT AS DOUBLE) AS n0,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)::BIGINT AS DOUBLE) AS n1
      FROM per_user
    ),
    steps AS (
      SELECT x,
             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)::BIGINT AS DOUBLE) AS c0,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)::BIGINT AS DOUBLE) AS c1
      FROM per_user GROUP BY x
    ),
    ecdf AS (
      SELECT x,
             sum(c0) OVER (ORDER BY x) / (SELECT n0 FROM n) AS f0,
             sum(c1) OVER (ORDER BY x) / (SELECT n1 FROM n) AS f1
      FROM steps
    )
    SELECT round(max(abs(f0 - f1)), 6) AS ks_d,
           CAST((SELECT n0 FROM n) AS BIGINT) AS n_a,
           CAST((SELECT n1 FROM n) AS BIGINT) AS n_b
    FROM ecdf
    """,
)
def ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov D: the max ECDF gap between the two
    cohorts' per-user spend. Both ECDFs are cumulative counts over the
    SAME ordered distinct values divided by exact cohort sizes — step
    heights are exact rationals, so max|F0-F1| is engine-identical. The
    running counts come from operators/skew.py distributed_running_agg
    (two-phase: bucket subtotals, broadcast offsets, bucket-local
    cumsum over DISTINCT spend values) — no single-partition sort even
    over the per-user step table."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_running_agg

    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x")
    ).select((F.col("user_id") % 2).alias("cohort"), "x").persist()
    sizes = per_user.groupBy().agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("double").alias("n1"),
    ).collect()[0]
    n0, n1 = sizes.n0, sizes.n1
    steps = per_user.groupBy("x").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("double").alias("c0"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("double").alias("c1"),
    )
    ecdf = distributed_running_agg(
        steps, "x", ["c0", "c1"], ["cum0", "cum1"], agg="sum"
    ).select(
        (F.col("cum0") / F.lit(n0)).alias("f0"),
        (F.col("cum1") / F.lit(n1)).alias("f1"),
    )
    out = ecdf.agg(
        F.round(F.max(F.abs(F.col("f0") - F.col("f1"))), 6).alias("ks_d"),
        F.lit(int(n0)).cast("long").alias("n_a"),
        F.lit(int(n1)).cast("long").alias("n_b"),
    )
    per_user.unpersist()
    return out


@register(
    "weekday_seasonality_index",
    sql="""
    WITH e AS (
      SELECT isodow(ts) AS dow,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    per_dow AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS DOUBLE) AS s
      FROM e GROUP BY dow
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS tn,
             CAST(sum(CAST(s AS DECIMAL(18,2))) AS DOUBLE) AS ts_
      FROM per_dow
    )
    SELECT dow, n,
           round((s / CAST(n AS DOUBLE)) / (ts_ / tn), 6) AS seasonality_index
    FROM per_dow, tot ORDER BY dow
    """,
)
def weekday_seasonality_index(spark, sf_dir):
    """Day-of-week seasonality: each weekday's mean event value relative
    to the overall mean — the baseline a seasonal anomaly detector
    divides out. ISO weekday numbering aligns the engines (Spark
    weekday()+1 == DuckDB isodow). One shuffle to 7 groups; the index is
    a ratio of exact-decimal-derived means."""
    ev = t(spark, sf_dir, "events")
    per_dow = ev.select(
        (F.weekday("ts") + F.lit(1)).alias("dow"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    ).groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s"),
    )
    tot = per_dow.agg(
        F.sum("n").cast("double").alias("tn"),
        F.sum(F.col("s").cast("decimal(18,2)")).cast("double").alias("ts_"),
    )
    return (
        per_dow.crossJoin(tot)
        .select(
            "dow",
            "n",
            F.round(
                (F.col("s") / F.col("n").cast("double")) / (F.col("ts_") / F.col("tn")),
                6,
            ).alias("seasonality_index"),
        )
        .orderBy("dow")
    )


@register(
    "benford_first_digit",
    sql="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS first_digit
      FROM orders
    ),
    counted AS (
      SELECT first_digit,
             CAST(count(*) AS BIGINT) AS n,
             sum(count(*)) OVER () AS total
      FROM digits GROUP BY first_digit
    )
    SELECT first_digit, n,
           round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed_p,
           round(log10(1.0 + 1.0 / first_digit), 6) AS benford_p,
           round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                 - log10(1.0 + 1.0 / first_digit), 6) AS deviation
    FROM counted ORDER BY first_digit
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law conformance of order totals: the distribution of
    first significant digits against the log10(1 + 1/d) expectation —
    the classic forensic data-quality screen for fabricated or
    truncated monetary columns (a generator or an ingest bug shows up
    as a flat or spiked digit histogram). The leading digit is taken
    from the integer part's decimal string — identical in both engines
    for the positive, >= 1 domain of o_totalprice — never via
    floor(x/10^floor(log10 x)), whose log10 rounds differently at exact
    powers of ten.

    Scale: one map-side projection to a 9-value key, one partial-
    aggregating groupBy — the cheapest shape a full-table screen can
    have; the window total runs over nine rows."""
    o = t(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counted = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    counted = counted.withColumn(
        "total", F.sum("n").over(W.partitionBy())
    )
    c = F.col
    obs = c("n").cast("double") / c("total").cast("double")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / c("first_digit"))
    return counted.select(
        "first_digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(obs - benford, 6).alias("deviation"),
    ).orderBy("first_digit")


def _khop_round_sql(prev: str, cur: str, sentinel: int) -> str:
    return f"""
    {cur} AS (
      SELECT coalesce(l.node, m.node) AS node,
             least(coalesce(l.hop, {sentinel}), coalesce(m.nhop, {sentinel})) AS hop
      FROM {prev} l FULL JOIN (
        SELECT e.dst AS node, min(p.hop) + 1 AS nhop
        FROM sym e JOIN {prev} p ON e.src = p.node
        GROUP BY e.dst
      ) m ON m.node = l.node
    )"""


@register(
    "graph_khop_reachability",
    sql=f"""
    WITH {_EDGES_CTE},
    hop0 AS (SELECT node, 0 AS hop FROM deg WHERE node % 97 = 0),
    {_khop_round_sql('hop0', 'hop1', 4)},
    {_khop_round_sql('hop1', 'hop2', 4)},
    {_khop_round_sql('hop2', 'hop3', 4)}
    SELECT CAST(node AS BIGINT) AS node, CAST(hop AS BIGINT) AS hop
    FROM hop3 ORDER BY node
    """,
)
def graph_khop_reachability(spark, sf_dir):
    """Bounded BFS: minimum hop distance (0-3) from the deterministic
    seed set (node % 97 = 0) over the co-purchase graph — the
    reachability/blast-radius shape (recall sweep from affected parts,
    fraud ring expansion from flagged accounts). The frontier table
    holds only reached nodes, so each of the three join+agg rounds
    costs the expanding neighborhood, not the graph; the oracle unrolls
    the identical three rounds as full-join CTEs."""
    edges = _edges(spark, sf_dir)
    seeds = G.degrees(edges).filter(F.col("node") % 97 == 0).select("node")
    return (
        G.khop_hops(edges, seeds, iters=3)
        .select(F.col("node").cast("long").alias("node"), F.col("hop").cast("long").alias("hop"))
        .orderBy("node")
    )


@register(
    "survival_kaplan_meier",
    sql="""
    WITH u0 AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id),
    conv AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    users AS (
      SELECT u0.user_id,
             CAST(CASE WHEN conv.tp IS NULL THEN 72
                  ELSE least(CAST(floor(epoch_us(conv.tp - u0.t0) / 3600000000)
                             AS BIGINT), 72) END AS BIGINT) AS dur,
             CAST(conv.tp IS NULL
                  OR floor(epoch_us(conv.tp - u0.t0) / 3600000000) > 72
                  AS BOOLEAN) AS censored
      FROM u0 LEFT JOIN conv ON conv.user_id = u0.user_id
    ),
    at_t AS (
      SELECT dur AS t,
             CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM users GROUP BY dur
    ),
    risk AS (
      SELECT t, d,
             CAST((SELECT count(*) FROM users) AS BIGINT)
               - CAST(coalesce(sum(leaving) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_risk
      FROM at_t
    )
    SELECT t, n_risk, d AS n_events,
           round(exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_risk))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6) AS survival
    FROM risk WHERE d > 0 ORDER BY t
    """,
)
def survival_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-first-purchase: per user,
    duration = whole hours from their first event to their first
    purchase, right-CENSORED at a 72-hour observation horizon (users
    converting later — or never — are known only to have survived past
    72h; dropping them would bias conversion up, counting them as
    converted-at-72 would bias it down; KM's at-risk denominators are
    exactly the fix). S(t) is the product-limit over event times,
    computed as exp of a windowed sum of logs — one closed-form pass.
    The time-to-convert curve behind activation dashboards, as the
    estimator statisticians actually use under censoring.

    Determinism: durations are exact integer hours (microsecond integer
    arithmetic) and at-risk counts exact integers, so both engines feed
    identical rationals d/n into ln/exp; 6dp rounding absorbs libm ULP.

    Scale: two distributed per-user aggregations; everything after runs
    over one row per distinct hour (<= 73 rows)."""
    e = t(spark, sf_dir, "events")
    u0 = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    hours = F.floor(
        (F.unix_micros("tp") - F.unix_micros("t0")) / F.lit(3600000000)
    )
    users = u0.join(conv, "user_id", "left").select(
        F.when(F.col("tp").isNull(), F.lit(72))
        .otherwise(F.least(hours, F.lit(72)))
        .cast("long")
        .alias("dur"),
        (F.col("tp").isNull() | (hours > 72)).alias("censored"),
    )
    at_t = users.groupBy(F.col("dur").alias("t")).agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    total = users.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = at_t.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    w_cum = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    surv = F.exp(
        F.sum(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
        ).over(w_cum)
    )
    return (
        risk.withColumn("survival", F.round(surv, 6))
        .filter(F.col("d") > 0)
        .select("t", "n_risk", F.col("d").alias("n_events"), "survival")
        .orderBy("t")
    )


@register(
    "spearman_rank_corr",
    sql="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT CAST(2 * rank() OVER (ORDER BY x)
                  + count(*) OVER (PARTITION BY x) - 1 AS DECIMAL(12,0)) AS rx,
             CAST(2 * rank() OVER (ORDER BY y)
                  + count(*) OVER (PARTITION BY y) - 1 AS DECIMAL(12,0)) AS ry
      FROM per_user
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(rx) AS DOUBLE) AS sx,
             CAST(sum(ry) AS DOUBLE) AS sy,
             CAST(sum(rx * ry) AS DOUBLE) AS sxy,
             CAST(sum(rx * rx) AS DOUBLE) AS sxx,
             CAST(sum(ry * ry) AS DOUBLE) AS syy
      FROM ranked
    )
    SELECT n_users,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS spearman_rho
    FROM m
    """,
)
def spearman_rank_corr(spark, sf_dir):
    """Spearman rank correlation between per-user total spend and event
    count — the robust (monotone, outlier-immune) association measure
    next to the Pearson regressions already in this family. Ties take
    textbook MIDRANKS, kept in exact integer arithmetic by the doubling
    trick (2*rank + tie_count - 1 = twice the midrank — scaling both
    rank vectors by 2 leaves the correlation unchanged), so both engines
    rank identically with no float rank in sight; the Pearson formula
    then runs on exact decimal moments (the linreg discipline).

    Scale: one distributed per-user aggregation; both global ranks come
    from operators/skew.py distributed_rank (quantile-bucketed per-bucket
    windows + broadcast offsets) and the tie counts from value-hash
    partitioned windows — no single-partition sort in the plan."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank

    # exact global competition ranks WITHOUT single-partition sorts
    # (operators/skew.py distributed_rank); tie counts are value-hash
    # partitioned windows — nothing in the plan funnels all users
    # through one task
    ru = distributed_rank(per_user, "x", out="rkx", buckets=32)
    ru = distributed_rank(ru, "y", out="rky", buckets=32)
    ranked = ru.select(
        (
            F.lit(2) * F.col("rkx")
            + F.count(F.lit(1)).over(W.partitionBy("x"))
            - F.lit(1)
        ).cast("decimal(12,0)").alias("rx"),
        (
            F.lit(2) * F.col("rky")
            + F.count(F.lit(1)).over(W.partitionBy("y"))
            - F.lit(1)
        ).cast("decimal(12,0)").alias("ry"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
    )
    c = F.col
    rho = (c("n") * c("sxy") - c("sx") * c("sy")) / (
        F.sqrt(c("n") * c("sxx") - c("sx") * c("sx"))
        * F.sqrt(c("n") * c("syy") - c("sy") * c("sy"))
    )
    return m.select("n_users", F.round(rho, 6).alias("spearman_rho"))


@register(
    "theil_sen_daily_trend",
    sql="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM events GROUP BY 1
    ),
    slopes AS (
      SELECT (b.rev - a.rev) / (b.d - a.d) AS slope
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             (count(*) * sum(d * rev) - sum(d) * sum(rev))
               / (count(*) * sum(d * d) - sum(d) * sum(d)) AS beta
      FROM daily
    )
    SELECT n_days,
           (SELECT CAST(count(*) AS BIGINT) FROM slopes) AS n_pairs,
           round((SELECT quantile_cont(slope, 0.5) FROM slopes), 4)
             AS theil_sen_slope,
           round(beta, 4) AS ols_slope
    FROM ols
    """,
)
def theil_sen_daily_trend(spark, sf_dir):
    """Theil-Sen robust trend of daily revenue: the MEDIAN of all
    pairwise slopes between days — the estimator that shrugs off the
    outlier days an OLS fit chases (both slopes are reported so the gap
    is visible; up to 29% contamination leaves Theil-Sen standing). The
    pairwise join is over the DAILY AGGREGATE — a bounded spine (~30
    rows -> ~435 pairs), never the event rows, so the O(n²) lives on a
    frame whose size is set by the calendar, not the data. Daily sums
    are exact decimals; every slope is then the same IEEE division in
    both engines and the median interpolates identically
    (percentile == quantile_cont, verified family-wide)."""
    e = t(spark, sf_dir, "events")
    # the daily spine feeds both self-join sides AND the OLS moments;
    # the slot keeps the events scan + daily rollup to one execution
    # (r13 plan audit: 5 events scans in this plan)
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    daily = _persist_slot(
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
        ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("rev")),
        "graphstats.theilsen_daily",
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(b, F.col("b.d") > F.col("a.d"))
        .select(((F.col("b.rev") - F.col("a.rev")) / (F.col("b.d") - F.col("a.d"))).alias("slope"))
    )
    n = F.count(F.lit(1))
    sd, sr = F.sum(F.col("d").cast("double")), F.sum("rev")
    sdr, sdd = F.sum(F.col("d") * F.col("rev")), F.sum(F.col("d") * F.col("d").cast("double"))
    ols = daily.agg(
        n.cast("long").alias("n_days"),
        ((n * sdr - sd * sr) / (n * sdd - sd * sd)).alias("beta"),
    )
    return (
        # one aggregation over the slope pairs serves both outputs
        ols.crossJoin(
            slopes.agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.expr("percentile(slope, 0.5)").alias("_med"),
            )
        )
        .select(
            "n_days",
            "n_pairs",
            F.round("_med", 4).alias("theil_sen_slope"),
            F.round("beta", 4).alias("ols_slope"),
        )
    )


# -- round 8: k-core decomposition + proportion inference --------------------


def _kcore_round_sql(prev: str, cur: str, k: int) -> str:
    return f"""
    {cur} AS (
      SELECT e.src AS node, CAST(count(*) AS BIGINT) AS degree
      FROM sym e
      JOIN {prev} a ON e.src = a.node
      JOIN {prev} b ON e.dst = b.node
      GROUP BY e.src HAVING count(*) >= {k}
    )"""


@register(
    "graph_kcore_peel",
    sql=f"""
    WITH {_EDGES_CTE},
    core0 AS (SELECT node, degree FROM deg WHERE degree >= 2),
    {_kcore_round_sql('core0', 'core1', 2)},
    {_kcore_round_sql('core1', 'core2', 2)},
    {_kcore_round_sql('core2', 'core3', 2)}
    SELECT node, degree AS core_degree FROM core3 ORDER BY node
    """,
)
def graph_kcore_peel(spark, sf_dir):
    """2-core of the co-purchase graph by three peeling rounds: each
    round drops nodes whose degree WITHIN the surviving subgraph fell
    below k (removing a node can demote its neighbors — that cascade is
    why peeling iterates). Bounded rounds keep it deterministic and
    oracle-checkable (the production loop peels until a round is a
    no-op, same per-round plan); the oracle unrolls the identical three
    rounds. k-core is the standard spam/noise trim before community or
    embedding passes over co-engagement graphs.

    Scale: each round is one self-contained (edges x survivors x
    survivors) double semi-join + count — the same src-keyed shuffle
    every round. Each round's survivor frame is persist-slotted
    (bounded: one (node, degree) row per survivor): the survivor feeds
    BOTH sides of the next round's semi-joins and Catalyst does not
    share common subtrees, so without the slots the plan tree doubles
    per round (119 exchanges unrolled vs ~5 per round slotted)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    edges = _edges(spark, sf_dir)
    sym = edges.selectExpr("u AS src", "v AS dst").unionAll(
        edges.selectExpr("v AS src", "u AS dst")
    )
    core = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") >= 2)
    )
    for rnd in range(3):
        core = _persist_slot(core, f"kcore.round{rnd}")
        nodes = core.select("node")
        core = (
            sym.join(nodes.withColumnRenamed("node", "src"), "src")
            .join(nodes.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .filter(F.col("degree") >= 2)
        )
    return core.select("node", F.col("degree").alias("core_degree")).orderBy("node")


@register(
    "two_proportion_ztest",
    sql="""
    WITH halves AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 0 ELSE 1 END
               AS period,
             CASE WHEN value >= 50 THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    m AS (
      SELECT event_type, period,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(hit) AS DOUBLE) AS x
      FROM halves GROUP BY event_type, period
    )
    SELECT a.event_type,
           CAST(a.n AS BIGINT) AS n_before, CAST(b.n AS BIGINT) AS n_after,
           round(a.x / a.n, 6) AS rate_before,
           round(b.x / b.n, 6) AS rate_after,
           round((b.x / b.n - a.x / a.n)
                 / sqrt(((a.x + b.x) / (a.n + b.n))
                        * (1 - (a.x + b.x) / (a.n + b.n))
                        * (1 / a.n + 1 / b.n)), 6) AS z_stat
    FROM m a JOIN m b
      ON a.event_type = b.event_type AND a.period = 0 AND b.period = 1
    ORDER BY a.event_type
    """,
)
def two_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test per event type: did the rate of high-value
    events (value >= 50) shift between the first and second half of the
    window? Pooled-variance z statistic — the standard launch-readout
    test beside ab_test_welch's mean comparison. Counts are exact
    integers; the z arithmetic starts from identical doubles in both
    engines, rounded at 6 dp.

    Scale: one pass, one (event_type, period) aggregation — map-side
    combinable, 2 rows per type to the driver-free self-join."""
    e = t(spark, sf_dir, "events")
    halves = e.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("hit"),
    )
    m = halves.groupBy("event_type", "period").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("hit").cast("double").alias("x"),
    )
    a = m.filter(F.col("period") == 0).alias("a")
    b = m.filter(F.col("period") == 1).alias("b")
    pooled = (F.col("a.x") + F.col("b.x")) / (F.col("a.n") + F.col("b.n"))
    z = (F.col("b.x") / F.col("b.n") - F.col("a.x") / F.col("a.n")) / F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("a.n") + 1 / F.col("b.n"))
    )
    return (
        a.join(b, F.col("a.event_type") == F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.n").cast("long").alias("n_before"),
            F.col("b.n").cast("long").alias("n_after"),
            F.round(F.col("a.x") / F.col("a.n"), 6).alias("rate_before"),
            F.round(F.col("b.x") / F.col("b.n"), 6).alias("rate_after"),
            F.round(z, 6).alias("z_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "cuped_adjusted_ab",
    sql="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS cohort,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                      THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
               AS pre,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                      THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
               AS post
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(pre  AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(post AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(pre  AS DECIMAL(18,2)) * CAST(pre  AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(pre  AS DECIMAL(18,2)) * CAST(post AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th, sx / n AS mx
      FROM g
    ),
    m AS (
      SELECT cohort,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(post AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS mean_post,
             CAST(sum(CAST(pre  AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS mean_pre
      FROM per_user GROUP BY cohort
    )
    SELECT cohort, n_users,
           round(mean_post, 6) AS mean_post,
           round(mean_post - th * (mean_pre - mx), 6) AS mean_cuped
    FROM m, theta ORDER BY cohort
    """,
)
def cuped_adjusted_ab(spark, sf_dir):
    """CUPED variance-reduced A/B readout (the industry-standard
    covariate adjustment): per-user PRE-period value is the covariate
    for the POST-period metric; theta = cov(pre, post) / var(pre) fitted
    POOLED (the standard, unbiased-under-randomization choice), each
    cohort's adjusted mean = mean(post) - theta * (mean(pre) - grand
    mean(pre)). Moments come from exact decimal sums (value is 2-dp
    fixed point; pre*post products are exact at scale 4), so both
    engines divide IEEE-identical doubles — rounding at 6 dp is safe.

    Scale: one user-keyed aggregation (the same shuffle the experiment
    assignment rides), then 2-row cohort math against broadcast
    1-row theta — no second pass over events."""
    e = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    d2 = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, d2(F.col("value"))).otherwise(F.lit(0)))
        .cast("double")
        .alias("pre"),
        F.sum(F.when(F.col("ts") >= cut, d2(F.col("value"))).otherwise(F.lit(0)))
        .cast("double")
        .alias("post"),
    ).withColumn("cohort", F.col("user_id") % 2)
    g = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d2(F.col("pre"))).cast("double").alias("sx"),
        F.sum(d2(F.col("post"))).cast("double").alias("sy"),
        F.sum(d2(F.col("pre")) * d2(F.col("pre"))).cast("double").alias("sxx"),
        F.sum(d2(F.col("pre")) * d2(F.col("post"))).cast("double").alias("sxy"),
    )
    theta = g.select(
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("th"),
        (F.col("sx") / F.col("n")).alias("mx"),
    )
    m = per_user.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (F.sum(d2(F.col("post"))).cast("double") / F.count(F.lit(1))).alias("mean_post"),
        (F.sum(d2(F.col("pre"))).cast("double") / F.count(F.lit(1))).alias("mean_pre"),
    )
    return (
        m.crossJoin(F.broadcast(theta))
        .select(
            "cohort",
            "n_users",
            F.round("mean_post", 6).alias("mean_post"),
            F.round(
                F.col("mean_post") - F.col("th") * (F.col("mean_pre") - F.col("mx")), 6
            ).alias("mean_cuped"),
        )
        .orderBy("cohort")
    )


@register(
    "fdr_bh_screen",
    sql="""
    WITH halves AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 0 ELSE 1 END
               AS cohort
      FROM events
    ),
    sizes AS (
      SELECT event_type,
             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1
      FROM halves GROUP BY event_type
    ),
    steps AS (
      SELECT event_type, value,
             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS c0,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c1
      FROM halves GROUP BY event_type, value
    ),
    ecdf AS (
      SELECT s.event_type,
             sum(s.c0) OVER (PARTITION BY s.event_type ORDER BY s.value) / z.n0 AS f0,
             sum(s.c1) OVER (PARTITION BY s.event_type ORDER BY s.value) / z.n1 AS f1
      FROM steps s JOIN sizes z USING (event_type)
    ),
    d AS (
      SELECT e.event_type,
             round(max(abs(e.f0 - e.f1)), 6) AS ks_d,
             any_value(z.n0) AS n0, any_value(z.n1) AS n1
      FROM ecdf e JOIN sizes z USING (event_type)
      GROUP BY e.event_type
    ),
    p AS (
      SELECT event_type, ks_d,
             round(least(1.0,
               2 * exp(-2 * (n0 * n1 / (n0 + n1)) * ks_d * ks_d)), 6) AS p_value
      FROM d
    ),
    ranked AS (
      SELECT event_type, ks_d, p_value,
             row_number() OVER (ORDER BY p_value, event_type) AS rk,
             count(*) OVER () AS m
      FROM p
    ),
    kstar AS (
      SELECT coalesce(max(CASE WHEN p_value <= rk * 0.10 / m THEN rk END), 0)
               AS k FROM ranked
    )
    SELECT event_type, ks_d, p_value, CAST(rk AS BIGINT) AS rk,
           rk <= (SELECT k FROM kstar) AS rejected
    FROM ranked ORDER BY rk, event_type
    """,
)
def fdr_bh_screen(spark, sf_dir):
    """Benjamini-Hochberg FDR screen (q=0.10) over one KS test PER
    event type (did the value distribution shift between the two
    halves of the window?) — the multiple-comparisons discipline a
    metrics platform applies before alerting on m simultaneous
    segments. Per type: exact-rational ECDF sup-gap D (6 dp), the KS
    asymptotic p = min(1, 2·exp(-2·(n0·n1/(n0+n1))·D²)) from that
    ROUNDED D (identical doubles into exp in both engines), then the
    step-up rule: reject ranks <= k* = max{k: p_(k) <= k·q/m}. The
    rank/threshold pass runs over m rows (one per segment) — the
    bounded-frame exception to the no-global-window rule.

    Scale: the ECDFs are event_type-partitioned windows over DISTINCT
    values (never raw events); everything after is m-row math."""
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    e = t(spark, sf_dir, "events").select(
        "event_type", "value",
        F.when(F.col("ts") < cut, 0).otherwise(1).alias("cohort"),
    )
    sizes = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("double").alias("n1"),
    )
    steps = e.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("double").alias("c0"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("double").alias("c1"),
    )
    w = W.partitionBy("event_type").orderBy("value").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ecdf = steps.join(F.broadcast(sizes), "event_type").select(
        "event_type",
        (F.sum("c0").over(w) / F.col("n0")).alias("f0"),
        (F.sum("c1").over(w) / F.col("n1")).alias("f1"),
        "n0",
        "n1",
    )
    d = ecdf.groupBy("event_type").agg(
        F.round(F.max(F.abs(F.col("f0") - F.col("f1"))), 6).alias("ks_d"),
        F.first("n0").alias("n0"),
        F.first("n1").alias("n1"),
    )
    m_eff = F.col("n0") * F.col("n1") / (F.col("n0") + F.col("n1"))
    p = d.select(
        "event_type",
        "ks_d",
        F.round(
            F.least(F.lit(1.0), 2 * F.exp(-2 * m_eff * F.col("ks_d") * F.col("ks_d"))),
            6,
        ).alias("p_value"),
    )
    wr = W.orderBy("p_value", "event_type")
    ranked = p.select(
        "event_type", "ks_d", "p_value",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("p_value") <= F.col("rk") * 0.10 / F.col("m"), F.col("rk"))),
            F.lit(0),
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "event_type", "ks_d", "p_value",
            F.col("rk").cast("long").alias("rk"),
            (F.col("rk") <= F.col("k")).alias("rejected"),
        )
        .orderBy("rk", "event_type")
    )


# -- round 9: one-way ANOVA, Cramér's V, degree assortativity ----------------


@register(
    "anova_oneway",
    sql="""
    WITH per_user AS (
      SELECT user_id % 3 AS grp,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS s,
             CAST(sum(CAST(x * x AS DECIMAL(30,4))) AS DOUBLE) AS q
      FROM per_user GROUP BY grp
    ),
    m AS (
      SELECT CAST(sum(n) AS DOUBLE) AS nt, CAST(count(*) AS DOUBLE) AS k,
             sum(s) AS st,
             sum(s * s / CAST(n AS DOUBLE)) AS sb_part,
             sum(q) AS qt
      FROM g
    )
    SELECT CAST(nt AS BIGINT) AS n_total, CAST(k AS BIGINT) AS k_groups,
           round(sb_part - st * st / nt, 4) AS ss_between,
           round(qt - sb_part, 4) AS ss_within,
           round(((sb_part - st * st / nt) / (k - 1))
                 / ((qt - sb_part) / (nt - k)), 6) AS f_stat
    FROM m
    """,
)
def anova_oneway(spark, sf_dir):
    """One-way ANOVA F over three user cohorts' per-user spend — the
    k-group generalization of ab_test_welch (is ANY cohort's mean
    different?). The sums-of-squares identities (SSB = Σ s_g²/n_g − S²/N,
    SSW = Σ q_g − Σ s_g²/n_g) need only per-group (n, Σx, Σx²); Σx and
    Σx² stay DECIMAL through aggregation (x is an exact 2-dp decimal;
    its square is an exact 4-dp decimal, width-capped at DECIMAL(30,4)
    per the shared cross-engine rule), so both engines feed identical
    doubles into the closed-form F. The k-row group frame folds in one
    two-level aggregation — no window, no driver math.

    Scale: one user-keyed aggregation over events, one k-row rollup —
    both map-side combinable."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("x")
    ).select((F.col("user_id") % 3).alias("grp"), "x")
    g = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("double").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,4)")).cast("double").alias("q"),
    )
    m = g.agg(
        F.sum("n").cast("double").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("s").alias("st"),
        F.sum(F.col("s") * F.col("s") / F.col("n").cast("double")).alias("sb_part"),
        F.sum("q").alias("qt"),
    )
    c = F.col
    ssb = c("sb_part") - c("st") * c("st") / c("nt")
    ssw = c("qt") - c("sb_part")
    return m.select(
        c("nt").cast("long").alias("n_total"),
        c("k").cast("long").alias("k_groups"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round((ssb / (c("k") - 1)) / (ssw / (c("nt") - c("k"))), 6).alias("f_stat"),
    )


@register(
    "cramers_v_association",
    sql="""
    WITH joined AS (
      SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT seg, st, CAST(count(*) AS BIGINT) AS o FROM joined GROUP BY seg, st
    ),
    rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY seg),
    ct AS (SELECT st, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY st),
    n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cells),
    terms AS (
      SELECT CAST(round(
               (CAST(cells.o AS DOUBLE) - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / n.n)
               * (CAST(cells.o AS DOUBLE) - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / n.n)
               / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / n.n), 6)
             AS DECIMAL(18,6)) AS term
      FROM cells JOIN rt USING (seg) JOIN ct USING (st) CROSS JOIN n
    ),
    dims AS (
      SELECT CAST((SELECT count(*) FROM rt) AS DOUBLE) AS nr,
             CAST((SELECT count(*) FROM ct) AS DOUBLE) AS nc
    )
    SELECT CAST(n.n AS BIGINT) AS n_total,
           CAST(sum(term) AS DOUBLE) AS chi2,
           round(sqrt(CAST(sum(term) AS DOUBLE)
                      / (n.n * (least(dims.nr, dims.nc) - 1))), 6) AS cramers_v
    FROM terms CROSS JOIN n CROSS JOIN dims
    GROUP BY n.n, dims.nr, dims.nc
    """,
)
def cramers_v_association(spark, sf_dir):
    """Cramér's V between customer market segment and order status — the
    normalized chi-square effect size (how strongly are the two
    categoricals associated, on a 0..1 scale chi2 alone doesn't give).
    Expected counts come from exact row/column/total integers; each
    cell's (O−E)²/E is an identical double in both engines, ROUNDED to
    6 dp and summed as DECIMAL (the cross-row float-sum rule: per-cell
    values are order-free, the sum must be), then V normalizes by
    n·(min(r,c)−1).

    Scale: one fact-dim broadcast join, one (seg, status) cell
    aggregation — the contingency table is r×c rows; everything after
    is cell-count math."""
    o = t(spark, sf_dir, "orders")
    cdim = t(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(cdim), o["o_custkey"] == cdim["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    # cells feeds four consumers (row/col marginals, total, the term
    # join); the slot keeps the fact-dim join + cell count to one
    # execution (r13 plan audit: 6 orders + 6 customer scans)
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    cells = _persist_slot(cells, "graphstats.cramers_cells")
    rt = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("st").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("double").alias("n"))
    dims = rt.agg(F.count(F.lit(1)).cast("double").alias("nr")).crossJoin(
        ct.agg(F.count(F.lit(1)).cast("double").alias("nc"))
    )
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n")
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e, 6
    ).cast("decimal(18,6)")
    terms = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(n))
        .select(term.alias("term"), "n")
    )
    chi2 = F.sum("term").cast("double")
    return (
        terms.groupBy("n")
        .agg(chi2.alias("chi2"))
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("n").cast("long").alias("n_total"),
            "chi2",
            F.round(
                F.sqrt(F.col("chi2") / (F.col("n") * (F.least("nr", "nc") - 1))), 6
            ).alias("cramers_v"),
        )
    )


@register(
    "graph_assortativity",
    sql=f"""
    WITH {_EDGES_CTE},
    pairs AS (
      SELECT CAST(du.degree AS BIGINT) AS x, CAST(dv.degree AS BIGINT) AS y
      FROM sym e JOIN deg du ON du.node = e.src JOIN deg dv ON dv.node = e.dst
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x)::HUGEINT AS DOUBLE) AS sx,
             CAST(sum(y)::HUGEINT AS DOUBLE) AS sy,
             CAST(sum(x * y)::HUGEINT AS DOUBLE) AS sxy,
             CAST(sum(x * x)::HUGEINT AS DOUBLE) AS sxx,
             CAST(sum(y * y)::HUGEINT AS DOUBLE) AS syy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_endpoints,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS assortativity
    FROM m
    """,
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over the symmetrized edge list —
    positive means hubs link to hubs (social-network shape), negative
    means hubs link to leaves (the dependency/star shape). All five
    moments are INTEGER sums of integer degrees (exact in both engines;
    the oracle pins HUGEINT->BIGINT-safe casts), so the correlation is
    one closed-form double, 6 dp.

    Scale: two broadcast-joinable degree lookups on the edge list, one
    map-side-combinable moment aggregation — no window, no sort; the
    same degree-orientation bound as the triangle census governs the
    wedge join that builds the edges."""
    edges = _edges(spark, sf_dir)
    sym = G.symmetrize(edges)
    # both endpoint lookups consume the degree frame; the shared
    # "graph.degrees" slot (same artifact pagerank materializes) keeps
    # the degree aggregation to one execution across the graph family
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    deg = _persist_slot(G.degrees(edges), "graph.degrees")
    du = deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "x")
    dv = deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "y")
    pairs = sym.join(du, "src").join(dv, "dst").select(
        F.col("x").cast("long").alias("x"), F.col("y").cast("long").alias("y")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    c = F.col
    r = (c("n") * c("sxy") - c("sx") * c("sy")) / (
        F.sqrt(c("n") * c("sxx") - c("sx") * c("sx"))
        * F.sqrt(c("n") * c("syy") - c("sy") * c("sy"))
    )
    return m.select(
        c("n").cast("long").alias("n_endpoints"),
        F.round(r, 6).alias("assortativity"),
    )


# -- Poisson bootstrap -------------------------------------------------------
#
# Inverse-CDF thresholds for Poisson(1): cumulative P(K <= k) for
# k = 0..7 (past that the tail is < 1.1e-5; draws cap at 8). Computed
# once and rendered with repr() into BOTH engines' expressions, so the
# piecewise constants — and therefore every draw — are bit-identical.
import math as _math

_POIS_CUM: list[float] = []
_acc, _term = 0.0, _math.exp(-1.0)
for _k in range(8):
    _acc += _term
    _POIS_CUM.append(_acc)
    _term /= _k + 1

_BOOT_R = 40  # replicates; nearest-rank 2.5% -> index 1, 97.5% -> index 39
_TWO60 = float(1 << 60)


def _boot_sql() -> str:
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64_sql
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import davg_sql

    h = stable_hash64_sql(
        "concat_ws('|', CAST(event_id AS VARCHAR), CAST(r AS VARCHAR))",
        seed="boot",
    )
    case = "CASE " + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POIS_CUM)
    ) + " ELSE 8 END"
    return f"""
    WITH draws AS (
      SELECT event_type, value, r,
             {h} / {_TWO60!r} AS u
      FROM events CROSS JOIN generate_series(0, {_BOOT_R - 1}) AS g(r)),
    reps AS (
      SELECT event_type, r,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE) AS rep_mean
      FROM (SELECT event_type, value, r, {case} AS w FROM draws) x
      GROUP BY event_type, r),
    ci AS (
      SELECT event_type,
             (array_agg(rep_mean ORDER BY rep_mean))[1]  AS boot_p025,
             (array_agg(rep_mean ORDER BY rep_mean))[{_BOOT_R - 1}] AS boot_p975
      FROM reps GROUP BY event_type),
    base AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             {davg_sql('value', 2)} AS point_mean
      FROM events GROUP BY event_type)
    SELECT base.event_type, n_rows, point_mean, boot_p025, boot_p975
    FROM base JOIN ci USING (event_type)
    ORDER BY event_type
    """


@register("bootstrap_ci_mean", sql=_boot_sql())
def bootstrap_ci_mean(spark, sf_dir):
    """Poisson-bootstrap confidence interval for the per-event-type mean
    value — the one-pass resampling scheme for data too large to
    resample (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams"; the classical bootstrap's multinomial row counts need N
    known and a pass per replicate, Poisson(1) weights need neither).
    Each row draws its replicate-r multiplicity from a DETERMINISTIC
    hash of (event_id, r) through the Poisson(1) inverse CDF, so both
    engines materialize the identical resamples: replicate means, then
    nearest-rank 2.5%/97.5% bounds over the R=40 means per group.

    Scale: the R-way explode happens map-side and partial aggregation
    collapses it before the exchange — the shuffle carries
    O(groups x R) partial sums, never O(rows x R); the CI step sorts
    R=40 doubles per group. No data pass is repeated: one scan total,
    which is the entire point of the Poisson trick at 100 TB."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import davg, dsum

    e = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    draws = e.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
    ).withColumn(
        "u",
        stable_hash64(
            F.concat_ws(
                "|", F.col("event_id").cast("string"), F.col("r").cast("string")
            ),
            seed="boot",
        )
        / F.lit(_TWO60),
    )
    w = F.when(F.col("u") < _POIS_CUM[0], 0)
    for k in range(1, 8):
        w = w.when(F.col("u") < _POIS_CUM[k], k)
    w = w.otherwise(8)
    reps = (
        draws.withColumn("w", w)
        .groupBy("event_type", "r")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)") * F.col("w")).cast("double")
                / F.sum("w").cast("double")
            ).alias("rep_mean")
        )
    )
    ci = (
        reps.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("rep_mean")).alias("ms"))
        .select(
            "event_type",
            F.element_at("ms", 1).alias("boot_p025"),
            F.element_at("ms", _BOOT_R - 1).alias("boot_p975"),
        )
    )
    base = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        davg(F.col("value"), 2).alias("point_mean"),
    )
    return base.join(ci, "event_type").select(
        "event_type", "n_rows", "point_mean", "boot_p025", "boot_p975"
    ).orderBy("event_type")


def _lpa_round_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT node, lbl FROM (
        SELECT e.src AS node, p.lbl, count(*) AS c,
               row_number() OVER (PARTITION BY e.src
                                  ORDER BY count(*) DESC, p.lbl) AS rn
        FROM sym e JOIN {prev} p ON e.dst = p.node
        GROUP BY e.src, p.lbl) x
      WHERE rn = 1
    )"""


@register(
    "graph_label_propagation",
    sql=f"""
    WITH {_EDGES_CTE},
    lpa0 AS (SELECT node, node AS lbl FROM deg),
    {_lpa_round_sql('lpa0', 'lpa1')},
    {_lpa_round_sql('lpa1', 'lpa2')},
    {_lpa_round_sql('lpa2', 'lpa3')}
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size
    FROM lpa3 GROUP BY lbl
    ORDER BY size DESC, community
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Three synchronous label-propagation rounds on the co-purchase
    graph (operators/graph.py label_propagation) — the classic
    community-detection companion to min-label components: instead of
    the MINIMUM neighbor label (which finds connected components), each
    node adopts the MOST FREQUENT neighbor label (ties toward the
    smallest), so dense neighborhoods coalesce onto local hubs and the
    output is a community histogram, not component membership. The
    deterministic synchronous/min-tie variant lets the oracle unroll
    the identical three rounds as CTEs.

    Scale: per round one join partitioned on node id + one bounded
    (node, label) count + one argmax — the pagerank shuffle shape; no
    global sort, no driver iteration state beyond the loop counter."""
    edges = _edges(spark, sf_dir)
    return (
        G.label_propagation(edges, iters=3)
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), "community")
    )


@register(
    "mutual_information_features",
    sql="""
    WITH e AS (
      SELECT event_type AS x,
             CAST(floor(extract(hour FROM ts) / 6) AS BIGINT) AS hb
      FROM events
    ),
    j AS (SELECT x, hb, CAST(count(*) AS BIGINT) AS nxy FROM e GROUP BY x, hb),
    mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM j GROUP BY x),
    my AS (SELECT hb, CAST(sum(nxy) AS BIGINT) AS ny FROM j GROUP BY hb),
    tt AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM j),
    cells AS (
      SELECT j.x, j.hb, j.nxy,
             round(log2((CAST(j.nxy AS DOUBLE) * n) /
                        (CAST(nx AS DOUBLE) * ny)), 6) AS pmi,
             CAST(round((CAST(j.nxy AS DOUBLE) / n) *
                        log2((CAST(j.nxy AS DOUBLE) * n) /
                             (CAST(nx AS DOUBLE) * ny)), 9)
                  AS DECIMAL(12,9)) AS term
      FROM j JOIN mx USING (x) JOIN my USING (hb) CROSS JOIN tt
    ),
    mi AS (SELECT round(CAST(sum(term) AS DOUBLE), 6) AS mi_bits FROM cells)
    SELECT x AS event_type, hb AS hour_band, nxy AS n_events, pmi, mi_bits
    FROM cells, mi
    ORDER BY event_type, hour_band
    """,
)
def mutual_information_features(spark, sf_dir):
    """Exact mutual information (bits) between two categorical features
    — event type x hour-of-day band — with the per-cell pointwise MI:
    the feature-selection / leakage-audit primitive (an MI near zero
    says the feature is uninformative; a spuriously HIGH MI against a
    label is the classic leakage smell a training pipeline screens
    for). Counts are exact longs; every log2 argument is a ratio of
    exact integer products evaluated in double (bit-identical both
    engines, products <= 1e10 are exactly representable); the only libm
    variance is log2 itself, so the per-cell MI term is quantized at
    9 dp into DECIMAL before the order-free exact sum (the
    decayed_popularity discipline) and PMI is reported at 6 dp.

    Scale: ONE shuffle — the (x, y) cell count with map-side partial
    aggregation; marginals are re-aggregations of the tiny cell frame
    (|X|x|Y| rows, here 5x4) joined back broadcast; nothing about the
    event stream is shuffled twice. At 100 TB the cell frame is still
    |X|x|Y| rows."""
    e = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("x"),
        F.floor(F.hour("ts") / 6).cast("long").alias("hb"),
    )
    # r13: marginals/total/MI as WINDOW sums over the |X|x|Y|-row cell
    # frame instead of three re-aggregation branches broadcast-joined
    # back — the branches re-inlined the event-stream groupBy once per
    # consumer (8 events scans in the audited plan). Long/decimal window
    # sums are order-free, so every value is bit-identical.
    j = e.groupBy("x", "hb").agg(F.count(F.lit(1)).cast("long").alias("nxy"))
    nx = F.sum("nxy").over(W.partitionBy("x")).cast("long")
    ny = F.sum("nxy").over(W.partitionBy("hb")).cast("long")
    n = F.sum("nxy").over(W.partitionBy()).cast("long")
    ratio = (F.col("nxy").cast("double") * n) / (
        nx.cast("double") * ny
    )
    cells = j.select(
        "x", "hb", "nxy",
        F.round(F.log2(ratio), 6).alias("pmi"),
        F.round((F.col("nxy").cast("double") / n) * F.log2(ratio), 9)
        .cast("decimal(12,9)")
        .alias("term"),
    )
    return (
        cells.select(
            F.col("x").alias("event_type"),
            F.col("hb").alias("hour_band"),
            F.col("nxy").alias("n_events"),
            "pmi",
            F.round(
                F.sum("term").over(W.partitionBy()).cast("double"), 6
            ).alias("mi_bits"),
        )
        .orderBy("event_type", "hour_band")
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_sql() -> str:
    """One aggregate row of exact-decimal moments, then the 6 unordered
    pairs expanded by UNION ALL — mirrors the Spark side expression for
    expression."""
    sums = ", ".join(
        f"sum(CAST({c} AS DECIMAL(18,2))) AS s_{c}" for c in _CORR_COLS
    )
    sqs = ", ".join(
        f"sum(CAST(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)) "
        f"AS DECIMAL(38,4))) AS ss_{a}_{b}"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i:]
    )
    pair_rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            num = (
                f"(CAST(n AS DOUBLE) * CAST(ss_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            va = (
                f"(CAST(n AS DOUBLE) * CAST(ss_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            )
            vb = (
                f"(CAST(n AS DOUBLE) * CAST(ss_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            pair_rows.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, n,"
                f" round({num} / sqrt({va} * {vb}), 6) AS corr FROM m"
            )
    return (
        f"WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, {sums}, {sqs} "
        "FROM lineitem)\n"
        + "\nUNION ALL\n".join(pair_rows)
        + "\nORDER BY col_x, col_y"
    )


@register("correlation_matrix_onepass", sql=_corr_sql())
def correlation_matrix_onepass(spark, sf_dir):
    """Full Pearson correlation matrix over lineitem's four numeric
    measures in ONE scan — the wide-feature profiling primitive (what a
    feature-prep pipeline runs before dropping collinear columns): all
    4 sums + 10 cross-moments accumulate in a single map-side-combined
    aggregate (fixed-point 2 dp inputs -> 4 dp products, summed as
    EXACT decimals, so every moment is bit-identical cross-engine);
    each pairwise r then derives from the one moments row in closed
    form, with only the final sqrt/divide in double and the result
    rounded at 6 dp (1-ulp libm variance cannot flip it).

    Scale: the 100 TB story is the POINT here — computing k(k-1)/2
    correlations costs ONE pass and shuffles ONE row (15 decimal
    cells), vs k(k-1)/2 separate corr() scans; adding a column costs
    k+1 more cells, not another scan."""
    li = t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.sum(dec(c)).alias(f"s_{c}") for c in _CORR_COLS]
    aggs += [
        F.sum((dec(a) * dec(b)).cast("decimal(38,4)")).alias(f"ss_{a}_{b}")
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i:]
    ]
    m = li.agg(*aggs)
    pairs = None
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            n = F.col("n").cast("double")
            num = n * F.col(f"ss_{a}_{b}").cast("double") - F.col(
                f"s_{a}"
            ).cast("double") * F.col(f"s_{b}").cast("double")
            va = n * F.col(f"ss_{a}_{a}").cast("double") - F.col(
                f"s_{a}"
            ).cast("double") * F.col(f"s_{a}").cast("double")
            vb = n * F.col(f"ss_{b}_{b}").cast("double") - F.col(
                f"s_{b}"
            ).cast("double") * F.col(f"s_{b}").cast("double")
            row = m.select(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n"),
                F.round(num / F.sqrt(va * vb), 6).alias("corr"),
            )
            pairs = row if pairs is None else pairs.unionByName(row)
    return pairs.orderBy("col_x", "col_y")
