"""Event-stream product analytics: funnel conversion, retention cohorts,
statistical outliers — the analytic shapes a clickstream table (the
reference's actual data product) is queried with, each DuckDB-oracled.

Determinism: counts are exact integers; moments use the exact-decimal
discipline (queries/base.py) — ``value`` is 2-dp fixed-point, so sums of
value and value² are exact decimals at scales 2 and 4; the
double-arithmetic that follows starts from IEEE-identical inputs in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t


@register(
    "funnel_conversion",
    headline=True,  # longitudinal perf tracking for the analytics family
    sql="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.ts1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.ts2
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS stage_no, 'view' AS stage, count(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'view>click', count(*) FROM s2
      UNION ALL
      SELECT 3, 'view>click>purchase', count(*) FROM s3
    ) ORDER BY stage_no
    """,
)
def funnel_conversion(spark, sf_dir):
    """Sequential funnel: users who viewed, then clicked AFTER their
    first view, then purchased AFTER that click — order matters (a
    purchase before the click does not count), which is what makes this
    a sequence-pattern query and not three filters. Each stage is one
    aggregation on user_id; the stage joins carry one timestamp per
    user, so at scale this is three slim shuffles on the same key —
    co-partitioned end to end, never a shuffle of raw events per stage
    beyond the first.

    Reference tie-in: the clickstream table this engine serves IS the
    funnel's input (events fixture = the stream A1 ingests).

    Plan shape (r13 optimization): the naive stage-join formulation
    evaluated s1 three times and s2 twice (Catalyst shares no common
    subtrees) — 6 scans of events and 5 user-key Exchanges. The funnel
    is instead computed in ONE pass: partition-only windows over
    user_id derive ts1 (min view), then ts2 (min click strictly after
    ts1), then ts3 (min purchase strictly after ts2) — a user absent
    from stage k has a NULL ts_k, exactly the inner-join semantics —
    and one count of non-null ts_k per stage replaces the three
    aggregation branches. One events scan, one Exchange, one sort.
    ``count(tsK)`` counts each stage's distinct users because the
    per-user rows are first collapsed by a (shuffle-free, same
    partitioning) groupBy."""
    # SQL-text construction (selectExpr): identical parsed trees, one
    # parser roundtrip per expression — this build was ~300 py4j gateway
    # roundtrips of Column-by-Column assembly per call
    e = t(spark, sf_dir, "events")
    over_u = "OVER (PARTITION BY user_id)"
    ev = e.filter(
        "event_type IN ('view', 'click', 'purchase')"
    ).selectExpr("user_id", "event_type", "ts")
    ts1 = ev.selectExpr(
        "*", f"min(CASE WHEN event_type = 'view' THEN ts END) {over_u} AS ts1"
    )
    ts2 = ts1.selectExpr(
        "*",
        "min(CASE WHEN event_type = 'click' AND ts > ts1 THEN ts END) "
        f"{over_u} AS ts2",
    )
    ts3 = ts2.selectExpr(
        "*",
        "min(CASE WHEN event_type = 'purchase' AND ts > ts2 THEN ts END) "
        f"{over_u} AS ts3",
    )
    per_user = ts3.groupBy("user_id").agg(
        F.expr("first(ts1) AS ts1"),
        F.expr("first(ts2) AS ts2"),
        F.expr("first(ts3) AS ts3"),
    )
    counts = per_user.agg(
        F.expr("count(ts1) AS n1"),
        F.expr("count(ts2) AS n2"),
        F.expr("count(ts3) AS n3"),
    )
    stages = counts.selectExpr(
        "explode(array("
        "struct(1 AS stage_no, 'view' AS stage, n1 AS n_users), "
        "struct(2 AS stage_no, 'view>click' AS stage, n2 AS n_users), "
        "struct(3 AS stage_no, 'view>click>purchase' AS stage, n3 AS n_users)"
        ")) AS s"
    ).selectExpr("s.stage_no", "s.stage", "s.n_users")
    return stages.orderBy("stage_no").select("stage", "n_users")


@register(
    "retention_cohorts",
    sql="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7
                  AS BIGINT) AS week_offset
      FROM events e JOIN first_seen f USING (user_id)
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_offset,
           count(*) AS n_active
    FROM activity GROUP BY cohort, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts: users grouped by the week of their
    FIRST event; each (cohort, week-offset) cell counts distinct users
    active that many weeks later — the classic retention triangle.
    Offsets derive from week-truncated timestamps (integer day
    difference // 7), so both engines compute identical integers.

    Scale: one aggregation for first-seen (slim: one row per user,
    broadcast-joinable), one distinct on (user, offset) cells, one cell
    rollup — raw events shuffle once."""
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort"))
                .cast("long") / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_outliers_zscore",
    sql="""
    WITH stats AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
             (e.value - s.s1 / s.n)
               / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) AS zs
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_id, event_type, value, round(zs, 4) AS zscore
    FROM z WHERE zs > 3.0 OR zs < -3.0
    ORDER BY event_id
    """,
)
def events_outliers_zscore(spark, sf_dir):
    """Statistical outlier detection: events whose value is more than 3
    population standard deviations from their event_type's mean. The
    moments come from EXACT decimal sums (value is 2-dp fixed-point, so
    sum and sum-of-squares are exact at scales 2 and 4 — the dsum
    discipline); the double arithmetic after the cast starts from
    IEEE-identical inputs, so both engines flag the identical rows.

    Scale: one map-side-combined aggregation per event_type (5 rows)
    broadcast back onto the events — the single-plan scalar pattern;
    no second scan, no driver collect."""
    e = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    zs = (F.col("value") - mean) / std
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            zs.alias("zs"),
        )
        .filter((F.col("zs") > 3.0) | (F.col("zs") < -3.0))
        .select("event_id", "event_type", "value", F.round("zs", 4).alias("zscore"))
        .orderBy("event_id")
    )


@register(
    "path_transitions",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n_transitions
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY from_type, to_type
    """,
)
def path_transitions(spark, sf_dir):
    """Clickstream path analysis: counts of consecutive event-type
    transitions along each user's timeline (the Markov-chain view of the
    stream — what follows what). Ordering ties break on event_id so both
    engines see the identical sequence. One shuffle on user_id serves
    the lead() window; the transition rollup aggregates 25 cells.

    With funnel_conversion / retention_cohorts / events_outliers_zscore
    this completes the product-analytics family over the events table
    the reference pipeline exists to serve."""
    from pyspark.sql.window import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        ordered.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


@register(
    "time_weighted_avg",
    headline=True,  # longitudinal perf tracking for the analytics family
    sql="""
    WITH seg AS (
      SELECT user_id, value, ts, event_id,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,2)) AS v,
             epoch_us(next_ts) - epoch_us(ts) AS dt
      FROM seg WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           count(*) AS n_segments,
           round(CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE), 6)
             AS twa_value
    FROM w GROUP BY user_id
    HAVING sum(dt) > 0
    ORDER BY user_id
    """,
)
def time_weighted_avg(spark, sf_dir):
    """Time-weighted average of ``value`` per user (the time-series
    aggregate where each observation holds until the next one — a plain
    avg over-weights bursts): each segment weighs its value by its
    microsecond duration. Exactness discipline: value is 2-dp
    fixed-point and durations are integer microseconds, so
    sum(value*dt) and sum(dt) are EXACT decimals/integers in both
    engines; the single division of identical doubles is IEEE-identical
    and the 6-dp rounding an identity-class round.

    Scale: one shuffle on user_id serves the lead() window AND the
    per-user aggregation (same key — no second exchange)."""
    # SQL-text construction (selectExpr/expr): identical parsed trees, a
    # fraction of the py4j roundtrips per plan build
    e = t(spark, sf_dir, "events")
    seg = e.selectExpr(
        "user_id",
        "CAST(value AS DECIMAL(18,2)) AS v",
        "unix_micros(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
        " - unix_micros(ts) AS dt",
    ).filter("dt IS NOT NULL")
    return (
        seg.groupBy("user_id")
        .agg(
            F.expr("count(1) AS n_segments"),
            F.expr(
                "CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE) AS _twa"
            ),
            F.expr("sum(dt) AS _sdt"),
        )
        .filter("_sdt > 0")
        .selectExpr("user_id", "n_segments", "round(_twa, 6) AS twa_value")
        .orderBy("user_id")
    )


@register(
    "resample_locf_daily",
    sql="""
    WITH daily AS (
      SELECT user_id, day, v FROM (
        SELECT user_id, date_trunc('day', ts) AS day, value AS v,
               row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    ),
    bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    joined AS (
      SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value
    FROM joined
    ORDER BY user_id, day
    """,
)
def resample_locf_daily(spark, sf_dir):
    """Daily resampling with gap fill by last-observation-carried-forward
    (the time_bucket_gapfill + locf pattern): one row per (user, day)
    from each user's first to last active day; silent days carry the
    latest prior day's closing value (per-day close = arg-max by
    (ts, event_id) — deterministic). No leading NULLs by construction
    (the spine starts at the user's first active day).

    Scale: the spine derives from per-user (min, max) bounds — one slim
    aggregation — and explodes day sequences row-locally; the LOCF
    window and the daily aggregation share the user_id shuffle key."""
    from pyspark.sql.window import Window as W

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.max_by(F.col("value"), F.struct(F.col("ts"), F.col("event_id"))).alias("v")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        joined.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.last("v", ignorenulls=True).over(w), 2).alias("value"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "value_histogram",
    sql="""
    WITH b AS (
      SELECT min(value) AS lo, max(value) AS hi FROM events
    ),
    bucketed AS (
      SELECT event_type,
             CASE WHEN hi = lo THEN 0
                  ELSE least(
                    CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9)
             END AS bucket
      FROM events, b
    )
    SELECT event_type, bucket, count(*) AS n
    FROM bucketed GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def value_histogram(spark, sf_dir):
    """Per-event-type value distribution: 10 equal-width buckets over the
    GLOBAL [min, max] (shared edges make the per-type histograms
    comparable); the max value folds into the last bucket via least().
    Bucket ids come from identical IEEE arithmetic on identical doubles
    in both engines — integer outputs, no rounding hazard.

    Scale: the bounds are one tiny broadcast aggregate; bucketing is a
    codegen'd row expression; the rollup aggregates 50 cells. Degenerate
    range (hi == lo, all values equal) is guarded to bucket 0 in both
    engines — unguarded, Spark's double division yields NaN -> NULL
    buckets while DuckDB's CAST(NaN AS BIGINT) errors (divergent edge)."""
    e = t(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        e.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / 10.0)
                    ).cast("long"),
                    F.lit(9).cast("long"),
                )
            )
            .alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "rfm_segmentation",
    sql="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS recency,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    seg AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY recency, o_custkey) AS r_seg,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_seg,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_seg
      FROM rfm
    )
    SELECT r_seg, f_seg, m_seg, CAST(count(*) AS BIGINT) AS n_customers
    FROM seg GROUP BY r_seg, f_seg, m_seg
    ORDER BY r_seg, f_seg, m_seg
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: per customer recency (latest order
    date), frequency (order count), monetary (exact decimal spend),
    each quartiled with ntile(4) under a TOTAL order (metric, custkey)
    so bucket boundaries are deterministic; output is the 4x4x4 segment
    census. Spark and DuckDB share the ntile definition (count-balanced
    buckets over the window order), and the monetary sum is the exact
    decimal pattern (FIXTURES.md rule).

    Scale: one groupBy(custkey) over orders; the three quartile
    assignments come from operators/skew.py distributed_ntile
    (quantile-bucketed per-bucket windows + broadcast offsets + the
    closed-form tile) — bit-identical to ``ntile(4) OVER (ORDER BY
    metric, custkey)`` with NO single-partition sort. Recency (a
    timestamp) rides through ``unix_micros`` — an order-isomorphic
    integer, so the total order and the tile assignment are unchanged."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_ntile

    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("recency"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("monetary"),
    ).withColumn(
        "_rec_days", F.unix_micros(F.col("recency").cast("timestamp"))
    )
    seg = rfm
    for metric, out in (("_rec_days", "r_seg"), ("frequency", "f_seg"), ("monetary", "m_seg")):
        seg = distributed_ntile(seg, 4, metric, tie_breakers=["o_custkey"], out=out)
    return (
        seg.groupBy("r_seg", "f_seg", "m_seg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("r_seg", "f_seg", "m_seg")
    )


@register(
    "dq_drift_psi",
    sql="""
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    bucketed AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 'before' ELSE 'after' END AS period,
             CASE WHEN hi = lo THEN 0
                  ELSE least(
                    CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9)
             END AS bucket
      FROM events, b
    ),
    cells AS (
      SELECT event_type, period, bucket, count(*) AS n
      FROM bucketed GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT event_type, period, CAST(sum(n) AS DOUBLE) AS tot
      FROM cells GROUP BY 1, 2
    ),
    grid_seed AS (
      SELECT tb.event_type, tb.bucket, pp.period
      FROM (SELECT DISTINCT event_type, bucket FROM cells) tb
      CROSS JOIN (SELECT unnest(['before', 'after']) AS period) pp
    ),
    grid AS (
      SELECT g.event_type, g.bucket, g.period,
             coalesce(c.n / tt.tot, 0.0) AS share
      FROM grid_seed g
      JOIN tot tt ON tt.event_type = g.event_type AND tt.period = g.period
      LEFT JOIN cells c ON c.event_type = g.event_type
                       AND c.bucket = g.bucket AND c.period = g.period
    ),
    shares AS (
      SELECT event_type, bucket,
             greatest(max(CASE WHEN period = 'before' THEN share END), 1e-6)
               AS pb,
             greatest(max(CASE WHEN period = 'after' THEN share END), 1e-6)
               AS pa
      FROM grid GROUP BY event_type, bucket
    )
    SELECT event_type,
           round(CAST(sum(CAST(round((pa - pb) * ln(pa / pb), 9)
                      AS DECIMAL(12,9))) AS DOUBLE), 6) AS psi,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM shares GROUP BY event_type ORDER BY event_type
    """,
)
def dq_drift_psi(spark, sf_dir):
    """Distribution-drift monitor: population stability index of the
    per-type value distribution, first half of the stream vs second,
    over the SAME 10 global equi-width buckets value_histogram uses
    (shared edges are what makes the two periods comparable). Empty
    cells clamp to 1e-6 before the log ratio (the standard PSI floor);
    psi < 0.1 reads "stable", > 0.25 "shifted" — the alerting signal a
    continuously-ingesting pipeline computes per micro-batch window
    against its training-time reference.

    Scale: two tiny broadcast aggregates (bounds, period totals), one
    (type, period, bucket) cell count — at most types x 20 cells shuffle
    regardless of stream size; the dense grid join runs on the CELLS,
    never the events."""
    e = t(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    midpoint = F.lit("2024-01-15 00:00:00").cast("timestamp")
    bucket = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 10.0)
                ).cast("long"),
                F.lit(9).cast("long"),
            )
        )
    )
    cells = (
        e.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.when(F.col("ts") < midpoint, "before").otherwise("after").alias(
                "period"
            ),
            bucket.alias("bucket"),
        )
        .groupBy("event_type", "period", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # cells feeds three consumers (totals, the dense-grid distinct, the
    # left join back); the slot keeps the events scan + cell count to
    # one execution (r13 plan audit: 6 events scans in this plan)
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    cells = _persist_slot(cells, "analytics.psi_cells")
    tot = cells.groupBy("event_type", "period").agg(
        F.sum("n").cast("double").alias("tot")
    )
    periods = spark.createDataFrame([("before",), ("after",)], "period string")
    grid = (
        cells.select("event_type", "bucket")
        .distinct()
        .crossJoin(periods)
        .join(F.broadcast(tot), ["event_type", "period"])
        .join(cells, ["event_type", "period", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            "period",
            F.coalesce(F.col("n") / F.col("tot"), F.lit(0.0)).alias("share"),
        )
    )
    shares = grid.groupBy("event_type", "bucket").agg(
        F.greatest(
            F.max(F.when(F.col("period") == "before", F.col("share"))),
            F.lit(1e-6),
        ).alias("pb"),
        F.greatest(
            F.max(F.when(F.col("period") == "after", F.col("share"))),
            F.lit(1e-6),
        ).alias("pa"),
    )
    return (
        shares.groupBy("event_type")
        .agg(
            # term quantized to 9dp DECIMAL before the sum so the PSI is
            # order-free (the decayed_popularity discipline): ln() is the
            # only libm variance, and a raw double sum would depend on
            # partial-aggregation order
            F.round(
                F.sum(
                    F.round(
                        (F.col("pa") - F.col("pb"))
                        * F.log(F.col("pa") / F.col("pb")),
                        9,
                    ).cast("decimal(12,9)")
                ).cast("double"),
                6,
            ).alias("psi"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
        )
        .orderBy("event_type")
    )


@register(
    "events_outliers_mad",
    sql="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med FROM events
      GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
      GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, round(d.value, 2) AS value,
           round((d.value - d.med) / (1.4826 * md.mad), 4) AS robust_z
    FROM dev d JOIN mad md USING (event_type)
    WHERE abs(d.value - d.med) > 3 * 1.4826 * md.mad
    ORDER BY event_id
    """,
)
def events_outliers_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: events
    further than 3 scaled MADs from their type's median. Unlike the
    z-score gate (events_outliers_zscore), the MAD breakdown point is
    50% — the outliers themselves cannot drag the threshold, which is
    why production DQ monitors prefer it on heavy-tailed streams. Both
    medians are exact interpolated percentiles (the quantile_cont
    parity), so both engines flag identical rows.

    Scale: two grouped exact medians (per-group column sorts over 5
    groups) + broadcast joins back; at 100 TB swap percentile_approx in
    — the gate's shape is unchanged."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 3 * 1.4826 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(
                (F.col("value") - F.col("med")) / (1.4826 * F.col("mad")), 4
            ).alias("robust_z"),
        )
        .orderBy("event_id")
    )


@register(
    "market_basket_lift",
    sql="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM items),
    brand AS (SELECT p_brand, count(*) AS n_brand FROM items GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             count(*) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(n_both AS BIGINT) AS n_both,
           round((n_both / n_orders)
                 / ((ba.n_brand / n_orders) * (bb.n_brand / n_orders)),
                 4) AS lift
    FROM pairs
    JOIN brand ba ON ba.p_brand = brand_a
    JOIN brand bb ON bb.p_brand = brand_b
    CROSS JOIN n
    WHERE n_both >= 10
    ORDER BY lift DESC, brand_a, brand_b LIMIT 25
    """,
)
def market_basket_lift(spark, sf_dir):
    """Market-basket association mining: brand co-occurrence within an
    order with lift = P(a,b) / (P(a)P(b)), top-25 supported pairs — the
    one-level Apriori join every recommendations pipeline starts from.
    Distinct (order, brand) first, so multi-line orders don't inflate
    support; the pair join is keyed on the order (baskets are small, so
    the per-order pair expansion is bounded by basket² not corpus²).

    Scale: the basket self-join shuffles on l_orderkey (co-partitioned
    with the distinct), brand marginals and the order count broadcast;
    a hot mega-basket is the cap_bucket_size case if baskets were
    unbounded."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    # items feeds four consumers (order count, brand marginals, both
    # self-join sides); the slot keeps the lineitem scan + distinct to
    # one execution (r13 plan audit: 5 lineitem + 5 part scans)
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    items = _persist_slot(
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct(),
        "analytics.basket_items",
    )
    n = items.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    brand = items.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_brand"))
    a = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ba = brand.select(F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("na"))
    bb = brand.select(F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("nb"))
    return (
        pairs.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(n))
        .filter(F.col("n_both") >= 10)
        .select(
            "brand_a",
            "brand_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                (F.col("n_both") / F.col("n_orders"))
                / ((F.col("na") / F.col("n_orders")) * (F.col("nb") / F.col("n_orders"))),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(25)
    )


@register(
    "session_funnel",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    s1 AS (
      SELECT user_id, session_id, min(ts) AS ts1 FROM sess
      WHERE event_type = 'view' GROUP BY user_id, session_id
    ),
    s2 AS (
      SELECT e.user_id, e.session_id, min(e.ts) AS ts2
      FROM sess e JOIN s1 USING (user_id, session_id)
      WHERE e.event_type = 'click' AND e.ts > s1.ts1
      GROUP BY e.user_id, e.session_id
    ),
    s3 AS (
      SELECT e.user_id, e.session_id, min(e.ts) AS ts3
      FROM sess e JOIN s2 USING (user_id, session_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.ts2
      GROUP BY e.user_id, e.session_id
    )
    SELECT stage, n_sessions FROM (
      SELECT 1 AS stage_no, 'view' AS stage, count(*) AS n_sessions FROM s1
      UNION ALL SELECT 2, 'view>click', count(*) FROM s2
      UNION ALL SELECT 3, 'view>click>purchase', count(*) FROM s3
    ) ORDER BY stage_no
    """,
)
def session_funnel(spark, sf_dir):
    """The funnel scoped to SESSIONS: a conversion only counts when
    view -> click -> purchase happen in order WITHIN one 12-hour-gap
    session — the composition of gap sessionization (sessionize_events)
    with the order-sensitive funnel (funnel_conversion), which is how
    product analytics actually defines conversion (a purchase next week
    is a new journey, not this funnel's). Stage joins carry one
    timestamp per (user, session).

    Scale: one shuffle on user_id serves the session windows; the three
    stage aggregations are slim (user, session, ts) frames
    co-partitioned on the same key."""
    from pyspark.sql import Window as SW

    e = t(spark, sf_dir, "events")
    w = SW.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: casting to whole seconds would truncate and
    # diverge from the oracle's INTERVAL comparison on sub-second edges
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 12 * 3600 * 1_000_000), 1
        ).otherwise(0).alias("is_start"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_start").over(
            SW.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(SW.unboundedPreceding, SW.currentRow)
        ),
    )
    # r13: same single-pass rewrite as funnel_conversion, scoped to the
    # session key — the stage-join form re-inlined the whole window
    # sessionization once per stage branch (6 events scans). Chained
    # partition-only windows over (user_id, session_id) derive
    # ts1/ts2/ts3 (NULL = the session dropped out at that stage, the
    # inner-join semantics), then one aggregate counts the stages. The
    # session windows already cluster by user_id, so the whole funnel
    # is ONE exchange end to end.
    ws = SW.partitionBy("user_id", "session_id")
    ts1 = sess.withColumn(
        "ts1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws)
    )
    ts2 = ts1.withColumn(
        "ts2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("ts1")),
                F.col("ts"),
            )
        ).over(ws),
    )
    ts3 = ts2.withColumn(
        "ts3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("ts2")),
                F.col("ts"),
            )
        ).over(ws),
    )
    per_sess = ts3.groupBy("user_id", "session_id").agg(
        F.first("ts1").alias("ts1"),
        F.first("ts2").alias("ts2"),
        F.first("ts3").alias("ts3"),
    )
    counts = per_sess.agg(
        F.count("ts1").alias("n1"), F.count("ts2").alias("n2"),
        F.count("ts3").alias("n3"),
    )
    out = counts.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("stage_no"), F.lit("view").alias("stage"),
                         F.col("n1").alias("n_sessions")),
                F.struct(F.lit(2).alias("stage_no"),
                         F.lit("view>click").alias("stage"),
                         F.col("n2").alias("n_sessions")),
                F.struct(F.lit(3).alias("stage_no"),
                         F.lit("view>click>purchase").alias("stage"),
                         F.col("n3").alias("n_sessions")),
            )
        ).alias("s")
    ).select("s.stage_no", "s.stage", "s.n_sessions")
    return out.orderBy("stage_no").select("stage", "n_sessions")


@register(
    "pareto_frontier_orders",
    sql="""
    WITH pts AS (
      SELECT round(o_totalprice, 2) AS price, o_orderdate AS odate,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, max(odate) OVER (ORDER BY price, odate DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS best_prev
      FROM pts
    )
    SELECT price, strftime(odate, '%Y-%m-%d') AS odate, n_orders
    FROM ranked
    WHERE best_prev IS NULL OR odate > best_prev
    ORDER BY price, odate
    """,
)
def pareto_frontier_orders(spark, sf_dir):
    """Skyline (Pareto-frontier) query: the (price, date) points no
    other order dominates — cheaper-and-at-least-as-recent or
    equally-cheap-and-strictly-more-recent. The naive skyline is an
    O(n²) dominance self-join; over distinct points sorted by
    (price ASC, date DESC), a point survives iff its date beats the
    running max of every preceding point — ONE window pass, the classic
    sort-filter-skyline algorithm as a declarative plan (both engines
    share the frame semantics, so the frontier is identical).

    Scale: dedup to distinct points, then ONE candidate per price (the
    max-date point — same-price earlier dates are dominated inside the
    group), then the running max over preceding prices comes from
    operators/skew.py distributed_running_agg (two-phase exclusive
    prefix MAX: bucket maxima fold driver-side into broadcast offsets,
    each bucket runs a bucket-partitioned window) — the skyline sweep
    with NO single-partition sort. Dates ride as unix_micros (an
    order-isomorphic long), so strict dominance comparisons are
    unchanged."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_running_agg

    o = t(spark, sf_dir, "orders")
    pts = (
        o.select(
            F.round("o_totalprice", 2).alias("price"),
            F.col("o_orderdate").alias("odate"),
        )
        .groupBy("price", "odate")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    per_price = (
        pts.withColumn("_od", F.unix_micros(F.col("odate").cast("timestamp")))
        .groupBy("price")
        .agg(F.max(F.struct("_od", "odate", "n_orders")).alias("_m"))
        .select(
            "price",
            F.col("_m._od").alias("_od"),
            F.col("_m.odate").alias("odate"),
            F.col("_m.n_orders").alias("n_orders"),
        )
    )
    ranked = distributed_running_agg(
        per_price, "price", ["_od"], ["best_prev"], agg="max", inclusive=False
    )
    return (
        ranked.filter(
            F.col("best_prev").isNull() | (F.col("_od") > F.col("best_prev"))
        )
        .select(
            "price",
            F.date_format("odate", "yyyy-MM-dd").alias("odate"),
            "n_orders",
        )
        .orderBy("price", "odate")
    )


@register(
    "histogram_equidepth",
    sql="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.50) AS q2,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    ),
    bucketed AS (
      SELECT e.event_type,
             CASE WHEN e.value <= b.q1 THEN 0
                  WHEN e.value <= b.q2 THEN 1
                  WHEN e.value <= b.q3 THEN 2
                  ELSE 3 END AS bucket
      FROM events e JOIN b USING (event_type)
    )
    SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
    FROM bucketed GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def histogram_equidepth(spark, sf_dir):
    """Equi-depth (equi-height) histogram per event type: quartile
    boundaries from exact interpolated percentiles, rows bucketed by
    broadcast comparison — the ANALYZE-style histogram optimizers use
    for selectivity (the equi-WIDTH complement is value_histogram;
    equal-depth adapts bin edges to the data so every bin carries
    signal). Spark percentile == DuckDB quantile_cont on identical
    doubles, so boundaries and every bucket decision match exactly.

    Scale: one percentile aggregate per type broadcast into a row-local
    CASE; swap percentile_approx in at 100 TB unchanged (the
    curriculum_phases pattern)."""
    e = t(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.50)).alias("q2"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    bucket = (
        F.when(F.col("value") <= F.col("q1"), 0)
        .when(F.col("value") <= F.col("q2"), 1)
        .when(F.col("value") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        e.join(F.broadcast(b), "event_type")
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "ewma_user_value",
    sql="""
    WITH seq AS (
      SELECT user_id, value,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           round(sum(CASE WHEN rn = 1 THEN pow(0.9, n - 1) * value
                          ELSE 0.1 * pow(0.9, n - rn) * value END), 6)
             AS ewma
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
)
def ewma_user_value(spark, sf_dir):
    """Exponentially-weighted moving average of each user's value stream
    (alpha = 0.1 smoothing): the recursive filter
    EWMA_n = 0.1*x_n + 0.9*EWMA_{n-1} unrolled to its closed-form
    weighted sum, so the sequential recursion becomes ONE window pass +
    ONE aggregation — the trick that makes an inherently serial
    time-series smoother embarrassingly parallel per key. Weights are
    identical pow() doubles in both engines; the 6-dp round absorbs
    summation-order ulps.

    Scale: one shuffle on user_id serves the ordering window and the
    weighted sum; no recursion, no per-row state."""
    from pyspark.sql import Window as SW

    e = t(spark, sf_dir, "events")
    w = SW.partitionBy("user_id").orderBy("ts", "event_id")
    wn = SW.partitionBy("user_id")
    seq = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.9), F.col("n") - 1)
    ).otherwise(0.1 * F.pow(F.lit(0.9), F.col("n") - F.col("rn")))
    return (
        seq.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.round(F.sum(weight * F.col("value")), 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


@register(
    "activity_islands",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    tagged AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    )
    SELECT user_id,
           strftime(min(d), '%Y-%m-%d') AS island_start,
           strftime(max(d), '%Y-%m-%d') AS island_end,
           CAST(count(*) AS BIGINT) AS n_days
    FROM tagged GROUP BY user_id, grp
    ORDER BY user_id, island_start
    """,
)
def activity_islands(spark, sf_dir):
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active
    calendar days (the streak metric — "active 5 days in a row"). The
    classic date-minus-row_number trick: within a user, consecutive days
    share (day - rank), so one window plus one aggregation finds every
    island — no self-join, no recursion. Calendar-day islands complement
    sessionize_events' timestamp-gap sessions.

    Scale: distinct (user, day) first (events collapse to at most
    users x days rows), then one shuffle on user_id serves the window
    and the island rollup."""
    from pyspark.sql import Window as SW

    e = t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = SW.partitionBy("user_id").orderBy("d")
    tagged = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        tagged.groupBy("user_id", "grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("island_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .drop("grp")
        .orderBy("user_id", "island_start")
    )


@register(
    "dau_wau_stickiness",
    sql="""
    WITH activity AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events
    ),
    spine AS (SELECT DISTINCT d FROM activity),
    dau AS (SELECT d, count(*) AS dau FROM activity GROUP BY d),
    wau AS (
      SELECT s.d, count(DISTINCT a.user_id) AS wau
      FROM spine s JOIN activity a
        ON a.d BETWEEN s.d - INTERVAL 6 DAY AND s.d
      GROUP BY s.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day,
           CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           round(CAST(dau AS DOUBLE) / wau, 4) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    ORDER BY day
    """,
)
def dau_wau_stickiness(spark, sf_dir):
    """DAU / WAU / stickiness: daily active users, 7-day rolling
    distinct actives, and their ratio — THE product engagement triple.
    Rolling DISTINCT cannot ride an ordinary window frame (distinct
    isn't decomposable over overlapping frames), so WAU is a day-spine
    range join over the deduped (day, user) activity — the standard
    exact formulation; swap an HLL sketch union in at extreme scale.

    Scale: events collapse to distinct (day, user) first; the range
    join fans each activity row to <= 7 spine days (bounded window, not
    a cross join); both aggregations are map-side combinable."""
    e = t(spark, sf_dir, "events")
    activity = e.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"), "user_id"
    ).distinct()
    spine = activity.select("d").distinct().withColumnRenamed("d", "sd")
    dau = activity.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    wau = (
        spine.join(
            activity,
            (F.col("d") <= F.col("sd"))
            & (F.col("d") >= F.date_sub(F.col("sd"), 6)),
        )
        .groupBy("sd")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.sd)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "conversion_latency_quartiles",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.first_view
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT CAST(date_diff('second', v.first_view, p.first_purchase)
                  AS BIGINT) AS latency_s
      FROM v JOIN p USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converters,
           round(quantile_cont(latency_s, 0.25) / 3600.0, 4) AS p25_hours,
           round(quantile_cont(latency_s, 0.50) / 3600.0, 4) AS p50_hours,
           round(quantile_cont(latency_s, 0.75) / 3600.0, 4) AS p75_hours
    FROM lat
    """,
)
def conversion_latency_quartiles(spark, sf_dir):
    """Time-to-convert distribution: for every user whose first purchase
    follows their first view, the view->purchase latency quartiles — the
    "how long does the funnel take" companion to funnel_conversion's
    "how many make it". Latencies are integer seconds (identical in both
    engines), so the interpolated quartiles are bit-identical before the
    hour conversion and round.

    Scale: two slim per-user aggregations co-partitioned on user_id; the
    quartiles run over |converters| rows."""
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = v.join(p, "user_id").select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converters"),
        F.round(F.percentile("latency_s", F.lit(0.25)) / 3600.0, 4).alias("p25_hours"),
        F.round(F.percentile("latency_s", F.lit(0.50)) / 3600.0, 4).alias("p50_hours"),
        F.round(F.percentile("latency_s", F.lit(0.75)) / 3600.0, 4).alias("p75_hours"),
    )


@register(
    "attribution_multi_touch",
    sql="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts, value AS conv_value
      FROM events WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT user_id, event_id AS touch_id, ts AS touch_ts,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    j AS (
      SELECT c.conv_id, c.conv_value, c.conv_ts, t.touch_id, t.touch_ts,
             t.channel
      FROM conv c JOIN tch t USING (user_id)
      WHERE t.touch_ts < c.conv_ts
        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    ),
    s AS (
      SELECT *,
        row_number() OVER (PARTITION BY conv_id
                           ORDER BY touch_ts, touch_id) AS rn_first,
        row_number() OVER (PARTITION BY conv_id
                           ORDER BY touch_ts DESC, touch_id DESC) AS rn_last,
        count(*) OVER (PARTITION BY conv_id) AS n_touches,
        power(2.0, -CAST((epoch_us(conv_ts) - epoch_us(touch_ts))
                         // 86400000000 AS DOUBLE)) AS w
      FROM j
    ),
    s2 AS (SELECT *, sum(w) OVER (PARTITION BY conv_id) AS wsum FROM s)
    SELECT channel,
      CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS first_conv,
      CAST(sum(CAST(CASE WHEN rn_first = 1 THEN conv_value ELSE 0 END
                    AS DECIMAL(18,2))) AS DOUBLE) AS first_val,
      CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS last_conv,
      CAST(sum(CAST(CASE WHEN rn_last = 1 THEN conv_value ELSE 0 END
                    AS DECIMAL(18,2))) AS DOUBLE) AS last_val,
      round(sum(1.0 / n_touches), 4) AS linear_conv,
      round(sum(conv_value / n_touches), 4) AS linear_val,
      round(sum(w / wsum), 4) AS decay_conv,
      round(sum(conv_value * w / wsum), 4) AS decay_val
    FROM s2 GROUP BY channel ORDER BY channel
    """,
)
def attribution_multi_touch(spark, sf_dir):
    """Multi-touch marketing attribution, four credit models in one
    pass: each purchase distributes credit over the user's touches
    (view/click/signup) in the prior 7 days — first-touch and last-touch
    (all credit to one touch, tie-broken by event id), linear (1/n
    each), and time-decay (weight 2^-age_days, normalized per
    conversion). Output is per-channel credited conversions and credited
    revenue under every model, so the models can be compared in one
    scan.

    Determinism: decay weights are dyadic rationals (exact doubles, so
    the per-conversion weight sum is exact in any order); first/last
    revenue uses exact decimal sums; fractional-credit sums round at
    4 dp.

    Scale: the touch<->conversion pairing is an equi-join on user_id
    with a range predicate — one shuffle, bounded per-user fan-out (a
    7-day lookback); windows partition by conversion id, never a global
    sort. Reference tie-in: the clickstream this engine ingests (A1) is
    exactly this query's input."""
    e = t(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.col("value").alias("conv_value"),
    )
    tch = e.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    j = conv.join(tch, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    by_conv = W.partitionBy("conv_id")
    s = (
        j.withColumn(
            "rn_first",
            F.row_number().over(by_conv.orderBy("touch_ts", "touch_id")),
        )
        .withColumn(
            "rn_last",
            F.row_number().over(
                by_conv.orderBy(F.desc("touch_ts"), F.desc("touch_id"))
            ),
        )
        .withColumn("n_touches", F.count(F.lit(1)).over(by_conv))
        .withColumn(
            "age_days",
            F.expr("(unix_micros(conv_ts) - unix_micros(touch_ts)) div 86400000000"),
        )
        .withColumn("w", F.pow(F.lit(2.0), -F.col("age_days").cast("double")))
        .withColumn("wsum", F.sum("w").over(by_conv))
    )
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    return (
        s.groupBy("channel")
        .agg(
            F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
            .cast("long")
            .alias("first_conv"),
            F.sum(dec(F.when(F.col("rn_first") == 1, F.col("conv_value")).otherwise(0.0)))
            .cast("double")
            .alias("first_val"),
            F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
            .cast("long")
            .alias("last_conv"),
            F.sum(dec(F.when(F.col("rn_last") == 1, F.col("conv_value")).otherwise(0.0)))
            .cast("double")
            .alias("last_val"),
            F.round(F.sum(F.lit(1.0) / F.col("n_touches")), 4).alias("linear_conv"),
            F.round(F.sum(F.col("conv_value") / F.col("n_touches")), 4).alias(
                "linear_val"
            ),
            F.round(F.sum(F.col("w") / F.col("wsum")), 4).alias("decay_conv"),
            F.round(
                F.sum(F.col("conv_value") * F.col("w") / F.col("wsum")), 4
            ).alias("decay_val"),
        )
        .orderBy("channel")
    )


@register(
    "forecast_backtest_daily",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT d, rev,
             lag(rev, 1) OVER w AS f_naive,
             lag(rev, 7) OVER w AS f_snaive,
             lag(rev, 1) OVER w
               + (lag(rev, 1) OVER w - lag(rev, 8) OVER w) / 7.0 AS f_drift
      FROM daily WINDOW w AS (ORDER BY d)
    ),
    b AS (
      SELECT * FROM lagged WHERE f_snaive IS NOT NULL AND f_drift IS NOT NULL
    )
    SELECT model, n_days, mae, mape FROM (
      SELECT 'naive' AS model, CAST(count(*) AS BIGINT) AS n_days,
             round(CAST(sum(CAST(round(abs(rev - f_naive), 9)
                   AS DECIMAL(20,9))) AS DOUBLE) / count(*), 4) AS mae,
             round(CAST(sum(CAST(round(abs(rev - f_naive) / rev, 9)
                   AS DECIMAL(12,9))) AS DOUBLE) / count(*), 6) AS mape, 1 AS ord
      FROM b
      UNION ALL
      SELECT 'seasonal_naive', CAST(count(*) AS BIGINT),
             round(CAST(sum(CAST(round(abs(rev - f_snaive), 9)
                   AS DECIMAL(20,9))) AS DOUBLE) / count(*), 4),
             round(CAST(sum(CAST(round(abs(rev - f_snaive) / rev, 9)
                   AS DECIMAL(12,9))) AS DOUBLE) / count(*), 6), 2
      FROM b
      UNION ALL
      SELECT 'drift', CAST(count(*) AS BIGINT),
             round(CAST(sum(CAST(round(abs(rev - f_drift), 9)
                   AS DECIMAL(20,9))) AS DOUBLE) / count(*), 4),
             round(CAST(sum(CAST(round(abs(rev - f_drift) / rev, 9)
                   AS DECIMAL(12,9))) AS DOUBLE) / count(*), 6), 3
      FROM b
    ) ORDER BY ord
    """,
)
def forecast_backtest_daily(spark, sf_dir):
    """Rolling-origin forecast backtest over the daily revenue series:
    three closed-form one-step forecasters — naive (yesterday),
    seasonal-naive (same weekday last week), drift (yesterday + mean
    daily change over the trailing week) — each scored on every day
    with enough history, reporting MAE and MAPE. The standard
    model-selection harness for a production forecast job, expressed
    entirely as lag windows (no recursion, no driver loop).

    Determinism: daily revenue is an exact decimal sum cast once to
    double, so both engines difference identical IEEE values; the final
    error averages round at 4/6 dp.

    Scale: the raw-orders aggregation is the distributed step; the
    ordered lag window then runs over ONE ROW PER DAY (bounded by the
    calendar, ~36k rows/century), so the unpartitioned window is safe
    by construction."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    w = W.orderBy("d")
    lagged = (
        daily.withColumn("f_naive", F.lag("rev", 1).over(w))
        .withColumn("f_snaive", F.lag("rev", 7).over(w))
        .withColumn(
            "f_drift",
            F.lag("rev", 1).over(w)
            + (F.lag("rev", 1).over(w) - F.lag("rev", 8).over(w)) / 7.0,
        )
        .filter(F.col("f_snaive").isNotNull() & F.col("f_drift").isNotNull())
    )
    # the three scorers share one tiny per-day frame; session-keyed slot
    # (operators/dedup.py) bounds cache accumulation across registry runs
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    lagged = _persist_slot(lagged, "analytics.forecast_backtest")

    def score(name: str, fcol: str, ord_: int):
        # per-day terms quantized to 9dp DECIMAL before the sum
        # (r12 order-free discipline): |err| is a difference of
        # decimal-derived doubles but the drift forecast carries a /7.0
        # quotient, so the raw double avg depended on summation order
        err = F.abs(F.col("rev") - F.col(fcol))
        return lagged.agg(
            F.lit(name).alias("model"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum(F.round(err, 9).cast("decimal(20,9)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mae"),
            F.round(
                F.sum(
                    F.round(err / F.col("rev"), 9).cast("decimal(12,9)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mape"),
            F.lit(ord_).alias("ord"),
        )

    out = (
        score("naive", "f_naive", 1)
        .unionAll(score("seasonal_naive", "f_snaive", 2))
        .unionAll(score("drift", "f_drift", 3))
        .orderBy("ord")
        .drop("ord")
    )
    return out


@register(
    "changepoint_mean_shift",
    sql="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CAST(value AS DECIMAL(18,2))) AS dv,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT d,
             sum(dv) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum_v,
             sum(n)  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum_n,
             sum(dv) OVER () AS tot_v,
             sum(n)  OVER () AS tot_n,
             row_number() OVER (ORDER BY d) AS rn,
             count(*) OVER () AS n_days
      FROM daily
    ),
    cand AS (
      SELECT d,
             CAST(rn AS BIGINT) AS days_before,
             CAST(n_days - rn AS BIGINT) AS days_after,
             CAST(cum_v AS DOUBLE) / cum_n AS mean_before,
             CAST(tot_v - cum_v AS DOUBLE) / (tot_n - cum_n) AS mean_after
      FROM pre WHERE rn >= 7 AND n_days - rn >= 7
    )
    SELECT strftime(d, '%Y-%m-%d') AS split_day,
           days_before, days_after,
           round(mean_before, 6) AS mean_before,
           round(mean_after, 6) AS mean_after,
           round(abs(mean_after - mean_before), 6) AS delta
    FROM cand
    ORDER BY abs(mean_after - mean_before) DESC, d
    LIMIT 1
    """,
)
def changepoint_mean_shift(spark, sf_dir):
    """Single changepoint detection by exhaustive mean-shift scan: for
    every candidate split day (>=7 days of history on each side), the
    difference between the mean event value before and after the split;
    the split with the largest shift wins. The closed-form (CUSUM-free)
    changepoint primitive of a drift monitor — the same cumulative-sum
    trick as the equi-depth histogram, so one window pass does all
    splits at once.

    Determinism: cumulative and total sums stay DECIMAL end-to-end
    (exact in both engines regardless of accumulation order), so the
    candidate deltas are bit-identical doubles and the argmax ordering
    cannot flip; ties on delta break by day.

    Scale: raw events aggregate once (distributed); the scan window
    runs over one row per day. Prefix sums make each candidate O(1) —
    no per-split re-aggregation, no self-join."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("dv"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    wc = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    pre = daily.select(
        "d",
        F.sum("dv").over(wc).alias("cum_v"),
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("dv").over(wall).alias("tot_v"),
        F.sum("n").over(wall).alias("tot_n"),
        F.row_number().over(W.orderBy("d")).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    )
    cand = pre.filter(
        (F.col("rn") >= 7) & (F.col("n_days") - F.col("rn") >= 7)
    ).select(
        "d",
        F.col("rn").cast("long").alias("days_before"),
        (F.col("n_days") - F.col("rn")).cast("long").alias("days_after"),
        (F.col("cum_v").cast("double") / F.col("cum_n")).alias("mean_before"),
        (
            (F.col("tot_v") - F.col("cum_v")).cast("double")
            / (F.col("tot_n") - F.col("cum_n"))
        ).alias("mean_after"),
    )
    return (
        cand.select(
            F.date_format("d", "yyyy-MM-dd").alias("split_day"),
            "days_before",
            "days_after",
            F.round("mean_before", 6).alias("mean_before"),
            F.round("mean_after", 6).alias("mean_after"),
            F.round(F.abs(F.col("mean_after") - F.col("mean_before")), 6).alias(
                "delta"
            ),
        )
        .orderBy(
            F.abs(F.col("mean_after") - F.col("mean_before")).desc(), "split_day"
        )
        .limit(1)
    )


@register(
    "autocorrelation_daily",
    sql="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS dv
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT d, dv,
             lag(dv, 1) OVER (ORDER BY d) AS l1,
             lag(dv, 7) OVER (ORDER BY d) AS l7
      FROM daily
    ),
    pairs AS (
      SELECT 1 AS lag_days, dv AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
      UNION ALL
      SELECT 7 AS lag_days, dv AS x, l7 AS y FROM lagged WHERE l7 IS NOT NULL
    ),
    m AS (
      SELECT lag_days,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY lag_days
    )
    SELECT lag_days, n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS acf
    FROM m ORDER BY lag_days
    """,
)
def autocorrelation_daily(spark, sf_dir):
    """Autocorrelation of the daily event-value series at lags 1 and 7 —
    the seasonality probe behind the forecast-backtest family (an ACF
    spike at 7 is what justifies the seasonal-naive model there). Pearson
    correlation of the series against its own lag, computed from exact
    decimal moments (daily sums and their pairwise products stay DECIMAL
    through aggregation, so both engines feed IEEE-identical doubles into
    one closed-form expression — the linreg_normal_equations discipline).

    Scale: raw events aggregate once (distributed, map-side partial);
    lags and moments run over one row per day — the window's single-
    partition sort is over a bounded calendar, never over events."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("dv")
    )
    w = W.orderBy("d")
    lagged = daily.select(
        "dv",
        F.lag("dv", 1).over(w).alias("l1"),
        F.lag("dv", 7).over(w).alias("l7"),
    )
    pairs = (
        lagged.filter(F.col("l1").isNotNull()).select(
            F.lit(1).alias("lag_days"), F.col("dv").alias("x"), F.col("l1").alias("y")
        )
    ).unionByName(
        lagged.filter(F.col("l7").isNotNull()).select(
            F.lit(7).alias("lag_days"), F.col("dv").alias("x"), F.col("l7").alias("y")
        )
    )
    m = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    c = F.col
    acf = (c("n") * c("sxy") - c("sx") * c("sy")) / (
        F.sqrt(c("n") * c("sxx") - c("sx") * c("sx"))
        * F.sqrt(c("n") * c("syy") - c("sy") * c("sy"))
    )
    return m.select(
        "lag_days", "n_pairs", F.round(acf, 6).alias("acf")
    ).orderBy("lag_days")


@register(
    "revenue_concentration_gini",
    sql="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r,
             CAST(row_number() OVER (ORDER BY r, o_custkey) AS DECIMAL(10,0)) AS i,
             row_number() OVER (ORDER BY r DESC, o_custkey DESC) AS rn_desc,
             count(*) OVER () AS n
      FROM cust
    ),
    m AS (
      SELECT CAST(max(n) AS BIGINT) AS n_customers,
             CAST(max(n) AS DOUBLE) AS n,
             CAST(sum(r) AS DOUBLE) AS tot,
             CAST(sum(i * r) AS DOUBLE) AS weighted,
             CAST(sum(CASE WHEN rn_desc <= n / 10 THEN r
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS top_r
      FROM ranked
    )
    SELECT n_customers,
           round(tot, 2) AS total_revenue,
           round((2.0 * weighted - (n + 1.0) * tot) / (n * tot), 6) AS gini,
           round(top_r / tot, 6) AS top_decile_share
    FROM m
    """,
)
def revenue_concentration_gini(spark, sf_dir):
    """Revenue-concentration summary over customers: the Gini
    coefficient by the closed-form rank formula
    ``(2*sum(i*r_i) - (n+1)*sum(r)) / (n*sum(r))`` over revenues sorted
    ascending, plus the top-decile revenue share — the whale-dependence
    numbers a marketplace health dashboard leads with. Ranks break ties
    by custkey so both engines index identically; revenue, rank*revenue
    products, and the decile sum stay exact DECIMAL until the final
    double division.

    Scale: one distributed aggregation to per-customer revenue, then
    the exact global index from operators/skew.py distributed_rank —
    quantile-bucketed per-bucket windows plus broadcast offsets, NO
    single-partition sort anywhere in the plan; the descending index is
    derived as the exact permutation complement n+1-i instead of a
    second sort."""
    o = t(spark, sf_dir, "orders")
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank

    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("r")
    )
    # exact global index WITHOUT a single-partition sort (distributed_rank
    # — quantile-bucketed, tie-safe); the descending index is the exact
    # complement n+1-i because row_number is a permutation and the
    # descending order reverses keys AND tie-breaks
    total = cust.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (
        distributed_rank(
            cust, "r", out="i_raw", buckets=32,
            method="row_number", tie_breakers=["o_custkey"],
        )
        .crossJoin(F.broadcast(total))
        .select(
            "r",
            F.col("i_raw").cast("decimal(10,0)").alias("i"),
            (F.col("n") - F.col("i_raw") + 1).alias("rn_desc"),
            "n",
        )
    )
    m = ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.max("n").cast("double").alias("n"),
        F.sum("r").cast("double").alias("tot"),
        F.sum(F.col("i") * F.col("r")).cast("double").alias("weighted"),
        F.sum(
            F.when(
                F.col("rn_desc") <= F.col("n") / F.lit(10), F.col("r")
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("top_r"),
    )
    c = F.col
    return m.select(
        "n_customers",
        F.round("tot", 2).alias("total_revenue"),
        F.round(
            (F.lit(2.0) * c("weighted") - (c("n") + F.lit(1.0)) * c("tot"))
            / (c("n") * c("tot")),
            6,
        ).alias("gini"),
        F.round(c("top_r") / c("tot"), 6).alias("top_decile_share"),
    )


@register(
    "impute_group_median",
    sql=f"""
    WITH masked AS (
      SELECT event_type,
             CASE WHEN {{h}} % 20 = 0 THEN NULL
                  ELSE CAST(value AS DECIMAL(18,2)) END AS v
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing,
             quantile_cont(CAST(v AS DOUBLE), 0.5) AS med,
             CAST(sum(v) AS DOUBLE) AS sum_present
      FROM masked GROUP BY event_type
    )
    SELECT event_type, n, n_missing,
           round(med, 4) AS median_fill,
           round((sum_present + n_missing * med) / n, 4) AS imputed_mean
    FROM stats ORDER BY event_type
    """.format(h="CAST(concat('0x', substring(md5(concat('mask|', CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT)"),
)
def impute_group_median(spark, sf_dir):
    """Group-median imputation — the standard feature-prep fill for
    missing numerics (median, not mean: robust to the same outliers the
    MAD family guards against). Missingness is synthesized
    deterministically (hash of event_id, ~5%) so the fill logic is
    exercised under an external oracle on a fixture with no natural
    nulls; the imputed mean is reconstructed in closed form from exact
    components (present-value decimal sum, missing count, median fill)
    rather than re-aggregating filled rows — one pass, no second
    shuffle.

    Scale: one map-side mask projection and one grouped aggregation;
    the exact median is the only sort-based piece and runs per group
    (approx_quantile_rank_bound documents the sketch path when groups
    outgrow it)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64

    e = t(spark, sf_dir, "events")
    masked = e.select(
        "event_type",
        F.when(
            stable_hash64(F.col("event_id").cast("string"), "mask") % 20 == 0,
            F.lit(None),
        )
        .otherwise(F.col("value").cast("decimal(18,2)"))
        .alias("v"),
    )
    stats = masked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
        F.expr("percentile(CAST(v AS DOUBLE), 0.5)").alias("med"),
        F.sum("v").cast("double").alias("sum_present"),
    )
    return stats.select(
        "event_type",
        "n",
        "n_missing",
        F.round("med", 4).alias("median_fill"),
        F.round(
            (F.col("sum_present") + F.col("n_missing") * F.col("med")) / F.col("n"),
            4,
        ).alias("imputed_mean"),
    ).orderBy("event_type")


@register(
    "ltv_cohort_curves",
    sql="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    spend AS (
      SELECT f.cohort,
             date_diff('day', f.cohort,
                       date_trunc('week', e.ts)) // 7 AS age,
             CAST(e.value AS DECIMAL(18,2)) AS v
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    monthly AS (
      SELECT cohort, age, sum(v) AS rev
      FROM spend GROUP BY cohort, age
    ),
    sized AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort
    )
    SELECT strftime(m.cohort, '%Y-%m-%d') AS cohort_week,
           m.age,
           s.cohort_users,
           CAST(sum(m.rev) OVER (PARTITION BY m.cohort ORDER BY m.age)
                AS DOUBLE) AS cum_revenue,
           round(CAST(sum(m.rev) OVER (PARTITION BY m.cohort ORDER BY m.age)
                      AS DOUBLE) / s.cohort_users, 4) AS ltv_per_user
    FROM monthly m JOIN sized s USING (cohort)
    ORDER BY cohort_week, age
    """,
)
def ltv_cohort_curves(spark, sf_dir):
    """Cohort lifetime-value curves: users cohorted by first-purchase
    week, cumulative purchase revenue per cohort by weeks-since-first
    (age), normalized per cohort user — THE growth-analytics table every
    subscription/commerce warehouse maintains, and the natural companion
    to retention_cohorts (that one counts activity, this one counts
    money).

    Exactness: revenue accumulates as DECIMAL(18,2) through both the
    weekly rollup and the running window, so the cumulative sums are
    exact in both engines and the single per-user division happens on
    identical doubles. Scale shape: one shuffle to find first purchases,
    one equi join back to purchases on user_id, a (cohort, age) rollup
    (bounded key), and a running window over the tiny rollup — the
    cumsum never touches row-level data."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    firsts = purchases.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    spend = purchases.join(firsts, "user_id").select(
        "cohort",
        F.floor(
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
        ).cast("long").alias("age"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    monthly = spend.groupBy("cohort", "age").agg(F.sum("v").alias("rev"))
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    w = W.partitionBy("cohort").orderBy("age")
    return (
        monthly.join(F.broadcast(sized), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "age",
            "cohort_users",
            F.sum("rev").over(w).cast("double").alias("cum_revenue"),
            F.round(
                F.sum("rev").over(w).cast("double") / F.col("cohort_users"), 4
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age")
    )


# -- round 8: engagement accounting + time-series gap repair -----------------


@register(
    "daily_new_vs_returning",
    sql="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS first_day
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    per_day AS (
      SELECT a.day,
             count(*) AS n_active,
             sum(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END) AS n_new
      FROM active a JOIN firsts f USING (user_id)
      GROUP BY a.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_active - n_new AS BIGINT) AS n_returning,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_distinct_users
    FROM per_day ORDER BY day
    """,
)
def daily_new_vs_returning(spark, sf_dir):
    """New-vs-returning engagement accounting: per day, distinct active
    users split into first-ever-seen and returning, plus the running
    count of distinct users to date. The running distinct is computed
    WITHOUT a distinct-over-window (quadratic state): a user is new on
    exactly one day, so cumulative distinct = running sum of the daily
    new counts — the identity that makes this O(1) state per day at
    100 TB.

    Scale: one user-keyed aggregation (first day) reusing the distinct
    shuffle, one day-keyed rollup; the final cumsum runs over the
    bounded day spine."""
    e = t(spark, sf_dir, "events")
    active = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    firsts = active.groupBy("user_id").agg(F.min("day").alias("first_day"))
    per_day = (
        active.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(
                F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
            ).cast("long").alias("n_new"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).cast("long").alias("n_returning"),
        F.sum("n_new").over(w).cast("long").alias("cum_distinct_users"),
    ).orderBy("day")


@register(
    "gapfill_interpolate",
    sql="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*), 6) AS v
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    bounds AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.day, d.v
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
    ),
    anchored AS (
      SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS filled,
           round(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * date_diff('day', pd, day)
                           / date_diff('day', pd, nd) END, 6) AS value
    FROM anchored
    ORDER BY event_type, day
    """,
)
def gapfill_interpolate(spark, sf_dir):
    """Time-bucket gap fill by LINEAR INTERPOLATION (the timescale
    ``interpolate()`` to resample_locf_daily's ``locf()``): per event
    type, a daily mean-value series over the type's [first, last] day
    spine; silent days get the straight line between the surrounding
    anchors, tagged ``filled=1``. Interior gaps only by construction
    (the spine ends at anchors), so prev/next always exist on filled
    rows.

    Determinism: anchors are exact-decimal daily means rounded at 6 dp
    BEFORE interpolating, so both engines interpolate from IEEE-
    identical inputs; day distances are integers.

    Scale: bounds are one slim aggregation; the spine explodes
    row-locally; anchor resolution is two frame-bounded window passes
    over the event_type-keyed shuffle — same key as the daily rollup."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import dsum

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.round(
            dsum(F.col("value"), 2) / F.count(F.lit(1)), 6
        ).alias("v")
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    back = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    fwd = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    day_marker = F.when(F.col("v").isNotNull(), F.col("day"))
    anchored = joined.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(day_marker, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(day_marker, ignorenulls=True).over(fwd).alias("nd"),
    )
    frac = F.datediff(F.col("day"), F.col("pd")) / F.datediff(
        F.col("nd"), F.col("pd")
    )
    return anchored.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("filled"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac
            ),
            6,
        ).alias("value"),
    ).orderBy("event_type", "day")


@register(
    "k_anonymity_audit",
    sql="""
    WITH cells AS (
      SELECT event_type,
             date_trunc('day', ts) AS day,
             CAST(floor(value / 10) AS BIGINT) AS value_band,
             count(*) AS sz
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_cells,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS n_risky_rows,
           CAST(min(sz) AS BIGINT) AS min_cell
    FROM cells GROUP BY event_type ORDER BY event_type
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit (k=5) over the quasi-identifier cell
    (event_type, day, value decile band): cells smaller than k are
    re-identification risks a release gate must suppress or generalize
    — the governance screen that runs BEFORE a dataset ships. Reports
    per-type cell census, risky cells/rows, and the minimum cell size
    (the dataset's actual k).

    Scale: one map-side-combinable aggregation on the cell key, then a
    per-type rollup — no joins, no windows."""
    e = t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("value") / 10).cast("long").alias("value_band"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    return (
        cells.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
            .cast("long")
            .alias("n_risky_cells"),
            F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("n_risky_rows"),
            F.min("sz").cast("long").alias("min_cell"),
        )
        .orderBy("event_type")
    )


@register(
    "cume_dist_spend_curve",
    sql="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS cohort,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM events GROUP BY user_id
    )
    SELECT user_id, cohort,
           round(cume_dist() OVER (PARTITION BY cohort ORDER BY x), 6) AS cd,
           round(x, 2) AS spend
    FROM per_user ORDER BY user_id
    """,
)
def cume_dist_spend_curve(spark, sf_dir):
    """cume_dist — the one ranking window function the registry had
    not pinned (rank/dense_rank/row_number/ntile/percent_rank all
    have oracled members): each user's spend position as the fraction
    of cohort rows at-or-below it, tie-inclusive by definition (ties
    share the cume_dist of their last member — identical in both
    engines). Spend is the exact decimal per-user sum cast once.

    Scale: the cohort key has TWO values, so a literal
    ``cume_dist() OVER (PARTITION BY cohort ...)`` pushes half the
    per-user table through one task at any scale. The plan instead
    uses operators/skew.py distributed_cume_dist — global value
    buckets x per-cohort broadcast offsets; the only window is
    partitioned by (cohort, bucket), parallelism cohorts x 32, and the
    math (inclusive RANGE-frame count / cohort total = rank of last
    tie / n) equals cume_dist exactly because strict bucket boundaries
    never split a tie block (VERDICT r9 item 1)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_cume_dist

    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x")
    ).select("user_id", (F.col("user_id") % 2).alias("cohort"), "x")
    with_cd = distributed_cume_dist(per_user, ["cohort"], "x", out="_cd")
    return with_cd.select(
        "user_id",
        "cohort",
        F.round(F.col("_cd"), 6).alias("cd"),
        F.round("x", 2).alias("spend"),
    ).orderBy("user_id")


@register(
    "ohlc_vwap_daily",
    sql="""
    WITH e AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, ts, event_id, value,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
      FROM events
    ),
    o AS (
      SELECT day, event_type, value AS open FROM (
        SELECT day, event_type, value,
               row_number() OVER (PARTITION BY day, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM e) x WHERE rn = 1
    ),
    c AS (
      SELECT day, event_type, value AS close FROM (
        SELECT day, event_type, value,
               row_number() OVER (PARTITION BY day, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e) x WHERE rn = 1
    ),
    a AS (
      SELECT day, event_type,
             max(value) AS high, min(value) AS low,
             CAST(count(*) AS BIGINT) AS n_trades,
             CASE WHEN sum(vol) > 0
                  THEN CAST(sum(CAST(value AS DECIMAL(18,2)) * vol) AS DOUBLE)
                       / CAST(sum(vol) AS DOUBLE) END AS vwap
      FROM e GROUP BY day, event_type
    )
    SELECT a.day, a.event_type, open, high, low, close, vwap, n_trades
    FROM a JOIN o USING (day, event_type) JOIN c USING (day, event_type)
    ORDER BY day, event_type
    """,
)
def ohlc_vwap_daily(spark, sf_dir):
    """Daily OHLC bars + volume-weighted average price per event type —
    the canonical tick-to-bar downsample (value as price, the JSON
    props.k field as volume). Open/close are min_by/max_by on the total
    (ts, event_id) order — ONE aggregation computes all six measures, no
    window over the raw ticks; the oracle cross-checks open/close via
    row_number windows. VWAP numerator is an exact decimal sum (2dp
    price x integer volume), divided by the integer volume sum as
    identical doubles in both engines; zero-volume bars yield NULL
    rather than a division artifact.

    Scale: map-side-combinable min/max/min_by/max_by/sums — one shuffle
    on (day, event_type); at 100 TB of ticks the bars are O(days x
    types), and min_by avoids the sort-per-group a window would cost."""
    e = t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type", "ts", "event_id", "value",
        F.get_json_object("props", "$.k").cast("long").alias("vol"),
    )
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("day", "event_type")
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.when(
                F.sum("vol") > 0,
                F.sum(F.col("value").cast("decimal(18,2)") * F.col("vol"))
                .cast("double") / F.sum("vol").cast("double"),
            ).alias("vwap"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select("day", "event_type", "open", "high", "low", "close", "vwap", "n_trades")
        .orderBy("day", "event_type")
    )


@register(
    "decayed_popularity",
    sql="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    w AS (
      SELECT event_type,
             CAST(value AS DECIMAL(18,2))
               * CAST(round(pow(0.5, date_diff('second', ts, (SELECT m FROM mx))
                                   / 604800.0), 5) AS DECIMAL(8,5)) AS c
      FROM events
    )
    SELECT event_type,
           round(CAST(sum(c) AS DOUBLE), 4) AS decayed_value
    FROM w GROUP BY event_type ORDER BY event_type
    """,
)
def decayed_popularity(spark, sf_dir):
    """Half-life-decayed popularity score per event type — the
    leaderboard/trending aggregation (recent activity outweighs old,
    weight halves every 7 days from the stream's newest instant).
    Determinism discipline: the decay weight pow(0.5, age/halflife) is
    QUANTIZED to 5 decimals and cast to DECIMAL before multiplying the
    fixed-point value, so every contribution is an exact decimal and
    the sum is order-free — a raw double sum would drift with shuffle
    order, the same hazard the dsum family exists for. Five decimals,
    not nine (ADVICE r11): the exponent age/604800.0 is one correctly-
    rounded IEEE division of exact inputs (bit-identical in both
    engines), so the only cross-engine variance is the pow libm call
    itself (<=1 ulp). At 5 dp a 1-ulp difference flips the rounding
    only when pow lands within ~1e-16 of a .000005 boundary —
    probability ~2e-11 per event vs ~2e-7 at 9 dp — while the score
    keeps far more precision than a trending leaderboard needs.

    Scale: one map-side-combinable aggregation; the anchor instant is
    a 1-row broadcast. Refreshing a decayed score incrementally at a
    new anchor = multiply stored state by pow(0.5, dt/h) and fold the
    delta — the same retractable-MV shape as RollupMVStore."""
    e = t(spark, sf_dir, "events").select("event_type", "ts", "value")
    mx = e.agg(F.max("ts").alias("m"))
    age_s = F.col("m").cast("long") - F.col("ts").cast("long")
    w = F.round(F.pow(F.lit(0.5), age_s / F.lit(604800.0)), 5).cast("decimal(8,5)")
    return (
        e.crossJoin(F.broadcast(mx))
        .select("event_type", (F.col("value").cast("decimal(18,2)") * w).alias("c"))
        .groupBy("event_type")
        .agg(F.round(F.sum("c").cast("double"), 4).alias("decayed_value"))
        .orderBy("event_type")
    )


@register(
    "session_path_trigrams",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    tri AS (
      SELECT lag(event_type, 2) OVER s || ' > ' ||
             lag(event_type, 1) OVER s || ' > ' || event_type AS path
      FROM sess
      WINDOW s AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM tri WHERE path IS NOT NULL
    GROUP BY path ORDER BY n DESC, path LIMIT 15
    """,
)
def session_path_trigrams(spark, sf_dir):
    """Top in-session behavioral paths: the 15 most frequent event-type
    TRIGRAMS taken inside gap-sessions (12h rule) — path mining, the
    product-analytics question "what three-step flows do users actually
    walk?" that funnels (fixed order, chosen a priori) cannot answer.
    Trigrams never cross a session boundary because the lag window
    partitions on (user, session).

    Scale: both window passes and the sessionization share the user_id
    shuffle; the trigram census is a map-side-combinable count on a
    bounded key space (|event types|^3) and the top-15 is
    TakeOrdered — no global sort of paths."""
    from pyspark.sql.window import Window as W

    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # exact microseconds — a floor-seconds diff would place a
                # gap of 12h + 0.5s on the wrong side of the oracle's
                # strict INTERVAL comparison
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 12 * 3600 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    s = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tri = sess.select(
        F.concat_ws(
            " > ",
            F.lag("event_type", 2).over(s),
            F.lag("event_type", 1).over(s),
            F.col("event_type"),
        ).alias("path"),
        F.lag("event_type", 2).over(s).alias("_p2"),
    ).filter(F.col("_p2").isNotNull())
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )
