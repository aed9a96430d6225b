"""Pipeline-semantics queries: the reference's upsert/precombine/partition
dataflow (SURVEY.md §2 Part A) expressed as verifiable batch queries, plus
the streaming operators evaluated batch-wise (tumbling/sliding windows,
stream dedup) so the DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import precombine_latest, upsert_dataframe
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.schema_evolution import evolve_schema
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import dsum, register, t

_EVENT_COLS = ["user_id", "ts", "event_id", "event_type", "value"]


def _fmt_ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


@register(
    "upsert_latest_state",
    sql="""
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           event_id, event_type, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
    WHERE rn = 1 ORDER BY user_id
    """,
    headline=True,
)
def upsert_latest_state(spark, sf_dir):
    """The reference's core product: one live row per record key, greatest
    precombine wins (glue_job_script.py:55-56), as a batch query over the
    whole stream. Implemented with the engine's precombine operator
    (max_by aggregation — map-side combinable, one shuffle on the key;
    contrast the oracle's window row_number which must sort every row)."""
    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    latest = precombine_latest(e, ["user_id"], "ts", tie_breakers=["event_id"])
    return latest.select(
        "user_id",
        _fmt_ts("ts").alias("ts_s"),
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


@register(
    "upsert_partitioned_state",
    sql="""
    SELECT event_type, user_id, event_id, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type, user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
    WHERE rn = 1 ORDER BY event_type, user_id
    """,
)
def upsert_partitioned_state(spark, sf_dir):
    """Upsert identity = partition path + record key (Hudi non-global
    index; one live row per key per partition, glue_job_script.py:56-58)."""
    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    latest = precombine_latest(e, ["event_type", "user_id"], "ts", tie_breakers=["event_id"])
    return latest.select(
        "event_type", "user_id", "event_id", F.round("value", 2).alias("value")
    ).orderBy("event_type", "user_id")


@register(
    "upsert_merge_batches",
    sql="""
    SELECT user_id, event_id, event_type, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
    WHERE rn = 1 ORDER BY user_id
    """,
)
def upsert_merge_batches(spark, sf_dir):
    """Two-phase merge: stored = upserted first half of the stream, batch =
    second half; merged state must equal the single-pass result (the
    idempotence/composability law the streaming pipeline relies on)."""
    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    midpoint = F.lit("2024-01-15 00:00:00").cast("timestamp")
    stored = precombine_latest(
        e.filter(F.col("ts") < midpoint), ["user_id"], "ts", tie_breakers=["event_id"]
    )
    batch = e.filter(F.col("ts") >= midpoint)
    merged = upsert_dataframe(stored, batch, ["user_id"], "ts")
    return merged.select(
        "user_id", "event_id", "event_type", F.round("value", 2).alias("value")
    ).orderBy("user_id")


@register(
    "partial_update_state",
    sql="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00') x
      WHERE rn = 1
    ),
    b0 AS (
      SELECT user_id, ts, event_id, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') x
      WHERE rn = 1
    ),
    b AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS event_type,
             CASE WHEN event_id % 2 = 0 THEN NULL ELSE value END AS value
      FROM b0
    )
    SELECT coalesce(b.user_id, s.user_id) AS user_id,
           strftime(coalesce(b.ts, s.ts), '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           coalesce(b.event_id, s.event_id) AS event_id,
           coalesce(b.event_type, s.event_type) AS event_type,
           round(coalesce(b.value, s.value), 2) AS value
    FROM s FULL OUTER JOIN b ON s.user_id = b.user_id
    ORDER BY user_id
    """,
)
def partial_update_state(spark, sf_dir):
    """Partial-update upsert (operators/upsert.py partial_merge — Hudi
    PartialUpdateAvroPayload semantics): the second half of the stream
    arrives as SPARSE payloads (event_type omitted for every third event,
    value for every second — a null column means "no change"), merged
    onto the first half's full state. Each untouched column retains the
    stored value; the merged precombine is the latest. The oracle
    replays the two precombined halves and the column-wise coalesce as a
    full outer join.

    Scale: the whole merge is ONE aggregation — per-column max_by with
    null-skipping ordering — that partial-aggregates map-side; no join,
    no window sort (vs the reference's overwrite payload which this
    generalizes, glue_job_script.py:50-62)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import partial_merge

    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    midpoint = F.lit("2024-01-15 00:00:00").cast("timestamp")
    stored = precombine_latest(
        e.filter(F.col("ts") < midpoint), ["user_id"], "ts", tie_breakers=["event_id"]
    )
    latest2 = precombine_latest(
        e.filter(F.col("ts") >= midpoint), ["user_id"], "ts", tie_breakers=["event_id"]
    )
    batch = latest2.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 3 != 0, F.col("event_type")).alias("event_type"),
        F.when(F.col("event_id") % 2 != 0, F.col("value")).alias("value"),
    )
    merged = partial_merge(stored, batch, ["user_id"], "ts")
    return merged.select(
        "user_id",
        _fmt_ts("ts").alias("ts_s"),
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


@register(
    "partition_path_derivation",
    sql="""
    SELECT concat('y=', strftime(ts, '%Y'), '/m=', strftime(ts, '%m'),
                  '/d=', strftime(ts, '%d')) AS partition_path,
           count(*) AS n_rows, count(DISTINCT user_id) AS n_keys
    FROM events GROUP BY 1 ORDER BY partition_path
    """,
)
def partition_path_derivation(spark, sf_dir):
    """The reference's CustomKeyGenerator partition-path derivation
    (glue_job_script.py:57-61): event time -> Hive-style y/m/d path."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "partition_path",
            F.concat(
                F.lit("y="), F.date_format("ts", "yyyy"),
                F.lit("/m="), F.date_format("ts", "MM"),
                F.lit("/d="), F.date_format("ts", "dd"),
            ),
        )
        .groupBy("partition_path")
        .agg(F.count("*").alias("n_rows"), F.count_distinct("user_id").alias("n_keys"))
        .orderBy("partition_path")
    )


@register(
    "schema_evolution_union",
    sql="""
    SELECT event_id, user_id, round(value, 2) AS value, NULL AS event_type
    FROM events WHERE event_id % 2 = 0
    UNION ALL
    SELECT event_id, NULL AS user_id, NULL AS value, event_type
    FROM events WHERE event_id % 2 = 1
    ORDER BY event_id
    """,
)
def schema_evolution_union(spark, sf_dir):
    """A7: two micro-batches with diverged (partially overlapping) schemas
    are aligned and unioned — missing columns null-filled, new columns
    kept (glue_job_script.py:81-94, fixed semantics)."""
    e = t(spark, sf_dir, "events")
    batch_a = e.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", F.round("value", 2).alias("value")
    )
    batch_b = e.filter(F.col("event_id") % 2 == 1).select("event_id", "event_type")
    a, b = evolve_schema(batch_a, batch_b)
    return a.unionByName(b).orderBy("event_id")


@register(
    "asof_join_events_orders",
    sql="""
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           round(o_totalprice, 2) AS last_total
    FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e LEFT JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) x
    WHERE rn = 1 ORDER BY event_id
    """,
    headline=True,
)
def asof_join_events_orders(spark, sf_dir):
    """As-of join (event -> most recent order of that customer at event
    time). Spark lacks a native as-of join; the scalable implementation is
    the union-and-carry-forward pattern: tag both sides, sort each key's
    timeline once, and carry the latest order forward with
    ``last(..., ignorenulls)`` — ONE shuffle on the key, no join
    explosion, no per-event probe. (The oracle's row_number-over-join
    form would materialize |events x orders-per-user| pairs at scale.)"""
    from pyspark.sql.window import Window as W

    # SQL-text construction (selectExpr): identical parsed trees, a
    # fraction of the py4j roundtrips per plan build
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_custkey AS user_id",
        "o_orderdate AS ts",
        "o_orderkey",
        "o_totalprice",
    )
    tagged = e.selectExpr("*", "1 AS is_event").unionByName(
        o.selectExpr(
            "*", "CAST(NULL AS BIGINT) AS event_id", "0 AS is_event"
        ),
        allowMissingColumns=True,
    )
    # Timeline order: time, orders before events at the same instant
    # (<= semantics), then o_orderkey so the LAST carried order is the
    # max-orderkey one among same-date orders — matching the oracle's
    # DESC, DESC row_number tie-break.
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts, is_event, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    carried = tagged.selectExpr(
        "event_id",
        "user_id",
        "is_event",
        f"last(o_orderkey, true) {over} AS last_orderkey",
        f"last(o_totalprice, true) {over} AS last_total_raw",
    )
    return (
        carried.filter("is_event = 1")
        .selectExpr(
            "event_id",
            "user_id",
            "last_orderkey",
            "round(last_total_raw, 2) AS last_total",
        )
        .orderBy("event_id")
    )


@register(
    "tumbling_window_agg",
    headline=True,
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def tumbling_window_agg(spark, sf_dir):
    """Tumbling event-time window (F.window) evaluated batch-wise; the
    identical expression runs under ``readStream`` + watermark (see
    streaming tests). Scale: pre-aggregates per (window, type) map-side."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "sliding_window_agg",
    sql="""
    WITH starts AS (
      SELECT e.*, date_trunc('hour', ts) - INTERVAL (h.off) HOUR AS window_start
      FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS off) h
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM starts
    GROUP BY 1 ORDER BY window_start
    """,
)
def sliding_window_agg(spark, sf_dir):
    """Sliding window (2h length, 1h slide): every event lands in two
    windows. F.window generates the window set natively."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total",
        )
        .orderBy("window_start")
    )


@register(
    "stream_dedup_first_seen",
    sql="""
    SELECT user_id, event_type, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM events) x
    WHERE rn = 1 ORDER BY user_id, event_type
    """,
)
def stream_dedup_first_seen(spark, sf_dir):
    """Deterministic stream dedup: first event per (user, type) in event
    time — the batch semantics of ``dropDuplicates`` + watermark (which
    keeps the first arrival; here first-by-event-time so it's replayable)."""
    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    first = (
        e.groupBy("user_id", "event_type")
        .agg(
            F.min_by(
                F.struct("event_id", "ts"), F.struct("ts", "event_id")
            ).alias("r")
        )
        .select(
            "user_id",
            "event_type",
            F.col("r.event_id").alias("first_event_id"),
            _fmt_ts(F.col("r.ts")).alias("first_ts"),
        )
    )
    return first.orderBy("user_id", "event_type")


@register(
    "stateful_running_totals",
    sql="""
    SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stateful_running_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState) run to
    completion over the events fixture: the FINAL per-user state must
    equal the batch aggregation — the strongest oracle a stateful
    operator can have. The stream replays the fixture through a real
    checkpointed query (memory sink), then the last emission per user is
    selected."""
    import tempfile

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import running_user_totals

    staging = tempfile.mkdtemp(prefix="stateful_src_")
    ckpt = tempfile.mkdtemp(prefix="stateful_ckpt_")
    t(spark, sf_dir, "events").write.mode("overwrite").parquet(staging)

    stream = spark.readStream.format("parquet").schema(EVENTS_SCHEMA).load(staging)
    sink = "stateful_totals_sink"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql.window import Window as W

    emissions = spark.sql(f"SELECT * FROM {sink}")
    win = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emissions.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))
        .orderBy("user_id")
    )


@register(
    "scd2_validity_intervals",
    sql="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM events
    ORDER BY user_id, valid_from, event_id
    """,
)
def scd2_validity_intervals(spark, sf_dir):
    """SCD2 / CDC view of the stream: each record's validity interval
    per key ([ts, next ts)), current row flagged — the history-table
    complement of the upsert table's latest-state view. One window per
    key; at scale this materializes alongside the COW table as the
    'all versions' table (Hudi's MOR history analogue)."""
    from pyspark.sql.window import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        e.select(
            "user_id",
            "event_id",
            _fmt_ts("ts").alias("valid_from"),
            _fmt_ts(nxt).alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@register(
    "interval_join_attribution",
    sql="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click')
    SELECT v.user_id, view_id, click_id,
           epoch_us(click_ts) - epoch_us(view_ts) AS delay_us
    FROM v JOIN c
      ON v.user_id = c.user_id
     AND click_ts >= view_ts
     AND click_ts <= view_ts + INTERVAL 6 HOUR
    ORDER BY v.user_id, view_id, click_id
    """,
)
def interval_join_attribution(spark, sf_dir):
    """Stream-stream interval join (streaming/joins.py interval_join),
    evaluated batch-wise: attribute each click to the views by the same
    user in the preceding 6 hours — the impression->click correlation
    shape. The IDENTICAL composition runs under readStream with
    watermarks on both sides (tests/test_stream_stream_join.py);
    withWatermark is a no-op on batch, so this query exercises the same
    code path the streaming golden test does.

    Scale: both sides shuffle by user_id (equi-key extracted by Catalyst
    from the conjunction); the range predicate is evaluated post-match.
    Under streaming, state per side is bounded by watermark + interval
    (O(rate x 6h), independent of stream length). Delay is exact integer
    microseconds — no float time math to diverge across engines."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.joins import interval_join

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = interval_join(
        views, clicks, key="user_id", left_ts="view_ts", right_ts="click_ts",
        upper="INTERVAL 6 HOURS", watermark_delay="15 minutes",
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("delay_us"),
    ).orderBy("user_id", "view_id", "click_id")


@register(
    "asof_join_forward_tolerance",
    sql="""
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
           round(o_totalprice, 2) AS next_total
    FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate, o.o_orderkey) AS rn
          FROM events e LEFT JOIN orders o
            ON o.o_custkey = e.user_id
           AND o.o_orderdate >= e.ts
           AND o.o_orderdate <= e.ts + INTERVAL 30 DAY) x
    WHERE rn = 1 ORDER BY event_id
    """,
)
def asof_join_forward_tolerance(spark, sf_dir):
    """Forward as-of with tolerance (operators/asof.py asof_join): each
    event's NEXT order by the same customer within 30 days — the
    order-fulfillment / next-action attribution shape, and the generic
    operator's merge_asof(direction='forward', tolerance=...) parity
    surface. Same union-carry-forward plan as the backward headline
    query: one shuffle on the key, no join explosion."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.asof import asof_join

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_ts"),
        "o_orderkey",
        "o_totalprice",
    )
    j = asof_join(
        e, o, ["user_id"], "ts", "order_ts", ["o_orderkey", "o_totalprice"],
        direction="forward", tolerance="INTERVAL 30 DAYS",
        tie_breakers=["o_orderkey"],
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.round("o_totalprice", 2).alias("next_total"),
    ).orderBy("event_id")


@register(
    "stateful_session_machine",
    sql=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
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
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start_s,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start_s
    """,
)
def stateful_session_machine(spark, sf_dir):
    """Custom stateful sessionization (streaming/stateful.py
    session_state_machine — applyInPandasWithState + EventTimeTimeout)
    run to completion: the fixture streams through a real checkpointed
    query, a far-future sentinel event advances the watermark so every
    open session times out and emits, and the CLOSED session set must
    equal batch gap-sessionization — the strongest oracle a custom
    eviction operator can have (same contract as
    stateful_running_totals). Session identity is compared on
    (user, start, size, exact value total); the machine's session_end is
    last_event + gap by design and is not part of the batch shape.

    Scale: state is 4 scalars per open session; event-time timeouts
    evict exactly like watermarked session windows."""
    import tempfile
    from datetime import datetime

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import session_state_machine

    staging = tempfile.mkdtemp(prefix="sessmach_src_")
    ckpt = tempfile.mkdtemp(prefix="sessmach_ckpt_")
    e = t(spark, sf_dir, "events")
    e.write.mode("overwrite").parquet(staging)
    # sentinel: far-future event for a reserved user id — advances the
    # watermark past every real session's close time; its own (still
    # open) session never emits
    spark.createDataFrame(
        [(10**9, datetime(2030, 1, 1), -1, "sentinel", 0.0, "{}")],
        schema=EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .load(staging)
        .withWatermark("ts", "0 seconds")
    )
    sink = "sessmach_sink"
    q = (
        session_state_machine(stream, gap_seconds=12 * 3600)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    return (
        spark.sql(f"SELECT * FROM {sink}")
        .filter(F.col("user_id") != -1)
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start_s"
            ),
            "n_events",
            F.round("total_value", 2).alias("total_value"),
        )
        .orderBy("user_id", "session_start_s")
    )
