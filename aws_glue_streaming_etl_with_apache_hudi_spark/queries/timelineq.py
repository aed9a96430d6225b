"""Timeline + sessionization queries, DuckDB-oracle-checked.

The IO side of the commit timeline (snapshot layout, time travel,
instant metadata) is covered behaviorally in tests/test_timeline.py;
the queries here pin the ALGEBRA of the incremental and CDC read paths
(operators/timeline.py) and of gap-based sessionization
(operators/sessions.py) against ANSI-SQL replays.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.sessions import session_bounds
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import (
    COMMIT_COL,
    cdc_view,
    incremental_view,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import precombine_latest
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import dsum, dsum_sql, register, t

_EVENT_COLS = ["user_id", "ts", "event_id", "event_type", "value"]
_CUT1 = "2024-01-10 00:00:00"
_CUT2 = "2024-01-20 00:00:00"


def _commit_deltas(spark, sf_dir):
    """Events replayed as the deltas of commits 2 and 3 (event-time
    thirds — commit 1 is the pre-cut1 bootstrap, as in mor_merge_chain)."""
    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    cut1 = F.lit(_CUT1).cast("timestamp")
    cut2 = F.lit(_CUT2).cast("timestamp")
    d2 = e.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)).withColumn(
        COMMIT_COL, F.lit(2)
    )
    d3 = e.filter(F.col("ts") >= cut2).withColumn(COMMIT_COL, F.lit(3))
    pre = precombine_latest(e.filter(F.col("ts") < cut1), ["user_id"], "ts")
    return pre, d2, d3


@register(
    "incremental_pull",
    sql=f"""
    SELECT user_id, _commit_id, event_id, event_type,
           round(value, 2) AS value
    FROM (SELECT user_id, event_id, event_type, value,
                 CASE WHEN ts >= TIMESTAMP '{_CUT2}' THEN 3 ELSE 2 END AS _commit_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts >= TIMESTAMP '{_CUT1}') x
    WHERE rn = 1 ORDER BY user_id
    """,
)
def incremental_pull(spark, sf_dir):
    """Hudi-style incremental query (operators/timeline.py
    ``incremental_view``): latest state of every record upserted in
    commit range (1, 3], tagged with the producing instant. Reads only
    the in-range deltas — the 100 TB consumer pattern ("what changed
    since instant T") that never scans the table. Reference delegates
    this to Hudi's timeline (glue_job_script.py:53-62)."""
    _pre, d2, d3 = _commit_deltas(spark, sf_dir)
    inc = incremental_view([d2, d3], ["user_id"], "ts")
    return inc.select(
        "user_id",
        COMMIT_COL,
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


@register(
    "cdc_change_feed",
    sql=f"""
    WITH pre AS (SELECT DISTINCT user_id FROM events
                 WHERE ts < TIMESTAMP '{_CUT1}'),
    inc AS (SELECT user_id, event_id,
                   CASE WHEN ts >= TIMESTAMP '{_CUT2}' THEN 3 ELSE 2 END AS _commit_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '{_CUT1}')
    SELECT i.user_id, i._commit_id, i.event_id,
           CASE WHEN p.user_id IS NULL THEN 'insert' ELSE 'update' END
             AS _change_type
    FROM inc i LEFT JOIN pre p USING (user_id)
    WHERE i.rn = 1 ORDER BY i.user_id
    """,
)
def cdc_change_feed(spark, sf_dir):
    """Row-level CDC between instants (operators/timeline.py
    ``cdc_view``): incremental records classified insert/update against
    the as-of-begin snapshot via one key-only broadcastable join."""
    pre, d2, d3 = _commit_deltas(spark, sf_dir)
    inc = incremental_view([d2, d3], ["user_id"], "ts")
    out = cdc_view(pre, inc, ["user_id"])
    return out.select("user_id", COMMIT_COL, "event_id", "_change_type").orderBy(
        "user_id"
    )


@register(
    "sessionize_events",
    headline=True,
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
      SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           {dsum_sql('value', 2)} AS total_value
    FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def sessionize_events(spark, sf_dir):
    """Gap-based sessionization (operators/sessions.py): 12-hour
    inactivity gap splits each user's stream into sessions; one row per
    session with bounds, size, exact-decimal value total. The batch
    counterpart of ``F.session_window`` expressed as lag + running sum so
    it is ANSI-replayable. One shuffle on user_id serves both window
    functions AND the final per-session aggregation."""
    e = t(spark, sf_dir, "events")
    b = session_bounds(
        e,
        "user_id",
        "ts",
        gap="12 hours",
        tie_breakers=["event_id"],
        aggs=[dsum(F.col("value"), 2).alias("total_value")],
    )
    return b.select(
        "user_id",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_id")


def _mor_fixture_table(spark, sf_dir):
    """The shared on-disk MOR fixture: events as three delta commits
    with a compaction after commit 2 (base = state through cut2,
    commit 3 pending in the log). Cache key = every input the build
    depends on (fixture dir, column list, commit cuts, key/precombine
    config) — a definition change lands at a NEW path, so a stale /tmp
    table can never be served. A table already in the exact expected
    end state — 3 commits, commit 2 folded — is reused instead of
    rebuilt: harnesses that invoke a consumer query several times
    (oracle compare runs it twice) pay the upsert/compact cost once."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    cut1, cut2 = F.lit(_CUT1).cast("timestamp"), F.lit(_CUT2).cast("timestamp")
    # pre-precombine each commit batch with the event_id tie-breaker so
    # within-batch same-timestamp winners are deterministic (the thirds
    # partition on ts, so CROSS-commit precombine ties cannot occur)
    thirds = [
        precombine_latest(f, ["user_id"], "ts", tie_breakers=["event_id"])
        for f in (
            e.filter(F.col("ts") < cut1),
            e.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
            e.filter(F.col("ts") >= cut2),
        )
    ]
    build_sig = "|".join([sf_dir, ",".join(_EVENT_COLS), _CUT1, _CUT2, "user_id:ts:v2"])
    path = Path(tempfile.gettempdir()) / (
        "spark_graft_mor_inc_" + hashlib.md5(build_sig.encode()).hexdigest()[:12]
    )
    tbl = MergeOnReadTable(
        spark, str(path), keys=["user_id"], precombine="ts",
        policy=CompactionPolicy(max_delta_commits=100),
    )
    expected = {"next_seq": 4, "compacted_through": 2}
    meta = tbl._meta() if tbl.exists() else {}
    if not all(meta.get(k) == v for k, v in expected.items()):
        shutil.rmtree(path, ignore_errors=True)
        tbl.upsert(thirds[0])  # commit 1 (bootstrap)
        tbl.upsert(thirds[1])  # commit 2
        tbl.compact()          # folds commit 2 — history must survive this
        tbl.upsert(thirds[2])  # commit 3
    return tbl


@register(
    "mor_read_optimized_state",
    sql=f"""
    WITH ro AS (
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_CUT2}') x WHERE rn = 1),
    rt AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) y WHERE rn = 1)
    SELECT ro.user_id, ro.event_id, ro.event_type,
           round(ro.value, 2) AS value,
           rt.event_id AS rt_event_id,
           CAST(ro.event_id <> rt.event_id AS BOOLEAN) AS is_stale
    FROM ro JOIN rt USING (user_id) ORDER BY user_id
    """,
)
def mor_read_optimized_state(spark, sf_dir):
    """The MOR read-optimized view (Hudi `_ro` table) against the real
    on-disk MergeOnReadTable: base files only, NO log merge — the
    cheap-but-stale side of the MOR trade. With the fixture compacted
    through commit 2 and commit 3 pending in the log, read_optimized()
    must equal the latest state over the pre-cut2 events, and each
    row's ``is_stale`` flag (does the real-time view disagree?) makes
    the freshness lag itself part of the value hash — the oracle
    derives both views from raw history and diffs them.

    Scale: read_optimized is a plain parquet scan of the base — no
    per-row merge CPU, no log read amplification (the trade measured
    in bench.py's mor_read_N_deltas rows); the real-time join here is
    eval-only, keyed on user_id, shuffle-parallel."""
    tbl = _mor_fixture_table(spark, sf_dir)
    ro = tbl.read_optimized().select(
        "user_id", "event_id", "event_type", F.round("value", 2).alias("value")
    )
    rt = tbl.read().select("user_id", F.col("event_id").alias("_rt_event_id"))
    return (
        ro.join(rt, on="user_id")
        .select(
            "user_id", "event_id", "event_type", "value",
            F.col("_rt_event_id").alias("rt_event_id"),
            (F.col("event_id") != F.col("_rt_event_id")).alias("is_stale"),
        )
        .orderBy("user_id")
    )


@register(
    "mor_incremental",
    sql=f"""
    SELECT user_id, _commit_id, event_id, event_type,
           round(value, 2) AS value
    FROM (SELECT user_id, event_id, event_type, value,
                 CASE WHEN ts >= TIMESTAMP '{_CUT2}' THEN 3 ELSE 2 END AS _commit_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts >= TIMESTAMP '{_CUT1}') x
    WHERE rn = 1 ORDER BY user_id
    """,
)
def mor_incremental(spark, sf_dir):
    """Incremental pull ACROSS a MOR compaction, against the real on-disk
    ``MergeOnReadTable`` (operators/mor.py) — not an in-memory replay:
    the events fixture streams in as three delta commits, the table is
    compacted after commit 2 (folding it into the base), and the
    consumer then pulls commits (1, 3]. Round-3's design truncated logs
    at compaction, so this exact read RAISED; commits now survive on the
    retained timeline until ``clean`` (Hudi's retention model). The
    oracle is the same latest-state-per-key algebra over the post-cut1
    events, tagged by producing commit.

    Scale: the pull scans only the two in-range delta directories —
    never the base, never untouched history."""
    tbl = _mor_fixture_table(spark, sf_dir)
    inc = tbl.read_incremental(begin=1)
    return inc.select(
        "user_id",
        "_commit_id",
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


@register(
    "savepoint_restore_state",
    sql=f"""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           event_id, event_type, round(value, 2) AS value
    FROM (SELECT user_id, ts, event_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts < TIMESTAMP '{_CUT2}') x
    WHERE rn = 1 ORDER BY user_id
    """,
)
def savepoint_restore_state(spark, sf_dir):
    """Savepoint -> aggressive clean -> restore, through the production
    read path (operators/timeline.py savepoint/clean/restore): commit 2
    is savepointed, commit 3 lands, the cleaner is asked to retain only
    ONE instant (the savepoint clamps the horizon, so commit 2's read
    closure survives), and restore(2) rolls the table back — the
    snapshot read must equal the latest-state algebra over the
    pre-cut2 events, as if commit 3 never happened. This is the
    operational recover-from-bad-batch story: pin a known-good instant,
    vacuum hard, and still be able to walk back to it.

    Scale: restore is O(dropped commits) metadata+file deletions — no
    data rewrite; the savepoint pin is one JSON marker; clean retains
    O(live table + keep_last deltas) bytes regardless of history
    length. Reference anchor: the checkpoint/restart recovery slot
    (glue_job_script.py:116), extended to table-state recovery."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    cut1, cut2 = F.lit(_CUT1).cast("timestamp"), F.lit(_CUT2).cast("timestamp")
    thirds = [
        precombine_latest(f, ["user_id"], "ts", tie_breakers=["event_id"])
        for f in (
            e.filter(F.col("ts") < cut1),
            e.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
            e.filter(F.col("ts") >= cut2),
        )
    ]
    build_sig = "|".join(
        [sf_dir, ",".join(_EVENT_COLS), _CUT1, _CUT2, "savepoint:user_id:ts:v1"]
    )
    path = Path(tempfile.gettempdir()) / (
        "spark_graft_savepoint_" + hashlib.md5(build_sig.encode()).hexdigest()[:12]
    )
    tbl = TimelineTable(spark, str(path), keys=["user_id"], precombine="ts")
    # end state after a full build: commits [1, 2] (3 restored away),
    # savepoint at 2 — reuse the cached table only in exactly that state
    commits = tbl.commits()
    ok = (
        [c["commit"] for c in commits] == [1, 2]
        and {s["commit"] for s in tbl.savepoints()} == {2}
    )
    if not ok:
        shutil.rmtree(path, ignore_errors=True)
        tbl.upsert(thirds[0])      # commit 1: known-good bootstrap
        tbl.upsert(thirds[1])      # commit 2: known-good increment
        tbl.savepoint(2)           # pin it
        tbl.upsert(thirds[2])      # commit 3: the "bad batch"
        tbl.clean(keep_last=1)     # savepoint clamps the horizon to 2
        tbl.restore(2)             # walk back; commit 3's files dropped
    return tbl.read().select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


@register(
    "bootstrap_adopted_state",
    sql=f"""
    SELECT event_type, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           event_id, round(value, 2) AS value
    FROM (
      SELECT event_type, user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY event_type, user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE ts < TIMESTAMP '{_CUT2}'
        AND (event_type <> 'view' OR ts < TIMESTAMP '{_CUT1}')
    ) x WHERE rn = 1
    ORDER BY event_type, user_id
    """,
)
def bootstrap_adopted_state(spark, sf_dir):
    """Metadata-only bootstrap in the production read path
    (operators/timeline.py ``TimelineTable.bootstrap``): a pre-existing
    Hive-partitioned parquet dataset (latest pre-cut1 state per
    (event_type, user_id)) is ADOPTED in place as commit 1 — no copy, no
    rewrite — then commit 2 upserts the [cut1, cut2) events for every
    event_type EXCEPT 'view'. The snapshot read stitches the untouched
    'view' partition straight from the adopted external files and the
    rewritten partitions from commit 2's snapshot — the oracle replays
    the merged latest-state algebra over raw events.

    Scale: this is the 100 TB adoption story — taking an existing lake
    table under timeline management costs one metadata commit, and
    subsequent upserts rewrite only the partitions they touch."""
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    cut1, cut2 = F.lit(_CUT1).cast("timestamp"), F.lit(_CUT2).cast("timestamp")
    pre = precombine_latest(
        e.filter(F.col("ts") < cut1),
        ["event_type", "user_id"], "ts", tie_breakers=["event_id"],
    )
    batch2 = precombine_latest(
        e.filter(
            (F.col("ts") >= cut1) & (F.col("ts") < cut2) & (F.col("event_type") != "view")
        ),
        ["event_type", "user_id"], "ts", tie_breakers=["event_id"],
    )
    build_sig = "|".join(
        [sf_dir, ",".join(_EVENT_COLS), _CUT1, _CUT2, "bootstrap:user_id:ts:v1"]
    )
    root = Path(tempfile.gettempdir()) / (
        "spark_graft_bootstrap_" + hashlib.md5(build_sig.encode()).hexdigest()[:12]
    )
    ext, tpath = root / "external", root / "table"
    tbl = TimelineTable(
        spark, str(tpath), keys=["user_id"], precombine="ts",
        partition_by=["event_type"],
    )
    commits = tbl.commits()
    ok = (
        len(commits) == 2
        and commits[0].get("operation") == "bootstrap"
        # bootstrap() stores os.path.abspath(location); normalize the same
        # way — Path.resolve() also resolves symlinks, so on hosts where
        # the temp dir is behind one (macOS /tmp -> /private/tmp) a
        # resolve()-based compare never matches and the cached fixture
        # would be rebuilt on every invocation, skewing benchmarks
        and commits[0].get("location") == os.path.abspath(str(ext))
    )
    if not ok:
        shutil.rmtree(root, ignore_errors=True)
        pre.write.partitionBy("event_type").parquet(str(ext))
        tbl.bootstrap(str(ext))   # commit 1: adopted in place
        tbl.upsert(batch2)        # commit 2: rewrites non-'view' partitions
    return tbl.read().select(
        "event_type",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_id",
        F.round("value", 2).alias("value"),
    ).orderBy("event_type", "user_id")


@register(
    "mor_partial_state",
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
def mor_partial_state(spark, sf_dir):
    """Partial-update payload on the REAL on-disk MergeOnReadTable
    (operators/mor.py merge_mode="partial"): commit 1 = full first-half
    state, compacted into the base; commit 2 = the second half as SPARSE
    payloads (event_type omitted for every third event, value for every
    second). The snapshot read folds base + sparse delta column-wise
    from disk — same algebra partial_update_state pins in-memory, here
    exercised through the log-structured physical layout (append-only
    deltas, compaction, read-side merge). Oracle: the precombined halves
    coalesced via full outer join.

    Scale: the sparse commit appended O(batch) bytes; the merge is one
    aggregation over base + pending deltas."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import CompactionPolicy, MergeOnReadTable

    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    midpoint = F.lit("2024-01-15 00:00:00").cast("timestamp")
    stored = precombine_latest(
        e.filter(F.col("ts") < midpoint), ["user_id"], "ts", tie_breakers=["event_id"]
    )
    latest2 = precombine_latest(
        e.filter(F.col("ts") >= midpoint), ["user_id"], "ts", tie_breakers=["event_id"]
    )
    sparse = latest2.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 3 != 0, F.col("event_type")).alias("event_type"),
        F.when(F.col("event_id") % 2 != 0, F.col("value")).alias("value"),
    )
    build_sig = "|".join(
        [sf_dir, ",".join(_EVENT_COLS), "2024-01-15", "morpartial:user_id:ts:v1"]
    )
    path = Path(tempfile.gettempdir()) / (
        "spark_graft_mor_part_" + hashlib.md5(build_sig.encode()).hexdigest()[:12]
    )
    tbl = MergeOnReadTable(
        spark, str(path), keys=["user_id"], precombine="ts",
        merge_mode="partial",
        policy=CompactionPolicy(max_delta_commits=100),
    )
    expected = {"next_seq": 3, "compacted_through": 1}
    meta = tbl._meta() if tbl.exists() else {}
    if not all(meta.get(k) == v for k, v in expected.items()):
        shutil.rmtree(path, ignore_errors=True)
        tbl.upsert(stored)   # commit 1 (bootstrap -> base)
        tbl.upsert(sparse)   # commit 2: sparse delta, pending
    return tbl.read().select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


@register(
    "cdc_before_after_images",
    sql=f"""
    WITH pre AS (
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_CUT1}') x WHERE rn = 1
    ),
    aft AS (
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{_CUT1}') x WHERE rn = 1
    )
    SELECT a.user_id,
           CASE WHEN p.user_id IS NULL THEN 'insert' ELSE 'update' END
             AS _change_type,
           a.event_id,
           round(a.value, 2) AS value,
           p.event_id AS before_event_id,
           round(p.value, 2) AS before_value
    FROM aft a LEFT JOIN pre p USING (user_id)
    ORDER BY a.user_id
    """,
)
def cdc_before_after_images(spark, sf_dir):
    """CDC feed WITH before images (operators/timeline.py
    ``cdc_view_images`` — Hudi 1.0 ``cdc.enabled`` / Debezium envelope):
    every update carries the replaced values as ``before_*`` columns,
    inserts carry nulls. This is the feed an aggregate-maintaining or
    reverse-ETL consumer needs — without the before image it cannot
    subtract the old contribution and must re-read the table. The
    before side stays a key+image column-pruned scan of the as-of-begin
    snapshot; one left join on the record key."""
    pre, d2, d3 = _commit_deltas(spark, sf_dir)
    inc = incremental_view([d2, d3], ["user_id"], "ts")
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import cdc_view_images

    out = cdc_view_images(pre, inc, ["user_id"], ["event_id", "value"])
    return out.select(
        "user_id",
        "_change_type",
        "event_id",
        F.round("value", 2).alias("value"),
        "before_event_id",
        F.round("before_value", 2).alias("before_value"),
    ).orderBy("user_id")


# -- round 8: snapshot diff audit over a cleaned + archived timeline ---------


@register(
    "snapshot_diff_audit",
    sql=f"""
    WITH s2 AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_CUT2}') WHERE rn = 1
    ),
    s3 AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    )
    SELECT coalesce(s3.user_id, s2.user_id) AS user_id,
           CASE WHEN s2.user_id IS NULL THEN 'added'
                WHEN s2.event_id <> s3.event_id THEN 'changed'
                ELSE 'unchanged' END AS change,
           s2.event_id AS event_id_before,
           s3.event_id AS event_id_after
    FROM s2 FULL OUTER JOIN s3 USING (user_id)
    WHERE s2.user_id IS NULL OR s2.event_id <> s3.event_id
    ORDER BY user_id
    """,
)
def snapshot_diff_audit(spark, sf_dir):
    """Time-travel snapshot diff on the REAL on-disk timeline table —
    the audit question "what changed between instant 2 and now?"
    answered from two as-of reads, AFTER the cleaner and the archiver
    have run (clean keep_last=2 puts the horizon AT instant 2;
    archive_timeline then retires dead instants — the round-8 liveness
    rule is what keeps the as-of-horizon read resolving through the
    newest data instant at/below it). Per key: added / changed
    classification with before/after record ids; unchanged keys are
    filtered (at 100 TB the diff output is the change set, not the
    table).

    Scale: two snapshot reads partition-pruned by the timeline, one
    key-keyed full-outer join; clean/archive are O(retained history)
    metadata passes."""
    import tempfile

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

    pre, d2, d3 = _commit_deltas(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="snapdiff_tbl_")
    tbl = TimelineTable(spark, path, keys=["user_id"], precombine="ts")
    tbl.upsert(pre.select(*_EVENT_COLS))                      # instant 1
    tbl.upsert(d2.select(*_EVENT_COLS))                       # instant 2
    tbl.upsert(d3.select(*_EVENT_COLS))                       # instant 3
    tbl.clean(keep_last=2)                                    # horizon = 2
    tbl.archive_timeline()
    s2 = tbl.read(as_of=2).select("user_id", F.col("event_id").alias("eb"))
    s3 = tbl.read(as_of=3).select("user_id", F.col("event_id").alias("ea"))
    j = s2.join(s3, "user_id", "full_outer")
    return (
        j.select(
            "user_id",
            F.when(F.col("eb").isNull(), "added")
            .when(F.col("eb") != F.col("ea"), "changed")
            .otherwise("unchanged")
            .alias("change"),
            F.col("eb").alias("event_id_before"),
            F.col("ea").alias("event_id_after"),
        )
        .filter((F.col("change") != "unchanged"))
        .orderBy("user_id")
    )


@register(
    "bitemporal_asof",
    sql="""
    WITH belief AS (
      SELECT 2 AS tx_time, user_id, event_id, event_type, ts FROM events
      WHERE event_id % 3 < 2 AND ts <= TIMESTAMP '2024-01-12 00:00:00'
      UNION ALL
      SELECT 3, user_id, event_id, event_type, ts FROM events
      WHERE ts <= TIMESTAMP '2024-01-12 00:00:00'
    ),
    ranked AS (
      SELECT tx_time, user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY tx_time, user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM belief
    )
    SELECT CAST(tx_time AS BIGINT) AS tx_time, user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from
    FROM ranked WHERE rn = 1
    ORDER BY tx_time, user_id
    """,
)
def bitemporal_asof(spark, sf_dir):
    """Bitemporal as-of query on the REAL on-disk timeline table
    (operators/timeline.py): TRANSACTION time = the commit instant
    (what the system KNEW), VALID time = the event timestamp (when the
    fact was TRUE). Every event version is its own record key
    ((user_id, event_id) — nothing overwrites), ingested in three
    commits split by event_id so commit 3 carries LATE-ARRIVING facts
    whose valid time predates earlier commits. The query answers
    "as of commit T, what was each user's latest state valid at
    V = Jan 12?" for T = 2 and T = 3: the time-travel read pins the
    knowledge horizon, the valid_from filter + per-user argmax pins the
    validity axis — and the two beliefs genuinely DIFFER wherever a
    late commit-3 fact backfills the past (the revision an
    append-only-timestamp design cannot represent). The oracle derives
    both beliefs from the raw stream via the commit-assignment rule.

    Scale: the table stores versions, not rewrites — commits are
    O(batch); each belief is one keyed window over the as-of snapshot;
    at 100 TB the valid-time filter prunes partitions when the table
    partitions by valid date (partition_path_derivation)."""
    import tempfile

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
    from pyspark.sql.window import Window as W

    e = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    path = tempfile.mkdtemp(prefix="bitemporal_tbl_")
    tbl = TimelineTable(
        spark, path, keys=["user_id", "event_id"], precombine="ts"
    )
    for r in range(3):  # commit r+1 carries event_id % 3 == r
        tbl.upsert(e.filter(F.col("event_id") % 3 == r))

    v = F.lit("2024-01-12 00:00:00").cast("timestamp")

    def belief(tx):
        snap = tbl.read(as_of=tx).filter(F.col("ts") <= v)
        w = W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            snap.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.lit(tx).cast("long").alias("tx_time"),
                "user_id", "event_id", "event_type",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
            )
        )

    return belief(2).unionByName(belief(3)).orderBy("tx_time", "user_id")


def _ledger_sql() -> str:
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import row_fingerprint_sql

    h = row_fingerprint_sql(["event_id", "user_id", "event_type"])
    return f"""
    WITH rowhash AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d, {h} AS h FROM events
    ),
    day AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n, CAST(bit_xor(h) AS BIGINT) AS x
      FROM rowhash GROUP BY d
    ),
    arr AS (
      SELECT list(d || ':' || CAST(x AS VARCHAR) || ':' || CAST(n AS VARCHAR)
                  ORDER BY d) AS a,
             list(d ORDER BY d) AS days,
             list(n ORDER BY d) AS ns,
             list(x ORDER BY d) AS xs
      FROM day
    )
    SELECT o.d AS day, o.n AS n_rows, o.x AS day_digest,
           list_reduce((['GENESIS'] || a)[1:o.k + 1],
                       (acc, e) -> md5(acc || e)) AS chain
    FROM (SELECT d, n, x, row_number() OVER (ORDER BY d) AS k FROM day) o, arr
    ORDER BY day
    """


@register("ledger_hash_chain", sql=_ledger_sql())
def ledger_hash_chain(spark, sf_dir):
    """Tamper-evident daily ledger over the event stream — the
    commit-integrity pattern (Delta transaction checksums / lakeFS-style
    chains) as relational algebra: each day's content digest is an
    ORDER-INDEPENDENT xor of portable row fingerprints (so the digest is
    reproducible from any engine, any partitioning), and the daily
    chain value folds md5(prev_chain || day:digest:count) from a GENESIS
    seed — altering ANY historical row changes that day's digest and
    every chain value after it, so an auditor verifies the whole
    history by recomputing one head. Both engines fold the identical
    sequence (Spark `aggregate` over a sorted day array; DuckDB
    list_reduce with the GENESIS element prepended), making even the
    intermediate chain values value-hash-pinned.

    Scale: ONE map-side-combinable aggregation builds all day digests
    (the shuffle carries a (count, xor) pair per day per partition);
    the fold runs over the O(days) digest array row-locally — the data
    is never re-read to verify, which is the point of the chain."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import row_fingerprint

    e = t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        row_fingerprint(["event_id", "user_id", "event_type"]).alias("h"),
    )
    day = e.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(bit_xor(h) AS BIGINT)").alias("x"),
    )
    arr = day.agg(
        F.expr(
            "transform(sort_array(collect_list(struct(d, x, n))), "
            "e -> struct(e.d AS d, e.x AS x, e.n AS n, "
            "concat(e.d, ':', CAST(e.x AS STRING), ':', CAST(e.n AS STRING)) AS s))"
        ).alias("a")
    )
    return (
        arr.select(F.posexplode("a").alias("k0", "e"), F.col("a"))
        .select(
            F.col("e.d").alias("day"),
            F.col("e.n").cast("long").alias("n_rows"),
            F.col("e.x").cast("long").alias("day_digest"),
            F.expr(
                "aggregate(slice(transform(a, p -> p.s), 1, k0 + 1), "
                "'GENESIS', (acc, s) -> md5(concat(acc, s)))"
            ).alias("chain"),
        )
        .orderBy("day")
    )


@register(
    "rollup_mv_stream_state",
    sql="""
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) x
      WHERE rn = 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM latest WHERE user_id % 23 <> 0
    GROUP BY event_type ORDER BY event_type
    """,
)
def rollup_mv_stream_state(spark, sf_dir):
    """STREAMED delete-aware rollup maintenance (operators/rollupmv.py
    RollupMVStore): a per-event-type (count, exact-decimal sum) over
    latest-user state is maintained commit by commit from the timeline
    table's OWN incremental + CDC-before-image feed — three upsert
    commits (event_id thirds, so users keep changing groups and values)
    followed by a tombstone commit erasing the user_id % 23 cohort.
    Every fold retracts the before images and adds the after images
    (reconcile.retraction_delta); exactly-once comes from the COMMIT
    WATERMARK in the store's pointer — the final no-op fold in the
    query IS the replay case, and the result must equal the oracle's
    direct aggregation of the surviving latest state.

    Scale: each refresh reads the range's delta files + a keys+images
    projection of the as-of-watermark snapshot, and touches |changed
    groups| MV rows; the base table is never re-aggregated — the
    nightly-rebuild replacement, now with deletes."""
    import tempfile

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rollupmv import RollupMVStore
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    tbl = TimelineTable(
        spark, tempfile.mkdtemp(prefix="rollupmv_tbl_"),
        keys=["user_id"], precombine="ts",
    )
    store = RollupMVStore(
        spark, tempfile.mkdtemp(prefix="rollupmv_state_"), "event_type", "value"
    )
    for r in range(3):
        tbl.upsert(e.filter(F.col("event_id") % 3 == r))
        store.fold_through(tbl)
    erase = (
        tbl.read()
        .filter(F.col("user_id") % 23 == 0)
        .select("user_id", F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"))
    )
    tbl.delete(erase)
    store.fold_through(tbl)
    store.fold_through(tbl)  # replay: structural no-op at the watermark
    return store.counts().orderBy("event_type")


@register(
    "rollup_mv_retraction_e2e",
    sql="""
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) x
      WHERE rn = 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM latest WHERE user_id % 29 <> 0
    GROUP BY event_type ORDER BY event_type
    """,
)
def rollup_mv_retraction_e2e(spark, sf_dir):
    """Delete-aware IVM through the REAL streamed pipeline (VERDICT r11
    task 6): three micro-batch files replay through
    StreamingUpsertPipeline (file source, maxFilesPerTrigger=1,
    foreachBatch) into a TimelineTable — event_id thirds, so users keep
    changing latest-state groups and values — with the LAST batch MIXED:
    its third's upserts plus tombstones for the user_id % 29 cohort via
    Hudi's public ``_hoodie_is_deleted`` record field (soft-delete
    marker in the batch itself, the only delete channel a foreachBatch
    stream has; operators/timeline.py HOODIE_DELETE_MARKER). The
    post_commit hook folds a RollupMVStore after every commit, so the
    per-event-type (count, exact-decimal sum) rollup is maintained by
    RETRACTION algebra — each fold subtracts before-images and adds
    after-images (reconcile.retraction_delta) — never by re-aggregating
    the table. The final extra fold IS the micro-batch replay case (the
    commit watermark makes it a structural no-op), and the result must
    equal the oracle's direct aggregation of the surviving latest state.

    Differs from rollup_mv_stream_state (batch-commit-fed) in that the
    commits here are produced by the streaming runtime (A1->A12
    composition) and the deletes arrive IN a mixed micro-batch, not via
    a table API call — the Debezium/CDC-consumer shape. Crash-replay
    fault legs live in tests/test_rollup_retraction_e2e.py.

    Scale: each fold reads the commit range's delta files plus a
    keys+images projection of the as-of snapshot and touches |changed
    groups| MV rows; the base table is never re-aggregated. The
    tombstone channel adds zero write amplification — markers ride the
    same delta files as the upserts."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rollupmv import RollupMVStore
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    marker = F.lit(False).alias("_hoodie_is_deleted")
    tomb = (
        e.filter(F.col("user_id") % 29 == 0)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(-1).cast("long").alias("event_id"),
            F.lit("tombstone").alias("event_type"),
            F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
            F.lit(0.0).cast("double").alias("value"),
            F.lit(True).alias("_hoodie_is_deleted"),
        )
    )
    base = tempfile.mkdtemp(prefix="rollup_e2e_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    for b in range(3):
        batch = e.filter(F.col("event_id") % 3 == b).select("*", marker)
        if b == 2:  # mixed: the third's upserts + the delete cohort
            batch = batch.unionByName(tomb)
        stage = os.path.join(base, f"stage_{b}")
        batch.coalesce(1).write.mode("overwrite").parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"batch_{b}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    tbl = TimelineTable(
        spark, os.path.join(base, "table"), keys=["user_id"], precombine="ts"
    )
    store = RollupMVStore(
        spark, os.path.join(base, "state"), "event_type", "value"
    )
    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=tomb.schema,
        table=tbl,
        checkpoint=os.path.join(base, "ckpt"),
        trigger="1 seconds",
        post_commit=lambda _df: store.fold_through(tbl),
    )
    pipe.run_available()
    store.fold_through(tbl)  # replay: structural no-op at the watermark
    return store.counts().orderBy("event_type")


@register(
    "session_window_builtin",
    sql=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           {dsum_sql('value', 2)} AS total_value
    FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_start
    """,
)
def session_window_builtin(spark, sf_dir):
    """Spark's BUILT-IN ``session_window`` grouping function pinned
    against the ANSI lag/cumsum sessionization replay — the same
    session algebra `sessionize_events` implements by hand
    (operators/sessions.py), now cross-validated through the engine's
    native implementation: identical session membership, bounds, sizes,
    and exact-decimal totals at a 12-hour gap. Divergence here would
    mean the hand-rolled operator and the built-in disagree about what
    a session IS — the parity a user switching between the two APIs
    relies on. (Session identity keys on session_start — the stable,
    engine-independent label; the built-in's window struct also carries
    an end = last_event + gap, which the ANSI replay has no twin for.)

    Boundary semantics (ADVICE r11): Spark session windows are
    HALF-OPEN [ts, ts+gap) — an event at exactly last_ts + 12h touches
    but does not overlap the previous window and starts a NEW session.
    The oracle therefore flags session starts with ``gap >= 12h``, not
    ``>``; with ``>`` the two formulations diverge on exact-gap ties
    (latent on this microsecond-resolution fixture, real on
    second-resolution production data).

    Scale: session_window groupBy is one shuffle on (user, session) —
    the same exchange shape as the manual window form, minus the
    two window passes."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
            F.min("ts").alias("_start"),
        )
        .select(
            "user_id",
            F.date_format("_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )
