"""Warehouse-modeling, layout, and feature-prep queries (round-7 surface).

Four shapes a Hudi-style lakehouse (the reference's deployment target)
gets asked for beyond plain analytics:

- SCD Type 2 history build — the dimension-modeling pattern a keyed
  upsert table feeds (the reference's upsert keeps ONLY latest state;
  SCD2 is the standard "keep every state with validity intervals"
  companion, built here from the raw change log with two windows over
  one shuffle).
- Z-order layout statistics — the data-skipping argument for Hudi/Delta
  clustering, made measurable: interleave two column buckets into a
  Z-value, carve files along it, and count how many files a 2-D box
  predicate can prune versus a single-column linear layout.
- Winsorized segment statistics — robust feature-prep moments (clip at
  in-group p05/p95 before mean/std) under the exact-decimal discipline.
- Stratified split + perplexity band filter — training-data curation:
  deterministic hash splits that preserve strata proportions, and the
  CCNet-style "drop the too-predictable and the word-soup tails" LM
  filter, both fully oracled.

Determinism: fixed-point inputs go through exact DECIMAL sums
(queries/base.py); quantiles use percentile/quantile_cont (verified
bit-identical across engines on identical doubles); every window order
carries a unique tiebreaker column; every output imposes a total order.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import (
    stable_hash64,
    stable_hash64_sql,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import (
    dsum,
    dsum_sql,
    register,
    t,
)


@register(
    "scd2_user_state_history",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    starts AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM starts
    ORDER BY user_id, version
    """,
)
def scd2_user_state_history(spark, sf_dir):
    """Slowly-changing-dimension Type 2 from a change log: per user, one
    row per CONSECUTIVE run of the same state, with [valid_from,
    valid_to) validity and an is_current flag — the standard warehouse
    history table the reference's latest-state upsert (glue_job_script
    .py:50-62) deliberately does not keep.

    Scale shape: both windows partition by user_id with the same order,
    so the whole build is ONE shuffle on the natural key; the
    change-point filter between them shrinks the second window's input
    to the period starts. No global sort anywhere except the final
    display ORDER BY. Ties on ts break on event_id, so the history is
    deterministic under concurrent same-timestamp events."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    starts = ev.withColumn("_prev", F.lag("event_type").over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type"))
    )
    return (
        starts.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# Z-order layout: 8-bit bucket per dimension, bits interleaved
# x0 y0 x1 y1 ... x7 y7 (LSB first); 64 Z-contiguous files vs 64
# custkey-contiguous files for the linear baseline.
_ZBITS = 8
_ZFILES = 64


def _interleave(cx, cy):
    z = F.lit(0).cast("long")
    for i in range(_ZBITS):
        z = (
            z
            + F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _interleave_sql(cx: str, cy: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({cx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({cy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_Z_CTES = f"""
    src AS (
      SELECT o_custkey AS x,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS y
      FROM orders
    ),
    mm AS (
      SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
      FROM src
    ),
    b AS (
      SELECT x, y,
             CAST(floor((x - xmin) * 256.0 / (xmax - xmin + 1)) AS BIGINT) AS bx,
             CAST(floor((y - ymin) * 256.0 / (ymax - ymin + 1)) AS BIGINT) AS by,
             xmin + CAST(floor((xmax - xmin) * 7.0 / 16) AS BIGINT) AS qxlo,
             xmin + CAST(floor((xmax - xmin) * 9.0 / 16) AS BIGINT) AS qxhi,
             ymin + CAST(floor((ymax - ymin) * 7.0 / 16) AS BIGINT) AS qylo,
             ymin + CAST(floor((ymax - ymin) * 9.0 / 16) AS BIGINT) AS qyhi
      FROM src CROSS JOIN mm
    ),
    filed AS (
      SELECT x, y, qxlo, qxhi, qylo, qyhi,
             ({_interleave_sql('bx', 'by')}) // 1024 AS zfile,
             bx // 4 AS linfile
      FROM b
    ),
    zstats AS (
      SELECT zfile, min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo,
             max(y) AS y_hi, any_value(qxlo) AS qxlo, any_value(qxhi) AS qxhi,
             any_value(qylo) AS qylo, any_value(qyhi) AS qyhi
      FROM filed GROUP BY zfile
    ),
    lstats AS (
      SELECT linfile, min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo,
             max(y) AS y_hi, any_value(qxlo) AS qxlo, any_value(qxhi) AS qxhi,
             any_value(qylo) AS qylo, any_value(qyhi) AS qyhi
      FROM filed GROUP BY linfile
    ),
    zsum AS (
      SELECT CAST(count(*) AS BIGINT) AS files_z,
             CAST(sum(CASE WHEN x_lo <= qxhi AND x_hi >= qxlo
                            AND y_lo <= qyhi AND y_hi >= qylo
                       THEN 1 ELSE 0 END) AS BIGINT) AS scanned_z
      FROM zstats
    ),
    lsum AS (
      SELECT CAST(count(*) AS BIGINT) AS files_lin,
             CAST(sum(CASE WHEN x_lo <= qxhi AND x_hi >= qxlo
                            AND y_lo <= qyhi AND y_hi >= qylo
                       THEN 1 ELSE 0 END) AS BIGINT) AS scanned_lin
      FROM lstats
    ),
    hits AS (
      SELECT CAST(sum(CASE WHEN x BETWEEN qxlo AND qxhi
                            AND y BETWEEN qylo AND qyhi
                       THEN 1 ELSE 0 END) AS BIGINT) AS rows_matched
      FROM filed
    )
"""


def _hilbert_layout_sql() -> str:
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.clustering import hilbert_sql_ctes

    hctes, final = hilbert_sql_ctes("b", bits=_ZBITS)
    return f"""
    WITH {_Z_CTES},
    {hctes},
    hfiled AS (
      SELECT x, y, qxlo, qxhi, qylo, qyhi, hd // 1024 AS hfile FROM {final}
    ),
    hstats AS (
      SELECT hfile, min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo,
             max(y) AS y_hi, any_value(qxlo) AS qxlo, any_value(qxhi) AS qxhi,
             any_value(qylo) AS qylo, any_value(qyhi) AS qyhi
      FROM hfiled GROUP BY hfile
    ),
    hsum AS (
      SELECT CAST(count(*) AS BIGINT) AS files_h,
             CAST(sum(CASE WHEN x_lo <= qxhi AND x_hi >= qxlo
                            AND y_lo <= qyhi AND y_hi >= qylo
                       THEN 1 ELSE 0 END) AS BIGINT) AS scanned_h
      FROM hstats
    )
    SELECT files_h, scanned_h, scanned_z, scanned_lin, rows_matched
    FROM hsum CROSS JOIN zsum CROSS JOIN lsum CROSS JOIN hits
    """


@register("hilbert_layout_stats", sql=_hilbert_layout_sql())
def hilbert_layout_stats(spark, sf_dir):
    """Data-skipping yield of HILBERT clustering vs Z-order vs linear —
    Hudi's second space-filling-curve strategy
    (hoodie.layout.optimize.strategy=hilbert; operators/clustering.py
    hilbert_index). Same experiment as zorder_layout_stats: bucket
    (o_custkey, order-day) to 8 bits, carve 64 curve-contiguous files,
    count the files a centered 2-D box predicate must scan given
    per-file min/max stats. Hilbert's unit-step adjacency (consecutive
    indices are always grid neighbors — no Z-shaped jumps across the
    plane) gives per-file bounding boxes at least as tight as Morton's,
    so scanned_h <= scanned_z is the expected (and observed) ordering.

    The index itself is a chain of 8 narrow projections (reflect-and-
    swap per bit) — integer CASE/shift/mask ops, no UDF, one codegen
    span; the oracle replays the identical chain as stacked
    `SELECT * REPLACE` CTEs, so both engines compute the same curve
    bit-for-bit (bijectivity + unit-step pinned in tests/test_hilbert.py).

    Scale shape: identical to zorder_layout_stats — one 4-value stats
    broadcast, bounded-key groupBys, 1-row crossJoins."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.clustering import hilbert_index
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long").alias("y"),
    )
    mm = o.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    span = lambda lo, hi: F.col(hi) - F.col(lo)  # noqa: E731
    b = o.crossJoin(F.broadcast(mm)).select(
        "x", "y",
        F.floor((F.col("x") - F.col("xmin")) * 256.0 / (span("xmin", "xmax") + 1))
        .cast("long").alias("bx"),
        F.floor((F.col("y") - F.col("ymin")) * 256.0 / (span("ymin", "ymax") + 1))
        .cast("long").alias("by"),
        (F.col("xmin") + F.floor(span("xmin", "xmax") * 7.0 / 16).cast("long")).alias("qxlo"),
        (F.col("xmin") + F.floor(span("xmin", "xmax") * 9.0 / 16).cast("long")).alias("qxhi"),
        (F.col("ymin") + F.floor(span("ymin", "ymax") * 7.0 / 16).cast("long")).alias("qylo"),
        (F.col("ymin") + F.floor(span("ymin", "ymax") * 9.0 / 16).cast("long")).alias("qyhi"),
    )
    # r13: `b` feeds both curve layouts and `filed` feeds three summary
    # branches — without the slots each branch re-scanned orders and
    # re-ran the min/max broadcast (8 orders scans in the audited plan)
    b = _persist_slot(b, "warehouse.hilbert_bucketed")
    filed = _persist_slot(
        b.select(
            "x", "y", "qxlo", "qxhi", "qylo", "qyhi",
            (_interleave(F.col("bx"), F.col("by")) / 1024).cast("long").alias("zfile"),
            (F.col("bx") / 4).cast("long").alias("linfile"),
        ),
        "warehouse.hilbert_filed",
    )
    hfiled = hilbert_index(b, "bx", "by", bits=_ZBITS, out="hd").select(
        "x", "y", "qxlo", "qxhi", "qylo", "qyhi",
        (F.col("hd") / 1024).cast("long").alias("hfile"),
    )

    def _file_summary(df, key, files_alias, scanned_alias):
        stats = df.groupBy(key).agg(
            F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"), F.max("y").alias("y_hi"),
            F.first("qxlo").alias("qxlo"), F.first("qxhi").alias("qxhi"),
            F.first("qylo").alias("qylo"), F.first("qyhi").alias("qyhi"),
        )
        overlap = (
            (F.col("x_lo") <= F.col("qxhi")) & (F.col("x_hi") >= F.col("qxlo"))
            & (F.col("y_lo") <= F.col("qyhi")) & (F.col("y_hi") >= F.col("qylo"))
        )
        return stats.agg(
            F.count(F.lit(1)).cast("long").alias(files_alias),
            F.sum(F.when(overlap, 1).otherwise(0)).cast("long").alias(scanned_alias),
        )

    hsum = _file_summary(hfiled, "hfile", "files_h", "scanned_h")
    zsum = _file_summary(filed, "zfile", "files_z", "scanned_z").select("scanned_z")
    lsum = _file_summary(filed, "linfile", "files_lin", "scanned_lin").select("scanned_lin")
    hit = (
        F.col("x").between(F.col("qxlo"), F.col("qxhi"))
        & F.col("y").between(F.col("qylo"), F.col("qyhi"))
    )
    hits = filed.agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("rows_matched")
    )
    return hsum.crossJoin(zsum).crossJoin(lsum).crossJoin(hits).select(
        "files_h", "scanned_h", "scanned_z", "scanned_lin", "rows_matched"
    )



@register(
    "zorder_layout_stats",
    sql=f"""
    WITH {_Z_CTES}
    SELECT files_z, scanned_z, files_lin, scanned_lin, rows_matched
    FROM zsum CROSS JOIN lsum CROSS JOIN hits
    """,
)
def zorder_layout_stats(spark, sf_dir):
    """Data-skipping yield of Z-order clustering, measured in-plan: bucket
    (o_custkey, order-day) to 8 bits each, interleave into a 16-bit
    Z-value, carve 64 Z-contiguous files, and count how many files a
    centered 2-D box predicate (middle eighth of each dimension) must
    scan given per-file min/max column stats — against the same count
    for a custkey-ordered linear layout. Z-order prunes on BOTH
    dimensions (each file spans a small rectangle); the linear layout
    prunes only on custkey and must scan every file for the date bound.

    This is Hudi clustering's space-filling-curve mode re-derived as a
    measurable DataFrame plan (the engine's UpsertTable.cluster sorts
    files the same way). Scale shape: one 4-value aggregate broadcast
    back onto the scan, two map-side-combined groupBys on <=256-value
    keys, three 1-row frames crossJoined — nothing data-sized shuffles
    except the bucket groupBys on bounded keys."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long").alias("y"),
    )
    mm = o.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    span = lambda lo, hi: F.col(hi) - F.col(lo)  # noqa: E731
    b = o.crossJoin(F.broadcast(mm)).select(
        "x", "y",
        F.floor((F.col("x") - F.col("xmin")) * 256.0 / (span("xmin", "xmax") + 1))
        .cast("long").alias("bx"),
        F.floor((F.col("y") - F.col("ymin")) * 256.0 / (span("ymin", "ymax") + 1))
        .cast("long").alias("by"),
        (F.col("xmin") + F.floor(span("xmin", "xmax") * 7.0 / 16).cast("long")).alias("qxlo"),
        (F.col("xmin") + F.floor(span("xmin", "xmax") * 9.0 / 16).cast("long")).alias("qxhi"),
        (F.col("ymin") + F.floor(span("ymin", "ymax") * 7.0 / 16).cast("long")).alias("qylo"),
        (F.col("ymin") + F.floor(span("ymin", "ymax") * 9.0 / 16).cast("long")).alias("qyhi"),
    )
    filed = b.select(
        "x", "y", "qxlo", "qxhi", "qylo", "qyhi",
        (_interleave(F.col("bx"), F.col("by")) / 1024).cast("long").alias("zfile"),
        (F.col("bx") / 4).cast("long").alias("linfile"),
    )

    def _file_summary(df, key, files_alias, scanned_alias):
        stats = df.groupBy(key).agg(
            F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"), F.max("y").alias("y_hi"),
            F.first("qxlo").alias("qxlo"), F.first("qxhi").alias("qxhi"),
            F.first("qylo").alias("qylo"), F.first("qyhi").alias("qyhi"),
        )
        overlap = (
            (F.col("x_lo") <= F.col("qxhi")) & (F.col("x_hi") >= F.col("qxlo"))
            & (F.col("y_lo") <= F.col("qyhi")) & (F.col("y_hi") >= F.col("qylo"))
        )
        return stats.agg(
            F.count(F.lit(1)).cast("long").alias(files_alias),
            F.sum(F.when(overlap, 1).otherwise(0)).cast("long").alias(scanned_alias),
        )

    # r13: three summary branches consume `filed`; the slot keeps the
    # orders scan + bucket projection to one execution (6 scans before)
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    filed = _persist_slot(filed, "warehouse.zorder_filed")
    zsum = _file_summary(filed, "zfile", "files_z", "scanned_z")
    lsum = _file_summary(filed, "linfile", "files_lin", "scanned_lin")
    hit = (
        F.col("x").between(F.col("qxlo"), F.col("qxhi"))
        & F.col("y").between(F.col("qylo"), F.col("qyhi"))
    )
    hits = filed.agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("rows_matched")
    )
    return zsum.crossJoin(lsum).crossJoin(hits).select(
        "files_z", "scanned_z", "files_lin", "scanned_lin", "rows_matched"
    )


@register(
    "winsorized_segment_stats",
    sql=f"""
    WITH c AS (
      SELECT c_mktsegment, round(c_acctbal, 2) AS bal FROM customer
    ),
    q AS (
      SELECT c_mktsegment,
             round(quantile_cont(bal, 0.05), 2) AS p05,
             round(quantile_cont(bal, 0.95), 2) AS p95
      FROM c GROUP BY c_mktsegment
    ),
    clipped AS (
      SELECT c.c_mktsegment, p05, p95,
             least(greatest(bal, p05), p95) AS w
      FROM c JOIN q USING (c_mktsegment)
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           any_value(p05) AS p05,
           any_value(p95) AS p95,
           round({dsum_sql('w', 2)} / count(*), 4) AS win_mean,
           round(sqrt(({dsum_sql('w * w', 4)}
                       - {dsum_sql('w', 2)} * {dsum_sql('w', 2)} / count(*))
                      / (count(*) - 1)), 4) AS win_std
    FROM clipped
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def winsorized_segment_stats(spark, sf_dir):
    """Robust per-segment moments: clip account balances at the segment's
    own [p05, p95] (winsorizing — the feature-prep standard for
    heavy-tailed monetary features), then mean and sample stddev of the
    clipped values.

    Exactness: the clip bounds are rounded to 2 dp, so clipped values
    stay fixed-point and Σw / Σw² go through exact DECIMAL sums — both
    engines do the identical double arithmetic from identical sums.
    Scale shape: the per-segment quantiles aggregate over the segment
    key (5 groups) and broadcast back onto the scan; one data-sized
    shuffle total."""
    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )
    q = c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(bal, 0.05)"), 2).alias("p05"),
        F.round(F.expr("percentile(bal, 0.95)"), 2).alias("p95"),
    )
    w = F.least(F.greatest(F.col("bal"), F.col("p05")), F.col("p95"))
    clipped = c.join(F.broadcast(q), "c_mktsegment").select(
        "c_mktsegment", "p05", "p95", w.alias("w")
    )
    n = F.count(F.lit(1))
    s1 = dsum(F.col("w"), 2)
    s2 = dsum(F.col("w") * F.col("w"), 4)
    return (
        clipped.groupBy("c_mktsegment")
        .agg(
            n.cast("long").alias("n"),
            F.first("p05").alias("p05"),
            F.first("p95").alias("p95"),
            F.round(s1 / n, 4).alias("win_mean"),
            F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 4).alias("win_std"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "stratified_split_assignment",
    sql=f"""
    WITH strata AS (
      SELECT doc_id, lang,
             CAST(ntile(4) OVER (
               PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS quartile
      FROM documents
    ),
    assigned AS (
      SELECT lang, quartile,
             CASE WHEN h % 10 <= 7 THEN 'train'
                  WHEN h % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT lang, quartile,
                   {stable_hash64_sql("CAST(doc_id AS VARCHAR)", seed="split")} AS h
            FROM strata)
    )
    SELECT lang, quartile, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / sum(count(*)) OVER (
             PARTITION BY lang, quartile), 4) AS frac
    FROM assigned
    GROUP BY lang, quartile, split
    ORDER BY lang, quartile, split
    """,
)
def stratified_split_assignment(spark, sf_dir):
    """Deterministic stratified train/val/test split report: strata are
    (lang x in-language length quartile); assignment is a stable hash of
    the doc id (80/10/10), so membership is reproducible across runs,
    engines, and re-partitioning — the property that makes a split
    auditable (split_leakage_minhash audits the companion hazard). The
    report shows each stratum's achieved fractions.

    Scale shape: the quartile window partitions by lang (distributed);
    the hash is a map-side expression; the report aggregates on a
    bounded (lang, quartile, split) key. Nothing global-sorts."""
    docs = t(spark, sf_dir, "documents")
    wq = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    strata = docs.select(
        "doc_id", "lang", F.ntile(4).over(wq).cast("long").alias("quartile")
    )
    h = stable_hash64(F.col("doc_id").cast("string"), seed="split")
    assigned = strata.select(
        "lang",
        "quartile",
        F.when(h % 10 <= 7, "train").when(h % 10 == 8, "val").otherwise("test")
        .alias("split"),
    )
    counts = assigned.groupBy("lang", "quartile", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wtot = W.partitionBy("lang", "quartile")
    return counts.select(
        "lang", "quartile", "split", "n_docs",
        F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(wtot), 4).alias("frac"),
    ).orderBy("lang", "quartile", "split")


def _perplexity_band_sql() -> str:
    # composed from the REGISTERED unigram-LM oracle so the band filter
    # cannot drift from the score it claims to filter on (the
    # knn_recall_eval composition pattern)
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import QUERIES

    uni = QUERIES["text_unigram_logprob"].sql
    return f"""
    WITH scored AS ({uni}),
    thr AS (
      SELECT quantile_cont(avg_neg_logp, 0.10) AS lo,
             quantile_cont(avg_neg_logp, 0.90) AS hi
      FROM scored
    ),
    lab AS (
      SELECT d.lang,
             CASE WHEN s.avg_neg_logp < lo THEN 'low'
                  WHEN s.avg_neg_logp > hi THEN 'high'
                  ELSE 'keep' END AS band
      FROM scored s JOIN documents d USING (doc_id) CROSS JOIN thr
    )
    SELECT lang, band, CAST(count(*) AS BIGINT) AS n_docs
    FROM lab GROUP BY lang, band ORDER BY lang, band
    """


@register("perplexity_band_filter", sql=_perplexity_band_sql())
def perplexity_band_filter(spark, sf_dir):
    """CCNet-style perplexity band filter: score every document with the
    corpus-fit unigram LM (text_unigram_logprob — low = boilerplate-
    predictable, high = word soup), then band at the global p10/p90 —
    the middle band is what a curation pipeline keeps. Reports the band
    census per language, which is also the filter's fairness audit (a
    language the LM underfits shows up as a skewed high tail).

    Scale shape: the LM fit and scoring are the registered operator's
    plan (one token explode, vocab broadcast); the two thresholds ride
    a 1-row broadcast; the census aggregates on a bounded key. The
    p10/p90 percentile runs on the per-DOC score frame (n = corpus
    docs, not tokens)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import text as X

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    docs = t(spark, sf_dir, "documents")
    # scored feeds the percentile thresholds AND the banding pass; the
    # slot keeps the LM fit + token explode to one execution (r13 plan
    # audit: 7 documents scans in this plan)
    scored = _persist_slot(
        X.unigram_logprob(docs, "doc_id", "text"), "warehouse.ppl_scored"
    )
    thr = scored.agg(
        F.expr("percentile(avg_neg_logp, 0.10)").alias("lo"),
        F.expr("percentile(avg_neg_logp, 0.90)").alias("hi"),
    )
    lab = (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .crossJoin(F.broadcast(thr))
        .select(
            "lang",
            F.when(F.col("avg_neg_logp") < F.col("lo"), "low")
            .when(F.col("avg_neg_logp") > F.col("hi"), "high")
            .otherwise("keep")
            .alias("band"),
        )
    )
    return (
        lab.groupBy("lang", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "band")
    )


def _kcenter_oracle_sql(k: int = 5) -> str:
    """Unrolled greedy farthest-point CTEs — round r's argmax is a
    LIMIT 1 over least(distances to the r-1 prior centers), exactly the
    rounds the Spark side runs (the bounded-round oracle pattern
    operators/graph.py uses)."""

    def dist(a: str, b: str) -> str:
        return (
            f"round(1 - list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
        )

    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c1 AS (SELECT vec_id, v, 0.0 AS md FROM e "
        "WHERE vec_id = (SELECT min(vec_id) FROM e))",
    ]
    for r in range(2, k + 1):
        prior = [f"c{i}" for i in range(1, r)]
        froms = " CROSS JOIN ".join(["e"] + prior)
        excl = " AND ".join(f"e.vec_id <> {c}.vec_id" for c in prior)
        dists = ", ".join(dist("e.v", f"{c}.v") for c in prior)
        md = f"least({dists})" if r > 2 else dist("e.v", "c1.v")
        ctes.append(
            f"c{r} AS (SELECT e.vec_id, e.v, {md} AS md FROM {froms} "
            f"WHERE {excl} ORDER BY md DESC, e.vec_id LIMIT 1)"
        )
    unions = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rnd, vec_id AS center_id, md AS dist FROM c{r}"
        for r in range(1, k + 1)
    )
    return f"WITH {', '.join(ctes)} SELECT rnd, center_id, dist FROM ({unions}) ORDER BY rnd"


@register("diversity_kcenter_sample", sql=_kcenter_oracle_sql())
def diversity_kcenter_sample(spark, sf_dir):
    """Greedy k-center (farthest-point) coreset over the embedding
    corpus: seed at the smallest vec_id, then 4 rounds of "pick the
    point whose NEAREST chosen center is farthest" (cosine distance,
    6 dp, ties to the smaller id). This is the diversity-sampling
    primitive training-data curation uses to pick maximally-spread
    exemplars (and the k-means++ -style seeding IVFIndex could take);
    exact duplicates have distance 0 and are never picked — the
    anti-dedup-complement property that makes the sample diverse.

    Scale shape: each round is ONE map-side pass over the corpus (the
    chosen centers enter the plan as literal vectors, norms folded
    in-plan) into a 1-row max aggregate — k bounded rounds = k scans,
    no shuffle wider than the single-row argmax. The only driver state
    is the k chosen (id, vector) tuples — bounded metadata, the same
    contract as IVF's k x dim codebook. Returns (rnd, center_id, dist)
    where dist is the selection distance (coverage radius sequence,
    non-increasing)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import dot_product, l2_norm

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # seed = smallest vec_id, fetched with the SAME single-row argmax
    # shape the rounds use (one job; the first cut ran two collects —
    # a min then a filtered fetch)
    seed = e.agg(
        F.min(F.struct("vec_id", "v")).alias("top")
    ).collect()[0]["top"]
    chosen = [(int(seed.vec_id), list(seed.v), 0.0)]
    for _ in range(4):
        dist_cols = []
        for cid, cvec, _d in chosen:
            lit_v = F.array(*[F.lit(float(x)) for x in cvec])
            dist_cols.append(
                F.round(
                    1
                    - dot_product(F.col("v"), lit_v)
                    / (l2_norm(F.col("v")) * l2_norm(lit_v)),
                    6,
                )
            )
        md = F.least(*dist_cols) if len(dist_cols) > 1 else dist_cols[0]
        cand = (
            e.filter(~F.col("vec_id").isin([c[0] for c in chosen]))
            .select("vec_id", "v", md.alias("md"))
            .agg(F.max(F.struct("md", (-F.col("vec_id")).alias("nid"), "v")).alias("top"))
            .collect()[0]["top"]
        )
        chosen.append((int(-cand.nid), list(cand.v), float(cand.md)))
    return spark.createDataFrame(
        [(i + 1, cid, d) for i, (cid, _v, d) in enumerate(chosen)],
        "rnd long, center_id long, dist double",
    )


@register(
    "temporal_tier_attribution",
    sql=f"""
    WITH dim_ev AS (
      SELECT user_id, ts, event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cnt
      FROM events WHERE event_type IN ('view', 'click', 'login')
    ),
    tiered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN cnt < 5 THEN 'low'
                  WHEN cnt < 15 THEN 'mid'
                  ELSE 'high' END AS tier
      FROM dim_ev
    ),
    starts AS (
      SELECT user_id, tier, ts, event_id FROM (
        SELECT *, lag(tier) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM tiered)
      WHERE prev IS NULL OR prev <> tier
    ),
    periods AS (
      SELECT user_id, tier, ts AS valid_from,
             lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM starts
    ),
    facts AS (
      SELECT user_id, ts, round(value, 2) AS value FROM events
      WHERE event_type = 'purchase'
    ),
    attributed AS (
      SELECT coalesce(p.tier, 'none') AS tier, f.value
      FROM facts f LEFT JOIN periods p
        ON p.user_id = f.user_id
       AND p.valid_from <= f.ts
       AND (p.valid_to IS NULL OR f.ts < p.valid_to)
    )
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n_purchases,
           {dsum_sql('value', 2)} AS total_value
    FROM attributed GROUP BY tier ORDER BY tier
    """,
)
def temporal_tier_attribution(spark, sf_dir):
    """Temporal dimension join (the SCD2 consumption pattern): build the
    user's engagement-tier history from view/click/login events (tier
    ascends with cumulative activity, so each user has at most 3
    validity periods), then attribute every PURCHASE to the tier that
    was valid at purchase time via an interval join — purchases before
    any activity land in tier 'none'. This is the query shape SCD2
    tables exist for: "metric X by the dimension state AS OF the fact's
    timestamp", not as of today.

    Scale shape: the tier build is one user-keyed shuffle (count window
    + change-point filter); the interval join is an equi join on
    user_id with the validity range as residual filter — per-user
    periods are bounded (<= 3, tiers only ascend), so fan-out is
    bounded and no range-bin machinery is needed (operators/rangejoin
    .py is the unbounded-period fallback). Money through exact decimal
    sums."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim_ev = ev.filter(F.col("event_type").isin("view", "click", "login")).select(
        "user_id", "ts", "event_id", F.count(F.lit(1)).over(w).alias("cnt")
    )
    tiered = dim_ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("cnt") < 5, "low")
        .when(F.col("cnt") < 15, "mid")
        .otherwise("high")
        .alias("tier"),
    )
    starts = tiered.withColumn("prev", F.lag("tier").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("tier"))
    )
    periods = starts.select(
        "user_id", "tier",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 2).alias("value")
    )
    attributed = facts.join(
        periods,
        (periods.user_id == facts.user_id)
        & (F.col("valid_from") <= facts.ts)
        & (F.col("valid_to").isNull() | (facts.ts < F.col("valid_to"))),
        "left",
    ).select(F.coalesce(F.col("tier"), F.lit("none")).alias("tier"), "value")
    return (
        attributed.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            dsum(F.col("value"), 2).alias("total_value"),
        )
        .orderBy("tier")
    )


@register(
    "feature_store_pit",
    sql="""
    WITH u AS (
      SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v,
             0 AS is_order, NULL::BIGINT AS okey,
             1 AS sk2, event_id AS sk3
      FROM events
      UNION ALL
      SELECT o_custkey AS user_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + ((o_orderkey % 30) * INTERVAL 1 DAY)
               + ((o_orderkey % 24) * INTERVAL 1 HOUR) AS ts,
             NULL AS v, 1 AS is_order, o_orderkey AS okey,
             0 AS sk2, o_orderkey AS sk3
      FROM orders WHERE o_custkey <= 150
    ),
    feat AS (
      SELECT user_id, ts, is_order, okey,
             CAST(sum(1 - is_order) OVER w AS BIGINT) AS n_events_before,
             CAST(coalesce(sum(v) OVER w, 0) AS DOUBLE) AS value_before,
             max(CASE WHEN is_order = 0 THEN ts END) OVER w AS last_ev_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, sk2, sk3
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT okey AS o_orderkey, user_id, n_events_before, value_before,
           CAST(date_diff('day', CAST(last_ev_ts AS DATE), CAST(ts AS DATE))
                AS BIGINT) AS days_since_last
    FROM feat WHERE is_order = 1
    ORDER BY o_orderkey
    """,
)
def feature_store_pit(spark, sf_dir):
    """Point-in-time-correct feature join — the feature-store property
    that decides whether a training set leaks the future: for every
    order (entity = customer, as-of time = order date), the features
    (event count, exact-decimal spend, days since last activity) are
    computed from events STRICTLY BEFORE that instant. One union +
    one running window per user does every (entity, time) lookup at
    once; same-timestamp events sort AFTER the order row inside the
    window, so they are excluded by construction — the no-leakage rule
    is in the sort key, not a filter someone can forget. The oracle
    replays the identical window, so any leaked row breaks the value
    hash.

    Scale: one shuffle on the entity key; the running frame is the
    as-of-join shape (`asof_join_events_orders`) generalized from
    last-value to running aggregates — no per-order subquery, no range
    join explosion. Orders are restricted to the event-active customer
    range and their as-of instants derive deterministically inside the
    event month (raw 1992-1998 order dates precede every 2024 event),
    so the features have real support at fixture scale."""
    from pyspark.sql.window import Window as W

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("okey"),
        F.lit(1).alias("sk2"),
        F.col("event_id").alias("sk3"),
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 150).select(
        F.col("o_custkey").alias("user_id"),
        # deterministic as-of instants INSIDE the event window (the raw
        # 1992-1998 order dates precede every 2024 event — every feature
        # would be vacuously zero)
        F.expr(
            "TIMESTAMP '2024-01-01 00:00:00' "
            "+ ((o_orderkey % 30) * INTERVAL 1 DAY) "
            "+ ((o_orderkey % 24) * INTERVAL 1 HOUR)"
        ).alias("ts"),
        F.lit(None).cast("decimal(18,2)").alias("v"),
        F.lit(1).alias("is_order"),
        F.col("o_orderkey").alias("okey"),
        F.lit(0).alias("sk2"),
        F.col("o_orderkey").alias("sk3"),
    )
    u = e.unionByName(o)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "sk2", "sk3")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    feat = u.select(
        "user_id", "ts", "is_order", "okey",
        F.sum(1 - F.col("is_order")).over(w).cast("long").alias("n_events_before"),
        F.coalesce(F.sum("v").over(w), F.lit(0)).cast("double").alias("value_before"),
        F.max(F.when(F.col("is_order") == 0, F.col("ts"))).over(w).alias("last_ev_ts"),
    )
    return (
        feat.filter(F.col("is_order") == 1)
        .select(
            F.col("okey").alias("o_orderkey"),
            "user_id",
            "n_events_before",
            "value_before",
            F.datediff(
                F.col("ts").cast("date"), F.col("last_ev_ts").cast("date")
            ).cast("long").alias("days_since_last"),
        )
        .orderBy("o_orderkey")
    )
