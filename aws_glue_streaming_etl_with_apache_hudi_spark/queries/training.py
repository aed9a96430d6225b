"""Training-corpus assembly queries: deterministic splits, per-source
quota sampling, token-budget shard packing — the selection/packing stage
that follows dedup + quality filtering (queries/northstar.py) in a
large-scale training-data pipeline. All hash decisions use the
engine-portable md5-derived family (functions/hashing.py) so every
query is DuckDB-oracle-checked bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64, stable_hash64_sql
from aws_glue_streaming_etl_with_apache_hudi_spark.operators import text as X
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t

_H_SPLIT = stable_hash64_sql("CAST(doc_id AS VARCHAR)", "split")
_H_SAMPLE = stable_hash64_sql("CAST(doc_id AS VARCHAR)", "sample")


@register(
    "train_test_split",
    sql=f"""
    SELECT lang,
           CASE WHEN {_H_SPLIT} % 100 < 95 THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY 1, 2 ORDER BY lang, split
    """,
)
def train_test_split(spark, sf_dir):
    """Deterministic hash split (95/5): membership is a pure function of
    doc_id + a named salt, so the split is stable across runs, machines,
    and engine versions — no stored assignment table, no RNG state. At
    100 TB this is the only split that works: any sampled/stateful split
    needs a join against an assignment table; this is one codegen'd
    expression per row, no shuffle before the final rollup."""
    docs = t(spark, sf_dir, "documents")
    h = stable_hash64(F.col("doc_id").cast("string"), "split")
    split = F.when(h % 100 < 95, "train").otherwise("test")
    return (
        docs.groupBy(F.col("lang"), split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .orderBy("lang", "split")
    )


@register(
    "quota_sample_per_source",
    sql=f"""
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_H_SAMPLE}, doc_id) AS rk
      FROM documents) x
    WHERE rk <= 25 ORDER BY source, rk
    """,
)
def quota_sample_per_source(spark, sf_dir):
    """Per-source quota sampling: cap each source's contribution at k
    docs, chosen by hash order — a deterministic uniform sample without
    RNG (the hash is salted independently from the split hash, so the
    two decisions are uncorrelated). The standard guard against one
    crawl dominating a mixed corpus. One shuffle on source; per-group
    top-k is rank-and-filter (TakeOrdered-style, no global sort)."""
    docs = t(spark, sf_dir, "documents")
    h = stable_hash64(F.col("doc_id").cast("string"), "sample")
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 25)
        .orderBy("source", "rk")
    )


_H_DOMCAP = stable_hash64_sql("CAST(doc_id AS VARCHAR)", "domaincap")

#: Any single domain may contribute at most this share of the corpus.
_DOMCAP_SHARE = 0.02
#: ...but never fewer than this many docs (tail domains keep coverage).
_DOMCAP_FLOOR = 5


@register(
    "domain_cap_sample",
    sql=f"""
    WITH parsed AS (
      SELECT 'www.' || source || '.example.org' AS host, doc_id
      FROM documents),
    ranked AS (
      SELECT host, doc_id,
             CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS n_docs,
             CAST(count(*) OVER () AS BIGINT) AS total_docs,
             row_number() OVER (PARTITION BY host
                                ORDER BY {_H_DOMCAP}, doc_id) AS rk
      FROM parsed),
    quotas AS (
      SELECT *, CAST(least(n_docs, greatest(
               CAST(floor({_DOMCAP_SHARE} * total_docs) AS BIGINT),
               {_DOMCAP_FLOOR})) AS BIGINT) AS quota
      FROM ranked)
    SELECT host, n_docs, quota,
           CAST(sum(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rk <= quota THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_doc_sum
    FROM quotas GROUP BY host, n_docs, quota ORDER BY host
    """,
)
def domain_cap_sample(spark, sf_dir):
    """The domain-capping pass END TO END (VERDICT r10 task 6): the
    composition url_parse_profile's host census sizes -> per-host quota
    from a target corpus share -> quota_sample_per_source-style capped
    hash sample. This is the anti-domination stage a web-corpus build
    runs after the census (CCNet/RefinedWeb): no host may exceed
    _DOMCAP_SHARE of the corpus, with a floor so tail domains keep
    coverage. ``kept_doc_sum`` pins the EXACT sample membership in the
    value hash, not just its size.

    Scale: ONE shuffle on host — the census count, the rank, and the
    quota all come out of the same host-partitioned exchange (window
    count + row_number share it); the corpus total joins in as a 1-row
    broadcast. The per-doc kept set never leaves the executors; only
    the per-host rollup returns. The hash salt ('domaincap') is
    independent of the split/sample salts, so capping is uncorrelated
    with train/test membership."""
    docs = t(spark, sf_dir, "documents")
    # leg 1 (census extractor): the same canonical URL + parse_url HOST
    # as url_parse_profile — the oracle rebuilds the host with string
    # algebra, so the value hash pins the extractor like the census does
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    h = stable_hash64(F.col("doc_id").cast("string"), "domaincap")
    w_host = Window.partitionBy("host")
    parsed = docs.select(host.alias("host"), "doc_id").select(
        "host", "doc_id",
        F.count(F.lit(1)).over(w_host).alias("n_docs"),
        F.row_number()
        .over(Window.partitionBy("host").orderBy(h, "doc_id"))
        .alias("rk"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("total_docs"))
    quota = F.least(
        F.col("n_docs"),
        F.greatest(
            F.floor(F.lit(_DOMCAP_SHARE) * F.col("total_docs")).cast("long"),
            F.lit(_DOMCAP_FLOOR).cast("long"),
        ),
    )
    kept = F.when(F.col("rk") <= F.col("quota"), 1).otherwise(0)
    kept_doc = F.when(F.col("rk") <= F.col("quota"), F.col("doc_id")).otherwise(0)
    return (
        parsed.crossJoin(F.broadcast(total))
        .withColumn("quota", quota)
        .groupBy("host", "n_docs", "quota")
        .agg(
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(kept_doc).cast("long").alias("kept_doc_sum"),
        )
        .orderBy("host")
    )


@register(
    "corpus_build_pipeline",
    headline=True,
    sql=rf"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    ),
    kept AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
    w AS (SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS ws
          FROM kept),
    s AS (SELECT doc_id, lang, len(ws) AS n_words,
                 round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4)
                   AS distinct_ratio,
                 round(CAST(len(list_filter(ws, x -> list_contains(
                       ['hash','order','table','row','batch'], x))) AS DOUBLE)
                       / len(ws), 4) AS filler_ratio
          FROM w),
    q AS (SELECT doc_id, lang, n_words,
                 round(0.4 * least(n_words / 100.0, 1.0)
                       + 0.4 * distinct_ratio
                       + 0.2 * (1 - filler_ratio), 4) AS quality
          FROM s)
    SELECT lang,
           CASE WHEN {_H_SPLIT} % 100 < 95 THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_tokens
    FROM q WHERE quality >= 0.5
    GROUP BY 1, 2 ORDER BY lang, split
    """,
)
def corpus_build_pipeline(spark, sf_dir):
    """The chained corpus-assembly dataflow end to end: exact dedup
    (keep min doc_id per normalized-text digest) -> quality gate
    (score >= 0.5) -> deterministic hash split -> per-(lang, split)
    rollup with token totals. Each stage is an operator already proven
    in isolation; this query pins their COMPOSITION, which is what a
    real 100 TB corpus build runs as one job. Plan shape: one digest
    aggregation (16-byte shuffle keys), a semi-join back to documents,
    map-side quality scoring, final rollup — no full-text shuffle
    anywhere. Quality and token counts are computed in the SAME
    projection over the deduped frame (text_stats keep= + quality_expr):
    the former quality_score-vs-token-count self-join scanned documents
    and recomputed the dedup semi-join twice for columns that are all
    row-local expressions (the r4 perf drift on this query)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import dedup as D
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import text as TX

    docs = t(spark, sf_dir, "documents")
    keep = D.exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    kept = docs.join(keep, on="doc_id", how="inner")
    scored = TX.text_stats(kept, "doc_id", "text", keep=("lang",)).select(
        "doc_id", "lang", "n_words", TX.quality_expr().alias("quality")
    )
    h = stable_hash64(F.col("doc_id").cast("string"), "split")
    split = F.when(h % 100 < 95, "train").otherwise("test")
    return (
        scored.filter(F.col("quality") >= 0.5)
        .groupBy(F.col("lang"), split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_tokens"),
        )
        .orderBy("lang", "split")
    )


@register(
    "token_shard_packing",
    sql=r"""
    WITH tk AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             sum(toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM tk
    )
    SELECT CAST((cum - toks) // 2000 AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1 ORDER BY shard
    """,
)
def token_shard_packing(spark, sf_dir):
    """Token-budget shard packing: documents in doc_id order fill
    ~2k-token shards; a doc starts a new shard when the budget is
    exceeded (greedy prefix-sum assignment). This fixes shard boundaries
    BEFORE any writer runs, so the pack is reproducible. The running
    sum comes from operators/skew.py distributed_prefix_sum — the
    two-phase plan (quantile-bucketed per-bucket subtotals, broadcast
    prefix offsets, bucket-local window cumsum) — so NOTHING
    single-partition-sorts: the only driver-side data is O(buckets)
    boundary/subtotal metadata. doc_id is unique, so the total order
    (and therefore every shard boundary) is exact."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import (
        distributed_prefix_sum,
    )

    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", X.token_count_whitespace("text").alias("toks")
    )
    c = distributed_prefix_sum(tk, "doc_id", "toks", out="cum", buckets=32)
    return (
        c.select(
            F.expr("(cum - toks) div 2000").alias("shard"), "toks", "doc_id"
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard")
    )


_H_TEMP = stable_hash64_sql("CAST(doc_id AS VARCHAR)", "tsamp")
_POW60 = float(1 << 60)


@register(
    "temperature_sample_langs",
    sql=rf"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS nt
      FROM documents
    ),
    agg AS (SELECT lang, CAST(sum(nt) AS DOUBLE) AS tl FROM tok GROUP BY lang),
    tot AS (SELECT sum(tl) AS tt FROM agg),
    sh AS (SELECT lang, tl / tt AS s FROM agg, tot),
    mn AS (SELECT min(s) AS smin FROM sh),
    rate AS (SELECT lang, pow(s / smin, -0.5) AS r FROM sh, mn)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rate USING (lang)
    WHERE CAST({_H_TEMP} AS DOUBLE) / {_POW60!r} < r
    ORDER BY doc_id
    """,
)
def temperature_sample_langs(spark, sf_dir):
    """Temperature-based language rebalancing (the mC4/T5 alpha-sampling
    rule, alpha=0.5): target language shares proportional to
    share^alpha, realized as per-language KEEP RATES
    r_l = (s_l / s_min)^(alpha-1) — the rarest language keeps everything
    (rate 1), dominant languages are hash-downsampled toward the
    flattened mix. Membership is a pure function of doc_id + salt (the
    train_test_split discipline): no RNG, no assignment table, stable
    across runs and engines; the oracle recomputes shares, rates, and
    every per-doc keep decision.

    Scale: shares come from one map-side-combined aggregation (5 rows),
    the rates broadcast back onto the corpus, and the keep decision is
    one codegen'd expression per row — no shuffle of documents at all."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", X.token_count_whitespace("text").alias("nt")
    )
    # share -> rate over the ~|languages|-row aggregate via global
    # windows (r13): the former agg->crossJoin(broadcast)->agg chain
    # re-inlined the token-count aggregation once per rung (5 documents
    # scans in the audited plan) and paid a broadcast build each; the
    # window sums are the same exact values (integer-valued doubles)
    wall = Window.partitionBy()
    shares = tok.groupBy("lang").agg(F.sum("nt").cast("double").alias("tl"))
    sh = shares.select("lang", (F.col("tl") / F.sum("tl").over(wall)).alias("s"))
    rate = sh.select(
        "lang", F.pow(F.col("s") / F.min("s").over(wall), F.lit(-0.5)).alias("r")
    )
    u = stable_hash64(F.col("doc_id").cast("string"), "tsamp").cast("double") / float(
        1 << 60
    )
    return (
        docs.join(F.broadcast(rate), "lang")
        .filter(u < F.col("r"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "importance_reweight_ess",
    sql="""
    WITH agg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM agg),
    sh AS (SELECT lang, n, n / nn AS s FROM agg, tot),
    pq AS (
      SELECT lang, n, s,
             CAST(round(pow(s, 0.7), 9) AS DECIMAL(12,9)) AS p
      FROM sh
    ),
    z AS (SELECT sum(p) AS zz FROM pq),
    w AS (
      SELECT lang, n,
             CAST(round(CAST(p AS DOUBLE) / CAST(zz AS DOUBLE) / s, 6)
                  AS DECIMAL(14,6)) AS wq
      FROM pq, z
    ),
    ess AS (
      SELECT round(CAST(sum(n * wq) AS DOUBLE) * CAST(sum(n * wq) AS DOUBLE)
                   / CAST(sum(n * wq * wq) AS DOUBLE), 4) AS ess_docs
      FROM w
    )
    SELECT lang, n AS n_docs, CAST(wq AS DOUBLE) AS weight, ess_docs AS ess
    FROM w, ess ORDER BY lang
    """,
)
def importance_reweight_ess(spark, sf_dir):
    """Importance weights for a temperature-adjusted target mixture plus
    the EFFECTIVE SAMPLE SIZE diagnostic — the data-mixing companion to
    temperature_sample_langs: instead of DROPPING documents to flatten
    the language mix, every document gets weight w_l = t_l / s_l where
    the target shares t_l ∝ s_l^0.7 (the multilingual sampling rule) and
    s_l are the observed shares; ESS = (Σw)²/Σw² (Kish) says how many
    effective documents the reweighted corpus is worth — the number a
    pipeline checks before deciding reweighting is too degenerate and it
    should resample instead.

    Determinism discipline (the decayed_popularity pattern): the only
    libm call, pow(s, 0.7), is quantized to 9 dp and cast to DECIMAL
    BEFORE the normalizer sum, so Σ s^0.7 is an exact decimal (a raw
    double sum would be order-dependent); the weight double-chain
    p/z/s divides bit-identical doubles left-to-right in both engines
    and is itself quantized at 6 dp, so ESS's Σn·w and Σn·w² are exact
    integer×decimal sums.

    Scale: one map-side-combined count per language (5 rows), every
    later step is arithmetic on that 5-row frame with broadcast totals
    — nothing about the corpus is shuffled; the weights broadcast back
    to the loader at training time."""
    # r13: the former agg→crossJoin(broadcast)→agg→crossJoin chain
    # re-inlined the documents groupBy once per consumer (8 scans in the
    # audited plan) and paid a broadcast-build job per normalizer;
    # global windows over the ~|languages|-row aggregate produce the
    # SAME exact sums (long/decimal window sums are order-free) in one
    # pass — one documents scan, one shuffle, no broadcasts.
    wall = Window.partitionBy()
    d = t(spark, sf_dir, "documents")
    agg = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sh = agg.select(
        "lang", "n",
        (F.col("n") / F.sum("n").over(wall).cast("double")).alias("s"),
    )
    pq = sh.select(
        "lang", "n", "s",
        F.round(F.pow("s", F.lit(0.7)), 9).cast("decimal(12,9)").alias("p"),
    )
    w = pq.select(
        "lang", "n",
        F.round(
            F.col("p").cast("double")
            / F.sum("p").over(wall).cast("double")
            / F.col("s"),
            6,
        ).cast("decimal(14,6)").alias("wq"),
    )
    swq = F.sum(F.col("n") * F.col("wq")).over(wall).cast("double")
    sww = F.sum(F.col("n") * F.col("wq") * F.col("wq")).over(wall).cast("double")
    return (
        w.select(
            "lang",
            F.col("n").alias("n_docs"),
            F.col("wq").cast("double").alias("weight"),
            F.round(swq * swq / sww, 4).alias("ess"),
        )
        .orderBy("lang")
    )


@register(
    "curriculum_phases",
    sql=r"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_words,
             round((length(text) - len(string_split_regex(lower(text), '\s+')) + 1.0)
                   / len(string_split_regex(lower(text), '\s+')), 4) AS difficulty
      FROM documents
    ),
    c AS (
      SELECT quantile_cont(difficulty, 1.0/3) AS c1,
             quantile_cont(difficulty, 2.0/3) AS c2
      FROM s
    )
    SELECT CASE WHEN difficulty <= c1 THEN 0
                WHEN difficulty <= c2 THEN 1
                ELSE 2 END AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_tokens,
           round(min(difficulty), 4) AS min_difficulty,
           round(max(difficulty), 4) AS max_difficulty
    FROM s CROSS JOIN c
    GROUP BY 1 ORDER BY phase
    """,
)
def curriculum_phases(spark, sf_dir):
    """Curriculum-learning phase assignment: documents bucket into three
    difficulty tiers (easy -> hard) by mean word length, with per-phase
    doc counts and token budgets — the schedule-construction pass of a
    curriculum training recipe. Cut points are EXACT interpolated
    terciles (Spark percentile == DuckDB quantile_cont, the proven
    parity from percentiles_exact) broadcast into a row-local CASE, so
    phase assignment never sorts the corpus.

    Scale: contrast the naive global ntile — a full sort of every row on
    one partition. Here: one stats pass (row-local expressions), a
    2-value broadcast aggregate, map-side bucketing, and a 3-group
    rollup. The exact percentile itself sorts only the per-partition
    difficulty COLUMN; at 100 TB swap in percentile_approx with no other
    change (approx_error_bound pins that substitution's error)."""
    docs = t(spark, sf_dir, "documents")
    stats = X.text_stats(docs, "doc_id", "text").select(
        "doc_id", "n_words", F.col("avg_word_len").alias("difficulty")
    )
    cuts = stats.agg(
        F.percentile("difficulty", F.lit(1.0 / 3)).alias("c1"),
        F.percentile("difficulty", F.lit(2.0 / 3)).alias("c2"),
    )
    phase = (
        F.when(F.col("difficulty") <= F.col("c1"), 0)
        .when(F.col("difficulty") <= F.col("c2"), 1)
        .otherwise(2)
    )
    return (
        stats.crossJoin(F.broadcast(cuts))
        .select(phase.alias("phase"), "n_words", "difficulty")
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_tokens"),
            F.round(F.min("difficulty"), 4).alias("min_difficulty"),
            F.round(F.max("difficulty"), 4).alias("max_difficulty"),
        )
        .orderBy("phase")
    )


_M60_ = (1 << 60) - 1
_H_SH1 = stable_hash64_sql("sh")
_H_SH2 = stable_hash64_sql("sh", seed="b")
_H_TEMP2 = stable_hash64_sql("CAST(doc_id AS VARCHAR)", "tsamp2")

_V2_SQL = rf"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    ),
    k1 AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
    words1 AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM k1
    ),
    shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, array_to_string(w[i:i+2], ' ') AS sh
        FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
              FROM words1)
      ) WHERE sh <> ''
    ),
    hashed AS (
      SELECT doc_id, {_H_SH1} AS h1, {_H_SH2} AS h2 FROM shingles
    ),
    sigs AS (
      SELECT doc_id, s.seed,
             min((((s.seed * h2) & {_M60_}) + h1) & {_M60_}) AS mh
      FROM hashed, (SELECT unnest(range(0, 8)) AS seed) s
      GROUP BY doc_id, s.seed
    ),
    band2 AS (
      SELECT doc_id, seed // 2 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS bucket
      FROM sigs GROUP BY doc_id, seed // 2
    ),
    capped AS (
      SELECT doc_id, band, bucket FROM (
        SELECT band2.*, count(*) OVER (PARTITION BY band, bucket) AS bsz
        FROM band2)
      WHERE bsz <= 1000
    ),
    cands AS (
      SELECT DISTINCT p.doc_id AS pid, q.doc_id AS cid
      FROM capped p JOIN capped q
        ON p.band = q.band AND p.bucket = q.bucket
      WHERE q.doc_id < p.doc_id
    ),
    est AS (
      SELECT pid, cid,
             CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS ej
      FROM cands
      JOIN sigs a ON a.doc_id = pid
      JOIN sigs b ON b.doc_id = cid AND b.seed = a.seed
      GROUP BY pid, cid
    ),
    dups AS (SELECT DISTINCT pid AS doc_id FROM est WHERE ej >= 0.5),
    k2 AS (
      SELECT k1.* FROM k1 LEFT JOIN dups USING (doc_id)
      WHERE dups.doc_id IS NULL
    ),
    w2 AS (SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS ws
           FROM k2),
    s2 AS (SELECT doc_id, lang, len(ws) AS n_words,
                  round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4)
                    AS distinct_ratio,
                  round(CAST(len(list_filter(ws, x -> list_contains(
                        ['hash','order','table','row','batch'], x))) AS DOUBLE)
                        / len(ws), 4) AS filler_ratio
           FROM w2),
    k3 AS (
      SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words
      FROM (SELECT *, round(0.4 * least(n_words / 100.0, 1.0)
                            + 0.4 * distinct_ratio
                            + 0.2 * (1 - filler_ratio), 4) AS quality
            FROM s2)
      WHERE quality >= 0.5
    ),
    agg3 AS (SELECT lang, CAST(sum(n_words) AS DOUBLE) AS tl FROM k3 GROUP BY lang),
    tot3 AS (SELECT sum(tl) AS tt FROM agg3),
    sh3 AS (SELECT lang, tl / tt AS s FROM agg3, tot3),
    mn3 AS (SELECT min(s) AS smin FROM sh3),
    rate3 AS (SELECT lang, pow(s / smin, -0.5) AS r FROM sh3, mn3),
    k4 AS (
      SELECT k3.* FROM k3 JOIN rate3 USING (lang)
      WHERE CAST({_H_TEMP2} AS DOUBLE) / {float(1 << 60)!r} < r
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_tokens
    FROM k4 GROUP BY lang ORDER BY lang
    """


@register("corpus_build_pipeline_v2", sql=_V2_SQL)
def corpus_build_pipeline_v2(spark, sf_dir):
    """The COMPLETE training-corpus build as one dataflow — the four-
    stage composition a modern data recipe actually runs, each stage an
    operator proven in isolation, the whole chain pinned by ONE oracle:

      1. exact dedup      (keep min doc_id per normalized-text digest)
      2. near-dup gate    (MinHash banding over the survivors: a doc
                           whose signature agrees >= 0.5 with any
                           LOWER-id doc drops — first occurrence wins;
                           hot buckets capped at 1000)
      3. quality gate     (composite score >= 0.5, computed in the same
                           projection as the token counts)
      4. temperature rebalance (alpha=0.5 language keep-rates over the
                           SURVIVING corpus — stage order matters: the
                           rates see post-filter shares)

    Output: per-language doc and token budgets of the final corpus.

    Scale: stage 1 shuffles 16-byte digests; stage 2 shuffles bucket
    digests and signature rows (never text) with the capped band join;
    stage 3 is row-local; stage 4 is a 5-row broadcast — end to end the
    full text never enters a shuffle."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import dedup as D
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import text as TX
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup_index import incremental_flags

    docs = t(spark, sf_dir, "documents")
    # Stage boundaries are persist slots: every downstream branch
    # (flags probe+candidate sides, the share/rate fan-out) re-inlines
    # its inputs — Catalyst does not share common subtrees — so without
    # them the md5-dedup and quality subtrees execute once PER BRANCH
    # (~86 scans of documents at sf1, the round-6/7 flat spot). `keep`
    # caches doc ids only (one row per distinct digest); `k3` caches
    # (doc_id, lang, n_words) survivors — both tiny next to the text.
    keep = _persist_slot(
        D.exact_dedup(docs, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        ),
        "corpus_v2.keep",
    )
    k1 = docs.join(keep, "doc_id")
    flags = incremental_flags(
        k1.select("doc_id", "text"), "doc_id", "text",
        index_sigs=None, shingle_n=3, num_hashes=8, rows_per_band=2,
        threshold=0.5, max_bucket_size=1000,
    )
    k2 = k1.join(
        flags.filter(~F.col("is_duplicate")).select("doc_id"), "doc_id"
    )
    k3 = _persist_slot(
        TX.text_stats(k2, "doc_id", "text", keep=("lang",))
        .select("doc_id", "lang", "n_words", TX.quality_expr().alias("quality"))
        .filter(F.col("quality") >= 0.5)
        .select("doc_id", "lang", "n_words"),
        "corpus_v2.k3",
    )
    # language-share → keep-rate over the ~|languages|-row aggregate:
    # global windows instead of the former agg→crossJoin(broadcast)→agg→
    # crossJoin(broadcast) chain — each crossJoin was its own broadcast
    # build (a full scheduler round); the windowed form is one tiny
    # single-partition pass over a handful of rows (r13; the sums are
    # integer-valued doubles, so aggregation order cannot perturb them)
    wall = Window.partitionBy()
    shares = k3.groupBy("lang").agg(F.sum("n_words").cast("double").alias("tl"))
    sh = shares.select(
        "lang", (F.col("tl") / F.sum("tl").over(wall)).alias("s")
    )
    rate = sh.select(
        "lang", F.pow(F.col("s") / F.min("s").over(wall), F.lit(-0.5)).alias("r")
    )
    u = stable_hash64(F.col("doc_id").cast("string"), "tsamp2").cast("double") / float(
        1 << 60
    )
    k4 = k3.join(F.broadcast(rate), "lang").filter(u < F.col("r"))
    return (
        k4.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_tokens"),
        )
        .orderBy("lang")
    )


# -- round 6: epoch shuffling + quantile quality gating --------------------


@register(
    "epoch_shuffle_shards",
    sql=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             {stable_hash64_sql("CAST(doc_id AS VARCHAR)", "epoch1")} AS hk
      FROM documents
    ),
    sharded AS (SELECT doc_id, n_chars, hk % 8 AS shard FROM h)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM sharded GROUP BY shard ORDER BY shard
    """,
)
def epoch_shuffle_shards(spark, sf_dir):
    """Deterministic epoch shuffle: hash every doc with an epoch seed and
    shard on the hash — the standard way to give each training epoch an
    independent, REPRODUCIBLE permutation without a global sort (the
    hash IS the shuffle; changing the seed string reshuffles). One
    shuffle on the shard key; per-shard stats verify balance. At 100 TB
    this is how you materialize epoch shards: write partitioned by
    `shard`, readers stream shards in order."""
    docs = t(spark, sf_dir, "documents")
    sharded = docs.select(
        "doc_id",
        "n_chars",
        (stable_hash64(F.col("doc_id").cast("string"), "epoch1") % 8).alias("shard"),
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


@register(
    "quality_quantile_gate",
    sql="""
    WITH scored AS (
      SELECT doc_id, lang,
             least(1.0, CAST(length(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 200.0) AS score
      FROM documents
    ),
    thr AS (
      SELECT lang, quantile_cont(score, 0.25) AS threshold
      FROM scored GROUP BY lang
    )
    SELECT s.lang,
           CAST(count(*) AS BIGINT) AS total,
           CAST(sum(CASE WHEN s.score > t.threshold THEN 1 ELSE 0 END)::BIGINT
                AS BIGINT) AS kept,
           round(t.threshold, 6) AS threshold
    FROM scored s JOIN thr t ON s.lang = t.lang
    GROUP BY s.lang, t.threshold ORDER BY s.lang
    """,
)
def quality_quantile_gate(spark, sf_dir):
    """Per-language adaptive quality gate: keep documents above their
    language's 25th-percentile length score — per-group quantile
    thresholds are how corpus recipes avoid one language's distribution
    starving another's. Spark `percentile` and DuckDB `quantile_cont`
    share linear interpolation, so the threshold is engine-identical.
    Two shuffles (score+quantile per lang, then the gated count); the
    quantile is exact here — at 100 TB swap in approx_percentile with
    the same downstream algebra."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.least(
            F.lit(1.0),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double") / 200.0,
        ).alias("score"),
    )
    thr = scored.groupBy("lang").agg(
        F.percentile(F.col("score"), F.lit(0.25)).alias("threshold")
    )
    return (
        scored.join(thr, "lang")
        .groupBy("lang", "threshold")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(
                F.when(F.col("score") > F.col("threshold"), 1).otherwise(0)
            ).cast("long").alias("kept"),
        )
        .select("lang", "total", "kept", F.round("threshold", 6).alias("threshold"))
        .orderBy("lang")
    )


_H_ARES = stable_hash64_sql("CAST(doc_id AS VARCHAR)", "ares")


@register(
    "weighted_sample_ares",
    sql=f"""
    SELECT lang, doc_id, n_chars, rk FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ln((CAST({_H_ARES} AS DOUBLE) + 1) / {float(1 << 60)!r})
                        / n_chars DESC,
                        doc_id) AS rk
      FROM documents) x
    WHERE rk <= 10 ORDER BY lang, rk
    """,
)
def weighted_sample_ares(spark, sf_dir):
    """Weighted sampling without replacement by the A-Res reservoir key
    (Efraimidis-Spirtsov): per language, the 10 documents with the
    largest ln(u)/w where u is a hash-derived uniform and w = n_chars —
    equivalent to ranking by u^(1/w), so inclusion probability is
    proportional to weight. THE distributed weighted-subsample
    primitive for corpus building (sample long documents preferentially
    without a pass to normalize weights): keys are a pure per-row
    function of doc_id + salt (no RNG state, reproducible across runs,
    engines, and retries), and top-k per stratum is rank-and-filter.

    Scale: one projection computes every key map-side; the only shuffle
    is the per-lang top-k window — no global sort, no weight-sum
    broadcast, no rejection loop."""
    docs = t(spark, sf_dir, "documents")
    u = (
        stable_hash64(F.col("doc_id").cast("string"), "ares").cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(key.desc(), "doc_id")
    return (
        docs.select(
            "lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= 10)
        .orderBy("lang", "rk")
    )


# -- round 8: rank-uniform feature transform ---------------------------------


@register(
    "rank_uniform_features",
    sql="""
    SELECT doc_id, source,
           round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
             AS pr_group,
           round(percent_rank() OVER (ORDER BY n_chars), 6) AS pr_global,
           round(round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
                 - round(percent_rank() OVER (ORDER BY n_chars), 6), 6) AS pr_shift
    FROM documents ORDER BY doc_id
    """,
)
def rank_uniform_features(spark, sf_dir):
    """Rank-uniform feature transform (the quantile-normalization /
    rank-gauss prep step): each document's length mapped to [0, 1] by
    competition-rank percentile, BOTH within its source and globally;
    ``pr_shift`` is the group-vs-global quantile displacement — the
    feature that tells a mixture model "long for its source, short for
    the corpus". Ties share a rank in both engines (percent_rank), so
    no tie-breaker is needed for determinism.

    Scale: the per-source leg shuffles once on source; the GLOBAL leg
    never runs a single-partition window — it routes through
    operators/skew.py distributed_rank (quantile-bucketed exact rank),
    with n folded in as a driver scalar."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    n = docs.count()
    ranked = distributed_rank(docs, "n_chars", out="_gr", buckets=32)
    wg = W.partitionBy("source").orderBy("n_chars")
    pr_group = F.round(F.percent_rank().over(wg), 6)
    pr_global = F.round((F.col("_gr") - 1) / F.lit(float(n - 1)), 6)
    return (
        ranked.select(
            "doc_id",
            "source",
            pr_group.alias("pr_group"),
            pr_global.alias("pr_global"),
        )
        .withColumn("pr_shift", F.round(F.col("pr_group") - F.col("pr_global"), 6))
        .orderBy("doc_id")
    )


@register(
    "target_encode_loo",
    sql="""
    WITH g AS (
      SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS gmean
      FROM events
    ),
    u AS (
      SELECT user_id,
             sum(CAST(value AS DECIMAL(18,2))) AS usum,
             CAST(count(*) AS BIGINT) AS ucnt
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round((CAST(u.usum - CAST(e.value AS DECIMAL(18,2)) AS DOUBLE)
                  + 10.0 * g.gmean)
                 / (u.ucnt - 1 + 10.0), 6) AS loo_enc
    FROM events e JOIN u USING (user_id) CROSS JOIN g
    WHERE e.event_id % 7 = 0
    ORDER BY e.event_id
    """,
)
def target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding with additive smoothing — the
    leakage-aware categorical encoder (each row's encoding excludes its
    OWN target, so the feature never memorizes the label it will be
    trained against): enc = (cat_sum - own + m*global_prior) /
    (cat_count - 1 + m) with m = 10. Per-category sums are exact
    decimals; the one division runs on identical doubles. Every 7th
    event is emitted as the (deterministic) evaluation sample.

    Scale: one aggregation on the category key + one broadcast-ready
    join back — NO per-row window (the window formulation shuffles and
    sorts every row; the sum-then-subtract identity is the map-side
    form). The global prior is a 1-row broadcast."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dec = F.col("value").cast("decimal(18,2)")
    g = e.agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("gmean")
    )
    u = e.groupBy("user_id").agg(
        F.sum(dec).alias("usum"), F.count(F.lit(1)).alias("ucnt")
    )
    return (
        e.filter(F.col("event_id") % 7 == 0)
        .join(u, "user_id")
        .crossJoin(F.broadcast(g))
        .select(
            "event_id",
            "user_id",
            F.round(
                ((F.col("usum") - dec).cast("double") + F.lit(10.0) * F.col("gmean"))
                / (F.col("ucnt") - 1 + F.lit(10.0)),
                6,
            ).alias("loo_enc"),
        )
        .orderBy("event_id")
    )


def _negsample_sql() -> str:
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64_sql

    h = stable_hash64_sql(
        "concat(CAST(anchor_id AS VARCHAR), '_', CAST(j AS VARCHAR))", seed="neg"
    )
    return f"""
    WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
    anchors AS (
      SELECT doc_id AS anchor_id, md5(text) AS ah FROM documents
      WHERE doc_id % 50 = 0
    ),
    cand AS (
      SELECT anchor_id, ah, j, {h} % (SELECT n FROM n) AS neg_id
      FROM anchors, range(0, 4) t(j)
    )
    SELECT c.anchor_id, CAST(c.j AS BIGINT) AS j, c.neg_id
    FROM cand c JOIN documents d ON d.doc_id = c.neg_id
    WHERE c.neg_id <> c.anchor_id AND md5(d.text) <> c.ah
    ORDER BY anchor_id, j
    """


@register("negative_sampling_contrastive", sql=_negsample_sql())
def negative_sampling_contrastive(spark, sf_dir):
    """Filtered negative sampling for contrastive training pairs: each
    anchor document draws k=4 candidate negatives from a DETERMINISTIC
    hash of (anchor, draw index) over the id space, then candidates that
    are the anchor itself or share its exact content hash (an undetected
    duplicate — a FALSE negative that teaches the model to push apart
    identical texts) are filtered rather than re-drawn — the standard
    rejection-free formulation whose kept-count the training loop
    weights by. Both engines draw the identical candidates, so the
    emitted (anchor, j, negative) triples are value-hash-pinned.

    Scale: draws are a row-local explode on the anchor sample; the one
    join is candidates -> documents on the drawn id (at 100 TB, through
    the record-level index); no shuffle of the corpus itself."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg((F.max("doc_id") + 1).alias("n"))
    anchors = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.col("doc_id").alias("anchor_id"), F.md5("text").alias("ah"))
    )
    cand = (
        anchors.crossJoin(F.broadcast(n))
        .select(
            "anchor_id", "ah",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
            F.col("n"),
        )
        .select(
            "anchor_id", "ah", "j",
            (
                stable_hash64(
                    F.concat(
                        F.col("anchor_id").cast("string"),
                        F.lit("_"),
                        F.col("j").cast("string"),
                    ),
                    seed="neg",
                )
                % F.col("n")
            ).alias("neg_id"),
        )
    )
    d = docs.select(F.col("doc_id").alias("neg_id"), F.md5("text").alias("nh"))
    return (
        cand.join(d, "neg_id")
        .filter((F.col("neg_id") != F.col("anchor_id")) & (F.col("nh") != F.col("ah")))
        .select("anchor_id", F.col("j").cast("long").alias("j"), "neg_id")
        .orderBy("anchor_id", "j")
    )


@register(
    "context_pack_nextfit",
    sql=r"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             CAST(doc_id % 32 AS INT) AS bucket,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(row_number() OVER (PARTITION BY doc_id % 32
                                     ORDER BY doc_id) AS BIGINT) AS rn
      FROM documents
    ),
    pack AS (
      SELECT doc_id, bucket, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin_idx, n_tokens AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.doc_id, d.bucket, d.n_tokens, d.rn,
             CASE WHEN p.fill + d.n_tokens > 256
                  THEN p.bin_idx + 1 ELSE p.bin_idx END AS bin_idx,
             CASE WHEN p.fill + d.n_tokens > 256
                  THEN d.n_tokens ELSE p.fill + d.n_tokens END AS fill
      FROM pack p JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1
    )
    SELECT doc_id, bucket, n_tokens, bin_idx FROM pack ORDER BY doc_id
    """,
)
def context_pack_nextfit(spark, sf_dir):
    """Capacity-RESPECTING next-fit sequence packing (context-window
    assembly for LLM training): within each distribution bucket, docs in
    doc_id order fill 256-token bins; a doc that would overflow the
    current bin CLOSES it and opens the next, so no bin ever exceeds
    capacity (an oversized doc gets a bin of its own). This is the
    packing class `token_shard_packing` is NOT — the prefix-sum variant
    assigns by where a doc STARTS and lets shards overflow; training
    sequence packing needs the hard cap.

    Scale: packing is inherently sequential, so the parallel unit is the
    bucket — `doc_id % 32` here, thousands of hash shards at 100 TB —
    and each bucket packs independently inside ONE Arrow-batched
    grouped-map task (applyInPandas); the only shuffle is the groupBy on
    the bucket key. The oracle replays the identical scan as a per-bucket
    recursive CTE. Integer token counts — exact cross-engine parity."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 32).cast("int").alias("bucket"),
        X.token_count_whitespace("text").alias("n_tokens"),
    )
    cap = 256

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, b = [], None, 0
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if fill is None:
                fill = tok
            elif fill + tok > cap:
                b += 1
                fill = tok
            else:
                fill += tok
            bins.append(b)
        pdf["bin_idx"] = bins
        return pdf[["doc_id", "bucket", "n_tokens", "bin_idx"]]

    return (
        docs.groupBy("bucket")
        .applyInPandas(pack, "doc_id bigint, bucket int, n_tokens bigint, bin_idx bigint")
        .orderBy("doc_id")
    )
