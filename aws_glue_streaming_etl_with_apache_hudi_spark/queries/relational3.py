"""Third-wave surface: skew-safe salted aggregation (oracle = plain GROUP
BY — physical rewrite, identical result), null semantics (null-safe
equality, NULLS FIRST/LAST), second string-function family, posexplode
with position."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import salted_aggregate
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t


@register(
    "agg_salted_skew",
    sql="""
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Salted two-phase aggregation over the low-cardinality (=maximally
    skew-prone) event_type key. The oracle is the PLAIN group-by: salting
    must be a physical-only rewrite. Scale: any hot key's reducer load is
    capped at 1/num_salts."""
    e = t(spark, sf_dir, "events")
    return salted_aggregate(
        e,
        ["event_type"],
        lambda: [
            F.count("*").alias("_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"),
        ],
        lambda: [
            F.sum("_n").cast("long").alias("n"),
            F.round(F.sum("_s").cast("double"), 2).alias("total"),
        ],
    ).orderBy("event_type")


@register(
    "null_semantics",
    sql="""
    WITH t1 AS (
      SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
      FROM orders
    )
    SELECT a.o_orderkey AS k_a, b.o_orderkey AS k_b
    FROM t1 a JOIN t1 b
      ON a.st IS NOT DISTINCT FROM b.st
     AND a.o_orderkey + 1 = b.o_orderkey
    ORDER BY k_a
    """,
)
def null_semantics(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL matches
    NULL — the semantics regular equi-joins silently drop."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st")
    )
    a = o.select(F.col("o_orderkey").alias("k_a"), F.col("st").alias("st_a"))
    b = o.select(F.col("o_orderkey").alias("k_b"), F.col("st").alias("st_b"))
    return (
        a.join(b, F.col("st_a").eqNullSafe(F.col("st_b")) & (F.col("k_a") + 1 == F.col("k_b")))
        .select("k_a", "k_b")
        .orderBy("k_a")
    )


@register(
    "sort_nulls_ordering",
    sql="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
    FROM orders
    ORDER BY st DESC NULLS LAST, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_ordering(spark, sf_dir):
    """Explicit NULLS LAST ordering with a deterministic tie-break."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st"))
        .orderBy(F.desc_nulls_last("st"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "scalar_string_funcs2",
    sql="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*')        AS padded,
           reverse(p_name)               AS rev,
           left(p_type, 5)               AS type_head,
           right(p_type, 3)              AS type_tail,
           repeat(substring(p_brand, 1, 2), 2) AS rep,
           translate(p_brand, '#', '-')  AS brand_dash,
           CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos,
           split_part(p_type, ' ', 1)    AS first_word
    FROM part ORDER BY p_partkey
    """,
)
def scalar_string_funcs2(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.reverse("p_name").alias("rev"),
        F.substring("p_type", 1, 5).alias("type_head"),
        F.col("p_type").substr(F.length("p_type") - 2, F.lit(3)).alias("type_tail"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("rep"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.instr("p_name", "a").alias("a_pos"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("first_word"),
    ).orderBy("p_partkey")


@register(
    "posexplode_with_position",
    sql="""
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
           round(CAST(unnest(embedding) AS DOUBLE), 6) AS x
    FROM embeddings
    WHERE vec_id < 10
    ORDER BY vec_id, pos
    """,
)
def posexplode_with_position(spark, sf_dir):
    """posexplode: element + 0-based position (DuckDB: unnest +
    generate_subscripts)."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return (
        emb.select("vec_id", F.posexplode(F.col("embedding")).alias("pos", "xf"))
        .select("vec_id", "pos", F.round(F.col("xf").cast("double"), 6).alias("x"))
        .orderBy("vec_id", "pos")
    )


@register(
    "map_json_ops",
    sql="""
    SELECT event_id,
           array_to_string(json_keys(props::JSON), ',') AS keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(len(json_keys(props::JSON)) + 1 AS BIGINT) AS n_after_concat,
           '{"id":' || event_id || ',"vals":[' ||
             array_to_string([CAST(json_extract(props, '$.' || kk) AS BIGINT)
                              FOR kk IN json_keys(props::JSON)], ',') || ']}'
             AS as_json
    FROM events ORDER BY event_id
    """,
)
def map_json_ops(spark, sf_dir):
    """MapType surface: parse the JSON props payload into map<string,long>,
    then map_keys/map_values/element_at/map_concat. Oracle-checked:
    ``from_json`` maps preserve JSON document key order (as does DuckDB's
    ``json_keys``), so map rendering, element lookup, concat size, and
    the ``to_json`` re-serialization are all value-comparable — the
    oracle rebuilds Spark's compact JSON rendering byte-for-byte."""
    from pyspark.sql import types as T

    e = t(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        e.select(
            "event_id",
            m.alias("m"),
        )
        .select(
            "event_id",
            F.array_join(F.map_keys("m"), ",").alias("keys"),
            F.element_at("m", "k").alias("k_value"),
            F.size(
                F.map_concat(
                    "m", F.create_map(F.lit("extra"), F.lit(1).cast("long"))
                )
            )
            .cast("long")
            .alias("n_after_concat"),
            F.to_json(F.struct(F.col("event_id").alias("id"), F.map_values("m").alias("vals"))).alias("as_json"),
        )
        .orderBy("event_id")
    )


@register(
    "applyinpandas_group_rank",
    sql="""
    SELECT p_brand, p_partkey,
           row_number() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS price_rank
    FROM part ORDER BY p_brand, price_rank
    """,
)
def applyinpandas_group_rank(spark, sf_dir):
    """Grouped-map pandas operator (applyInPandas): per-brand ranking
    computed IN PYTHON per group, verified against the window-function
    oracle — the pattern for per-group logic Spark expressions can't
    express (model scoring, curve fitting, per-entity state machines).
    Scale: one shuffle on the group key; each group's pandas frame must
    fit an executor's memory (brands are small; re-block huge groups)."""
    import pandas as pd

    p = t(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_retailprice")

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["p_retailprice", "p_partkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["price_rank"] = pdf.index + 1
        return pdf[["p_brand", "p_partkey", "price_rank"]]

    return (
        p.groupBy("p_brand")
        .applyInPandas(rank_group, schema="p_brand string, p_partkey long, price_rank long")
        .orderBy("p_brand", "price_rank")
    )


@register(
    "join_salted_skew",
    sql="""
    SELECT c.c_mktsegment, count(*) AS n,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def join_salted_skew(spark, sf_dir):
    """Replicate-and-salt skew join (operators/skew.py salted_join): the
    events fact (15 distinct user_ids at fixture scale = maximal key
    heat) joins the customer dim on a salted composite key, spreading
    each hot user across num_salts reducers. The oracle is the PLAIN
    join — salting must be a physical-only rewrite, invisible in the
    result. The manual fallback for when AQE skew splitting can't apply
    (bucketed exchanges, deterministic-plan requirements)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import salted_join

    e = t(spark, sf_dir, "events").select("user_id", "value")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, ["user_id"], num_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total"),
        )
        .orderBy("c_mktsegment")
    )


def _profile_oracle_sql() -> str:
    """UNION-ALL-per-column DuckDB replica of table_profile's one-pass
    aggregate (the oracle restates the semantics; the Spark plan still
    computes every column in a single scan)."""
    plain = "CAST(min({c}) AS VARCHAR)", "CAST(max({c}) AS VARCHAR)"
    money = (
        "CAST(CAST(round(min({c}), 2) AS DECIMAL(18,2)) AS VARCHAR)",
        "CAST(CAST(round(max({c}), 2) AS DECIMAL(18,2)) AS VARCHAR)",
    )
    ts = (
        "strftime(min({c}), '%Y-%m-%d %H:%M:%S')",
        "strftime(max({c}), '%Y-%m-%d %H:%M:%S')",
    )
    kinds = {
        "o_orderkey": plain,
        "o_custkey": plain,
        "o_orderstatus": plain,
        "o_orderpriority": plain,
        "o_orderdate": ts,
        "o_totalprice": money,
    }
    branches = []
    for c in sorted(kinds):
        mn, mx = kinds[c]
        branches.append(
            f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{mn.format(c=c)} AS min_value, {mx.format(c=c)} AS max_value "
            f"FROM orders"
        )
    return " UNION ALL ".join(branches) + " ORDER BY col_name"


@register("table_profile", sql=_profile_oracle_sql())
def table_profile(spark, sf_dir):
    """Catalog-statistics profile (operators/profile.py profile_columns):
    null/distinct/min/max for every orders column, computed in ONE scan
    (single aggregate, map-side partials) — the ANALYZE TABLE pass that
    feeds CBO and data-quality checks, exposed as a query."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.profile import profile_columns

    o = t(spark, sf_dir, "orders")
    return profile_columns(
        o,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_orderdate",
            "o_totalprice",
        ],
        formatters={
            "o_totalprice": lambda c: F.round(c, 2).cast("decimal(18,2)").cast("string"),
            "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
        },
    ).orderBy("col_name")


@register(
    "range_join_binned",
    sql="""
    SELECT p.event_id AS p_event_id, count(c.event_id) AS n_clicks
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'click') c
      ON c.ts >= p.ts AND c.ts < p.ts + INTERVAL 6 HOUR
    GROUP BY p.event_id ORDER BY p.event_id
    """,
)
def range_join_binned(spark, sf_dir):
    """PURE range join (no equi key): clicks attributed to every purchase
    whose 6-hour window contains them. Spark would execute the raw theta
    predicate as a BroadcastNestedLoopJoin — O(n*m) comparisons — so the
    operator (operators/rangejoin.py) bins time at the window width,
    explodes each interval to its <=2 covered bins, equi-joins on the
    bin id and applies the exact bounds as a residual filter. The oracle
    IS the naive theta join: binning must be a physical-only rewrite.

    Scale: shuffle keys are bin ids; the comparison count is the true
    candidate count, not n*m; unmatched purchases reattach by id (left
    semantics without an outer theta join)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rangejoin import binned_range_join

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("p_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), F.col("ts").alias("c_ts")
    )
    joined = binned_range_join(
        purchases,
        clicks,
        start_col="p_ts",
        end_col="p_end",
        point_col="c_ts",
        bin_width_seconds=6 * 3600,
        how="left",
        interval_id=["p_event_id"],
    )
    return (
        joined.groupBy("p_event_id")
        .agg(F.count("c_event_id").alias("n_clicks"))
        .orderBy("p_event_id")
    )


@register(
    "dq_expectations_orders",
    sql="""
    WITH r AS (
      SELECT 'accepted_values(o_orderpriority)' AS check_name,
             CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                            AND o_orderpriority NOT IN
                            ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'in_range(o_totalprice, 0.0, 100000.0)',
             CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                            AND (o_totalprice < 0.0 OR o_totalprice > 100000.0)
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'not_null(o_custkey)',
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'not_null(o_orderkey)',
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'references(o_custkey)',
             CAST(count(*) AS BIGINT)
      FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON c.c_custkey = o.o_custkey
      WHERE c.c_custkey IS NULL
      UNION ALL
      SELECT 'unique(o_orderkey)',
             CAST(coalesce(sum(n - 1), 0) AS BIGINT)
      FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    )
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM r ORDER BY check_name
    """,
)
def dq_expectations_orders(spark, sf_dir):
    """Declarative data-quality gate (operators/expectations.py): six
    named checks over orders — not-null keys, key uniqueness, price
    range, priority domain, and o_custkey referential integrity against
    customer — each reported as (check, n_violations, passed). All
    single-pass aggregate checks share ONE scan (one agg with a
    conditional count per check); uniqueness is one key aggregation;
    the FK check one anti-join. This is the table-level promotion gate
    (dbt-test / Great-Expectations pattern) that complements the
    pipeline's row-level quarantine.

    Scale: check count does not multiply scans — adding an aggregate
    expectation adds one expression to the shared agg, not a pass."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import expectations as E

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    report = E.run_expectations(
        o,
        [
            E.not_null("o_orderkey"),
            E.not_null("o_custkey"),
            E.unique("o_orderkey"),
            E.in_range("o_totalprice", 0.0, 100000.0),
            E.accepted_values(
                "o_orderpriority",
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            ),
            E.references(["o_custkey"], c, ["c_custkey"]),
        ],
    )
    # 'check' is reserved in DuckDB; align the report column name
    return report.withColumnRenamed("check", "check_name").orderBy("check_name")


_LATERAL_SQL = """
    SELECT n.n_name, top.c_name, top.c_acctbal
    FROM nation n
    JOIN LATERAL (
      SELECT c_name, round(c_acctbal, 2) AS c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c.c_acctbal DESC, c.c_custkey
      LIMIT 2
    ) AS top ON true
    ORDER BY n.n_name, top.c_acctbal DESC, top.c_name
"""


@register("join_lateral_topk", sql=_LATERAL_SQL)
def join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery in FROM — per-nation top-2 customers
    by balance, written as the SQL-standard lateral join (the same
    string runs on Catalyst and DuckDB; Catalyst decorrelates it to a
    ranked window under the hood). The set-returning-per-row shape
    window functions can't express directly in older dialects, and the
    third member of the SQL-API parity family (subquery_in,
    sql_api_shared_dialect).

    Scale: Catalyst rewrites the correlated limit to a partitioned
    rank-filter — one shuffle on the correlation key, per-group heaps,
    never nation x customer nested loops."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


@register(
    "applyinpandas_user_trend",
    sql="""
    WITH m AS (
      SELECT user_id,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                           AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(round(value * 100) AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                           AS HUGEINT)
                      * CAST(round(value * 100) AS HUGEINT)) AS HUGEINT) AS sxy,
             CAST(sum(CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                           AS HUGEINT)
                      * CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                             AS HUGEINT)) AS HUGEINT) AS sx2
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sx2 - sx * sx AS DOUBLE), 8) AS slope_cents_per_s,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sx2 - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept_cents
    FROM m ORDER BY user_id
    """,
)
def applyinpandas_user_trend(spark, sf_dir):
    """Grouped-map pandas operator doing REAL numeric work: per-user OLS
    trend of event value over time, fit IN PYTHON per group — the
    model-fitting shape (curve fits, per-entity scoring) that grouped
    expressions can't express. Cross-engine exactness without a
    tolerance: the kernel accumulates integer moments (seconds since a
    fixed base, value in cents) in arbitrary-precision Python ints; the
    oracle accumulates the same moments in HUGEINT; both convert the
    identical exact integers to doubles once, so the closed-form slope/
    intercept are bit-identical before rounding (the
    regression_price_quantity discipline, applied to the UDF surface).

    Scale: one shuffle on user_id; each group streams through one Arrow
    batch; the moment loop is O(rows) per group with no materialized
    design matrix."""
    import numpy as np
    import pandas as pd

    base_s = 1704067200  # 2024-01-01 00:00:00 UTC, fixed epoch base

    e = t(spark, sf_dir, "events").select("user_id", "ts", "value")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x64 = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
            - base_s
        ).to_numpy()
        y64 = pdf["value"].mul(100).round().astype("int64").to_numpy()
        # exact: numpy int64 partial sums fit (|x| < 4e6, |y| < 1e6,
        # group rows < 1e5); the cross products n*sxy etc. can exceed
        # int64, so they use Python ints (arbitrary precision)
        n = int(len(x64))
        sx = int(x64.sum())
        sy = int(y64.sum())
        sxy = int((x64 * y64).sum())
        sx2 = int((x64 * x64).sum())
        num, den = n * sxy - sx * sy, n * sx2 - sx * sx
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n],
                "slope_cents_per_s": [round(slope, 8)],
                "intercept_cents": [round(intercept, 6)],
            }
        )

    return (
        e.groupBy("user_id")
        .applyInPandas(
            fit,
            schema="user_id bigint, n_events bigint, "
            "slope_cents_per_s double, intercept_cents double",
        )
        .orderBy("user_id")
    )


_GROUP_BY_ALL_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
"""


@register("group_by_all_dialect", sql=_GROUP_BY_ALL_SQL)
def group_by_all_dialect(spark, sf_dir):
    """``GROUP BY ALL`` — the modern-dialect shorthand (every
    non-aggregate select item becomes a grouping key), supported by both
    Catalyst and DuckDB with identical resolution rules; the same string
    runs on both engines (fourth member of the SQL-API parity family).
    Exact decimal total per the money discipline."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUP_BY_ALL_SQL)


_GEN_ROWS, _GEN_SEED = 5000, "oracle"


def _gen_h_sql(field: str) -> str:
    return (
        f"CAST(concat('0x', substring(md5(concat('{_GEN_SEED}|', i, '|{field}')), 1, 15)) "
        f"AS BIGINT)"
    )


@register(
    "generator_source_rollup",
    sql=f"""
    WITH g AS (
      SELECT i,
             (['view', 'click', 'purchase', 'refund', 'login'])
               [{_gen_h_sql('type')} % 5 + 1] AS event_type,
             round(({_gen_h_sql('value')} % 100000) / 100.0, 2) AS value,
             {_gen_h_sql('user')} % 100 AS user_id
      FROM range(0, {_GEN_ROWS}) t(i)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def generator_source_rollup(spark, sf_dir):
    """The custom Python DataSource (sources/pydatasource.py) under a
    FULL oracle with no stored fixture at all: the generator's fields
    are md5(seed, row-index) arithmetic, so DuckDB re-derives the entire
    dataset from ``range(0, N)`` and the rollup must match cell for
    cell — the strongest possible check that a source is deterministic
    and engine-portable (the same property that makes its task retries
    and checkpoint replays exactly-once). ``sf_dir`` is unused: the
    source IS the data.

    Scale: N rows generate across numPartitions independent splits with
    zero coordination; the rollup is one map-side-combined aggregation."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.sources import pydatasource

    pydatasource.register(spark)
    g = (
        spark.read.format("graft_events")
        .option("rows", _GEN_ROWS)
        .option("seed", _GEN_SEED)
        .option("numUsers", 100)
        .load()
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_grouping_id",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_id(spark, sf_dir):
    """GROUPING SETS with the grouping-id discriminator: GROUPING()
    bits distinguish a real NULL group value from a rollup superset row
    — the standard way BI layers consume multi-level aggregates. The
    IDENTICAL SQL string runs on Catalyst and DuckDB (grouping sets are
    a SQL-level construct in Spark — no DataFrame builder), making this
    both the discriminator-column oracle and another SQL-API parity
    member."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS gid,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "window_rank_distributions",
    sql="""
    SELECT o_orderstatus, o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderstatus, o_orderkey
    """,
)
def window_rank_distributions(spark, sf_dir):
    """Rank-distribution window functions: percent_rank (rank-1)/(n-1)
    and cume_dist (#rows <= current)/n per status partition — the
    normalized-position primitives percentile dashboards sit on. The
    window order is total (price, orderkey), so both engines assign
    identical ranks; ratios of identical integers round identically.

    Scale: one shuffle on the partition key serves both functions."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
    )


@register(
    "variant_json_shred",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(count(CASE WHEN CAST(props::JSON ->> 'k' AS BIGINT) IS NULL
                           THEN 1 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def variant_json_shred(spark, sf_dir):
    """Semi-structured shredding through Spark 4's VARIANT type: the
    event payload parses once (parse_json) into the binary variant
    encoding and typed paths extract with variant_get — the open-schema
    column pattern that replaces per-query string re-parsing (DuckDB's
    JSON type plays the oracle role). Missing keys surface as typed
    NULLs, counted explicitly.

    Scale: variant parse + path extraction are row-local; at rest the
    column stores the parsed binary once, so N queries pay one parse —
    the reason lakehouses are converging on variant for event props."""
    e = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            F.max(k).cast("long").alias("max_k"),
            F.count(F.when(k.isNull(), 1)).cast("long").alias("n_missing"),
        )
        .orderBy("event_type")
    )


_FILTER_CLAUSE_SQL = """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           count(*) FILTER (WHERE o_totalprice > 50000) AS n_large,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
             AS urgent_total
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@register("agg_filter_clause", sql=_FILTER_CLAUSE_SQL)
def agg_filter_clause(spark, sf_dir):
    """The SQL-standard FILTER clause on aggregates — conditional
    aggregation without CASE-wrapping every argument; the same string
    runs on Catalyst and DuckDB (SQL-API parity family). Exact decimal
    for the filtered money sum."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_FILTER_CLAUSE_SQL)


_NOT_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    AND c_acctbal > 9000
    ORDER BY c_custkey
"""


@register("subquery_not_exists", sql=_NOT_EXISTS_SQL)
def subquery_not_exists(spark, sf_dir):
    """Correlated NOT EXISTS — the anti-join written the SQL-standard
    way (customers with no finished orders); Catalyst plans it as a
    left-anti join on the correlation key. Same string on both engines;
    completes the subquery family (IN, scalar, correlated, EXISTS
    forms)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NOT_EXISTS_SQL)


@register(
    "topk_with_ties",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM (
      SELECT o_orderkey, o_totalprice,
             rank() OVER (ORDER BY o_totalprice DESC) AS r
      FROM orders)
    WHERE r <= 10
    ORDER BY price DESC, o_orderkey
    """,
)
def topk_with_ties(spark, sf_dir):
    """Top-k WITH TIES (ANSI FETCH FIRST ... WITH TIES semantics):
    rank() instead of row_number(), so every order sharing the boundary
    price is included — the difference between "10 rows" and "the top
    10 price points' rows", which matters whenever k cuts a tie group.

    Scale: NO global window. ``rank() <= k`` keeps exactly the rows
    whose value >= the k-th largest row's value (competition rank counts
    strictly-greater rows), so the plan is a TakeOrderedAndProject
    pre-pass — ``orderBy(desc).limit(k)``, the distributed top-k where
    every partition keeps its own k and the driver merges k scalars —
    whose minimum is the tie threshold, then one map-side ``price >=
    threshold`` filter over the table. The only driver-side data is k
    price doubles; nothing single-partition-sorts."""
    o = t(spark, sf_dir, "orders")
    k = 10
    topk = o.select("o_totalprice").orderBy(F.desc("o_totalprice")).limit(k).collect()
    if not topk:
        return o.select(
            "o_orderkey", F.round("o_totalprice", 2).alias("price")
        ).limit(0)
    threshold = min(r["o_totalprice"] for r in topk)
    return (
        o.filter(F.col("o_totalprice") >= F.lit(threshold))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
    )


@register(
    "tumbling_window_offset",
    sql="""
    SELECT strftime(
             to_timestamp(
               (CAST(floor((epoch(ts) - 1800) / 3600) AS BIGINT) * 3600) + 1800),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1 ORDER BY window_start
    """,
)
def tumbling_window_offset(spark, sf_dir):
    """Tumbling windows with a NON-ZERO origin (F.window's startTime):
    1-hour windows anchored at :30 — the alignment control billing and
    SLA windows need when the contractual day does not start at
    midnight. The oracle replays the anchored bucketing as epoch
    arithmetic (floor((t - offset)/width)*width + offset).

    Scale: same pre-aggregated map-side shape as the aligned tumbling
    window; the offset is plan-constant arithmetic."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
        .orderBy("window_start")
    )


@register(
    "recursive_cte_hierarchy",
    sql="""
    WITH RECURSIVE anc(node, anc) AS (
      SELECT s_suppkey, s_suppkey FROM supplier
      UNION ALL
      SELECT a.node, a.anc // 2 FROM anc a WHERE a.anc > 1
    )
    SELECT a.anc AS node,
           CAST(count(*) AS BIGINT) AS n_subtree,
           CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS subtree_bal
    FROM anc a JOIN supplier s ON s.s_suppkey = a.node
    GROUP BY a.anc ORDER BY a.anc
    """,
)
def recursive_cte_hierarchy(spark, sf_dir):
    """Recursive CTE (Spark 4.1 WITH RECURSIVE): suppliers arranged in
    the implicit binary tree parent(s) = s DIV 2, rolled up so every
    ancestor aggregates its whole subtree (the BOM-explosion / org-chart
    shape). The recursion walks each node's ancestor PATH — O(N log N)
    rows total, no combinatorial blowup — and Spark executes each
    recursive step as a distributed self-join, checkpointing the frontier
    between steps. Balance sums are exact decimals."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("_rc_supplier")
    return spark.sql("""
      WITH RECURSIVE anc(node, anc) AS (
        SELECT s_suppkey, s_suppkey FROM _rc_supplier
        UNION ALL
        SELECT a.node, a.anc DIV 2 FROM anc a WHERE a.anc > 1
      )
      SELECT a.anc AS node,
             CAST(count(*) AS BIGINT) AS n_subtree,
             CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS subtree_bal
      FROM anc a JOIN _rc_supplier s ON s.s_suppkey = a.node
      GROUP BY a.anc ORDER BY a.anc
    """)


@register(
    "sql_udf_revenue",
    sql="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS net_revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_udf_revenue(spark, sf_dir):
    """SQL-defined scalar UDF (Spark 4 CREATE FUNCTION ... RETURN): the
    net-revenue expression lives as a named catalog function, not a
    Python UDF — Catalyst inlines its body into the plan, so it runs
    JVM-side inside codegen with zero serialization cost (the whole
    point vs F.udf). The function RETURNS DECIMAL so the engine-parity
    exact-sum discipline survives the indirection; the oracle inlines
    the identical expression."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_udf_lineitem")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION net_rev(p DOUBLE, d DOUBLE)
      RETURNS DECIMAL(18,4)
      RETURN CAST(p AS DECIMAL(18,2)) * CAST(1 - d AS DECIMAL(18,2))
    """)
    return spark.sql("""
      SELECT l_returnflag,
             CAST(sum(net_rev(l_extendedprice, l_discount)) AS DOUBLE)
               AS net_revenue
      FROM _udf_lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """)


@register(
    "collation_group_caseinsensitive",
    sql="""
    SELECT lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END)
             AS lang_ci,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1 ORDER BY lang_ci
    """,
)
def collation_group_caseinsensitive(spark, sf_dir):
    """Case-insensitive grouping via Spark 4 COLLATE UTF8_LCASE: the
    mixed-case language tags (half the rows upper-cased) collapse into
    one group per language UNDER THE COLLATION — no lower() rewrite of
    the data, the comparison semantics live in the type. This is the
    engine-level feature; the oracle expresses the same semantics with
    an explicit lower() normalization (DuckDB collations exist but
    differ in name). Output is lower-normalized so the representative
    value is engine-independent."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("_coll_docs")
    return spark.sql("""
      SELECT lower(lang_ci) AS lang_ci, count(*) AS n FROM (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                 COLLATE UTF8_LCASE AS lang_ci
        FROM _coll_docs)
      GROUP BY lang_ci ORDER BY lang_ci
    """)


@register(
    "distributed_global_rank",
    sql="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue,
           CAST(rank() OVER (ORDER BY revenue) AS BIGINT) AS rnk
    FROM cust ORDER BY o_custkey
    """,
)
def distributed_global_rank(spark, sf_dir):
    """EXACT global rank of customers by revenue computed WITHOUT a
    single-partition sort (operators/skew.py distributed_rank): approx-
    quantile boundaries split the domain into balanced buckets purely
    for LOAD — strict-comparison bucketing means equal values never
    straddle a boundary, so ties stay rank-exact regardless of sketch
    error — then each bucket ranks locally and adds the broadcast
    cumulative count of earlier buckets. The oracle is the plain global
    rank(): the distributed plan must be bit-identical to the
    single-sort semantics it replaces. This is the degradation path the
    Gini/Spearman docstrings name for their exact-rank windows at
    100 TB, implemented and verified rather than promised.

    Scale: the only global ordering work is one approx-quantile sketch
    pass (constant memory) and a bucket-count window over ~32 rows; the
    ranking sort is per-bucket, fully parallel."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank

    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("revenue")
    )
    return (
        distributed_rank(cust, "revenue", out="rnk", buckets=32)
        .select(
            "o_custkey", F.col("revenue").cast("double").alias("revenue"), "rnk"
        )
        .orderBy("o_custkey")
    )


_PIPE_ORACLE_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# the same query in Spark 4's SQL pipe syntax (SPARK-49555): each |> stage
# is a self-contained transformation in reading order — the dialect
# modern SQL is converging on (ZetaSQL/BigQuery pipe syntax)
_PIPE_SPARK_SQL = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1994-01-01'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS revenue
   GROUP BY l_returnflag
|> SELECT l_returnflag, n_items, sum_qty, revenue
|> ORDER BY l_returnflag
"""


@register("sql_pipe_syntax_pricing", sql=_PIPE_ORACLE_SQL)
def sql_pipe_syntax_pricing(spark, sf_dir):
    """SQL pipe syntax (Spark 4, SPARK-49555 — the ZetaSQL `|>` dialect):
    the filtered pricing rollup written as a top-down pipeline of
    `|> WHERE`, `|> AGGREGATE ... GROUP BY`, `|> SELECT`, `|> ORDER BY`
    stages. Catalyst parses pipe stages into the SAME logical plan the
    ANSI form produces (the oracle runs the ANSI equivalent), so this
    pins that the engine's modern-dialect surface resolves identically —
    fifth member of the SQL-API parity family. Money through exact
    decimal sums per the shared discipline."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_SPARK_SQL)


# -- round 8: data-quality audit + parameterized SQL -------------------------


@register(
    "dq_referential_orphans",
    sql="""
    SELECT 'lineitem->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    ORDER BY fk
    """,
)
def dq_referential_orphans(spark, sf_dir):
    """Referential-integrity audit — the foreign-key leg of the DQ suite
    (dq_expectations_orders covers ranges/nulls): orphan counts for the
    fact->dim edges a warehouse load contract pins. Anti-joins, never
    row-level EXCEPT: at 100 TB each check is one broadcast (dim key
    side) or key-shuffle anti-join plus a count — and a zero here is
    what lets every downstream query use INNER joins safely."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    p = t(spark, sf_dir, "part")

    def leg(name, fact, dim_keys, on):
        orphans = fact.join(F.broadcast(dim_keys), on, "left_anti")
        return (
            orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .crossJoin(
                F.broadcast(
                    fact.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
                )
            )
            .select(F.lit(name).alias("fk"), "n_orphans", "n_rows")
        )

    return (
        leg("lineitem->orders", li,
            o.select(F.col("o_orderkey").alias("l_orderkey")), ["l_orderkey"])
        .unionByName(
            leg("orders->customer", o,
                c.select(F.col("c_custkey").alias("o_custkey")), ["o_custkey"])
        )
        .unionByName(
            leg("lineitem->part", li,
                p.select(F.col("p_partkey").alias("l_partkey")), ["l_partkey"])
        )
        .orderBy("fk")
    )


_PARAM_SQL = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM {lineitem}
    WHERE l_shipdate >= :start_ts AND l_quantity < :max_qty
    GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register(
    "sql_named_parameters",
    sql="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00' AND l_quantity < 30
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_named_parameters(spark, sf_dir):
    """Spark 4 parameterized SQL: named ``:param`` markers bound through
    ``spark.sql(args=...)`` and a DataFrame passed positionally via the
    ``{table}`` template syntax — no temp-view registration, no string
    interpolation (the injection-safe API surface apps should be on).
    The oracle inlines the same literals; identical results pin that
    parameter binding does not alter semantics. Money through exact
    decimal sums per the shared discipline."""
    import datetime

    li = t(spark, sf_dir, "lineitem")
    return spark.sql(
        _PARAM_SQL,
        args={
            "start_ts": datetime.datetime(1998, 6, 1),
            "max_qty": 30,
        },
        lineitem=li,
    )


# -- round 8: Python UDTF + listagg dialect ----------------------------------


@register(
    "udtf_sentence_split",
    sql="""
    WITH s AS (
      SELECT doc_id, unnest(string_split(text, '. ')) AS sent,
             generate_subscripts(string_split(text, '. '), 1) AS sent_idx
      FROM documents
    )
    SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
           CAST(length(sent) AS BIGINT) AS sent_chars
    FROM s WHERE length(sent) > 0
    ORDER BY doc_id, sent_idx
    """,
)
def udtf_sentence_split(spark, sf_dir):
    """Python user-defined TABLE function (Spark 3.5+ ``@udtf``) driven
    through the SQL LATERAL correlate — the row-expanding UDF shape
    (one document in, N sentence rows out) that ``explode`` cannot
    express when the expansion logic is imperative. The UDTF splits on
    the literal '. ' boundary and emits (index, char length) per
    sentence; the oracle replays the identical split relationally.
    Arrow-batched by the engine; the LATERAL join stays row-local (no
    shuffle introduced by the expansion)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sent_chars bigint")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, sent in enumerate(text.split(". ")):
                if sent:
                    yield i + 1, len(sent)

    spark.udtf.register("sentence_split", SentenceSplit)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sent_chars
        FROM documents d, LATERAL sentence_split(d.text) s
        ORDER BY d.doc_id, s.sent_idx
        """
    )


@register(
    "sql_listagg_dialect",
    sql="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
             AS statuses,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_listagg_dialect(spark, sf_dir):
    """SQL:2023 ``LISTAGG (DISTINCT ... ) WITHIN GROUP (ORDER BY ...)``
    (new in Spark 4) pinned against DuckDB's ordered ``string_agg`` —
    sixth member of the SQL-API parity family. The explicit WITHIN
    GROUP order is what makes the concatenation deterministic
    cross-engine."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               listagg(DISTINCT l_linestatus, ',')
                 WITHIN GROUP (ORDER BY l_linestatus) AS statuses,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "observe_pipeline_metrics",
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_english
    FROM documents
    """,
)
def observe_pipeline_metrics(spark, sf_dir):
    """``DataFrame.observe`` / ``Observation`` (the production way to
    collect pipeline health metrics WITHOUT a second scan; DISTINCT
    aggregates are rejected by the API, so the language metric is a
    conditional count — the metric
    expressions piggyback on the main action as accumulators): one pass
    over documents yields the observability row a monitoring hook would
    export. The oracle recomputes the same aggregates relationally, so
    the driver pins that observed metrics equal first-class aggregation
    results — the property monitoring depends on."""
    from pyspark.sql import Observation

    docs = t(spark, sf_dir, "documents")
    obs = Observation("corpus_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_english"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the main action
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_docs"]), int(m["total_chars"]), int(m["n_english"]))],
        "n_docs long, total_chars long, n_english long",
    )


@register(
    "applyinarrow_group_profile",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS mean_value,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(max(event_id) AS BIGINT) AS last_event
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def applyinarrow_group_profile(spark, sf_dir):
    """Arrow-NATIVE grouped map (Spark 4 ``applyInArrow`` — the sibling
    of applyInPandas that hands the UDF a ``pyarrow.Table`` directly, no
    pandas conversion): per-group profile computed with pyarrow compute
    kernels. The mean is an exact decimal sum divided once (value is
    2-dp fixed point rendered through Arrow's decimal128), so both
    engines round identical doubles. Pins the THIRD Python-UDF transport
    (row UDF excluded by policy, pandas UDF, Arrow UDF) to relational
    semantics.

    Scale: one shuffle on the group key; Arrow batches never convert to
    pandas — the cheapest Python-side grouped map Spark offers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def profile(table: pa.Table) -> pa.Table:
        et = table.column("event_type")[0].as_py()
        n = table.num_rows
        dec = pc.cast(
            pc.round(table.column("value"), ndigits=2),
            pa.decimal128(18, 2),
        )
        total = pc.sum(dec).as_py()  # exact Decimal
        mean = round(float(total) / n, 6)
        ids = table.column("event_id")
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n": pa.array([n], pa.int64()),
                "mean_value": pa.array([mean], pa.float64()),
                "first_event": pa.array([pc.min(ids).as_py()], pa.int64()),
                "last_event": pa.array([pc.max(ids).as_py()], pa.int64()),
            }
        )

    e = t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return (
        e.groupBy("event_type")
        .applyInArrow(
            profile,
            schema="event_type string, n long, mean_value double, "
                   "first_event long, last_event long",
        )
        .orderBy("event_type")
    )


# -- round 9: Spark 4 native XML source --------------------------------------


@register(
    "xml_source_roundtrip",
    sql="""
    SELECT n.n_regionkey,
           CAST(count(*) AS BIGINT) AS n_nations,
           min(n.n_name) AS first_nation,
           CAST(sum(length(n.n_name)) AS BIGINT) AS name_chars
    FROM nation n
    GROUP BY n.n_regionkey ORDER BY n.n_regionkey
    """,
)
def xml_source_roundtrip(spark, sf_dir):
    """Spark 4's NATIVE XML source (spark.read.format('xml'), the
    spark-xml package folded into core — SPARK-44265): the nation dim
    is round-tripped through an on-disk XML document (one <nation>
    element per row, written once per fixture and cached) and the read
    side aggregates it. The oracle computes the identical result from
    the original parquet, so the hash pins the full write->parse->
    infer->aggregate XML path, including type recovery (XML infers
    longs/strings; explicit casts normalize). Completes the source-
    format family next to parquet/JSON/CSV/rate/python-datasource.

    Scale: XML is a row-based text format — fine as an INTERCHANGE
    source (files split per-element like JSON lines), wrong as a table
    format; the query models the ingest-side read, not storage."""
    import hashlib
    import os

    # Cache key = content fingerprint of the nation parquet (path +
    # per-file size/mtime), not the sf_dir path alone — a regenerated
    # fixture at the same path gets a fresh render instead of serving
    # stale XML against a fresh oracle (ADVICE r9). Marker is written
    # atomically (tmp + os.replace) so parallel test workers either see
    # a complete render or rebuild into their own keyed dir.
    src = os.path.join(sf_dir, "nation.parquet")
    fp = hashlib.md5(src.encode())
    walk_src = src if os.path.isdir(src) else os.path.dirname(src)
    for root, _dirs, files in sorted(os.walk(walk_src)):
        for fn in sorted(files):
            if not (fn.startswith("nation") or "nation" in root):
                continue
            st = os.stat(os.path.join(root, fn))
            fp.update(f"{root}/{fn}:{st.st_size}:{st.st_mtime_ns}".encode())
    xml_dir = os.path.join("/tmp/spark_graft_xml", fp.hexdigest()[:16])
    marker = os.path.join(xml_dir, "_READY")
    if not os.path.exists(marker):
        # build-aside + atomic rename claim (same race class as the ORC
        # cache, ADVICE r11): a published slot is immutable
        import shutil
        import tempfile

        os.makedirs(os.path.dirname(xml_dir), exist_ok=True)
        staging = tempfile.mkdtemp(
            prefix=".build_", dir=os.path.dirname(xml_dir)
        )
        build = os.path.join(staging, "data")
        (
            t(spark, sf_dir, "nation")
            .repartition(1)
            .write.format("xml")
            .option("rowTag", "nation")
            .option("rootTag", "nations")
            .mode("overwrite")
            .save(build)
        )
        with open(os.path.join(build, "_READY"), "w") as f:
            f.write("ok")
        try:
            os.rename(build, xml_dir)
        except OSError:
            if not os.path.exists(marker):
                raise
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    n = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .load(xml_dir)
        .select(
            F.col("n_regionkey").cast("long").alias("n_regionkey"),
            F.col("n_name").cast("string").alias("n_name"),
        )
    )
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
            F.sum(F.length("n_name")).cast("long").alias("name_chars"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "map_hof_event_shares",
    sql="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, CAST(sum(n) AS DOUBLE) AS tot FROM c GROUP BY user_id)
    SELECT c.user_id, c.event_type,
           round(CAST(c.n AS DOUBLE) / t.tot, 6) AS share
    FROM c JOIN t USING (user_id)
    WHERE CAST(c.n AS DOUBLE) / t.tot >= 0.2
    ORDER BY c.user_id, c.event_type
    """,
)
def map_hof_event_shares(spark, sf_dir):
    """Map higher-order functions end to end — the API family the
    array HOFs (transform/filter/aggregate/zip_with, used across the
    vector ops) left unpinned: per user, the event-type histogram is
    materialized AS A MAP (map_from_entries), normalized with
    transform_values, thresholded with map_filter, and the surviving
    entries exploded back to rows. The oracle replays the same
    algebra relationally, so the value hash pins the map kernels'
    semantics (key preservation, lambda typing, entry order
    irrelevance). The per-user total comes from aggregate() over
    map_values — no second shuffle.

    Scale: one (user, type) aggregation + one map_from_entries rollup;
    all HOFs are row-local JVM expressions."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("hist")
    )
    tot = F.aggregate(
        F.map_values("hist"), F.lit(0).cast("long"), lambda acc, x: acc + x
    ).cast("double")
    shares = F.transform_values(
        F.col("hist"), lambda k, v: v.cast("double") / F.col("_tot")
    )
    kept = F.map_filter(F.col("_shares"), lambda k, v: v >= 0.2)
    return (
        m.withColumn("_tot", tot)
        .withColumn("_shares", shares)
        .withColumn("_kept", kept)
        .select("user_id", F.explode("_kept").alias("event_type", "raw_share"))
        .select(
            "user_id", "event_type", F.round("raw_share", 6).alias("share")
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "url_parse_profile",
    sql="""
    WITH parsed AS (
      SELECT 'www.' || source || '.example.org' AS host,
             '/docs/' || CAST(doc_id AS VARCHAR) AS path,
             lang AS ref, n_chars
      FROM documents)
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT ref) AS BIGINT) AS n_ref_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN ref = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en,
           CAST(max(length(path)) AS BIGINT) AS max_path_len
    FROM parsed GROUP BY host ORDER BY host
    """,
)
def url_parse_profile(spark, sf_dir):
    """URL component extraction via the ``parse_url`` built-in — the
    per-domain profiling pass a web-corpus curation pipeline runs
    before domain capping (CCNet/RefinedWeb-style): synthesize each
    document's canonical URL deterministically, then extract HOST,
    PATH, and the ``ref`` QUERY parameter with ``parse_url`` and roll
    up per host. The oracle constructs the same components with plain
    string algebra, so the value hash pins the extractor's semantics
    (host casing, path boundary, query-param lookup).

    Scale: parse_url is a row-local JVM expression; one map-side
    combinable aggregation on the host key. Per-host CAPPING at scale
    composes with quota_sample_per_source (the registered quota
    sampler) — this query is the census that sizes those quotas.

    Oracle-equivalence precondition: ``documents.source`` and ``lang``
    must contain only URL-safe characters ([A-Za-z0-9-]) — Spark's
    ``parse_url`` (java.net.URI) returns NULL host for a URL containing
    '_' or spaces while the oracle's string algebra would still build
    one. tests/test_relational3_pins.py::test_url_parse_fixture_is_url_safe
    fails loudly if a future fixture breaks this."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        "n_chars",
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("ref").cast("long").alias("n_ref_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.when(F.col("ref") == "en", 1).otherwise(0))
            .cast("long")
            .alias("n_en"),
            F.max(F.length("path")).cast("long").alias("max_path_len"),
        )
        .orderBy("host")
    )


@register(
    "try_safe_parsing",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN TRY_CAST(CASE WHEN event_id % 5 = 0
                     THEN 'u' || CAST(user_id AS VARCHAR)
                     ELSE CAST(user_id AS VARCHAR) END AS BIGINT) IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_int,
           CAST(sum(COALESCE(TRY_CAST(CASE WHEN event_id % 5 = 0
                     THEN 'u' || CAST(user_id AS VARCHAR)
                     ELSE CAST(user_id AS VARCHAR) END AS BIGINT), 0))
                 AS BIGINT) AS sum_parsed,
           CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_div_null,
           max(CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE CAST(user_id AS DOUBLE)
                         / CAST(event_id % 7 AS DOUBLE) END) AS max_ratio,
           CAST(sum(CASE WHEN TRY_CAST(CASE WHEN user_id % 3 = 0
                     THEN '2024-13-01' ELSE '2024-01-15' END AS DATE)
                 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_good_date
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def try_safe_parsing(spark, sf_dir):
    """The ANSI error-safe ``try_*`` family end to end — dirty-input
    cleansing without a job-killing exception OR a silent wrong value:
    ``try_cast`` on a corrupted integer column (every 5th row carries a
    'u' prefix), ``try_divide`` across planted zero denominators, and
    ``try_cast`` to DATE on an invalid calendar string (month 13).
    Reports per-type parse-failure census, the exact integer sum of the
    rows that DID parse, and the max clean ratio. The oracle spells the
    same semantics with TRY_CAST and NULL-guarding CASE, pinning that
    try_divide-by-zero is NULL (not Infinity, not an error) and that
    the bad date is rejected, not clamped.

    Scale: all row-local JVM expressions inside one map-side-combinable
    aggregation on event_type."""
    e = t(spark, sf_dir, "events")
    dirty_int = F.when(
        F.col("event_id") % 5 == 0,
        F.concat(F.lit("u"), F.col("user_id").cast("string")),
    ).otherwise(F.col("user_id").cast("string"))
    parsed_int = dirty_int.try_cast("bigint")
    denom = F.col("event_id") % 7
    ratio = F.try_divide(F.col("user_id").cast("double"), denom.cast("double"))
    dirty_date = F.when(
        F.col("user_id") % 3 == 0, F.lit("2024-13-01")
    ).otherwise(F.lit("2024-01-15"))
    parsed_date = dirty_date.try_cast("date")
    return (
        e.select(
            "event_type",
            parsed_int.alias("pi"),
            ratio.alias("ratio"),  # try_divide itself yields NULL at denom=0
            parsed_date.alias("pd"),
            denom.alias("denom"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("pi").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_bad_int"),
            F.sum(F.coalesce(F.col("pi"), F.lit(0))).cast("long").alias("sum_parsed"),
            F.sum(F.when(F.col("denom") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_div_null"),
            F.max("ratio").alias("max_ratio"),
            F.sum(F.when(F.col("pd").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_good_date"),
        )
        .orderBy("event_type")
    )


@register(
    "bitmap_exact_distinct",
    sql="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bitmap_exact_distinct(spark, sf_dir):
    """EXACT distinct counting via the Spark 3.5+ ``bitmap_*`` family —
    the warehouse pattern that beats shuffling raw values: user ids
    bucket into fixed 4KB bitmaps (``bitmap_bucket_number`` /
    ``bitmap_bit_position``), each (group, bucket) OR-aggregates its
    bit positions map-side (``bitmap_construct_agg``), and the final
    count is the sum of per-bucket popcounts (``bitmap_count``). The
    oracle is the plain COUNT(DISTINCT) — the bitmap algebra must
    reproduce it exactly, unlike the HLL sketch family
    (hll_sketch_union_estimate) which trades exactness for one pass.

    Scale: two map-side-combinable aggregations; bitmap merge is
    associative and each partial is a bounded 4KB value, so the
    shuffle carries O(groups x touched-buckets) bitmaps instead of
    O(rows) user ids."""
    e = t(spark, sf_dir, "events")
    buckets = e.groupBy(
        "event_type", F.bitmap_bucket_number(F.col("user_id")).alias("bkt")
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("user_id"))
        ).alias("bm")
    )
    return (
        buckets.groupBy("event_type")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "bitmap_distinct_mv_merge",
    sql="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-03 00:00:00'
                     THEN user_id END) AS BIGINT) AS n_users_base
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bitmap_distinct_mv_merge(spark, sf_dir):
    """INCREMENTAL exact-distinct maintenance (VERDICT r10 task 7) —
    the MV pattern that makes bitmap_exact_distinct worth it at 100 TB:
    the pre-cut events build per-(event_type, bucket) bitmap state that
    is PERSISTED as a parquet MV table; the post-cut delta batch then
    folds in via ``bitmap_or_agg`` and the refreshed count reads ONLY
    the stored state + delta rows — the base fact rows are never
    rescanned (plan-pinned in tests/test_bitmapmv.py). The oracle
    recomputes both counts from raw history: ``n_users`` must equal
    COUNT(DISTINCT) over base UNION delta, exactly — no sketch error.

    Scale: refresh cost is O(delta + touched state); state is bounded
    4 KB per (group, bucket); both aggregations map-side combine.

    Reference anchor: glue_job_script.py:111-118 — per-batch fold into
    keyed persistent state instead of recompute-from-history."""
    import hashlib
    import os
    import tempfile

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.bitmapmv import (
        bitmap_mv_build,
        bitmap_mv_count,
        bitmap_mv_merge,
    )

    _cut = "2024-01-03 00:00:00"
    cut = F.lit(_cut).cast("timestamp")
    e = t(spark, sf_dir, "events")
    # Cache key = every input the base build depends on (house pattern,
    # queries/timelineq.py _mor_fixture_table): repeated invocations —
    # the oracle compare runs the query twice — reuse the stored MV
    # instead of re-scanning base history into a fresh temp dir.
    build_sig = "|".join([sf_dir, _cut, "event_type:user_id:bitmapmv:v1"])
    mv_path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_bitmapmv_" + hashlib.md5(build_sig.encode()).hexdigest()[:12],
        "state",
    )
    if not os.path.exists(os.path.join(mv_path, "_SUCCESS")):
        # base build: one full pass over pre-cut history, persisted as the MV
        bitmap_mv_build(
            e.filter(F.col("ts") < cut), ["event_type"], "user_id"
        ).write.mode("overwrite").parquet(mv_path)
    state = spark.read.parquet(mv_path)
    base_counts = bitmap_mv_count(state, ["event_type"], out_col="n_users_base")
    # incremental refresh: ONLY the stored state + the delta batch
    merged = bitmap_mv_merge(
        state, e.filter(F.col("ts") >= cut), ["event_type"], "user_id"
    )
    return (
        bitmap_mv_count(merged, ["event_type"], out_col="n_users")
        .join(base_counts, on="event_type", how="left")  # delta-only groups
        .select(
            "event_type",
            "n_users",
            F.coalesce(F.col("n_users_base"), F.lit(0)).cast("long").alias("n_users_base"),
        )
        .orderBy("event_type")
    )


@register(
    "content_sha_manifest",
    sql="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_unique,
           min(sha256(text)) AS min_sha,
           max(sha256(text)) AS max_sha
    FROM documents GROUP BY source ORDER BY source
    """,
)
def content_sha_manifest(spark, sf_dir):
    """Content-addressed manifest via cross-engine SHA-256 — the
    integrity record a corpus release ships (and the store-once
    multimodal ledger keys on): per source, doc count, EXACT distinct
    content count (byte-level dedup census), and the min/max content
    hash as a spot-checkable manifest signature. Spark's
    ``sha2(text, 256)`` and DuckDB's ``sha256`` must agree on every
    row (same UTF-8 bytes, same lowercase hex) for the value hash to
    match — pinning that content addresses are portable across
    engines, which is what makes a hash manifest trustworthy.

    Scale: row-local hashing inside codegen + one map-side-combinable
    aggregation on the source key."""
    d = t(spark, sf_dir, "documents")
    sha = F.sha2(F.col("text"), 256)
    return (
        d.select("source", sha.alias("sha"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("sha").cast("long").alias("n_unique"),
            F.min("sha").alias("min_sha"),
            F.max("sha").alias("max_sha"),
        )
        .orderBy("source")
    )


_SQLVAR_CENSUS = (
    "SELECT '{leg}' AS leg, event_type, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM sqlvar_events WHERE {pred} GROUP BY event_type"
)


@register(
    "sql_scripting_variables",
    sql="""
    WITH cut AS (
      SELECT min(value) AS c
      FROM (SELECT value FROM events ORDER BY value DESC, event_id LIMIT 500)
    ),
    a AS (
      SELECT 'hi_census' AS leg, event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events, cut WHERE value >= c GROUP BY event_type
    ),
    b AS (
      SELECT 'param_low' AS leg, event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events WHERE value < 5.0 GROUP BY event_type
    )
    SELECT leg, event_type, n_events, sum_value
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    ORDER BY leg, event_type
    """,
)
def sql_scripting_variables(spark, sf_dir):
    """Spark 4 SQL scripting + session variables + EXECUTE IMMEDIATE —
    the procedural SQL surface (SQL/PSM subset) Spark 4.0 added, pinned
    against a set-based oracle so the control flow cannot change
    semantics. Leg A runs a BEGIN..END compound: DECLARE a local
    variable, SET it from a data-driven scalar subquery (the min of the
    global top-500 values — a pure VALUE, so tie choice at the boundary
    cannot perturb it), then filter the census with it. Leg B binds a
    literal through EXECUTE IMMEDIATE's `?` parameter marker (USING
    clause) — the injection-safe dynamic-SQL path. The oracle computes
    both legs declaratively.

    Scale: each leg is one map-side-combinable aggregate; the scripting
    block's SET evaluates one TakeOrdered(500) scalar — no driver loop,
    no per-row procedure calls; scripting is orchestration, the data
    plan underneath is the same declarative census."""
    e = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.createOrReplaceTempView("sqlvar_events")
    a = spark.sql(f"""
    BEGIN
      DECLARE cut DOUBLE DEFAULT 0;
      SET cut = (SELECT min(value)
                 FROM (SELECT value FROM sqlvar_events
                       ORDER BY value DESC, event_id LIMIT 500));
      {_SQLVAR_CENSUS.format(leg='hi_census', pred='value >= cut')};
    END
    """)
    inner = _SQLVAR_CENSUS.format(leg="param_low", pred="value < ?")
    b = spark.sql(
        "EXECUTE IMMEDIATE '" + inner.replace("'", "''") + "' USING 5.0"
    )
    return a.unionByName(b).orderBy("leg", "event_type")


def _dp_sql() -> str:
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64_sql

    h = stable_hash64_sql("event_type", seed="dp")
    # Laplace(b) inverse CDF at u: -b * sign(u-0.5) * ln(1 - 2*|u-0.5|)
    u = f"({h} / 1152921504606846976.0)"
    lap = f"(-{_DP_B!r} * sign({u} - 0.5) * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    return f"""
    WITH per_user AS (
      SELECT event_type, user_id,
             least(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE),
                   {_DP_CLIP!r}) AS contrib
      FROM events GROUP BY event_type, user_id
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             round(sum(contrib), 2) AS clipped_sum
      FROM per_user GROUP BY event_type
    )
    SELECT event_type, n_users, clipped_sum,
           round(clipped_sum + {lap}, 4) AS noised_sum
    FROM agg ORDER BY event_type
    """


_DP_CLIP = 400.0   # per-user contribution bound C (the sensitivity)
_DP_EPS = 1.0
_DP_B = _DP_CLIP / _DP_EPS


@register("dp_noised_release", sql=_dp_sql())
def dp_noised_release(spark, sf_dir):
    """User-level differentially-private release of per-event-type spend
    — the mechanism a 100 TB pipeline uses to publish aggregates about
    individuals: (1) bound each USER's total contribution by clipping at
    C=400 (without the clip one heavy user makes the sensitivity — and
    thus the noise — unbounded), (2) add Laplace(C/eps) noise calibrated
    to that bound, one draw per released statistic. The draw comes from
    the shared deterministic hash through the Laplace inverse CDF so
    both engines release the identical values — the MECHANISM is pinned
    exactly; a production deploy swaps the hash for a CSPRNG and keeps
    every other line. clipped_sum is exact decimal; the noised value
    rounds at 4dp (ln() agrees across engines far below that).

    Scale: two map-side-combinable aggregations sharing no data-sized
    state — per-user partial sums, then per-group clip+sum; the noise
    is a row-local expression on the O(groups) result."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import dsum

    e = t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.least(dsum(F.col("value"), 2), F.lit(_DP_CLIP)).alias("contrib")
    )
    agg = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("contrib"), 2).alias("clipped_sum"),
    )
    u = stable_hash64(F.col("event_type"), seed="dp") / F.lit(float(1 << 60))
    lap = (
        F.lit(-_DP_B)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return agg.select(
        "event_type", "n_users", "clipped_sum",
        F.round(F.col("clipped_sum") + lap, 4).alias("noised_sum"),
    ).orderBy("event_type")


@register(
    "orc_source_roundtrip",
    sql="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           min(s_name) AS first_supplier,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def orc_source_roundtrip(spark, sf_dir):
    """Spark's built-in ORC source/sink (the other columnar table format
    next to parquet — native vectorized reader, zstd by default here):
    the supplier dim round-trips through an on-disk ORC dataset (written
    once per fixture content fingerprint and cached) and the read side
    aggregates it. The oracle computes the identical result from the
    original parquet, so the hash pins write -> ORC encode -> vectorized
    read -> aggregate, including decimal-exact money. Completes the
    format family: parquet/ORC/JSON/CSV/XML/rate/python-datasource.

    Scale: ORC files split by stripe like parquet row-groups; min/max
    stripe stats serve the same data-skipping role — interchangeable as
    the lake's columnar interchange format."""
    import hashlib
    import os

    src = os.path.join(sf_dir, "supplier.parquet")
    fp = hashlib.md5(src.encode())
    walk_src = src if os.path.isdir(src) else os.path.dirname(src)
    for root, _dirs, files in sorted(os.walk(walk_src)):
        for fn in sorted(files):
            if not (fn.startswith("supplier") or "supplier" in root):
                continue
            st = os.stat(os.path.join(root, fn))
            fp.update(f"{root}/{fn}:{st.st_size}:{st.st_mtime_ns}".encode())
    orc_dir = os.path.join("/tmp/spark_graft_orc", fp.hexdigest()[:16])
    marker = os.path.join(orc_dir, "_READY")
    if not os.path.exists(marker):
        # Build-aside + atomic publish (ADVICE r11): writing orc_dir in
        # place let two concurrent sessions with the same fingerprint
        # interleave (one overwriting the directory the other was
        # reading, marker landing only afterwards). Each builder now
        # writes a private staging dir and renames it into the slot; the
        # rename either claims the slot (then the marker is written
        # inside it) or loses to a finished peer (staging discarded).
        # A slot with _READY present is treated as immutable.
        import shutil
        import tempfile

        os.makedirs(os.path.dirname(orc_dir), exist_ok=True)
        staging = tempfile.mkdtemp(
            prefix=".build_", dir=os.path.dirname(orc_dir)
        )
        build = os.path.join(staging, "data")
        (
            t(spark, sf_dir, "supplier")
            .repartition(1)
            .write.format("orc")
            .mode("overwrite")
            .save(build)
        )
        with open(os.path.join(build, "_READY"), "w") as f:
            f.write("ok")
        try:
            os.rename(build, orc_dir)  # atomic claim; fails if slot taken
        except OSError:
            if not os.path.exists(marker):
                raise  # slot exists but unpublished: surface, don't read junk
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    s = spark.read.format("orc").load(orc_dir)
    return (
        s.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("s_name").alias("first_supplier"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("s_nationkey")
    )


_HRW_NODES5 = ["n0", "n1", "n2", "n3", "n4"]
_HRW_NODES6 = _HRW_NODES5 + ["n5"]


def _hrw_case_sql(nodes: list[str], key: str) -> str:
    """Winner = the FIRST node (in declaration order) whose hash equals
    the row maximum — greatest() over BIGINTs plus a CASE chain, the
    same tie rule the Spark side's when-chain applies."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64_sql

    hs = {n: stable_hash64_sql(f"CAST({key} AS VARCHAR)", seed=f"hrw_{n}") for n in nodes}
    m = "greatest(" + ", ".join(hs[n] for n in nodes) + ")"
    whens = " ".join(f"WHEN {hs[n]} = {m} THEN '{n}'" for n in nodes)
    return f"(CASE {whens} END)"


@register(
    "rendezvous_shard_rebalance",
    sql=f"""
    WITH keys AS (SELECT DISTINCT user_id FROM events),
    assign AS (
      SELECT user_id,
             {_hrw_case_sql(_HRW_NODES5, 'user_id')} AS node5,
             {_hrw_case_sql(_HRW_NODES6, 'user_id')} AS node6
      FROM keys
    )
    SELECT node5, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN node5 <> node6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST(sum(CASE WHEN node5 <> node6 AND node6 <> 'n5'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_wrong
    FROM assign GROUP BY node5 ORDER BY node5
    """,
)
def rendezvous_shard_rebalance(spark, sf_dir):
    """Rendezvous (highest-random-weight) hashing shard assignment and
    its defining elasticity property, audited: every key's owner is the
    node with the maximal hash(node, key); when a 6th node joins, the
    ONLY keys that move are those the new node now wins — n_moved_wrong
    (keys that moved between PRE-EXISTING nodes) must be 0 for every
    source shard, which the oracle checks per row, and the moved
    fraction concentrates near 1/6. This is how a 1000-executor cache /
    state-shard layer rebalances without reshuffling the world
    (consistent hashing without the ring).

    Scale: the winner is a row-local greatest() over per-node salted
    hashes — no shuffle until the O(nodes) census; node count rides the
    expression, not a join."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64

    keys = t(spark, sf_dir, "events").select("user_id").distinct()

    def winner(nodes):
        hs = {
            n: stable_hash64(F.col("user_id").cast("string"), seed=f"hrw_{n}")
            for n in nodes
        }
        m = F.greatest(*hs.values())
        out = F.when(hs[nodes[0]] == m, nodes[0])
        for n in nodes[1:]:
            out = out.when(hs[n] == m, n)
        return out

    assign = keys.select(
        "user_id",
        winner(_HRW_NODES5).alias("node5"),
        winner(_HRW_NODES6).alias("node6"),
    )
    moved = F.col("node5") != F.col("node6")
    return (
        assign.groupBy("node5")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(moved, 1).otherwise(0)).alias("n_moved"),
            F.sum(
                F.when(moved & (F.col("node6") != "n5"), 1).otherwise(0)
            ).alias("n_moved_wrong"),
        )
        .orderBy("node5")
    )
