"""Skew operators: salted aggregation and salted join must be
physical-only rewrites — bit-identical to the plain plan's result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    top_keys_by_frequency,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


def _sides(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return e, c


def test_salted_join_equals_plain_inner(spark, sf_dir):
    e, c = _sides(spark, sf_dir)
    plain = e.join(c, ["user_id"])
    salted = salted_join(e, c, ["user_id"], num_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_join_equals_plain_left(spark, sf_dir):
    e, c = _sides(spark, sf_dir)
    # poke holes in the dim so LEFT actually exercises unmatched rows
    c = c.filter(F.col("user_id") % 3 != 0)
    plain = e.join(c, ["user_id"], "left")
    salted = salted_join(e, c, ["user_id"], num_salts=8, how="left")
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.filter(F.col("c_mktsegment").isNull()).count() > 0


def test_salted_join_rejects_outer(spark, sf_dir):
    e, c = _sides(spark, sf_dir)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(e, c, ["user_id"], how="full")


def test_salted_join_key_includes_salt(spark, sf_dir):
    """The physical join key must be (user_id, _salt) — that spread IS the
    operator; a plan that joins on user_id alone re-serializes hot keys."""
    e, c = _sides(spark, sf_dir)
    plan = (
        salted_join(e, c, ["user_id"], num_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [l for l in plan.splitlines() if "Join" in l and "user_id" in l]
    assert join_lines and all("_salt" in l for l in join_lines), plan[:2000]


def test_top_keys_by_frequency_orders_desc(spark, sf_dir):
    e, _ = _sides(spark, sf_dir)
    rows = top_keys_by_frequency(e, ["user_id"], n=5).collect()
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len(rows) == 5


def test_salted_aggregate_matches_plain(spark, sf_dir):
    e, _ = _sides(spark, sf_dir)
    plain = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
    )
    salted = salted_aggregate(
        e,
        ["user_id"],
        lambda: [
            F.count("*").alias("_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"),
        ],
        lambda: [
            F.sum("_n").cast("long").alias("n"),
            F.sum("_s").alias("s"),
        ],
    )
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_row = st.tuples(
    st.integers(min_value=0, max_value=3),  # key (tiny range => heat)
    st.integers(min_value=0, max_value=999),  # payload
)


@given(
    big=st.lists(_row, min_size=0, max_size=25),
    small=st.lists(_row, min_size=0, max_size=10),
    salts=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_salted_join_law(spark, big, small, salts):
    """For ANY frames and salt count, salted inner/left joins equal the
    plain joins — salting is a physical rewrite, never a semantic one
    (duplicates and hot keys included)."""
    cols_b, cols_s = ["k", "bv"], ["k", "sv"]
    bdf = spark.createDataFrame(big, cols_b) if big else spark.createDataFrame([], "k int, bv int")
    sdf = spark.createDataFrame(small, cols_s) if small else spark.createDataFrame([], "k int, sv int")
    for how in ("inner", "left"):
        plain = bdf.join(sdf, ["k"], how)
        salted = salted_join(bdf, sdf, ["k"], num_salts=salts, how=how)
        got = sorted(map(tuple, salted.collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want, (how, salts)


def test_aqe_skew_join_engages_on_hot_key(spark):
    """The JOIN half of the skew story is delegated to AQE (the module
    docstring's claim) — prove the delegation is real: a hot-key
    SortMergeJoin under tight skew thresholds must come out of adaptive
    re-planning marked skew=true (partition split applied)."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") < 250_000, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(0, 97).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = big.join(small, "k").groupBy().count()
        assert j.collect()[0][0] == 300_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_spreads_hot_key_from_one_partition(spark):
    """Code-review regression: the salt must vary PER ROW, not per input
    partition — a hot key sitting in a single upstream partition (one
    file, coalesced input) must still fan out across reducers."""
    hot = spark.range(0, 5000).select(
        F.lit(7).alias("k"), F.col("id").alias("v")
    ).coalesce(1)
    dim = spark.createDataFrame([(7, "x")], ["k", "w"])
    out = salted_join(hot, dim, ["k"], num_salts=8)
    assert out.count() == 5000  # correctness unchanged
    # distinct salt values over the single partition: the row-content hash
    # must produce (nearly) all 8 salts
    n_salts = (
        hot.select(F.pmod(F.xxhash64("k", "v"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_distributed_rank_exact_with_heavy_ties(spark):
    """Half the rows share ONE value: the tie block must not straddle a
    bucket boundary (strict-comparison bucketing) and the global rank
    must match a plain rank() exactly, including the post-tie skip."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank

    vals = [(i, 500.0) for i in range(100)] + [(100 + i, float(i)) for i in range(100)]
    df = spark.createDataFrame(vals, "id long, x double")
    got = {
        r.id: r.rnk for r in distributed_rank(df, "x", buckets=8).collect()
    }
    want = {
        r.id: r.rnk
        for r in df.withColumn(
            "rnk", F.rank().over(Window.orderBy("x")).cast("long")
        ).collect()
    }
    assert got == want


def test_distributed_rank_window_is_bucket_partitioned(spark, sf_dir):
    from aws_glue_streaming_etl_with_apache_hudi_spark.plans import explain_str
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

    plan = explain_str(QUERIES["distributed_global_rank"].fn(spark, sf_dir))
    # the data-sized ranking window shuffles on the bucket key, never
    # through one partition
    assert "hashpartitioning(_drk_bucket" in plan


def test_distributed_ntile_matches_window_ntile(spark):
    """distributed_ntile must equal F.ntile over the identical total
    order for every shape that exercises the closed form: remainder
    tiles, n < k, heavy ties."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_ntile

    cases = [
        (100, 10), (103, 10), (7, 10), (25, 4), (64, 3), (1, 5),
    ]
    for n, k in cases:
        df = spark.range(n).select(
            F.col("id").alias("key"),
            (F.col("id") % 9).cast("double").alias("x"),  # heavy ties
        )
        want = df.select(
            "key", F.ntile(k).over(Window.orderBy("x", "key")).alias("bin")
        )
        got = distributed_ntile(df, k, "x", tie_breakers=["key"], buckets=8)
        w = {r.key: r.bin for r in want.collect()}
        g = {r.key: r["bin"] for r in got.collect()}
        assert g == w, (n, k)


def test_distributed_ntile_hot_value_splits_tie_block(spark):
    """VERDICT r7 #5: a 90%-constant column must not serialize its tie
    block in one task. The hot value's rows must be indexed through
    tie-breaker sub-buckets (plan shows a window keyed by the cell, not
    the bare value) and still match F.ntile exactly."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_ntile

    n, k = 2000, 7
    df = spark.range(n).select(
        F.col("id").alias("key"),
        # 90% of rows share x=1.0; the rest spread over 10 values
        F.when(F.col("id") % 10 < 9, 1.0)
        .otherwise((F.col("id") % 100).cast("double"))
        .alias("x"),
    )
    got = distributed_ntile(df, k, "x", tie_breakers=["key"], buckets=8)
    want = df.select(
        "key", F.ntile(k).over(Window.orderBy("x", "key")).alias("bin")
    )
    w = {r.key: r.bin for r in want.collect()}
    g = {r.key: r["bin"] for r in got.collect()}
    assert g == w
    # plan gate: the within-tie window partitions by the CELL
    # (value, _dnt_sub), never by the bare value alone
    import re

    plan = got._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    tie_specs = [s for s in specs if s.startswith("x#")]
    assert tie_specs, plan[:2000]
    assert all("_dnt_sub" in s for s in tie_specs), tie_specs


def test_distributed_ntile_string_tiebreaker_falls_back(spark):
    """String tie breakers have no double order-embedding: the operator
    must fall back to the per-value tie window and stay exact."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_ntile

    df = spark.range(500).select(
        F.format_string("k%04d", F.col("id")).alias("key"),
        F.lit(1.0).alias("x"),  # fully constant: one giant tie block
    )
    got = distributed_ntile(df, 4, "x", tie_breakers=["key"], buckets=8)
    want = df.select(
        "key", F.ntile(4).over(Window.orderBy("x", "key")).alias("bin")
    )
    w = {r.key: r.bin for r in want.collect()}
    g = {r.key: r["bin"] for r in got.collect()}
    assert g == w


def test_distributed_prefix_sum_matches_global_window(spark):
    """distributed_prefix_sum == sum() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING) on a unique order column, including skewed value mass
    (most of the sum concentrated in a few rows) and zero/negative
    values — and its windows are bucket-partitioned (no empty
    windowspecdefinition partition)."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_prefix_sum

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (
            F.when(F.col("id") % 97 == 0, F.col("id") * 1000)
            .when(F.col("id") % 3 == 0, -F.col("id"))
            .otherwise(F.col("id") % 7)
        ).cast("long").alias("v"),
    )
    got = distributed_prefix_sum(df, "k", "v", out="cum", buckets=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    g = {r["k"]: r["cum"] for r in got.collect()}
    x = {r["k"]: r["cum"] for r in want.collect()}
    assert g == x

    from aws_glue_streaming_etl_with_apache_hudi_spark.plans import global_window_nodes

    assert global_window_nodes(got) == []


def test_distributed_prefix_sum_rejects_strings(spark):
    import pytest

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_prefix_sum

    df = spark.range(10).select(F.format_string("k%d", "id").alias("k"), F.lit(1).alias("v"))
    with pytest.raises(ValueError):
        distributed_prefix_sum(df, "k", "v")


def test_distributed_primitives_accept_timestamp_ntz(spark):
    """TIMESTAMP_NTZ — the fixtures' native timestamp type — must embed
    into the bucketing order for both rank order columns and ntile tie
    breakers (the rfm_segmentation migration initially tripped on it)."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import (
        distributed_rank,
        distributed_running_agg,
    )

    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.timestamp_seconds(F.col("id") * 3601)).cast("timestamp_ntz").alias("ts"),
        F.lit(1).cast("long").alias("one"),
    )
    assert str(df.schema["ts"].dataType) == "TimestampNTZType()"
    got = distributed_rank(df, "ts", out="r", buckets=8)
    want = df.withColumn("r", F.rank().over(Window.orderBy("ts")))
    assert {r["k"]: r["r"] for r in got.collect()} == {
        r["k"]: r["r"] for r in want.collect()
    }
    ra = distributed_running_agg(df, "ts", ["one"], ["cum"], buckets=8)
    w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want2 = df.withColumn("cum", F.sum("one").over(w))
    assert {r["k"]: r["cum"] for r in ra.collect()} == {
        r["k"]: r["cum"] for r in want2.collect()
    }


# -- r10: distributed_cume_dist (VERDICT r9 task 1) --------------------------


def test_distributed_cume_dist_matches_window(spark):
    """Two-value cohort key (the exact cume_dist_spend_curve shape),
    heavy ties, negatives: the two-phase rewrite must equal the literal
    cume_dist() window EXACTLY — division count/total is the same
    float op in both plans."""
    from pyspark.sql import Window

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_cume_dist

    rows = [(i, i % 2, float(v)) for i, v in enumerate(
        [5, 5, 5, -3, 2, 2, 9, -3, 0, 5, 1, 1, 1, 7, -8, 2, 2, 2, 6, 4]
    )]
    df = spark.createDataFrame(rows, "id long, cohort long, x double")
    for buckets in (1, 2, 7, 32):
        got = distributed_cume_dist(df, ["cohort"], "x", out="cd", buckets=buckets)
        w = Window.partitionBy("cohort").orderBy("x")
        want = df.withColumn("cd", F.cume_dist().over(w))
        g = {r["id"]: r["cd"] for r in got.collect()}
        x = {r["id"]: r["cd"] for r in want.collect()}
        assert g == x, f"buckets={buckets}"


def test_distributed_cume_dist_all_equal_values(spark):
    """Everyone ties: cume_dist is 1.0 for every row (rank of last tie =
    n), and the single tie block must not split across buckets."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_cume_dist

    df = spark.createDataFrame(
        [(i, i % 3, 42.0) for i in range(30)], "id long, cohort long, x double"
    )
    got = distributed_cume_dist(df, ["cohort"], "x", out="cd", buckets=8)
    assert all(r["cd"] == 1.0 for r in got.collect())


def test_distributed_cume_dist_window_is_subbucketed(spark):
    """The scale contract itself: the only Window in the plan partitions
    by (cohort, bucket) — never by the bounded cohort alone."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_cume_dist
    from aws_glue_streaming_etl_with_apache_hudi_spark.plans import (
        bounded_partition_windows,
        global_window_nodes,
    )

    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 2).alias("cohort"),
        (F.col("id") * 7 % 13).cast("double").alias("x"),
    )
    got = distributed_cume_dist(df, ["cohort"], "x", out="cd")
    assert not global_window_nodes(got)
    assert not bounded_partition_windows(got)


def test_distributed_cume_dist_max_cells_guard(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_cume_dist

    df = spark.range(100).select(
        F.col("id"), F.col("id").alias("cohort"), F.col("id").cast("double").alias("x")
    )
    with pytest.raises(ValueError, match="max_cells"):
        distributed_cume_dist(df, ["cohort"], "x", buckets=4, max_cells=10)
