"""Count-min sketch (operators/sketches.py): one-sided error guarantee,
mergeability, and the map-side-combinable build shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import sketches as SK


def _items(spark, words):
    return spark.createDataFrame([(w,) for w in words], "w string")


def test_cms_never_undercounts(spark):
    stream = ["apple"] * 50 + ["banana"] * 30 + ["cherry"] * 7 + list(
        f"noise{i}" for i in range(300)
    )
    items = _items(spark, stream)
    cms = SK.count_min_build(items, "w", depth=4, width=64)
    queried = _items(spark, ["apple", "banana", "cherry", "absent"])
    est = {
        r.w: r.cms_estimate
        for r in SK.count_min_estimate(cms, queried, "w", depth=4, width=64).collect()
    }
    assert est["apple"] >= 50 and est["banana"] >= 30 and est["cherry"] >= 7
    # heavy hitters in a sparse 4x64 grid should estimate near-exactly
    assert est["apple"] <= 50 + 300 and est["absent"] >= 0


def test_cms_merges_by_cell_addition(spark):
    day1 = _items(spark, ["x"] * 10 + ["y"] * 3)
    day2 = _items(spark, ["x"] * 5 + ["z"] * 8)
    c1 = SK.count_min_build(day1, "w", depth=3, width=32)
    c2 = SK.count_min_build(day2, "w", depth=3, width=32)
    merged = (
        c1.unionByName(c2)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = SK.count_min_build(
        day1.unionByName(day2), "w", depth=3, width=32
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_build_is_single_shuffle(spark):
    items = _items(spark, [f"w{i % 7}" for i in range(100)])
    plan = (
        SK.count_min_build(items, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1 and "partial_count" in plan
    assert "Join" not in plan


def test_cms_estimate_is_partitioning_invariant(spark):
    stream = [f"tok{i % 11}" for i in range(200)]
    queried = _items(spark, [f"tok{i}" for i in range(11)])
    base = _items(spark, stream)
    ref = None
    for n in (1, 4, 16):
        cms = SK.count_min_build(base.repartition(n), "w")
        got = sorted(
            map(tuple, SK.count_min_estimate(cms, queried, "w").collect())
        )
        if ref is None:
            ref = got
        assert got == ref


# -- reconcile: checksums + incremental MV (same "agree without moving
# data" family as the sketch; colocated to share the tiny fixtures) ----


def test_table_diff_flags_only_changed_groups(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import table_diff

    left = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")], "id long, g string, v string"
    )
    right_same = left
    d0 = {r.g: r for r in table_diff(left, right_same, ["g"], ["id", "v"]).collect()}
    assert all(r.hash_match and r.rows_match for r in d0.values())

    # value change in group a: same count, different hash
    right_mut = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "MUT"), (3, "b", "z")], "id long, g string, v string"
    )
    d1 = {r.g: r for r in table_diff(left, right_mut, ["g"], ["id", "v"]).collect()}
    assert d1["a"].rows_match and not d1["a"].hash_match
    assert d1["b"].hash_match

    # group only on one side: zero-filled, both verdicts false
    right_missing = left.filter(F.col("g") != "b")
    d2 = {r.g: r for r in table_diff(left, right_missing, ["g"], ["id", "v"]).collect()}
    assert d2["b"].n_right == 0 and not d2["b"].rows_match and not d2["b"].hash_match


def test_table_checksum_null_vs_empty_distinct(spark):
    """NULL and '' must fingerprint differently (the coalesce-marker
    guard), and column boundaries must not be ambiguous."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import table_diff

    a = spark.createDataFrame([(1, "g", None)], "id long, g string, v string")
    b = spark.createDataFrame([(1, "g", "")], "id long, g string, v string")
    d = table_diff(a, b, ["g"], ["id", "v"]).collect()[0]
    assert d.rows_match and not d.hash_match

    c1 = spark.createDataFrame([(1, "g", "ab", "c")], "id long, g string, x string, y string")
    c2 = spark.createDataFrame([(1, "g", "a", "bc")], "id long, g string, x string, y string")
    d2 = table_diff(c1, c2, ["g"], ["x", "y"]).collect()[0]
    assert not d2.hash_match, "column-boundary ambiguity in row fingerprint"


def test_incremental_mv_equals_recompute(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import (
        aggregate_delta,
        incremental_mv_refresh,
    )

    rows = [(i, f"g{i % 3}", float(i)) for i in range(30)]
    src = spark.createDataFrame(rows, "id long, g string, v double")
    dec = F.col("v").cast("decimal(18,2)")
    mv = aggregate_delta(src.filter("id < 20"), ["g"], {"sv": dec})
    # delta introduces a brand-new group too
    delta_src = src.filter("id >= 20").unionByName(
        spark.createDataFrame([(99, "gNEW", 1.5)], "id long, g string, v double")
    )
    delta = aggregate_delta(delta_src, ["g"], {"sv": dec})
    refreshed = incremental_mv_refresh(mv, delta, ["g"], {"sv": "sv"})
    direct = aggregate_delta(src.unionByName(
        spark.createDataFrame([(99, "gNEW", 1.5)], "id long, g string, v double")
    ), ["g"], {"sv": dec})
    assert sorted(map(tuple, refreshed.collect())) == sorted(map(tuple, direct.collect()))
    # first refresh bootstraps from None
    assert incremental_mv_refresh(None, delta, ["g"], {"sv": "sv"}) is delta


def test_streaming_post_commit_maintains_mv(spark, tmp_path):
    """End-to-end: file stream -> upsert table, with the post_commit
    hook maintaining an incremental (count, sum) rollup on disk — the
    materialized view stays equal to a direct aggregate of the table
    after every micro-batch, without ever rescanning the table."""
    import os

    from pyspark.sql import Row

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import (
        aggregate_delta,
        incremental_mv_refresh,
    )
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline

    src = str(tmp_path / "src")
    mv_dir = str(tmp_path / "mv")
    os.makedirs(src)
    table = UpsertTable(
        spark, str(tmp_path / "tbl"), keys=["k"], precombine="ver",
    )

    def maintain_mv(batch_df):
        delta = aggregate_delta(
            batch_df, ["g"], {"sv": F.col("v").cast("decimal(18,2)")}
        )
        mv = (
            spark.read.parquet(mv_dir)
            if os.path.isdir(mv_dir)
            else None
        )
        refreshed = incremental_mv_refresh(
            mv, delta, ["g"], {"sv": "sv"}
        ).localCheckpoint(eager=True)  # barrier: reads the dir it rewrites
        refreshed.write.mode("overwrite").parquet(mv_dir)

    pipe = StreamingUpsertPipeline(
        spark,
        source_dir=src,
        schema=None,
        table=table,
        checkpoint=str(tmp_path / "ckpt"),
        post_commit=maintain_mv,
    )

    # two waves, one micro-batch each (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [Row(k=1, g="a", v=1.0, ver=1), Row(k=2, g="b", v=2.0, ver=1)]
    ).coalesce(1).write.mode("append").parquet(src)
    pipe.run_available()
    spark.createDataFrame(
        [Row(k=3, g="a", v=3.5, ver=1)]
    ).coalesce(1).write.mode("append").parquet(src)
    pipe.run_available()

    mv = {r.g: (r.n_rows, float(r.sv)) for r in spark.read.parquet(mv_dir).collect()}
    direct = {
        r.g: (r.n, float(r.s))
        for r in table.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("v").cast("decimal(18,2)")).alias("s"))
        .collect()
    }
    assert mv == direct == {"a": (2, 4.5), "b": (1, 2.0)}


def test_observation_metrics_ride_the_action(spark, sf_dir):
    """df.observe: pipeline instrumentation metrics (row counts, null
    counts, value bounds) collected DURING the action — no second scan,
    the single-pass observability hook a DQ monitor attaches to every
    production write."""
    from pyspark.sql import Observation

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    n = observed.count()  # ONE action drives both the job and the metrics
    got = obs.get
    assert got["n_rows"] == n and got["n_null_value"] == 0
    assert got["min_value"] <= got["max_value"]
