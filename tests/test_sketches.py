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
