"""Bucketed tables: pre-shuffled layout so repeated joins/aggregations on
the bucket key skip their exchange — the co-location lever for recurring
100 TB joins (SURVEY.md §4: "bucketing/partition design")."""

from __future__ import annotations

import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.plans import explain_str
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # saveAsTable writes to the default warehouse dir (./spark-warehouse,
    # gitignored); tables are dropped on teardown
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield ("li_bucketed", "o_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_skips_shuffle(spark, bucketed):
    li_t, o_t = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(li_t).join(
            spark.table(o_t), spark.table(li_t).l_orderkey == spark.table(o_t).o_orderkey
        )
        plan = explain_str(df)
        # co-located bucketed join: sort-merge with NO exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correct(spark, bucketed, sf_dir):
    li_t, o_t = bucketed
    n_bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), spark.table(li_t).l_orderkey == spark.table(o_t).o_orderkey)
        .count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain
