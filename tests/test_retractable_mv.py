"""Retraction algebra for delete-aware IVM (operators/reconcile.py
retraction_delta over timeline.cdc_view_images feeds): group-moving
updates retract-then-add, deletes retract via the before image, deletes
of never-seen keys are no-ops, and emptied groups drop."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import (
    aggregate_delta,
    incremental_mv_refresh,
    retraction_delta,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import DELETED_COL, cdc_view_images

PRE = "user_id long, event_type string, value double"


def _mv(spark, pre_rows, inc_rows, deleted_ids):
    pre = spark.createDataFrame(pre_rows, PRE)
    inc = spark.createDataFrame(inc_rows, PRE).withColumn(
        DELETED_COL, F.col("user_id").isin(*deleted_ids) if deleted_ids else F.lit(False)
    )
    feed = cdc_view_images(pre, inc, ["user_id"], image_cols=["event_type", "value"])
    mv0 = aggregate_delta(
        pre, ["event_type"], sum_exprs={"total_value": F.col("value").cast("decimal(18,2)")}
    )
    mv1 = incremental_mv_refresh(
        mv0, retraction_delta(feed, "event_type", "value"),
        ["event_type"], sum_cols={"total_value": "total_value"},
    ).filter(F.col("n_rows") > 0)
    return {
        r.event_type: (r.n_rows, float(r.total_value)) for r in mv1.collect()
    }


def test_group_moving_update(spark):
    got = _mv(
        spark,
        [(1, "a", 10.0), (2, "a", 20.0)],
        [(1, "b", 15.0)],  # user 1 moves a -> b
        [],
    )
    assert got == {"a": (1, 20.0), "b": (1, 15.0)}


def test_delete_retracts_before_image(spark):
    got = _mv(spark, [(1, "a", 10.0), (2, "a", 20.0)], [(1, "a", 99.0)], [1])
    assert got == {"a": (1, 20.0)}  # after-image of a delete is ignored


def test_delete_of_unseen_key_is_noop(spark):
    got = _mv(spark, [(1, "a", 10.0)], [(9, "z", 50.0)], [9])
    assert got == {"a": (1, 10.0)}


def test_emptied_group_drops(spark):
    got = _mv(spark, [(1, "a", 10.0)], [(1, "a", 10.0)], [1])
    assert got == {}


def test_in_place_update_is_value_neutral_when_same(spark):
    """+x then -x must cancel EXACTLY (decimal, not double residue)."""
    got = _mv(spark, [(1, "a", 0.1), (2, "a", 0.2)], [(1, "a", 0.1)], [])
    assert got == {"a": (2, 0.3)}
