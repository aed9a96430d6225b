"""Pinned repros for the Catalyst mis-resolutions the skew operators
route around (VERDICT r7 #5).

operators/skew.py historically hit INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
in three shapes and was restructured to avoid them:

  (a) distributed_rank's row_number+tie_breakers mode composed with a
      second window over the same HOF-bucketed plan;
  (b) the per-bucket offsets computed via an UNPARTITIONED cumsum
      window joined back under a second window (now a driver fold);
  (c) crossJoining an aggregate taken over the ranked plan back onto
      it (the window subtree self-reference; n is now a driver literal).

On the current Spark (4.1.x) the minimal compositions below RESOLVE
CLEANLY — these tests pin that fact. If a Spark upgrade regresses one,
the matching test fails and the workaround comment in skew.py is
re-justified; while they pass, the workarounds are retirement
candidates (kept because the driver-fold/literal forms are also the
simpler plans).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_rank


def _df(spark):
    return spark.range(1000).select(
        (F.col("id") % 7).alias("x"), F.col("id").alias("key")
    )


def test_pin_row_number_mode_composes_with_second_window(spark):
    df = _df(spark)
    r = distributed_rank(
        df, "x", out="rk", method="row_number", tie_breakers=["key"], buckets=8
    )
    out = r.withColumn(
        "rn2", F.row_number().over(Window.partitionBy("x").orderBy("key"))
    )
    rows = out.collect()
    assert len(rows) == 1000
    # the unique index is a permutation of 1..n
    assert sorted(r["rk"] for r in rows) == list(range(1, 1001))


def test_pin_unpartitioned_cumsum_offsets_compose_with_local_window(spark):
    df = _df(spark)
    bounds = [1.0, 3.0, 5.0]
    barr = F.array(*[F.lit(b) for b in bounds])
    bucket = F.aggregate(  # the HOF-lambda bucketing distributed_rank uses
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("x").cast("double") > b, 1).otherwise(0),
    )
    bucketed = df.withColumn("_b", bucket)
    cnts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = cnts.withColumn("_off", F.coalesce(F.sum("_n").over(w_cum), F.lit(0)))
    w_local = Window.partitionBy("_b").orderBy("x", "key")
    out = (
        bucketed.join(offs.select("_b", "_off"), "_b")
        .withColumn("rk", (F.col("_off") + F.row_number().over(w_local)).cast("long"))
    )
    rows = out.collect()
    assert sorted(r["rk"] for r in rows) == list(range(1, 1001))


def test_pin_aggregate_over_ranked_plan_crossjoins_back(spark):
    df = _df(spark)
    ranked = distributed_rank(df, "x", out="_rk", buckets=8)
    ranked2 = ranked.withColumn(
        "_r", F.col("_rk") + F.row_number().over(Window.partitionBy("x").orderBy("key")) - 1
    )
    n_row = ranked2.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    out = ranked2.crossJoin(F.broadcast(n_row)).withColumn(
        "t", F.floor((F.col("_r") - 1) * 4 / F.col("_n")) + 1
    )
    rows = out.collect()
    assert len(rows) == 1000
    assert {r["t"] for r in rows} == {1, 2, 3, 4}
