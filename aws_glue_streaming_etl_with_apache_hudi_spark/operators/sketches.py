"""Mergeable sketch operators: count-min.

The approx family (approx_count_distinct / percentile_approx,
queries/relational2.py) covers cardinality and quantiles with Spark's
built-in sketches; frequency estimation ("how often does THIS item
occur?") has no built-in, so count-min is implemented natively — with
the engine-portable md5 hash family (functions/hashing.py) so every
counter and every estimate is bit-for-bit reproducible by the DuckDB
oracle (the same property the MinHash/SimHash operators rely on; Spark's
own hash()/xxhash64 seeds are engine-private).

Why count-min at 100 TB: the sketch is a depth x width grid of counters
(e.g. 4 x 256 = 1 KB of longs) that absorbs an unbounded token stream via
one map-side-combinable aggregation, is MERGEABLE across partitions /
days / corpora by cell-wise addition, and answers point frequency queries
with a one-sided error: estimates never undercount, and overcount by at
most eps*N with probability 1-delta (Cormode & Muthukrishnan 2005;
eps ~ e/width, delta ~ e^-depth). The exact top-k aggregation it replaces
shuffles the full vocabulary every time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.text import words


def _bucket(col, d: int, width: int):
    return stable_hash64(col, f"cms{d}") % width


def count_min_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a count-min sketch over an item stream: one row per
    non-empty (d, bucket) cell, ``(d, bucket, cnt)``.

    Each item expands row-locally to ``depth`` (d, bucket) pairs (an
    array explode — no join, no per-d passes over the data), then ONE
    groupBy(d, bucket) with map-side partial aggregation counts cells:
    the shuffle carries at most depth*width counter rows per input
    partition, independent of stream size. Sketches built on disjoint
    data merge by unioning and re-summing cells."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(item_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e")
    )
    return cells.groupBy(
        F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    cms: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``queries[item_col]``: per item the
    MINIMUM of its depth counter cells (the count-min estimator —
    one-sided, never under the true count). Missing cells count 0.

    The sketch is tiny (<= depth*width rows) and broadcasts; the lookup
    is a broadcast equi-join per derived (d, bucket), aggregated back to
    one row per queried item — no shuffle of the query set."""
    probes = queries.select(
        F.col(item_col),
        *[c for c in queries.columns if c != item_col],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(item_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e"),
    ).select("*", F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket")).drop("e")
    keep = [c for c in queries.columns]
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(*[F.col(c) for c in keep])
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_estimate")
        )
    )
