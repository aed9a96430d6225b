"""Z-order clustered writes — multi-dimensional data-skipping layout.

Hudi ships clustering with Z-order/Hilbert space-filling curves
(``hoodie.layout.optimize.strategy``) so that parquet min/max stats prune
files for predicates on ANY clustered column, not just the sort prefix.
The reference never rebalances its COW table; at 100 TB an upsert table
accretes write-ordered files whose per-file column ranges span the whole
domain — every range predicate scans every file. This module is the
Spark-native fix:

1. **bucketize** each clustered column to a ``bits``-bit rank
   (uniform ``width_bucket`` over driver-collected min/max — two tiny
   aggregates, no data collect; quantile boundaries would handle heavy
   skew but cost a sample pass and are unnecessary for the fixture's
   uniform keys),
2. **interleave** the bucket bits into a single Z-value — a pure
   integer expression tree (shiftleft/OR), whole-stage-codegen'd, no UDF,
3. **repartitionByRange + sortWithinPartitions** on the Z-value: one
   range shuffle to co-locate Z-neighbors, files written in Z order so
   every file covers a small hyper-rectangle of the clustered space.

Effect: a predicate on any clustered column selects a fraction of files
~(selectivity)^(1/n_cols) instead of all of them — parquet row-group
stats do the skipping with zero read-path changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZCOL = "_zorder"


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each bucket id into one Z-value.

    Bit ``i`` of column ``c`` lands at output position ``i * n + c``
    (LSB-first round-robin), the standard Morton encoding. Pure
    shift/and/or expression tree — (bits × n_cols) JVM-side integer ops,
    no UDF, codegen-friendly."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for c_idx, col in enumerate(bucket_cols):
        as_long = col.cast("long")
        for i in range(bits):
            bit = F.shiftright(as_long, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + c_idx))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-value expression over numeric columns, bucketized uniformly
    between each column's min and max (collected via one tiny agg row)."""
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    n_buckets = 1 << bits
    buckets = []
    for c in cols:
        lo, hi = float(stats[f"min_{c}"]), float(stats[f"max_{c}"])
        if hi <= lo:  # constant column: single bucket
            buckets.append(F.lit(0))
            continue
        # width_bucket returns 1..n+1; clamp into 0..n-1
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
        buckets.append(F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_buckets - 1)))
    return interleave_bits(buckets, bits)


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` Z-clustered Parquet files.

    ``repartitionByRange`` on the Z-value gives contiguous, balanced
    Z-ranges per output file (range exchange samples the Z distribution —
    no driver materialization); the within-partition sort makes row-group
    stats tight inside each file too. With ``partition_by``, clustering
    applies within each Hive partition (the Hudi clustering-job layout)."""
    clustered = (
        df.withColumn(ZCOL, zorder_value(df, cols, bits))
        .repartitionByRange(n_files, ZCOL)
        .sortWithinPartitions(ZCOL)
        .drop(ZCOL)
    )
    writer = clustered.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def file_range_spans(df_with_file: DataFrame, col: str) -> DataFrame:
    """Clustering metric: per-file (min, max) span of ``col``, normalized
    by the global span — the fraction of the domain a file's row-group
    stats cover (lower ⇒ better data skipping). Input must carry a
    ``_file`` column (``F.input_file_name()``)."""
    global_stats = df_with_file.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()[0]
    span = float(global_stats["hi"] - global_stats["lo"]) or 1.0
    return (
        df_with_file.groupBy("_file")
        .agg(((F.max(col) - F.min(col)) / F.lit(span)).alias("span_frac"))
        .select("_file", "span_frac")
    )
