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


def bucket_cols(df: DataFrame, cols: list[str], bits: int = 8) -> list[Column]:
    """Per-column ``bits``-bit bucket ranks, uniform between each
    column's min and max (collected via one tiny agg row) — the shared
    front half of both space-filling curves."""
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
    return buckets


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-value expression over numeric columns, bucketized uniformly
    between each column's min and max (collected via one tiny agg row)."""
    return interleave_bits(bucket_cols(df, cols, bits), bits)


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    partition_by: list[str] | None = None,
    curve: str = "zorder",
) -> None:
    """Write ``df`` as ``n_files`` curve-clustered Parquet files.

    ``repartitionByRange`` on the curve value gives contiguous, balanced
    ranges per output file (range exchange samples the distribution —
    no driver materialization); the within-partition sort makes row-group
    stats tight inside each file too. With ``partition_by``, clustering
    applies within each Hive partition (the Hudi clustering-job layout).
    ``curve``: "zorder" (any #cols) or "hilbert" (exactly 2 cols —
    Hudi's hoodie.layout.optimize.strategy=hilbert; tighter per-file
    boxes from unit-step adjacency)."""
    if curve == "hilbert":
        if len(cols) != 2:
            raise ValueError("curve='hilbert' needs exactly 2 columns")
        bx, by = bucket_cols(df, cols, bits)
        keyed = hilbert_index(
            df.withColumn("_cbx", bx).withColumn("_cby", by),
            "_cbx", "_cby", bits, out=ZCOL,
        ).drop("_cbx", "_cby")
    elif curve == "zorder":
        keyed = df.withColumn(ZCOL, zorder_value(df, cols, bits))
    else:
        raise ValueError(f"unknown curve {curve!r}")
    clustered = (
        keyed
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


# -- Hilbert curve (Hudi's hoodie.layout.optimize.strategy=hilbert) ----------
#
# The Hilbert index preserves locality strictly better than Morton/Z:
# consecutive indices are ALWAYS unit steps in (x, y) (Z-order jumps
# across the plane at power-of-two boundaries), so per-file bounding
# boxes are tighter for the same file count. The per-bit state update
# (reflect-and-swap from the classic xy2d algorithm) is not a closed
# bit formula like Morton interleave, so it is expressed as a CHAIN of
# `bits` projections — each stage rewrites (hx, hy, hd) from the
# previous stage's columns, all plain CASE/shift/mask integer ops that
# stay inside whole-stage codegen. The identical chain renders to
# DuckDB as stacked `SELECT * REPLACE` CTEs for oracle parity.

HCOL = "_hilbert"


def hilbert_index(
    df: DataFrame, xcol: str, ycol: str, bits: int = 8, out: str = HCOL
) -> DataFrame:
    """Append the Hilbert d-index of integer bucket columns
    (``xcol``, ``ycol``), each in [0, 2**bits). Bijective onto
    [0, 4**bits) with unit-step adjacency — both pinned by
    tests/test_hilbert.py against a pure-Python reference."""
    n = 1 << bits
    cur = df.select(
        "*",
        F.col(xcol).cast("long").alias("_hx"),
        F.col(ycol).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias(out),
    )
    keep = [c for c in cur.columns if c not in ("_hx", "_hy", out)]
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        hx, hy = F.col("_hx"), F.col("_hy")
        rx = F.shiftright(hx, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, k).bitwiseAND(F.lit(1))
        d2 = F.col(out) + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry)
        # reflect (when rx=1) then swap (when ry=0) — the xy2d rotation
        xa = F.when(rx == 1, F.lit(n - 1) - hx).otherwise(hx)
        ya = F.when(rx == 1, F.lit(n - 1) - hy).otherwise(hy)
        cur = cur.select(
            *keep,
            F.when(ry == 0, ya).otherwise(hx).alias("_hx"),
            F.when(ry == 0, xa).otherwise(hy).alias("_hy"),
            d2.alias(out),
        )
    return cur.drop("_hx", "_hy")


def hilbert_sql_ctes(
    source: str, bits: int = 8, xcol: str = "bx", ycol: str = "by"
) -> tuple[str, str]:
    """DuckDB rendering of `hilbert_index`: returns (ctes, final_name).
    ``source`` must expose ``xcol``/``ycol``; the final CTE carries every
    source column plus ``hd`` (the Hilbert index). Stage-for-stage the
    same simultaneous (hx, hy, hd) update as the Spark chain."""
    n = 1 << bits
    ctes = [
        f"hinit AS (SELECT *, CAST({xcol} AS BIGINT) AS hx, "
        f"CAST({ycol} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {source})"
    ]
    prev = "hinit"
    for idx, k in enumerate(range(bits - 1, -1, -1)):
        s = 1 << k
        rx = f"(((hx >> {k}) & 1))"
        ry = f"(((hy >> {k}) & 1))"
        ctes.append(
            f"""h{idx} AS (
      SELECT * REPLACE (
        CASE WHEN {ry} = 0
             THEN CASE WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END
             ELSE hx END AS hx,
        CASE WHEN {ry} = 0
             THEN CASE WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END
             ELSE hy END AS hy,
        hd + {s * s} * xor(3 * {rx}, {ry}) AS hd
      ) FROM {prev})"""
        )
        prev = f"h{idx}"
    return ",\n    ".join(ctes), prev
