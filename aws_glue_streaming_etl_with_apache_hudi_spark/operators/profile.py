"""Table profiling: per-column statistics in ONE scan.

The catalog-statistics pass (`ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS`) every warehouse runs to feed cost-based optimization and data
quality checks: row counts, null counts, distinct counts, min/max. The
engine exposes it as an operator so the stats are queryable (and
oracle-checkable) rather than hidden in catalog internals.

Scale shape: all columns' aggregates are computed in a SINGLE aggregate
over one scan (partial aggregation map-side) — one pass over 100 TB, not
one per column. The 1-row result is exploded driver-lessly into the
per-column report: the explode runs on the 1-row aggregate, so the
"pivot" costs nothing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_fmt(c: Column) -> Column:
    return c.cast("string")


def profile_columns(
    df: DataFrame,
    columns: list[str],
    formatters: dict[str, Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column, ordered by
    column name.

    ``formatters`` maps column name -> min/max rendering (applied AFTER
    the native-type min/max, so ordering is the column type's, not
    string ordering). Default rendering is a plain string cast; pass a
    formatter for doubles/timestamps where engines' default float/ts
    formatting could diverge.
    """
    formatters = formatters or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        fmt = formatters.get(c, _default_fmt)
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            fmt(F.min(F.col(c))).alias(f"_min_{c}"),
            fmt(F.max(F.col(c))).alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in sorted(columns)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
