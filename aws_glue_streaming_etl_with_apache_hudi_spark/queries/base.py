from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    sql: str | None
    headline: bool = False


QUERIES: dict[str, Query] = {}


def register(name: str, sql: str | None = None, headline: bool = False):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(fn=fn, sql=sql, headline=headline)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader used by every query."""
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Exact money arithmetic for oracle parity.
#
# Summing doubles is order-dependent, and `round(x, 2)` half-way behavior
# differs between engines (Spark rounds the shortest decimal repr HALF_UP;
# DuckDB rounds the binary double). Fixture measures are fixed-point (2dp)
# so products have 4-6 intrinsic decimals: cast each term to DECIMAL before
# summing and the sum is EXACT in both engines — identical values, no
# rounding-mode hazard. Helpers below encode that pattern; `*_SQL` renders
# the DuckDB side.


def dsum(col: "F.Column", scale: int = 4):
    """Exact decimal sum of a fixed-point expression, returned as double.

    NO post-cast rounding: the decimal sum is exact and identical in both
    engines, and decimal->double conversion is IEEE round-to-nearest of
    the same exact value — bit-identical doubles. Rounding the DOUBLE
    afterwards is what diverges (at 16 significant digits the rounding
    step is below the double's ulp and each engine resolves it
    differently — bit us at sf0.1 on q1's sum_charge)."""
    from pyspark.sql import functions as F

    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg(col: "F.Column", scale: int = 4, out_decimals: int = 6):
    """Average via exact decimal sum / count: both engines divide identical
    doubles -> identical results; rounding is then safe."""
    from pyspark.sql import functions as F

    return F.round(
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1)),
        out_decimals,
    )


def davg_sql(expr: str, scale: int = 4, out_decimals: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / count(*), {out_decimals})"
    )
