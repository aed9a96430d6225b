"""Table reconciliation: order-independent per-group checksums and diffs.

The validation half of every migration/bootstrap/replication story: after
adopting a table (operators/timeline.py bootstrap), restoring a savepoint,
or mirroring a lake across regions, "are these two tables the same?" must
be answerable WITHOUT shipping either table anywhere. A per-group
(row-count, XOR-of-row-hashes) summary is:

- order-independent (XOR commutes — no sort, no canonical row order);
- mergeable (partition summaries XOR/add into group summaries map-side);
- constant-size per group regardless of row count — two 100 TB tables
  compare by exchanging kilobytes of summaries.

Hashes come from the engine-portable md5 family (functions/hashing.py) so
a DuckDB-resident copy can be checked against a Spark-resident one — the
cross-engine reconciliation the oracle tests literally perform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64

#: Unit separator — cannot appear in fixture text; keeps ("a","bc")
#: distinct from ("ab","c") in the concatenated row image.
_SEP = "\x1f"
#: Null marker distinct from the empty string (contains the separator
#: byte, so no real column VALUE can collide with it; NUL is avoided —
#: it truncates C strings in some SQL paths).
_NULL = "\x1fNULL"


def row_fingerprint(cols: list[str]):
    """60-bit row hash over the named columns (null-safe, order-exact)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return stable_hash64(F.concat_ws(_SEP, *parts))


def row_fingerprint_sql(cols: list[str]) -> str:
    """DuckDB rendering of row_fingerprint (oracle side)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64_sql

    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{_NULL}')" for c in cols
    )
    return stable_hash64_sql(f"concat_ws('{_SEP}', {parts})")


def table_checksum(
    df: DataFrame, group_cols: list[str], hash_cols: list[str]
) -> DataFrame:
    """Per-group summary: ``(group_cols..., n_rows, xor_hash)``.

    One map-side-combinable aggregation; the shuffle carries one
    (count, 60-bit xor) pair per group per input partition."""
    return (
        df.select(*[F.col(c) for c in group_cols], row_fingerprint(hash_cols).alias("_h"))
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(_h)").cast("long").alias("xor_hash"),
        )
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str],
    hash_cols: list[str],
) -> DataFrame:
    """Compare two tables group-by-group: full outer join of their
    checksums with per-group verdicts. A group missing from one side
    reports 0 rows there. Output:
    ``(group_cols..., n_left, n_right, rows_match, hash_match)`` —
    ``hash_match`` true only when both count and XOR agree (XOR alone
    cannot distinguish an empty group from a self-cancelling pair,
    which the count disambiguates)."""
    lc = table_checksum(left, group_cols, hash_cols).withColumnsRenamed(
        {"n_rows": "n_left", "xor_hash": "_xl"}
    )
    rc = table_checksum(right, group_cols, hash_cols).withColumnsRenamed(
        {"n_rows": "n_right", "xor_hash": "_xr"}
    )
    joined = lc.join(rc, group_cols, "full_outer")
    n_l = F.coalesce(F.col("n_left"), F.lit(0))
    n_r = F.coalesce(F.col("n_right"), F.lit(0))
    return joined.select(
        *[F.col(c) for c in group_cols],
        n_l.alias("n_left"),
        n_r.alias("n_right"),
        (n_l == n_r).alias("rows_match"),
        (
            (n_l == n_r)
            & (F.coalesce(F.col("_xl"), F.lit(0)) == F.coalesce(F.col("_xr"), F.lit(0)))
        ).alias("hash_match"),
    )


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance
#
# The other half of the reconciliation story: a downstream aggregate kept
# CONSISTENT with its source without recomputation. For distributive /
# algebraic aggregates (count, sum, min/max under insert-only deltas),
# refreshing a materialized rollup with a new batch is a partial-aggregate
# merge — the same algebra Spark runs map-side inside one job, lifted
# across jobs: state ⊕ agg(delta) == agg(state_source ∪ delta).


def incremental_mv_refresh(
    mv: DataFrame | None,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge a pre-aggregated batch ``delta`` into materialized view
    ``mv`` (None = first refresh). Both frames carry ``group_cols``,
    ``count_col`` and the ``sum_cols`` values (mapping output-name ->
    output-name here, since the delta is already aggregated to the MV
    schema via ``aggregate_delta``). Insert-only deltas; retractions
    need the count to go signed — same algebra, negative weights.

    Scale: the refresh touches |changed groups| rows of the MV, never
    the source table — the 100 TB property that makes nightly full
    rebuilds unnecessary."""
    sums = sum_cols or {}
    if mv is None:
        return delta
    both = mv.unionByName(delta)
    aggs = [F.sum(count_col).cast("long").alias(count_col)] + [
        F.sum(c).alias(c) for c in sums
    ]
    return both.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def aggregate_delta(
    batch: DataFrame,
    group_cols: list[str],
    sum_exprs: dict[str, "F.Column"] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Aggregate a raw batch to the MV schema (the map-side half)."""
    sums = sum_exprs or {}
    aggs = [F.count(F.lit(1)).cast("long").alias(count_col)] + [
        F.sum(expr).alias(name) for name, expr in sums.items()
    ]
    return batch.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def retraction_delta(
    feed: DataFrame,
    group_col: str,
    value_col: str,
    change_col: str = "_change_type",
    count_col: str = "n_rows",
    sum_name: str = "total_value",
    scale: int = 2,
) -> DataFrame:
    """Signed MV delta from a CDC before-image feed (the retraction
    algebra `incremental_mv_refresh`'s docstring promises): inserts and
    update-AFTER images contribute (+1, +value) to the row's group;
    deletes and update-BEFORE images contribute (-1, -before_value) to
    the BEFORE group — so an update that moves a row between groups
    retracts from the old group and adds to the new one, and a delete
    of a never-seen key (insert+delete inside one batch window,
    before image null) retracts nothing. Exact DECIMAL values make
    +x then -x a true inverse (doubles would leave residue).

    Feed shape: `timeline.cdc_view_images` output — the after row's
    ``group_col``/``value_col`` plus ``before_<group_col>`` /
    ``before_<value_col>`` and the change verb."""
    dec = f"decimal(18,{scale})"
    adds = feed.filter(F.col(change_col).isin("insert", "update")).select(
        F.col(group_col).alias(group_col),
        F.lit(1).cast("long").alias(count_col),
        F.col(value_col).cast(dec).alias(sum_name),
    )
    retracts = feed.filter(
        F.col(change_col).isin("update", "delete")
        & F.col(f"before_{group_col}").isNotNull()
    ).select(
        F.col(f"before_{group_col}").alias(group_col),
        F.lit(-1).cast("long").alias(count_col),
        (-F.col(f"before_{value_col}").cast(dec)).alias(sum_name),
    )
    both = adds.unionByName(retracts)
    return both.groupBy(group_col).agg(
        F.sum(count_col).cast("long").alias(count_col),
        F.sum(sum_name).alias(sum_name),
    )
