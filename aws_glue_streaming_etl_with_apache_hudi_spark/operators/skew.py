"""Skew-handling operators: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one user generating 1% of all events, a
boilerplate document shared by millions of rows) serialize an entire
stage: every row of the hot key lands on one reducer. AQE's skew-join
splitting handles the JOIN case at runtime; for AGGREGATIONS over
algebraic functions the classic fix is salting — pre-aggregate on
(key, salt) to cap any single reducer's load at 1/salt of the hot key,
then combine.

The result is IDENTICAL to the unsalted aggregation (the oracle for the
salted query is the plain GROUP BY) — salting changes the physical
data flow only.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: Callable[[], list[Column]],
    final_aggs: Callable[[], list[Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs()`` produces the per-(key, salt) partials;
    ``final_aggs()`` combines partials per key. Both are callables so each
    phase gets fresh Column expressions. The salt derives from a hash of
    deterministic row content where available; ``spark_partition_id`` is
    used otherwise — both spread a hot key across ``num_salts`` reducers.

    Example (count + sum):
        salted_aggregate(
            df, ["k"],
            lambda: [F.count("*").alias("_n"), F.sum("v").alias("_s")],
            lambda: [F.sum("_n").cast("long").alias("n"), F.sum("_s").alias("s")],
        )
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % num_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs())
    return partial.groupBy(*keys).agg(*final_aggs())


def top_keys_by_frequency(df: DataFrame, keys: list[str], n: int = 10) -> DataFrame:
    """Diagnostic: the n heaviest keys (what you check BEFORE deciding to
    salt — salting un-skewed data just doubles the shuffle count)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt skew join: the manual fallback for when AQE's
    skew-join split cannot apply (e.g. the skewed side feeds a bucketed /
    pre-partitioned exchange AQE must preserve, or a deterministic plan
    is required).

    ``big`` rows get a salt in [0, num_salts); ``small`` is replicated
    once per salt value (an explode of a literal salt array — its rows
    multiply by num_salts, so keep ``small`` the dimension side). The
    join key becomes (on..., _salt): a hot key's rows now spread across
    ``num_salts`` reducers instead of serializing on one.

    The salt hashes the WHOLE row's content (xxhash64 over every
    column), not spark_partition_id: a partition-derived salt is
    constant per upstream partition, so a hot key concentrated in fewer
    input partitions than num_salts would still serialize on a few
    reducers while paying the full num_salts replication (caught by
    code review). Content hashing spreads per ROW — duplicates of one
    hot key differ in their payload columns, which is exactly what
    makes the key hot.

    The result is IDENTICAL to ``big.join(small, on, how)`` for inner
    and left joins — every big row meets exactly one replica of each
    matching small row (its own salt's copy). Semantic cost is zero;
    physical cost is num_salts× the small side's shuffle volume, the
    price of unseizing the hot reducer.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got: {how}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)).cast("int"),
    )
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    replicated = small.withColumn("_salt", F.explode(salts))
    return salted_big.join(replicated, [*on, "_salt"], how).drop("_salt")


def distributed_rank(
    df: DataFrame,
    col: str,
    out: str = "rnk",
    buckets: int = 32,
    method: str = "rank",
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """EXACT global ``rank()`` over ``col`` without a single-partition
    sort — the scale path the exact-rank queries (Gini, Spearman)
    document as their 100 TB degradation.

    A global ``Window.orderBy(col)`` funnels the whole table through ONE
    task. Instead: (1) approx-quantile boundaries split the value domain
    into ~equal buckets; (2) rows bucket by STRICT value comparison, so
    equal values can never straddle a boundary (ties stay rank-exact no
    matter how sloppy the sketch is — the sketch only balances load, it
    never decides correctness); (3) each bucket ranks locally under a
    bucket-partitioned window; (4) the global rank is the local rank
    plus the broadcast cumulative count of earlier buckets. The only
    driver-side data is ``buckets-1`` boundary doubles and one count per
    bucket — O(buckets) metadata, like every other bounded collect in
    the package.

    ``method``: ``"rank"`` (competition rank — ties share the minimum)
    or ``"row_number"`` (unique index; pass ``tie_breakers`` to make the
    within-tie order deterministic — bucketing stays on ``col`` alone,
    which is safe because tie blocks never split across buckets).

    Returns ``df`` with an ``out`` column holding the chosen rank."""
    # bucket on the double ORDER EMBEDDING (numerics cast; timestamps/
    # dates via epoch) — percentile_approx over the raw column returned
    # datetimes the float() boundary fold could not take, so timestamp
    # rank columns previously failed outright
    emb = _orderable_as_double(df, col)
    if emb is None:
        raise ValueError(
            f"distributed_rank needs an order-embeddable column, got {col!r}"
        )
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.select(
        F.percentile_approx(emb, F.array(*[F.lit(q) for q in qs]), F.lit(10000)).alias(
            "b"
        )
    ).collect()[0]["b"]
    bounds = sorted(set(bounds or []))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(emb > b, 1).otherwise(0),
    )
    bucketed = df.withColumn("_drk_bucket", bucket)
    # Per-bucket counts fold driver-side into prefix offsets — O(buckets)
    # metadata, exactly like the boundary collect above. (This used to be
    # an unpartitioned cumsum window over the counts frame; composing
    # that global window with a second window in the same consumer plan
    # trips a Catalyst mis-resolution — INTERNAL_ERROR_ATTRIBUTE_NOT_
    # FOUND — and the driver fold is simpler anyway.)
    rows = sorted(
        bucketed.groupBy("_drk_bucket").agg(F.count(F.lit(1)).alias("_n")).collect(),
        key=lambda r: r["_drk_bucket"],
    )
    offs: dict[int, int] = {}
    cum = 0
    for r in rows:
        offs[r["_drk_bucket"]] = cum
        cum += r["_n"]
    off_expr = F.lit(0)
    for b, o in offs.items():
        off_expr = F.when(F.col("_drk_bucket") == b, F.lit(o)).otherwise(off_expr)
    if method == "rank" and tie_breakers:
        raise ValueError("tie_breakers change competition-rank semantics")
    order_cols = [col] + list(tie_breakers or [])
    w_local = Window.partitionBy("_drk_bucket").orderBy(*order_cols)
    if method == "rank":
        local = F.rank().over(w_local)
    elif method == "row_number":
        local = F.row_number().over(w_local)
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        bucketed.withColumn(out, (off_expr + local).cast("long"))
        .drop("_drk_bucket")
    )


def _orderable_as_double(df: DataFrame, c: str):
    """A double-valued expression that preserves the column's order, or
    None when the type has no such embedding (strings): numerics cast
    directly, timestamps/dates via their epoch value."""
    import pyspark.sql.types as T

    dt = df.schema[c].dataType
    if isinstance(dt, T.NumericType) or isinstance(dt, T.BooleanType):
        return F.col(c).cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(c)).cast("double")
    if isinstance(dt, T.TimestampNTZType):
        # the fixtures' native timestamp type (parquet TIMESTAMP_NTZ);
        # cast through TIMESTAMP is monotone and injective under the
        # fixed UTC session zone, so order embeds exactly
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    if isinstance(dt, T.DateType):
        return F.col(c).cast("timestamp").cast("double")
    return None


def distributed_ntile(
    df: DataFrame,
    k: int,
    col: str,
    tie_breakers: list[str] | None = None,
    out: str = "bin",
    buckets: int = 32,
) -> DataFrame:
    """EXACT global ``ntile(k)`` without a single-partition sort — the
    same degradation path ``distributed_rank`` provides for rank():
    quantile-bucketed unique global index, then the ntile closed form
    from (index, n): the first ``n mod k`` tiles get ``n div k + 1``
    rows, the rest ``n div k`` — bit-identical to the window function's
    assignment over the same total order. ``tie_breakers`` complete the
    total order exactly as the window's ORDER BY would.

    Skew: a tie block is the one thing value-bucketing cannot split
    (strict comparison is what keeps ranks exact), so HOT values — a
    90%-constant column, the Gini/ntile degradation input — get a
    second bucketing level: global tie-breaker quantile boundaries
    sub-bucket each hot tie block (cells stay contiguous in the total
    order because the value is constant inside the block), the per-cell
    offsets fold driver-side (O(hot·buckets) metadata, hot <= buckets
    by the n/buckets threshold), and the within-cell row_number runs
    bucket-parallel. Cold values keep the plain per-value tie window.
    The sub-split needs an order-embedding of the first tie breaker
    into doubles (numeric/timestamp/date); string tie breakers fall
    back to the per-value window for that input.

    The only non-distributed pieces are the O(buckets) boundary/count
    metadata and one scalar row count folded into the tile literal."""
    tb = list(tie_breakers or [col])
    # Unique global index = competition rank + within-tie index.
    ranked = distributed_rank(df, col, out="_dnt_rk", buckets=buckets)

    # n as a driver scalar: feeds both the closed-form tile expression
    # (as a literal — no crossJoin of an aggregate over the same window
    # subtree) and the hot-value threshold.
    n_total = int(df.count())
    threshold_cnt = max(n_total // buckets, 1)
    hot_vals = [
        r[col]
        for r in df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > threshold_cnt)
        .collect()  # bounded: at most `buckets` values can exceed n/buckets
    ]
    tb0d = _orderable_as_double(df, tb[0]) if (tie_breakers and hot_vals) else None

    if tb0d is None:
        # no hot values (or no order-embeddable tie breaker): per-value
        # tie window, tie blocks bounded by the hot threshold
        w_tie = Window.partitionBy(col).orderBy(*tb)
        ranked = ranked.withColumn(
            "_dnt_r", F.col("_dnt_rk") + F.row_number().over(w_tie) - 1
        )
    else:
        hot_cond = None
        for v in hot_vals:
            c = F.col(col).isNull() if v is None else F.col(col).eqNullSafe(F.lit(v))
            hot_cond = c if hot_cond is None else (hot_cond | c)
        qs = [i / buckets for i in range(1, buckets)]
        b2 = df.filter(hot_cond).select(
            F.percentile_approx(tb0d, F.array(*[F.lit(q) for q in qs]), F.lit(10000)).alias("b")
        ).collect()[0]["b"]
        b2 = sorted(set(b2 or []))
        # strict-comparison sub-bucket (chained whens, no HOF lambda):
        # equal tie-breaker values never straddle a cell boundary
        sub = F.lit(0)
        for b in b2:
            sub = sub + F.when(tb0d > F.lit(float(b)), 1).otherwise(0)
        ranked = ranked.withColumn(
            "_dnt_sub", F.when(hot_cond, sub).otherwise(F.lit(-1))
        )
        # per-cell counts -> within-block prefix offsets, driver-folded
        cells = (
            ranked.filter(F.col("_dnt_sub") >= 0)
            .groupBy(col, "_dnt_sub")
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        by_val: dict = {}
        for r in cells:
            by_val.setdefault(r[col], []).append((int(r["_dnt_sub"]), int(r["_c"])))
        off_rows = []
        for v, pairs in by_val.items():
            cum = 0
            for s, c in sorted(pairs):
                off_rows.append((v, s, cum))
                cum += c
        spark = df.sparkSession
        import pyspark.sql.types as T

        off_schema = T.StructType(
            [
                T.StructField("_dnt_v", df.schema[col].dataType, True),
                T.StructField("_dnt_sub", T.IntegerType(), False),
                T.StructField("_dnt_off", T.LongType(), False),
            ]
        )
        offs = spark.createDataFrame(
            [(v, s, o) for (v, s, o) in off_rows], off_schema
        )
        w_cell = Window.partitionBy(col, "_dnt_sub").orderBy(*tb)
        ranked = ranked.join(
            F.broadcast(offs),
            on=[
                F.col(col).eqNullSafe(F.col("_dnt_v")),
                ranked["_dnt_sub"] == offs["_dnt_sub"],
            ],
            how="left_outer",
        ).drop(offs["_dnt_sub"]).drop("_dnt_v")
        ranked = ranked.withColumn(
            "_dnt_r",
            F.col("_dnt_rk")
            + F.coalesce(F.col("_dnt_off"), F.lit(0))
            + F.row_number().over(w_cell)
            - 1,
        ).drop("_dnt_off", "_dnt_sub")

    r = F.col("_dnt_r")
    n = F.lit(n_total).cast("long")
    small = F.floor(n / k).cast("long")          # n div k
    big = (n % k).cast("long")                   # tiles that get one extra
    threshold = big * (small + 1)
    tile = (
        F.when(r <= threshold, F.floor((r - 1) / (small + 1)) + 1)
        .otherwise(
            big + F.floor((r - 1 - threshold) / F.greatest(small, F.lit(1))) + 1
        )
        .cast("int")
        .alias(out)
    )
    return ranked.withColumn(out, tile).drop("_dnt_r", "_dnt_rk")


def distributed_running_agg(
    df: DataFrame,
    order_col: str,
    val_cols: list[str],
    out_cols: list[str],
    buckets: int = 32,
    agg: str = "sum",
    inclusive: bool = True,
) -> DataFrame:
    """EXACT running ``sum``/``max`` of each ``val_cols`` column over the
    total order of ``order_col`` without a single-partition sort — the
    two-phase prefix pattern (per-bucket subtotals, broadcast offsets,
    bucket-local window) that a global ``agg() OVER (ORDER BY ...)``
    degrades to at scale.

    Phase 1: approx-quantile boundaries on ``order_col`` split the
    domain into ~equal buckets; rows bucket by STRICT comparison, so
    the sketch only balances load — it never decides correctness.
    Per-bucket subtotals fold driver-side into EXCLUSIVE prefix offsets
    (O(buckets · len(val_cols)) metadata). Phase 2: each bucket runs a
    bucket-partitioned window; the global running value combines the
    bucket offset with the local window (sum adds, max takes the
    greater). ``inclusive=False`` gives the strictly-preceding frame
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``) — for max,
    the skyline/running-record shape; the first row of the total order
    gets NULL, exactly like the window.

    ``order_col`` must be a total order (unique values) — ties would
    make the running value order-dependent exactly as they do under
    the global window — and must embed into doubles
    (numeric/timestamp/date).

    Exactness: bit-exact window equivalence holds for integral sums and
    for max (all current callers). For FLOAT sums the driver-side
    offset fold uses ``math.fsum`` over the bucket subtotals (correctly
    rounded, order-independent), but the subtotals themselves and the
    window's row-order additions are non-associative — late-decimal
    divergence from a literal ``sum() OVER`` is possible, the standard
    cross-engine float-sum caveat (round or cast per the oracle rules
    in queries/base.py when comparing)."""
    if agg not in ("sum", "max"):
        raise ValueError(f"agg must be sum|max, got {agg!r}")
    emb = _orderable_as_double(df, order_col)
    if emb is None:
        raise ValueError(
            f"distributed_running_agg needs an order-embeddable column, got {order_col!r}"
        )
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.select(
        F.percentile_approx(emb, F.array(*[F.lit(q) for q in qs]), F.lit(10000)).alias("b")
    ).collect()[0]["b"]
    bounds = sorted(set(bounds or []))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(emb > F.lit(float(b)), 1).otherwise(0)
    bucketed = df.withColumn("_dps_bucket", bucket)
    jagg = F.sum if agg == "sum" else F.max
    rows = sorted(
        bucketed.groupBy("_dps_bucket")
        .agg(
            *[jagg(F.col(c)).alias(f"_s{i}") for i, c in enumerate(val_cols)],
        )
        .collect(),
        key=lambda r: r["_dps_bucket"],
    )
    # exclusive prefix per bucket: sum -> cumulative total of earlier
    # buckets; max -> running max of earlier buckets. None = "no non-null
    # mass in any earlier bucket" for BOTH aggs, so the SQL window's
    # null-before-first-value semantics survive the rewrite exactly.
    offs: dict[int, list] = {}
    seen: list = [[] for _ in val_cols]  # non-null subtotals so far, per col
    acc: list = [None] * len(val_cols)
    for r in rows:
        offs[r["_dps_bucket"]] = list(acc)
        for i in range(len(val_cols)):
            v = r[f"_s{i}"]
            if v is None:
                continue
            if agg == "sum":
                # float subtotals fold via math.fsum (correctly rounded,
                # bucket-order independent); ints stay exact plain adds
                seen[i].append(v)
                if any(isinstance(x, float) for x in seen[i]):
                    acc[i] = math.fsum(seen[i])
                else:
                    acc[i] = acc[i] + v if acc[i] is not None else v
            else:
                acc[i] = v if acc[i] is None else max(acc[i], v)
    hi = Window.currentRow if inclusive else -1
    w_local = (
        Window.partitionBy("_dps_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    for i, (c, out) in enumerate(zip(val_cols, out_cols)):
        off_expr = F.lit(None).cast("long")
        for b, o in offs.items():
            off_expr = F.when(F.col("_dps_bucket") == b, F.lit(o[i])).otherwise(off_expr)
        local = jagg(F.col(c)).over(w_local)
        if agg == "sum":
            combined = (
                F.when(local.isNull() & off_expr.isNull(), F.lit(None))
                .otherwise(F.coalesce(off_expr, F.lit(0)) + F.coalesce(local, F.lit(0)))
            )
        else:
            combined = (
                F.when(local.isNull(), off_expr)
                .when(off_expr.isNull(), local)
                .otherwise(F.greatest(off_expr, local))
            )
        bucketed = bucketed.withColumn(out, combined)
    return bucketed.drop("_dps_bucket")


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out: str = "cum",
    buckets: int = 32,
) -> DataFrame:
    """Inclusive two-phase running sum (see distributed_running_agg)."""
    out_df = distributed_running_agg(
        df, order_col, [val_col], [out], buckets=buckets, agg="sum", inclusive=True
    )
    return out_df.withColumn(out, F.col(out).cast("long"))


def distributed_cume_dist(
    df: DataFrame,
    part_cols: list[str],
    col: str,
    out: str = "cd",
    buckets: int = 32,
    max_cells: int = 4096,
) -> DataFrame:
    """EXACT ``cume_dist() OVER (PARTITION BY part_cols ORDER BY col)``
    for FEW, HUGE cohorts — the case where the literal window is a
    scale bug (two cohorts at 100 TB push half the table through one
    task) and plain ``Window.partitionBy`` buys nothing.

    ``cume_dist`` is the tie-inclusive rank over the cohort size:
    ``count(x' <= x within cohort) / n_cohort``. The rewrite is the
    same two-phase shape as distributed_rank, sub-bucketed per cohort:

    1. GLOBAL approx-quantile boundaries on ``col`` split the value
       domain into ~equal buckets; rows bucket by STRICT comparison, so
       a tie block can never straddle a boundary — the sketch balances
       load, it never decides correctness.
    2. Per-(cohort, bucket) counts fold driver-side into per-cohort
       exclusive prefix offsets and cohort totals — O(cohorts x
       buckets) metadata (``max_cells`` guards the contract: beyond a
       few thousand cohorts the literal window is already parallel and
       this primitive is the wrong tool).
    3. Each (cohort, bucket) runs a RANGE-framed count window —
       ``rangeBetween(unboundedPreceding, currentRow)`` counts all rows
       with value <= current INCLUDING ties, exactly the cume_dist
       numerator — and the global numerator adds the broadcast offset.

    Parallelism is cohorts x buckets tasks instead of cohorts."""
    emb = _orderable_as_double(df, col)
    if emb is None:
        raise ValueError(
            f"distributed_cume_dist needs an order-embeddable column, got {col!r}"
        )
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.select(
        F.percentile_approx(emb, F.array(*[F.lit(q) for q in qs]), F.lit(10000)).alias("b")
    ).collect()[0]["b"]
    bounds = sorted(set(bounds or []))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.aggregate(
        barr, F.lit(0), lambda acc, b: acc + F.when(emb > b, 1).otherwise(0)
    )
    bucketed = df.withColumn("_dcd_bucket", bucket)
    cells = bucketed.groupBy(*part_cols, "_dcd_bucket").agg(
        F.count(F.lit(1)).alias("_n")
    ).collect()
    if len(cells) > max_cells:
        raise ValueError(
            f"distributed_cume_dist collected {len(cells)} (cohort, bucket) "
            f"cells > max_cells={max_cells}; with that many cohorts the "
            "plain partitioned window is already parallel — use it"
        )
    by_cohort: dict[tuple, list] = {}
    for r in cells:
        pv = tuple(r[c] for c in part_cols)
        by_cohort.setdefault(pv, []).append((r["_dcd_bucket"], r["_n"]))
    spark = df.sparkSession
    rows = []
    for pv, blist in by_cohort.items():
        total = sum(n for _b, n in blist)
        cum = 0
        for b, n in sorted(blist):
            rows.append((*pv, b, cum, total))
            cum += n
    part_fields = [df.schema[c] for c in part_cols]
    import pyspark.sql.types as T

    meta_schema = T.StructType(
        [T.StructField(f.name, f.dataType) for f in part_fields]
        + [
            T.StructField("_dcd_bucket", T.IntegerType()),
            T.StructField("_dcd_off", T.LongType()),
            T.StructField("_dcd_total", T.LongType()),
        ]
    )
    meta = F.broadcast(spark.createDataFrame(rows, meta_schema))
    cond = F.col("_l._dcd_bucket") == F.col("_r._dcd_bucket")
    for c in part_cols:
        cond = cond & F.col(f"_l.`{c}`").eqNullSafe(F.col(f"_r.`{c}`"))
    joined = (
        bucketed.alias("_l")
        .join(meta.alias("_r"), cond, "left")
        .select("_l.*", "_r._dcd_off", "_r._dcd_total")
    )
    w_local = (
        Window.partitionBy(*part_cols, "_dcd_bucket")
        .orderBy(col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            out,
            (F.col("_dcd_off") + F.count(F.lit(1)).over(w_local)).cast("double")
            / F.col("_dcd_total").cast("double"),
        )
        .drop("_dcd_bucket", "_dcd_off", "_dcd_total")
    )


def distributed_exact_quantile(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    qs: list[float],
    rounds: int = 6,
    buckets: int = 64,
    max_final_distinct: int = 4096,
) -> DataFrame:
    """EXACT discrete quantiles per group WITHOUT any sort — the scale
    path `percentiles_exact` documents as its 100 TB degradation
    ("exact percentile requires a per-group sort"). Classic iterative
    selection: per (group, q) keep a live value range [lo, hi] and a
    target rank k (= ceil(q*n), DuckDB quantile_disc's convention);
    each round ONE map-side-combinable pass buckets the in-range rows
    against their group's broadcast range, the O(groups x qs x buckets)
    counts come back, and every state narrows to the bucket containing
    its rank. After ``rounds`` refinements (range shrunk buckets^rounds
    fold) the survivors' distinct values are collected (asserted under
    ``max_final_distinct`` — a width-(hi-lo)/64^r interval holds few
    distinct reals and usually one fixed-point value) and the k-th is
    read off driver-side. Driver state is O(groups x qs) scalars per
    round — the same bounded-metadata contract as `distributed_rank`.

    Returns one row per (group, q): group_cols + (q, value).

    Cost shape: rounds+2 data passes, each a broadcast join + partial
    aggregation, NO row shuffle on value — vs the sort's full exchange;
    at 100 TB passes are scan-bound and the exchange is the win."""
    gb = list(group_cols)
    base = df.select(*gb, F.col(col).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    init = base.groupBy(*gb).agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    ).collect()
    spark = df.sparkSession
    # state: key = (group tuple, q) -> [lo, hi, k]  (k is 1-based within range)
    state: dict = {}
    for r in init:
        g = tuple(r[c] for c in gb)
        for q in qs:
            k = max(1, math.ceil(q * r["_n"]))
            state[(g, q)] = [float(r["_lo"]), float(r["_hi"]), k]

    def _state_df():
        rows = [
            (*g, float(q), lo, hi)
            for (g, q), (lo, hi, _k) in state.items()
        ]
        return spark.createDataFrame(
            rows, base.select(*gb).schema.add("_q", "double").add("_slo", "double").add("_shi", "double")
        )

    def _with_state(sdf):
        """base x its group's states — null-SAFE on the group keys (a
        NULL group is a real group; the plain `on=` join would silently
        drop it and the oracle row with it)."""
        renamed = sdf.select(
            *[F.col(c).alias(f"_g{i}") for i, c in enumerate(gb)],
            "_q", "_slo", "_shi",
        )
        cond = F.lit(True)
        for i, c in enumerate(gb):
            cond = cond & base[c].eqNullSafe(F.col(f"_g{i}"))
        return base.join(F.broadcast(renamed), cond)

    for _ in range(rounds):
        live = {key: v for key, v in state.items() if v[0] < v[1]}
        if not live:
            break
        sdf = _state_df()
        width = (F.col("_shi") - F.col("_slo")) / buckets
        bucket = F.least(
            F.floor((F.col("_v") - F.col("_slo")) / width).cast("int"),
            F.lit(buckets - 1),
        )
        counts = (
            _with_state(sdf)
            .filter((F.col("_v") >= F.col("_slo")) & (F.col("_v") <= F.col("_shi")))
            .filter(F.col("_slo") < F.col("_shi"))
            .groupBy(*gb, "_q", bucket.alias("_b"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        per_key: dict = {}
        for r in counts:
            key = (tuple(r[c] for c in gb), r["_q"])
            per_key.setdefault(key, {})[r["_b"]] = r["_c"]
        for key, bmap in per_key.items():
            if key not in live:
                continue
            lo, hi, k = state[key]
            w = (hi - lo) / buckets
            cum = 0
            for b in range(buckets):
                c = bmap.get(b, 0)
                if cum + c >= k:
                    state[key] = [
                        lo + b * w,
                        hi if b == buckets - 1 else lo + (b + 1) * w,
                        k - cum,
                    ]
                    break
                cum += c
            else:  # fail LOUDLY, never emit a silently-wrong quantile
                raise ValueError(
                    f"rank {k} unreachable while refining group={key[0]} "
                    f"q={key[1]} — floating-point bucket-boundary slip; "
                    "raise buckets or lower rounds"
                )

    # final resolution: k-th among the distinct values left in range
    sdf = _state_df()
    fin = (
        _with_state(sdf)
        .filter((F.col("_v") >= F.col("_slo")) & (F.col("_v") <= F.col("_shi")))
        .groupBy(*gb, "_q", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    per_key = {}
    for r in fin:
        key = (tuple(r[c] for c in gb), r["_q"])
        per_key.setdefault(key, []).append((r["_v"], r["_c"]))
    out_rows = []
    for (g, q), (lo, hi, k) in state.items():
        vals = sorted(per_key.get((g, q), []))
        if len(vals) > max_final_distinct:
            raise ValueError(
                f"final range for group={g} q={q} still holds {len(vals)} "
                f"distinct values (> {max_final_distinct}); raise rounds"
            )
        cum = 0
        for v, c in vals:
            cum += c
            if cum >= k:
                out_rows.append((*g, float(q), v))
                break
        else:  # fail LOUDLY: a missing output row is a wrong answer
            raise ValueError(
                f"rank {k} unreachable in final range for group={g} q={q} "
                "— floating-point bucket-boundary slip; raise buckets or "
                "lower rounds"
            )
    return spark.createDataFrame(
        out_rows,
        base.select(*gb).schema.add("q", "double").add("value", "double"),
    )
