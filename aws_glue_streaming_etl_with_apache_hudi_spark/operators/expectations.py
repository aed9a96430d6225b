"""Declarative data-quality expectations over any DataFrame.

The pipeline's row-level guard is the quarantine (streaming/quarantine:
malformed records to a dead-letter queue); this is the TABLE-level
counterpart — the dbt-test / Great-Expectations pattern: a set of named
checks evaluated against a frame, producing one (check, n_violations,
passed) row each. A training-data or warehouse pipeline gates promotion
(bronze -> silver, corpus -> shipped) on this report.

Scale design: every aggregate check (not-null, range, accepted-values,
row-count) folds into ONE pass over the table — a single agg() with one
conditional-count expression per check, map-side combinable, no shuffle
of data rows. Uniqueness adds one aggregation on the key columns;
referential integrity adds one anti-join counted per check. The report
itself is a union of tiny (1-row) frames.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str  # "agg" | "unique" | "ref"
    # agg: a boolean Column that is True when the ROW VIOLATES the check
    violation: Column | None = None
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_cols: tuple[str, ...] = ()


def not_null(col: str) -> Check:
    return Check(name=f"not_null({col})", kind="agg", violation=F.col(col).isNull())


def in_range(col: str, lo: Any, hi: Any) -> Check:
    """NULLs do not violate a range check (pair with not_null to forbid)."""
    c = F.col(col)
    return Check(
        name=f"in_range({col}, {lo}, {hi})",
        kind="agg",
        violation=c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(
        name=f"accepted_values({col})",
        kind="agg",
        violation=c.isNotNull() & ~c.isin(values),
    )


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        name=f"matches({col})",
        kind="agg",
        violation=c.isNotNull() & ~c.rlike(pattern),
    )


def unique(*cols: str) -> Check:
    return Check(name=f"unique({', '.join(cols)})", kind="unique", cols=tuple(cols))


def references(cols: list[str], ref: DataFrame, ref_cols: list[str]) -> Check:
    """Referential integrity: every (cols) tuple exists in ref(ref_cols).
    Rows with a NULL key component are skipped (SQL FK semantics)."""
    return Check(
        name=f"references({', '.join(cols)})",
        kind="ref",
        cols=tuple(cols),
        ref=ref,
        ref_cols=tuple(ref_cols),
    )


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks; returns (check, n_violations bigint, passed
    boolean) ordered by check name. All ``agg`` checks share ONE scan."""
    pieces: list[DataFrame] = []

    agg_checks = [c for c in checks if c.kind == "agg"]
    if agg_checks:
        counted = df.agg(
            *[
                F.sum(F.when(c.violation, 1).otherwise(0))
                .cast("long")
                .alias(f"_v{i}")
                for i, c in enumerate(agg_checks)
            ]
        )
        # explode the single aggregated row into per-check rows: a union
        # of per-check selects would RE-EXECUTE the agg (and the scan)
        # once per branch — Catalyst shares nothing across union branches
        pieces.append(
            counted.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c.name).alias("check"),
                                F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias(
                                    "n_violations"
                                ),
                            )
                            for i, c in enumerate(agg_checks)
                        ]
                    )
                ).alias("_r")
            ).select("_r.check", "_r.n_violations")
        )

    for c in checks:
        if c.kind == "unique":
            dup = (
                df.groupBy(*[F.col(x) for x in c.cols])
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).cast("long").alias("n"))
            )
            pieces.append(
                dup.select(F.lit(c.name).alias("check"), F.col("n").alias("n_violations"))
            )
        elif c.kind == "ref":
            keyed = df.select(*[F.col(x) for x in c.cols]).na.drop()
            refk = c.ref.select(
                *[F.col(r).alias(l) for l, r in zip(c.cols, c.ref_cols)]
            ).distinct()
            missing = keyed.join(refk, list(c.cols), "left_anti").agg(
                F.count(F.lit(1)).cast("long").alias("n")
            )
            pieces.append(
                missing.select(
                    F.lit(c.name).alias("check"), F.col("n").alias("n_violations")
                )
            )

    report = reduce(lambda a, b: a.unionByName(b), pieces)
    return report.select(
        "check", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("check")
