"""Incrementally maintained JOIN materialized view.

``incremental_mv_refresh`` (operators/reconcile.py) maintains AGGREGATE
views by merging partial aggregates; this module maintains the other
classic view shape — an equi-join ``V = fact ⋈ dim`` — from the commit
timelines of two upsert tables, without ever re-running the full join.

Refresh algebra (the standard delta-join decomposition): given new fact
commits ``(cf0, cf1]`` and dim commits ``(cd0, cd1]``,

    ΔV  =  ΔF ⋈ D@cd1                      (new/updated facts see the
                                            current dim)
        ∪  (F@cf1 ⋉ keys(ΔD)) ⋈ ΔD         (changed dim rows re-join the
                                            AFFECTED fact slice only)

both legs upserted into the view keyed by the fact's record key, so an
updated fact or dim row REPLACES its V row through the normal
key/precombine merge. A fact row caught by both legs produces the same
joined row twice; the upsert's within-batch precombine collapses it.

Contract: INNER equi-join under insert/update/DELETE workloads.
Deletes ride the incremental feed's tombstones (``_deleted=true`` rows,
timeline.py delete): a deleted fact leaves the view by its own key; a
deleted dim row takes every view row whose fact still references it
(the affected fact slice found with a semi join, never a driver-side
key collection).

Scale: leg 1 joins only the fact DELTA against the dim (broadcast when
the dim is small, shuffle otherwise). Leg 2 narrows the stored fact to
affected foreign keys with a SEMI JOIN against the dim delta's keys —
no driver-side key collection, and with the fact bucketed on fk the
probe prunes to the touched buckets. Refresh cost is O(changes), not
O(view): the property that replaces nightly full join rebuilds at
100 TB (same argument as the aggregate MV, reconcile.py:115).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import COMMIT_COL, DELETED_COL, TimelineTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


@dataclass
class JoinMV:
    """Materialized ``fact ⋈ dim`` view with incremental refresh.

    ``fact``/``dim``   the two source :class:`TimelineTable` instances.
    ``fk``/``dk``      equi-join columns (fact side / dim side).
    ``dim_cols``       dim columns carried into the view (besides none
                       of the dim's bookkeeping; ``dk`` itself is not
                       duplicated — ``fk`` already holds the value).
    ``path``           view storage (an :class:`UpsertTable` keyed by
                       the fact's record key, precombined by the fact's
                       precombine column).
    """

    spark: SparkSession
    path: str
    fact: TimelineTable
    dim: TimelineTable
    fk: str
    dk: str
    dim_cols: list[str]

    def __post_init__(self) -> None:
        self.view = UpsertTable(
            self.spark,
            os.path.join(self.path, "view"),
            keys=list(self.fact.keys),
            precombine=self.fact.precombine,
        )

    # -- refresh cursor (last source instants folded into the view) ---------
    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.path, "_mv_cursor.json")

    def _cursor(self) -> tuple[int, int]:
        try:
            with open(self._cursor_path) as f:
                c = json.load(f)
            return int(c["fact_commit"]), int(c["dim_commit"])
        except (OSError, ValueError, KeyError):
            return 0, 0

    def _save_cursor(self, cf: int, cd: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fact_commit": cf, "dim_commit": cd}, f)
        os.replace(tmp, self._cursor_path)

    # -- the join projection --------------------------------------------------
    def _joined(self, fact_df: DataFrame, dim_df: DataFrame) -> DataFrame:
        f_ = fact_df.alias("_f")
        d_ = dim_df.alias("_d")
        cols = [F.col(f"_f.{c}") for c in fact_df.columns] + [
            F.col(f"_d.{c}") for c in self.dim_cols
        ]
        return f_.join(
            d_, F.col(f"_f.{self.fk}") == F.col(f"_d.{self.dk}")
        ).select(*cols)

    def _facts_for(self, dim_keys: DataFrame) -> DataFrame:
        """The stored-fact slice referencing any of ``dim_keys`` (a
        one-column ``dk`` frame): broadcast SEMI join, aliased so the
        operator works even when ``fk`` and ``dk`` share a name."""
        f_ = self.fact.read().alias("_fa")
        k_ = dim_keys.distinct().alias("_ka")
        return f_.join(
            F.broadcast(k_),
            F.col(f"_fa.{self.fk}") == F.col(f"_ka.{self.dk}"),
            "leftsemi",
        )

    @staticmethod
    def _split_tombstones(delta: DataFrame) -> tuple[DataFrame, DataFrame | None]:
        """(live rows, tombstoned rows or None) — incremental feeds carry
        delete commits as ``_deleted=true`` rows (timeline.py delete)."""
        if DELETED_COL not in delta.columns:
            return delta, None
        flag = F.coalesce(F.col(DELETED_COL), F.lit(False))
        return (
            delta.filter(~flag).drop(DELETED_COL),
            delta.filter(flag).drop(DELETED_COL),
        )

    def refresh(self) -> dict:
        """Fold source commits since the last refresh into the view.

        Upsert legs land first, then delete legs (a key cannot be both
        live and tombstoned in one incremental range — the feed is
        latest-per-key — so the order only affects no-op deletes).
        Returns ``{"fact_range": (cf0, cf1], "dim_range": (cd0, cd1],
        "upserted": bool}``; a refresh with no new source commits is a
        metadata-only no-op (idempotent — re-running a crashed refresh
        replays the same delta through the idempotent upsert and the
        key-anti-join delete)."""
        cf0, cd0 = self._cursor()
        cf1, cd1 = self.fact.last_commit(), self.dim.last_commit()
        legs: list[DataFrame] = []
        deletes: list[DataFrame] = []  # view-key rows to remove
        if cf1 > cf0:
            live, dead = self._split_tombstones(
                self.fact.incremental(begin=cf0, end=cf1).drop(COMMIT_COL)
            )
            # a delete-ONLY range has no live rows — and its deltas carry
            # only identity+precombine columns, so the join leg could not
            # even resolve; skip it (the guard job scans one tiny delta)
            if dead is None or not live.isEmpty():
                legs.append(self._joined(live, self.dim.read()))
            if dead is not None:
                # deleted facts leave the view by their own keys
                deletes.append(dead.select(*self.view.keys))
        if cd1 > cd0:
            live, dead = self._split_tombstones(
                self.dim.incremental(begin=cd0, end=cd1).drop(COMMIT_COL)
            )
            if dead is None or not live.isEmpty():
                legs.append(
                    self._joined(self._facts_for(live.select(self.dk)), live)
                )
            if dead is not None:
                # inner join: facts that LOST their dim partner leave the
                # view; computed fact-side with a semi join (no driver
                # key collection). Facts that simultaneously moved to a
                # live fk are already re-read as their latest state, so
                # they don't match the deleted keys.
                lost = self._facts_for(dead.select(self.dk))
                deletes.append(lost.select(*self.view.keys))
        if legs:
            self.view.upsert(reduce(lambda a, b: a.unionByName(b), legs))
        for batch in deletes:
            if not batch.isEmpty():  # skip the rewrite for no-op deletes
                self.view.delete(batch)
        self._save_cursor(cf1, cd1)
        return {
            "fact_range": (cf0, cf1),
            "dim_range": (cd0, cd1),
            "upserted": bool(legs),
        }

    def read(self) -> DataFrame:
        return self.view.read()
