"""Incremental exact-distinct maintenance via persisted bitmap state.

The pattern that makes ``bitmap_*`` exact-distinct worth running at
100 TB (VERDICT r10 task 7): COUNT(DISTINCT) over a growing fact table
costs a full rescan per refresh, but the per-(group, bucket) bitmaps of
``bitmap_exact_distinct`` (queries/relational3.py) are an ASSOCIATIVE,
bounded-size (4 KB) summary — persist them as a materialized-view table
and each refresh only (1) aggregates the DELTA batch to its own bitmaps
and (2) OR-merges them into the stored state (``bitmap_or_agg``). The
fact table's base rows are never read again; refresh cost is
O(delta rows + touched (group, bucket) state), not O(table).

Contrast with the sketch family (operators/sketches.py HLL): identical
merge algebra, but the bitmap state is EXACT — the oracle is plain
COUNT(DISTINCT) over base UNION delta, bit-for-bit.

Reference anchor: the same incremental-state shape as the reference's
foreachBatch upsert loop (glue_job_script.py:111-118) — each micro-batch
folds into keyed persistent state instead of recomputing from history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: persisted MV state schema: group cols + ``bkt`` (long) + ``bm`` (binary)
STATE_BUCKET_COL = "bkt"
STATE_BITMAP_COL = "bm"


def bitmap_mv_build(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Aggregate rows to per-(group, bucket) bitmap state — the frame a
    base build WRITES as the MV table, and a delta batch feeds into
    :func:`bitmap_mv_merge`. One map-side-combinable aggregation; the
    shuffle carries bounded 4 KB bitmaps, not raw values."""
    v = F.col(value_col)
    return df.groupBy(
        *group_cols, F.bitmap_bucket_number(v).alias(STATE_BUCKET_COL)
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(v)).alias(STATE_BITMAP_COL))


def bitmap_mv_merge(state: DataFrame, delta: DataFrame, group_cols: list[str],
                    value_col: str) -> DataFrame:
    """OR-merge a delta batch into persisted bitmap state, returning the
    NEW state. Reads only ``state`` (the MV table) and ``delta`` — never
    the base fact rows; tests/test_bitmapmv.py pins that the executed
    plan scans no other source. Untouched (group, bucket) state rows
    pass through the merge unchanged (bitmap_or_agg of one operand)."""
    keys = [*group_cols, STATE_BUCKET_COL]
    delta_bm = bitmap_mv_build(delta, group_cols, value_col)
    return (
        state.unionByName(delta_bm)
        .groupBy(*keys)
        .agg(F.bitmap_or_agg(F.col(STATE_BITMAP_COL)).alias(STATE_BITMAP_COL))
    )


def bitmap_mv_count(state: DataFrame, group_cols: list[str],
                    out_col: str = "n_distinct") -> DataFrame:
    """Exact distinct count per group from bitmap state: the sum of
    per-bucket popcounts (buckets partition the value domain, so the
    popcounts add)."""
    return state.groupBy(*group_cols).agg(
        F.sum(F.bitmap_count(F.col(STATE_BITMAP_COL))).cast("long").alias(out_col)
    )


class BitmapMVStore:
    """Durable bitmap-distinct state with crash-safe refresh — the
    stored half of the MV pattern, built to sit in the streaming
    pipeline's ``post_commit`` hook (streaming/pipeline.py): each
    micro-batch folds into the state AFTER the table upsert durably
    commits.

    Durability protocol: every refresh writes a COMPLETE new state
    version under ``state_v{n}`` and then advances a pointer file by
    atomic rename — a reader never sees a half-written version. The
    crash windows compose with the pipeline's replay semantics
    because the bitmap OR is IDEMPOTENT: a crash between the data
    commit and the pointer swap replays the whole batch, and
    re-folding the same values flips no new bits — counts are exact,
    not approximately-once. (Contrast: a `+= count` counter would
    double-count on exactly this window.)

    Scale: refresh reads the O(groups x touched-buckets) state table
    + the delta batch only — never the base facts
    (tests/test_bitmapmv.py pins the plan); old versions are pruned
    to a bounded trail."""

    KEEP_VERSIONS = 2  # current + previous (in-flight readers)

    def __init__(self, spark, path: str, group_cols: list[str], value_col: str):
        import os

        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.value_col = value_col
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        import os

        return os.path.join(self.path, "_CURRENT")

    def version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0  # never folded: bootstrap is correct
        except ValueError as exc:
            # A pointer that EXISTS but does not parse is corruption, not
            # absence — resetting to 0 here would silently rebuild state
            # from the next delta alone and serve exact-looking but
            # too-small counts. Fail loudly; state_v* dirs are intact for
            # manual repair (point _CURRENT at the newest complete one).
            raise RuntimeError(
                f"corrupt bitmap MV pointer {self._pointer!r}: refusing to "
                "reset to empty state"
            ) from exc

    def _state_dir(self, version: int) -> str:
        import os

        return os.path.join(self.path, f"state_v{version}")

    def read_state(self) -> DataFrame:
        v = self.version()
        if v == 0:
            raise ValueError(f"no bitmap MV state at {self.path}: fold first")
        return self.spark.read.parquet(self._state_dir(v))

    def fold(self, batch_df: DataFrame) -> int:
        """Refresh: state' = state OR build(batch); returns the new
        version. Idempotent under batch replay (see class docstring)."""
        import os
        import shutil

        new_v = self.version() + 1
        if new_v == 1:  # first fold bootstraps the state
            merged = bitmap_mv_build(batch_df, self.group_cols, self.value_col)
        else:
            merged = bitmap_mv_merge(
                self.read_state(), batch_df, self.group_cols, self.value_col
            )
        target = self._state_dir(new_v)
        shutil.rmtree(target, ignore_errors=True)  # crashed prior attempt
        merged.write.parquet(target)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._pointer)  # the commit point
        for stale in range(1, new_v - self.KEEP_VERSIONS + 1):
            shutil.rmtree(self._state_dir(stale), ignore_errors=True)
        return new_v

    def counts(self, out_col: str = "n_distinct") -> DataFrame:
        return bitmap_mv_count(self.read_state(), self.group_cols, out_col)
