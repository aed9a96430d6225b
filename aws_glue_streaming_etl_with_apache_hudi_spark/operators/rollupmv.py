"""Durable retractable rollup state maintained from a table's own
change feed — delete-aware incremental view maintenance (retraction_delta,
operators/reconcile.py) made STREAMABLE.

Where ``BitmapMVStore`` leans on an idempotent merge (bitmap OR) to
survive micro-batch replay, a count/sum rollup has no idempotent merge:
folding the same delta twice double-counts. The exactly-once handle here
is the TABLE'S OWN COMMIT IDS — state versions record the instant they
folded THROUGH, ``fold_through`` derives each refresh from the timeline's
incremental+CDC feed for exactly the commits past that watermark, and a
replayed micro-batch (which re-lands as a commit at/below the watermark)
is a structural no-op. Before-images come from the table's time-travel
read at the watermark, so the store needs NO cooperation from the writer:
any TimelineTable (batch or foreachBatch-fed) can be followed.

Durability protocol: versioned full-state writes + atomic pointer swap
(the BitmapMVStore pattern); the pointer carries ``version:folded_through``
so the watermark commits atomically WITH the state it describes.

Reference anchor: the reference's foreachBatch loop keeps only latest
state (glue_job_script.py:111-118); this is the aggregate-maintaining
consumer Hudi's cdc.enabled feed exists for.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RollupMVStore:
    KEEP_VERSIONS = 2  # current + previous (in-flight readers)

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str,
        value_col: str,
        scale: int = 2,
    ) -> None:
        self.spark = spark
        self.path = path
        self.group_col = group_col
        self.value_col = value_col
        self.scale = scale
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _current(self) -> tuple[int, int]:
        """(state version, folded-through commit); (0, 0) = never folded."""
        try:
            with open(self._pointer) as f:
                v, through = f.read().strip().split(":")
                return int(v), int(through)
        except FileNotFoundError:
            return 0, 0
        except ValueError as exc:
            # parseable-pointer-or-refuse, the BitmapMVStore contract:
            # resetting would silently rebuild from future deltas alone
            raise RuntimeError(
                f"corrupt rollup MV pointer {self._pointer!r}: refusing to "
                "reset to empty state"
            ) from exc

    def _state_dir(self, version: int) -> str:
        return os.path.join(self.path, f"state_v{version}")

    def folded_through(self) -> int:
        return self._current()[1]

    def read_state(self) -> DataFrame:
        v, _ = self._current()
        if v == 0:
            raise ValueError(f"no rollup MV state at {self.path}: fold first")
        return self.spark.read.parquet(self._state_dir(v))

    def fold_through(self, tbl, commit: int | None = None) -> int:
        """Advance the rollup to ``commit`` (default: the table's latest).
        Exactly-once by construction: commits at/below the watermark are
        skipped, so calling this from a replayed micro-batch's
        post_commit hook is a no-op. Returns the new watermark."""
        from aws_glue_streaming_etl_with_apache_hudi_spark.operators.reconcile import (
            incremental_mv_refresh,
            retraction_delta,
        )
        from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import cdc_view_images

        target = tbl.last_commit() if commit is None else commit
        v, through = self._current()
        if target <= through:
            return through  # replay / already folded: structural no-op
        image_cols = [self.group_col, self.value_col]
        # The aggregate-maintaining feed must describe STATE TRANSITIONS,
        # not upserted records: a stale delta row that LOSES the
        # precombine merge changes nothing, and feeding it as the
        # after-image would retract the stored winner and add the loser.
        # So: touched keys come from the range's deltas (O(range) scan),
        # after-images from the as-of-target snapshot restricted to those
        # keys, and a touched key ABSENT from the snapshot is a delete.
        touched = tbl.incremental(begin=through, end=target).select(
            *tbl.keys
        ).distinct()
        post = (
            tbl.read(as_of=target)
            .select(*tbl.keys, *image_cols)
            .join(touched, tbl.keys, "semi")
            .withColumn("_deleted", F.lit(False))
        )
        gone = touched.join(post.select(*tbl.keys), tbl.keys, "left_anti").withColumn(
            "_deleted", F.lit(True)
        )
        inc = post.unionByName(gone, allowMissingColumns=True)
        pre = None
        if through >= 1:
            pre = tbl.read(as_of=through).select(*tbl.keys, *image_cols)
        feed = cdc_view_images(pre, inc, tbl.keys, image_cols=image_cols)
        delta = retraction_delta(
            feed, self.group_col, self.value_col, scale=self.scale
        )
        state = self.read_state() if v > 0 else None
        merged = incremental_mv_refresh(
            state, delta, [self.group_col], sum_cols={"total_value": "total_value"}
        )
        new_v = v + 1
        target_dir = self._state_dir(new_v)
        shutil.rmtree(target_dir, ignore_errors=True)  # crashed prior attempt
        merged.write.parquet(target_dir)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{new_v}:{target}")
        os.replace(tmp, self._pointer)  # watermark commits WITH its state
        for stale in range(1, new_v - self.KEEP_VERSIONS + 1):
            shutil.rmtree(self._state_dir(stale), ignore_errors=True)
        return target

    def counts(self) -> DataFrame:
        """Live rollup: emptied groups (count 0) drop from the view."""
        return (
            self.read_state()
            .filter(F.col("n_rows") > 0)
            .select(
                self.group_col,
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("total_value").cast("double").alias("total_value"),
            )
        )
