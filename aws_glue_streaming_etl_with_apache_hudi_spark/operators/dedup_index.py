"""Incremental near-duplicate detection against a persisted MinHash index.

The batch dedup operators (operators/dedup.py) answer "which documents in
THIS corpus are near-duplicates of each other". A continuously-ingesting
training-data pipeline needs the streaming form of that question: "is this
NEW document a near-duplicate of anything we have EVER accepted" — asked
per micro-batch, against an index that grows with every batch. The
reference's pipeline shape (stream -> foreachBatch -> keyed table,
glue_job_script.py:44-56) is exactly where this slots in: the index is one
more keyed artifact maintained by the batch hook.

Design for 100 TB:

- The persisted artifact is the MINIMAL normal form: one row of k 60-bit
  MinHash values per accepted document (k longs — ~64 bytes/doc, i.e. a
  billion-doc index is ~100 GB of parquet, scan-parallel). Bands are pure
  row-local md5s of signature slices, so they are re-derived at probe
  time instead of being stored (storing them would multiply the artifact
  by num_bands and pin the banding scheme into the data).
- A probe batch computes its own signatures (row-local shingling, one
  map-side-combinable groupBy — see operators/dedup.py), derives bands
  for BOTH sides, and joins on (band, bucket): the only shuffle keys are
  16-byte bucket digests, never document text, never n² pairs.
- The hot-bucket guard (cap_bucket_size) runs over the UNION of index and
  probe bands, so a boilerplate bucket that accreted over months cannot
  produce m² candidates against every new batch.
- Candidate verification is signature agreement (fraction of equal
  MinHash positions — the standard unbiased Jaccard estimator), NOT exact
  shingle Jaccard: the index deliberately does not retain shingle sets,
  so verification needs nothing but the k longs already joined in. With
  k=8 the estimate is an exact multiple of 1/8 (binary-exact double,
  cross-engine deterministic).
- Within-batch duplicates are resolved by the same join: batch bands are
  tagged and a batch document also pairs with LOWER-id batch documents,
  so the first occurrence in a batch survives and later copies flag
  against it. (Chains — B dups A, C dups B — flag against their nearest
  predecessor in one pass; collapsing chains to one canonical survivor
  is the batch `dedup_survivors` job, not the streaming gate's.)

`incremental_flags` is the pure composition (no I/O — oracle-checkable);
`LSHDedupIndex` wraps it with the parquet-append persistence and is the
foreachBatch-facing API.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import (
    _persist_slot,
    cap_bucket_size,
    lsh_bands,
    minhash_signatures,
    word_shingles,
)


def incremental_flags(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    index_sigs: DataFrame | None = None,
    shingle_n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Flag each batch document against the index and earlier batch rows.

    Returns one row per batch document:
    ``(id, is_duplicate, dup_of, est_jaccard)`` where ``dup_of`` is the
    best-matching accepted document (highest signature agreement, ties
    to the smallest id) and ``est_jaccard`` the agreement fraction, or
    NULL when nothing reaches ``threshold``.

    ``index_sigs`` is a (id, mh0..mh{k-1}) frame of previously-accepted
    signatures (None = empty index — pure within-batch dedup).
    """
    # the signature aggregation and the capped band frame each feed
    # multiple plan branches (probe + candidate sides, agreement join);
    # Catalyst does not share common subtrees, so slot-persist both —
    # the shingle/md5 work runs once per batch, not once per consumer
    sigs = _persist_slot(
        minhash_signatures(
            word_shingles(batch, id_col, text_col, n=shingle_n), id_col, num_hashes
        ),
        "dedup_index.sigs",
    )
    bands = lsh_bands(sigs, id_col, num_hashes, rows_per_band).withColumn(
        "_probe", F.lit(True)
    )
    sig_pool = sigs
    if index_sigs is not None:
        ibands = lsh_bands(index_sigs, id_col, num_hashes, rows_per_band).withColumn(
            "_probe", F.lit(False)
        )
        bands = bands.unionByName(ibands)
        sig_pool = sigs.unionByName(index_sigs)

    capped = _persist_slot(
        cap_bucket_size(bands, ["band", "bucket"], max_bucket_size),
        "dedup_index.bands_capped",
    )
    p = capped.filter(F.col("_probe")).select(
        "band", "bucket", F.col(id_col).alias("_pid")
    )
    q = capped.select("band", "bucket", F.col(id_col).alias("_cid"), "_probe")
    # a probe doc pairs with every indexed doc in its bucket and with
    # EARLIER (lower-id) probe docs — the first occurrence survives.
    # Index-side SELF pairs (_cid == _pid) are excluded: a previously
    # accepted document re-probed after a crash/replay must NOT flag as
    # a duplicate of its own signature — it passes through as novel and
    # the keyed upsert's idempotence absorbs the replay (the streaming
    # pipeline's "replays are no-ops" contract).
    cands = (
        p.join(q, ["band", "bucket"])
        .filter(
            ((~F.col("_probe")) & (F.col("_cid") != F.col("_pid")))
            | (F.col("_cid") < F.col("_pid"))
        )
        .select("_pid", "_cid")
        .distinct()
    )

    k = num_hashes
    a = sigs.select(
        F.col(id_col).alias("_pid"), *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)]
    )
    b = sig_pool.select(
        F.col(id_col).alias("_cid"), *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(k)]
    )
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0) for i in range(k)
    )
    est = (
        cands.join(a, "_pid")
        .join(b, "_cid")
        .select("_pid", "_cid", (agree.cast("double") / F.lit(k)).alias("_ej"))
        .filter(F.col("_ej") >= threshold)
    )
    # argmax by (agreement desc, candidate id asc) — deterministic tie rule
    best = (
        est.groupBy("_pid")
        .agg(
            F.max_by(F.col("_cid"), F.struct(F.col("_ej"), -F.col("_cid"))).alias(
                "dup_of"
            ),
            F.max("_ej").alias("est_jaccard"),
        )
    )
    return (
        batch.select(F.col(id_col))
        .join(best, F.col(id_col) == F.col("_pid"), "left")
        .select(
            F.col(id_col),
            F.col("dup_of").isNotNull().alias("is_duplicate"),
            "dup_of",
            "est_jaccard",
        )
    )


class LSHDedupIndex:
    """Persisted MinHash-LSH dedup index for continuous ingestion.

    On disk: ``{path}/sigs`` — an append-only parquet table of
    ``(id, mh0..mh{k-1})`` for every ACCEPTED (novel) document. Probing
    never rewrites the index; ingesting appends only the novel rows of
    the batch, so the artifact grows with the deduplicated corpus, not
    the raw stream.

    Typical use inside a foreachBatch hook::

        flags = index.ingest(batch_df)          # flags + index append
        survivors = batch_df.join(
            flags.filter(~F.col("is_duplicate")).select("doc_id"), "doc_id")
        table.upsert(survivors)

    Re-ingesting an identical batch is idempotent in effect: every row
    flags as a duplicate of its accepted twin (agreement 1.0) and the
    index gains nothing.

    SINGLE WRITER: ingest appends without coordination, which is exactly
    the foreachBatch contract (a checkpointed stream runs one batch at a
    time — the reference pins the same with MaxConcurrentRuns: 1). Two
    concurrent ingests could each accept the other's near-duplicate;
    wrap ingest in operators/locking.CommitLock if multiple independent
    jobs must share one index.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_n: int = 3,
        num_hashes: int = 8,
        rows_per_band: int = 2,
        threshold: float = 0.5,
        max_bucket_size: int | None = 1000,
    ) -> None:
        if num_hashes % rows_per_band != 0:
            raise ValueError("num_hashes must be divisible by rows_per_band")
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_n = shingle_n
        self.num_hashes = num_hashes
        self.rows_per_band = rows_per_band
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self._sigs_dir = os.path.join(path, "sigs")
        # signature-table schema, captured on first read/accept: the
        # table's shape is fixed by this index's parameters, so repeated
        # probe/accept calls must not pay a footer-inference job each
        # (guide §6 "supply the schema"; the streaming pipeline probes
        # and accepts once per micro-batch)
        self._sigs_schema = None

    # -- index state ----------------------------------------------------

    def _has_sigs(self) -> bool:
        d = self._sigs_dir
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d)
        )

    def signatures(self) -> DataFrame | None:
        """The accepted-document signature table (None when empty)."""
        if not self._has_sigs():
            return None
        reader = self.spark.read
        if self._sigs_schema is not None:
            reader = reader.schema(self._sigs_schema)
        df = reader.parquet(self._sigs_dir)
        if self._sigs_schema is None:
            self._sigs_schema = df.schema
        return df

    def size(self) -> int:
        sigs = self.signatures()
        return 0 if sigs is None else sigs.count()

    # -- probe / ingest --------------------------------------------------

    def probe(self, batch: DataFrame) -> DataFrame:
        """Flag batch rows against the index (read-only, no append)."""
        return incremental_flags(
            batch,
            self.id_col,
            self.text_col,
            index_sigs=self.signatures(),
            shingle_n=self.shingle_n,
            num_hashes=self.num_hashes,
            rows_per_band=self.rows_per_band,
            threshold=self.threshold,
            max_bucket_size=self.max_bucket_size,
        )

    def _swap_in(self, result: DataFrame) -> None:
        """Replace the live sigs dir with ``result`` via stage-and-rename.

        An in-place ``mode('overwrite')`` deletes the only on-disk copy
        first; until the rewrite finishes, the sole surviving copy of
        the index is unreplicated localCheckpoint blocks on executors —
        an executor loss mid-write would destroy the index with no
        recovery path. Staging to a sibling dir and swapping with
        ``os.rename`` (the MergeOnReadTable.restore pattern,
        operators/mor.py) keeps a COMPLETE durable copy on disk at every
        instant: stage the result to ``.compact_tmp``, rename the live
        dir aside to ``.compact_old``, rename the staging dir in, then
        drop the old copy. ``fsck`` repairs any crash window."""
        tmp = self._sigs_dir + ".compact_tmp"
        old = self._sigs_dir + ".compact_old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        result.write.mode("overwrite").parquet(tmp)
        os.rename(self._sigs_dir, old)
        os.rename(tmp, self._sigs_dir)
        shutil.rmtree(old, ignore_errors=True)

    def fsck(self) -> dict:
        """Repair a crash mid-``_swap_in``; safe in every window:

        - crash before the first rename: live dir intact, staging is a
          discardable duplicate -> reap ``.compact_tmp``;
        - crash between the renames: live dir missing, staging IS the
          complete result -> promote it, then reap ``.compact_old``;
        - crash before the final cleanup: live dir is the result ->
          reap the lingering ``.compact_old``."""
        tmp = self._sigs_dir + ".compact_tmp"
        old = self._sigs_dir + ".compact_old"
        report = {
            "staging_found": os.path.isdir(tmp),
            "old_found": os.path.isdir(old),
            "promoted": False,
        }
        if report["staging_found"]:
            if not self._has_sigs():
                os.rename(tmp, self._sigs_dir)
                report["promoted"] = True
            else:
                shutil.rmtree(tmp, ignore_errors=True)
        if report["old_found"] and self._has_sigs():
            shutil.rmtree(old, ignore_errors=True)
        return report

    def compact(self, n_files: int = 8) -> int:
        """Rewrite the signature table into ``n_files`` files — every
        ingest appends one small parquet file, so a long-running stream
        accretes one file per micro-batch and probe-side scan planning
        degrades (the classic small-file problem; same remedy as the
        sink compaction service). Content is unchanged; returns the
        number of files before the rewrite."""
        sigs = self.signatures()
        if sigs is None:
            return 0
        n_before = len(
            [f for f in os.listdir(self._sigs_dir) if f.endswith(".parquet")]
        )
        self._swap_in(sigs.repartition(n_files))
        return n_before

    def delete(self, ids: DataFrame) -> int:
        """Remove documents from the index (the right-to-be-forgotten
        path: a deleted document must stop suppressing future
        near-duplicates of itself). ``ids`` is a 1-column frame of
        ``id_col`` values; returns the number of signatures removed."""
        sigs = self.signatures()
        if sigs is None:
            return 0
        before = sigs.count()
        kept = sigs.join(
            ids.select(F.col(ids.columns[0]).alias(self.id_col)),
            self.id_col,
            "left_anti",
        )
        removed = before - kept.count()
        if removed:
            self._swap_in(kept)
        return removed

    def accept(self, batch: DataFrame) -> int:
        """Append signatures for ``batch`` rows not already indexed.

        Idempotent by id (anti-join against the live signature table),
        so it is safe to call AFTER the downstream table commit and safe
        to re-run on a crash replay — the transactional half of the
        probe/accept split the streaming gate uses (run_pipeline.py):
        probe+filter inside the foreachBatch transform, accept only
        after the keyed upsert has durably committed the batch. A crash
        between the upsert and the accept replays as probe (no new
        signatures yet, rows pass) -> idempotent re-upsert -> accept.

        The novel signatures are STAGED to a sibling directory in one
        Spark action, counted from the staged files' parquet footers
        driver-side, and renamed into the live directory (Spark part
        names carry a per-job UUID, so renames cannot collide). Staging
        is both the self-read-write barrier (the anti-join reads the
        live files while the write targets the staging dir — the old
        formulation needed an eager localCheckpoint plus a count job
        plus a second append write, three actions per micro-batch where
        this is one) and the same crash window as the old append: a
        crash mid-rename leaves a subset of the batch indexed, and the
        idempotent replay anti-joins those out and appends the rest.
        Returns the number of signatures appended."""
        rows = batch.select(self.id_col, self.text_col)
        sigs = self.signatures()
        if sigs is not None:
            rows = rows.join(sigs.select(self.id_col), self.id_col, "left_anti")
        novel_sigs = minhash_signatures(
            word_shingles(rows, self.id_col, self.text_col, n=self.shingle_n),
            self.id_col,
            self.num_hashes,
        )
        stage = self._sigs_dir + ".accept_tmp"
        shutil.rmtree(stage, ignore_errors=True)
        novel_sigs.write.mode("overwrite").parquet(stage)
        if self._sigs_schema is None:
            self._sigs_schema = novel_sigs.schema
        import pyarrow.parquet as pq

        parts = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        n = sum(
            pq.ParquetFile(os.path.join(stage, f)).metadata.num_rows
            for f in parts
        )
        if n:
            os.makedirs(self._sigs_dir, exist_ok=True)
            for f in parts:
                os.rename(
                    os.path.join(stage, f), os.path.join(self._sigs_dir, f)
                )
        shutil.rmtree(stage, ignore_errors=True)
        return n

    def ingest(self, batch: DataFrame) -> DataFrame:
        """Probe the batch, append the NOVEL rows' signatures, return flags.

        One-call convenience for batch/backfill use. Replay-safe: the
        probe excludes index-side self-pairs (a previously-accepted row
        re-probed after a crash flags as novel, not as a duplicate of
        its own signature) and ``accept`` is idempotent by id, so
        re-running ingest on the same batch neither drops rows nor
        double-appends. Streaming pipelines that need the strict
        commit-before-accept ordering call ``probe``/``accept``
        separately (run_pipeline.py).

        The flags plan reads the index's CURRENT parquet files, so it is
        eagerly localCheckpoint'ed BEFORE the append (self-read-write
        barrier, as in ``accept``)."""
        flags = self.probe(batch).localCheckpoint(eager=True)
        novel_ids = flags.filter(~F.col("is_duplicate")).select(self.id_col)
        self.accept(batch.join(novel_ids, self.id_col))
        return flags
