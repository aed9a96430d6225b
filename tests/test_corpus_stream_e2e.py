"""E2E for the streamed corpus pipeline (VERDICT r9 task 5): the
reference dataflow (A1 file stream -> A2 foreachBatch -> A8 keyed
upsert -> A12 checkpoint/restart) carrying the north-star corpus
operators at once — per-batch quality gate, incremental MinHash-LSH
near-dup gate (probe/accept split), MOR delta ingestion — with the
documented acceptance semantics asserted doc by doc on a crafted
corpus, and the crash-replay convergence contract exercised at the
upsert->accept window (the one the probe/accept ordering exists for).

Value-level parity of the full composition against the unrolled SQL
oracle runs in the registry gate (corpus_stream_e2e,
tests/test_queries_oracle.py)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup_index import LSHDedupIndex
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import MergeOnReadTable
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.text import quality_score
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import StreamingUpsertPipeline


class InjectedCrash(RuntimeError):
    pass


def _text(salt: str, words: int = 100) -> str:
    # 100 distinct tokens -> quality 1.0 (length + distinct + no stopwords)
    return " ".join(f"{salt}{i}" for i in range(words))


LOW_QUALITY = "hash hash hash"  # short + repetitive + stopword-heavy

SCHEMA = "doc_id long, text string, lang string, source string"

#: batch -> rows. Crafted acceptance story:
#:   batch0: 1 accepted, 2 fails quality
#:   batch1: 3 near-dups accepted 1 (cross-batch reject), 4 novel accept
#:   batch2: 5 and 6 identical (within-batch keep-first: 5 in, 6 out),
#:           7 near-dups the REJECTED 2's text but passes: text differs
BATCHES = {
    0: [(1, _text("a"), "en", "web"), (2, LOW_QUALITY, "en", "web")],
    1: [(3, _text("a"), "en", "code"), (4, _text("b"), "de", "web")],
    2: [
        (5, _text("c"), "fr", "web"),
        (6, _text("c"), "fr", "code"),
        (7, _text("d"), "en", "web"),
    ],
}
EXPECT_ACCEPTED = {1, 4, 5, 7}


def _build(spark, tmp_path, crash_accept_on_batch: int | None = None):
    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)
    for b, rows in BATCHES.items():
        stage = os.path.join(base, f"stage_{b}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"batch_{b}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))

    table = MergeOnReadTable(
        spark,
        os.path.join(base, "table"),
        keys=["doc_id"],
        precombine="doc_id",
        partition_by=["lang"],
    )
    idx = LSHDedupIndex(
        spark,
        os.path.join(base, "idx"),
        id_col="doc_id",
        text_col="text",
        max_bucket_size=None,
    )

    def gated(df):
        q = quality_score(df, "doc_id", "text")
        df = df.join(q.filter(F.col("quality") >= 0.55).select("doc_id"), "doc_id")
        flags = idx.probe(df)
        return df.join(
            flags.filter(~F.col("is_duplicate")).select("doc_id"), "doc_id"
        )

    calls = {"n": 0}

    def accept(batch):
        if crash_accept_on_batch is not None and calls["n"] == crash_accept_on_batch:
            calls["n"] += 1
            raise InjectedCrash()
        calls["n"] += 1
        return idx.accept(batch)

    def mk_pipe():
        return StreamingUpsertPipeline(
            spark,
            source_dir=src,
            schema=spark.createDataFrame([], SCHEMA).schema,
            table=table,
            checkpoint=os.path.join(base, "ckpt"),
            trigger="1 seconds",
            transform=gated,
            post_commit=accept,
        )

    return mk_pipe, table, idx


def _accepted_ids(table) -> set[int]:
    return {r.doc_id for r in table.read().select("doc_id").collect()}


def test_acceptance_semantics_doc_by_doc(spark, tmp_path):
    mk_pipe, table, idx = _build(spark, tmp_path)
    mk_pipe().run_available()
    assert _accepted_ids(table) == EXPECT_ACCEPTED
    # the index holds exactly the accepted docs' signatures
    assert {r.doc_id for r in idx.signatures().collect()} == EXPECT_ACCEPTED
    # lang partitioning materialized on disk (A10 through the MOR path)
    live = table.read()
    assert {r.lang for r in live.select("lang").distinct().collect()} == {
        "en", "de", "fr",
    }


def test_crash_between_upsert_and_accept_converges(spark, tmp_path):
    """Crash AFTER the MOR commit of batch 1 but BEFORE its signatures
    append — the exact window the probe/accept split leaves open. On
    restart the batch replays: probe passes the rows (no sigs yet), the
    keyed upsert absorbs the re-write, accept lands once. Final state
    must equal the never-crashed run's."""
    mk_pipe, table, idx = _build(spark, tmp_path, crash_accept_on_batch=1)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((InjectedCrash, StreamingQueryException)):
        mk_pipe().run_available()
    # crashed mid-stream: batch 0 accepted; batch 1 rows are IN the table
    # (upsert committed) but not yet vouched for by the index
    assert 1 in _accepted_ids(table)
    mk_pipe().run_available()  # restart from the checkpoint
    assert _accepted_ids(table) == EXPECT_ACCEPTED
    assert {r.doc_id for r in idx.signatures().collect()} == EXPECT_ACCEPTED
    # convergent, not accreted: exactly one signature row per accepted doc
    assert idx.signatures().count() == len(EXPECT_ACCEPTED)


def test_replay_of_identical_batch_is_noop(spark, tmp_path):
    """Re-running the drained pipeline (same checkpoint) processes
    nothing new; re-ingesting the same files under a FRESH checkpoint
    flags every row against its accepted twin and changes nothing."""
    mk_pipe, table, idx = _build(spark, tmp_path)
    mk_pipe().run_available()
    before = sorted((r.doc_id, r.lang) for r in table.read().collect())
    mk_pipe().run_available()  # same checkpoint: no-op
    assert sorted((r.doc_id, r.lang) for r in table.read().collect()) == before
    n_sigs = idx.signatures().count()
    # fresh checkpoint: every doc re-arrives; accepted twins flag their
    # replayed copies EXCEPT the originals themselves (index self-pass),
    # which the keyed upsert then absorbs
    shutil.rmtree(os.path.join(str(tmp_path), "ckpt"))
    mk_pipe().run_available()
    assert sorted((r.doc_id, r.lang) for r in table.read().collect()) == before
    assert idx.signatures().count() == n_sigs


def test_cli_composed_corpus_pipeline(spark, tmp_path):
    """The same composition through the reference-shaped CLI
    (run_pipeline.py): --quality_min gates before --dedup_index_dir
    probes, --table_type mor ingests the survivors. The crafted
    corpus's acceptance story must come out identical to the direct
    composition's."""
    import run_pipeline

    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for b, rows in BATCHES.items():
        stage = str(tmp_path / f"cli_stage_{b}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch_{b}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))

    run_pipeline.main(
        [
            "--source_dir", str(src),
            "--table_path", str(tmp_path / "cli_tbl"),
            "--checkpoint_path", str(tmp_path / "cli_ckpt"),
            "--record_key", "doc_id",
            "--precombine", "doc_id",
            "--partition_fields", "lang",
            "--table_name", "corpus_cli_tbl",
            "--once", "true",
            "--infer_schema", "true",
            "--quality_min", "0.55",
            "--quality_text_field", "text",
            "--dedup_index_dir", str(tmp_path / "cli_idx"),
            "--dedup_text_field", "text",
            "--table_type", "mor",
        ]
    )
    got = {r.doc_id for r in spark.table("corpus_cli_tbl").select("doc_id").collect()}
    assert got == EXPECT_ACCEPTED
