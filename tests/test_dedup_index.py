"""Incremental LSH dedup index (operators/dedup_index.py): pure flag
semantics, persisted probe/ingest lifecycle, idempotent re-ingest, and the
streaming foreachBatch integration (the continuous-ingestion near-dup gate
a training-data pipeline runs in front of its accepted-corpus table)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup_index import (
    LSHDedupIndex,
    incremental_flags,
)

# Long, genuinely-distinct sentences: no accidental band collisions, and
# every doc has >= 3 words so 3-shingling is well-defined.
T_A = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn"
T_B = "colorless green ideas sleep furiously while the committee debates the annual budget report"
T_C = "a distributed query engine shuffles data between executors when joins exceed broadcast thresholds"
T_E = "volcanic islands emerge slowly from the ocean floor as tectonic plates drift apart"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_within_batch_flags(spark):
    batch = _docs(
        spark,
        [(1, T_A), (2, T_B), (3, T_A), (4, T_B), (5, T_C)],
    )
    out = {
        r["doc_id"]: r
        for r in incremental_flags(batch, "doc_id", "text").collect()
    }
    assert len(out) == 5
    # first occurrences survive
    for i in (1, 2, 5):
        assert not out[i]["is_duplicate"] and out[i]["dup_of"] is None
        assert out[i]["est_jaccard"] is None
    # later copies flag against the earliest copy with agreement 1.0
    assert out[3]["is_duplicate"] and out[3]["dup_of"] == 1
    assert out[3]["est_jaccard"] == 1.0
    assert out[4]["is_duplicate"] and out[4]["dup_of"] == 2


def test_probe_against_index_sigs(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import dedup as D

    accepted = _docs(spark, [(1, T_A), (2, T_B)])
    index_sigs = D.minhash_signatures(
        D.word_shingles(accepted, "doc_id", "text", n=3), "doc_id", num_hashes=8
    )
    batch = _docs(spark, [(10, T_A), (11, T_C)])
    out = {
        r["doc_id"]: r
        for r in incremental_flags(
            batch, "doc_id", "text", index_sigs=index_sigs
        ).collect()
    }
    assert out[10]["is_duplicate"] and out[10]["dup_of"] == 1
    assert not out[11]["is_duplicate"]


def test_ingest_lifecycle_and_idempotence(spark, tmp_path):
    idx = LSHDedupIndex(spark, str(tmp_path / "idx"))
    assert idx.size() == 0 and idx.signatures() is None

    # wave 1: all novel
    w1 = _docs(spark, [(1, T_A), (2, T_B), (3, T_C)])
    f1 = {r["doc_id"]: r for r in idx.ingest(w1).collect()}
    assert not any(r["is_duplicate"] for r in f1.values())
    assert idx.size() == 3

    # wave 2: exact copy of an accepted doc, a novel doc, and a
    # within-batch copy of the novel doc
    w2 = _docs(spark, [(4, T_A), (5, T_E), (6, T_E)])
    f2 = {r["doc_id"]: r for r in idx.ingest(w2).collect()}
    assert f2[4]["is_duplicate"] and f2[4]["dup_of"] == 1
    assert not f2[5]["is_duplicate"]
    assert f2[6]["is_duplicate"] and f2[6]["dup_of"] == 5
    assert idx.size() == 4  # only the novel doc entered the index

    # re-ingesting the same wave (crash-replay semantics): docs that flag
    # against OTHER accepted docs still flag, but doc 5 — whose only index
    # match is its OWN accepted signature — passes through as novel
    # (index-side self-pairs are excluded so replays cannot drop rows the
    # keyed upsert already owns), and the idempotent accept does not grow
    # the index
    f3 = {r["doc_id"]: r for r in idx.ingest(w2).collect()}
    assert f3[4]["is_duplicate"] and f3[4]["dup_of"] == 1
    assert not f3[5]["is_duplicate"] and f3[5]["dup_of"] is None
    assert f3[6]["is_duplicate"] and f3[6]["dup_of"] == 5
    assert idx.size() == 4

    # probe is read-only
    idx.probe(_docs(spark, [(7, T_C)])).collect()
    assert idx.size() == 4


def test_near_duplicate_not_just_exact(spark, tmp_path):
    """A genuinely near (not identical) document flags: one changed word
    out of 16 keeps most shingles, so several bands still collide and
    signature agreement clears the 0.5 threshold (deterministic — the
    hash family is md5-derived)."""
    idx = LSHDedupIndex(spark, str(tmp_path / "idx"))
    idx.ingest(_docs(spark, [(1, T_A)]))
    near = T_A.replace("at dawn", "at dusk")
    out = idx.probe(_docs(spark, [(2, near)])).collect()[0]
    assert out["is_duplicate"] and out["dup_of"] == 1
    assert 0.5 <= out["est_jaccard"] < 1.0


def test_plan_no_cartesian_and_bucket_join(spark):
    batch = _docs(spark, [(1, T_A), (2, T_B)])
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import dedup as D

    sigs = D.minhash_signatures(
        D.word_shingles(_docs(spark, [(3, T_C)]), "doc_id", "text", n=3),
        "doc_id",
        num_hashes=8,
    )
    plan = (
        incremental_flags(batch, "doc_id", "text", index_sigs=sigs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_streaming_foreachbatch_gate(spark, tmp_path):
    """File stream -> foreachBatch(index.ingest) -> survivors table: the
    accepted corpus receives each text once across ALL micro-batches."""
    src = str(tmp_path / "src")
    surv_dir = str(tmp_path / "survivors")
    os.makedirs(src)
    idx = LSHDedupIndex(spark, str(tmp_path / "idx"))

    def gate(batch_df, batch_id):
        flags = idx.ingest(batch_df)
        keep = flags.filter(~F.col("is_duplicate")).select("doc_id")
        batch_df.join(keep, "doc_id").write.mode("append").parquet(surv_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # wave 1, then wave 2 after the first drains (one batch per file)
        _docs(spark, [(1, T_A), (2, T_B)]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        _docs(spark, [(3, T_A), (4, T_C)]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    surv = spark.read.parquet(surv_dir)
    assert sorted(r["doc_id"] for r in surv.collect()) == [1, 2, 4]
    assert idx.size() == 3


def test_flags_invariant_under_partitioning(spark):
    """The flag decision is a pure function of content — physical layout
    (input partitioning) must not change any flag, dup_of, or estimate."""
    rows = [
        (1, T_A), (2, T_B), (3, T_A), (4, T_C),
        (5, T_E), (6, T_E), (7, T_B),
    ]
    base = _docs(spark, rows)
    ref = sorted(map(tuple, incremental_flags(base, "doc_id", "text").collect()))
    for n in (1, 3, 16):
        got = sorted(
            map(tuple, incremental_flags(base.repartition(n), "doc_id", "text").collect())
        )
        assert got == ref, f"partitioning {n} changed flags"


def test_delete_reopens_the_slot(spark, tmp_path):
    """A deleted document stops suppressing future near-duplicates: after
    delete, re-ingesting the same text is accepted as novel again."""
    idx = LSHDedupIndex(spark, str(tmp_path / "idx"))
    idx.ingest(_docs(spark, [(1, T_A), (2, T_B)]))
    assert idx.size() == 2

    assert idx.delete(spark.createDataFrame([(1,)], "doc_id long")) == 1
    assert idx.size() == 1
    # unknown ids are a no-op
    assert idx.delete(spark.createDataFrame([(99,)], "doc_id long")) == 0

    flags = {r.doc_id: r for r in idx.ingest(_docs(spark, [(3, T_A)])).collect()}
    assert not flags[3]["is_duplicate"]  # slot reopened
    assert idx.size() == 2


def test_compact_bounds_small_files(spark, tmp_path):
    idx = LSHDedupIndex(spark, str(tmp_path / "idx"))
    for i, t in enumerate((T_A, T_B, T_C, T_E)):
        idx.ingest(_docs(spark, [(i + 1, t)]))  # one appended file each
    files_before = len(
        [f for f in os.listdir(idx._sigs_dir) if f.endswith(".parquet")]
    )
    assert files_before >= 4
    sigs_before = sorted(map(tuple, idx.signatures().collect()))

    assert idx.compact(n_files=2) == files_before
    files_after = len(
        [f for f in os.listdir(idx._sigs_dir) if f.endswith(".parquet")]
    )
    assert files_after <= 2
    assert sorted(map(tuple, idx.signatures().collect())) == sigs_before
    # probing still works on the compacted index
    out = idx.probe(_docs(spark, [(9, T_A)])).collect()[0]
    assert out["is_duplicate"] and out["dup_of"] == 1
