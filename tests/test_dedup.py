"""Dedup operator semantics: exact dedup, MinHash-LSH recall against the
exact Jaccard ground truth, SimHash blocking behavior."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import dedup as D
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


def test_exact_dedup_collapses_copies(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello  World"),
            Row(doc_id=2, text="hello world"),  # same after normalization
            Row(doc_id=3, text="different doc"),
        ]
    )
    out = {r.keep_id: r.n_copies for r in D.exact_dedup(df, "text", "doc_id").collect()}
    assert out == {1: 2, 3: 1}


def test_word_shingles_small_docs(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="x y")])
    sh = {(r.doc_id, r.shingle) for r in D.word_shingles(df, "doc_id", "text", n=3).collect()}
    assert sh == {(1, "a b c"), (1, "b c d"), (2, "x y")}


def test_minhash_lsh_finds_planted_near_dups(spark, sf_dir):
    """The fixture plants near-dup pairs (trigram Jaccard > 0.9); LSH with
    8 hashes / bands of 2 must surface them (prob of missing a 0.9-pair:
    (1-0.9^2)^4 ~ 0.1%)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5)
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert len(found) >= 1
    assert all(j >= 0.5 for j in found.values())

    # ground truth: exact all-pairs jaccard >= 0.9 must all be found
    sh = D.word_shingles(docs, "doc_id", "text")
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("s"))
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("s_a"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b"))
    inter = F.size(F.array_intersect("s_a", "s_b")).cast("double")
    union = F.size("s_a") + F.size("s_b") - F.size(F.array_intersect("s_a", "s_b"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("j"))
        .filter(F.col("j") >= 0.9)
    )
    truth_pairs = {(r.id_a, r.id_b) for r in truth.collect()}
    assert truth_pairs, "fixture should contain strong near-dups"
    missed = truth_pairs - set(found)
    assert not missed, f"LSH missed strong pairs: {missed}"


def test_simhash_near_pairs_blocks_and_verifies(spark):
    # SimHash needs enough features for stable bit sums — use ~40-word docs
    # differing in one word vs a disjoint-vocabulary document.
    base = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base + " extraword"),  # near-dup of 1
            Row(doc_id=3, text=" ".join(f"other{i}" for i in range(40))),
        ]
    )
    sims = D.simhash(df, "doc_id", "text", bits=32)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_pairs(sims, "doc_id", bits=32, bands=4, max_hamming=10).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_connected_components_basic(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a BIGINT, id_b BIGINT"
    )
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    # {1,2,3,9} one component (min 1), {5,6} another (min 5)
    assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_connected_components_chain_diameter(spark):
    """A long path graph exercises multi-round propagation (diameter 9)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 1, -1)], "id_a BIGINT, id_b BIGINT"
    )
    # pairs (2,3)..(10,11): one path component over nodes 2..11
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {2}
    assert len(comp) == 10


def test_dedup_survivors_keep_semantics(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id BIGINT")
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "id_a BIGINT, id_b BIGINT")
    out = {r.doc_id: (r.group_id, r.keep) for r in dedup_survivors(docs, pairs).collect()}
    # group {2,4,6}: canonical 2; everyone else a singleton survivor
    assert out[2] == (2, True) and out[4] == (2, False) and out[6] == (2, False)
    for i in (1, 3, 5, 7):
        assert out[i] == (i, True)


def test_hot_bucket_cap_bounds_candidate_explosion(spark):
    """A degenerate bucket (identical-prefix boilerplate docs all landing
    in the same LSH bucket) must not produce m² candidate pairs: buckets
    above max_bucket_size are dropped before the self-join (AQE can split
    the join's work but cannot shrink the pair count)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import (
        cap_bucket_size,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
        simhash_near_pairs,
        word_shingles,
    )

    boiler = "terms of service apply to all users of this website please read"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(200)], "doc_id BIGINT, text STRING"
    )
    sh = word_shingles(docs, "doc_id", "text", n=3)
    bands = lsh_bands(minhash_signatures(sh, "doc_id", num_hashes=8), "doc_id", 8, 2)

    # uncapped: every band bucket holds all 200 docs -> m(m-1)/2 pairs
    assert lsh_candidate_pairs(bands, "doc_id", max_bucket_size=None).count() == 19900
    # capped below the bucket size: the boilerplate bucket is dropped whole
    assert lsh_candidate_pairs(bands, "doc_id", max_bucket_size=50).count() == 0
    # cap above the bucket size: no behavior change
    assert lsh_candidate_pairs(bands, "doc_id", max_bucket_size=500).count() == 19900

    # same guard on the simhash path
    sims = simhash(docs, "doc_id", "text", bits=32)
    assert simhash_near_pairs(sims, "doc_id", max_bucket_size=50).count() == 0
    assert simhash_near_pairs(sims, "doc_id", max_bucket_size=500).count() == 19900

    # the cap must NOT add a shuffle of the banded data: its window count
    # partitions on the same (band, bucket) key the candidate join uses,
    # so the plan reuses one exchange instead of adding a second
    # the cap removes hot-bucket KEYS via a broadcast anti-join against a
    # map-side-combined count — the banded data itself is never sorted
    # (a window count would sort all bands: measured 3x on the minhash
    # headline) and the anti probe adds no shuffle of the bands
    capped_plan = (
        cap_bucket_size(bands, ["band", "bucket"], 50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in capped_plan and "Sort " not in capped_plan
    assert "BroadcastHashJoin" in capped_plan and "LeftAnti" in capped_plan
    assert "partial_count" in capped_plan  # map-side combine of bucket sizes
