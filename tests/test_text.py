"""Text analysis operators: stats, quality bounds, langid determinism,
fingerprint stability."""

from __future__ import annotations

from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import text as X
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


def test_text_stats_values(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="the hash table hash")])
    r = X.text_stats(df, "doc_id", "text").collect()[0]
    assert r.n_words == 4
    assert r.n_distinct == 3
    assert r.n_chars == 19
    assert r.filler_ratio == 0.75  # 'hash' x2 + 'table' of 4 words


def test_quality_score_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = X.quality_score(docs, "doc_id", "text").collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)


def test_langid_deterministic_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out1 = sorted((r.doc_id, r.predicted_lang) for r in X.predict_language(docs, "doc_id", "text").collect())
    out2 = sorted((r.doc_id, r.predicted_lang) for r in X.predict_language(docs, "doc_id", "text").collect())
    assert out1 == out2
    assert len(out1) == docs.count()
    assert {lang for _, lang in out1} <= set(X.LANG_MARKERS)


def test_fingerprint_shift_robustness(spark):
    """The winnowing min-gram hash survives a prefix insertion (unlike the
    full-content hash) as long as the original minimal 8-gram remains."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="abcdefghijklmnop"), Row(doc_id=2, text="ZZZabcdefghijklmnop")]
    )
    rows = {r.doc_id: r for r in X.doc_fingerprints(df, "doc_id", "text").collect()}
    assert rows[1].content_md5 != rows[2].content_md5
    assert rows[1].winnow_min >= rows[2].winnow_min  # superset of grams => min can only drop


def test_corpus_vocab_counts_and_order(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b c"),
            Row(doc_id=2, text="a b x"),
            Row(doc_id=3, text="z"),  # single word: no bigram, filtered
        ]
    )
    rows = X.corpus_vocab(df, "doc_id", "text", n=2, k=10).collect()
    got = [(r.gram, r.total_count, r.doc_freq) for r in rows]
    # "a b": doc1 twice + doc2 once = 3 total / 2 docs; ties break on gram asc
    assert got[0] == ("a b", 3, 2)
    assert ("b a", 1, 1) in got and ("b c", 1, 1) in got and ("b x", 1, 1) in got
    assert all(g != "" for g, _, _ in got)
    # the 1-word doc contributes NOTHING — no truncated "z" pseudo-bigram
    # (code-review regression)
    assert all(" " in g for g, _, _ in got)
    totals = [r.total_count for r in rows]
    assert totals == sorted(totals, reverse=True)


def test_corpus_vocab_topk_plan(spark, sf_dir):
    """Top-k must be a TakeOrderedAndProject (per-partition heaps), not a
    global sort of the whole vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    plan = X.corpus_vocab(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_line_ratio_detects_shared_lines(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " unique1 u2 u3 u4 u5 u6 u7 u8"),
            Row(doc_id=2, text=shared + " other1 o2 o3 o4 o5 o6 o7 o8"),
            Row(doc_id=3, text="totally different words here now ok fine yes"),
        ]
    )
    rows = {r.doc_id: r for r in X.boilerplate_line_ratio(df, "doc_id", "text").collect()}
    assert rows[1].n_lines == 2 and rows[1].n_boilerplate == 1
    assert rows[1].boilerplate_ratio == 0.5
    assert rows[2].n_boilerplate == 1
    assert rows[3].n_boilerplate == 0 and rows[3].boilerplate_ratio == 0.0


def test_boilerplate_duplicate_lines_within_doc_count_once(spark):
    """A line repeated INSIDE one document must not make it 'cross-document'
    boilerplate: per-doc lines are distinct'd before the corpus count."""
    line = "r1 r2 r3 r4 r5 r6 r7 r8"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=line + " " + line),  # same line twice, one doc
            Row(doc_id=2, text="x1 x2 x3 x4 x5 x6 x7 x8"),
        ]
    )
    rows = {r.doc_id: r for r in X.boilerplate_line_ratio(df, "doc_id", "text").collect()}
    assert rows[1].n_lines == 1  # distinct within the doc
    assert rows[1].n_boilerplate == 0  # only one DOC carries it


def test_hashed_embedding_feeds_vector_operators(spark, sf_dir):
    """The hashing-trick vectorizer output is a drop-in embedding: dense,
    fixed-dim, usable by knn_bruteforce directly; exact duplicates of a
    text map to identical vectors."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import similarity as S
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.text import hashed_embedding
    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    emb = hashed_embedding(docs, "doc_id", "text", dim=64)
    rows = emb.collect()
    assert all(len(r.embedding) == 64 for r in rows)
    assert any(any(v != 0 for v in r.embedding) for r in rows)

    out = S.knn_bruteforce(
        emb, emb.filter("doc_id < 3"), id_col="doc_id", vec_col="embedding", k=3
    )
    got = out.collect()
    assert got and all(r.rnk <= 3 for r in got)

    # same text -> same vector (pure function of content)
    two = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "alpha beta beta gamma")],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.embedding for r in hashed_embedding(two, "doc_id", "text").collect()}
    assert vecs[1] == vecs[2]


def test_shared_passage_pairs_detects_copied_passage(spark):
    """The winnowing guarantee: a shared substring of length >=
    gram+window-1 (23 chars here) yields identical fingerprints in both
    docs — globally dissimilar documents sharing one passage collide;
    unrelated documents do not."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.text import shared_passage_pairs, winnow_fingerprints

    passage = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, "completely unrelated opening text here. " + passage + " and a different ending altogether."),
            (2, "some other framing words first; " + passage + " then totally different closing material."),
            (3, "nothing in common with the others at all, just plain filler content about engines and joins."),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.shared_fps
        for r in shared_passage_pairs(docs, "doc_id", "text", min_shared=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert not any(3 in p for p in pairs)

    # fingerprint density ~ len/window: a 400-char doc yields a bounded set
    n_fps = winnow_fingerprints(
        docs.filter("doc_id = 1"), "doc_id", "text", gram=8, window=16
    ).count()
    assert 0 < n_fps < 120


def test_bm25_ranks_term_density_and_plan_is_broadcast(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "hash hash hash join filter"),          # dense in 'hash'
            (2, "hash appears once in this much longer document about many other things entirely"),
            (3, "nothing relevant here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in bm25_scores(docs, "doc_id", "text", ["hash"]).collect()}
    # non-matching doc absent; high-tf short doc outranks low-tf long doc
    assert set(out) == {1, 2}
    assert out[1] > out[2] > 0
    plan = (
        bm25_scores(docs, "doc_id", "text", ["hash"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # corpus stats join is a broadcast of the 1-row aggregate
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
