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
