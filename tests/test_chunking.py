"""RAG chunking (operators/text.py chunk_words) + the Python UDTF form
(Spark 4 user-defined table function API): the built-in array expression
is the scale path; the UDTF demonstrates the lateral set-returning API
with row-for-row parity against it."""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.text import chunk_words
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


def test_chunks_cover_every_word_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        df.select(F.explode(chunk_words("text", size=80, overlap=20)).alias("c"))
        .select("c.start_word", "c.chunk_text")
        .collect()
    )
    starts = [r.start_word for r in rows]
    assert starts == [1, 61, 121]  # stride 60 over 200 words
    lens = [len(r.chunk_text.split()) for r in rows]
    assert lens == [80, 80, 80]
    # consecutive chunks share exactly the 20-word overlap
    assert rows[0].chunk_text.split()[60:] == rows[1].chunk_text.split()[:20]
    # every word appears in some chunk
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split())
    assert len(covered) == 200


def test_short_doc_single_chunk_and_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, "only three words")], "doc_id long, text string")
    rows = df.select(F.explode(chunk_words("text", 80, 20)).alias("c")).collect()
    assert len(rows) == 1 and rows[0].c.chunk_text == "only three words"
    with pytest.raises(ValueError):
        chunk_words("text", size=10, overlap=10)


@udtf(returnType="start_word: bigint, chunk_text: string")
class _ChunkUdtf:
    """Python UDTF mirror of chunk_words (size=80, overlap=20)."""

    def eval(self, text: str):
        words = re.split(r"\s+", text.lower())  # Spark split() semantics
        stride, size, overlap = 60, 80, 20
        last = max(len(words) - overlap, 1)
        for start in range(1, last + 1, stride):
            chunk = " ".join(words[start - 1 : start - 1 + size])
            if chunk:
                yield start, chunk


def test_udtf_matches_builtin_chunker(spark, sf_dir):
    """Same chunks from the lateral Python UDTF and the built-in array
    expression — the UDTF is the API demonstration, the expression the
    production path (JVM-side, no Python transfer)."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    spark.udtf.register("chunk_udtf", _ChunkUdtf)
    docs.createOrReplaceTempView("docs_sample")
    via_udtf = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.doc_id, c.start_word, md5(c.chunk_text) AS h "
                "FROM docs_sample d, LATERAL chunk_udtf(d.text) c"
            ).collect(),
        )
    )
    via_expr = sorted(
        map(
            tuple,
            docs.select(
                "doc_id", F.explode(chunk_words("text", 80, 20)).alias("c")
            )
            .select("doc_id", F.col("c.start_word").cast("long"), F.md5("c.chunk_text"))
            .collect(),
        )
    )
    assert via_udtf == via_expr and len(via_udtf) > 0
