"""Prefix-filter exact-Jaccard join (operators/dedup.py
prefix_filter_candidates — PPJoin-style): the candidate set must be
COMPLETE (every pair at/above the threshold shares a prefix token) and
materially smaller than the quadratic blocked join it replaces."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import prefix_filter_candidates

T = 0.4


def _jac(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def _true_pairs(sets: dict) -> set:
    ids = sorted(sets)
    return {
        (x, y)
        for i, x in enumerate(ids)
        for y in ids[i + 1 :]
        if _jac(sets[x], sets[y]) >= T
    }


def _cands(spark, sets: dict) -> set:
    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in sets.items()], "id long, s array<string>"
    )
    out = prefix_filter_candidates(df, "id", "s", threshold=T)
    return {(r.id_a, r.id_b) for r in out.collect()}


def test_completeness_deterministic(spark):
    sets = {
        1: {"a", "b", "c", "d"},
        2: {"a", "b", "c", "e"},      # J(1,2)=3/5=0.6 >= T
        3: {"x", "y", "z"},
        4: {"x", "y", "w"},           # J(3,4)=2/4=0.5 >= T
        5: {"a", "q", "r", "s", "t"}, # below T with everyone
    }
    cands = _cands(spark, sets)
    assert _true_pairs(sets) <= cands


def test_exact_result_after_verification(spark):
    """Candidates + exact verification == brute force, including NOT
    reporting sub-threshold candidate pairs."""
    sets = {i: {f"w{(i * j) % 7}" for j in range(1, 5)} for i in range(1, 9)}
    cands = _cands(spark, sets)
    verified = {p for p in cands if _jac(sets[p[0]], sets[p[1]]) >= T}
    assert verified == _true_pairs(sets)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(
        keys=st.integers(min_value=1, max_value=30),
        values=st.sets(
            st.sampled_from([f"t{k}" for k in range(12)]), min_size=1, max_size=8
        ),
        min_size=2,
        max_size=10,
    )
)
def test_completeness_property(spark, sets):
    assert _true_pairs(sets) <= _cands(spark, sets)


def test_selectivity_vs_blocked_join(spark, sf_dir):
    """On the documents fixture the prefix filter must emit strictly
    fewer candidates than the lang-blocked quadratic join enumerates."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import dedup as D
    from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import t

    docs = t(spark, sf_dir, "documents")
    sh = D.word_shingles(docs.select("doc_id", "lang", "text"), "doc_id", "text", n=3)
    sets = (
        sh.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("doc_id", "lang")
        .agg(F.collect_set("shingle").alias("s"))
    )
    n_cand = prefix_filter_candidates(
        sets, "doc_id", "s", threshold=0.3, block_col="lang"
    ).count()
    per_lang = sets.groupBy("lang").count().collect()
    blocked_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in per_lang)
    assert 0 < n_cand < blocked_pairs / 2
