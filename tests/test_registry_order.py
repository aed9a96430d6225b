"""Registry-order invariant (VERDICT r1 #1).

The external correctness harness samples a prefix of the registry in
iteration order (round 1: exactly the first 50 entries). This test pins the
invariant that the first 50 entries cover every query category, so a future
registration can't silently push the pipeline/storage/streaming/north-star
surface back out of the verified window.
"""

from __future__ import annotations

import pytest

# part of the pre-commit registry gate: pytest -m registry_gate
pytestmark = pytest.mark.registry_gate

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import PRIORITY_WINDOW, QUERIES

WINDOW = 50

# one representative name per category that MUST sit inside the window.
# The representative may rotate (any member of the category holds the
# line) — round 4 points several at this round's changed queries so a
# sentinel slot doubles as a re-verification slot.
CATEGORY_SENTINELS = {
    # round-14 rotation (VERDICT r13 task 4): the window is the
    # r13-restructured verification debt, so those queries supply most
    # sentinels directly; eleven r13-green fillers hold the families the
    # changed set doesn't touch (see queries/__init__.py).
    "upsert": "upsert_partitioned_state",  # partitioned upsert state
    "schema_evolution": "schema_evolution_union",
    "partitioning": "upsert_partitioned_state",  # Hive partition-path tokens
    "asof": "asof_join_events_orders",    # the as-of/interval join family
    "streaming": "corpus_stream_e2e",     # end-to-end checkpointed stream
    "stateful": "stateful_running_totals",  # applyInPandasWithState
    "storage_mor": "mor_read_optimized_state",  # MOR read-optimized view
    "storage_incremental": "mor_incremental",  # incremental pull + r13 mor fix
    "storage_cdc": "rollup_mv_retraction_e2e",  # CDC retraction fold e2e
    "dedup": "dedup_recall_eval",         # dedup eval (r13 restructured)
    "similarity": "knn_rerank",           # two-stage ANN (r13+r14 restructured)
    "text": "text_tfidf_top_term",        # r13 restructured
    "multimodal": "multimodal_frame_sample_udtf",  # frame sampling...
    "udf": "multimodal_frame_sample_udtf",         # ...through a UDTF LATERAL
    "training": "context_pack_nextfit",   # capacity-respecting packing
    "relational_agg": "q1_pricing_summary",
    "relational_join": "join_inner_revenue",
    "relational_window": "importance_reweight_ess",  # global-window sums
    "graph": "graph_label_propagation",
    "statistics": "cramers_v_association",  # r13 restructured
    "sketches": "audience_overlap_kmv",   # KMV sketch (r13 restructured)
    "geo": "geo_knn_uncapped",
    "sql_surface": "sql_api_shared_dialect",
}


def test_priority_window_is_prefix():
    names = list(QUERIES)
    assert names[: len(PRIORITY_WINDOW)] == PRIORITY_WINDOW


def test_priority_window_exactly_fills_driver_sample():
    """The driver samples exactly the first 50 registry entries: a
    window shorter than 50 wastes externally-verified slots, a longer
    one silently pushes its tail outside verification."""
    assert len(PRIORITY_WINDOW) == WINDOW
    assert len(set(PRIORITY_WINDOW)) == len(PRIORITY_WINDOW)


def test_every_category_inside_first_50():
    head = set(list(QUERIES)[:WINDOW])
    missing = {cat: n for cat, n in CATEGORY_SENTINELS.items() if n not in head}
    assert not missing, f"categories outside the driver window: {missing}"


def test_no_query_lost_by_reorder():
    # reorder is a permutation: same names, no dupes, same count as before
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert len(names) >= 113
