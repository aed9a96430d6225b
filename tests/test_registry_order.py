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
    # round-12 rotation: the 34-query r11 backlog supplies most
    # sentinels directly; seven fillers hold the families the backlog
    # doesn't touch (see queries/__init__.py for the rationale).
    "upsert": "nbcc_multiwriter_state",   # zero-abort multi-writer upsert
    "schema_evolution": "schema_evolution_union",
    "partitioning": "partition_path_derivation",
    "asof": "bitemporal_asof",            # the as-of/interval join family
    "streaming": "stateful_running_totals",  # real checkpointed stream...
    "stateful": "stateful_running_totals",   # ...running applyInPandasWithState
    "storage_mor": "mor_read_optimized_state",
    "storage_incremental": "mor_incremental",  # the incremental pull path
    "storage_cdc": "mv_retractable_cdc",  # CDC-fed delete-aware IVM
    "dedup": "jaccard_prefix_join",       # exact-Jaccard PPJoin
    "similarity": "knn_ivf_pq",
    "text": "heaps_law_vocab",
    "multimodal": "multimodal_binary_meta",
    "training": "target_encode_loo",
    "udf": "udtf_sentence_split",
    "relational_agg": "ohlc_vwap_daily",
    "relational_join": "join_broadcast_dim",
    "relational_window": "window_lag_lead",
    "graph": "graph_label_propagation",
    "statistics": "bootstrap_ci_mean",
    "sketches": "approx_error_bound",
    "geo": "geo_knn_uncapped",
    "sql_surface": "sql_scripting_variables",
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
