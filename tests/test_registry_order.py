"""Registry-order invariant (VERDICT r1 #1).

The external correctness harness samples a prefix of the registry in
iteration order (round 1: exactly the first 50 entries). This test pins the
invariant that the first 50 entries cover every query category, so a future
registration can't silently push the pipeline/storage/streaming/north-star
surface back out of the verified window.
"""

from __future__ import annotations

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import PRIORITY_WINDOW, QUERIES

WINDOW = 50

# one representative name per category that MUST sit inside the window.
# The representative may rotate (any member of the category holds the
# line) — round 4 points several at this round's changed queries so a
# sentinel slot doubles as a re-verification slot.
CATEGORY_SENTINELS = {
    # round-11 rotation: the r4-aged freshness cohort supplies most
    # sentinels directly; three explicit slots each cover two
    # overlapping families (streaming+stateful, MOR+incremental,
    # graph+statistics — see queries/__init__.py for the rationale).
    "upsert": "bootstrap_adopted_state",  # bootstrap commit -> upsert commit state
    "schema_evolution": "schema_evolution_union",
    "partitioning": "partition_path_derivation",
    "asof": "interval_join_attribution",  # the as-of/interval join family
    "streaming": "stateful_running_totals",  # real checkpointed stream...
    "stateful": "stateful_running_totals",   # ...running applyInPandasWithState
    "storage_mor": "mor_incremental",        # MOR table read through...
    "storage_incremental": "mor_incremental",  # ...the incremental pull path
    "storage_cdc": "cdc_change_feed",
    "dedup": "dedup_groups_minhash",
    "similarity": "knn_filtered",
    "text": "text_boilerplate_lines",
    "multimodal": "multimodal_binary_meta",
    "training": "temperature_sample_langs",
    "udf": "udtf_sentence_split",
    "relational_agg": "agg_rollup",
    "relational_join": "join_left_outer",
    "relational_window": "window_running_sum",
    "graph": "graph_assortativity",       # degree-mixing query whose...
    "statistics": "graph_assortativity",  # ...output IS a Pearson correlation
    "sketches": "approx_error_bound",
    # new SURVEY §2 rows (r10) get standing sentinels of their own:
    "geo": "geo_radius_pairs",
    "sql_surface": "url_parse_profile",
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
