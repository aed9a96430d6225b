"""The engine's declared query surface (SURVEY.md §2 Part B).

Every entry is a named, deterministic query over the fixture tables
(TESTDATA.md), exposed through ``__spark_entry__.py`` to the driver:

- ``QUERIES[name].fn(spark, sf_dir) -> DataFrame``  — the Spark plan.
- ``QUERIES[name].sql``                              — the ANSI-SQL oracle
  DuckDB runs on the same parquet (None for non-SQL-expressible ops; the
  driver then records a weaker rows-only check).
- ``QUERIES[name].headline``                         — included in bench.py.

Determinism contract (FIXTURES.md): every query imposes a total order,
rounds floats to a fixed precision, and aliases every computed column
identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import QUERIES, Query, register
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import relational  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import relational2  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import relational3  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import tpch_more  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import tpch_more2  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import pipeline  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import storage  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import timelineq  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import northstar  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import training  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import analytics  # noqa: F401

# ---------------------------------------------------------------------------
# Registry ordering.
#
# External correctness harnesses sample the registry in iteration order and
# may only cover a prefix of it (rounds 1-2 covered exactly the first 50
# entries). The priority window rotates PER ROUND so every query eventually
# gets an external CORRECTNESS row, under two standing invariants
# (tests/test_registry_order.py):
#   1. at least one sentinel from EVERY SURVEY.md §2 category stays inside
#      the first 50 (a category can never silently lose external coverage);
#   2. queries whose implementation changed since the last verified round
#      are rotated IN.
# Round-4 rotation (VERDICT r3 task 3): never-externally-verified queries
# outrank stale ones, stale (r1-only) outrank recently-green. In: every
# query whose implementation or oracle changed this round (q12's recast
# oracle, knn_ivf's literal-centroid oracle, the four bucket-capped dedup
# queries, new mor_incremental / approx_error_bound), the four queries
# ADDED this round (join_right_outer, text_pii_redaction,
# text_unigram_logprob, corpus_mix_weights — zero driver rows yet),
# text_repetition + map_json_ops (never sampled), and 25 of the 41
# r1-stale relational/scalar queries. Deferred to r5, each with an
# in-window sibling of the same family: join_cross, join_semi,
# set_intersect, set_except, scalar_string_funcs2, date_parts,
# agg_bool_bit, agg_pivot, unpivot_measures, posexplode_with_position,
# subquery_scalar, agg_collect_sorted, sql_api_shared_dialect,
# window_rank_ntile, percentiles_exact, plus rows-only approx_aggregates
# (its hard signal now rides approx_error_bound). Each category keeps a
# sentinel. All queries remain continuously verified by the local DuckDB
# suite, which runs the WHOLE registry (tests/test_queries_oracle.py).

PRIORITY_WINDOW: list[str] = [
    # category sentinels (r3-green; hold the category's external signal)
    "upsert_latest_state",
    "schema_evolution_union",
    "partition_path_derivation",
    "asof_join_events_orders",
    "tumbling_window_agg",
    "stateful_running_totals",
    "incremental_pull",
    "cdc_change_feed",
    "multimodal_binary_meta",
    "corpus_build_pipeline",
    "applyinpandas_group_rank",
    # changed/new this round — must re-verify
    "q12_ship_priority",        # oracle recast to BIGINT (r3's one red row)
    "knn_ivf",                  # literal-centroid variant + first oracle
    "dedup_minhash_lsh",        # hot-bucket cap (operator + oracle)
    "dedup_groups_minhash",     # rides the capped pair pipeline
    "dedup_simhash_pairs",      # hot-bucket cap (operator + oracle)
    "dedup_embedding_cosine",   # hot-bucket cap (operator + oracle)
    "mor_incremental",          # NEW: on-disk MOR pull across compaction
    "approx_error_bound",       # NEW: sketch error bound, hard signal
    # never sampled / oracle never sampled / added this round
    "text_repetition",
    "map_json_ops",
    "join_right_outer",
    "text_pii_redaction",
    "text_unigram_logprob",
    "corpus_mix_weights",
    # added later in round 4 (never externally verified -> outrank stale;
    # each pre-verified at sf0.01 via tests/oracle_utils.compare_query)
    "vocab_top_bigrams",
    "text_boilerplate_lines",
    "interval_join_attribution",
    "join_salted_skew",
    "knn_filtered",
    "quality_median_filter",
    "table_profile",
    "corpus_datasheet",
    "dedup_incremental_index",  # NEW: continuous-ingestion near-dup gate
    # (displaces fuzzy_match_levenshtein to r5; its string-distance
    # family keeps scalar_string_funcs as the in-window sibling)
    "bootstrap_adopted_state",  # NEW: on-disk metadata-only bootstrap
    # (displaces regression_price_quantity to r5; its stats family keeps
    # table_profile + corpus_datasheet as in-window siblings)
    "range_join_binned",        # NEW: pure range join via binning
    # (displaces join_anti to r5; join family keeps join_left_outer,
    # join_right_outer, join_broadcast_dim, join_salted_skew in-window)
    "knn_pq",                   # NEW: product-quantization ANN
    # (displaces window_lag_lead to r5; window family keeps its
    # window_running_sum sentinel in-window)
    "text_hash_embedding",      # NEW: feature-hashing vectorizer
    # (displaces agg_distinct_having to r5; agg family keeps its
    # agg_rollup sentinel in-window)
    "temperature_sample_langs", # NEW: alpha-sampling language rebalance
    # (displaces scalar_date_funcs to r5; scalar family keeps
    # scalar_string_funcs in-window)
    "bm25_search",              # NEW: Okapi BM25 ranked retrieval
    # (displaces calendar_gap_fill to r5; its gap-fill/stats family
    # keeps table_profile + corpus_datasheet in-window)
    "dq_expectations_orders",   # NEW: data-quality expectations gate
    # (displaces join_broadcast_dim to r5; join family keeps
    # join_left_outer, join_right_outer, join_salted_skew,
    # range_join_binned in-window)
    # the r1-stale relational/scalar core rotation (7 deferred to r5 to
    # make room for the new queries above, each deferred name keeping an
    # in-window family sibling: agg_stats->agg_rollup,
    # join_full_outer->join_left_outer/join_anti,
    # window_range_frame->window_running_sum/window_lag_lead,
    # sort_nulls_ordering->topk_orders,
    # scalar_math_cond->scalar_string_funcs/scalar_date_funcs,
    # explode_wordcount->json_extract_props + the new explode-based pair,
    # agg_salted_skew->join_salted_skew,
    # json_extract_props->map_json_ops — deferred late for corpus_datasheet)
    "filter_predicates",
    "agg_rollup",
    "join_left_outer",
    "window_running_sum",
    "topk_orders",
    "set_union_distinct",
    "scalar_string_funcs",
    "subquery_in",
    "null_semantics",
]


def _apply_priority_order() -> None:
    missing = [n for n in PRIORITY_WINDOW if n not in QUERIES]
    if missing:  # fail loudly at import: a renamed query must update the window
        raise KeyError(f"PRIORITY_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY_WINDOW}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()

__all__ = ["QUERIES", "PRIORITY_WINDOW", "Query", "register"]
