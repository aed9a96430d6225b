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
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import graphstats  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import warehouse  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import geo  # noqa: F401

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
# Round-6 rotation (VERDICT r5 task 1): finish the external-coverage
# rotation. The 42 queries never driver-sampled (every late-r5
# registration) plus the four r5-deferred stale names (agg_salted_skew,
# sort_nulls_ordering, explode_wordcount, fuzzy_match_levenshtein) total
# 46 -- they ALL rotate in. The remaining four slots are the sole-member
# categories whose representative must stay inside the window regardless
# (schema_evolution_union, partition_path_derivation,
# asof_join_forward_tolerance, cdc_change_feed -- each r5-green, so the
# slot doubles as a freshness re-check). Category sentinels again point
# at their family's never-sampled member so sentinel slots double as
# refresh slots (tests/test_registry_order.py names the new set).
# After this round, EVERY pre-r6 registered query has at least one
# driver CORRECTNESS row.
#
# Round-7 rotation (VERDICT r5 task 1, final leg): ALL 39 queries that
# had no driver CORRECTNESS row entering r7 -- the whole late-r6
# registration backlog below -- rotate in, which closes the external
# coverage debt: after r7, EVERY query registered before this window
# froze has at least one driver row. Changed-in-r7 queries are covered:
# the graph family (copurchase distinct-orders fix, ADVICE r7) is
# entirely inside the 39, and rename_evolution_state re-verifies the
# schema-mapping path around the OCC conflict fix. The remaining slots
# are category sentinels whose family has no never-sampled member
# (each r6-green, so the slot doubles as a freshness re-check) plus
# new r7 registrations.
#
# r6 backlog (for the record), registered after the r6 window froze:
#   graph family (NEW category -- point its first sentinel here in r7):
#     graph_degree_histogram, graph_triangle_count,
#     graph_pagerank_3rounds, graph_components_4rounds,
#     graph_jaccard_neighbors
#   statistics family (NEW category): ab_test_welch,
#     chi_square_independence, linreg_normal_equations, woe_decile_bins,
#     mann_whitney_u, ks_two_sample, weekday_seasonality_index
#   training additions: epoch_shuffle_shards, quality_quantile_gate
#   storage addition: secondary_index_lookup
#   Spark-4 SQL surface: recursive_cte_hierarchy (WITH RECURSIVE),
#     sql_udf_revenue (CREATE FUNCTION ... RETURN),
#     collation_group_caseinsensitive (COLLATE UTF8_LCASE)
#   analytics additions: attribution_multi_touch (4 credit models),
#     forecast_backtest_daily (rolling-origin model selection),
#     changepoint_mean_shift (prefix-sum split scan),
#     autocorrelation_daily (ACF at lags 1/7 — exact-decimal moments),
#     revenue_concentration_gini (rank-formula Gini + top-decile share)
#   statistics additions: benford_first_digit (forensic DQ digit screen),
#     survival_kaplan_meier (product-limit time-to-convert under
#     right censoring at a 72h horizon)
#   sketches: hll_sketch_union_estimate (DataSketches HLL partial-merge),
#     approx_quantile_rank_bound (GK sketch re-ranked against raw data)
#   graph addition: graph_khop_reachability (bounded BFS from seed set)
#   training addition: weighted_sample_ares (Efraimidis-Spirtsov
#     hash-keyed weighted sample without replacement, per stratum)
#   similarity: knn_recall_eval (recall@5 of LSH vs brute force; oracle
#     composes the two legs' registered oracle SQLs so it cannot drift)
#   dedup/training: split_leakage_minhash (near-dup pairs straddling the
#     train/test hash split — the post-split leakage audit; composed
#     oracle from the LSH and split rules)
#   statistics: spearman_rank_corr (midrank doubling keeps ranks exact)
#   analytics: impute_group_median (robust feature-prep fill; imputed
#     mean reconstructed in closed form, one pass)
#   relational: distributed_global_rank (exact global rank WITHOUT a
#     single-partition sort — quantile-bucketed, tie-safe by strict
#     comparison; the documented Gini/Spearman 100TB degradation path)
#   text: langid_eval_confusion (per-class precision/recall of the
#     engine's own language-ID heuristic; composed oracle)
#   storage: insert_overwrite_state (replacecommit partition restatement),
#     delete_partition_state (zero-row replacecommit partition erasure),
#     mv_join_incremental (delta-join decomposition JOIN-view refresh),
#     rename_evolution_state (metadata-only column rename via mapping)
# Every rotated-out query remains continuously verified by the local
# DuckDB suite, which runs the WHOLE registry (tests/test_queries_oracle.py).

# Round-8 rotation (VERDICT r7 task 1, closing the coverage ladder):
# the 14 late-r7 registrations — the ONLY queries without a driver
# CORRECTNESS row entering r8 — all rotate in; after this round every
# registered query has at least one driver row. Changed-in-r8 queries
# rotate in per invariant 2: bloom_upsert_fastpath_state +
# insert_overwrite_state + merge_into_state (the bloom sidecar was
# sharded per partition, the probe batched to one job, and the
# superset invariant extended to merge_into/insert_overwrite/evolving
# batches), cdc_before_after_images + stateful_session_machine (the
# ADVICE r7 medium fixes), and approx_aggregates (r1-aged AND gains a
# driver-checkable oracle this round — the registry's last rows-only
# entry retires). Category sentinels point at in-window family members
# (named in tests/test_registry_order.py). The remaining slots are
# freshness re-checks: the entire r2-aged cohort — the 21 queries whose
# only driver row is from round 2, the oldest coverage in the registry.
# New r8 registrations displace freshness fillers (never sentinels or
# backlog names), newest-listed first.

# Round-11 rotation (VERDICT r10 task 1): the freshness floor rises to
# round 5. Two mandatory cohorts fill 41 of the 50 slots: the 8
# post-r10-window registrations (geo x4, url_parse_profile,
# try_safe_parsing, bitmap_exact_distinct, content_sha_manifest — the
# documented backlog, local-gate green since r10) and the ENTIRE
# r4-aged cohort (33 queries, the oldest driver coverage left). The 9
# remaining slots are category sentinels (invariant 1); three of them
# legitimately cover two categories each so every SURVEY §2 family
# keeps a member inside the window:
#   - stateful_running_totals: a real checkpointed STREAMING query
#     running the applyInPandasWithState STATEFUL operator;
#   - mor_incremental: the MOR storage table read through the
#     INCREMENTAL pull path (both storage families in one plan);
#   - graph_assortativity: the GRAPH degree-mixing query whose output
#     is a Pearson correlation — the STATISTICS family computation
#     (both families live in queries/graphstats.py; r9 precedent).
# Pool members double as sentinels where the family overlaps
# (bootstrap_adopted_state = upsert, interval_join_attribution = asof,
# dedup_groups_minhash = dedup, ... — see tests/test_registry_order.py).
# Round-12 rotation (VERDICT r11 task 1): ALL 34 post-r11-window
# registrations rotate in — the entire documented backlog, from
# geo_knn_uncapped to session_path_trigrams. That is the single gap
# between this repo and a fully driver-verified registry (every query
# green on a driver CORRECTNESS row). The backlog itself supplies most
# category sentinels (nbcc=upsert, bitemporal_asof=asof,
# mor_read_optimized=MOR, mv_retractable_cdc=CDC, jaccard_prefix=dedup,
# heaps_law=text, target_encode_loo=training, ohlc=relational-agg,
# label_propagation=graph, bootstrap_ci=statistics, geo_knn_uncapped=geo,
# sql_scripting=sql-surface). Seven fillers hold the families the
# backlog doesn't touch (schema evolution, partitioning,
# streaming+stateful, incremental pull, multimodal, UDTF, sketches) —
# all seven are r11-green so they double as re-checks. The remaining
# slots: two r5-aged freshness picks that double as the relational
# join/window sentinels, r12's own registrations (in-window from birth,
# per the "stop growing the backlog" directive), and r5-aged freshness.
# Round-13 rotation (pure freshness — the documented r12 plan): the
# backlog entering r13 is ZERO, so the window is the entire 36-query
# r5-aged cohort (the oldest driver coverage left; after this round the
# freshness floor rises to r6 for every non-window query), the four
# changed-since-r12-verification queries (invariant 2): the three late-r12
# term-quantization edits (dq_drift_psi, chi_square_independence,
# forecast_backtest_daily — commits 53fad5a/bb288df landed after the r12
# window froze) plus functional_index_autoprune (the r13 OR-disjunct /
# chained-comparison / nondeterministic-bound / TypeError fixes in
# operators/upsert.py — VERDICT r12's one confirmed defect), and
# mor_incremental (operators/mor.py evolved-schema fix re-check, doubling
# as the incremental-pull sentinel). The r5-aged cohort itself supplies
# many sentinels (upsert_partitioned_state = upsert AND partitioning,
# mor_merge_chain = MOR storage, dedup_incremental_index = dedup,
# hybrid_search_rrf = similarity, text_shared_passages = text,
# chi_square_independence = statistics, sql_api_shared_dialect =
# sql-surface, join/window/agg members = the relational families).
# Seven fillers hold the families the cohort doesn't touch (all
# r12-green, so each doubles as a re-check), and the final two slots are
# this round's NEW registrations, in-window from birth:
# multimodal_frame_sample_udtf (stride frame-sampling through a Python
# UDTF LATERAL — covers BOTH the multimodal and UDF/UDTF families, the
# r9/r12 double-cover precedent) and context_pack_nextfit
# (capacity-respecting next-fit sequence packing per distribution
# bucket — the training-family sentinel).
# Round-14 rotation (VERDICT r13 task 4 — MANDATORY): the r13 window froze
# before the r13 optimization sessions, so the ~35 queries those sessions
# restructured have no driver CORRECTNESS row yet; their row-identity rests
# on the repo's own registry gate (which the driver's truncated pytest run
# did not independently confirm). This window rotates in, per invariant 2:
#   - every plan-shape-restructured query from the r13 addendum
#     (ROUND_NOTES.md "changed-query addendum") not sampled in r13,
#   - the two storage changed-path names (secondary_index_lookup,
#     functional_index_prune) and the three MOR/NBCC changed-path names
#     not sampled in r13,
#   - corpus_build_pipeline_v2 (the sf1 global-window rewrite),
#   - the queries this round's optimization sessions touch
#     (graph_label_propagation re-changes with the final-result slot
#     removal; knn_rerank/corpus_build_pipeline restructure;
#     corpus_stream_e2e orchestration),
# and fills the remaining slots with category sentinels for the families
# the changed set doesn't cover (all r13-green, so each doubles as a
# re-check). Restructured members supply most sentinels directly
# (dedup_recall_eval=dedup, knn_rerank=similarity, text_tfidf=text,
# graph_label_propagation=graph, cramers_v=statistics,
# audience_overlap_kmv=sketches, mor_read_optimized_state=MOR,
# rollup_mv_retraction_e2e=CDC, corpus_stream_e2e=streaming,
# importance_reweight_ess=relational-window). The r6-aged freshness
# cohort yields this round to the verification debt (VERDICT: "Invariant
# 2 already requires this"); freshness resumes in r15.
PRIORITY_WINDOW: list[str] = [
    # --- r13-restructured, no driver CORRECTNESS row yet (invariant 2) ---
    "funnel_conversion",
    "session_funnel",
    "text_tfidf_top_term",          # also the text sentinel
    "embedding_matryoshka_eval",
    "graph_pagerank_3rounds",
    "graph_components_4rounds",
    "graph_khop_reachability",
    "knn_lsh",
    "knn_rerank",                   # also the similarity sentinel; r14 restructure
    "knn_ivf_pq",
    "knn_ivf",
    "knn_pq",
    "knn_filtered",
    "audience_overlap_kmv",         # also the sketches sentinel
    "jaccard_prefix_join",
    "dedup_recall_eval",            # also the dedup sentinel
    "cohens_kappa_langid",
    "importance_reweight_ess",      # also the relational-window sentinel
    "mutual_information_features",
    "hilbert_layout_stats",
    "zorder_layout_stats",
    "heaps_law_vocab",
    "cramers_v_association",        # also the statistics sentinel
    "pca_power_iteration",
    "perplexity_band_filter",
    "theil_sen_daily_trend",
    "market_basket_lift",
    "temperature_sample_langs",
    "knn_recall_eval",
    "graph_assortativity",
    "corpus_build_pipeline_v2",
    # --- storage/MOR changed-path (r13 engine work, after the window froze) ---
    "secondary_index_lookup",
    "functional_index_prune",
    "mor_read_optimized_state",     # also the MOR-storage sentinel
    "nbcc_multiwriter_state",
    "rollup_mv_retraction_e2e",     # also the CDC sentinel
    # --- changed (again) by THIS round's optimization sessions ---
    "graph_label_propagation",      # also the graph sentinel
    "corpus_build_pipeline",
    "corpus_stream_e2e",            # also the streaming sentinel
    # --- category-sentinel fillers (families the changed set doesn't
    # cover; all r13-green, so each doubles as a re-check) ---
    "upsert_partitioned_state",     # upsert + partitioning sentinel
    "schema_evolution_union",       # schema-evolution sentinel
    "asof_join_events_orders",      # asof sentinel (r13 construction-only change)
    "stateful_running_totals",      # stateful sentinel
    "mor_incremental",              # incremental-pull sentinel
    "multimodal_frame_sample_udtf", # multimodal + UDF/UDTF sentinel
    "context_pack_nextfit",         # training sentinel
    "q1_pricing_summary",           # relational-agg sentinel (r13 construction-only)
    "join_inner_revenue",           # relational-join sentinel
    "geo_knn_uncapped",             # geo sentinel
    "sql_api_shared_dialect",       # sql-surface sentinel
]

_PRIOR_WINDOW_R13: list[str] = [
    # --- the 36-query r5-aged freshness cohort (floor rises to r6) ---
    "agg_bool_bit",
    "agg_collect_sorted",
    "agg_distinct_having",
    "agg_pivot",                   # also relational-agg sentinel
    "agg_stats",
    "calendar_gap_fill",
    "date_parts",
    "dedup_incremental_index",     # also the dedup sentinel
    "events_outliers_zscore",
    "hybrid_search_rrf",           # also the similarity sentinel
    "join_anti",
    "join_cross",
    "join_full_outer",             # also the relational-join sentinel
    "join_semi",
    "json_extract_props",
    "mor_merge_chain",             # also the MOR-storage sentinel
    "path_transitions",
    "percentiles_exact",
    "posexplode_with_position",
    "regression_price_quantity",
    "resample_locf_daily",
    "retention_cohorts",
    "scalar_date_funcs",
    "scalar_math_cond",
    "scalar_string_funcs2",
    "set_except",
    "set_intersect",
    "sliding_window_agg",
    "sql_api_shared_dialect",      # also the sql-surface sentinel
    "text_shared_passages",        # also the text sentinel
    "time_weighted_avg",
    "unpivot_measures",
    "upsert_partitioned_state",    # also the upsert + partitioning sentinel
    "value_histogram",
    "window_range_frame",
    "window_rank_ntile",           # also the relational-window sentinel
    # --- changed since the r12 verification (invariant 2) ---
    "dq_drift_psi",                # PSI term quantization (53fad5a)
    "chi_square_independence",     # chi-square term quantization; statistics sentinel
    "forecast_backtest_daily",     # error-term quantization (bb288df)
    "functional_index_autoprune",  # r13 autoprune exactness fixes (VERDICT r12)
    "mor_incremental",             # r13 mor.py evolved-schema fix; incremental sentinel
    # --- category-sentinel fillers (families the cohort doesn't cover;
    # all r12-green, so each doubles as a re-check) ---
    "schema_evolution_union",      # schema evolution (r12)
    "bitemporal_asof",             # as-of/interval join (r12)
    "stateful_running_totals",     # streaming + stateful (r12)
    "mv_retractable_cdc",          # CDC (r12)
    "geo_knn_uncapped",            # geo (r12)
    "graph_label_propagation",     # graph (r12)
    "approx_error_bound",          # sketches (r12)
    # --- new r13 registrations (in-window from birth) ---
    "multimodal_frame_sample_udtf",  # multimodal + UDF/UDTF sentinel
    "context_pack_nextfit",          # training sentinel
]

_PRIOR_WINDOW_R12: list[str] = [
    # --- the 34 post-r11-window registrations (invariant 2) ---
    "geo_knn_uncapped",            # also the geo sentinel (ring-expansion kNN)
    "domain_cap_sample",
    "bitmap_distinct_mv_merge",
    "savepoint_restore_state",
    "embedding_matryoshka_eval",
    "mor_read_optimized_state",    # also the MOR-storage sentinel
    "functional_index_prune",
    "bootstrap_ci_mean",           # also the statistics sentinel
    "nbcc_multiwriter_state",      # also the upsert sentinel
    "hilbert_layout_stats",
    "sql_scripting_variables",     # also the sql-surface sentinel
    "ohlc_vwap_daily",             # also the relational-agg sentinel
    "graph_label_propagation",     # also the graph sentinel
    "dp_noised_release",
    "pca_power_iteration",
    "jaccard_prefix_join",         # also the dedup sentinel
    "crypto_shred_erasure",
    "jl_random_projection",
    "mv_retractable_cdc",          # also the CDC sentinel
    "orc_source_roundtrip",
    "exact_quantile_selection",
    "geo_point_in_polygon",
    "rendezvous_shard_rebalance",
    "heaps_law_vocab",             # also the text sentinel
    "feature_store_pit",
    "bitemporal_asof",             # also the as-of/interval-join sentinel
    "ledger_hash_chain",
    "target_encode_loo",           # also the training sentinel
    "rollup_mv_stream_state",
    "session_window_builtin",
    "cohens_kappa_langid",
    "negative_sampling_contrastive",
    "decayed_popularity",
    "session_path_trigrams",
    # --- new r12 registrations (in-window from birth — invariant 2;
    # a query that can't get a driver row in its own round is a
    # backlog, and backlogs stop here per VERDICT r11 task 1) ---
    "rollup_mv_retraction_e2e",    # task 6: delete-aware IVM e2e
    "functional_index_autoprune",  # task 3: plain-filter index pruning
    "importance_reweight_ess",     # temperature-target weights + Kish ESS
    "mutual_information_features", # exact MI / per-cell PMI audit
    "correlation_matrix_onepass",  # k(k-1)/2 Pearson r in ONE scan
    # --- category-sentinel fillers (families the backlog doesn't
    # cover; all r11-green, so each doubles as a re-check) ---
    "schema_evolution_union",      # schema evolution (r11)
    "partition_path_derivation",   # partitioning (r11)
    "stateful_running_totals",     # streaming + stateful (r11)
    "mor_incremental",             # incremental pull path (r11)
    "multimodal_binary_meta",      # multimodal (r11)
    "udtf_sentence_split",         # UDF/UDTF surface (r11)
    "approx_error_bound",          # sketches (r11)
    # --- freshness: r5-aged picks; the first two double as the
    # relational join/window sentinels ---
    "join_broadcast_dim",          # also the relational-join sentinel (r5)
    "knn_ivf_pq",                  # also the similarity sentinel (r5)
    "window_lag_lead",             # also the relational-window sentinel (r5)
    # --- changed-in-r12 re-verification (invariant 2): of the three
    # term-quantization edits, the one with the largest behavioral
    # surface (per-doc entropy over hundreds of token terms; the psi /
    # chi-square edits have tiny-cardinality outputs and are documented
    # for the r13 window alongside the r5-aged freshness cohort) ---
    "text_token_entropy",
]

_PRIOR_WINDOW_R11: list[str] = [
    # --- the 8 post-r10-window registrations (invariant 2) ---
    "geo_grid_density",
    "geo_nearest_site",
    "geo_radius_pairs",            # also the geo sentinel
    "geo_knn_sites",
    "url_parse_profile",           # also the sql-surface sentinel
    "try_safe_parsing",
    "bitmap_exact_distinct",
    "content_sha_manifest",
    # --- freshness: the WHOLE r4-aged cohort (after r11 no query's
    # newest driver row is older than round 5) ---
    "agg_rollup",                  # also the relational-agg sentinel
    "approx_error_bound",          # also the sketches sentinel
    "bm25_search",
    "bootstrap_adopted_state",     # also the upsert sentinel (bootstrap->upsert state)
    "corpus_datasheet",
    "corpus_mix_weights",
    "dedup_groups_minhash",        # also the dedup sentinel
    "dedup_simhash_pairs",
    "dq_expectations_orders",
    "filter_predicates",
    "interval_join_attribution",   # also the as-of/interval-join sentinel
    "join_left_outer",             # also the relational-join sentinel
    "join_right_outer",
    "join_salted_skew",
    "knn_filtered",                # also the similarity sentinel
    "knn_pq",
    "map_json_ops",
    "null_semantics",
    "q12_ship_priority",
    "quality_median_filter",
    "range_join_binned",
    "scalar_string_funcs",
    "set_union_distinct",
    "subquery_in",
    "table_profile",
    "temperature_sample_langs",    # also the training sentinel
    "text_boilerplate_lines",      # also the text sentinel
    "text_hash_embedding",
    "text_pii_redaction",
    "text_repetition",
    "text_unigram_logprob",
    "topk_orders",
    "vocab_top_bigrams",
    # --- category sentinels (each slot doubles as a freshness
    # re-check of an r7-r9-aged member) ---
    "schema_evolution_union",      # schema evolution (r9)
    "partition_path_derivation",   # partitioning (r9)
    "stateful_running_totals",     # streaming + stateful (r9)
    "mor_incremental",             # MOR + incremental storage (r9)
    "cdc_change_feed",             # CDC (r9; incremental_view + cdc_view)
    "multimodal_binary_meta",      # multimodal (r9)
    "udtf_sentence_split",         # UDF/UDTF surface (r8)
    "graph_assortativity",         # graph + statistics (r9)
    "window_running_sum",          # relational-window (r9)
    # Queries registered AFTER this window froze (r11):
    # geo_knn_uncapped, domain_cap_sample, bitmap_distinct_mv_merge,
    # savepoint_restore_state, embedding_matryoshka_eval,
    # mor_read_optimized_state, functional_index_prune,
    # bootstrap_ci_mean, nbcc_multiwriter_state, hilbert_layout_stats,
    # sql_scripting_variables, ohlc_vwap_daily, graph_label_propagation,
    # dp_noised_release, pca_power_iteration, jaccard_prefix_join,
    # crypto_shred_erasure, jl_random_projection, mv_retractable_cdc,
    # orc_source_roundtrip, exact_quantile_selection, geo_point_in_polygon,
    # rendezvous_shard_rebalance, heaps_law_vocab, feature_store_pit,
    # bitemporal_asof, ledger_hash_chain, target_encode_loo,
    # rollup_mv_stream_state, session_window_builtin, cohens_kappa_langid,
    # negative_sampling_contrastive, decayed_popularity, session_path_trigrams —
    # all 34 rotated into the r12 PRIORITY_WINDOW above (VERDICT r11 task 1).
]

_PRIOR_WINDOW_R10: list[str] = [
    # --- changed-in-r10 rotations (invariant 2) ---
    "cume_dist_spend_curve",       # -> distributed_cume_dist (VERDICT r9 #1)
    "xml_source_roundtrip",        # content-fingerprint cache (ADVICE r9)
    "ks_two_sample",               # distributed_running_agg consumer
    "pareto_frontier_orders",      # distributed_running_agg consumer
    "token_shard_packing",         # distributed_prefix_sum consumer; training sentinel
    # --- new r10 registration ---
    "corpus_stream_e2e",           # streamed A1->A12 corpus composition
    # --- freshness: the WHOLE r3-aged cohort (after r10 no query's
    # newest driver row is older than round 4) ---
    "decontaminate_ngrams",
    "dedup_simhash",               # also the dedup sentinel
    "join_inner_revenue",          # also the relational-join sentinel
    "join_theta_range",
    "q1_pricing_summary",          # also the relational-agg sentinel
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_excess_suppliers",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "subquery_correlated",
    "text_stats",                  # also the text sentinel
    "text_tfidf_top_term",
    "window_topk_per_group",       # also the relational-window sentinel
    # --- category sentinels at their family's OLDEST member ---
    "upsert_latest_state",         # upsert (r4-aged)
    "rename_evolution_state",      # schema evolution (r8)
    "zorder_layout_stats",         # partitioning (r7)
    "asof_join_forward_tolerance", # as-of join (r8)
    "tumbling_window_agg",         # streaming (r4-aged)
    "stateful_session_machine",    # stateful (r8)
    "mor_partial_state",           # MOR storage (r8)
    "secondary_index_lookup",      # incremental storage (r7)
    "cdc_before_after_images",     # CDC (r8)
    "knn_ivf",                     # similarity (r4-aged)
    "multimodal_dedup_store_once", # multimodal (r8)
    "applyinpandas_user_trend",    # pandas-UDF surface (r8)
    "graph_components_4rounds",    # graph (r7)
    "ab_test_welch",               # statistics (r7)
    "approx_quantile_rank_bound",  # sketches (r7)
    # --- spare slots: oldest r4-aged headliners ---
    "corpus_build_pipeline",
    "dedup_minhash_lsh",
]

_PRIOR_WINDOW_R9: list[str] = [
    # --- changed-in-r9 rotations (invariant 2): the de-vacuated oracle
    # rows and every query migrated off a global Window/Sort this round ---
    "sql_named_parameters",        # :start_ts rebound into the data range
    "subquery_scalar",             # threshold 2x -> 1.5x avg (non-empty)
    "woe_decile_bins",             # -> distributed_ntile
    "mann_whitney_u",              # -> distributed_rank; also the statistics-adjacent re-check
    "rfm_segmentation",            # -> distributed_ntile x3
    "topk_with_ties",              # -> TakeOrdered threshold plan; also the relational sort/limit re-check
    "token_shard_packing",         # -> distributed_prefix_sum
    "ks_two_sample",               # -> distributed_running_agg cumsums
    "graph_jaccard_neighbors",     # rank<=20 window -> orderBy+limit
    "pareto_frontier_orders",      # skyline -> exclusive running max
    # --- new r9 registrations (enter the window the round they register) ---
    "anova_oneway",                # also the statistics sentinel
    "cramers_v_association",
    "graph_assortativity",         # also the graph sentinel
    "xml_source_roundtrip",        # Spark 4 native XML source
    "map_hof_event_shares",        # map HOF family (transform_values/map_filter)
    "cume_dist_spend_curve",       # the last unpinned ranking window fn
    # --- freshness: the WHOLE r2-aged cohort (oldest driver coverage;
    # after r9 no query's newest driver row is older than round 3) ---
    "agg_cube",                    # also the relational-agg sentinel
    "bloom_filter_join_prune",     # also the relational-join sentinel
    "dedup_exact",                 # also the dedup sentinel
    "dedup_fingerprint",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "embedding_label_centroids",
    "embedding_quantize",
    "inverted_index_postings",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "quota_sample_per_source",
    "sessionize_events",           # also the streaming sentinel
    "stream_dedup_first_seen",
    "text_fingerprints",
    "text_langid",                 # also the text sentinel
    "text_quality",
    "text_token_counts",
    "train_test_split",            # also the training sentinel
    "zorder_morton_keys",
    # --- category sentinels pointed at their family's OLDEST member, so
    # every sentinel slot doubles as a freshness re-check ---
    "upsert_merge_batches",        # upsert (r3-aged)
    "schema_evolution_union",      # schema evolution (r6)
    "partition_path_derivation",   # partitioning (r6)
    "asof_join_events_orders",     # as-of join (r4)
    "stateful_running_totals",     # stateful (r5)
    "mor_incremental",             # MOR storage (r4)
    "incremental_pull",            # incremental storage (r4)
    "cdc_change_feed",             # CDC (r8; freshest family)
    "multimodal_binary_meta",      # multimodal (r5)
    "applyinpandas_group_rank",    # pandas-UDF surface (r5)
    "heavy_hitters_cms",           # sketches (r6)
    "knn_bruteforce",              # similarity (r3)
    "window_running_sum",          # relational-window (r4)
    # --- remaining slot: oldest r3-aged filler ---
    "agg_grouping_sets",
    # r3-aged names NOT fitting this window (next round's freshness
    # pool): q1_pricing_summary, decontaminate_ngrams, dedup_simhash
    # (displaced by the three new r9 registrations),
    # join_inner_revenue, join_theta_range,
    # q2/q4/q6-q22 TPC-H members, subquery_correlated,
    # text_stats, text_tfidf_top_term, window_topk_per_group.
]

# (handled) r8 rotation backlog — all 14 are in PRIORITY_WINDOW above.
# Kept for the round-7 record:
#   warehouse family: scd2_user_state_history, winsorized_segment_stats,
#     stratified_split_assignment, perplexity_band_filter,
#     diversity_kcenter_sample (bounded-round greedy k-center),
#     temporal_tier_attribution (SCD2 interval join)
#   SQL surface: sql_pipe_syntax_pricing (Spark-4 |> pipe dialect)
#   storage: bloom_upsert_fastpath_state (Hudi BLOOM-index insert path)
#   analytics: ltv_cohort_curves (first-purchase cohorts, cumulative
#     decimal revenue by age, per-user normalization)
#   dedup: dedup_recall_eval (LSH recall/precision vs exact-Jaccard
#     truth at the shared 0.5 threshold; composed oracle)
#   storage/CDC: cdc_before_after_images (Hudi 1.0 cdc.enabled /
#     Debezium envelope -- updates carry before_* images)
#   storage/SQL: merge_into_state (ANSI MERGE INTO clause algebra over
#     the on-disk table: conditional update, delete branch, gated
#     insert; full-outer-join oracle)
#   sketches: audience_overlap_kmv (KMV/theta set algebra -- union via
#     (k-1)/theta, intersection via Jaccard scaling; even the sketch
#     error is deterministic and oracle-checked)
#   statistics: theil_sen_daily_trend (median-of-pairwise-slopes robust
#     trend vs OLS on the bounded daily spine)
# plus anything whose implementation changes later in r7 — see
# ROUND_NOTES.md for the tally.


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
