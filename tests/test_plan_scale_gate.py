"""Registry-wide scale-plan gate (VERDICT r8 task 2): NO query may run a
partition-less Window or an interior global Sort over unbounded input.

A global ``Window.orderBy`` / interior ``Sort(global=true)`` funnels its
whole input through ONE task — correct at fixture scale, a wall at
100 TB. The engine owns scale-safe twins (operators/skew.py
distributed_rank / distributed_ntile / distributed_running_agg and the
TakeOrdered top-k shape), so a global window in a registered plan is a
defect unless the windowed frame is provably BOUNDED (one row per
day/digit/segment/hour — cardinality fixed by the domain, not the data)
or the query deliberately pins Spark's native API semantics.

Detection walks the optimized logical plan (plans._logical_tree — a
direct py4j child walk; toJSON hangs on HOF lambdas). Sort+Limit is
recognized as the logical top-k Spark executes as TakeOrderedAndProject;
the final presentation sort (only project/limit above it) is allowed.
"""

from __future__ import annotations

import gc

import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.plans import (
    global_window_nodes,
    interior_global_sorts,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

#: Queries whose global window/sort is legitimate, with the reason. Every
#: entry must name WHY the windowed frame cannot grow with the data (or
#: which deliberate API surface it pins).
BOUNDED_WINDOW_OK: dict[str, str] = {
    "autocorrelation_daily": "lag/ACF windows run on the DAILY aggregate spine (one row per calendar day)",
    "benford_first_digit": "share-of-total window runs on 9 first-digit rows",
    "changepoint_mean_shift": "prefix-sum scan runs on the daily spine (one row per day)",
    "daily_new_vs_returning": "cumulative-distinct cumsum runs on the daily spine",
    "fdr_bh_screen": "BH rank/threshold pass runs on m rows (one per event-type segment)",
    "survival_kaplan_meier": "product-limit windows run on <=73 rows (hours to the censoring horizon)",
    "hybrid_search_rrf": "rank windows run AFTER .limit(20) — both frames are 20 rows by construction",
    "join_lateral_topk": (
        "Catalyst's decorrelation of the SQL-standard LATERAL keeps an interior sort; "
        "the query pins dialect parity — the engine-level shape is window_topk_per_group"
    ),
    "window_rank_ntile": (
        "deliberate native rank/dense_rank/ntile API pin on the customer dim; "
        "the scale-safe twins are distributed_global_rank and the distributed_ntile users"
    ),
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_global_window_or_interior_sort(spark, sf_dir, name):
    if name in BOUNDED_WINDOW_OK:
        pytest.skip(f"bounded/deliberate: {BOUNDED_WINDOW_OK[name]}")
    df = QUERIES[name].fn(spark, sf_dir)
    offenders = global_window_nodes(df) + interior_global_sorts(df)
    gc.collect()  # release py4j plan handles promptly (48g driver heap)
    assert not offenders, (
        f"{name}: single-partition plan nodes at scale: {offenders} — "
        "use distributed_rank/distributed_ntile/distributed_running_agg "
        "(operators/skew.py) or orderBy+limit, or whitelist with a "
        "bounded-input justification"
    )


def test_whitelist_names_registered_queries():
    unknown = set(BOUNDED_WINDOW_OK) - set(QUERIES)
    assert not unknown, f"whitelist entries for unregistered queries: {unknown}"
