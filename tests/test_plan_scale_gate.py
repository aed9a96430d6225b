"""Registry-wide scale-plan gate (VERDICT r8 task 2, hardened r10 per
VERDICT r9 task 2): NO query may run a partition-less Window, an interior
global Sort, or a Window partitioned ONLY by bounded-cardinality keys.

A global ``Window.orderBy`` / interior ``Sort(global=true)`` funnels its
whole input through ONE task — correct at fixture scale, a wall at
100 TB. A window partitioned by a BOUNDED-cardinality expression (a
boolean, ``x % <literal>``, a constant) is the same wall in disguise:
the partition count is fixed while the rows per partition grow with the
data (the r9 ``cume_dist_spend_curve`` two-cohort window slipped past
the partition-less check exactly this way). The engine owns scale-safe
twins (operators/skew.py distributed_rank / distributed_ntile /
distributed_running_agg / distributed_cume_dist and the TakeOrdered
top-k shape), so any of these nodes in a registered plan is a defect
unless deliberately whitelisted.

r10 hardening — the whitelist ASSERTS instead of skipping: each entry
pins the exact offender lines its justification covers, so a
whitelisted query can neither silently grow a second global window nor
keep a stale entry after its plan is fixed.

Detection walks the optimized logical plan (plans._logical_tree — a
direct py4j child walk; toJSON hangs on HOF lambdas). Sort+Limit is
recognized as the logical top-k Spark executes as TakeOrderedAndProject;
the final presentation sort (only project/limit above it) is allowed.
"""

from __future__ import annotations

import gc

import pytest

# part of the pre-commit registry gate: pytest -m registry_gate
pytestmark = pytest.mark.registry_gate

from aws_glue_streaming_etl_with_apache_hudi_spark.plans import (
    bounded_partition_windows,
    global_window_nodes,
    interior_global_sorts,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

#: Queries whose single-task plan nodes are deliberate, with the reason
#: AND the exact offender lines the justification covers. The test
#: asserts equality — a new offender (or a fixed plan) fails the gate
#: until the entry is updated/removed with a fresh justification.
BOUNDED_WINDOW_OK: dict[str, dict] = {
    "autocorrelation_daily": {
        "reason": (
            "lag/ACF windows run on the DAILY aggregate spine (one row "
            "per calendar day) — cardinality fixed by the domain"
        ),
        "expect": [
            "global Window under Sort/Project/Aggregate/Union/Project/Filter",
            "global Window under Sort/Project/Aggregate/Union/Project/Filter",
        ],
    },
    "benford_first_digit": {
        "reason": "share-of-total window runs on 9 first-digit rows",
        "expect": ["global Window under Sort/Project"],
    },
    "changepoint_mean_shift": {
        "reason": "prefix-sum scan runs on the daily spine (one row per day)",
        "expect": [
            "global Window under GlobalLimit/LocalLimit/Sort/Project/Project/Filter",
            "global Window under GlobalLimit/LocalLimit/Sort/Project/Project/Filter/Window",
        ],
    },
    "corpus_build_pipeline_v2": {
        "reason": (
            "temperature share->rate ladder windows run on the "
            "per-language aggregate (one row per language) — cardinality "
            "fixed by the domain; replaced an agg->crossJoin(broadcast) "
            "ladder that re-inlined the corpus groupBy per rung (r13)"
        ),
        "expect": [
            "global Window under Sort/Aggregate/Project/Join/Project/Filter",
            "global Window under Sort/Aggregate/Project/Join/Project/Filter/Window/Project",
        ],
    },
    "daily_new_vs_returning": {
        "reason": "cumulative-distinct cumsum runs on the daily spine",
        "expect": ["global Window under Sort/Project"],
    },
    "fdr_bh_screen": {
        "reason": (
            "BH rank/threshold pass runs on m rows (one per event-type "
            "segment)"
        ),
        "expect": [
            "global Window under Sort/Project/Join",
            "global Window under Sort/Project/Join/Aggregate",
            "global Window under Sort/Project/Join/Aggregate/Window/Project",
        ],
    },
    "hybrid_search_rrf": {
        "reason": (
            "rank windows run AFTER .limit(20) — both frames are 20 "
            "rows by construction"
        ),
        "expect": [
            "global Window under GlobalLimit/LocalLimit/Sort/Project/Join/Project",
            "global Window under GlobalLimit/LocalLimit/Sort/Project/Join/Project",
        ],
    },
    "importance_reweight_ess": {
        "reason": (
            "share/ESS windows run on the per-language count aggregate "
            "(one row per language) — cardinality fixed by the domain; "
            "replaced the r12 agg->crossJoin ladder that re-inlined the "
            "documents groupBy once per consumer (r13)"
        ),
        "expect": [
            "global Window under Sort/Project",
            "global Window under Sort/Project/Window/Project/Project",
            "global Window under Sort/Project/Window/Project/Project/Window/Project/Project",
        ],
    },
    "join_lateral_topk": {
        "reason": (
            "Catalyst's decorrelation of the SQL-standard LATERAL keeps "
            "an interior sort; the query pins dialect parity — the "
            "engine-level shape is window_topk_per_group"
        ),
        "expect": [
            "global Sort under Sort/Project/Join/Project/Filter/Window/Project",
        ],
    },
    "mutual_information_features": {
        "reason": (
            "marginal/total/MI windows run on the |event types| x "
            "|hour bands| cell frame (bounded by the two domains, "
            "~dozens of rows at any scale); the event stream itself is "
            "shuffled exactly once into that frame (r13)"
        ),
        "expect": [
            "global Window under Sort/Project",
            "global Window under Sort/Project/Window/Project/Window/Window",
        ],
    },
    "survival_kaplan_meier": {
        "reason": (
            "product-limit windows run on <=73 rows (hours to the "
            "censoring horizon) — cardinality fixed by the domain"
        ),
        "expect": [
            "global Window under Sort/Project/Filter",
            "global Window under Sort/Project/Filter/Window/Project/Project",
        ],
    },
    "temperature_sample_langs": {
        "reason": (
            "temperature share->rate windows run on the per-language "
            "word-count aggregate (one row per language) — cardinality "
            "fixed by the domain; replaced the broadcast-ladder form "
            "(r13)"
        ),
        "expect": [
            "global Window under Sort/Project/Join/Project/Filter",
            "global Window under Sort/Project/Join/Project/Filter/Window/Project",
        ],
    },
    "window_rank_ntile": {
        "reason": (
            "deliberate native rank/dense_rank/ntile API pin on the "
            "customer dim; the scale-safe twins are "
            "distributed_global_rank and the distributed_ntile users"
        ),
        "expect": [
            "global Window under Sort/Project",
            "global Window under Sort/Project/Window/Project",
        ],
    },
}


def _offenders(df) -> list[str]:
    return sorted(
        global_window_nodes(df)
        + interior_global_sorts(df)
        + bounded_partition_windows(df)
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_single_task_plan_nodes(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    offenders = _offenders(df)
    gc.collect()  # release py4j plan handles promptly (48g driver heap)
    entry = BOUNDED_WINDOW_OK.get(name)
    if entry is not None:
        assert offenders == sorted(entry["expect"]), (
            f"{name}: whitelisted offender set drifted.\n"
            f"  documented: {sorted(entry['expect'])}\n"
            f"  actual:     {offenders}\n"
            "Update BOUNDED_WINDOW_OK with a fresh justification (or drop "
            "the entry if the plan is now clean)."
        )
        return
    assert not offenders, (
        f"{name}: single-partition plan nodes at scale: {offenders} — "
        "use distributed_rank/distributed_ntile/distributed_running_agg/"
        "distributed_cume_dist (operators/skew.py) or orderBy+limit, or "
        "whitelist with a bounded-input justification AND the exact "
        "expected offender lines"
    )


def test_whitelist_names_registered_queries():
    unknown = set(BOUNDED_WINDOW_OK) - set(QUERIES)
    assert not unknown, f"whitelist entries for unregistered queries: {unknown}"


def test_gate_catches_bounded_cardinality_window(spark, sf_dir):
    """Synthetic regression for blind spot (a): a window partitioned by a
    2-value mod expression (the exact r9 cume_dist_spend_curve shape)
    must be flagged even though its partition spec is non-empty."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(F.sum("value").alias("x"))
        .select("user_id", (F.col("user_id") % 2).alias("cohort"), "x")
    )
    df = per_user.select(
        "user_id",
        F.cume_dist().over(W.partitionBy("cohort").orderBy("x")).alias("cd"),
    )
    hits = bounded_partition_windows(df)
    assert hits, "2-value mod-partitioned window must be flagged"
    # boolean partition key — the other constant-domain class
    b = e.select((F.col("value") > 50).alias("flag"), "value")
    df2 = b.select(
        F.row_number().over(W.partitionBy("flag").orderBy("value")).alias("rn")
    )
    assert bounded_partition_windows(df2), "boolean-partitioned window must be flagged"
    # a data-keyed partition must NOT be flagged (no false positives)
    ok = e.select(
        F.row_number().over(W.partitionBy("user_id").orderBy("ts")).alias("rn")
    )
    assert not bounded_partition_windows(ok)


def test_gate_catches_whitelist_growth(spark, sf_dir):
    """Synthetic regression for blind spot (b): if a whitelisted query's
    plan grew a SECOND offender, exact-match comparison fails (the old
    pytest.skip would have waved it through)."""
    name = "window_rank_ntile"
    df = QUERIES[name].fn(spark, sf_dir)
    actual = _offenders(df)
    assert actual == sorted(BOUNDED_WINDOW_OK[name]["expect"])
    grown = actual + ["global Window under <root>"]
    assert sorted(grown) != sorted(BOUNDED_WINDOW_OK[name]["expect"])
