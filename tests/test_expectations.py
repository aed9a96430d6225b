"""Data-quality expectations (operators/expectations.py): violation
counting on deliberately dirty data, the single-scan plan for aggregate
checks, and NULL/FK semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import expectations as E


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, 10, "A", 5.0),
            (2, 10, "A", -1.0),      # range violation
            (2, None, "B", 3.0),     # duplicate id + null fk
            (3, 99, "Z", 2.0),       # bad fk + bad domain
            (None, 10, "A", 1.0),    # null id
        ],
        "id long, fk long, status string, v double",
    )


def _ref(spark):
    return spark.createDataFrame([(10,), (11,)], "rid long")


def test_violation_counts(spark):
    report = {
        r["check"]: (r["n_violations"], r["passed"])
        for r in E.run_expectations(
            _dirty(spark),
            [
                E.not_null("id"),
                E.unique("id"),
                E.in_range("v", 0.0, 10.0),
                E.accepted_values("status", ["A", "B"]),
                E.references(["fk"], _ref(spark), ["rid"]),
            ],
        ).collect()
    }
    assert report["not_null(id)"] == (1, False)
    assert report["unique(id)"] == (1, False)          # one extra copy of id=2
    assert report["in_range(v, 0.0, 10.0)"] == (1, False)
    assert report["accepted_values(status)"] == (1, False)
    # null fk skipped (SQL FK semantics); only fk=99 dangles
    assert report["references(fk)"] == (1, False)


def test_clean_data_passes_and_nulls_dont_trip_domain_checks(spark):
    clean = spark.createDataFrame(
        [(1, 10, None, 5.0), (2, 11, "A", 0.0)],
        "id long, fk long, status string, v double",
    )
    report = E.run_expectations(
        clean,
        [
            E.not_null("id"),
            E.unique("id"),
            E.in_range("v", 0.0, 10.0),
            E.accepted_values("status", ["A", "B"]),  # NULL is not a violation
            E.matches("status", "^[AB]$"),
            E.references(["fk"], _ref(spark), ["rid"]),
        ],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in report)


def test_aggregate_checks_share_one_scan(spark):
    """Adding aggregate expectations must not add table scans: the plan
    contains exactly ONE scan of the checked frame for all four
    aggregate checks (uniqueness/FK legitimately add their own)."""
    df = _dirty(spark)
    plan = (
        E.run_expectations(
            df,
            [
                E.not_null("id"),
                E.not_null("fk"),
                E.in_range("v", 0.0, 10.0),
                E.accepted_values("status", ["A", "B"]),
            ],
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LogicalRDD") == 1
