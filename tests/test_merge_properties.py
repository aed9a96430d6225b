"""Property-based check of the MERGE INTO clause algebra (hypothesis):
for arbitrary small targets/sources and a grid of clause configurations,
``UpsertTable.merge_into`` on the on-disk table must equal a pure-Python
reference fold of the SQL:2023 clause semantics — matched delete >
matched update, gated insert, and the BY SOURCE delete/update pair.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable

row = st.tuples(
    st.integers(min_value=0, max_value=5),          # key
    st.sampled_from(["a", "b"]),                    # partition
    st.integers(min_value=0, max_value=99),         # v
)


def _dedupe(rows):
    # one row per (partition, key) — the cardinality rule's precondition;
    # later tuples win so the choice is deterministic
    out = {}
    for k, p, v in rows:
        out[(p, k)] = (k, p, v)
    return list(out.values())


def _reference(target, source, upd_thresh, del_thresh, ins_thresh,
               bys_del_thresh, bys_upd):
    """Pure-Python clause fold. Identity = (p, k) (non-global table)."""
    t = {(p, k): v for k, p, v in target}
    s = {(p, k): v for k, p, v in source}
    out = {}
    for ident, tv in t.items():
        if ident in s:
            sv = s[ident]
            if sv < del_thresh:
                continue                      # WHEN MATCHED ... DELETE
            if sv >= upd_thresh:
                out[ident] = sv               # WHEN MATCHED ... UPDATE
            else:
                out[ident] = tv               # matched, no clause fired
        else:
            if tv < bys_del_thresh:
                continue                      # NOT MATCHED BY SOURCE DELETE
            if bys_upd:
                out[ident] = tv + 1000        # NOT MATCHED BY SOURCE UPDATE
            else:
                out[ident] = tv
    for ident, sv in s.items():
        if ident not in t and sv >= ins_thresh:
            out[ident] = sv                   # WHEN NOT MATCHED ... INSERT
    return sorted((k, p, v) for (p, k), v in out.items())


@given(
    target=st.lists(row, min_size=0, max_size=12),
    source=st.lists(row, min_size=0, max_size=12),
    upd_thresh=st.sampled_from([0, 50]),
    del_thresh=st.sampled_from([0, 10]),     # 0 = delete branch never fires
    ins_thresh=st.sampled_from([0, 50]),
    bys_del_thresh=st.sampled_from([0, 10]),
    bys_upd=st.booleans(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_into_matches_reference_fold(
    spark, tmp_path_factory, target, source, upd_thresh, del_thresh,
    ins_thresh, bys_del_thresh, bys_upd,
):
    target = _dedupe(target)
    source = _dedupe(source)
    if not target:
        return  # empty-target bootstrap path covered by unit tests
    path = str(tmp_path_factory.mktemp("mergeprop") / "tbl")
    tbl = UpsertTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
    )
    tbl.upsert(spark.createDataFrame(
        [(k, p, v, 1) for k, p, v in target], "k long, p string, v long, ver long"
    ))
    src = spark.createDataFrame(
        [(k, p, v, 2) for k, p, v in source], "k long, p string, v long, ver long"
    )
    tbl.merge_into(
        src,
        matched_update={"v": "s.v", "ver": "s.ver"},
        matched_update_condition=f"s.v >= {upd_thresh}",
        matched_delete_condition=f"s.v < {del_thresh}",
        insert_not_matched=True,
        not_matched_condition=f"s.v >= {ins_thresh}",
        not_matched_by_source_delete_condition=f"t.v < {bys_del_thresh}",
        not_matched_by_source_update=(
            {"v": "t.v + 1000"} if bys_upd else None
        ),
    )
    got = sorted((r.k, r.p, r.v) for r in tbl.read().collect())
    want = _reference(target, source, upd_thresh, del_thresh, ins_thresh,
                      bys_del_thresh, bys_upd)
    assert got == want
