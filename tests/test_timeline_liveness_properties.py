"""Property-based check of the cleaner/archiver liveness law (the round-8
ADVICE fix): for ANY commit sequence, after ``clean(keep_last)`` and
``archive_timeline()``, every retained as_of — horizon through head —
must read exactly the reference fold of the commits up to that instant.
The law both services implement: per partition, every owning commit
above the horizon stays consultable, plus the newest owning commit
at/below it.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import TimelineTable

# one commit = a small batch of (key, partition, value) rows
commit_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # key
        st.sampled_from(["a", "b", "c"]),            # partition
        st.integers(min_value=0, max_value=99),      # value
    ),
    min_size=1,
    max_size=4,
)


def _fold(commits, upto):
    """Reference latest-state per (partition, key) over commits 1..upto
    (precombine = the commit index itself, strictly increasing)."""
    state = {}
    for idx, batch in enumerate(commits[:upto], start=1):
        for k, p, v in batch:
            state[(p, k)] = (v, idx)
    return sorted((k, p, v) for (p, k), (v, _i) in state.items())


@given(
    commits=st.lists(commit_batch, min_size=2, max_size=6),
    keep_last=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_every_retained_as_of_reads_after_clean_and_archive(
    spark, tmp_path_factory, commits, keep_last,
):
    path = str(tmp_path_factory.mktemp("tlprop") / "tbl")
    tbl = TimelineTable(
        spark, path, keys=["k"], precombine="ver", partition_by=["p"],
    )
    for idx, batch in enumerate(commits, start=1):
        # dedupe within the batch (last wins) so the fold is deterministic
        rows = {(p, k): (k, p, v) for k, p, v in batch}
        tbl.upsert(spark.createDataFrame(
            [(k, p, v, idx) for k, p, v in rows.values()],
            "k long, p string, v long, ver long",
        ))
    tbl.clean(keep_last=keep_last)
    tbl.archive_timeline()
    horizon = tbl.clean_horizon()
    folded_commits = [
        list({(p, k): (k, p, v) for k, p, v in b}.values()) for b in commits
    ]
    for as_of in range(max(horizon, 1), len(commits) + 1):
        got = sorted(
            (r.k, r.p, r.v) for r in tbl.read(as_of=as_of).collect()
        )
        want = _fold(folded_commits, as_of)
        assert got == want, (
            f"as_of={as_of} horizon={horizon} keep_last={keep_last}: "
            f"{got} != {want}"
        )
