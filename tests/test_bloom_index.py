"""Partition key blooms (Hudi BLOOM-index analogue, operators/upsert.py):
the insert fast path must append without rewriting, never duplicate a
key, and stay replay-safe through the sidecar-first crash window."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def _state(table):
    return sorted((r.k, r.part, r.v, r.ver) for r in table.read().collect())


def _files(table, part):
    return sorted(
        os.path.basename(f)
        for f in glob.glob(os.path.join(table.path, f"part={part}", "*.parquet"))
    )


@pytest.fixture
def table(spark, tmp_path):
    return UpsertTable(
        spark=spark,
        path=str(tmp_path / "bloomtbl"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        bloom_index=True,
    )


def test_fresh_keys_take_insert_path_without_rewrite(spark, table):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    before_a = _files(table, "a")
    assert len(before_a) >= 1

    # all-new keys into an existing partition: append, never rewrite
    table.upsert(_rows(spark, [(3, "a", "z", 1)]))
    after_a = _files(table, "a")
    assert set(before_a) <= set(after_a), "insert path must not rewrite old files"
    assert len(after_a) > len(before_a), "insert path must append a new file"
    assert _state(table) == [(1, "a", "x", 1), (2, "b", "y", 1), (3, "a", "z", 1)]


def test_existing_key_takes_merge_path_no_duplicates(spark, table):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))  # same key: merge path
    assert _state(table) == [(1, "a", "x2", 2)]
    # and a mixed batch: partition a has an existing key (merge), b is new
    table.upsert(_rows(spark, [(1, "a", "x3", 3), (9, "b", "w", 1)]))
    assert _state(table) == [(1, "a", "x3", 3), (9, "b", "w", 1)]


def test_bloom_equivalence_with_plain_table(spark, tmp_path):
    """Same upsert sequence, bloom on vs off: identical final states."""
    plain = UpsertTable(spark=spark, path=str(tmp_path / "plain"), keys=["k"],
                        precombine="ver", partition_by=["part"])
    bloom = UpsertTable(spark=spark, path=str(tmp_path / "bloom"), keys=["k"],
                        precombine="ver", partition_by=["part"], bloom_index=True)
    batches = [
        [(1, "a", "x", 1), (2, "b", "y", 1)],
        [(3, "a", "z", 1), (4, "c", "q", 1)],       # fresh keys -> fast path
        [(1, "a", "x2", 2), (5, "a", "r", 1)],      # mixed update+insert
        [(2, "b", "OLD", 0)],                        # stale precombine loses
        [(6, "b", "s", 1)],                          # fresh again
    ]
    for b in batches:
        plain.upsert(_rows(spark, b))
        bloom.upsert(_rows(spark, b))
    assert _state(plain) == _state(bloom)


def test_replay_after_bloom_save_crash_is_idempotent(spark, table, monkeypatch):
    """Crash between the sidecar save and the data write: the bloom now
    holds the batch's bits (phantoms). The streaming replay of the SAME
    batch must take the merge path and converge without duplicates."""
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))

    class Boom(RuntimeError):
        pass

    # crash the DATA write itself (the fast path appends directly, so
    # the parquet writer — not _write — is the boundary after the
    # sidecar save)
    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet

    def crashing_parquet(self, *a, **kw):
        raise Boom()

    monkeypatch.setattr(DataFrameWriter, "parquet", crashing_parquet)
    with pytest.raises(Boom):
        table.upsert(_rows(spark, [(2, "a", "y", 1)]))
    monkeypatch.setattr(DataFrameWriter, "parquet", orig_parquet)

    # bits are already in the sidecar -> replay probes "maybe present"
    blooms = table._bloom_load()
    assert table._bloom_definitely_new(
        _rows(spark, [(2, "a", "y", 1)]), [("a",)], blooms
    ) == []
    table.upsert(_rows(spark, [(2, "a", "y", 1)]))  # the replay
    assert _state(table) == [(1, "a", "x", 1), (2, "a", "y", 1)]
    table.upsert(_rows(spark, [(2, "a", "y", 1)]))  # replay again
    assert _state(table) == [(1, "a", "x", 1), (2, "a", "y", 1)]


def test_delete_keeps_bits_reinsert_merges(spark, table):
    """Deletes never clear bits (monotone superset), so re-inserting a
    deleted key takes the merge path — correct, just not fast."""
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1)]))
    table.delete(spark.createDataFrame([Row(k=1, part="a")]))
    assert _state(table) == [(2, "a", "y", 1)]
    table.upsert(_rows(spark, [(1, "a", "x2", 2)]))
    assert _state(table) == [(1, "a", "x2", 2), (2, "a", "y", 1)]


def test_schema_evolution_batch_falls_back_to_merge(spark, table):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    evolved = spark.createDataFrame([Row(k=2, part="a", v="y", ver=1, extra=7)])
    table.upsert(evolved)  # new column: merge path, realigned rewrite
    got = {r.k: (r.v, r["extra"]) for r in table.read().collect()}
    assert got == {1: ("x", None), 2: ("y", 7)}
    # post-evolution fast path works against the widened schema
    table.upsert(spark.createDataFrame([Row(k=3, part="a", v="z", ver=1, extra=8)]))
    assert {r.k for r in table.read().collect()} == {1, 2, 3}


def test_saturated_partition_skips_fast_path_until_rebuild(spark, table, monkeypatch):
    monkeypatch.setattr(UpsertTable, "_BLOOM_M", 64)  # force saturation
    table.upsert(_rows(spark, [(i, "a", f"v{i}", 1) for i in range(60)]))
    blooms = table._bloom_load()
    tok = table._stat_key(("a",))
    assert blooms[tok]["saturated"] is True
    # saturated -> probe refuses the fast path outright
    assert table._bloom_definitely_new(
        _rows(spark, [(999, "a", "n", 1)]), [("a",)], blooms
    ) == []
    table.upsert(_rows(spark, [(999, "a", "n", 1)]))  # merge path, correct
    assert len(_state(table)) == 61
    # maintenance rebuild (still tiny m -> still saturated) keeps working
    assert table.rebuild_bloom() == 1


def test_rebuild_bloom_sheds_false_positives(spark, table):
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "a", "y", 1), (7, "b", "k", 1)]))
    table.delete(spark.createDataFrame([Row(k=1, part="a"), Row(k=2, part="a")]))
    table.upsert(_rows(spark, [(3, "a", "z", 1)]))
    assert table.rebuild_bloom() == 2
    blooms = table._bloom_load()
    # after rebuild only key 3 is in the filter: keys 1/2 probe as new
    fast = table._bloom_definitely_new(
        _rows(spark, [(1, "a", "x9", 9)]), [("a",)], blooms
    )
    assert fast == [("a",)]


def test_bloom_validation_rules():
    with pytest.raises(ValueError, match="requires partition_by"):
        UpsertTable(spark=None, path="/tmp/x", keys=["k"], precombine="v",
                    bloom_index=True)
    with pytest.raises(ValueError, match="partition-local"):
        UpsertTable(spark=None, path="/tmp/x", keys=["k"], precombine="v",
                    partition_by=["p"], bloom_index=True, global_index=True)


def test_fsck_sweeps_bloom_shard_tmp(spark, table):
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    shard = table._bloom_shard_path(table._stat_key(("a",)))
    with open(shard + ".tmp", "w") as f:
        json.dump({}, f)
    rep = table.fsck()
    assert any(t.endswith("filter.json.tmp") for t in rep["tmp_files"])
    assert not os.path.exists(shard + ".tmp")
    # the shard itself (previous consistent save) survives the sweep
    assert os.path.exists(shard)


def test_bloom_sidecar_is_sharded_per_partition(spark, table):
    """Commit cost must be O(touched): each partition's filter lives in
    its own shard file, and a commit touching one partition rewrites
    only that partition's shard (mtime check on the other)."""
    table.upsert(_rows(spark, [(1, "a", "x", 1), (2, "b", "y", 1)]))
    shard_a = table._bloom_shard_path(table._stat_key(("a",)))
    shard_b = table._bloom_shard_path(table._stat_key(("b",)))
    assert os.path.exists(shard_a) and os.path.exists(shard_b)
    sig_b = (os.stat(shard_b).st_mtime_ns, open(shard_b).read())
    table.upsert(_rows(spark, [(3, "a", "z", 1)]))  # touches only a
    assert (os.stat(shard_b).st_mtime_ns, open(shard_b).read()) == sig_b
    assert os.stat(shard_a).st_mtime_ns >= sig_b[0]


def test_bloom_superset_invariant_on_every_key_adding_path(spark, table, tmp_path):
    """ADVICE r7: keys added by merge_into inserts, insert_overwrite,
    or a schema-widening upsert batch must enter the shards — a later
    upsert of the same keys must take the MERGE path (never duplicate),
    and state must match a bloom-off twin under the same sequence."""
    plain = UpsertTable(spark=spark, path=str(tmp_path / "plainpath"),
                        keys=["k"], precombine="ver", partition_by=["part"])
    table.upsert(_rows(spark, [(1, "a", "x", 1)]))
    plain.upsert(_rows(spark, [(1, "a", "x", 1)]))

    # 1) merge_into insert adds key 2
    src = _rows(spark, [(2, "a", "m", 1)])
    table.merge_into(src)
    plain.merge_into(src)
    # 2) insert_overwrite restates partition b with key 3
    ow = _rows(spark, [(3, "b", "o", 1)])
    table.insert_overwrite(ow)
    plain.insert_overwrite(ow)
    # 3) schema-widening upsert adds key 4 via the merge fallback
    from pyspark.sql import Row as R
    wide = spark.createDataFrame([R(k=4, part="a", v="w", ver=1, extra=9)])
    table.upsert(wide)
    plain.upsert(wide)

    # replaying each added key as an upsert must merge, not duplicate
    replay = _rows(spark, [(2, "a", "m2", 2), (3, "b", "o2", 2)])
    table.upsert(replay)
    plain.upsert(replay)
    wide2 = spark.createDataFrame([R(k=4, part="a", v="w2", ver=2, extra=9)])
    table.upsert(wide2)
    plain.upsert(wide2)

    got = sorted((r.k, r.part, r.v, r.ver) for r in table.read().collect())
    want = sorted((r.k, r.part, r.v, r.ver) for r in plain.read().collect())
    assert got == want
    assert [k for (k, *_rest) in got] == [1, 2, 3, 4]


def test_bloom_probe_is_one_job_for_many_partitions(spark, table, monkeypatch):
    """VERDICT r7 #2: the fast-path probe must be ONE Spark job however
    many partitions the batch touches (the first cut launched one per
    partition — a driver serialization bottleneck at scale). Counted by
    intercepting DataFrame.collect inside _bloom_definitely_new."""
    parts = [chr(ord("a") + i) for i in range(6)]
    table.upsert(_rows(spark, [(i, p, "x", 1) for i, p in enumerate(parts)]))

    # patch the CONCRETE class (Spark 4: pyspark.sql.DataFrame is the
    # abstract base whose subclass defines its own collect)
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    calls = {"n": 0}
    orig_collect = _DF.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    blooms = table._bloom_load()
    batch = _rows(spark, [(100 + i, p, "y", 1) for i, p in enumerate(parts)])
    monkeypatch.setattr(_DF, "collect", counting_collect)
    fast = table._bloom_definitely_new(batch, [(p,) for p in parts], blooms)
    monkeypatch.setattr(_DF, "collect", orig_collect)
    assert sorted(fast) == [(p,) for p in parts]
    assert calls["n"] == 1, f"probe ran {calls['n']} jobs for 6 partitions"


# --- r9 (VERDICT r8 task 7): the batched probe's token-render contract ----
# The single-job probe keys a broadcast bitset dict by a partition token
# rendered TWICE: driver-side (_stat_key: str(v) / sentinel for None) and
# JVM-side (concat_ws of cast-to-string / sentinel). The safety law is
# one-sided: a mismatch may only DISABLE the fast path (unknown token ->
# maybe=True -> merge), never produce a false "definitely new" (duplicate
# rows). These cases pin the law for every partition-column type the
# engine accepts, including the renders that provably DIFFER (Python
# str(True)='True' vs JVM 'true'; float '1.5' both sides but '1.0' vs
# driver '1.0' ok) and the r8 _hive_escape_part surface (quotes, colons,
# equals, unicode, whitespace).

import datetime

TOKEN_CASES = [
    ("int", [1, 2], "long"),
    ("string_plain", ["alpha", "beta"], "string"),
    ("string_colon_quote", ["a:b", 'q"uote'], "string"),
    ("string_equals_slash", ["k=v", "a/b"], "string"),
    ("string_space_unicode", ["has space", "ünïcode"], "string"),
    ("bool", [True, False], "boolean"),
    ("date", [datetime.date(2024, 1, 1), datetime.date(2024, 6, 30)], "date"),
    ("float", [1.5, 2.25], "double"),
    ("null_string", [None, "present"], "string"),
    # r10 (ADVICE r9): fractional-second timestamps — Spark's writer and
    # cast-to-string trim trailing zeros (.500000 -> .5) while Python
    # str() keeps six digits; _part_str must render the trimmed form for
    # BOTH TIMESTAMP and TIMESTAMP_NTZ or the commit read drops rows
    (
        "timestamp_frac",
        [
            datetime.datetime(2021, 1, 1, 0, 0, 0, 500000),
            datetime.datetime(2021, 1, 1, 12, 30, 15, 123000),
        ],
        "timestamp",
    ),
    (
        "timestamp_ntz_edge",
        [
            datetime.datetime(2021, 1, 1, 6, 0, 0),
            datetime.datetime(2021, 1, 1, 6, 0, 0, 100),
        ],
        "timestamp_ntz",
    ),
]


def test_part_str_matches_spark_writer_timestamp_render():
    """Pin _part_str's timestamp render against what Spark 4's Hive-style
    writer actually emits (probed: ts=2021-01-01 00%3A00%3A00.5 etc —
    trailing zeros trimmed, no '.0' at whole seconds, '.0001' for 100µs)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import _part_str

    cases = [
        (datetime.datetime(2021, 1, 1, 0, 0, 0, 500000), "2021-01-01 00:00:00.5"),
        (datetime.datetime(2021, 1, 1, 12, 30, 15, 123000), "2021-01-01 12:30:15.123"),
        (datetime.datetime(2021, 1, 1, 6, 0, 0), "2021-01-01 06:00:00"),
        (datetime.datetime(2021, 1, 1, 6, 0, 0, 100), "2021-01-01 06:00:00.0001"),
    ]
    for v, want in cases:
        assert _part_str(v) == want, (v, _part_str(v), want)


@pytest.mark.parametrize("label,parts,ptype", TOKEN_CASES, ids=[c[0] for c in TOKEN_CASES])
def test_bloom_probe_token_render_never_false_new(spark, tmp_path, label, parts, ptype):
    tbl = UpsertTable(
        spark=spark,
        path=str(tmp_path / f"tok_{label}"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        bloom_index=True,
    )

    def df(rows):
        return spark.createDataFrame(rows, f"k long, part {ptype}, v string, ver long")

    tbl.upsert(df([(1, parts[0], "x", 1), (2, parts[1], "y", 1)]))
    # RE-upsert the same keys with higher ver: if a render mismatch ever
    # produced a false "definitely new", the key would duplicate instead
    # of merging
    tbl.upsert(df([(1, parts[0], "x2", 2), (2, parts[1], "y2", 2)]))
    got = sorted(
        ((r.k, r.v, r.ver) for r in tbl.read().collect()), key=lambda t: t[0]
    )
    assert got == [(1, "x2", 2), (2, "y2", 2)], f"{label}: duplicate or lost row"

    # fresh keys into the same partitions still work (fast path OR merge
    # path both legal — the law is correctness, not which path ran)
    tbl.upsert(df([(3, parts[0], "z", 1)]))
    ks = sorted(r.k for r in tbl.read().collect())
    assert ks == [1, 2, 3]


def test_bloom_probe_mismatched_token_degrades_not_fastpaths(spark, tmp_path, monkeypatch):
    """Directly pin the degradation direction: simulate a future driver/
    JVM render drift by patching _stat_key to a token the JVM-side
    concat_ws can never produce, and assert the partition is NOT
    declared definitely-new (unknown token -> maybe=True -> merge
    path), even though the key is genuinely absent from the filter."""
    tbl = UpsertTable(
        spark=spark,
        path=str(tmp_path / "tok_direct"),
        keys=["k"],
        precombine="ver",
        partition_by=["part"],
        bloom_index=True,
    )
    tbl.upsert(
        spark.createDataFrame([(1, "a", "x", 1)], "k long, part string, v string, ver long")
    )
    monkeypatch.setattr(
        UpsertTable,
        "_stat_key",
        staticmethod(lambda values: "|".join("DRIFTED" for _ in values)),
    )
    blooms = tbl._bloom_load()
    batch = spark.createDataFrame(
        [(99, "a", "new", 1)], "k long, part string, v string, ver long"
    )
    blooms["DRIFTED"] = next(iter(blooms.values()))  # driver-side entry exists
    fast = tbl._bloom_definitely_new(batch, [("a",)], blooms)
    assert fast == [], "render drift must disable the fast path, not fake it"
