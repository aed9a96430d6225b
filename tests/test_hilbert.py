"""Hilbert curve clustering (operators/clustering.py hilbert_index /
hilbert_sql_ctes / cluster_write(curve="hilbert") — Hudi's
hoodie.layout.optimize.strategy=hilbert): the per-bit reflect-and-swap
chain must be bijective with unit-step adjacency, identical in Spark
and DuckDB, and usable as the clustering service's layout."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.clustering import (
    cluster_write,
    hilbert_index,
    hilbert_sql_ctes,
)


def _ref(order: int, x: int, y: int) -> int:
    """Pure-Python xy2d (the classic reflect-with-n-1 variant)."""
    n = 1 << order
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_matches_reference_full_grid(spark):
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    got = {
        (r.x, r.y): r.hd
        for r in hilbert_index(
            spark.createDataFrame(rows, "x int, y int"), "x", "y", bits, out="hd"
        ).collect()
    }
    assert got == {(x, y): _ref(bits, x, y) for x, y in rows}


def test_bijective_and_unit_step(spark):
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    got = {
        (r.x, r.y): r.hd
        for r in hilbert_index(
            spark.createDataFrame(rows, "x int, y int"), "x", "y", bits, out="hd"
        ).collect()
    }
    assert sorted(got.values()) == list(range(256))  # bijection onto 0..n^2-1
    inv = {d: xy for xy, d in got.items()}
    assert all(  # consecutive indices are ALWAYS grid neighbors
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(255)
    )


def test_duckdb_ctes_match_spark_at_8_bits(spark):
    """Cross-engine parity at the production bit width on a sparse
    sample of the 256x256 domain (both vs the Python reference)."""
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    sdf = hilbert_index(
        spark.createDataFrame(pts, "x int, y int"), "x", "y", 8, out="hd"
    )
    got_spark = {(r.x, r.y): r.hd for r in sdf.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (x INT, y INT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    ctes, final = hilbert_sql_ctes("pts", bits=8, xcol="x", ycol="y")
    got_duck = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"WITH {ctes} SELECT x, y, hd FROM {final}").fetchall()
    }
    want = {(x, y): _ref(8, x, y) for x, y in pts}
    assert got_spark == want
    assert got_duck == want


def test_cluster_write_hilbert_layout(spark, tmp_path):
    """curve='hilbert' preserves row content and produces per-file 2-D
    boxes that beat a single-column linear layout on box predicates."""
    rows = [(i, (i * 37) % 500, (i * 91) % 500) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    path = str(tmp_path / "h")
    cluster_write(df, path, ["x", "y"], n_files=16, curve="hilbert")
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert sorted(r.id for r in back.select("id").collect()) == list(range(4000))
    # per-file boxes: files overlapping a centered box predicate
    filed = back.withColumn("_file", F.input_file_name())
    stats = filed.groupBy("_file").agg(
        F.min("x").alias("xlo"), F.max("x").alias("xhi"),
        F.min("y").alias("ylo"), F.max("y").alias("yhi"),
    ).collect()
    assert len(stats) == 16
    q = (200, 300, 200, 300)
    scanned = sum(
        1 for r in stats
        if r.xlo <= q[1] and r.xhi >= q[0] and r.ylo <= q[3] and r.yhi >= q[2]
    )
    # tight 2-D boxes: a centered fifth-of-domain box must not touch
    # more than half the files (a y-blind linear layout prunes nothing
    # on y and scans every x-overlapping file)
    assert scanned <= 8


def test_cluster_write_rejects_bad_curve(spark, tmp_path):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    import pytest

    with pytest.raises(ValueError, match="unknown curve"):
        cluster_write(df, str(tmp_path / "x"), ["a", "b"], 4, curve="peano")
    with pytest.raises(ValueError, match="exactly 2"):
        cluster_write(df, str(tmp_path / "y"), ["a", "b", "c"], 4, curve="hilbert")


def test_upsert_table_cluster_hilbert(spark, tmp_path):
    """The COW clustering service accepts curve='hilbert' and leaves
    table content invariant."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable

    t = UpsertTable(spark, str(tmp_path / "t"), keys=["k"], precombine="v")
    t.upsert(spark.createDataFrame(
        [(i, i, (i * 37) % 100, (i * 91) % 100) for i in range(500)],
        "k long, v long, x long, y long"))
    before = sorted(tuple(r) for r in t.read().collect())
    t.cluster(["x", "y"], n_files=4, curve="hilbert")
    assert sorted(tuple(r) for r in t.read().collect()) == before
