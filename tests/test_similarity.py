"""Similarity search: brute-force correctness vs numpy, LSH recall vs the
exact baseline, centroid assembly."""

from __future__ import annotations

import numpy as np
import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.operators import similarity as S
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_knn_bruteforce_matches_numpy(spark, emb):
    queries = emb.filter("vec_id % 100 = 0")
    got = S.knn_bruteforce(emb, queries, k=3).collect()

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)

    by_query = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append(r.neighbor_id)

    for qid in by_query:
        qv = mat[ids == qid][0]
        sims = (mat @ qv) / (norms * np.linalg.norm(qv))
        sims[ids == qid] = -np.inf
        order = sorted(
            range(len(ids)), key=lambda i: (-round(float(sims[i]), 4), int(ids[i]))
        )
        expected = [int(ids[i]) for i in order[:3]]
        assert by_query[qid] == expected, f"query {qid}"


def test_knn_lsh_recall_vs_exact(spark, emb):
    """Multi-table OR-construction recall on the (near-random) fixture
    embeddings. Deterministic: planes derive from fixed hashes, so the
    measured recall is a constant for this fixture."""
    queries = emb.filter("vec_id % 100 = 0")
    exact = S.knn_bruteforce(emb, queries, k=5).collect()
    approx = S.knn_lsh(emb, queries, k=5, num_planes=4, num_tables=6, dim=64).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(approx_sets) == set(exact_sets)
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    # top-5 cosine ~0.4 on random-ish vectors: collide-prob per pair
    # ~1-(1-0.6^4)^6 ~ 0.57; observed recall must beat a random-subset
    # baseline decisively
    assert hits / total >= 0.3, f"LSH recall too low: {hits}/{total}"

    # determinism
    again = S.knn_lsh(emb, queries, k=5, num_planes=4, num_tables=6, dim=64).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_label_centroids_shape(spark, emb):
    cents = S.label_centroids(emb, "label", "embedding", dim=64).collect()
    assert len(cents) == 10
    assert all(len(r.centroid) == 64 for r in cents)


def test_knn_ivf_recall_and_determinism(spark, emb):
    cents = S.kmeans_centroids(emb, k=8, iterations=3, dim=64)
    assert len(cents) == 8 and len(cents[0]) == 64

    queries = emb.filter("vec_id % 100 = 0")
    exact = S.knn_bruteforce(emb, queries, k=5).collect()
    approx = S.knn_ivf(emb, queries, cents, k=5, n_probe=3).collect()

    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx_sets) == set(exact_sets)
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    # probing 3/8 lists scans ~40% of the corpus; recall must beat that
    assert hits / total >= 0.4, f"IVF recall too low: {hits}/{total}"

    cents2 = S.kmeans_centroids(emb, k=8, iterations=3, dim=64)
    assert cents == cents2  # deterministic training


def test_ivf_index_table_prunes_partitions(spark, emb, tmp_path):
    """The materialized IVF index is a cluster-partitioned table and a
    search opens ONLY the probed clusters' partition directories —
    the inputFiles() of the search plan stay inside cluster=<probed>/
    paths (the 100 TB pruning story, asserted, not narrated)."""
    idx = S.IVFIndex(spark, str(tmp_path / "ivf"))
    idx.build(emb, k=8, iterations=3, dim=64)

    queries = emb.filter("vec_id % 100 = 0")
    n_probe = 3
    qb = idx.probe_lists(queries, n_probe)
    probed = {r.cluster for r in qb.select("cluster").distinct().collect()}
    assert len(probed) <= 8

    out = idx.search(queries, k=5, n_probe=n_probe)
    opened = {
        f.split("cluster=")[1].split("/")[0]
        for f in out.inputFiles()
        if "cluster=" in f
    }
    assert opened == {str(c) for c in probed}, (opened, probed)

    # the materialized search equals the inline knn_ivf on the same
    # (deterministic) centroids — persistence changes cost, not results
    inline = S.knn_ivf(emb, queries, idx.centroids(), k=5, n_probe=n_probe)
    got = [(r.query_id, r.rnk, r.neighbor_id, r.sim) for r in out.collect()]
    want = [(r.query_id, r.rnk, r.neighbor_id, r.sim) for r in inline.collect()]
    assert got == want


def test_knn_filtered_respects_label_and_matches_bruteforce_within_label(spark, emb):
    """Every neighbor shares the query's label, and the ranking equals a
    per-label brute force (the filter is a constraint, not an
    approximation)."""
    queries = emb.filter("vec_id % 100 = 0")
    out = S.knn_filtered(emb, queries, filter_cols=["label"], k=3)
    rows = out.collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert labels[r.neighbor_id] == labels[r.query_id] == r.label
        assert r.neighbor_id != r.query_id

    # per-label brute force gives the same top-k for one probe query
    probe = rows[0].query_id
    lbl = labels[probe]
    seg = emb.filter(f"label = {lbl}")
    want = {
        (r.query_id, r.rnk, r.neighbor_id)
        for r in S.knn_bruteforce(seg, seg.filter(f"vec_id = {probe}"), k=3).collect()
    }
    got = {(r.query_id, r.rnk, r.neighbor_id) for r in rows if r.query_id == probe}
    assert got == want


def test_knn_filtered_is_equi_join_not_cartesian(spark, emb):
    """The metadata filter must become the JOIN KEY: the plan joins on
    label (hash or broadcast), never a cartesian/nested-loop over the
    whole corpus."""
    queries = emb.filter("vec_id % 100 = 0")
    plan = (
        S.knn_filtered(emb, queries, filter_cols=["label"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- product quantization ----------------------------------------------------


def test_pq_encode_matches_numpy(spark, emb):
    books = S.pq_codebooks(4, 16, 64)
    got = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(emb, books).collect()}

    rows = emb.collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    b = np.asarray(books, dtype=np.float64)  # m x ksub x dsub
    subs = mat.reshape(len(mat), 4, 16)
    d = (
        (subs ** 2).sum(axis=2)[:, :, None]
        - 2 * np.einsum("bmd,mkd->bmk", subs, b)
        + (b ** 2).sum(axis=2)[None, :, :]
    )
    codes = np.round(np.round(d, 6) * 1e6).astype(np.int64).argmin(axis=2)
    for i, r in enumerate(rows):
        assert got[r.vec_id] == list(codes[i])


def test_pq_trained_codebooks_recall_beats_literals(spark, emb):
    """Trained per-subspace codebooks must reconstruct the corpus better
    than arbitrary literals: recall@5 of knn_pq vs exact brute force is
    strictly higher with training (and clears a floor)."""
    queries = emb.filter("vec_id % 100 = 0")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(emb, queries, k=5).collect()
    }

    def recall(books):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.knn_pq(emb, queries, books, k=5).collect()
        }
        return len(got & exact) / len(exact)

    r_lit = recall(S.pq_codebooks(4, 16, 64))
    r_trn = recall(S.pq_train_codebooks(emb, 4, 16, 64, iterations=3))
    # The fixture embeddings are iid synthetic — PQ's worst case (no
    # inter-dimension structure to exploit), and the baseline ranks by
    # cosine while PQ ranks by L2, so absolute recall is modest here
    # (measured: literals 0.08, trained 0.16 at m=4; 0.44 at m=16/k=64).
    # The assertions that matter: training strictly beats arbitrary
    # literals, deterministically, above a stable floor.
    assert r_trn > r_lit
    assert r_trn >= 0.1


def test_pq_scoring_is_jvm_side_integer_sum(spark, emb):
    books = S.pq_codebooks(4, 16, 64)
    queries = emb.filter("vec_id % 100 = 0")
    df = S.knn_pq(emb, queries, books, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # queries broadcast; the encoded corpus streams map-side
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan
    # deterministic output type: exact integer micro-distances
    assert dict(df.dtypes)["adist_micro"] == "bigint"


def test_pq_codebook_validation(spark):
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_codebooks(5, 16, 64)


def test_ivf_pq_index_search_and_pruning(spark, emb, tmp_path):
    """IVF-PQ composition: inverted lists store residual PQ codes (m ints
    per vector); search prunes to the probed cluster dirs AND scores by
    exact-integer ADC. Recall is measured against exact L2."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.similarity import IVFIndex

    idx = IVFIndex(spark, str(tmp_path / "ivfpq"))
    idx.build(emb, k=8, iterations=3, dim=64, pq_m=16, pq_ksub=16)

    queries = emb.filter("vec_id % 100 = 0")
    got = idx.search(queries, k=5, n_probe=4)
    assert got.columns == ["query_id", "neighbor_id", "adist_micro", "rnk"]
    rows = got.collect()
    assert rows and all(r["rnk"] <= 5 for r in rows)

    # partition pruning: only probed cluster dirs are opened
    qb = idx.probe_lists(queries, 4)
    probed = {r.cluster for r in qb.select("cluster").distinct().collect()}
    opened = {
        f.split("cluster=")[1].split("/")[0]
        for f in got.inputFiles()
        if "cluster=" in f
    }
    assert opened and opened <= {str(c) for c in probed}

    # recall vs exact L2 (iid synthetic embeddings = PQ's worst case;
    # m=16 keeps distortion workable — see test_pq_trained_codebooks)
    rows_all = emb.collect()
    ids = np.array([r.vec_id for r in rows_all])
    mat = np.array([r.embedding for r in rows_all], dtype=np.float64)
    exact = set()
    for qi in np.where(ids % 100 == 0)[0]:
        d = ((mat - mat[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:5]
        exact |= {(int(ids[qi]), int(ids[j])) for j in order}
    found = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(found & exact) / len(exact) >= 0.3


def test_knn_rerank_improves_or_matches_ivf_pq_precision(spark, emb):
    """Two-stage search: exact rerank of the IVF-PQ top-20 must order its
    survivors exactly like brute force does, and its top-5 agreement
    with the exact baseline must be at least the raw compressed-domain
    top-5's (same candidate pool, exact scores can only help)."""
    from pyspark.sql import functions as F

    cents = S.literal_centroids(8, 64)
    books = S.pq_codebooks(4, 16, 64)
    queries = emb.filter(F.col("vec_id") % 40 == 0)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(emb, queries, k=5).collect()
    }
    coarse = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_ivf_pq(emb, queries, cents, books, k=5, n_probe=3).collect()
    }
    rer = S.knn_rerank(emb, queries, cents, books, k=5, rerank=20, n_probe=3)
    rer_rows = rer.collect()
    reranked = {(r.query_id, r.neighbor_id) for r in rer_rows}

    assert len(exact & reranked) >= len(exact & coarse), (
        f"rerank hits {len(exact & reranked)} < coarse hits {len(exact & coarse)}"
    )

    # survivors are ordered by EXACT similarity: per query, sims are
    # non-increasing with rank and match knn_bruteforce's rounding
    by_q = {}
    for r in rer_rows:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.sim))
    for qid, pairs in by_q.items():
        sims = [s for _, s in sorted(pairs)]
        assert sims == sorted(sims, reverse=True), f"query {qid} not exact-ordered"


def test_knn_rerank_stage2_is_jvm_side(spark, emb):
    """Stage 2 (candidate join + exact cosine) must not add Python
    evaluation beyond stage 1's pandas UDFs: the plan's only
    ArrowEvalPython/BatchEvalPython nodes are the IVF-PQ coarse pass's."""
    from pyspark.sql import functions as F

    cents = S.literal_centroids(8, 64)
    books = S.pq_codebooks(4, 16, 64)
    queries = emb.filter(F.col("vec_id") % 40 == 0)

    coarse_plan = (
        S.knn_ivf_pq(emb, queries, cents, books, k=20, n_probe=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    rerank_plan = (
        S.knn_rerank(emb, queries, cents, books, k=5, rerank=20, n_probe=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    def n_python(plan):
        return plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    assert n_python(rerank_plan) <= n_python(coarse_plan)


def test_ivf_index_incremental_add(spark, emb, tmp_path):
    """IVFIndex.add: new vectors index against the EXISTING quantizers
    (no retrain, append-only to touched cluster partitions); search
    finds them, partition pruning still holds, old lists unchanged."""
    import os

    from pyspark.sql import functions as F

    base = emb.filter(F.col("vec_id") < 400)
    late = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    idx = S.IVFIndex(spark, str(tmp_path / "ivf_add"))
    idx.build(base, k=8, iterations=3)
    files_before = {
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(str(tmp_path / "ivf_add"))
        for f in fn if f.endswith(".parquet")
    }

    assert idx.add(late) == late.count()
    # existing files untouched (append-only)
    files_after = {
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(str(tmp_path / "ivf_add"))
        for f in fn if f.endswith(".parquet")
    }
    assert files_before <= files_after and len(files_after) > len(files_before)

    # added vectors are retrievable: probing every cluster with a large k
    # from a base query must surface late ids among the neighbors (search
    # excludes only the query itself)
    hits = idx.search(base.limit(1), k=449, n_probe=8)
    neighbors = {r.neighbor_id for r in hits.collect()}
    late_ids = {r.vec_id for r in late.select("vec_id").collect()}
    assert late_ids <= neighbors, "added vectors missing from the lists"

    # pruning still holds after the append: a low-probe search opens a
    # strict subset of cluster partitions
    pruned = idx.search(late.limit(3), k=1, n_probe=2)
    opened = {
        f.split("cluster=")[1].split("/")[0]
        for f in pruned.inputFiles()
        if "cluster=" in f
    }
    assert 0 < len(opened) < 8
    assert pruned.count() >= 1


def test_ivf_pq_index_incremental_add(spark, emb, tmp_path):
    """add() on an IVF-PQ index PQ-encodes new residuals with the STORED
    codebooks — the compressed lists stay homogeneous."""
    from pyspark.sql import functions as F

    base = emb.filter(F.col("vec_id") < 400)
    late = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 430))
    idx = S.IVFIndex(spark, str(tmp_path / "ivfpq_add"))
    idx.build(base, k=8, iterations=3, pq_m=4)
    assert idx.add(late) == late.count()
    rows = spark.read.option("basePath", str(tmp_path / "ivfpq_add")).parquet(
        str(tmp_path / "ivfpq_add")
    )
    # every row (old and new) carries codes, not raw vectors
    assert "codes" in rows.columns and rows.filter(F.col("codes").isNull()).count() == 0
    assert rows.count() == 430
    got = idx.search(late.limit(2), k=1, n_probe=8)
    assert got.count() >= 1


def test_assignment_drift_flags_out_of_distribution_batches(spark, emb, tmp_path):
    """In-distribution arrivals score ratio ~1; a shifted batch (vectors
    scaled far outside the trained cloud) scores well above — the
    refresh-the-quantizer signal."""
    from pyspark.sql import functions as F

    base = emb.filter(F.col("vec_id") < 400)
    idx = S.IVFIndex(spark, str(tmp_path / "ivf_drift"))
    idx.build(base, k=8, iterations=3)

    ind = idx.assignment_drift(emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)))
    assert ind["n"] == 50 and 0.5 < ind["ratio"] < 2.0, ind

    shifted = emb.filter(F.col("vec_id") < 50).select(
        "vec_id",
        F.transform("embedding", lambda x: x * 10.0 + 5.0).alias("embedding"),
    )
    ood = idx.assignment_drift(shifted)
    assert ood["ratio"] > 5.0, ood
