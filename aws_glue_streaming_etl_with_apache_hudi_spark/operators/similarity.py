"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline; hyperplane-LSH bucketing
as the approximate scale path. All vector math is JVM-side column
expressions (functions/vector.py) — no Python in the scoring loop.

Scale design: the query set is broadcast (it is small by construction);
the corpus streams through map-side, so scoring is embarrassingly
parallel with NO shuffle of the corpus. Only the per-query top-k
aggregation shuffles (k rows per query per partition after partial
top-k). The LSH variant cuts scored pairs to same-bucket candidates —
the standard recall/cost trade."""

from __future__ import annotations

import weakref

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import cosine_similarity


def _as_double(col):
    return F.col(col).cast("array<double>")


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sim_decimals: int = 4,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, rank per query.

    Similarity is rounded BEFORE ranking so ordering is stable across
    engines/float-summation orders (tie-break: neighbor id). Returns
    (query_id, neighbor_id, sim, rnk)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import (
        dot_product_sql,
        l2_norm_sql,
    )
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot, fan_out

    corpus = fan_out(corpus)
    # Precompute each vector's norm ONCE (corpus-side map) instead of
    # per-pair: cuts the per-pair work to a single dot-product fold.
    # SQL-text projections (selectExpr): one parse per expression instead
    # of ~30 py4j roundtrips per projection — identical parsed trees.
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    q = queries.selectExpr(
        f"{id_col} AS query_id", f"{dv} AS qv", f"{l2_norm_sql(dv)} AS qn"
    )
    # (vector, norm) projection cached via persist slot — the stored-
    # artifact analogue (see knn_lsh); repeated searches skip the cast +
    # norm pass and stream the cached columns map-side.
    c = _persist_slot(
        corpus.selectExpr(
            f"{id_col} AS neighbor_id", f"{dv} AS cv", f"{l2_norm_sql(dv)} AS cn"
        ),
        "similarity.knn_bruteforce_corpus",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter("neighbor_id != query_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"round({dot_product_sql('qv', 'cv')} / (qn * cn), {sim_decimals}) AS sim",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def knn_filtered(
    corpus: DataFrame,
    queries: DataFrame,
    filter_cols: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sim_decimals: int = 4,
) -> DataFrame:
    """Filtered exact kNN: each query only considers corpus vectors whose
    ``filter_cols`` metadata EQUALS the query's — the "filtered vector
    search" pattern (search within a tenant/category/language).

    Scale story: the metadata filter turns the brute-force crossJoin into
    an EQUI-join on the filter key — Catalyst hash-partitions (or
    broadcasts) on it, so each query row meets only its segment of the
    corpus, cutting compared pairs from |Q|x|C| to the sum of segment
    sizes. This composition (pre-filter as join key, then rank) is why
    filtered ANN is CHEAPER than unfiltered, not an afterthought bolted
    onto a vector index. Returns (query_id, neighbor_id, *filter_cols,
    sim, rnk)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import (
        dot_product_sql,
        l2_norm_sql,
    )
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import fan_out

    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    q = queries.selectExpr(
        *filter_cols,
        f"{id_col} AS query_id",
        f"{dv} AS qv",
        f"{l2_norm_sql(dv)} AS qn",
    )
    c = fan_out(corpus).selectExpr(
        *filter_cols,
        f"{id_col} AS neighbor_id",
        f"{dv} AS cv",
        f"{l2_norm_sql(dv)} AS cn",
    )
    # no forced broadcast: Catalyst/AQE picks broadcast for small query
    # sets and falls back to a shuffled equi-join on the filter key for
    # bulk ones (a forced broadcast would OOM exactly when the "bulk
    # query set" pitch applies — caught by code review)
    scored = (
        c.join(q, filter_cols)
        .filter("neighbor_id != query_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            *filter_cols,
            f"round({dot_product_sql('qv', 'cv')} / (qn * cn), {sim_decimals}) AS sim",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def plane_weights(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane weights in [-1, 1], derived
    from md5 — the same digest ``functions.hashing.stable_hash64`` uses,
    computed driver-side so the weights enter the plan (and the DuckDB
    oracle SQL) as plain literals: w(p,d) = (md5_60bit('p_d') % 2001
    - 1000)/1000. Any engine regenerates identical planes from the
    formula; nothing is stored."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def _udf_memo(sc, key, build):
    """Per-SparkContext UDF memo (ADVICE r13): the old lru_cache keyed on
    the SparkContext OBJECT held strong references to up to 8 stopped
    contexts (gateways, UDF state, centroid/codebook byte copies) for the
    process lifetime. A WeakKeyDictionary drops a context's entries with
    the context itself — the _PERSIST_SLOTS eviction pattern — and the
    per-context dict is bounded the way the lru was (cleared at 8)."""
    per_sc = _UDF_MEMO.setdefault(sc, {})
    hit = per_sc.get(key)
    if hit is None:
        if len(per_sc) >= 8:
            per_sc.clear()
        hit = per_sc[key] = build()
    return hit


_UDF_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _hyperplane_bucket_udf(sc, num_planes: int, dim: int, num_tables: int):
    """The LSH bucket-id pandas UDF, memoized per (SparkContext, planes,
    dim, tables): the plane weights are a pure function of the key, so a
    cached entry is exactly the UDF the uncached path would build — and
    defining it per call was most of hyperplane_signs' plan-build cost.
    The SparkContext key drops entries whose JVM handle died with a
    stopped context (a UserDefinedFunction memoizes its java UDF)."""
    return _udf_memo(
        sc,
        ("hyperplane", num_planes, dim, num_tables),
        lambda: _build_hyperplane_bucket_udf(num_planes, dim, num_tables),
    )


def _build_hyperplane_bucket_udf(num_planes: int, dim: int, num_tables: int):
    w = np.array(plane_weights(num_planes * num_tables, dim), dtype=np.float64).T
    powers = (1 << np.arange(num_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)  # batch x dim
        # round before the sign test: a dot product within 1e-6 of zero
        # must bucket identically across engines/summation orders (the
        # DuckDB oracle replicates this blocking from the same literal
        # weights — see queries/northstar.py dedup_embedding_cosine)
        signs = np.round(m @ w, 6) > 0  # batch x (tables*planes)
        bits = signs.reshape(len(m), -1, num_planes)  # batch x tables x planes
        buckets = (bits * powers).sum(axis=2)  # batch x tables
        return pd.Series(list(buckets))

    # asNondeterministic: the function IS deterministic, but without the
    # marker InferFiltersFromGenerate derives `size(_buckets) > 0 AND
    # _buckets IS NOT NULL` from the posexplode and pushes it BELOW the
    # projection — duplicating the ArrowEvalPython node, so every vector
    # paid the matmul boundary twice (plan audit r13; the optimization
    # guide's §4.4 double-BatchEvalPython pattern). The inferred filter
    # is vacuous here (bucket arrays are always non-empty), so blocking
    # the inference changes no rows — it only removes the second eval.
    return bucket_ids.asNondeterministic()


def hyperplane_signs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int = 8,
    dim: int = 64,
    num_tables: int = 1,
) -> DataFrame:
    """LSH bucket ids per vector: sign pattern against ``num_planes``
    deterministic hyperplanes, repeated for ``num_tables`` independent
    tables (OR-construction): bucket_t = Σ_p sign-bit(v·w_{t,p})·2^p.

    Output: one row per (vector, table) with columns (id, vec, table,
    bucket). The planes*tables dot products are ONE Arrow-batched pandas
    UDF doing a single (batch x dim) @ (dim x planes·tables) matmul —
    the canonical vectorized slow path: per-row interpreted folds for 24
    dot products were ~5x slower than one BLAS matmul per Arrow batch.
    Per-table expansion is a ``posexplode`` of the bucket array."""
    bucket_ids = _hyperplane_bucket_udf(
        df.sparkSession.sparkContext, num_planes, dim, num_tables
    )
    with_buckets = df.select(
        id_col, vec_col, bucket_ids(_as_double(vec_col)).alias("_buckets")
    )
    return with_buckets.select(
        id_col,
        vec_col,
        F.posexplode("_buckets").alias("table", "bucket"),
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 6,
    dim: int = 64,
    sim_decimals: int = 4,
) -> DataFrame:
    """Approximate top-k with multi-table random-projection LSH: a pair is
    a candidate if it collides in ANY of ``num_tables`` independent
    ``num_planes``-bit tables (OR-construction) — the standard
    recall/cost dial: collide-prob = 1-(1-p^planes)^tables for
    per-plane agreement p = 1 - angle/pi.

    Scale: candidates are generated by a (table, bucket) equi-join and
    deduped — shuffle keys are bucket ids, never n²; hot buckets (mass
    near a hyperplane intersection) are handled by AQE skew splitting."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import (
        dot_product_sql,
        l2_norm_sql,
    )
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot, fan_out

    corpus = fan_out(corpus)
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    # The corpus signature table is cached through a persist slot: at
    # scale this IS a stored artifact (signatures are written once and
    # probed by every search), and the slot's sameResult reuse means
    # repeated searches over the same corpus skip the Arrow-batched
    # matmul pass entirely — only the per-query bucket join runs.
    cb = _persist_slot(
        hyperplane_signs(corpus, id_col, vec_col, num_planes, dim, num_tables).selectExpr(
            f"{id_col} AS neighbor_id",
            f"{dv} AS cv",
            f"{l2_norm_sql(dv)} AS cn",
            "table",
            "bucket",
        ),
        "similarity.knn_lsh_corpus_sigs",
    )
    qb = hyperplane_signs(queries, id_col, vec_col, num_planes, dim, num_tables).selectExpr(
        f"{id_col} AS query_id",
        f"{dv} AS qv",
        f"{l2_norm_sql(dv)} AS qn",
        "table",
        "bucket",
    )
    # Score BEFORE the cross-table dedup: the collision join is map-side
    # (queries broadcast), so the cosine is a JVM fold computed where the
    # vectors already are, and the dropDuplicates shuffle then carries
    # (query_id, neighbor_id, sim) — ~24 bytes/row — instead of two
    # 64-double vectors (~1 KB/row). A pair colliding in t tables costs
    # t redundant folds (bounded by num_tables), which is orders of
    # magnitude cheaper than shuffling vector payloads: at the sf1 spot
    # bench this cut knn_lsh from ~20 s to the expected near-linear
    # scale-up. Duplicate rows agree on sim exactly (same fold, same
    # rounding), so which one dropDuplicates keeps is immaterial.
    scored = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter("neighbor_id != query_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"round({dot_product_sql('qv', 'cv')} / (qn * cn), {sim_decimals}) AS sim",
        )
        # ONE shuffle for dedup + top-k: clustering by query_id alone
        # co-locates every (query_id, neighbor_id) group AND satisfies
        # the query_id window partitioning below, so the cross-table
        # pair-dedup and the rank window share a single Exchange (plan
        # audit r13: was Exchange(q, n) for the distinct THEN
        # Exchange(q) for the window — two full shuffles+sorts of the
        # candidate set; guide §2.4). The shuffled rows are pre-dedup
        # collisions — at most num_tables copies of a ~24-byte triple.
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


class IVFIndex:
    """Materialized IVF index: the inverted lists written as a real
    ``cluster``-partitioned parquet table (the design ``knn_ivf``'s
    docstring promises — here it is the artifact, not a comment).

    ``build`` assigns every corpus vector to its nearest centroid (one
    Arrow-batched pass, centroids broadcast in the closure) and writes
    the corpus partitioned by cluster id, with the trained centroids in
    a JSON sidecar. ``search`` resolves each query's ``n_probe`` nearest
    centroids and reads ONLY those partition directories — at 100 TB a
    search touches n_probe/k of the corpus bytes; the pruning is
    assertable via ``inputFiles()`` (tests/test_similarity.py).

    Norms are precomputed at build time (``_cn``): scoring a candidate
    is a single dot-product fold, the same trick knn_bruteforce uses."""

    def __init__(self, spark, path: str, id_col: str = "vec_id", vec_col: str = "embedding"):
        import os

        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        self._meta_path = os.path.join(path, "_ivf_meta.json")

    def build(
        self,
        corpus: DataFrame,
        k: int = 16,
        iterations: int = 5,
        dim: int = 64,
        pq_m: int | None = None,
        pq_ksub: int = 16,
    ) -> None:
        """Build the inverted lists; with ``pq_m`` set, store PQ codes of
        the RESIDUALS (v - centroid) instead of the raw vectors — classic
        IVF-PQ (Jégou et al. 2011): the coarse quantizer removes the
        cluster mean, the product quantizer encodes what remains, and a
        billion-vector index shrinks to m small ints per vector. The
        codebooks are trained per-subspace on the residual distribution
        (pq_train_codebooks)."""
        import json
        import os

        from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import l2_norm

        centroids = kmeans_centroids(
            corpus, id_col=self.id_col, vec_col=self.vec_col, k=k,
            iterations=iterations, dim=dim,
        )
        cents = np.asarray(centroids, dtype=np.float64)

        @F.pandas_udf("int")
        def nearest(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d.argmin(axis=1).astype("int32"))

        assigned = corpus.select(
            F.col(self.id_col),
            _as_double(self.vec_col).alias("v"),
            l2_norm(_as_double(self.vec_col)).alias("_cn"),
            nearest(_as_double(self.vec_col)).alias("cluster"),
        )
        # Build-time mean squared assignment distance: the drift baseline
        # (see assignment_drift) — one tiny aggregate over the frame the
        # build computes anyway.
        @F.pandas_udf("double")
        def _mind(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d.min(axis=1))

        base_mean = (
            corpus.select(_mind(_as_double(self.vec_col)).alias("_d"))
            .agg(F.avg("_d"))
            .collect()[0][0]
        )
        meta: dict = {
            "centroids": centroids,
            "dim": dim,
            "mean_assign_dist": float(base_mean),
        }
        if pq_m is not None:

            @F.pandas_udf("array<double>")
            def residual(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
                m = np.asarray(vecs.tolist(), dtype=np.float64)
                r = m - cents[clusters.to_numpy()]
                return pd.Series(list(r))

            res = assigned.select(
                self.id_col, "cluster", residual("v", "cluster").alias("_res")
            ).persist()  # consumed by training (m*iters scans) AND encoding
            try:
                books = pq_train_codebooks(
                    res, pq_m, pq_ksub, dim, id_col=self.id_col, vec_col="_res"
                )
                codes = pq_encode(res, books, id_col=self.id_col, vec_col="_res")
                (
                    res.select(self.id_col, "cluster")
                    .join(codes, self.id_col)
                    .write.mode("overwrite")
                    .partitionBy("cluster")
                    .parquet(self.path)
                )
            finally:
                res.unpersist()
            meta["pq"] = {"m": pq_m, "ksub": pq_ksub, "codebooks": books}
        else:
            assigned.write.mode("overwrite").partitionBy("cluster").parquet(self.path)
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def add(self, new_vectors: DataFrame) -> int:
        """Incrementally index new vectors against the EXISTING trained
        quantizers: assign each to its stored nearest centroid (and PQ-
        encode its residual with the stored codebooks, if the index is
        IVF-PQ) and APPEND to the touched cluster partitions — no
        retrain, no rewrite of existing lists. This is how production
        ANN indexes absorb a continuously-growing corpus: quantizers
        refresh on a slow cadence (full ``build``), arrivals land
        incrementally between refreshes. Returns #vectors added.

        Drift caveat: vectors from a distribution the centroids never
        saw degrade recall until the next build — the monitor for that
        is a per-batch mean assignment distance (cheap: it is computed
        here anyway)."""
        import json

        from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import l2_norm

        cents = np.asarray(self.centroids(), dtype=np.float64)

        @F.pandas_udf("int")
        def nearest(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d.argmin(axis=1).astype("int32"))

        assigned = new_vectors.select(
            F.col(self.id_col),
            _as_double(self.vec_col).alias("v"),
            l2_norm(_as_double(self.vec_col)).alias("_cn"),
            nearest(_as_double(self.vec_col)).alias("cluster"),
        )
        pq = self._pq_meta()
        if pq is not None:
            books = pq["codebooks"]

            @F.pandas_udf("array<double>")
            def residual(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
                m = np.asarray(vecs.tolist(), dtype=np.float64)
                return pd.Series(list(m - cents[clusters.to_numpy()]))

            res = assigned.select(
                self.id_col, "cluster", residual("v", "cluster").alias("_res")
            )
            codes = pq_encode(res, books, id_col=self.id_col, vec_col="_res")
            out = res.select(self.id_col, "cluster").join(codes, self.id_col)
        else:
            out = assigned
        n = out.count()
        if n:
            out.write.mode("append").partitionBy("cluster").parquet(self.path)
        return n

    def assignment_drift(self, new_vectors: DataFrame) -> dict:
        """Quantizer-drift probe for a batch of arrivals: mean squared
        nearest-centroid distance vs the build-time baseline. A ratio
        well above 1 means the batch comes from a distribution the
        centroids never saw — recall of incrementally added vectors
        degrades and a quantizer refresh (full ``build``) is due. The
        standard operating signal for an IVF index under continuous
        ingestion; returns {batch_mean, build_mean, ratio, n}."""
        import json

        with open(self._meta_path) as f:
            meta = json.load(f)
        cents = np.asarray(meta["centroids"], dtype=np.float64)

        @F.pandas_udf("double")
        def _mind(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d.min(axis=1))

        row = (
            new_vectors.select(_mind(_as_double(self.vec_col)).alias("_d"))
            .agg(F.avg("_d").alias("m"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        build_mean = meta.get("mean_assign_dist")
        ratio = (
            float(row.m) / build_mean if build_mean else float("nan")
        )
        return {
            "batch_mean": float(row.m),
            "build_mean": build_mean,
            "ratio": ratio,
            "n": int(row.n),
        }

    def centroids(self) -> list[list[float]]:
        import json

        with open(self._meta_path) as f:
            return json.load(f)["centroids"]

    def probe_lists(self, queries: DataFrame, n_probe: int) -> DataFrame:
        """(query_id, qv, qn, cluster) — each query exploded to its
        ``n_probe`` nearest centroids."""
        from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import l2_norm

        cents = np.asarray(self.centroids(), dtype=np.float64)

        @F.pandas_udf("array<int>")
        def probes(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            order = d.argsort(axis=1)[:, :n_probe].astype("int32")
            return pd.Series(list(order))

        return queries.select(
            F.col(self.id_col).alias("query_id"),
            _as_double(self.vec_col).alias("qv"),
            l2_norm(_as_double(self.vec_col)).alias("qn"),
            F.explode(probes(_as_double(self.vec_col))).alias("cluster"),
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 3,
        sim_decimals: int = 4,
    ) -> DataFrame:
        """Top-k per query over the probed inverted lists only.

        The probed cluster ids are collected (tiny: <= queries x
        n_probe ints) and the corpus read lists ONLY those partition
        dirs — pruned partitions are never opened."""
        import os

        from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import dot_product

        qb = self.probe_lists(queries, n_probe)
        probed = sorted({r.cluster for r in qb.select("cluster").distinct().collect()})
        dirs = [
            os.path.join(self.path, f"cluster={c}")
            for c in probed
            if os.path.isdir(os.path.join(self.path, f"cluster={c}"))
        ]
        if not dirs:
            raise ValueError(f"no inverted lists for probed clusters {probed}")
        lists = self.spark.read.option("basePath", self.path).parquet(*dirs)
        if self._pq_meta() is not None:
            return self._search_pq(lists, qb, k)
        scored = (
            lists.join(F.broadcast(qb), "cluster")
            .filter(F.col(self.id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(self.id_col).alias("neighbor_id"),
                F.round(
                    dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("_cn")),
                    sim_decimals,
                ).alias("sim"),
            )
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .orderBy("query_id", "rnk")
        )

    def _pq_meta(self) -> dict | None:
        import json

        with open(self._meta_path) as f:
            return json.load(f).get("pq")

    def _search_pq(self, lists: DataFrame, qb: DataFrame, k: int) -> DataFrame:
        """ADC scoring over the probed PQ code lists: per (query, probed
        cluster) the query's RESIDUAL against that cluster's centroid
        builds an m x ksub integer micro-distance table; a candidate's
        distance is the exact integer sum of its codes' table entries.
        Returns (query_id, neighbor_id, adist_micro, rnk) — ranked by
        approximate L2, ties to the smaller id."""
        pq = self._pq_meta()
        books = np.asarray(pq["codebooks"], dtype=np.float64)
        m, ksub = pq["m"], pq["ksub"]
        cents = np.asarray(self.centroids(), dtype=np.float64)

        @F.pandas_udf("array<long>")
        def qtable(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
            mat = np.asarray(vecs.tolist(), dtype=np.float64)
            res = mat - cents[clusters.to_numpy()]
            d = _sub_dist_micro(res, books)
            return pd.Series(list(d.reshape(len(mat), m * ksub)))

        qt = qb.select(
            "query_id", "cluster", qtable("qv", "cluster").alias("qtab")
        )
        adist = F.expr(
            "aggregate(transform(codes, (c, i) -> element_at(qtab, i * "
            f"{ksub} + c + 1)), 0L, (acc, x) -> acc + x)"
        )
        scored = (
            lists.join(F.broadcast(qt), "cluster")
            .filter(F.col(self.id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(self.id_col).alias("neighbor_id"),
                adist.alias("adist_micro"),
            )
            # a neighbor reachable through several probed clusters keeps
            # its best (smallest) approximate distance
            .groupBy("query_id", "neighbor_id")
            .agg(F.min("adist_micro").alias("adist_micro"))
        )
        w = W.partitionBy("query_id").orderBy(
            F.asc("adist_micro"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .orderBy("query_id", "rnk")
        )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Element-wise mean vector per label via posexplode + re-assembly —
    the distributed way to average vectors (no driver collect; one
    shuffle on (label, pos), one on label)."""
    exploded = df.select(
        F.col(label_col), F.posexplode(_as_double(vec_col)).alias("pos", "x")
    )
    means = exploded.groupBy(label_col, "pos").agg(F.avg("x").alias("m"))
    return (
        means.groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
            ).alias("centroid")
        )
    )


def literal_centroids(k: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random IVF coarse centroids in [-1, 1],
    md5-derived exactly like ``plane_weights`` (distinct seed prefix so
    they never collide with LSH planes): c(i,d) = (md5_60bit('ivf_i_d')
    % 2001 - 1000)/1000.

    Purpose: an IVF *query variant* whose coarse quantizer is a plain
    literal lets the nearest-centroid assignment, n_probe selection and
    top-k search all be re-derived in static ANSI SQL — giving the IVF
    search semantics a hard DuckDB oracle (the same move that made
    knn_lsh fully oracle-checked). Trained ``kmeans_centroids`` /
    ``IVFIndex`` remain the production quantizer; the literal variant
    checks the search path, not the training."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"ivf_{c}_{d}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]
        for c in range(k)
    ]


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 5,
    dim: int = 64,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for IVF coarse quantization.

    Init: the k vectors with the smallest ids (deterministic, no RNG).
    Each iteration assigns every vector to its nearest centroid (one
    Arrow-batched matmul pass — centroids broadcast in the closure) and
    recomputes means distributedly (posexplode + avg per (cluster, pos)).
    Iteration count is FIXED — convergence checks would make run time
    data-dependent; 5 Lloyd rounds is the standard IVF training budget
    trade-off. Returns driver-side centroids (k x dim floats — tiny).

    Scale: each iteration is one scan + one (cluster, pos)-keyed shuffle
    of k*dim partial means; the corpus itself never shuffles."""
    seed_rows = (
        corpus.orderBy(id_col).limit(k).select(_as_double(vec_col).alias("v")).collect()
    )
    centroids = np.asarray([r.v for r in seed_rows], dtype=np.float64)

    for _ in range(iterations):
        cents = centroids.copy()

        @F.pandas_udf("int")
        def nearest(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d.argmin(axis=1).astype("int32"))

        assigned = corpus.select(
            nearest(_as_double(vec_col)).alias("cluster"), _as_double(vec_col).alias("v")
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        for c_i, posmap in by_cluster.items():
            new[c_i] = [posmap[p] for p in range(dim)]
        centroids = new
    return centroids.tolist()


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 3,
    sim_decimals: int = 4,
) -> DataFrame:
    """IVF search: corpus vectors are bucketed by nearest centroid (the
    inverted lists); each query scores only vectors in its ``n_probe``
    nearest centroids' lists.

    Scale: the inverted lists ARE a partitioning of the corpus — on a
    real deployment they are written once as a `cluster`-partitioned
    table and searches prune to n_probe partitions; here the assignment
    is computed inline. Join shuffles on the cluster id; candidate count
    ~ corpus * n_probe / n_centroids."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import dot_product, l2_norm
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import fan_out

    cents = np.asarray(centroids, dtype=np.float64)
    cc = (cents * cents).sum(axis=1)  # k centroid norms², precomputed

    def _dists(vecs: pd.Series) -> np.ndarray:
        """batch x k squared distances, expansion form |v|²-2v·c+|c|²,
        ROUNDED to 6 dp before any argmin/argsort: a distance within
        1e-6 of a tie must order identically across engines/summation
        orders (ties then break on centroid index — numpy's stable sort
        == the oracle's ORDER BY d, c). Same portability move as
        hyperplane_signs' sign rounding."""
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        vv = (m * m).sum(axis=1, keepdims=True)
        return np.round(vv - 2.0 * (m @ cents.T) + cc[None, :], 6)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        d = _dists(vecs)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    @F.pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        d = _dists(vecs)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    cb = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
        l2_norm(_as_double(vec_col)).alias("cn"),
        nearest(_as_double(vec_col)).alias("cluster"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        l2_norm(_as_double(vec_col)).alias("qn"),
        F.explode(probes(_as_double(vec_col))).alias("cluster"),
    )
    scored = (
        cb.join(F.broadcast(qb), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                sim_decimals,
            ).alias("sim"),
        )
        # one Exchange for dedup + top-k (same query_id clustering trick
        # as knn_lsh; guide §2.4)
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


# -- product quantization (PQ) ANN ------------------------------------------
#
# The memory-compression scale path (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", 2011): split each D-dim vector into M
# subvectors, quantize each against a per-subspace codebook of K
# centroids, and store M small codes per vector (M bytes at K<=256 —
# 32x smaller than float64). Search uses ASYMMETRIC distance (ADC): the
# full-precision query builds an M x K lookup table of subspace
# distances once, and each corpus vector's approximate distance is M
# table lookups summed — no decompression, no per-pair vector math.
#
# Determinism: every subspace distance is rounded to 6 dp and converted
# to an INTEGER micro-distance (x 1e6) before any summation, so the ADC
# sum is exact integer arithmetic — immune to float summation order —
# and the DuckDB oracle (queries/northstar.py knn_pq) reproduces every
# code and every distance bit-for-bit from the same md5-derived literal
# codebooks. Ties break on the smaller code / neighbor id.


def pq_codebooks(m: int, ksub: int, dim: int) -> list[list[list[float]]]:
    """Deterministic literal PQ codebooks: ``m`` subspaces of ``dim/m``
    dims, ``ksub`` centroids each, md5-derived like ``literal_centroids``
    (seed prefix "pq_"): c(s,k,j) = (md5_60bit('pq_s_k_j') % 2001
    - 1000)/1000. Literals let the encode/search semantics carry a full
    DuckDB oracle; production codebooks come from ``pq_train_codebooks``."""
    import hashlib

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return [
        [
            [
                (int(hashlib.md5(f"pq_{s}_{k}_{j}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
                / 1000.0
                for j in range(dsub)
            ]
            for k in range(ksub)
        ]
        for s in range(m)
    ]


def pq_train_codebooks(
    corpus: DataFrame,
    m: int,
    ksub: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
) -> list[list[list[float]]]:
    """Trained codebooks: per-subspace Lloyd k-means over the SLICED
    vectors (``kmeans_centroids`` per subspace — m small trainings, each
    a few scans; the corpus never shuffles)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    out = []
    for s in range(m):
        sliced = corpus.select(
            F.col(id_col), F.slice(_as_double(vec_col), s * dsub + 1, dsub).alias("_sub")
        )
        out.append(
            kmeans_centroids(
                sliced, id_col=id_col, vec_col="_sub", k=ksub,
                iterations=iterations, dim=dsub,
            )
        )
    return out


def _sub_dist_micro(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Integer micro-distances batch x m x ksub: round(||sub - c||^2, 6)
    * 1e6 as int64 — the one distance definition shared by encode,
    search and the SQL oracle."""
    b, (m, ksub, dsub) = len(vecs), books.shape
    subs = vecs.reshape(b, m, dsub)  # batch x m x dsub
    # ||s||^2 - 2 s.c + ||c||^2 per subspace
    d = (
        (subs ** 2).sum(axis=2)[:, :, None]
        - 2 * np.einsum("bmd,mkd->bmk", subs, books)
        + (books ** 2).sum(axis=2)[None, :, :]
    )
    return np.round(np.round(d, 6) * 1e6).astype(np.int64)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per subspace, the nearest centroid's index
    (micro-distance argmin, ties to the smaller code). One Arrow-batched
    einsum per batch — the corpus is scanned once, never shuffled."""
    books = np.asarray(codebooks, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        d = _sub_dist_micro(mat, books)  # batch x m x ksub
        return pd.Series(list(d.argmin(axis=2).astype(np.int32)))

    return df.select(F.col(id_col), encode(_as_double(vec_col)).alias("codes"))


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance: the corpus is scanned
    as codes (M ints per vector), each query carries its flattened m*ksub
    micro-distance table, and the approximate distance is an exact
    integer sum of M table lookups (JVM-side ``aggregate`` over the code
    array — no Python in the scoring loop).

    Plan: queries (with tables) broadcast; the encoded corpus streams
    map-side — the knn_bruteforce shape, but each corpus row is M ints
    instead of D floats. Returns (query_id, neighbor_id, adist_micro,
    rnk); ``adist_micro`` is the integer micro-distance (x 1e-6 = the
    rounded squared L2 ADC distance)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, _dsub = books.shape

    @F.pandas_udf("array<long>")
    def qtable(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        d = _sub_dist_micro(mat, books)  # batch x m x ksub
        return pd.Series(list(d.reshape(len(mat), m * ksub)))

    codes = pq_encode(corpus, codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), qtable(_as_double(vec_col)).alias("qtab")
    )
    # adist = sum_m qtab[m*ksub + codes[m]] — integer arithmetic, exact
    adist = F.expr(
        "aggregate(transform(codes, (c, i) -> element_at(qtab, i * "
        f"{ksub} + c + 1)), 0L, (acc, x) -> acc + x)"
    )
    scored = (
        codes.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adist.alias("adist_micro"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adist_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def _ivfpq_udfs(sc, cents_bytes, cents_shape, books_bytes, books_shape, n_probe):
    """The IVF-PQ pandas UDFs, memoized per (SparkContext weakly,
    centroids, codebooks, n_probe): defining a pandas UDF is a
    py4j/command round every call, and ``knn_ivf_pq`` (inline) re-created
    them all on every plan build (~300 gateway roundtrips, ~0.1 s of
    driver time per call at steady state). The closure state is derived
    ONLY from the cache key, so a cached entry is exactly the UDF the
    uncached path would build."""
    return _udf_memo(
        sc,
        ("ivfpq", cents_bytes, cents_shape, books_bytes, books_shape, n_probe),
        lambda: _build_ivfpq_udfs(
            cents_bytes, cents_shape, books_bytes, books_shape, n_probe
        ),
    )


def _build_ivfpq_udfs(cents_bytes, cents_shape, books_bytes, books_shape, n_probe):
    cents = np.frombuffer(cents_bytes, dtype=np.float64).reshape(cents_shape)
    cc = (cents * cents).sum(axis=1)
    books = np.frombuffer(books_bytes, dtype=np.float64).reshape(books_shape)
    m, ksub, _dsub = books.shape

    def _cdists(vecs: pd.Series) -> np.ndarray:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        vv = (mat * mat).sum(axis=1, keepdims=True)
        return np.round(vv - 2.0 * (mat @ cents.T) + cc[None, :], 6)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        return pd.Series(_cdists(vecs).argmin(axis=1).astype("int32"))

    @F.pandas_udf("array<int>")
    def res_codes(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        r = mat - cents[clusters.to_numpy()]
        d = _sub_dist_micro(r, books)
        return pd.Series(list(d.argmin(axis=2).astype(np.int32)))

    @F.pandas_udf("array<struct<cluster: int, qtab: array<bigint>>>")
    def probe_tables(vecs: pd.Series) -> pd.Series:
        # the probed clusters AND their per-cluster residual ADC tables in
        # ONE Arrow eval (r14, guide §4.5/§2.4): the split probes->explode
        # ->qtable formulation paid a second JVM<->Python roundtrip per
        # query batch and shipped the raw query vector through the explode
        # just to hand it back to Python. Per-row values are identical:
        # the same argsort picks the clusters and the same
        # _sub_dist_micro(vec - centroid) arithmetic fills each table —
        # elementwise per row, so batching per probe-slot instead of per
        # exploded row cannot change any value.
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        order = np.argsort(_cdists(vecs), axis=1, kind="stable")[:, :n_probe]
        tabs = [
            _sub_dist_micro(mat - cents[order[:, j]], books).reshape(
                len(mat), m * ksub
            )
            for j in range(order.shape[1])
        ]
        return pd.Series(
            [
                [
                    {"cluster": int(order[i, j]), "qtab": tabs[j][i].tolist()}
                    for j in range(order.shape[1])
                ]
                for i in range(len(mat))
            ]
        )

    return nearest, probe_tables, res_codes


def knn_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """Inline IVF-PQ search (the composition ``IVFIndex.build(pq_m=…)``
    materializes on disk, expressed over in-plan frames so LITERAL
    centroids + codebooks give it a full DuckDB oracle): corpus vectors
    assign to their nearest coarse centroid (distances rounded to 6 dp,
    ties to the smaller index — the knn_ivf convention), the RESIDUAL
    against that centroid is PQ-encoded, and each query scores the
    probed clusters' codes by the exact-integer ADC sum against its
    per-cluster residual tables. Returns (query_id, neighbor_id,
    adist_micro, rnk)."""
    cents = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, _dsub = books.shape
    nearest, probe_tables, res_codes = _ivfpq_udfs(
        corpus.sparkSession.sparkContext,
        cents.tobytes(), cents.shape, books.tobytes(), books.shape, n_probe,
    )

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import _persist_slot

    dv = _as_double(vec_col)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        dv.alias("_v"),
        nearest(dv).alias("cluster"),
    )
    # the encoded inverted lists are the index ARTIFACT (IVFIndex stores
    # them on disk); inline searches slot-persist them so the two Arrow
    # stages (assignment + residual encode) run once per corpus, not once
    # per query batch / repeated run — knn_rerank's stage 1 and the
    # standalone knn_ivf_pq share the same cached frame
    lists = _persist_slot(
        assigned.select(
            "neighbor_id", "cluster", res_codes("_v", "cluster").alias("codes")
        ),
        "similarity.ivfpq_lists",
    )
    qt = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_tables(dv)).alias("_pc"),
    ).select(
        "query_id",
        F.col("_pc.cluster").alias("cluster"),
        F.col("_pc.qtab").alias("qtab"),
    )
    adist = (
        "aggregate(transform(codes, (c, i) -> element_at(qtab, i * "
        f"{ksub} + c + 1)), 0L, (acc, x) -> acc + x)"
    )
    scored = (
        # each corpus vector lives in exactly ONE inverted list (cluster =
        # argmin), so a (query_id, neighbor_id) pair appears AT MOST ONCE
        # in this join — the old min()-GROUP BY dedup was an identity over
        # singleton groups and cost a double hash-aggregate per run (r14;
        # the top-k window below supplies the one hash(query_id) exchange)
        lists.join(F.broadcast(qt), "cluster")
        .filter("neighbor_id != query_id")
        .selectExpr("query_id", "neighbor_id", f"{adist} AS adist_micro")
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adist_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def knn_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 20,
    n_probe: int = 3,
) -> DataFrame:
    """Two-stage ANN search — the production retrieval pattern: an
    IVF-PQ coarse pass nominates ``rerank`` candidates per query by
    compressed-domain ADC distance, then ONLY those candidates are
    re-scored with the exact cosine against the raw vectors and the
    top ``k`` kept. PQ quantization error perturbs the coarse ranking;
    reranking restores exact ordering among survivors at the cost of
    fetching rerank (not |corpus|) raw vectors per query.

    Scale: stage 1 reads the ~32x-compressed codes of n_probe/k_cent of
    the corpus; stage 2 touches Q x rerank rows — the candidate join
    shuffles only (query_id, neighbor_id) pairs against the corpus and
    broadcasts the Q raw query vectors; the exact similarity is the
    JVM-side dot-product fold (no Python in stage 2). Returns
    (query_id, neighbor_id, sim, rnk) — same shape as knn_bruteforce,
    rounded before ranking with id tie-break (cross-engine stable)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import (
        dot_product_sql,
        l2_norm_sql,
    )

    cands = knn_ivf_pq(
        corpus, queries, centroids, codebooks, id_col, vec_col,
        k=rerank, n_probe=n_probe,
    ).select("query_id", "neighbor_id")
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    c = corpus.selectExpr(
        f"{id_col} AS neighbor_id", f"{dv} AS cv", f"{l2_norm_sql(dv)} AS cn"
    )
    q = queries.selectExpr(
        f"{id_col} AS query_id", f"{dv} AS qv", f"{l2_norm_sql(dv)} AS qn"
    )
    exact = (
        # broadcast the slim candidate pairs and STREAM the corpus: the
        # big side is never shuffled (nor auto-broadcast — at sf0.1 the
        # planner's estimates chose to broadcast the corpus VECTORS,
        # which is exactly backwards at scale; guide §3.1). The query
        # vector+norm are attached to the pairs BEFORE the broadcast
        # (both sides are Q-sized), so the corpus passes through ONE
        # BroadcastHashJoin instead of two (r14; guide §2.4). Build side
        # = Q x rerank pairs carrying one qv copy each — KBs at any Q.
        c.join(F.broadcast(cands.join(q, "query_id")), "neighbor_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"round({dot_product_sql('qv', 'cv')} / (qn * cn), 4) AS sim",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def radius_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 4,
) -> DataFrame:
    """Range (radius) similarity search: ALL corpus vectors with cosine
    similarity >= ``threshold`` per query — the fixed-radius complement
    of top-k (used for density probes, near-dup audits, coverage
    checks, where "how many are this close" matters more than "the
    closest k"). Returns (query_id, neighbor_id, sim), unranked.

    Scale: broadcast queries x map-side corpus scan with a JVM
    dot-product fold — one pass over the corpus, no shuffle at all
    (top-k needs the per-query rank exchange; a radius filter doesn't).
    For selective thresholds at 100 TB, feed the hyperplane-LSH bucket
    join (knn_lsh's candidate stage) in front and verify only
    collisions — same contract as dedup_embedding_cosine."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import dot_product, l2_norm
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.dedup import fan_out

    corpus = fan_out(corpus)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        l2_norm(_as_double(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
        l2_norm(_as_double(vec_col)).alias("cn"),
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                sim_decimals,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): vectors
    cluster to their nearest centroid; within each cluster the vector
    CLOSEST to the centroid survives as the representative and the rest
    are semantic duplicates of it. Returns one row per cluster:
    (cluster, n_members, rep_id, rep_dist) — the keep-list a corpus
    builder anti-joins against (dropping all non-representatives is the
    maximally aggressive setting; per-pair thresholds interpolate
    toward dedup_embedding_cosine).

    Distances round to 6 dp before the argmin with (distance, id) ties
    (the knn_ivf convention), so the representative choice is
    cross-engine deterministic.

    Scale: assignment is one Arrow-batched matmul pass; the per-cluster
    argmin is a max_by aggregation — one shuffle keyed on cluster id,
    carrying (id, dist) pairs only. k-means-trained centroids
    (kmeans_centroids) drop in for the literal ones unchanged."""
    cents = np.asarray(centroids, dtype=np.float64)
    cc = (cents * cents).sum(axis=1)

    def _cd(vecs: pd.Series) -> np.ndarray:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        vv = (m * m).sum(axis=1, keepdims=True)
        return np.round(vv - 2.0 * (m @ cents.T) + cc[None, :], 6)

    @F.pandas_udf("struct<cluster:int,dist:double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        d = _cd(vecs)
        idx = d.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": idx.astype("int32"),
                "dist": d[np.arange(len(idx)), idx],
            }
        )

    assigned = corpus.select(
        F.col(id_col).alias("member_id"),
        assign(_as_double(vec_col)).alias("a"),
    ).select("member_id", F.col("a.cluster").alias("cluster"), F.col("a.dist").alias("dist"))
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min_by(
                F.col("member_id"), F.struct(F.col("dist"), F.col("member_id"))
            ).alias("rep_id"),
            F.min("dist").alias("rep_dist"),
        )
        .orderBy("cluster")
    )
