"""Similarity search over embedding columns (north-star extension —
SURVEY §7 M6): brute-force cosine top-k as the exact baseline, an
IVF (inverted-file) variant as the scale path, and a cosine near-dup
threshold join.

Scale notes: brute-force broadcasts the base side (same contract as
``operators.knn``); IVF cuts the candidate set to ``nprobe`` clusters
of the base — the assignment join is an equi-join on cluster id, which
Catalyst shuffles by key (skew-split by AQE), so the O(n²) pair space
never materializes. Centroids come from MLlib KMeans (seeded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cosine

_RANK_DECIMALS = 6


def cosine_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    exclude_self: bool = True,
    n_base: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (src, dst, cos_sim, rank), rank 1-based by
    descending similarity, ties by dst.

    Same tier dispatch as ``knn.exact_knn``: one broadcast of the base
    while it fits (``knn.MAX_BROADCAST_ROWS``), otherwise hash-split
    blocks each contribute a local top-k and a per-query window merges
    them — no unconditional whole-base driver collect anywhere.
    """
    from .knn import MAX_BROADCAST_ROWS, split_blocks

    if n_base is None:
        n_base = base.count()
    if n_base <= MAX_BROADCAST_ROWS:
        return _cosine_topk_broadcast(queries, base, k, exclude_self)
    n_blocks = -(-n_base // MAX_BROADCAST_ROWS)
    blocks = [
        _cosine_topk_broadcast(queries, block, k, exclude_self)
        for block in split_blocks(base, n_blocks)
    ]
    union = blocks[0]
    for df in blocks[1:]:
        union = union.unionByName(df)
    w = Window.partitionBy("src").orderBy(
        F.round(F.col("cos_sim"), _RANK_DECIMALS).desc(), F.col("dst").asc()
    )
    return (
        union.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def _cosine_topk_broadcast(
    queries: DataFrame, base: DataFrame, k: int, exclude_self: bool
) -> DataFrame:
    """Broadcast-base cosine top-k via ``mapInPandas``; per-dim
    sequential accumulation keeps parity with the SQL fold."""
    sess = queries.sparkSession
    rows = base.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    bc = sess.sparkContext.broadcast((ids, X))
    # self-hits are masked per row (−inf key, sorts last, dropped), so
    # kk caps at the base size and disjoint queries keep min(k, n)
    kk = min(k, len(ids))
    if kk <= 0:
        return sess.createDataFrame(
            [], schema="src long, dst long, cos_sim double, rank int"
        )

    def topk(batches):
        b_ids, b_X = bc.value
        n, d = b_X.shape
        chunk = max(1, int(2e7 // max(n, 1)))  # bound (chunk, n) buffers
        bn = np.zeros((1, n))
        for i in range(d):
            bn[0, :] += b_X[:, i] * b_X[:, i]
        bnorm = np.sqrt(bn)
        for pdf in batches:
            all_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            all_Q = np.array(list(pdf["embedding"]), dtype=np.float64)
            for s in range(0, len(all_ids), chunk):
                q_ids = all_ids[s : s + chunk]
                Q = all_Q[s : s + chunk]
                m = len(q_ids)
                dot = np.zeros((m, n))
                qn = np.zeros((m, 1))
                for i in range(d):  # sequential fold parity with SQL
                    dot += Q[:, i : i + 1] * b_X[:, i][None, :]
                    qn[:, 0] += Q[:, i] * Q[:, i]
                cos = dot / (np.sqrt(qn) * bnorm)
                r6 = np.round(cos, _RANK_DECIMALS)
                if exclude_self:
                    r6[q_ids[:, None] == b_ids[None, :]] = -np.inf
                out_src = np.repeat(q_ids, kk)
                out_dst = np.empty(m * kk, dtype=np.int64)
                out_cos = np.empty(m * kk, dtype=np.float64)
                out_key = np.empty(m * kk, dtype=np.float64)
                out_rank = np.tile(np.arange(1, kk + 1, dtype=np.int32), m)
                for r in range(m):
                    sel = np.lexsort((b_ids, -r6[r]))[:kk]
                    out_dst[r * kk : (r + 1) * kk] = b_ids[sel]
                    out_cos[r * kk : (r + 1) * kk] = cos[r, sel]
                    out_key[r * kk : (r + 1) * kk] = r6[r, sel]
                keep = np.isfinite(out_key)
                yield pd.DataFrame(
                    {
                        "src": out_src[keep],
                        "dst": out_dst[keep],
                        "cos_sim": out_cos[keep],
                        "rank": out_rank[keep],
                    }
                )

    nparts = sess.sparkContext.defaultParallelism
    return queries.select("vec_id", "embedding").repartition(nparts).mapInPandas(
        topk, schema="src long, dst long, cos_sim double, rank int"
    )


def cosine_near_dups(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc/image dedup by
    representation): all pairs with cosine ≥ threshold, via the exact
    top-k machinery (k bounded by practical dup multiplicity)."""
    topk = cosine_topk(emb, emb, k=20, exclude_self=True)
    return (
        topk.filter(
            (F.col("cos_sim") >= threshold) & (F.col("src") < F.col("dst"))
        )
        .select("src", "dst", F.round("cos_sim", 6).alias("cos_sim"))
    )


def ivf_build_fixed(
    emb: DataFrame, n_clusters: int = 8
) -> tuple[DataFrame, np.ndarray]:
    """Deterministic IVF index (the oracle-checkable tier): centroids
    are the ``n_clusters`` vectors with the smallest keyed hash of
    their id — a partitioning-invariant spread sample, reproducible in
    SQL — and assignment is argmin squared distance (6-decimal rounded,
    ties to the lowest centroid index). KMeans (:func:`ivf_build`)
    gives better-balanced lists; this tier trades that for a
    cross-engine-checkable routing path with the identical plan shape.
    """
    from ..functions.hashing import hash60

    key = hash60(F.concat(F.lit("ivf_"), F.col("vec_id").cast("string")))
    cent_rows = (
        emb.select("vec_id", "embedding")
        .withColumn("_k", key)
        .orderBy("_k", "vec_id")
        .limit(n_clusters)
        .collect()
    )
    centroids = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    assigned = emb.select(
        "vec_id", "embedding", _argmin_cluster("embedding", centroids).alias("cluster")
    )
    return assigned, centroids


def _centroid_dists(emb_col: str, centroids: np.ndarray) -> list:
    """Per-centroid squared distances (rounded to ranking precision),
    as native fold expressions — codegen'd, fold-parity with DuckDB's
    ``list_sum(list_transform(...))``."""
    from ..functions.distance import squared_euclidean

    out = []
    for c in centroids:
        lit = F.array(*[F.lit(float(v)) for v in c])
        out.append(F.round(squared_euclidean(emb_col, lit), _RANK_DECIMALS))
    return out


def _argmin_cluster(emb_col: str, centroids: np.ndarray):
    dists = _centroid_dists(emb_col, centroids)
    best = F.least(*dists)
    expr = F.when(dists[0] == best, 0)
    for ci in range(1, len(dists)):
        expr = expr.when(dists[ci] == best, ci)
    return expr.cast("int")


def ivf_route_fixed(
    queries: DataFrame, centroids: np.ndarray, nprobe: int
) -> DataFrame:
    """Route each query to its ``nprobe`` nearest centroids with a
    native explode + per-query window (no UDF): (vec_id, embedding,
    cluster) with ``nprobe`` rows per query."""
    dists = _centroid_dists("embedding", centroids)
    pairs = F.array(
        *[
            F.struct(d.alias("dist"), F.lit(ci).cast("int").alias("cluster"))
            for ci, d in enumerate(dists)
        ]
    )
    exploded = queries.select(
        "vec_id", "embedding", F.explode(pairs).alias("p")
    ).select("vec_id", "embedding", "p.dist", "p.cluster")
    w = Window.partitionBy("vec_id").orderBy("dist", "cluster")
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select("vec_id", "embedding", "cluster")
    )


def ivf_build(
    emb: DataFrame, n_clusters: int = 16, seed: int = 42, max_iter: int = 5
) -> tuple[DataFrame, np.ndarray]:
    """IVF index: seeded MLlib KMeans centroids + cluster assignment.
    Returns (assigned DataFrame with ``cluster`` column, centroids)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="features")
    model = km.fit(feat)
    assigned = model.transform(feat).select(
        "vec_id", "embedding", F.col("prediction").alias("cluster")
    )
    centroids = np.array(model.clusterCenters())
    return assigned, centroids


def ivf_search(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """IVF probe: route each query to its ``nprobe`` nearest centroids,
    then exact top-k within those clusters only.

    The query→cluster fan-out is tiny (nprobe rows per query); the
    candidate join is an equi-join on ``cluster``; the final top-k is a
    per-query window. At 1000 executors this is the textbook ANN
    sharding: clusters ≈ partitions, probes touch nprobe/n_clusters of
    the data.
    """
    sess = queries.sparkSession
    bc = sess.sparkContext.broadcast(centroids)

    def route(batches):
        C = bc.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            Q = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            probes = np.argsort(d2, axis=1)[:, :nprobe]
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(q_ids, nprobe),
                    "cluster": probes.reshape(-1).astype(np.int32),
                }
            )
            emb_rep = [e for e in pdf["embedding"] for _ in range(nprobe)]
            out["embedding"] = emb_rep
            yield out

    routed = queries.select("vec_id", "embedding").mapInPandas(
        route, schema="vec_id long, cluster int, embedding array<float>"
    )
    return _ivf_rank_candidates(routed, assigned, k)


def ivf_search_fixed(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """IVF probe over the deterministic index (:func:`ivf_build_fixed`):
    all-native routing (explode + per-query window) feeding the same
    cluster equi-join + per-query top-k as the KMeans tier — the whole
    path is cross-engine reproducible and oracle-checked."""
    routed = ivf_route_fixed(queries, centroids, nprobe)
    return _ivf_rank_candidates(routed, assigned, k)


def _ivf_rank_candidates(routed: DataFrame, assigned: DataFrame, k: int) -> DataFrame:
    """Shared IVF tail: candidate equi-join on cluster id, exact cosine
    on candidates only, per-query top-k window (rank-limit pushed
    map-side by WindowGroupLimit)."""
    cand = routed.alias("q").join(
        assigned.select(
            F.col("vec_id").alias("dst"),
            F.col("embedding").alias("b_emb"),
            "cluster",
        ).alias("b"),
        on="cluster",
    ).filter(F.col("q.vec_id") != F.col("dst"))

    sim = cand.select(
        F.col("q.vec_id").alias("src"),
        F.col("dst"),
        cosine(F.col("q.embedding"), F.col("b_emb")).alias("cos_sim"),
    )
    w = Window.partitionBy("src").orderBy(
        F.round(F.col("cos_sim"), _RANK_DECIMALS).desc(), F.col("dst")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )
