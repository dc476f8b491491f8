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
    queries: DataFrame, base: DataFrame, k: int, exclude_self: bool = True
) -> DataFrame:
    """Exact cosine top-k: (src, dst, cos_sim, rank), rank 1-based by
    descending similarity, ties by dst. Same broadcast-base
    ``mapInPandas`` design as the kNN join; per-dim sequential
    accumulation keeps parity with the SQL fold."""
    sess = queries.sparkSession
    rows = base.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    bc = sess.sparkContext.broadcast((ids, X))
    kk = min(k, len(ids) - (1 if exclude_self else 0))

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
                out_rank = np.tile(np.arange(1, kk + 1, dtype=np.int32), m)
                for r in range(m):
                    sel = np.lexsort((b_ids, -r6[r]))[:kk]
                    out_dst[r * kk : (r + 1) * kk] = b_ids[sel]
                    out_cos[r * kk : (r + 1) * kk] = cos[r, sel]
                yield pd.DataFrame(
                    {"src": out_src, "dst": out_dst, "cos_sim": out_cos, "rank": out_rank}
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
