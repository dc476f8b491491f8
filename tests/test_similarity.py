"""Similarity-search operator tests (SQ tier)."""

from pyspark.sql import functions as F


def test_sq_topk_recall_and_codes(spark, sf_dir):
    """SQ candidate scan + exact rerank must (a) quantize into [0,255],
    (b) recover most of the exact top-k (the integer metric is a
    contraction of the float one, so top-20 refine at d=64 keeps
    recall high), and (c) return exactly k rows per query."""
    from vector_database_watermarking_spark.operators.similarity import (
        sq_bounds,
        sq_codes,
        sq_topk,
    )
    from vector_database_watermarking_spark.operators.knn import knn_edges
    from vector_database_watermarking_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    lo, hi = sq_bounds(emb)
    assert lo < hi
    rng = emb.select(
        F.array_min(sq_codes("embedding", lo, hi)).alias("mn"),
        F.array_max(sq_codes("embedding", lo, hi)).alias("mx"),
    ).agg(F.min("mn"), F.max("mx")).head()
    assert rng[0] >= 0 and rng[1] <= 255

    queries = emb.filter(F.col("vec_id") < 50)
    got = sq_topk(queries, emb, k=5, refine=20).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r["src"], set()).add(r["dst"])
    assert all(len(v) == 5 for v in per_src.values())

    exact = knn_edges(emb, k=5)
    exact_pairs = {
        (r["src"], r["dst"]) for r in exact.filter(F.col("src") < 50).collect()
    }
    sq_pairs = {(r["src"], r["dst"]) for r in got}
    recall = len(sq_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_pq_topk_recall_codes_and_tiers(spark, sf_dir):
    """PQ ADC scan + exact rerank must (a) emit codes within the
    codebook range, (b) recover >= 0.9 of the exact top-k at the
    registered configuration (m=16, 64 centroids, refine=50), (c)
    return exactly k rows per query, and (d) produce identical output
    from the broadcast and hash-split block tiers."""
    import numpy as np

    from vector_database_watermarking_spark.operators import knn
    from vector_database_watermarking_spark.operators.similarity import (
        _pq_micro_tables,
        pq_codebook,
        pq_topk,
    )
    from vector_database_watermarking_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    cents = pq_codebook(rows, m=16, ksub=64)
    assert cents.shape == (64, 64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    r6, mic = _pq_micro_tables(X, cents, 16)
    codes = np.stack([np.argmin(r6[j], axis=1) for j in range(16)], axis=1)
    assert codes.min() >= 0 and codes.max() < 64
    assert (mic >= 0).all()

    queries = emb.filter(F.col("vec_id") < 50)
    got = pq_topk(queries, emb, k=5, refine=50, m=16, nbits=6).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r["src"], set()).add(r["dst"])
    assert all(len(v) == 5 for v in per_src.values())

    exact_pairs = {
        (r["src"], r["dst"])
        for r in knn.knn_edges(emb, k=5).filter(F.col("src") < 50).collect()
    }
    pq_pairs = {(r["src"], r["dst"]) for r in got}
    recall = len(pq_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, recall

    broadcast = sorted(
        (r["src"], r["dst"], round(r["dist"], 6), r["rank"]) for r in got
    )
    orig = knn.MAX_BROADCAST_ROWS
    try:
        knn.MAX_BROADCAST_ROWS = 100  # force the hash-split block tier
        blocked = sorted(
            (r["src"], r["dst"], round(r["dist"], 6), r["rank"])
            for r in pq_topk(queries, emb, k=5, refine=50, m=16, nbits=6).collect()
        )
    finally:
        knn.MAX_BROADCAST_ROWS = orig
    assert broadcast == blocked
