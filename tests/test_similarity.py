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
