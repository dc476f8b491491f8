"""One decade further (VERDICT r08 #7): sf10-scale runs of the three
operators whose 100 TB story rests on sublinearity measured across a
single decade — ``ext_incremental_dedup``, ``ext_bigram_nll``, and the
signature-collapsed LSH near-dup path (``ext_emb_near_dups_lsh`` plus
the ``knn_join(exact=False)`` tier itself).

Fixture construction (documents: 500k = 100 sf0.1 replicas with a
replica-tagged tail token; embeddings: 200k = 100 sf0.1 replicas):
embeddings use a PER-REPLICA DIMENSION PERMUTATION instead of the sf1
harness's one-dim nudge. A permutation preserves every intra-replica
distance and cosine exactly (each replica's near-dup structure is
bit-for-bit sf0.1's), while cross-replica vectors decorrelate — so the
true pair volume grows LINEARLY in replicas instead of quadratically.
The sf1 nudge construction turns every vector into a true 10-clique
(fine for output-bound analysis, degenerate for a 100× scaling claim:
at 100 replicas it would manufacture 100-cliques and any engine would
be quadratic in its own output).

Each query runs at sf0.1, sf1* and sf10 in the same session (one warmup
+ timed run each); sf1* here is the 10-replica PERMUTATION corpus, not
_scratch/sf1, so the three points are the same distribution family.

Usage: python tools/bench_sf10.py [--build-only|--run-only]
Prints one JSON line per (query, scale).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC_SF = "/root/testdata/sf0.1"
OUT_BASE = "/root/repo/_scratch"
DOC_OFFSET = 1 << 24
VEC_OFFSET = 1 << 24
D = 64


def build_scale(spark, replicas: int, out_dir: str) -> None:
    if os.path.isdir(os.path.join(out_dir, "embeddings.parquet")):
        return
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(os.path.join(SRC_SF, "documents.parquet"))
    parts = []
    for r in range(replicas):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * DOC_OFFSET)).alias("doc_id"),
                (
                    F.col("text")
                    if r == 0
                    else F.concat(F.col("text"), F.lit(f" replica{r}tag"))
                ).alias("text"),
                "lang",
                "source",
                (
                    F.col("n_chars")
                    if r == 0
                    else F.col("n_chars") + F.lit(len(f" replica{r}tag"))
                ).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SRC_SF, "embeddings.parquet"))
    eparts = []
    for r in range(replicas):
        perm = list(range(D))
        if r:
            random.Random(1000 + r).shuffle(perm)
        permuted = F.array(
            *[F.element_at("embedding", perm[i] + 1) for i in range(D)]
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * VEC_OFFSET)).alias("vec_id"),
                (F.col("embedding") if r == 0 else permuted).alias("embedding"),
                "label",
            )
        )
    out = eparts[0]
    for p in eparts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def timed(fn, spark, sf_dir: str) -> tuple[float, int]:
    df = fn(spark, sf_dir)
    rows = df.count()  # warmup: plan + fill caches
    t0 = time.monotonic()
    rows = fn(spark, sf_dir).count()
    return time.monotonic() - t0, rows


def main() -> None:
    from vector_database_watermarking_spark.registry import QUERIES
    from vector_database_watermarking_spark.operators.knn import knn_join
    from vector_database_watermarking_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(
        "bench-sf10", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    scales = {"sf1perm": 10, "sf10": 100}
    for tag, reps in scales.items():
        build_scale(spark, reps, os.path.join(OUT_BASE, tag))
    if mode == "--build-only":
        spark.stop()
        return

    run_dirs = [
        ("sf0.1", SRC_SF),
        ("sf1perm", os.path.join(OUT_BASE, "sf1perm")),
        ("sf10", os.path.join(OUT_BASE, "sf10")),
    ]
    for qname in ("ext_incremental_dedup", "ext_bigram_nll", "ext_emb_near_dups_lsh"):
        fn = QUERIES[qname].fn
        for tag, d in run_dirs:
            wall, rows = timed(fn, spark, d)
            print(
                json.dumps(
                    {"query": qname, "scale": tag, "wall_sec": round(wall, 2), "rows": rows}
                ),
                flush=True,
            )

    # the signature-collapsed LSH kNN tier itself (knn.py:60-186)
    for tag, d in run_dirs:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        t0 = time.monotonic()
        rows = knn_join(emb, emb, k=10, exact=False).count()
        print(
            json.dumps(
                {
                    "query": "knn_join_lsh",
                    "scale": tag,
                    "wall_sec": round(time.monotonic() - t0, 2),
                    "rows": rows,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
