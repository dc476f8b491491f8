"""IVF erasure vs full rebuild — the write-cost measurement behind
``similarity.ivf_erase`` (VERDICT r12 #4: "bytes-rewritten vs
full-rebuild measured at two scales").

Two scales (sf1 = 20k vectors, sf10 = 200k — the bench_sf10 rotated
replicas, built on demand) × two victim shapes:

- **scattered**: ~1 % of keys uniformly (``vec_id % 101 == 0``) — the
  adversarial case for selective rewrite: with v victims across C
  clusters, every cluster is touched once v ≳ C (the same crossover
  the bucketed-CDC bench measured for batch keys vs buckets), so
  bytes_rewritten ≈ the whole index and the win over rebuild is only
  skipping the assignment compute (the cluster ids are read from
  disk instead of recomputed against every centroid).
- **localized**: half of one cluster's members — the favorable case
  (one tenant / one source shard deleted): bytes_rewritten ≈ 1/C of
  the index, everything else untouched on disk.

Per cell: wall + audit of ``ivf_erase`` against wall + bytes of the
honest full rebuild (argmin re-assignment of the survivors under the
same centroids + full partitioned rewrite — centroid training
excluded from both sides). Emits one JSON line per cell with the
host-contention calibration (`effective_cores`) embedded, per the
round-10 graded-artifact rule.

Usage: python tools/bench_ivf_erase.py  (quiet host; ~2 min)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import effective_cores
from vector_database_watermarking_spark.operators import similarity
from vector_database_watermarking_spark.operators.maintenance import (
    parquet_file_stats,
)
from vector_database_watermarking_spark.session import get_spark

SF1_EMB = "/root/repo/_scratch/sf1/embeddings.parquet"
SF10_DIR = "/root/repo/_scratch/sf10"
BENCH_DIR = "/root/repo/_scratch/ivf_erase_bench"
N_CLUSTERS = 16


def main() -> None:
    spark = get_spark(
        "bench-ivf-erase", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    if not os.path.isdir(os.path.join(SF10_DIR, "embeddings.parquet")):
        from bench_sf10 import build_emb

        build_emb(spark, 100, SF10_DIR)
    cores, workers = effective_cores()
    for tag, path in (
        ("sf1", SF1_EMB),
        ("sf10", os.path.join(SF10_DIR, "embeddings.parquet")),
    ):
        emb = (
            spark.read.parquet(path)
            .select("vec_id", "embedding")
            .localCheckpoint(eager=True)
        )
        assigned, cents = similarity.ivf_build_fixed(emb, n_clusters=N_CLUSTERS)
        master = f"{BENCH_DIR}/{tag}/master"
        shutil.rmtree(master, ignore_errors=True)
        similarity.save_ivf_index(assigned, cents, master)
        # one cluster's members, for the localized scenario
        loc_cluster = 0
        scenarios = {
            "scattered_1pct": emb.filter(F.col("vec_id") % 101 == 0),
            "localized_half_cluster": assigned.filter(
                (F.col("cluster") == loc_cluster) & (F.col("vec_id") % 2 == 0)
            ),
        }
        for scen, victims_df in scenarios.items():
            victims = victims_df.select("vec_id").localCheckpoint(eager=True)
            idx = f"{BENCH_DIR}/{tag}/{scen}"
            shutil.rmtree(idx, ignore_errors=True)
            shutil.copytree(master, idx)
            spark.catalog.clearCache()
            t0 = time.time()
            audit = similarity.ivf_erase(spark, idx, victims)
            t_erase = time.time() - t0
            # honest full rebuild under the SAME centroids: re-assign
            # every survivor, full partitioned rewrite
            rb = f"{BENCH_DIR}/{tag}/{scen}__rebuild"
            shutil.rmtree(rb, ignore_errors=True)
            spark.catalog.clearCache()
            t0 = time.time()
            surv = emb.join(victims, "vec_id", "left_anti").select(
                "vec_id",
                "embedding",
                similarity._argmin_cluster("embedding", cents).alias("cluster"),
            )
            similarity.save_ivf_index(surv, cents, rb)
            t_rebuild = time.time() - t0
            rebuild_bytes = parquet_file_stats(f"{rb}/assigned")["total_bytes"]
            print(
                json.dumps(
                    {
                        "scale": tag,
                        "scenario": scen,
                        "n_vectors": emb.count(),
                        "n_clusters": N_CLUSTERS,
                        "rows_erased": audit["rows_erased"],
                        "clusters_touched": audit["clusters_touched"],
                        "bytes_rewritten": audit["bytes_rewritten"],
                        "bytes_index": audit["bytes_total_before"],
                        "bytes_full_rebuild": rebuild_bytes,
                        "write_ratio": round(
                            audit["bytes_rewritten"] / max(rebuild_bytes, 1), 4
                        ),
                        "sec_erase": round(t_erase, 3),
                        "sec_rebuild": round(t_rebuild, 3),
                        "calibration": {
                            "effective_cores": round(cores, 1),
                            "probe_workers": workers,
                        },
                    }
                ),
                flush=True,
            )
            shutil.rmtree(rb, ignore_errors=True)
            shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
