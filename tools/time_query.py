"""Time individual registry / bench-extra queries with the noop sink.

Usage: python tools/time_query.py <query> [query ...] [--reps N]

Same methodology as bench.py (warmup at sf0.001, clearCache + gc
between attempts, min over reps) but for a hand-picked subset — the
fast inner loop for optimization work so a single-query change does
not pay the full 40-query bench to measure.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_watermarking_spark.registry import QUERIES
from vector_database_watermarking_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("time_query")

    import bench

    fns = {n: QUERIES[n].fn for n in QUERIES}
    fns.update(bench.BENCH_EXTRA)

    import pandas as pd
    from pyspark.sql import functions as F

    def _noopf(batches):
        for _ in batches:
            yield pd.DataFrame({"x": [1]})

    spark.range(64).repartition(32).mapInPandas(_noopf, "x long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).agg(
        F.count(F.lit(1))
    ).collect()
    for name in names:
        try:
            fns[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    for name in names:
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(samples):.3f}s samples="
            f"[{', '.join(f'{s:.3f}' for s in samples)}]"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
