"""Per-stage attribution for one registry query (guide §1/§7).

Usage: python tools/profile_query.py <query> [reps]

Runs the query with the Spark UI enabled, then reads the REST API's
stage summaries: per stage, wall duration, total task time, input /
shuffle-read / shuffle-write bytes, and the first line of the stage's
call site. Sorted by task time — the 'which operator is actually hot'
answer that wall-clock alone cannot give on an over-subscribed host.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from vector_database_watermarking_spark.registry import QUERIES


def get_spark_ui(cpus: int = 32) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(cpus * 8),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = "/root/testdata/sf0.001"
    spark = get_spark_ui()

    import bench

    fns = {n: QUERIES[n].fn for n in QUERIES}
    fns.update(bench.BENCH_EXTRA)
    fn = fns[name]
    try:
        fn(spark, warm).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass
    spark.catalog.clearCache()
    gc.collect()

    # find the first new stage id so warmup stages are excluded
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"
    with urllib.request.urlopen(f"{base}/stages") as r:
        pre = {s["stageId"] for s in json.load(r)}

    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{name}: wall min={best:.3f}s over {reps} rep(s)  [ALL reps below]")

    with urllib.request.urlopen(f"{base}/stages") as r:
        stages = [s for s in json.load(r) if s["stageId"] not in pre]
    rows = []
    for s in stages:
        rows.append(
            (
                s.get("executorRunTime", 0),
                s["stageId"],
                s["status"],
                s.get("numCompleteTasks", s.get("numTasks", 0)),
                s.get("inputBytes", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("description") or s.get("name", ""))[:60],
                (s.get("details", "").splitlines() or [""])[0][:90],
            )
        )
    rows.sort(reverse=True)
    print(
        f"{'taskms':>8} {'id':>4} {'tasks':>5} {'in':>9} {'shR':>9} "
        f"{'shW':>9}  name / callsite"
    )
    for tt, sid, st, nt, ib, srb, swb, nm, det in rows:
        print(f"{tt:>8} {sid:>4} {nt:>5} {ib:>9} {srb:>9} {swb:>9}  {nm} | {det}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
