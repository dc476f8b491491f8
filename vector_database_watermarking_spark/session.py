"""SparkSession builder tuned for this engine.

Local-mode testing uses ``local[N]``; the configs below are the ones
that also matter on a real cluster (AQE, shuffle partitions, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vdb_wm_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Scale notes (100 TB design point): ``spark.sql.shuffle.partitions``
    here matches local cores, but AQE STARTS every exchange at
    ``initialPartitionNum`` = 8x that and coalesces down — one config
    that serves both ends of the scale range (measured, SCALING.md
    round 11): at sf0.1 the wide start is neutral-to-slightly-faster
    (AQE coalesces small stages back to a handful of partitions), and
    at the 600M-row sf100 fixture it is the difference between ~19M
    rows per shuffle partition (spill + GC thrash: Q8 at 73-190 s) and
    memory-resident partitions (41.7 s). Stateful STREAMING queries
    are unaffected — AQE is disabled there, so their state
    partitioning still comes from ``shuffle.partitions``, which is why
    that stays at core count rather than 8x. Arrow is on so pandas-UDF
    hot paths batch-transfer instead of pickling rows.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
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
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
