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
    here matches local cores; on a cluster it should be ~2-3x total
    cores (or left to AQE coalescing, which is enabled). Arrow is on so
    pandas-UDF hot paths batch-transfer instead of pickling rows.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
