"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``vector_database_watermarking_spark``; this
module only adapts its registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_database_watermarking_spark.registry import QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the accessibility index (SURVEY G4) — kNN graph
    build + mutual-edge join + edge-length agg + z-score combine."""
    return QUERIES["g4_accessibility_index"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def isolated(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # drop persisted blocks left by earlier queries in the same
            # session: caching is an optimization only (an unpersisted
            # dependency recomputes, never changes results), and ~50
            # queries' worth of accumulated blocks causes spill + GC
            # pressure that distorts the later queries 5-10x
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        return run

    return {name: isolated(q.fn) for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
