"""Parquet sources for the engine (SURVEY §2.1, S1-S4).

The reference loads dense numpy arrays from HDF5
(``/root/reference/watermarking.py:30-37``); our collection is a
parquet table ``embeddings(vec_id bigint, embedding array<float>,
label int)`` with an explicit primary key (the reference's key is the
implicit row index, which loses identity under deletion — see SURVEY
J5 note).

Scale notes: reads are plain ``spark.read.parquet`` so Catalyst pushes
filters (the head/tail slices become parquet row-group skipping on the
``vec_id`` min/max stats) and prunes columns. At 100 TB the embeddings
table would be written partitioned/bucketed by ``vec_id`` ranges;
nothing here assumes single-file input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the fixture tables from a scale-factor directory.

    The ``events`` table's ``ts`` column has shipped in two physical
    forms across testdata generations: nanosecond int64 (rejected by
    Spark's reader unless ``nanosAsLong`` is set, then surfaced as
    ``bigint``) and naive ``timestamp[us]`` (surfaced as
    ``TIMESTAMP_NTZ`` since Spark infers NTZ for non-UTC-adjusted
    parquet timestamps). Both are normalised here to a plain
    ``TIMESTAMP`` so every downstream query sees one type; the
    NTZ→TIMESTAMP cast and PySpark's collect both go through the
    session time zone, so wall-clock values round-trip unchanged and
    match DuckDB's naive reading of the same file.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_embeddings(spark: SparkSession, sf_dir: str, num_samples: int | None = None) -> DataFrame:
    """Vector-collection scan, head-sliced like the reference's
    ``load_data(file_path, num_samples)`` (``watermarking.py:30-37``).

    The slice is a pushed-down predicate on the key, not a ``limit`` —
    deterministic under any partitioning.
    """
    df = load_table(spark, sf_dir, "embeddings")
    if num_samples is not None:
        df = df.filter(F.col("vec_id") < num_samples)
    return df


def head_slice(df: DataFrame, key: str, n: int) -> DataFrame:
    """S1: first-n-by-key slice (``watermarking.py:30-37``)."""
    return df.filter(F.col(key) < n)


def tail_slice(df: DataFrame, key: str, n: int, total: int) -> DataFrame:
    """S2: last-n rows, like ``f['train'][-60001:-1]`` at
    ``t_vector/e1_steath_vector.py:11-12``."""
    return df.filter((F.col(key) >= total - n) & (F.col(key) < total))


def union_new_from_back(base: DataFrame, pool: DataFrame, key: str, k: int) -> DataFrame:
    """S3: append up to k rows from ``pool`` whose key is not already in
    ``base`` (``roubust/roubust.py:37-47`` dedup-scan). Left-anti join,
    then the first k fresh rows *in key order* — a bare ``limit`` would
    be partitioning-dependent (the reference scans its file backward,
    which is an order too). The anti join broadcasts whichever side is
    small under AQE."""
    fresh = (
        pool.join(base.select(key), on=key, how="left_anti")
        .orderBy(key)
        .limit(k)
    )
    return base.unionByName(fresh)
