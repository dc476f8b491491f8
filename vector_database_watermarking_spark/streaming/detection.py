"""Streaming watermark detection (extension, SURVEY §2.10): run the
native-parity group/classify + majority vote over a *stream* of
vectors — detection statistics update continuously as data arrives.

This is the natural streaming capability of the scheme: the detection
aggregate (A1/A2) is an incremental groupBy, so Structured Streaming
maintains it with O(L·2) state; no reprocessing as the collection
grows. The classification projection is stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import key_dims
from ..operators.grouping import classify

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def stream_embeddings_from_files(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def streaming_group_counts(
    stream: DataFrame, L: int, d: int, seed: int = 20
) -> DataFrame:
    """A1 on a stream: running (group_id, hidden_bit) counts."""
    dims = key_dims(d, seed)
    cls = classify(stream, dims, L=L, d=d)
    return cls.groupBy("group_id", "hidden_bit").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


def decode_from_counts(counts_rows: list, L: int | None = None) -> str:
    """A2 driver-side: majority vote per group from the (group_id,
    hidden_bit, n_vectors) rows of the streaming sink. Pass ``L`` so
    groups with no vectors yet still decode (to '0', the majority-vote
    tie default) instead of truncating the bitstring."""
    ones: dict[int, int] = {}
    totals: dict[int, int] = {}
    seen_L = 0
    for r in counts_rows:
        gid = r["group_id"]
        seen_L = max(seen_L, gid + 1)
        totals[gid] = totals.get(gid, 0) + r["n_vectors"]
        if r["hidden_bit"] == 1:
            ones[gid] = ones.get(gid, 0) + r["n_vectors"]
    L = seen_L if L is None else L
    return "".join(
        "1" if 2 * ones.get(g, 0) > totals.get(g, 0) else "0" for g in range(L)
    )


def run_detection_stream(
    spark: SparkSession,
    dir_path: str,
    L: int,
    d: int,
    seed: int = 20,
    table_name: str = "wm_counts",
) -> str:
    """Drive the detection stream over all available files and decode
    the watermark from the final counts (complete-mode memory sink)."""
    stream = stream_embeddings_from_files(spark, dir_path)
    counts = streaming_group_counts(stream, L=L, d=d, seed=seed)
    q = (
        counts.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT group_id, hidden_bit, n_vectors FROM {table_name}").collect()
    return decode_from_counts(rows, L=L)
