"""Structured Streaming tier (SURVEY §2.10 — extension; the reference
has no streaming).

The batch window aggregations in the registry
(``ext_events_tumbling_daily`` / ``ext_events_sliding``) share their
plan shape with these streaming versions: ``readStream`` over the same
events schema → event-time window + watermark → sink. The watermark
here is Spark's *late-data* watermark (``withWatermark``), unrelated to
the IP-protection watermark the rest of the engine implements.

Scale notes: streaming state is keyed by (window, event_type) — O(1)
per key per trigger after partial aggregation; late rows beyond the
watermark are dropped instead of growing state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time window
    aggregation; works identically on a batch or streaming DataFrame —
    the watermark only binds in streaming mode."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return src.groupBy(win.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def stream_events_from_files(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source stream over an events directory (parquet files with
    the events schema, e.g. written by ``tools`` or a test fixture).
    ``max_files_per_trigger=None`` processes everything available in
    one micro-batch (replay/backfill mode)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)


def drain_to_memory(
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "complete",
    timeout_sec: int = 60,
) -> None:
    """THE memory-sink drain (review round 10: three hand-copied
    start/processAllAvailable/stop blocks lived across the streaming
    package): process everything available, then stop. ``timeout_sec``
    bounds the drain — ``processAllAvailable`` has no timeout of its
    own, so it runs on a worker thread and a wedged query is stopped
    and reported instead of hanging the caller forever.

    A failed query must FAIL the drain (ADVICE round 10): an exception
    inside ``processAllAvailable`` on the worker thread would otherwise
    die with the thread, ``join()`` would return normally, and the
    caller would read a partial/empty memory table as if the drain
    succeeded. The thread therefore captures its exception for the
    caller to re-raise, and ``q.exception()`` is checked as a backstop
    (a StreamingQueryException can surface there without ever raising
    through ``processAllAvailable``)."""
    import threading

    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .start()
    )
    err: list[BaseException] = []

    def _drain() -> None:
        try:
            q.processAllAvailable()
        except BaseException as e:  # re-raised on the caller thread
            err.append(e)

    try:
        drain = threading.Thread(target=_drain, daemon=True)
        drain.start()
        drain.join(timeout_sec)
        if drain.is_alive():
            raise TimeoutError(
                f"streaming query '{table_name}' did not drain within "
                f"{timeout_sec}s"
            )
        if err:
            raise err[0]
        q_err = q.exception()
        if q_err is not None:
            raise q_err
    finally:
        q.stop()


def run_to_memory_sink(
    stream_df: DataFrame, table_name: str, timeout_sec: int = 60
) -> None:
    """Drive a streaming aggregation to completion against a memory
    sink (test/demo harness, complete mode)."""
    drain_to_memory(stream_df, table_name, "complete", timeout_sec)
