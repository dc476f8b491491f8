"""Streaming deduplication (extension, SURVEY §2.10 / §7 M6): drop
duplicate event deliveries from an at-least-once stream.

``dropDuplicatesWithinWatermark`` keeps per-key state only for the
late-data horizon (the event-time watermark), so state is O(keys per
watermark window) instead of O(all keys ever seen) — the property that
makes streaming dedup viable on an unbounded 100 TB/day feed. Exact
dedup keys on the delivery id (``event_id``); content-level dedup keys
on the payload columns, mirroring the batch ``operators.dedup`` tiers.

Measured (``tools/bench_streaming.py``, SCALING.md): 463k events/sec on
one local[32] host over a 2M-row at-least-once feed. 100 TB/day is
~12M 100-byte events/sec — ~25 such hosts at the measured rate, with
the key-sharded state store scaling horizontally alongside.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """First-delivery-wins dedup of a stream: duplicates of a key
    arriving within the watermark horizon are dropped; rows older than
    the horizon are late data and are dropped wholesale by the
    watermark itself.

    ``watermark`` must cover the source's out-of-order horizon —
    including replay/backfill disorder, not just steady-state lag. The
    event-time watermark advances to max(ts) − horizon after every
    micro-batch, so replaying historical data in several batches with
    a small horizon silently discards old-but-never-seen rows as late
    (data loss, not dedup). For a backfill, either set ``watermark``
    to at least the replayed time span or deliver the backfill in one
    micro-batch (``max_files_per_trigger=None``)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_dedup_stream(
    spark, dir_path: str, key_cols: Sequence[str] = ("event_id",),
    watermark: str = "1 hour", table_name: str = "deduped_events",
    max_files_per_trigger: int | None = None, timeout_sec: int = 120,
) -> int:
    """Drive the dedup stream over all available files (append-mode
    memory sink) and return the number of surviving rows. Defaults to
    one micro-batch (replay-safe: the watermark cannot advance between
    files); pass ``max_files_per_trigger`` with a sufficiently large
    ``watermark`` to exercise multi-batch state. ``timeout_sec`` bounds
    the drain — raise it for large directories or loaded hosts (review
    round 12: the 120 s default used to be unoverridable)."""
    from .windows import stream_events_from_files

    stream = stream_events_from_files(
        spark, dir_path, max_files_per_trigger=max_files_per_trigger
    )
    deduped = dedup_stream(stream, key_cols=key_cols, watermark=watermark)
    from .windows import drain_to_memory

    drain_to_memory(deduped, table_name, "append", timeout_sec=timeout_sec)
    return spark.sql(f"SELECT count(*) AS n FROM {table_name}").head()["n"]
