"""Stream-stream interval join (SURVEY §2.10 extension — the reference
has no streaming; this is the live form of the batch temporal joins in
``operators.temporal``).

Joins two event streams on a key with a bounded event-time interval:
every left event pairs with the right events for the same key whose
timestamp falls in ``[left_ts, left_ts + horizon]`` (attribution-style:
a view joined to the purchases it could have led to). Spark's
stream-stream inner join requires exactly this shape — an equi-join
component plus a two-sided time-range condition — so that the state
store can expire buffered rows once the other side's watermark passes
the range bound.

State/scale notes (100 TB design point):

- Both sides carry a ``withWatermark``; combined with the range
  condition Spark derives a state-eviction watermark per side, so
  per-key buffered state is bounded by ``horizon + lateness``, not by
  stream length — the join never accumulates unbounded state.
- The join itself shuffles both streams once on the join key
  (hash-partitioned state store); skewed keys are split by AQE in the
  batch tier and bounded per-trigger in streaming by
  ``maxFilesPerTrigger`` / rate limits upstream.
- The same expression runs on batch DataFrames (tested equivalence):
  batch is the replay/backfill tier, streaming the live tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l",
    right_prefix: str = "r",
    how: str = "inner",
) -> DataFrame:
    """Interval join: pairs ``left`` and ``right`` rows sharing ``on``
    with ``right_ts ∈ [left_ts, left_ts + horizon]``.

    Works identically on batch and streaming inputs; on streams both
    sides are watermarked so join state is evictable. Output columns
    are prefixed (``l_ts``, ``r_ts``, ...) so the two sides stay
    distinguishable without ambiguous references.

    ``how="left_outer"`` emits unmatched left rows null-padded — in
    streaming, only once the watermark passes ``left_ts + horizon``
    (no earlier emission is possible: a match could still arrive), so
    outer results trail the inner ones by the watermark delay. The
    range condition plus both-sided watermarks is exactly the shape
    Spark requires for outer stream-stream joins to certify state
    eviction; without them the query is rejected at analysis time.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_join: unsupported how={how!r}")

    def _prefixed(df: DataFrame, prefix: str, ts: str) -> DataFrame:
        renamed = df.select(
            [F.col(c).alias(f"{prefix}_{c}") for c in df.columns]
        )
        if df.isStreaming:
            renamed = renamed.withWatermark(f"{prefix}_{ts}", watermark)
        return renamed

    lf = _prefixed(left, left_prefix, left_ts)
    rf = _prefixed(right, right_prefix, right_ts)
    lts = F.col(f"{left_prefix}_{left_ts}")
    rts = F.col(f"{right_prefix}_{right_ts}")
    cond = (
        (F.col(f"{left_prefix}_{on}") == F.col(f"{right_prefix}_{on}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {horizon}"))
    )
    return lf.join(rf, cond, how)


def attribution_join_streams(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """View→purchase attribution over two live event streams: each view
    pairs with the same user's purchases within ``horizon``. Compact
    projection of :func:`interval_join` for the demo/test harness."""
    joined = interval_join(
        views,
        purchases,
        on="user_id",
        horizon=horizon,
        watermark=watermark,
        left_prefix="v",
        right_prefix="p",
    )
    return joined.select(
        F.col("v_user_id").alias("user_id"),
        F.col("v_event_id").alias("view_id"),
        F.col("v_ts").alias("view_ts"),
        F.col("p_event_id").alias("purchase_id"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("p_value").alias("purchase_value"),
    )


def run_to_append_sink(
    stream_df: DataFrame, table_name: str, timeout_sec: int = 60
) -> None:
    """Drive a stream-stream join to completion against a memory sink
    in append mode (joins emit append-only), then stop."""
    from .windows import drain_to_memory

    drain_to_memory(stream_df, table_name, "append", timeout_sec)
