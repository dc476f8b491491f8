"""Incremental view maintenance (extension — SURVEY §2.10/§2.11): a
grouped aggregate MATERIALIZED VIEW kept exactly consistent with a
CDC-maintained base table, without ever rescanning the base.

``cdc.py`` maintains the base snapshot; this module additionally
maintains ``SELECT group, count(*), sum(expr) GROUP BY group`` as its
own versioned snapshot. Per micro-batch the update is delta-only:

1. the batch's key set selects the affected base rows (semi-join —
   partition-pruned/co-located when the base is bucketed by key);
2. their per-group contributions are aggregated BEFORE the merge
   (the retraction) and AFTER it (the new state);
3. the view becomes ``view − old + new`` per group (one broadcast-
   sized combine — group cardinality, not table cardinality), groups
   reaching ``n_rows = 0`` are dropped.

Only SUM-decomposable measures qualify (count/sum — and avg/stddev
via sum-of-powers); a median could not be maintained this way, which
is exactly the classic IVM boundary. All measures are integer sums,
so ``view == recompute`` is exact, not approximate — the replay gate
(``stream_agg_ivm_replay``) asserts it against the one-shot MERGE
oracle's group aggregate.

Scale notes: per trigger the work is two key-pruned scans of the
affected buckets plus a |groups|-row combine; the full base is never
re-aggregated. This is the standard lakehouse pattern for keeping a
dashboard rollup fresh under a change stream at 100 TB, where
``REFRESH MATERIALIZED VIEW`` (a full rescan) costs hours.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import apply_changes
from . import cdc


def group_contrib(
    df: DataFrame, group_col: str, value_expr: str
) -> DataFrame:
    """(group, n_rows, sum_value) — the maintained shape."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(value_expr)).cast("long").alias("sum_value"),
    )


def init_view(
    base: DataFrame, agg_dir: str, group_col: str, value_expr: str
) -> None:
    """Materialize v0 of the view from the initial base."""
    cdc.init_table(group_contrib(base, group_col, value_expr), agg_dir)


def _combine(
    view: DataFrame, old: DataFrame, new: DataFrame, group_col: str
) -> DataFrame:
    """view − old + new per group; zero-row groups dropped."""

    def tag(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            group_col,
            (F.col("n_rows") * sign).alias("n_rows"),
            (F.col("sum_value") * sign).alias("sum_value"),
        )

    return (
        tag(view, 1)
        .unionByName(tag(old, -1))
        .unionByName(tag(new, 1))
        .groupBy(group_col)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
        )
        .filter(F.col("n_rows") > 0)
    )


def apply_batch(
    batch_df: DataFrame,
    table_dir: str,
    agg_dir: str,
    group_col: str,
    value_expr: str,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
    retain: int = 2,
) -> None:
    """One IVM trigger: retract the affected keys' old contributions,
    MERGE the batch into the base, add the new contributions, commit
    both snapshots.

    REPLAY-IDEMPOTENT (the property ``foreachBatch`` requires after a
    failure re-delivers a batch): re-applying a batch finds the base
    already merged, so ``apply_changes`` is a no-op (insert-or-replace
    with identical payloads, delete of absent keys) and the retraction
    equals the new state — the view delta is exactly zero. Asserted by
    test."""
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    keys = batch_df.select(key).distinct()
    base = cdc.read_current(spark, table_dir)
    old = group_contrib(
        base.join(keys, on=key, how="left_semi"), group_col, value_expr
    )
    merged = apply_changes(base, batch_df, key=key, seq=seq, op=op)
    # `new` reads the in-plan `merged`, not a committed snapshot,
    # so the trigger is one unit: base and view commit together.
    new = group_contrib(
        merged.join(keys, on=key, how="left_semi"), group_col, value_expr
    )
    view = cdc.read_current(spark, agg_dir)
    updated = _combine(view, old, new, group_col)
    with open(os.path.join(table_dir, "_CURRENT")) as fh:
        cur = int(fh.read().strip().lstrip("v"))
    cdc._commit_snapshot(merged, table_dir, cur + 1)
    with open(os.path.join(agg_dir, "_CURRENT")) as fh:
        acur = int(fh.read().strip().lstrip("v"))
    cdc._commit_snapshot(updated, agg_dir, acur + 1)
    if retain:
        cdc.vacuum(table_dir, retain)
        cdc.vacuum(agg_dir, retain)


def ivm_agg_stream(
    changes_stream: DataFrame,
    table_dir: str,
    agg_dir: str,
    group_col: str,
    value_expr: str,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
    checkpoint_dir: str | None = None,
    retain: int = 2,
):
    """Start the continuous MERGE + view maintenance. Each micro-batch
    commits a new base snapshot (exactly ``cdc.cdc_apply_stream``) AND
    the delta-updated view snapshot; both resolve through version
    pointers so readers never see a half-written state. Returns the
    StreamingQuery (caller stops it)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(
            batch_df,
            table_dir,
            agg_dir,
            group_col,
            value_expr,
            key=key,
            seq=seq,
            op=op,
            retain=retain,
        )

    writer = changes_stream.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
