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

Crash consistency: the base and the view are two snapshot pointers,
so a trigger cannot flip both in one filesystem operation. Instead
every view snapshot is STAMPED with the base version it reflects
(``vN/_BASE_VERSION`` — underscore-prefixed, so parquet readers skip
it), and ``apply_batch`` starts by comparing the stamp against the
base pointer. A crash between the base commit and the view commit
leaves ``stamp < base`` — the re-delivered batch (Structured
Streaming only advances its checkpoint after ``foreachBatch``
returns) takes the HEAL path: the missed delta is recomputed from
the retained pre-merge base snapshot (``view − contrib(base@stamp ⋉
keys) + contrib(base@current ⋉ keys)``) and only the view is
committed. The happy path, the crash-replay path, and the
already-healed replay path all converge to ``view == recompute``;
asserted by ``test_ivm_crash_between_commits_heals_on_replay``.
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


def _stamp_path(agg_dir: str, version: int) -> str:
    return os.path.join(agg_dir, f"v{version}", "_BASE_VERSION")


def _read_stamp(agg_dir: str, version: int, default: int) -> int:
    """Base version this view snapshot reflects (``default`` for
    pre-stamp legacy snapshots, trusted as current)."""
    try:
        with open(_stamp_path(agg_dir, version)) as fh:
            return int(fh.read().strip().lstrip("v"))
    except FileNotFoundError:
        return default


def _commit_view(
    df: DataFrame, agg_dir: str, version: int, base_version: int
) -> None:
    """Commit a view snapshot stamped with the base version it
    reflects. Write order: parquet dir, stamp inside it, pointer flip
    last — a crash anywhere before the flip leaves the old snapshot
    live and the orphan dir is overwritten on the next attempt."""
    vdir = f"v{version}"
    df.write.mode("overwrite").parquet(os.path.join(agg_dir, vdir))
    cdc._stamp_commit_ts(agg_dir, version)  # view supports AS OF too
    with open(_stamp_path(agg_dir, version), "w") as fh:
        fh.write(f"v{base_version}")
    tmp = cdc._pointer_path(agg_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(vdir)
    os.replace(tmp, cdc._pointer_path(agg_dir))


def init_view(
    base: DataFrame,
    agg_dir: str,
    group_col: str,
    value_expr: str,
    base_version: int = 0,
) -> None:
    """Materialize v0 of the view from the initial base, stamped with
    the base version it reflects (v0 right after ``cdc.init_table``)."""
    cdc.init_table(group_contrib(base, group_col, value_expr), agg_dir)
    with open(_stamp_path(agg_dir, 0), "w") as fh:
        fh.write(f"v{base_version}")


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
    the base snapshot then the stamped view snapshot.

    REPLAY-IDEMPOTENT across every crash point ``foreachBatch`` can
    re-deliver through (the checkpoint only advances after this
    returns), case-split on the view's base-version stamp:

    - stamp == base (no crash, or crash BEFORE the base commit): the
      normal path. A clean re-delivery finds ``apply_changes`` a
      no-op (insert-or-replace with identical payloads, delete of
      absent keys) and retraction == new state → view delta zero.
    - stamp <  base (crash BETWEEN the base commit and the view
      commit — the torn window): the base already holds this batch,
      so re-running the merge-then-retract would compute a zero delta
      and permanently drop the batch from the view. Instead the HEAL
      path recomputes the missed delta against the retained pre-merge
      snapshot: ``view − contrib(base@stamp ⋉ keys) +
      contrib(base@current ⋉ keys)``, committing only the view. The
      pre-merge snapshot exists because vacuum runs after both
      commits — a crash inside the torn window never reached it.
    - stamp >  base cannot occur (the view commit always follows the
      base commit) and raises.

    Asserted by ``test_ivm_crash_between_commits_heals_on_replay``."""
    if not batch_df.take(1):
        return
    cdc.refuse_null_keys(batch_df, key)
    spark = batch_df.sparkSession
    keys = batch_df.select(key).distinct()
    bcur = cdc.current_version(table_dir)
    acur = cdc.current_version(agg_dir)
    stamp = _read_stamp(agg_dir, acur, default=bcur)
    if stamp > bcur:
        raise RuntimeError(
            f"view snapshot v{acur} is stamped with base v{stamp} but the "
            f"base pointer is at v{bcur}; the base directory was rewound "
            "or is not owned by this IVM trigger"
        )
    view = cdc.read_current(spark, agg_dir)
    # bucketed base (cdc.init_table_bucketed — VERDICT r10 #4): every
    # base read below is partition-pruned to the buckets the batch's
    # keys land in, and the base commit rewrites ONLY those buckets
    # (hard-linking the rest), making the per-trigger base cost
    # O(changed buckets) instead of O(snapshot). The layout is a table
    # property, so the trigger adapts with no API change.
    spec = cdc.bucket_spec(table_dir)
    changed: list[int] = []
    if spec and spec[1] != key:
        raise ValueError(
            f"base table at {table_dir} is bucketed by '{spec[1]}' but "
            f"the merge key is '{key}'"
        )
    if spec:
        changed = cdc.changed_buckets(batch_df, key, spec[0])

    def _read_base(version: int):
        if spec:
            return cdc.read_version_buckets(spark, table_dir, version, changed)
        return spark.read.parquet(os.path.join(table_dir, f"v{version}"))

    if stamp == bcur:
        base = _read_base(bcur)
        old = group_contrib(
            base.join(keys, on=key, how="left_semi"), group_col, value_expr
        )
        merged = apply_changes(base, batch_df, key=key, seq=seq, op=op)
        if spec:
            cdc._commit_snapshot_bucketed(
                merged, table_dir, bcur + 1, changed, spec[0], key
            )
        else:
            cdc._commit_snapshot(merged, table_dir, bcur + 1)
        # compute `new` from the JUST-WRITTEN snapshot, not `merged`'s
        # lineage: the view commit would otherwise re-run the full-
        # outer MERGE a second time inside its own write (review round
        # 10 — two merge joins per trigger on the hot path). The
        # read-back is a key-pruned scan of the committed parquet —
        # exactly what every other reader of v{bcur+1} sees — and the
        # crash ordering is unchanged (base commit still precedes the
        # view commit; the pre-merge v{bcur} survives until the
        # post-commit vacuum, so `old`'s lineage stays readable).
        fresh = _read_base(bcur + 1)
        new = group_contrib(
            fresh.join(keys, on=key, how="left_semi"), group_col, value_expr
        )
        updated = _combine(view, old, new, group_col)
        _commit_view(updated, agg_dir, acur + 1, base_version=bcur + 1)
    else:
        # torn window: base@stamp is the pre-merge snapshot this view
        # reflects; base@bcur already contains the re-delivered batch.
        prev = os.path.join(table_dir, f"v{stamp}")
        if not os.path.isdir(prev):
            raise RuntimeError(
                f"cannot heal torn IVM commit: pre-merge base snapshot "
                f"v{stamp} was vacuumed (view is at base v{stamp}, base "
                f"pointer at v{bcur})"
            )
        old = group_contrib(
            _read_base(stamp).join(keys, on=key, how="left_semi"),
            group_col,
            value_expr,
        )
        new = group_contrib(
            _read_base(bcur).join(keys, on=key, how="left_semi"),
            group_col,
            value_expr,
        )
        updated = _combine(view, old, new, group_col)
        _commit_view(updated, agg_dir, acur + 1, base_version=bcur)
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
