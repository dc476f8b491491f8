"""Streaming CDC apply (extension — SURVEY §2.10/§2.11 combined): a
live change-log stream continuously MERGEd into a parquet base table
via ``foreachBatch`` over ``operators.merge.apply_changes``.

This is the lakehouse ingestion loop without a table format: each
micro-batch of (key, payload..., seq, op) rows is collapsed last-wins
and full-outer-merged with the current base snapshot, and the result
atomically replaces it (write to a new versioned directory, then flip
a pointer file — parquet has no transactional overwrite, so the
pointer IS the commit; readers resolve the pointer and never see a
half-written snapshot).

Why ``foreachBatch`` and not a streaming join: MERGE is not an
append-only computation (updates and deletes rewrite prior output),
so it cannot be a watermark-evicted streaming operator; the batch
merge inside ``foreachBatch`` is the supported Spark shape for
stateful sinks, and it reuses the exact batch operator — one MERGE
definition for both modes.

Scale notes: per trigger the cost is one key-shuffle of the (small)
change batch plus one co-located join against the base (bucketed by
key on disk at 100 TB); rewriting only the buckets that received
changes — partition-pruned by joining the change-key set against the
bucket index — is the standard refinement and composes with
``operators.maintenance.compact`` for the file layout. Micro-batch
replays are safe: ``apply_changes`` is idempotent on a replayed batch
(insert is insert-or-replace, delete of an absent key is a no-op).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import apply_changes


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_CURRENT")


def current_version(table_dir: str) -> int:
    """Parse the commit pointer (the ONE place the ``vN`` format is
    interpreted — review round 10 found four hand-copied parsers). A
    missing pointer means the directory was never ``init_table``'d (or
    was created externally) — say so, rather than leaking the raw
    open() FileNotFoundError (ADVICE round 10)."""
    try:
        with open(_pointer_path(table_dir)) as fh:
            return int(fh.read().strip().lstrip("v"))
    except FileNotFoundError:
        raise FileNotFoundError(
            f"CDC table at {table_dir} is not initialized: no _CURRENT "
            "commit pointer (call init_table first; a directory created "
            "outside this module has no committed snapshots)"
        ) from None


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    """Resolve the snapshot pointer and read the current base table."""
    return spark.read.parquet(
        os.path.join(table_dir, f"v{current_version(table_dir)}")
    )


def init_table(base: DataFrame, table_dir: str) -> None:
    """Write snapshot v0 and the pointer."""
    base.write.mode("overwrite").parquet(os.path.join(table_dir, "v0"))
    with open(_pointer_path(table_dir), "w") as fh:
        fh.write("v0")


def _commit_snapshot(df: DataFrame, table_dir: str, version: int) -> None:
    vdir = f"v{version}"
    df.write.mode("overwrite").parquet(os.path.join(table_dir, vdir))
    tmp = _pointer_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(vdir)
    os.replace(tmp, _pointer_path(table_dir))  # atomic pointer flip


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time travel: read snapshot ``vN`` directly (it must still be
    retained — ``vacuum`` with ``retain=0`` disabled, or ``version``
    within the retain window). A version PAST the commit pointer is
    refused: the pointer flip IS the commit, so a ``vN`` directory
    above it is a crashed writer's half-written orphan — reading it
    would silently return a partial snapshot, violating the module's
    readers-never-see-a-half-write invariant (review round 10)."""
    cur = current_version(table_dir)
    if version > cur:
        raise FileNotFoundError(
            f"snapshot v{version} is past the commit pointer v{cur} under "
            f"{table_dir} — never committed (a crashed writer may have "
            "left a partial directory); the next commit will overwrite it"
        )
    vdir = os.path.join(table_dir, f"v{version}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"snapshot v{version} not present under {table_dir} — vacuumed, "
            "or never committed"
        )
    return spark.read.parquet(vdir)


def list_versions(table_dir: str) -> list[int]:
    """Retained COMMITTED snapshot versions, ascending (time-travel
    catalog). Directories past the commit pointer are excluded — they
    are crashed-writer orphans, not snapshots (see read_version). An
    uninitialized table dir (no pointer) has zero committed snapshots
    by definition, so this returns [] rather than raising — stray
    ``vN`` directories there are unreadable-as-snapshots anyway
    (ADVICE round 10)."""
    try:
        cur = current_version(table_dir)
    except FileNotFoundError:
        return []
    return sorted(
        int(name[1:])
        for name in os.listdir(table_dir)
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= cur
    )


def apply_once(
    batch_df: DataFrame,
    table_dir: str,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
    retain: int = 2,
) -> None:
    """Batch-mode single MERGE commit — exactly one trigger of
    :func:`cdc_apply_stream` without a stream around it (backfill /
    deterministic-order replays / tests)."""
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    cur = current_version(table_dir)  # one pointer read per trigger
    base = spark.read.parquet(os.path.join(table_dir, f"v{cur}"))
    merged = apply_changes(base, batch_df, key=key, seq=seq, op=op)
    _commit_snapshot(merged, table_dir, cur + 1)
    if retain:
        vacuum(table_dir, retain)


def vacuum(table_dir: str, retain: int = 2) -> list[str]:
    """Delete snapshot directories older than the ``retain`` most
    recent (the current one is always kept). Returns removed names.
    Without this, every micro-batch leaves a full table copy behind —
    the parquet analogue of a table format's VACUUM; ``retain > 1``
    keeps a grace window for readers that resolved the pointer just
    before a flip."""
    import shutil

    cur = current_version(table_dir)
    removed = []
    for name in sorted(os.listdir(table_dir)):
        if not name.startswith("v") or not name[1:].isdigit():
            continue
        if int(name[1:]) == cur:
            continue  # the live snapshot is never deleted, even retain=0
        if int(name[1:]) <= cur - retain:
            shutil.rmtree(os.path.join(table_dir, name))
            removed.append(name)
    return removed


def cdc_apply_stream(
    changes_stream: DataFrame,
    table_dir: str,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
    checkpoint_dir: str | None = None,
    retain: int = 2,
):
    """Start the continuous MERGE: every micro-batch of the change
    stream is applied to the current snapshot and committed as the
    next version; superseded snapshots past ``retain`` are vacuumed
    per trigger (``retain=0`` disables GC, keeping every version for
    time travel). Returns the StreamingQuery (caller stops it)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_once(batch_df, table_dir, key=key, seq=seq, op=op, retain=retain)

    writer = changes_stream.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
