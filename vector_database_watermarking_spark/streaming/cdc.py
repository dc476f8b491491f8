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
from pyspark.sql import functions as F

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
    """Resolve the snapshot pointer and read the current base table.
    On a bucketed-layout table the internal partition column is
    dropped — readers see the same schema either way."""
    df = spark.read.parquet(
        os.path.join(table_dir, f"v{current_version(table_dir)}")
    )
    return df.drop(BUCKET_COL) if bucket_spec(table_dir) else df


def init_table(base: DataFrame, table_dir: str) -> None:
    """Write snapshot v0 and the pointer."""
    base.write.mode("overwrite").parquet(os.path.join(table_dir, "v0"))
    _stamp_commit_ts(table_dir, 0)
    with open(_pointer_path(table_dir), "w") as fh:
        fh.write("v0")


def _flip_pointer(table_dir: str, version: int) -> None:
    tmp = _pointer_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"v{version}")
    os.replace(tmp, _pointer_path(table_dir))  # atomic pointer flip


def _stamp_commit_ts(table_dir: str, version: int) -> None:
    """Record the commit wall-clock (epoch microseconds) inside the
    snapshot dir, before the pointer flip — the basis for
    timestamp-based time travel (``read_as_of``). Underscore-prefixed,
    so parquet readers skip it; a crash after the stamp but before the
    flip orphans the whole dir as usual.

    The stamp is clamped to strictly exceed the previous version's —
    raw wall-clock can step backwards (NTP) or collide within a
    microsecond, and ``read_as_of`` picks the max version with
    ``cts <= ts``, so a non-monotonic stamp would let AS OF an earlier
    commit's own instant resolve to a LATER snapshot. Same contract as
    a lakehouse in-commit timestamp (ADVICE round 11)."""
    import time

    ts = int(time.time() * 1_000_000)
    if version > 0:
        prev = commit_ts(table_dir, version - 1)
        if prev is not None:
            ts = max(ts, prev + 1)
    with open(os.path.join(table_dir, f"v{version}", "_COMMIT_TS"), "w") as fh:
        fh.write(str(ts))


def commit_ts(table_dir: str, version: int) -> int | None:
    """Commit wall-clock of a retained snapshot (epoch microseconds),
    or None for snapshots written before the stamp existed."""
    try:
        with open(
            os.path.join(table_dir, f"v{version}", "_COMMIT_TS")
        ) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def version_history(table_dir: str) -> list[tuple[int, int | None]]:
    """(version, commit_ts_us) for every retained committed snapshot,
    ascending — the time-travel catalog with timestamps."""
    return [(v, commit_ts(table_dir, v)) for v in list_versions(table_dir)]


def read_as_of(spark: SparkSession, table_dir: str, ts_us: int) -> DataFrame:
    """Timestamp time travel: the table AS OF ``ts_us`` (epoch
    microseconds) — the newest retained snapshot whose commit time is
    ≤ the asked-for instant, exactly the lakehouse ``AS OF TIMESTAMP``
    contract. Raises when the instant predates the oldest RETAINED
    snapshot (either the table didn't exist yet or vacuum dropped the
    version that was live then — both are unanswerable and say so)."""
    best = None
    for v, cts in version_history(table_dir):
        if cts is not None and cts <= ts_us:
            best = v if best is None else max(best, v)
    if best is None:
        raise FileNotFoundError(
            f"no retained snapshot under {table_dir} committed at or "
            f"before ts={ts_us} (the table did not exist yet, or vacuum "
            "removed the version live at that instant)"
        )
    return read_version(spark, table_dir, best)


def _commit_snapshot(df: DataFrame, table_dir: str, version: int) -> None:
    df.write.mode("overwrite").parquet(os.path.join(table_dir, f"v{version}"))
    _stamp_commit_ts(table_dir, version)
    _flip_pointer(table_dir, version)


# --------------------------------------------------- bucketed layout
# VERDICT r10 #4: the plain layout rewrites the FULL snapshot per
# trigger — O(snapshot) regardless of batch size. The bucketed layout
# makes the rewrite O(changed buckets): v0 is written partitioned by
# _bucket = pmod(xxhash64(key), n_buckets); each commit writes only the
# buckets the batch's keys land in and HARD-LINKS every other bucket's
# immutable data files from the previous version (same filesystem, so a
# link is a metadata operation; vacuuming an old version just drops its
# links — a file lives until no retained version references it). Every
# version stays a complete, self-contained snapshot — the pointer flip,
# time travel, vacuum, and the readers-never-see-a-half-write invariant
# are untouched. This is the parquet analogue of a table format's
# bucket index (e.g. Hudi's): at 100 TB the equivalent is bucketed
# table layout + copy-on-write of touched files only.
#
# Hash bucketing spreads uniform keys across all buckets, so the win is
# |changed buckets| / n_buckets: a trickle batch (keys ≲ n_buckets)
# rewrites a few buckets; a batch with keys >> n_buckets degrades to
# the plain full rewrite (measured in SCALING.md). Choose n_buckets so
# the steady-state batch key count stays below it.

BUCKET_COL = "_bucket"


def _buckets_meta_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_BUCKETS")


def bucket_spec(table_dir: str) -> tuple[int, str] | None:
    """(n_buckets, key) when the table uses the bucketed snapshot
    layout, else None. The layout is a property of the TABLE (recorded
    at init), so apply_once / ivm.apply_batch adapt automatically."""
    try:
        with open(_buckets_meta_path(table_dir)) as fh:
            n, key = fh.read().strip().split("\n")[:2]
            return int(n), key
    except FileNotFoundError:
        return None


def _bucket_expr(key: str, n_buckets: int):
    # cast to string so the hash is stable across integer widths;
    # xxhash64 is seed-fixed in Spark — deterministic across sessions
    return F.pmod(
        F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)
    ).cast("int")


def init_table_bucketed(
    base: DataFrame, table_dir: str, key: str = "doc_id", n_buckets: int = 64
) -> None:
    """Write snapshot v0 in the bucketed layout plus the _BUCKETS spec
    and the pointer."""
    # repartition BY THE BUCKET COLUMN first: partitionBy alone writes
    # one file per (task, bucket) — tasks x buckets small files;
    # bucket-aligned tasks write ~one file per bucket instead
    df = base.withColumn(BUCKET_COL, _bucket_expr(key, n_buckets))
    df.repartition(n_buckets, F.col(BUCKET_COL)).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(os.path.join(table_dir, "v0"))
    with open(_buckets_meta_path(table_dir), "w") as fh:
        fh.write(f"{n_buckets}\n{key}")
    _stamp_commit_ts(table_dir, 0)
    _flip_pointer(table_dir, 0)


def refuse_null_keys(batch_df: DataFrame, key: str) -> None:
    """Refuse a change batch carrying a NULL merge key, by name
    (review round 12 — the round-11 guard lived in the bucket-routing
    path only, so the plain layout silently committed the same
    permanently-unmergeable row): the merge join matches on key
    equality, where NULL never equals NULL, so a null-keyed insert
    could never be updated or deleted again and a null-keyed
    update/delete silently no-ops. One cheap take(1) on the (small by
    construction) change batch, shared by BOTH snapshot layouts and
    the IVM trigger."""
    if batch_df.where(F.col(key).isNull()).take(1):
        raise ValueError(
            f"CDC batch contains NULL merge key '{key}': a null key "
            "can never be matched for update or delete (NULL != NULL "
            "in the merge join) — filter or repair null-keyed change "
            "rows upstream"
        )


def changed_buckets(batch_df: DataFrame, key: str, n_buckets: int) -> list[int]:
    """Bucket ids the batch's keys land in (≤ n_buckets ints — a
    driver-side bound by construction, not a data-sized collect).

    A NULL merge key is additionally refused here (ADVICE round 11;
    belt to :func:`refuse_null_keys`' braces — this one rides the
    distinct-collect the bucketed path already pays, so it is free):
    Spark's ``xxhash64`` hashes a NULL input to the bare seed (42),
    so a null-keyed row WOULD silently route to a real bucket — made
    explicit as None via the when() below and raised by name."""
    ids = [
        r[0]
        for r in batch_df.select(
            F.when(
                F.col(key).isNull(), F.lit(None)
            ).otherwise(_bucket_expr(key, n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    ]
    if any(b is None for b in ids):
        raise ValueError(
            f"CDC batch contains NULL merge key '{key}': a null key "
            "can never be matched for update or delete (NULL != NULL "
            "in the merge join) — filter or repair null-keyed change "
            "rows upstream"
        )
    return sorted(ids)


def read_version_buckets(
    spark: SparkSession, table_dir: str, version: int, buckets: list[int]
) -> DataFrame:
    """Partition-pruned read of only the given buckets of a committed
    snapshot (internal: callers pass versions they just resolved)."""
    df = spark.read.parquet(os.path.join(table_dir, f"v{version}"))
    return df.filter(F.col(BUCKET_COL).isin(buckets)).drop(BUCKET_COL)


def _commit_snapshot_bucketed(
    merged_changed: DataFrame,
    table_dir: str,
    version: int,
    changed: list[int],
    n_buckets: int,
    key: str,
) -> None:
    """Commit ``v{version}`` from ``merged_changed`` — the post-merge
    content of ONLY the changed buckets — plus hard links to every
    unchanged bucket of ``v{version-1}``. Bytes written scale with the
    changed buckets; the rest is filesystem metadata."""
    vdir = os.path.join(table_dir, f"v{version}")
    merged_changed.withColumn(
        BUCKET_COL, _bucket_expr(key, n_buckets)
    ).repartition(max(len(changed), 1), F.col(BUCKET_COL)).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(vdir)
    changed_set = set(changed)
    prev = os.path.join(table_dir, f"v{version - 1}")
    for name in os.listdir(prev):
        if not name.startswith(f"{BUCKET_COL}="):
            continue
        if int(name.split("=", 1)[1]) in changed_set:
            continue
        src_d, dst_d = os.path.join(prev, name), os.path.join(vdir, name)
        os.makedirs(dst_d, exist_ok=True)
        for fn in os.listdir(src_d):
            # link only data files: '_' skips SUCCESS/metadata markers,
            # '.' skips local-FS .part-*.crc checksums — harmless for
            # reads but they'd inflate bytes accounting and directory
            # diffs (ADVICE round 11)
            if not fn.startswith(("_", ".")):
                os.link(os.path.join(src_d, fn), os.path.join(dst_d, fn))
    if not any(n.startswith(f"{BUCKET_COL}=") for n in os.listdir(vdir)):
        # a commit that empties the ENTIRE table: a partitioned write
        # of zero rows leaves no parquet footer to infer a schema from,
        # so the snapshot would be unreadable (the plain layout writes
        # a schema-carrying empty file; this one can't). Refuse before
        # the pointer flip — the previous version stays live.
        raise ValueError(
            f"bucketed commit v{version} under {table_dir} would empty "
            "the entire table; the bucketed layout cannot represent a "
            "zero-row snapshot — drop/re-init the table instead"
        )
    _stamp_commit_ts(table_dir, version)
    _flip_pointer(table_dir, version)


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
    df = spark.read.parquet(vdir)
    return df.drop(BUCKET_COL) if bucket_spec(table_dir) else df


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
    refuse_null_keys(batch_df, key)
    spark = batch_df.sparkSession
    cur = current_version(table_dir)  # one pointer read per trigger
    spec = bucket_spec(table_dir)
    if spec:
        # bucketed layout: merge against ONLY the buckets the batch
        # touches (a key's bucket is deterministic, so every insert/
        # update/delete is confined to them) and commit those buckets
        # plus hard links to the rest — O(changed buckets) per trigger
        n_buckets, bkey = spec
        if bkey != key:
            raise ValueError(
                f"table at {table_dir} is bucketed by '{bkey}' but the "
                f"merge key is '{key}'"
            )
        changed = changed_buckets(batch_df, key, n_buckets)
        base = read_version_buckets(spark, table_dir, cur, changed)
        merged = apply_changes(base, batch_df, key=key, seq=seq, op=op)
        _commit_snapshot_bucketed(
            merged, table_dir, cur + 1, changed, n_buckets, key
        )
    else:
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
