"""Streaming CDC apply (streaming/cdc.py): the foreachBatch MERGE loop
must converge to the same table as the one-shot batch MERGE."""

import time

import pyspark.sql.functions as F
from pyspark.sql import types as T

from vector_database_watermarking_spark.operators.merge import apply_changes
from vector_database_watermarking_spark.streaming import cdc

CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("val", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _rows(ids, val, seq0, op):
    return [(i, val(i), seq0 + j, op) for j, i in enumerate(ids)]


def test_cdc_stream_converges_to_batch_merge(spark, tmp_path):
    base = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("val")
    )
    table_dir = str(tmp_path / "table")
    cdc.init_table(base, table_dir)
    assert sorted(r["doc_id"] for r in cdc.read_current(spark, table_dir).collect()) == list(range(100))

    batch1 = _rows(range(10), lambda i: i * 10 + 1, 100, "update") + _rows(
        range(100, 105), lambda i: i * 10, 120, "insert"
    ) + _rows(range(50, 55), lambda i: None, 140, "delete")
    batch2 = _rows(range(5), lambda i: None, 200, "delete") + _rows(
        range(100, 102), lambda i: i * 10 + 2, 220, "update"
    ) + _rows([105], lambda i: i * 10, 240, "insert")

    src_dir = str(tmp_path / "changes")
    for b in (batch1, batch2):
        spark.createDataFrame(b, CHANGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = cdc.cdc_apply_stream(
        stream, table_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # two non-empty micro-batches → two commits past v0
    with open(f"{table_dir}/_CURRENT") as fh:
        assert fh.read().strip() == "v2"
    # default retain=2 vacuums superseded snapshots (v0), keeps a
    # one-version grace window (v1) plus current (v2)
    import os

    versions = sorted(d for d in os.listdir(table_dir) if d.startswith("v"))
    assert versions == ["v1", "v2"], versions

    got = {
        (r["doc_id"], r["val"])
        for r in cdc.read_current(spark, table_dir).collect()
    }
    all_changes = spark.createDataFrame(batch1 + batch2, CHANGES_SCHEMA)
    expected = {
        (r["doc_id"], r["val"])
        for r in apply_changes(base, all_changes).collect()
    }
    assert got == expected
    # spot semantics: 0-4 deleted, 5-9 updated, 50-54 deleted,
    # 100-101 updated after insert, 105 inserted late
    d = dict(got)
    for i in range(5):
        assert i not in d
    for i in range(5, 10):
        assert d[i] == i * 10 + 1
    for i in range(50, 55):
        assert i not in d
    assert d[100] == 1002 and d[101] == 1012 and d[105] == 1050


def test_ivm_view_equals_recompute_after_stream(spark, tmp_path):
    """The defining IVM property: after the stream converges, the
    delta-maintained view equals a from-scratch group aggregate of the
    maintained base — including a group that empties out (delete of
    its last row must retract it from the view)."""
    import pyspark.sql.functions as F

    from vector_database_watermarking_spark.streaming import cdc, ivm

    base = spark.createDataFrame(
        [(1, "a", "g1"), (2, "bb", "g1"), (3, "ccc", "g2"), (4, "dddd", "g3")],
        "doc_id long, text string, source string",
    )
    # batch1: update key 1 into g2, insert key 5 into g3
    # batch2: delete key 4 (empties g3? no - key 5 is g3) and key 3
    #         (empties g2's original member; key 1 moved in)
    ch = spark.createDataFrame(
        [
            (1, "zzzz", "g2", 10, "update"),
            (5, "ee", "g3", 11, "insert"),
            (4, None, None, 20, "delete"),
            (3, None, None, 21, "delete"),
        ],
        "doc_id long, text string, source string, seq long, op string",
    )
    changes_dir = str(tmp_path / "changes")
    for b, pred in ((0, F.col("seq") < 20), (1, F.col("seq") >= 20)):
        ch.filter(pred).coalesce(1).write.mode("append").parquet(changes_dir)
    table_dir = str(tmp_path / "table")
    agg_dir = str(tmp_path / "view")
    cdc.init_table(base, table_dir)
    ivm.init_view(base, agg_dir, "source", "length(text)")
    stream = (
        spark.readStream.schema(ch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )
    q = ivm.ivm_agg_stream(
        stream, table_dir, agg_dir, "source", "length(text)",
        checkpoint_dir=str(tmp_path / "ckpt"), retain=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    view = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in cdc.read_current(spark, agg_dir).collect()
    }
    recomputed = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in ivm.group_contrib(
            cdc.read_current(spark, table_dir), "source", "length(text)"
        ).collect()
    }
    assert view == recomputed
    assert view == {"g1": (1, 2), "g2": (1, 4), "g3": (1, 2)}


def test_ivm_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers a batch after failure: applying the
    SAME batch twice must leave both the base and the view exactly as
    after the first application (the merge is insert-or-replace and
    the retraction then equals the new state)."""
    from vector_database_watermarking_spark.streaming import cdc, ivm

    base = spark.createDataFrame(
        [(1, "a", "g1"), (2, "bb", "g2")], "doc_id long, text string, source string"
    )
    batch = spark.createDataFrame(
        [(1, "zzz", "g2", 10, "update"), (3, "cc", "g1", 11, "insert"),
         (2, None, None, 12, "delete")],
        "doc_id long, text string, source string, seq long, op string",
    )
    table_dir, agg_dir = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.init_table(base, table_dir)
    ivm.init_view(base, agg_dir, "source", "length(text)")

    def snap():
        b = sorted(map(tuple, cdc.read_current(spark, table_dir).collect()))
        v = sorted(map(tuple, cdc.read_current(spark, agg_dir).collect()))
        return b, v

    ivm.apply_batch(batch, table_dir, agg_dir, "source", "length(text)", retain=0)
    first = snap()
    ivm.apply_batch(batch, table_dir, agg_dir, "source", "length(text)", retain=0)
    assert snap() == first


def test_ivm_crash_between_commits_heals_on_replay(spark, tmp_path, monkeypatch):
    """Kill the trigger BETWEEN the base commit and the view commit
    (the torn window), then replay the batch as foreachBatch would.
    The replay must detect the stamp lag and recompute the missed
    delta from the retained pre-merge snapshot — the view must equal
    a from-scratch recompute, not silently miss the batch."""
    from vector_database_watermarking_spark.streaming import cdc, ivm

    base = spark.createDataFrame(
        [(1, "a", "g1"), (2, "bb", "g1"), (3, "ccc", "g2")],
        "doc_id long, text string, source string",
    )
    batch = spark.createDataFrame(
        [(1, "zzzz", "g2", 10, "update"), (4, "ee", "g3", 11, "insert"),
         (3, None, None, 12, "delete")],
        "doc_id long, text string, source string, seq long, op string",
    )
    table_dir, agg_dir = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.init_table(base, table_dir)
    ivm.init_view(base, agg_dir, "source", "length(text)")

    class Boom(RuntimeError):
        pass

    def crash_commit_view(*a, **k):
        raise Boom("simulated crash between base and view commits")

    monkeypatch.setattr(ivm, "_commit_view", crash_commit_view)
    try:
        ivm.apply_batch(batch, table_dir, agg_dir, "source", "length(text)")
    except Boom:
        pass
    monkeypatch.undo()

    # torn state: base merged (v1), view still v0 stamped with base v0
    with open(f"{table_dir}/_CURRENT") as fh:
        assert fh.read().strip() == "v1"
    with open(f"{agg_dir}/_CURRENT") as fh:
        assert fh.read().strip() == "v0"
    assert ivm._read_stamp(agg_dir, 0, default=-1) == 0

    # foreachBatch re-delivers the same batch → heal path
    ivm.apply_batch(batch, table_dir, agg_dir, "source", "length(text)")
    view = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in cdc.read_current(spark, agg_dir).collect()
    }
    recomputed = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in ivm.group_contrib(
            cdc.read_current(spark, table_dir), "source", "length(text)"
        ).collect()
    }
    assert view == recomputed
    assert view == {"g1": (1, 2), "g2": (1, 4), "g3": (1, 2)}
    # base was NOT re-merged by the heal (no spurious version bump)
    with open(f"{table_dir}/_CURRENT") as fh:
        assert fh.read().strip() == "v1"
    assert ivm._read_stamp(agg_dir, 1, default=-1) == 1

    # a further clean re-delivery (crash after heal, before checkpoint
    # advance) stays stable
    before = view
    ivm.apply_batch(batch, table_dir, agg_dir, "source", "length(text)")
    after = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in cdc.read_current(spark, agg_dir).collect()
    }
    assert after == before


def test_cdc_time_travel_and_apply_once(spark, tmp_path):
    """apply_once commits sequential versions; read_version pins an
    old snapshot while the pointer advances; vacuum respects retain."""
    import pytest

    base = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id long, val long"
    )
    b1 = spark.createDataFrame(
        [(1, 11, 100, "update"), (3, 30, 101, "insert")],
        "doc_id long, val long, seq long, op string",
    )
    b2 = spark.createDataFrame(
        [(2, None, 200, "delete")], "doc_id long, val long, seq long, op string"
    )
    d = str(tmp_path / "t")
    cdc.init_table(base, d)
    cdc.apply_once(b1, d, retain=0)
    cdc.apply_once(b2, d, retain=0)
    assert cdc.list_versions(d) == [0, 1, 2]
    v1 = {(r["doc_id"], r["val"]) for r in cdc.read_version(spark, d, 1).collect()}
    assert v1 == {(1, 11), (2, 20), (3, 30)}
    cur = {(r["doc_id"], r["val"]) for r in cdc.read_current(spark, d).collect()}
    assert cur == {(1, 11), (3, 30)}
    cdc.vacuum(d, retain=1)
    assert cdc.list_versions(d) == [2]
    with pytest.raises(FileNotFoundError):
        cdc.read_version(spark, d, 0)


def test_cdc_uninitialized_dir_is_explicit(spark, tmp_path):
    """ADVICE round 10: a table dir without a _CURRENT pointer is 'not
    initialized', not a raw open() FileNotFoundError — list_versions
    returns [] (zero committed snapshots by definition, even when stray
    vN directories exist), and the readers name the missing pointer."""
    import os

    import pytest

    d = str(tmp_path / "never_init")
    os.makedirs(os.path.join(d, "v0"))  # externally-created orphan
    assert cdc.list_versions(d) == []
    with pytest.raises(FileNotFoundError, match="not initialized"):
        cdc.current_version(d)
    with pytest.raises(FileNotFoundError, match="not initialized"):
        cdc.read_version(spark, d, 0)


def test_drain_to_memory_propagates_query_failure(spark, tmp_path):
    """ADVICE round 10 (medium): a StreamingQueryException inside the
    worker-thread processAllAvailable must surface to the caller — the
    old drain let the thread die silently and callers read a
    partial/empty memory table as a successful drain."""
    import pytest

    from vector_database_watermarking_spark.streaming.windows import (
        drain_to_memory,
    )

    src = str(tmp_path / "bad_src")
    spark.createDataFrame([(1,)], "event_id long").write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def _boom(batches):
        raise ValueError("deliberate batch failure")
        yield  # pragma: no cover - generator marker

    failing = stream.mapInPandas(_boom, "event_id long")
    with pytest.raises(Exception, match="deliberate batch failure"):
        drain_to_memory(failing, "drain_failure_probe", "append", 120)


def test_bucketed_apply_matches_plain_and_links_unchanged(spark, tmp_path):
    """VERDICT r10 #4: the bucketed snapshot layout must be
    content-identical to the plain layout under the same change
    batches, while committing O(changed buckets): unchanged buckets'
    data files are HARD LINKS to the previous version (same inode),
    and only the touched buckets are freshly written."""
    import os

    base = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("val")
    )
    b1 = spark.createDataFrame(
        _rows([3, 7], lambda i: i * 100, 10, "upsert")
        + _rows([201], lambda i: i, 12, "insert"),
        CHANGES_SCHEMA,
    )
    b2 = spark.createDataFrame(_rows([7, 50], lambda i: 0, 20, "delete"), CHANGES_SCHEMA)

    plain_dir = str(tmp_path / "plain")
    buck_dir = str(tmp_path / "bucketed")
    cdc.init_table(base, plain_dir)
    cdc.init_table_bucketed(base, buck_dir, key="doc_id", n_buckets=16)
    assert cdc.bucket_spec(buck_dir) == (16, "doc_id")
    assert cdc.bucket_spec(plain_dir) is None

    for b in (b1, b2):
        cdc.apply_once(b, plain_dir, retain=0)
        cdc.apply_once(b, buck_dir, retain=0)

    want = {
        (r["doc_id"], r["val"])
        for r in cdc.read_current(spark, plain_dir).collect()
    }
    got = {
        (r["doc_id"], r["val"])
        for r in cdc.read_current(spark, buck_dir).collect()
    }
    assert got == want
    # schema parity: the internal partition column never leaks
    assert cdc.read_current(spark, buck_dir).columns == ["doc_id", "val"]
    assert cdc.read_version(spark, buck_dir, 1).columns == ["doc_id", "val"]

    # batch1 touched keys {3, 7, 201} -> at most 3 of 16 buckets were
    # rewritten in v1; every other bucket's files are links to v0
    changed1 = set(cdc.changed_buckets(b1, "doc_id", 16))
    assert 1 <= len(changed1) <= 3
    fresh, linked = 0, 0
    v0, v1 = os.path.join(buck_dir, "v0"), os.path.join(buck_dir, "v1")
    for name in os.listdir(v1):
        if not name.startswith(cdc.BUCKET_COL + "="):
            continue
        b = int(name.split("=", 1)[1])
        for fn in os.listdir(os.path.join(v1, name)):
            if fn.startswith("_"):
                continue
            ino1 = os.stat(os.path.join(v1, name, fn)).st_ino
            twin = os.path.join(v0, name, fn)
            if os.path.exists(twin) and os.stat(twin).st_ino == ino1:
                linked += 1
                assert b not in changed1
            else:
                fresh += 1
                assert b in changed1
    assert linked > 0 and fresh > 0

    # vacuum drops old versions without breaking link-shared files
    cdc.vacuum(buck_dir, retain=1)
    assert cdc.list_versions(buck_dir) == [2]
    assert {
        (r["doc_id"], r["val"])
        for r in cdc.read_current(spark, buck_dir).collect()
    } == want


def test_ivm_bucketed_view_equals_recompute(spark, tmp_path):
    """The IVM trigger must adapt to a bucketed base automatically
    (bucket-pruned reads, bucket-wise commit) and keep the defining
    view == recompute property."""
    import os

    from vector_database_watermarking_spark.streaming import ivm

    base = spark.createDataFrame(
        [(i, "x" * (i % 7 + 1), f"g{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    ch = spark.createDataFrame(
        [
            (1, "zzzz", "g2", 10, "update"),
            (61, "ee", "g0", 11, "insert"),
            (4, None, None, 20, "delete"),
        ],
        "doc_id long, text string, source string, seq long, op string",
    )
    changes_dir = str(tmp_path / "changes")
    for pred in (F.col("seq") < 20, F.col("seq") >= 20):
        ch.filter(pred).coalesce(1).write.mode("append").parquet(changes_dir)
    table_dir = str(tmp_path / "table")
    agg_dir = str(tmp_path / "view")
    cdc.init_table_bucketed(base, table_dir, key="doc_id", n_buckets=16)
    ivm.init_view(base, agg_dir, "source", "length(text)")
    stream = (
        spark.readStream.schema(ch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )
    q = ivm.ivm_agg_stream(
        stream, table_dir, agg_dir, "source", "length(text)",
        checkpoint_dir=str(tmp_path / "ckpt"), retain=0,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    view = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in cdc.read_current(spark, agg_dir).collect()
    }
    recomputed = {
        r["source"]: (r["n_rows"], r["sum_value"])
        for r in ivm.group_contrib(
            cdc.read_current(spark, table_dir), "source", "length(text)"
        ).collect()
    }
    assert view == recomputed
    # the base commits were bucket-wise: v1 shares at least one data
    # file (inode) with v0 — the full snapshot was NOT rewritten
    v0, v1 = os.path.join(table_dir, "v0"), os.path.join(table_dir, "v1")
    shared = 0
    for name in os.listdir(v1):
        if name.startswith(cdc.BUCKET_COL + "="):
            for fn in os.listdir(os.path.join(v1, name)):
                if fn.startswith("_"):
                    continue
                twin = os.path.join(v0, name, fn)
                if (
                    os.path.exists(twin)
                    and os.stat(twin).st_ino
                    == os.stat(os.path.join(v1, name, fn)).st_ino
                ):
                    shared += 1
    assert shared > 0


def test_bucketed_refusals_are_explicit(spark, tmp_path):
    """The bucketed layout's two guard rails: a merge keyed on a
    different column than the table's bucket key is refused (the
    bucket routing would silently miss rows), and a commit that would
    empty the entire table is refused before the pointer flip (a
    partitioned write of zero rows has no parquet footer — the
    snapshot would be unreadable; the previous version must stay
    live)."""
    import pytest

    base = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id long, val long"
    )
    d = str(tmp_path / "b")
    cdc.init_table_bucketed(base, d, key="doc_id", n_buckets=4)
    wrong_key = spark.createDataFrame(
        [(1, 0, 1, "upsert")], "other_id long, val long, seq long, op string"
    )
    with pytest.raises(ValueError, match="bucketed by 'doc_id'"):
        cdc.apply_once(wrong_key, d, key="other_id", retain=0)

    delete_all = spark.createDataFrame(
        _rows([1, 2], lambda i: None, 1, "delete"), CHANGES_SCHEMA
    )
    with pytest.raises(ValueError, match="empty the entire table"):
        cdc.apply_once(delete_all, d, retain=0)
    # refusal happened BEFORE the pointer flip: v0 is still live
    assert cdc.current_version(d) == 0
    assert {
        (r["doc_id"], r["val"]) for r in cdc.read_current(spark, d).collect()
    } == {(1, 10), (2, 20)}


def test_cdc_time_travel_as_of_timestamp(spark, tmp_path):
    """Timestamp time travel (AS OF): every commit records its
    wall-clock inside the snapshot dir before the pointer flip;
    read_as_of resolves the newest retained snapshot at or before the
    asked-for instant, and refuses instants that predate the oldest
    retained snapshot (never existed, or vacuumed)."""
    import pytest

    base = spark.createDataFrame([(1, 10)], "doc_id long, val long")
    b1 = spark.createDataFrame(_rows([1], lambda i: 11, 10, "update"), CHANGES_SCHEMA)
    b2 = spark.createDataFrame(_rows([2], lambda i: 22, 20, "insert"), CHANGES_SCHEMA)
    d = str(tmp_path / "t")
    cdc.init_table(base, d)
    cdc.apply_once(b1, d, retain=0)
    cdc.apply_once(b2, d, retain=0)

    hist = cdc.version_history(d)
    assert [v for v, _ in hist] == [0, 1, 2]
    ts = [t for _, t in hist]
    assert all(t is not None for t in ts) and ts == sorted(ts)

    def vals(df):
        return {(r["doc_id"], r["val"]) for r in df.collect()}

    assert vals(cdc.read_as_of(spark, d, ts[0])) == {(1, 10)}
    assert vals(cdc.read_as_of(spark, d, ts[1])) == {(1, 11)}
    # an instant long after the last commit resolves to the current
    assert vals(cdc.read_as_of(spark, d, ts[2] + 10**9)) == {(1, 11), (2, 22)}
    with pytest.raises(FileNotFoundError, match="at or before"):
        cdc.read_as_of(spark, d, ts[0] - 1)
    # vacuum drops v0/v1: their instants become unanswerable, honestly
    cdc.vacuum(d, retain=1)
    with pytest.raises(FileNotFoundError, match="at or before"):
        cdc.read_as_of(spark, d, ts[1])
    # bucketed commits stamp identically (shared commit path)
    db = str(tmp_path / "b")
    cdc.init_table_bucketed(base, db, key="doc_id", n_buckets=4)
    cdc.apply_once(b2, db, retain=0)
    bts = [t for _, t in cdc.version_history(db)]
    assert len(bts) == 2 and all(t is not None for t in bts)
    assert vals(cdc.read_as_of(spark, db, bts[0])) == {(1, 10)}


def test_commit_ts_is_monotonic_under_clock_step(spark, tmp_path, monkeypatch):
    """ADVICE round 11: an NTP step backwards (or a same-microsecond
    pair of commits) must not produce a later version with an earlier
    _COMMIT_TS — read_as_of picks max version with cts <= ts, so a
    non-monotonic stamp would resolve AS OF an earlier commit's own
    instant to a LATER snapshot. The stamp is clamped to
    prev_commit_ts + 1."""
    base = spark.createDataFrame([(1, 10)], "doc_id long, val long")
    b1 = spark.createDataFrame(_rows([1], lambda i: 11, 10, "update"), CHANGES_SCHEMA)
    d = str(tmp_path / "t")
    cdc.init_table(base, d)
    t0 = cdc.commit_ts(d, 0)
    # step the wall clock 10 s into the past for the next commit
    monkeypatch.setattr(time, "time", lambda: (t0 / 1_000_000) - 10.0)
    cdc.apply_once(b1, d, retain=0)
    t1 = cdc.commit_ts(d, 1)
    assert t1 == t0 + 1  # clamped, strictly monotonic
    # AS OF v0's own instant still resolves to v0, not v1
    assert {(r["doc_id"], r["val"]) for r in cdc.read_as_of(spark, d, t0).collect()} == {
        (1, 10)
    }


def test_bucketed_null_merge_key_is_refused_by_name(spark, tmp_path):
    """ADVICE round 11: a null-keyed change row can never be matched
    by the equality merge join (NULL != NULL), so it would become a
    permanently unmergeable row — refuse with a named ValueError
    (xxhash64 hashes NULL to the bare seed, so the old code silently
    routed it to a real bucket instead)."""
    import pytest

    base = spark.createDataFrame([(1, 10)], "doc_id long, val long")
    d = str(tmp_path / "b")
    cdc.init_table_bucketed(base, d, key="doc_id", n_buckets=4)
    null_key = spark.createDataFrame(
        [(None, 99, 1, "insert")], CHANGES_SCHEMA
    )
    with pytest.raises(ValueError, match="NULL merge key 'doc_id'"):
        cdc.apply_once(null_key, d, retain=0)
    assert cdc.current_version(d) == 0  # refused before any commit


def test_bucketed_link_loop_links_only_data_files(spark, tmp_path):
    """ADVICE round 11: the unchanged-bucket hard-link loop must copy
    only parquet data files — '_'-prefixed commit markers AND
    '.'-prefixed local-FS checksum files ('.part-*.crc') stay behind,
    so bytes accounting and directory diffs see data only."""
    import os

    base = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "doc_id long, val long"
    )
    d = str(tmp_path / "b")
    cdc.init_table_bucketed(base, d, key="doc_id", n_buckets=4)
    # plant non-data files in every v0 bucket dir (deterministic stand-
    # ins for Hadoop LocalFS .crc checksums and marker files)
    v0 = os.path.join(d, "v0")
    bucket_dirs = [n for n in os.listdir(v0) if n.startswith("_bucket=")]
    assert bucket_dirs
    for bd in bucket_dirs:
        open(os.path.join(v0, bd, ".part-fake.crc"), "w").close()
        open(os.path.join(v0, bd, "_fake_marker"), "w").close()
    b1 = spark.createDataFrame(_rows([0], lambda i: 99, 10, "update"), CHANGES_SCHEMA)
    cdc.apply_once(b1, d, retain=0)
    v1 = os.path.join(d, "v1")
    changed = cdc.changed_buckets(b1, "doc_id", 4)
    linked = [
        n
        for n in os.listdir(v1)
        if n.startswith("_bucket=") and int(n.split("=")[1]) not in changed
    ]
    assert linked  # at least one unchanged bucket got linked
    for bd in linked:
        names = os.listdir(os.path.join(v1, bd))
        assert names, bd  # the data files made it
        assert all(not n.startswith(("_", ".")) for n in names), names


def test_ivm_view_supports_as_of_time_travel(spark, tmp_path):
    """VERDICT r11 #5: the view's _COMMIT_TS stamp (_commit_view) must
    be a live surface, not dead metadata — the materialized view is a
    versioned CDC table in its own right, so cdc.read_as_of at a
    recorded mid-stream commit instant must return the view exactly as
    it stood then (and the stamp clamp keeps those instants strictly
    ordered)."""
    from vector_database_watermarking_spark.streaming import cdc, ivm

    base = spark.createDataFrame(
        [(1, "a", "g1"), (2, "bb", "g2")], "doc_id long, text string, source string"
    )
    b1 = spark.createDataFrame(
        [(3, "ccc", "g2", 10, "insert")],
        "doc_id long, text string, source string, seq long, op string",
    )
    b2 = spark.createDataFrame(
        [(1, None, None, 20, "delete")],
        "doc_id long, text string, source string, seq long, op string",
    )
    table_dir, agg_dir = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.init_table(base, table_dir)
    ivm.init_view(base, agg_dir, "source", "length(text)")
    ivm.apply_batch(b1, table_dir, agg_dir, "source", "length(text)", retain=0)
    ts_mid = cdc.commit_ts(agg_dir, 1)  # the mid-stream instant
    ivm.apply_batch(b2, table_dir, agg_dir, "source", "length(text)", retain=0)

    def vals(df):
        return {(r["source"], r["n_rows"], r["sum_value"]) for r in df.collect()}

    # AS OF the initial commit: the v0 materialization
    ts0 = cdc.commit_ts(agg_dir, 0)
    assert vals(cdc.read_as_of(spark, agg_dir, ts0)) == {
        ("g1", 1, 1), ("g2", 1, 2)
    }
    # AS OF the mid-stream commit: b1 applied, b2 not yet
    assert vals(cdc.read_as_of(spark, agg_dir, ts_mid)) == {
        ("g1", 1, 1), ("g2", 2, 5)
    }
    # AS OF now: current view, equal to a recompute of the current base
    assert vals(cdc.read_as_of(spark, agg_dir, ts_mid + 10**9)) == vals(
        ivm.group_contrib(
            cdc.read_current(spark, table_dir), "source", "length(text)"
        )
    ) == {("g2", 2, 5)}
    # the view's commit instants are strictly monotonic (stamp clamp)
    hist = [t for _, t in cdc.version_history(agg_dir)]
    assert hist == sorted(hist) and len(set(hist)) == 3


def test_null_merge_key_refused_on_plain_layout_and_ivm(spark, tmp_path):
    """Review round 12: the round-11 null-key guard lived only in the
    bucket-routing path — the PLAIN layout and the IVM trigger must
    refuse the same permanently-unmergeable row, via the shared
    refuse_null_keys."""
    import pytest

    from vector_database_watermarking_spark.streaming import ivm

    base = spark.createDataFrame(
        [(1, 10)], "doc_id long, val long"
    )
    d = str(tmp_path / "plain")
    cdc.init_table(base, d)
    null_key = spark.createDataFrame([(None, 99, 1, "insert")], CHANGES_SCHEMA)
    with pytest.raises(ValueError, match="NULL merge key 'doc_id'"):
        cdc.apply_once(null_key, d, retain=0)
    assert cdc.current_version(d) == 0

    base2 = spark.createDataFrame(
        [(1, "a", "g1")], "doc_id long, text string, source string"
    )
    t2, v2 = str(tmp_path / "t2"), str(tmp_path / "v2")
    cdc.init_table(base2, t2)
    ivm.init_view(base2, v2, "source", "length(text)")
    null_b = spark.createDataFrame(
        [(None, "x", "g1", 1, "insert")],
        "doc_id long, text string, source string, seq long, op string",
    )
    with pytest.raises(ValueError, match="NULL merge key 'doc_id'"):
        ivm.apply_batch(null_b, t2, v2, "source", "length(text)", retain=0)
    assert cdc.current_version(t2) == 0 and cdc.current_version(v2) == 0
