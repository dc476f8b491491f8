"""Tests for the temporal join operators (as-of, banded range) and the
contamination scan — brute-force equivalence plus edge semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_database_watermarking_spark.operators.temporal import (
    asof_join,
    range_join,
)
from vector_database_watermarking_spark.operators.text import contamination_scan


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts(0), 100.0, 10),
            (1, _ts(10), 101.0, 11),
            (1, _ts(10), 102.0, 12),  # same-ts tie: greater id wins
            (1, _ts(30), 103.0, 13),
            (2, _ts(5), 50.0, 20),
        ],
        "key long, ts timestamp, px double, qid long",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts(5), 30),   # matches quote 10 (ts=0)
            (1, _ts(10), 31),  # at-or-before: matches quote 12 (tie, max id)
            (1, _ts(29), 32),  # matches quote 12
            (1, _ts(31), 33),  # matches quote 13
            (2, _ts(4), 34),   # before any key-2 quote -> null
            (3, _ts(9), 35),   # unseen key -> null
        ],
        "key long, ts timestamp, tid long",
    )
    return quotes, trades


def test_asof_backward_with_ties(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["key"], right_cols=["px"], tiebreak="qid"
    )
    got = {r["tid"]: r["px_right"] for r in out.collect()}
    assert got == {30: 100.0, 31: 102.0, 32: 102.0, 33: 103.0, 34: None, 35: None}
    assert out.count() == trades.count()  # every left row exactly once


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades,
        quotes,
        on=["key"],
        right_cols=["px"],
        tiebreak="qid",
        tolerance_sec=5.0,
    )
    got = {r["tid"]: r["px_right"] for r in out.collect()}
    # trade 32 (ts=29) is 19s after quote 12 (ts=10): outside tolerance
    assert got == {30: 100.0, 31: 102.0, 32: None, 33: 103.0, 34: None, 35: None}


def test_asof_matches_brute_force_on_events(spark, sf_dir):
    from vector_database_watermarking_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        left, right, on=["user_id"], right_cols=["value"], tiebreak="event_id"
    )
    # brute force: join all at-or-before pairs, keep the max (ts, id)
    l = left.alias("l")
    r = right.alias("r")
    w = F.struct(F.col("r.ts"), F.col("r.event_id"))
    brute = (
        l.join(r, (F.col("l.user_id") == F.col("r.user_id")) & (F.col("r.ts") <= F.col("l.ts")))
        .groupBy(F.col("l.event_id").alias("event_id"))
        .agg(F.max(F.struct(F.col("r.ts"), F.col("r.event_id"), F.col("r.value"))).alias("m"))
        .select("event_id", F.col("m.value").alias("value"))
    )
    got = {r["event_id"]: r["value_right"] for r in out.collect()}
    exp = {r["event_id"]: r["value"] for r in brute.collect()}
    for k, v in exp.items():
        assert got[k] == v
    # lefts missing from brute force must be null-matched
    for k, v in got.items():
        if k not in exp:
            assert v is None


def test_range_join_matches_brute_force(spark, sf_dir):
    from vector_database_watermarking_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    pairs = range_join(
        left, right, on=["user_id"], lower_sec=-600.0, upper_sec=0.0
    )
    got = pairs.groupBy("event_id").count().collect()
    l, r = left.alias("l"), right.alias("r")
    lt, rt = F.col("l.ts").cast("double"), F.col("r.ts").cast("double")
    brute = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (rt >= lt - 600.0)
            & (rt < lt),
        )
        .groupBy(F.col("l.event_id").alias("event_id"))
        .count()
        .collect()
    )
    assert {x["event_id"]: x["count"] for x in got} == {
        x["event_id"]: x["count"] for x in brute
    }
    assert pairs.count() > 0  # fixture actually exercises the operator


def test_contamination_scan_planted(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            # 4-token prefix: the shared run must start on a stride-4
            # boundary on both sides for the rolling windows to align
            (0, f"prefix words right here {shared} and a clean tail portion"),
            (2, "completely unrelated content with no overlap at all ok"),
            (1, f"{shared} copied straight into the eval set document"),
            (3, "another clean probe document nothing shared in it"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    probe = docs.filter(F.col("doc_id") % 2 == 1)
    out = contamination_scan(corpus, probe, window_tokens=8, stride=4).collect()
    assert len(out) == 1
    row = out[0]
    assert row["corpus_doc"] == 0
    assert row["n_probe_docs"] == 1
    assert row["first_probe_doc"] == 1
    assert row["n_shared_windows"] >= 1


def test_contamination_scan_shuffle_fallback_matches(spark, monkeypatch):
    """Past the broadcast cap the scan must fall back to the shuffle
    join with IDENTICAL results (the size probe is an over-estimate of
    the pre-dedup window count, so a conservative miss only changes
    the join strategy, never the answer). Pin both: a zero cap takes
    the fallback path, and its output equals the broadcast path's."""
    from vector_database_watermarking_spark.operators import text as text_ops

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, f"prefix words right here {shared} and a clean tail portion"),
            (2, "completely unrelated content with no overlap at all ok"),
            (1, f"{shared} copied straight into the eval set document"),
            (3, "another clean probe document nothing shared in it"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    probe = docs.filter(F.col("doc_id") % 2 == 1)
    broadcast_rows = {
        tuple(r)
        for r in contamination_scan(corpus, probe, window_tokens=8, stride=4).collect()
    }
    monkeypatch.setattr(text_ops, "MAX_BROADCAST_FP_ROWS", 0)
    fallback = contamination_scan(corpus, probe, window_tokens=8, stride=4)
    assert "broadcast" not in fallback._jdf.queryExecution().executedPlan().toString().lower()
    assert {tuple(r) for r in fallback.collect()} == broadcast_rows


def test_calendar_gapfill_brute_force(spark):
    import datetime as dt

    from vector_database_watermarking_spark.operators.temporal import (
        calendar_gapfill,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 10),
        (1, dt.datetime(2024, 1, 1, 9), 11),
        (1, dt.datetime(2024, 1, 4, 1), 12),
        (1, dt.datetime(2024, 1, 6, 23), 13),
        (2, dt.datetime(2024, 3, 10, 0), 14),
        (3, dt.datetime(2024, 2, 1, 1), 15),
        (3, dt.datetime(2024, 2, 2, 1), 16),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    got = {
        (r.user_id, str(r.day), r.is_active, r.days_since_active)
        for r in calendar_gapfill(ev).collect()
    }
    expected = {
        (1, "2024-01-01", 1, 0),
        (1, "2024-01-02", 0, 1),
        (1, "2024-01-03", 0, 2),
        (1, "2024-01-04", 1, 0),
        (1, "2024-01-05", 0, 1),
        (1, "2024-01-06", 1, 0),
        (2, "2024-03-10", 1, 0),
        (3, "2024-02-01", 1, 0),
        (3, "2024-02-02", 1, 0),
    }
    assert got == expected


def test_event_transitions_deterministic_ties(spark):
    import datetime as dt

    from vector_database_watermarking_spark.operators.temporal import (
        event_transitions,
    )

    t = dt.datetime(2024, 1, 1, 12)
    # user 1 has two events at the SAME timestamp: event_id breaks the tie,
    # so the sequence is a(1) -> b(2) -> c(3) regardless of input order.
    rows = [
        (1, t, "b", 2),
        (1, t, "a", 1),
        (1, dt.datetime(2024, 1, 1, 13), "c", 3),
        (2, dt.datetime(2024, 1, 2), "a", 4),
        (2, dt.datetime(2024, 1, 3), "b", 5),
        (3, dt.datetime(2024, 1, 4), "a", 6),
        (3, dt.datetime(2024, 1, 5), "b", 7),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.from_total)
        for r in event_transitions(ev).collect()
    }
    assert got == {
        ("a", "b"): (3, 3),
        ("b", "c"): (1, 1),
    }
