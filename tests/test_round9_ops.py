"""Round-9 TPC-H breadth queries: hand-computed fixtures through the
registered query functions (the DuckDB oracle replays the same SQL
under tools/check_oracles.py; these pin the semantics on inputs small
enough to verify by hand)."""

import os

import pyspark.sql.functions as F

from vector_database_watermarking_spark.registry import QUERIES


def _write(df, d, name):
    df.write.parquet(os.path.join(d, f"{name}.parquet"))


def _nation(spark):
    return spark.createDataFrame(
        [(0, "NATION_7", 0), (1, "NATION_1", 0), (2, "NATION_2", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )


def test_idle_rich_customers_hand_computed(spark, tmp_path):
    """Q22 shape: positive-balance average over the code pool is
    (100+50+80+90+95)/5 = 83.00; strictly-above-average AND no recent
    order leaves customer 6 (90.00, no orders) and customer 8 (95.00,
    only a PRE-cutoff order) — customer 1 is richer but ordered
    recently, customer 4 sits below the average, customer 3's negative
    balance is excluded from the average but stays in the pool,
    customer 5's code is outside the set."""
    c = spark.createDataFrame(
        [
            (1, "C1", 0, 100.0),
            (2, "C2", 5, 50.0),
            (3, "C3", 1, -10.0),
            (4, "C4", 2, 80.0),
            (5, "C5", 3, 75.0),
            (6, "C6", 6, 90.0),
            (8, "C8", 10, 95.0),
        ],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    )
    o = spark.createDataFrame(
        [(10, 1, "2000-05-01"), (11, 8, "1998-03-01")],
        "o_orderkey long, o_custkey long, d string",
    ).select(
        "o_orderkey", "o_custkey", F.col("d").cast("timestamp").alias("o_orderdate")
    )
    d = str(tmp_path)
    _write(c, d, "customer")
    _write(o, d, "orders")
    got = {
        r["cntrycode"]: (r["n_customers"], r["total_acctbal_cents"])
        for r in QUERIES["rel_idle_rich_customers"].fn(spark, d).collect()
    }
    assert got == {0: (1, 9500), 1: (1, 9000)}


def test_cheapest_supplier_hand_computed(spark, tmp_path):
    """Q2 shape: per small part, the supplier with the minimum total
    supplied cents; exact tie (part 3 at 1000 cents from suppliers 1
    and 3) resolves to the lowest suppkey; part 2 is filtered out by
    p_size."""
    li = spark.createDataFrame(
        [
            (1, 1, 1, 10.0),
            (2, 1, 1, 5.0),   # supp1 total for part1: 1500 cents
            (3, 1, 2, 12.0),  # supp2 total for part1: 1200 -> winner
            (4, 2, 1, 1.0),   # part2 excluded by size
            (5, 3, 1, 10.0),  # part3: supp1 1000
            (6, 3, 3, 10.0),  # part3: supp3 1000 -> tie, supp1 wins
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double",
    )
    p = spark.createDataFrame(
        [(1, "B1", 5), (2, "B2", 20), (3, "B3", 7)],
        "p_partkey long, p_brand string, p_size int",
    )
    s = spark.createDataFrame(
        [(1, "Supp#1", 0), (2, "Supp#2", 1), (3, "Supp#3", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    d = str(tmp_path)
    _write(li, d, "lineitem")
    _write(p, d, "part")
    _write(s, d, "supplier")
    _write(_nation(spark), d, "nation")
    got = [
        (r["p_partkey"], r["s_name"], r["n_name"], r["total_cents"])
        for r in QUERIES["rel_cheapest_supplier"].fn(spark, d).collect()
    ]
    assert got == [
        (1, "Supp#2", "NATION_1", 1200),
        (3, "Supp#1", "NATION_7", 1000),
    ]


def test_returned_revenue_hand_computed(spark, tmp_path):
    """Q10 shape: only the returned item on the in-window order
    counts; revenue is exact 1e-4 integers (10000 cents x (100-10))."""
    li = spark.createDataFrame(
        [
            (1, "R", 100.0, 0.10),  # in-window order, returned
            (1, "N", 50.0, 0.00),   # not returned
            (2, "R", 70.0, 0.00),   # out-of-window order
        ],
        "l_orderkey long, l_returnflag string, l_extendedprice double, l_discount double",
    )
    o = spark.createDataFrame(
        [(1, 1, "1995-11-15"), (2, 1, "1996-02-01")],
        "o_orderkey long, o_custkey long, d string",
    ).select("o_orderkey", "o_custkey", F.col("d").cast("timestamp").alias("o_orderdate"))
    c = spark.createDataFrame(
        [(1, "C1", 0, 12.34)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    )
    d = str(tmp_path)
    _write(li, d, "lineitem")
    _write(o, d, "orders")
    _write(c, d, "customer")
    _write(_nation(spark), d, "nation")
    rows = QUERIES["rel_returned_revenue"].fn(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["c_custkey"],
        r["n_name"],
        r["acctbal_cents"],
        r["lost_rev_e4"],
        r["n_items"],
    ) == (1, "NATION_7", 1234, 10000 * 90, 1)


def test_market_share_and_nation_profit_hand_computed(spark, tmp_path):
    """Q8: ASIA customers x ECONOMY parts, share of NATION_7 supply by
    year — 1995 total 295000 e4, NATION_7 200000. Q9: PROMO parts,
    profit = rev_e4 - qty*retail_cents*50 per supplier nation/year."""
    li = spark.createDataFrame(
        [
            # (okey, pkey, skey, qty, price, disc)
            (1, 1, 1, 1.0, 20.0, 0.00),  # A: ASIA/ECONOMY/N7 1995
            (1, 1, 2, 2.0, 10.0, 0.05),  # B: ASIA/ECONOMY/N1 1995
            (2, 1, 1, 1.0, 99.0, 0.00),  # C: AMERICA customer -> out of Q8
            (1, 2, 1, 3.0, 30.0, 0.10),  # D: PROMO -> Q9 only (N7, 1995)
            (2, 2, 2, 1.0, 5.0, 0.00),   # E: PROMO (N1, 1996)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    o = spark.createDataFrame(
        [(1, 1, "1995-06-01"), (2, 2, "1996-06-01")],
        "o_orderkey long, o_custkey long, d string",
    ).select("o_orderkey", "o_custkey", F.col("d").cast("timestamp").alias("o_orderdate"))
    c = spark.createDataFrame(
        [(1, "C1", 0, 0.0), (2, "C2", 2, 0.0)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    )
    r = spark.createDataFrame(
        [(0, "ASIA"), (1, "AMERICA")], "r_regionkey long, r_name string"
    )
    p = spark.createDataFrame(
        [(1, "B1", "ECONOMY", 5, 1.0), (2, "B2", "PROMO", 5, 2.0)],
        "p_partkey long, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    s = spark.createDataFrame(
        [(1, "Supp#1", 0), (2, "Supp#2", 1)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    d = str(tmp_path)
    for df, name in (
        (li, "lineitem"),
        (o, "orders"),
        (c, "customer"),
        (r, "region"),
        (p, "part"),
        (s, "supplier"),
        (_nation(spark), "nation"),
    ):
        _write(df, d, name)

    ms = {
        r2["o_year"]: (r2["total_rev_e4"], r2["nation_rev_e4"], r2["mkt_share"])
        for r2 in QUERIES["rel_market_share"].fn(spark, d).collect()
    }
    assert ms == {1995: (295000, 200000, 200000 / 295000)}

    npf = {
        (r2["n_name"], r2["o_year"]): (r2["profit_e4"], r2["n_lineitems"])
        for r2 in QUERIES["rel_nation_profit"].fn(spark, d).collect()
    }
    # D: rev 3000*90=270000, cost 3*200*50=30000 -> 240000
    # E: rev  500*100=50000, cost 1*200*50=10000 -> 40000
    assert npf == {
        ("NATION_7", 1995): (240000, 1),
        ("NATION_1", 1996): (40000, 1),
    }


def test_order_count_histogram_hand_computed(spark, tmp_path):
    """Q13 shape: the priority filter lives in the JOIN condition, so
    customer 3 (urgent-only orders) lands in the 0 bucket alongside
    order-less customer 2 — a WHERE would have dropped them both."""
    c = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    o = spark.createDataFrame(
        [
            (10, 1, "3-MEDIUM"),
            (11, 1, "5-LOW"),
            (12, 3, "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    d = str(tmp_path)
    _write(c, d, "customer")
    _write(o, d, "orders")
    got = {
        r["c_count"]: r["custdist"]
        for r in QUERIES["rel_order_count_histogram"].fn(spark, d).collect()
    }
    assert got == {2: 1, 0: 2}


def test_priority_late_orders_hand_computed(spark, tmp_path):
    """Q4 shape: order 1 has a >30-day-late item (counted once despite
    two qualifying lineitems — EXISTS, not a count), order 2's items
    ship on time, order 3 is outside the date window."""
    o = spark.createDataFrame(
        [
            (1, "1-URGENT", "1996-02-01"),
            (2, "2-HIGH", "1996-03-01"),
            (3, "1-URGENT", "1997-01-01"),
        ],
        "o_orderkey long, o_orderpriority string, d string",
    ).select(
        "o_orderkey", "o_orderpriority", F.col("d").cast("timestamp").alias("o_orderdate")
    )
    li = spark.createDataFrame(
        [
            (1, "1996-03-15"),
            (1, "1996-04-15"),
            (2, "1996-03-10"),
            (3, "1997-06-01"),
        ],
        "l_orderkey long, s string",
    ).select("l_orderkey", F.col("s").cast("timestamp").alias("l_shipdate"))
    d = str(tmp_path)
    _write(o, d, "orders")
    _write(li, d, "lineitem")
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in QUERIES["rel_priority_late_orders"].fn(spark, d).collect()
    }
    assert got == {"1-URGENT": 1}


def test_scaled_band_candidates_subset(spark):
    """The containment the ext_emb_near_dups_scaled docstring promises:
    an 8-bit band is the concatenation of two 4-bit bands over the SAME
    32-bit signatures, so every pair that collides in some 8-bit band
    also collides in both constituent 4-bit bands — the scaled config's
    candidate set is a subset of the pinned config's. Compared at
    threshold -1.0 (keep every candidate) so the assertion covers the
    banding math, not the score filter."""
    from vector_database_watermarking_spark.operators import similarity
    from vector_database_watermarking_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pairs = {}
    for bb in (4, 8):
        out = similarity.emb_near_dups_lsh(
            emb, threshold=-1.0, bits=32, band_bits=bb, d=64
        )
        pairs[bb] = {(r["src"], r["dst"]) for r in out.collect()}
    assert pairs[8], "8-bit config found no candidates at all"
    assert pairs[8] <= pairs[4], (
        f"{len(pairs[8] - pairs[4])} scaled candidates missing from the "
        "pinned config"
    )
    assert len(pairs[4]) > len(pairs[8]), (
        "wider bands must prune candidates on this fixture"
    )


def test_local_supplier_volume_hand_computed(spark, tmp_path):
    """Q5 shape: only lineitems whose customer and supplier share a
    nation count, only 1996 orders, only the EUROPE region. Nation 7
    gets the single local item (100.00 at 0%); nation 1 gets two
    (200.00 at 10% + 50.00 at 5%); the cross-nation pair and the 1995
    order drop."""
    n = _nation(spark)
    r = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string"
    )
    c = spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
    )
    s = spark.createDataFrame(
        [(10, 0), (20, 1), (30, 1)], "s_suppkey long, s_nationkey long"
    )
    o = spark.createDataFrame(
        [(100, 1, "1996-05-01"), (200, 2, "1996-06-01"), (300, 1, "1995-01-01")],
        "o_orderkey long, o_custkey long, d string",
    ).select("o_orderkey", "o_custkey", F.col("d").cast("timestamp").alias("o_orderdate"))
    li = spark.createDataFrame(
        [
            (100, 10, 100.0, 0.0),   # local: c1(n0) x s10(n0)
            (100, 20, 999.0, 0.0),   # cross-nation: dropped
            (200, 20, 200.0, 0.1),   # local: c2(n1) x s20(n1)
            (200, 30, 50.0, 0.05),   # local: c2(n1) x s30(n1)
            (300, 10, 777.0, 0.0),   # 1995 order: dropped
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    d = str(tmp_path)
    for df, name in [(n, "nation"), (r, "region"), (c, "customer"), (s, "supplier"), (o, "orders"), (li, "lineitem")]:
        _write(df, d, name)
    got = {
        row["n_name"]: (row["revenue_e4"], row["n_items"])
        for row in QUERIES["rel_local_supplier_volume"].fn(spark, d).collect()
    }
    assert got == {
        "NATION_7": (100_00 * 100, 1),
        "NATION_1": (200_00 * 90 + 50_00 * 95, 2),
    }


def test_forecast_revenue_hand_computed(spark, tmp_path):
    """Q6 shape: discount band is integer-percent 5..7, quantity < 24,
    1996 shipdates. Row 1 contributes 10000*6, row 5 contributes
    5000*7; the off-band, over-quantity, and 1997 rows drop."""
    li = spark.createDataFrame(
        [
            ("1996-02-01", 0.06, 10.0, 100.0),
            ("1996-02-01", 0.04, 10.0, 100.0),
            ("1996-02-01", 0.06, 30.0, 100.0),
            ("1997-02-01", 0.06, 10.0, 100.0),
            ("1996-11-30", 0.07, 23.0, 50.0),
        ],
        "d string, l_discount double, l_quantity double, l_extendedprice double",
    ).select(F.col("d").cast("timestamp").alias("l_shipdate"), "l_discount", "l_quantity", "l_extendedprice")
    d = str(tmp_path)
    _write(li, d, "lineitem")
    row = QUERIES["rel_forecast_revenue"].fn(spark, d).collect()[0]
    assert (row["forecast_rev_e4"], row["n_items"]) == (10000 * 6 + 5000 * 7, 2)


def test_important_parts_hand_computed(spark, tmp_path):
    """Q11 shape (mean-relative): values 100/10/10/10 give a mean of
    32.5; only the 100 clears 1.4x the mean (100*4*10=4000 >
    130*14=1820)."""
    li = spark.createDataFrame(
        [(1, 100.0), (2, 10.0), (3, 10.0), (4, 10.0)],
        "l_partkey long, l_extendedprice double",
    )
    p = spark.createDataFrame(
        [(1, "P1"), (2, "P2"), (3, "P3"), (4, "P4")],
        "p_partkey long, p_name string",
    )
    d = str(tmp_path)
    _write(li, d, "lineitem")
    _write(p, d, "part")
    rows = QUERIES["rel_important_parts"].fn(spark, d).collect()
    assert [(r["p_partkey"], r["p_name"], r["value_cents"]) for r in rows] == [
        (1, "P1", 100_00)
    ]


def test_late_shipment_modes_hand_computed(spark, tmp_path):
    """Q12 shape: only shipments >90 days after ordering inside the
    1996 window count; the urgent order lands in high_line_count under
    flag A, the 5-LOW order under flag N's low_line_count."""
    o = spark.createDataFrame(
        [(1, "1-URGENT", "1996-01-01"), (2, "5-LOW", "1996-01-15")],
        "o_orderkey long, o_orderpriority string, d string",
    ).select("o_orderkey", "o_orderpriority", F.col("d").cast("timestamp").alias("o_orderdate"))
    li = spark.createDataFrame(
        [
            (1, "A", "1996-06-01"),  # late, urgent -> high under A
            (1, "A", "1996-02-01"),  # only 31 days: dropped
            (2, "N", "1996-06-01"),  # late, low -> low under N
            (2, "N", "1995-06-01"),  # outside window: dropped
        ],
        "l_orderkey long, l_returnflag string, d string",
    ).select("l_orderkey", "l_returnflag", F.col("d").cast("timestamp").alias("l_shipdate"))
    d = str(tmp_path)
    _write(o, d, "orders")
    _write(li, d, "lineitem")
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in QUERIES["rel_late_shipment_modes"].fn(spark, d).collect()
    }
    assert got == {"A": (1, 0), "N": (0, 1)}


def test_promo_revenue_hand_computed(spark, tmp_path):
    """Q14 shape: March 1996 revenue is 1.0M e4 promo + 2.0M e4
    standard; the April row drops; share = 1/3 rounded to 1e-6."""
    p = spark.createDataFrame(
        [(1, "PROMO"), (2, "SMALL")], "p_partkey long, p_type string"
    )
    li = spark.createDataFrame(
        [
            (1, "1996-03-05", 100.0, 0.0),
            (2, "1996-03-20", 200.0, 0.0),
            (1, "1996-04-01", 999.0, 0.0),
        ],
        "l_partkey long, d string, l_extendedprice double, l_discount double",
    ).select("l_partkey", F.col("d").cast("timestamp").alias("l_shipdate"), "l_extendedprice", "l_discount")
    d = str(tmp_path)
    _write(p, d, "part")
    _write(li, d, "lineitem")
    row = QUERIES["rel_promo_revenue"].fn(spark, d).collect()[0]
    assert (row["promo_rev_e4"], row["total_rev_e4"]) == (1_000_000, 3_000_000)
    assert row["promo_share"] == 0.333333


def test_top_supplier_hand_computed(spark, tmp_path):
    """Q15 shape: suppliers 10 and 20 tie at the Q1-1996 maximum and
    BOTH surface (the view formulation's tie semantics); supplier 30
    trails; the out-of-quarter row doesn't rescue it."""
    s = spark.createDataFrame(
        [(10, "S10"), (20, "S20"), (30, "S30")],
        "s_suppkey long, s_name string",
    )
    li = spark.createDataFrame(
        [
            (10, "1996-01-05", 100.0, 0.0),
            (20, "1996-02-05", 50.0, 0.0),
            (20, "1996-03-05", 50.0, 0.0),
            (30, "1996-01-05", 99.0, 0.0),
            (30, "1996-06-05", 999.0, 0.0),  # outside Q1: dropped
        ],
        "l_suppkey long, d string, l_extendedprice double, l_discount double",
    ).select("l_suppkey", F.col("d").cast("timestamp").alias("l_shipdate"), "l_extendedprice", "l_discount")
    d = str(tmp_path)
    _write(s, d, "supplier")
    _write(li, d, "lineitem")
    got = {
        (r["s_suppkey"], r["s_name"], r["total_rev_e4"])
        for r in QUERIES["rel_top_supplier"].fn(spark, d).collect()
    }
    assert got == {(10, "S10", 1_000_000), (20, "S20", 1_000_000)}


def test_large_volume_customers_hand_computed(spark, tmp_path):
    """Q18 shape: order 1 totals 260 units (> 250) and surfaces with
    its customer; order 2's 100 units miss the bar."""
    c = spark.createDataFrame([(1, "C1")], "c_custkey long, c_name string")
    o = spark.createDataFrame(
        [(1, 1, 1234.56), (2, 1, 99.99)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    li = spark.createDataFrame(
        [(1, 200.0), (1, 60.0), (2, 100.0)],
        "l_orderkey long, l_quantity double",
    )
    d = str(tmp_path)
    _write(c, d, "customer")
    _write(o, d, "orders")
    _write(li, d, "lineitem")
    rows = QUERIES["rel_large_volume_customers"].fn(spark, d).collect()
    assert [
        (r["c_custkey"], r["o_orderkey"], r["totalprice_cents"], r["qty_sum"])
        for r in rows
    ] == [(1, 1, 123456, 260)]


def test_disjunct_revenue_hand_computed(spark, tmp_path):
    """Q19 shape: one qualifying lineitem per branch (SMALL/size 5/qty
    10, MEDIUM/size 20/qty 20, LARGE/size 30/qty 30); the over-quantity
    SMALL row and the no-branch part drop."""
    p = spark.createDataFrame(
        [(1, "SMALL", 5), (2, "MEDIUM", 20), (3, "LARGE", 30), (4, "SMALL", 20)],
        "p_partkey long, p_type string, p_size int",
    )
    li = spark.createDataFrame(
        [
            (1, 10.0, 100.0, 0.0),
            (1, 25.0, 100.0, 0.0),  # qty > 20 for SMALL: dropped
            (2, 20.0, 100.0, 0.0),
            (3, 30.0, 100.0, 0.0),
            (3, 10.0, 100.0, 0.0),  # qty < 20 for LARGE: dropped
            (4, 10.0, 100.0, 0.0),  # size 20 SMALL matches no branch
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    d = str(tmp_path)
    _write(p, d, "part")
    _write(li, d, "lineitem")
    row = QUERIES["rel_disjunct_revenue"].fn(spark, d).collect()[0]
    assert (row["rev_e4"], row["n_items"]) == (3_000_000, 3)


def test_manifest_jsonl_stream_writer_end_to_end(spark, tmp_path):
    """Custom Python DataSource streaming SINK: synthevents readStream
    -> manifest_jsonl writeStream delivers every row exactly once
    across micro-batches, each batch publishing its own atomic
    manifest; the manifest reader unions them."""
    import os

    from vector_database_watermarking_spark.sources.synthetic import (
        read_manifest_jsonl,
        register_manifest_sink,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    register_manifest_sink(spark)
    out = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("synthevents")
        .option("rows", 500)
        .option("rows_per_batch", 170)  # 3 full batches + 1 short
        .option("users", 11)
        .load()
        .select("event_id", "user_id", "event_type")
    )
    q = (
        stream.writeStream.format("manifest_jsonl")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    manifests = [n for n in os.listdir(out) if n.startswith("_MANIFEST-")]
    assert len(manifests) >= 3, manifests  # really arrived per micro-batch
    back, total = read_manifest_jsonl(spark, out)
    assert total == 500
    assert sorted(int(r["event_id"]) for r in back.collect()) == list(range(500))


def test_manifest_jsonl_stream_replay_is_exactly_once(spark, tmp_path):
    """The exactly-once contract under micro-batch REPLAY: committing
    the same batchId twice (what Structured Streaming does after a
    restart that lost the sink's ack) REPLACES the batch manifest, so
    the replayed rows supersede the originals instead of duplicating
    them, and the first attempt's staged files become invisible
    orphans."""
    import os

    from pyspark.sql import Row

    from vector_database_watermarking_spark.sources.synthetic import (
        ManifestJsonlStreamWriter,
        read_manifest_jsonl,
    )

    out = str(tmp_path / "replay_sink")
    os.makedirs(out)
    w = ManifestJsonlStreamWriter({"path": out})

    def stage(rows):
        return w.write(iter([Row(event_id=i, tag=t) for i, t in rows]))

    # batch 0 commits once; batch 1's first attempt commits, then the
    # whole batch is replayed (new staged file, same batchId)
    w.commit([stage([(0, "b0"), (1, "b0")])], batchId=0)
    w.commit([stage([(2, "attempt1"), (3, "attempt1")])], batchId=1)
    w.commit([stage([(2, "replay"), (3, "replay")])], batchId=1)

    back, total = read_manifest_jsonl(spark, out)
    assert total == 4
    rows = {(int(r["event_id"]), r["tag"]) for r in back.collect()}
    assert rows == {(0, "b0"), (1, "b0"), (2, "replay"), (3, "replay")}
    # the superseded attempt's file still exists on disk (an orphan)
    # but no manifest lists it
    staged = [n for n in os.listdir(out) if n.startswith("part-")]
    assert len(staged) == 3


def test_manifest_batch_overwrite_retracts_stream_manifests(spark, tmp_path):
    """A batch OVERWRITE into a previously-streamed directory must
    retract the per-batch stream manifests — the reader unions every
    published manifest, so leaving them in place would double-count."""
    import os

    from pyspark.sql import Row

    from vector_database_watermarking_spark.sources.synthetic import (
        ManifestJsonlStreamWriter,
        read_manifest_jsonl,
        register_manifest_sink,
    )

    out = str(tmp_path / "mixed")
    os.makedirs(out)
    w = ManifestJsonlStreamWriter({"path": out})
    w.commit([w.write(iter([Row(event_id=1), Row(event_id=2)]))], batchId=0)

    register_manifest_sink(spark)
    spark.createDataFrame([(10,), (11,), (12,)], "event_id long").write.format(
        "manifest_jsonl"
    ).option("path", out).mode("overwrite").save()

    back, total = read_manifest_jsonl(spark, out)
    assert total == 3
    assert sorted(int(r["event_id"]) for r in back.collect()) == [10, 11, 12]
    assert not [n for n in os.listdir(out) if n.startswith("_MANIFEST-")]


def test_manifest_stream_rejects_truncate_output_modes(spark):
    """complete/update output modes pass overwrite=True to
    streamWriter; the sink must refuse loudly instead of accumulating
    one full snapshot per micro-batch."""
    import pytest

    from vector_database_watermarking_spark.sources.synthetic import (
        ManifestJsonlDataSource,
    )

    ds = ManifestJsonlDataSource(options={"path": "/tmp/unused"})
    with pytest.raises(ValueError, match="append output mode only"):
        ds.streamWriter(None, True)
    assert ds.streamWriter(None, False) is not None


def test_manifest_vacuum_removes_only_orphans(spark, tmp_path):
    """The sink's maintenance op: vacuum removes exactly the staged
    files no manifest lists (replay supersessions, aborted attempts)
    and the dataset reads back identically before and after."""
    import os

    from pyspark.sql import Row

    from vector_database_watermarking_spark.sources.synthetic import (
        ManifestJsonlStreamWriter,
        read_manifest_jsonl,
        vacuum_manifest_jsonl,
    )

    out = str(tmp_path / "vac")
    os.makedirs(out)
    w = ManifestJsonlStreamWriter({"path": out})
    w.commit([w.write(iter([Row(event_id=1), Row(event_id=2)]))], batchId=0)
    w.commit([w.write(iter([Row(event_id=3)]))], batchId=1)
    w.commit([w.write(iter([Row(event_id=30)]))], batchId=1)  # replay
    # an aborted attempt's leftover
    with open(os.path.join(out, "part-99999-orphan.jsonl"), "w") as f:
        f.write('{"event_id": 999}\n')

    before = sorted(
        int(r["event_id"]) for r in read_manifest_jsonl(spark, out)[0].collect()
    )
    assert before == [1, 2, 30]
    # default grace window protects possibly-in-flight staging: these
    # orphans are seconds old, so nothing may be removed yet
    assert vacuum_manifest_jsonl(out) == 0
    removed = vacuum_manifest_jsonl(out, grace_seconds=0)
    assert removed == 2  # superseded batch-1 attempt + the orphan
    after = sorted(
        int(r["event_id"]) for r in read_manifest_jsonl(spark, out)[0].collect()
    )
    assert after == before
    assert vacuum_manifest_jsonl(out, grace_seconds=0) == 0  # idempotent


def test_manifest_batch_append_unions_prior_appends(spark, tmp_path):
    """mode('append') must UNION with previously appended batch data —
    a wholesale manifest replace would orphan the first write's files
    (and a later vacuum would delete them)."""
    from vector_database_watermarking_spark.sources.synthetic import (
        read_manifest_jsonl,
        register_manifest_sink,
        vacuum_manifest_jsonl,
    )

    register_manifest_sink(spark)
    out = str(tmp_path / "appends")
    for lo, hi in [(0, 3), (3, 5)]:
        spark.createDataFrame(
            [(i,) for i in range(lo, hi)], "event_id long"
        ).write.format("manifest_jsonl").option("path", out).mode(
            "append"
        ).save()
    back, total = read_manifest_jsonl(spark, out)
    assert total == 5
    assert sorted(int(r["event_id"]) for r in back.collect()) == [0, 1, 2, 3, 4]
    # nothing is an orphan: vacuum removes zero even unquiesced
    assert vacuum_manifest_jsonl(out, grace_seconds=0) == 0
    # and an OVERWRITE then replaces the whole dataset
    spark.createDataFrame([(99,)], "event_id long").write.format(
        "manifest_jsonl"
    ).option("path", out).mode("overwrite").save()
    back2, total2 = read_manifest_jsonl(spark, out)
    assert total2 == 1
    assert [int(r["event_id"]) for r in back2.collect()] == [99]


def test_manifest_stream_one_query_lifetime_per_path(spark, tmp_path):
    """ADVICE r09: a NEW streaming query (different checkpoint) on a
    path holding another run's manifests restarts batch ids from 0 and
    would silently supersede the prior run's committed batches — the
    sink must fail loudly. Restarts of the SAME query (same
    checkpoint) keep passing, and a batch overwrite releases the
    claim."""
    import os

    import pytest
    from pyspark.sql import Row

    from vector_database_watermarking_spark.sources.synthetic import (
        ManifestJsonlStreamWriter,
        read_manifest_jsonl,
        register_manifest_sink,
    )

    out = str(tmp_path / "owned")
    os.makedirs(out)
    w1 = ManifestJsonlStreamWriter(
        {"path": out, "checkpointlocation": "/ckpt/run1"}
    )
    w1.commit([w1.write(iter([Row(event_id=1), Row(event_id=2)]))], batchId=0)
    assert os.path.exists(os.path.join(out, "_STREAM_OWNER"))

    # restart of the same query (same checkpoint): replay passes
    w1b = ManifestJsonlStreamWriter(
        {"path": out, "checkpointlocation": "/ckpt/run1"}
    )
    w1b.commit([w1b.write(iter([Row(event_id=1), Row(event_id=2)]))], batchId=0)

    # a different query: refused before any manifest is replaced
    w2 = ManifestJsonlStreamWriter(
        {"path": out, "checkpointlocation": "/ckpt/run2"}
    )
    staged = w2.write(iter([Row(event_id=99)]))
    with pytest.raises(ValueError, match="already belongs"):
        w2.commit([staged], batchId=0)
    # ...and so is a query with no visible checkpoint at batch 0
    w3 = ManifestJsonlStreamWriter({"path": out})
    with pytest.raises(ValueError, match="streaming run"):
        w3.commit([w3.write(iter([Row(event_id=98)]))], batchId=0)
    # prior run's data intact
    back, total = read_manifest_jsonl(spark, out)
    assert total == 2

    # batch overwrite releases the claim; a fresh query may then own it
    register_manifest_sink(spark)
    spark.createDataFrame([(7,)], "event_id long").write.format(
        "manifest_jsonl"
    ).option("path", out).mode("overwrite").save()
    assert not os.path.exists(os.path.join(out, "_STREAM_OWNER"))
    w2.commit([w2.write(iter([Row(event_id=99)]))], batchId=0)
    assert os.path.exists(os.path.join(out, "_STREAM_OWNER"))


def test_manifest_stream_keyed_query_refuses_unclaimed_dirty_path(tmp_path):
    """A checkpoint-keyed query starting at batch 0 on a path whose
    stream manifests predate the ownership mark must refuse rather
    than claim-and-supersede."""
    import os

    import pytest
    from pyspark.sql import Row

    from vector_database_watermarking_spark.sources.synthetic import (
        ManifestJsonlStreamWriter,
    )

    out = str(tmp_path / "dirty")
    os.makedirs(out)
    legacy = ManifestJsonlStreamWriter({"path": out})
    legacy.commit([legacy.write(iter([Row(event_id=1)]))], batchId=0)
    os.remove(os.path.join(out, "_STREAM_OWNER")) if os.path.exists(
        os.path.join(out, "_STREAM_OWNER")
    ) else None

    w = ManifestJsonlStreamWriter(
        {"path": out, "checkpointlocation": "/ckpt/new"}
    )
    with pytest.raises(ValueError, match="unclaimed"):
        w.commit([w.write(iter([Row(event_id=2)]))], batchId=0)
    # ...at ANY batch id, not just 0 (review finding: a keyed query
    # whose checkpoint already advanced — re-pointed path option —
    # would otherwise silently replace the foreign _MANIFEST-{id});
    # the refused claim must also be released so a legitimate later
    # claim is not blocked by the half-claim
    import os as _os

    with pytest.raises(ValueError, match="unclaimed"):
        w.commit([w.write(iter([Row(event_id=3)]))], batchId=7)
    assert not _os.path.exists(_os.path.join(out, "_STREAM_OWNER"))


def test_near_dups_auto_matches_pinned_config(spark, sf_dir):
    """Round-10 registration: the default-argument near-dup query
    (band_bits=None auto-resolution + budget guard) must produce
    exactly the pinned 4-bit config's verified pairs at the graded
    fixtures — auto_band_bits(500) = 4, so any divergence means the
    resolution path (probe -> count -> knob -> guard) altered the
    computation."""
    from vector_database_watermarking_spark.registry import QUERIES

    auto = {
        tuple(r)
        for r in QUERIES["ext_emb_near_dups_auto"].fn(spark, sf_dir).collect()
    }
    pinned = {
        tuple(r)
        for r in QUERIES["ext_emb_near_dups_lsh"].fn(spark, sf_dir).collect()
    }
    assert auto == pinned and len(auto) > 0


def test_a14_modify_mini_invariants(spark, sf_dir):
    """Round-10 registration: the modification column of the mini
    robustness grid. p=0.0 modifies ceil(n*0)=0 rows (lossless
    round-trip, BER 0); p=0.3 leaves the strength-0.7 majority margin
    intact (agreeing share ~0.62 >> 0.5 after ~30% of votes turn to
    noise/strays) and the keyed-hash draw is deterministic — both
    cells must be exactly BER 0.0, matching the pinned oracle."""
    from vector_database_watermarking_spark.registry import QUERIES

    rows = sorted(
        (r["p"], r["scheme"], r["attack"], r["ber"])
        for r in QUERIES["a14_modify_mini"].fn(spark, sf_dir).collect()
    )
    assert rows == [
        (0.0, "tvp", "random_modify", 0.0),
        (0.3, "tvp", "random_modify", 0.0),
    ]
