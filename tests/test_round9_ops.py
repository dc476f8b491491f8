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
