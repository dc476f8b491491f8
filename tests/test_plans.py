"""Physical-plan guards: the scale-critical optimizations (predicate
pushdown into parquet, column pruning, broadcast joins, rank-limit
pushdown, whole-stage codegen) must stay in the plans as code evolves.
"""

from pyspark.sql import functions as F

from vector_database_watermarking_spark.registry import QUERIES
from vector_database_watermarking_spark.sources.tables import load_embeddings, load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_head_slice_pushes_filter_into_scan(spark, sf_dir):
    df = load_embeddings(spark, sf_dir, num_samples=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,100)" in plan, plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(li)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan, plan


def test_small_dim_join_broadcasts(spark, sf_dir):
    q = QUERIES["rel_top_revenue_nations"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan, plan


def test_knn_topk_has_no_global_pair_shuffle(spark, sf_dir):
    """The exact kNN emits top-k inside mapInPandas: no Exchange of the
    O(n²) pair relation, no Window over all pairs."""
    from vector_database_watermarking_spark.operators.knn import knn_edges

    emb = load_table(spark, sf_dir, "embeddings")
    plan = plan_of(knn_edges(emb, k=5))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_pricing_summary_whole_stage_codegen(spark, sf_dir):
    q = QUERIES["rel_pricing_summary"].fn(spark, sf_dir)
    q.collect()  # AQE finalizes the plan (and codegen spans) on execution
    plan = plan_of(q)
    # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert "*(" in plan, plan
    # partial (map-side) aggregation before the exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_rank_window_limit_pushdown(spark, sf_dir):
    """row_number <= 3 should trigger WindowGroupLimit (rank-limit
    pushdown) so the shuffle carries only candidate rows."""
    q = QUERIES["rel_order_rank_window"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "WindowGroupLimit" in plan, plan


def test_carrier_semi_join_is_broadcast(spark, sf_dir):
    from vector_database_watermarking_spark.operators.knn import knn_edges
    from vector_database_watermarking_spark.operators.stats import carrier_query_sets

    emb = load_table(spark, sf_dir, "embeddings")
    edges = knn_edges(emb, k=5)
    carriers = emb.select("vec_id").limit(20)
    plan = plan_of(carrier_query_sets(edges, carriers))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_corpus_clean_single_shuffle_with_group_limit(spark, sf_dir):
    """The integrated cleaning pipeline must keep exactly one exchange
    (the dedup window on content_key) with the top-1-per-key limit
    pushed below it, and evaluate lang/quality gates as projections."""
    df = QUERIES["ext_corpus_clean"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Exchange") == 1, plan
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("Exchange")[1]  # partial limit map-side


def test_asof_join_single_shuffle_no_join(spark, sf_dir):
    """The as-of join must plan as union + window — exactly one
    Exchange on the key, and NO join operator (the whole point of the
    formulation: no pair blow-up at scale)."""
    from vector_database_watermarking_spark.operators.temporal import asof_join

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
    plan = plan_of(out)
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_range_join_is_banded_equi_join(spark, sf_dir):
    """The range join must be a hash equi-join on (key, bucket) with
    the range as a post-join filter — never a nested-loop/cartesian
    theta join."""
    from vector_database_watermarking_spark.operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    plan = plan_of(
        range_join(left, right, on=["user_id"], lower_sec=-600.0, upper_sec=0.0)
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan, plan


def test_curation_query_plan_shapes(spark, sf_dir):
    """The curation window queries keep their scale-designed shapes:
    deciles = ONE exchange (lang partitioning reused by the final
    agg), mixing = map-side WindowGroupLimit, weighted sample =
    shuffle-free TakeOrdered."""
    from vector_database_watermarking_spark.registry import QUERIES

    sf = sf_dir
    p = plan_of(QUERIES["ext_quality_deciles"].fn(spark, sf))
    assert p.count("Exchange") == 1, p
    p = plan_of(QUERIES["ext_source_mix"].fn(spark, sf))
    assert "WindowGroupLimit" in p and p.count("Exchange") == 1, p
    p = plan_of(QUERIES["ext_weighted_sample"].fn(spark, sf))
    assert "TakeOrderedAndProject" in p and "Exchange" not in p, p


def test_pack_sequences_no_global_window(spark, sf_dir):
    """Sequence packing must run its running sums in per-shard windows
    — no SinglePartition exchange (the global-window scale-killer) —
    and shuffle exactly once, on the shard key."""
    from vector_database_watermarking_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    plan = plan_of(pack_sequences(d, seq_len=512, n_shards=8))
    assert "SinglePartition" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """The Q17-shape correlated scalar subquery must plan as an
    aggregate + equi-join (Catalyst decorrelation), never a per-row
    subquery or nested-loop join."""
    q = QUERIES["rel_small_qty_revenue"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan, plan


def test_merge_upsert_reuses_key_partitioning(spark, sf_dir):
    """apply_changes must not re-shuffle the change side between its
    last-wins window and the merge join: both hash on the key, so the
    plan carries exactly one Exchange per input (window + base), never
    a third, and no nested-loop/cartesian fallback."""
    from vector_database_watermarking_spark.operators import merge

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ch = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("seq"), F.lit("update").alias("op"), "text"
    )
    plan = plan_of(merge.apply_changes(base, ch))
    assert plan.count("Exchange") <= 2, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_incremental_dedup_no_all_pairs(spark, sf_dir):
    """The batch-vs-corpus probe must stay equi-join shaped end to
    end: no cartesian/nested-loop anywhere, and the exact stage's key
    join plus the banded candidate join are hash joins."""
    from vector_database_watermarking_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents")
    out = dedup.incremental_dedup(
        d.filter(F.col("doc_id") % 5 != 0), d.filter(F.col("doc_id") % 5 == 0)
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bloom_contamination_prunes_before_join(spark, sf_dir):
    """The Bloom prefilter must sit UNDER the exact fingerprint join
    (corpus rows drop before any join/shuffle), the bitmap must arrive
    by broadcast, and the probe expression must stay native (no
    BatchEvalPython / pandas UDF in the plan)."""
    q = QUERIES["ext_contamination_bloom"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "EvalPython" not in plan, plan
    # the bitmap probe (xxhash64 positions) must be present, and must
    # sit BELOW the exact verify join: a plan tree prints parents
    # above children, so the join's first appearance must precede the
    # probe expression's
    assert "xxhash64" in plan, plan
    join_at = min(
        i
        for i in (
            plan.find("BroadcastHashJoin"),
            plan.find("SortMergeJoin"),
        )
        if i >= 0
    )
    assert join_at < plan.find("xxhash64"), plan


def test_compact_is_single_range_shuffle(spark, sf_dir, tmp_path):
    """Compaction = one RangePartitioning exchange + in-partition sort;
    no hash shuffle, no global sort-merge. Asserted on the OPERATOR's
    own plan (compact_plan is what compact writes through)."""
    from vector_database_watermarking_spark.operators.maintenance import compact_plan

    ev = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    ev.repartition(8).write.mode("overwrite").parquet(frag)
    df = compact_plan(spark.read.parquet(frag), "event_id", 4)
    plan = plan_of(df)
    assert "rangepartitioning" in plan.lower(), plan
    assert plan.lower().count("exchange") == 1, plan
    assert "global=true" not in plan.lower(), plan


def test_dup_spans_no_all_pairs_bounded_shuffles(spark, sf_dir):
    """Duplicate-span detection: skinny window relation, never a pair
    join — no cartesian/nested-loop anywhere, exactly one hash
    exchange on the window hash and doc-keyed exchanges otherwise."""
    q = QUERIES["ext_dup_spans"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("hashpartitioning(whash") == 1, plan


def test_unigram_nll_vocab_join_is_broadcast(spark, sf_dir):
    """LM scoring joins the token stream against the (much smaller)
    vocab via broadcast — the token stream must NOT shuffle on the
    join key."""
    q = QUERIES["ext_unigram_nll"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    # the trained vocab is checkpointed: the corpus token scan feeds
    # training once and scoring once, not the totals aggregate too
    assert plan.count("FileScan parquet") == 1, plan


def test_bigram_nll_lm_joins_no_cartesian_no_probe(spark, sf_dir):
    """Bigram LM scoring: the two LM-table joins never degenerate to a
    cartesian/nested-loop, and at fixture scale AQE broadcasts the
    aggregation outputs (chosen from RUNTIME sizes — the operator
    carries no broadcast hint and runs no driver probe jobs)."""
    q = QUERIES["ext_bigram_nll"].fn(spark, sf_dir)
    q.write.format("noop").mode("overwrite").save()  # let AQE finalize
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_ngram_novelty_single_shingle_shuffle_no_pairs(spark, sf_dir):
    """n-gram novelty: per-shingle doc counts + join back — never a
    doc-pair relation (no cartesian/nested-loop), and the distinct
    count aggregates partially (two HashAggregate phases around the
    shingle exchange)."""
    q = QUERIES["ext_ngram_novelty"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_tfidf_no_cartesian_partitioned_window(spark, sf_dir):
    """TF-IDF keywords: the df join never degenerates to a cartesian
    (the only nested-loop is the 1-row doc-count broadcast) and the
    top-k window is PARTITIONED on doc_id — no global sort of the
    token stream."""
    q = QUERIES["ext_tfidf_keywords"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition(doc_id" in plan, plan
    # partial aggregation around both count shuffles
    assert plan.count("HashAggregate") >= 4, plan


def test_pmi_array_native_pairs_no_positional_join(spark, sf_dir):
    """PMI collocations: adjacent pairs come from one array transform
    over the materialized tokens — the plan has no token-position
    self-join (would shuffle the corpus twice) and no cartesian beyond
    the two 1-row totals broadcasts; the top-k is a TakeOrdered, not a
    global Sort+Limit."""
    q = QUERIES["ext_pmi_collocations"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # pair relation joins two skinny unigram tables + two 1-row totals:
    # at most those joins, never a join keyed on a token-position column
    import re

    assert re.search(r"\bord#\d+", plan) is None, plan
    assert re.search(r"\bpos#\d+", plan) is None, plan


def test_gapfill_windows_partitioned_by_user(spark, sf_dir):
    """Calendar gap-fill: every window is partitioned on the key (the
    forward-fill never sorts the grid globally) and the grid explode
    happens after a partial-aggregated bounds shuffle."""
    q = QUERIES["rel_events_gapfill"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "windowspecdefinition(user_id" in plan or "windowspecdefinition(key" in plan, plan
    import re

    for m in re.finditer(r"windowspecdefinition\(([a-z_]+)", plan):
        assert m.group(1) in ("user_id", "key"), plan


def test_transitions_windows_partitioned(spark, sf_dir):
    """Event transitions: the lead() window is partitioned on user_id
    and the marginal window on from_type — nothing global touches the
    event stream."""
    q = QUERIES["rel_events_transitions"].fn(spark, sf_dir)
    plan = plan_of(q)
    import re

    parts = {
        m.group(1) for m in re.finditer(r"windowspecdefinition\(([a-z_]+)", plan)
    }
    assert parts <= {"user_id", "from_type"}, plan


def test_doc_chunks_is_shuffle_free(spark, sf_dir):
    """RAG chunking is one narrow codegen stage: sequence + explode +
    substring with no Exchange anywhere."""
    q = QUERIES["ext_doc_chunks"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "Exchange" not in plan, plan


def test_heavy_hitters_broadcast_rescan_no_sort_merge(spark, sf_dir):
    """Heavy hitters: the MG sketch (a MapInPandas pass) runs exactly
    once — eagerly checkpointed at build time, so the final plan reads
    it back as an ExistingRDD scan instead of re-running the Python
    pass per consumer (optimization round 13) — the rescan probes the
    bounded candidate set via a broadcast semi join (never a sort-merge
    of the token stream), and the only nested-loop is the 1-row total
    broadcast."""
    q = QUERIES["ext_heavy_hitters"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "MapInPandas" not in plan, plan  # sketch pinned by the checkpoint
    assert "ExistingRDD" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_spelling_variants_equi_blocked_never_all_pairs(spark, sf_dir):
    """FastSS variant join: candidates come from an EQUI-join on the
    deletion-variant key — no cartesian / nested-loop pair
    enumeration reachable from the plan."""
    q = QUERIES["ext_spelling_variants"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_scd2_windows_partitioned_by_key(spark, sf_dir):
    """SCD2 history: both windows (lead + version numbering) are
    partitioned on the key — nothing global touches the union."""
    import re

    q = QUERIES["rel_scd2_history"].fn(spark, sf_dir)
    plan = plan_of(q)
    parts = {
        m.group(1) for m in re.finditer(r"windowspecdefinition\(([a-z_]+)", plan)
    }
    assert parts == {"doc_id"}, plan


def test_link_pred_no_cartesian(spark, sf_dir):
    """RA link prediction: wedge enumeration and adjacency exclusion
    are equi-joins; the rank window runs after the TakeOrdered top-k."""
    q = QUERIES["ext_graph_link_pred"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rolling_range_window_partitioned_by_user(spark, sf_dir):
    """Time-interval rolling frame: the RANGE window is partitioned on
    user_id — nothing global touches the event stream."""
    import re

    q = QUERIES["rel_events_rolling_range"].fn(spark, sf_dir)
    plan = plan_of(q)
    parts = {
        m.group(1) for m in re.finditer(r"windowspecdefinition\(([a-z_]+)", plan)
    }
    assert parts == {"user_id"}, plan


def test_spikes_window_over_daily_aggregate_only(spark, sf_dir):
    """Spike detection: the trailing window runs over the (key, day)
    AGGREGATE (partial-agg shuffle first), partitioned on the key."""
    import re

    q = QUERIES["rel_events_spikes"].fn(spark, sf_dir)
    plan = plan_of(q)
    parts = {
        m.group(1) for m in re.finditer(r"windowspecdefinition\(([a-z_]+)", plan)
    }
    assert parts == {"key"}, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_basket_lift_no_cartesian(spark, sf_dir):
    """Market basket: pair enumeration is a self-equi-join on the
    basket key (the only nested-loop is the 1-row basket-count
    broadcast); supports are partial-aggregated."""
    q = QUERIES["rel_basket_lift"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


def test_key_skew_window_over_histogram_only(spark, sf_dir):
    """Key-skew audit: the rank window runs over the COUNT HISTOGRAM
    (constant partition key), never over the key set — the plan's only
    windows are lit-partitioned, and each key's counts partial-agg
    before any exchange."""
    import re

    q = QUERIES["rel_key_skew"].fn(spark, sf_dir)
    plan = plan_of(q)
    # the partition key is the non-foldable constant (_w0 =
    # pmod(xxhash64(_n), 1) — functions.windows.one_partition) and
    # every window ORDERS on the histogram's multiplicity column (_n),
    # i.e. it runs over the value-bounded histogram relation
    specs = re.findall(
        r"windowspecdefinition\((_w\d+#\d+L?|_n#\d+L?), (_n#\d+L?) ASC", plan
    )
    assert specs, plan
    assert len(specs) == len(re.findall(r"windowspecdefinition\(", plan)), plan
    assert plan.count("HashAggregate") >= 6, plan


def test_wau_fanout_bounded_no_cartesian(spark, sf_dir):
    """Rolling actives: the day fan-out explodes the DISTINCT
    (user, day) relation, the report-day probe is an equi-join."""
    q = QUERIES["rel_events_wau"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate explode" in plan, plan


def test_waiting_suppliers_semi_anti_hash_joins(spark, sf_dir):
    """Q21 shape: the EXISTS/NOT-EXISTS pair must plan as hash
    semi/anti equi-joins on the order key — never a nested-loop or
    cartesian product (the residual supplier inequality rides the
    equi-join, it doesn't replace it)."""
    q = QUERIES["rel_waiting_suppliers"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_session_window_native_operator(spark, sf_dir):
    """The native session tier must plan Spark's merging-session
    aggregate (no row_number/lag window functions at all)."""
    q = QUERIES["rel_events_session_window"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "session_window" in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_multi_consumer_subtrees_materialized(spark, sf_dir):
    """Round-8 rule (the ext_graph_link_pred sf1 lesson): a join/agg-
    bearing subtree consumed from 2+ plan positions must be
    materialized — ReuseExchange is not guaranteed, and without the
    checkpoint each consumer re-evaluates the subtree. The checkpoint
    shows up as a truncated lineage: the FINAL plan scans the source
    table strictly fewer times than it has logical consumers."""
    # Q21: l1 (lineitem JOIN orders) feeds the semi probe AND the anti
    # build; with l1 checkpointed only the l2 leg still scans lineitem,
    # and orders is not scanned at all in the returned plan.
    plan = plan_of(QUERIES["rel_waiting_suppliers"].fn(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "orders.parquet" not in plan, plan
    # funnel: v and c are checkpointed stage tables; only the purchase
    # stage still scans events in the final plan.
    plan = plan_of(QUERIES["rel_events_funnel"].fn(spark, sf_dir))
    assert plan.count("events.parquet") == 1, plan
    # perplexity filter: the LM-scored relation is checkpointed; the
    # median aggregate and final join both read the checkpoint, so the
    # documents table is not re-tokenized per consumer.
    plan = plan_of(QUERIES["ext_perplexity_filter"].fn(spark, sf_dir))
    assert "documents.parquet" not in plan, plan


def test_market_share_pushes_filters_and_broadcasts_dims(spark, sf_dir):
    """Q8 shape: the p_type/r_name filters must reach their parquet
    scans and every dimension join (nation x2 roles, region, part,
    supplier) must broadcast — the only shuffles left are the fact-side
    joins and the year group-by."""
    q = QUERIES["rel_market_share"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "EqualTo(p_type,ECONOMY)" in plan, plan
    assert "EqualTo(r_name,ASIA)" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_cheapest_supplier_window_limit_pushdown(spark, sf_dir):
    """Q2 shape: the per-part rn=1 winner must ride WindowGroupLimit
    (rank-limit pushed map-side), the p_size filter must reach the
    part scan, and the grouped supply aggregation must be partial."""
    q = QUERIES["rel_cheapest_supplier"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "WindowGroupLimit" in plan, plan
    assert "LessThanOrEqual(p_size,10)" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_idle_rich_uses_anti_join_and_single_row_broadcast(spark, sf_dir):
    """Q22 shape: NOT EXISTS must compile to a broadcast/shuffled
    LeftAnti hash join (never a nested loop over orders), the recency
    filter must reach the orders scan, and the scalar-average subquery
    must ride a broadcast of the one-row aggregate."""
    q = QUERIES["rel_idle_rich_customers"].fn(spark, sf_dir)
    plan = plan_of(q)
    # NOT EXISTS = hash LeftAnti (never a nested loop over orders)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the one legitimate nested loop is the 1-row average broadcast
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_forecast_revenue_all_predicates_pushed(spark, sf_dir):
    """Q6 shape: a pure scan-agg — the date window and quantity cap
    must reach the parquet scan as pushed filters, no join may appear,
    and the global aggregate must be partial (two HashAggregates
    around a single exchange)."""
    q = QUERIES["rel_forecast_revenue"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    # (the PushedFilters list is truncated in toString; the quantity
    # cap is visible in the scan-adjacent Filter's data filters)
    assert "< 24.0)" in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan


def test_local_supplier_volume_local_predicate_rides_join(spark, sf_dir):
    """Q5 shape: the c_nationkey = s_nationkey condition must be part
    of the supplier join's keys (no post-join filter materializing
    non-local pairs), nation/region must broadcast, and the orders
    date window must reach the scan."""
    q = QUERIES["rel_local_supplier_volume"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    # the local condition is an equi-key: c_nationkey appears INSIDE a
    # join's key list (composite with l_suppkey), not in a Filter
    import re

    assert re.search(
        r"BroadcastHashJoin \[l_suppkey#\d+L?, c_nationkey#\d+", plan
    ) or re.search(
        r"SortMergeJoin \[l_suppkey#\d+L?, c_nationkey#\d+", plan
    ), plan
    assert not re.search(r"Filter \([^\n]*c_nationkey#\d+\w* = s_nationkey", plan), plan


def test_important_parts_single_lineitem_scan(spark, sf_dir):
    """Q11 shape: the per-part aggregate feeds two consumers (its own
    1-row reduction and the share filter), so it is checkpointed per
    the multi-consumer-subtree rule — the final plan reads the
    materialized view, never re-scanning lineitem per consumer, and
    the only nested loop is the 1-row total broadcast."""
    q = QUERIES["rel_important_parts"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "lineitem.parquet" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_top_supplier_single_scan_max_broadcast(spark, sf_dir):
    """Q15 shape: the revenue view is aggregated once and
    checkpointed (multi-consumer-subtree rule: the max reduction and
    the equality probe both read it); its max comes back as a 1-row
    broadcast (no second lineitem scan, no global window)."""
    q = QUERIES["rel_top_supplier"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "lineitem.parquet" not in plan, plan
    assert "Window" not in plan, plan


def test_large_volume_customers_aggregates_before_joins(spark, sf_dir):
    """Q18 shape: the quantity HAVING runs on lineitem BEFORE any
    dimension join — the qualifying-order aggregate must sit below
    both joins in the plan, and the orders/customer joins must not
    see raw lineitems."""
    q = QUERIES["rel_large_volume_customers"].fn(spark, sf_dir)
    plan = plan_of(q)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # executedPlan prints top-down: joins appear before (above) the
    # fact-side aggregate they consume
    assert join_pos < agg_pos, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_disjunct_revenue_envelopes_pushed(spark, sf_dir):
    """Q19 shape: the three-branch disjunction itself can't be pushed
    whole, but its single-column envelopes must be — the Or over
    p_type/p_size reaches the part scan as a pushed filter, and the
    join stays a broadcast hash join (never a nested loop)."""
    q = QUERIES["rel_disjunct_revenue"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "Or(" in plan and "PushedFilters" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_priority_late_semi_never_broadcasts_fact(spark, sf_dir):
    """Q4 shape, round-9 sf1 lesson: the LEFT SEMI's build side is the
    RIGHT relation — the lineitem fact projection — and broadcasting a
    fact side is wrong at every scale (measured 2.4x slower at sf1,
    impossible at 100 TB). The shuffle_hash hint must hold: the semi
    join is a ShuffledHashJoin, never a broadcast."""
    q = QUERIES["rel_priority_late_orders"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_late_shipment_modes_late_predicate_rides_join(spark, sf_dir):
    """Q12 shape: the >90-day late predicate compares columns from
    both join sides, so it must ride the join condition (no post-join
    Filter re-materializing all pairs), and the shipdate window must
    reach the lineitem scan."""
    q = QUERIES["rel_late_shipment_modes"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    import re

    # either operand order — the authored predicate prints l_shipdate
    # first, a Catalyst rewrite could print the other way round
    assert not re.search(
        r"Filter [^\n]*(o_orderdate[^\n]*l_shipdate|l_shipdate[^\n]*o_orderdate)",
        plan,
    ), plan
    assert "CartesianProduct" not in plan, plan


def test_promo_revenue_single_row_two_aggregates(spark, sf_dir):
    """Q14 shape: the month filter reaches the lineitem scan, part is
    column-pruned to (p_partkey, p_type), and both conditional sums
    ride ONE aggregate (no second scan or join for the promo side)."""
    q = QUERIES["rel_promo_revenue"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "ReadSchema: struct<p_partkey:bigint,p_type:string>" in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("part.parquet") == 1, plan


def test_bucketed_cdc_read_is_partition_pruned(spark, tmp_path):
    """The bucketed snapshot layout's scale claim is that a trigger
    reads ONLY the changed buckets — which must be directory-level
    partition pruning at the scan (PartitionFilters), not a post-scan
    Filter over every bucket's rows."""
    from vector_database_watermarking_spark.streaming import cdc

    d = str(tmp_path / "t")
    base = spark.range(1000).selectExpr("id as doc_id", "id * 2 as val")
    cdc.init_table_bucketed(base, d, key="doc_id", n_buckets=8)
    df = cdc.read_version_buckets(spark, d, 0, [1, 3])
    plan = plan_of(df)
    assert "PartitionFilters: [_bucket" in plan and "IN (1,3)" in plan, plan
    # the pruning is directory-level: no row-level filter remains
    assert "DataFilters: []" in plan, plan


def test_nation_trade_preagg_join_reuses_agg_partitioning(spark, sf_dir):
    """The eager-aggregation Q7 variant's plan claim: the per-order
    collapse (groupBy(okey) + collect_list) leaves its output hash-
    partitioned on okey, and the fact-fact join REUSES that
    partitioning — the collapsed side is exchanged on okey exactly
    once, for the aggregate, never again for the join. Broadcast is
    disabled so the join planning matches the at-scale regime (at
    sf0.001 everything would broadcast and the claim would be
    vacuous)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = QUERIES["rel_nation_trade_preagg"].fn(spark, sf_dir)
        plan = plan_of(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # ONE okey exchange total: the aggregate's (okey2 — the orders
    # side — is a different attribute and doesn't match the '#').
    assert plan.count("hashpartitioning(okey#") == 1, plan
    # the collapse is the typed-buffer aggregate (collect_list)
    assert "ObjectHashAggregate" in plan, plan
    # both explicit nation broadcasts survive
    assert plan.count("BroadcastExchange") == 2, plan
