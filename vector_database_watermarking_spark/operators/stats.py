"""Set/statistics operators (SURVEY A6-A13, SO1-SO4).

References: Jaccard overlap ``roubust/roubust.py:158-183``; hit rate /
missed-false ``roubust/data_attack.py:92-139``; per-carrier impact
``impact/impact.py:70-128``; correlation/binning
``t_vector/Z.py:106-125``.

All are native DataFrame aggregations; the per-query set operations
use ``collect_set`` + ``array_*`` higher-order functions (bounded by
k, so rows stay small at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def row_set_jaccard(a: DataFrame, b: DataFrame) -> float:
    """A10 (``calculate_overlap_ratio``, ``roubust/roubust.py:158-183``):
    |A ∩ B| / |A ∪ B| over whole rows, keyed by a content hash of the
    embedding (the reference tuples rows into a Python set)."""
    ha = a.select(F.sha2(F.to_json(F.struct("embedding")), 256).alias("h")).distinct()
    hb = b.select(F.sha2(F.to_json(F.struct("embedding")), 256).alias("h")).distinct()
    inter = ha.join(hb, on="h", how="inner").count()
    union = ha.unionByName(hb).distinct().count()
    return inter / union if union else 1.0


def topk_sets(edges: DataFrame) -> DataFrame:
    """Per-query neighbor set from a kNN-edges table → (src, nbrs)."""
    return edges.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))


def hit_rate(before: DataFrame, after: DataFrame, k: int) -> float:
    """A11 (``hit_rate``, ``roubust/data_attack.py:92-109``):
    Σ|before ∩ after| / (nq · k) over per-query top-k sets."""
    j = topk_sets(before).alias("b").join(
        topk_sets(after).withColumnRenamed("nbrs", "nbrs2"), on="src", how="inner"
    )
    row = j.agg(
        F.sum(F.size(F.array_intersect("nbrs", "nbrs2"))).alias("hits"),
        F.count(F.lit(1)).alias("nq"),
    ).head()
    nq = row["nq"] or 0
    return (row["hits"] or 0) / (nq * k) if nq else 0.0


def missed_false_counts(before: DataFrame, after: DataFrame) -> DataFrame:
    """A12 (``ca_miss_and_false``, ``roubust/data_attack.py:112-139``):
    per query, |before − after| (missed) and |after − before| (false).
    Queries present on one side only count their full set."""
    b = topk_sets(before).withColumnRenamed("nbrs", "b_nbrs")
    a = topk_sets(after).withColumnRenamed("nbrs", "a_nbrs")
    j = b.join(a, on="src", how="full_outer").select(
        "src",
        F.coalesce("b_nbrs", F.array()).alias("b_nbrs"),
        F.coalesce("a_nbrs", F.array()).alias("a_nbrs"),
    )
    return j.select(
        "src",
        F.size(F.array_except("b_nbrs", "a_nbrs")).alias("missed"),
        F.size(F.array_except("a_nbrs", "b_nbrs")).alias("false_hits"),
    )


def avg_missed_false(before: DataFrame, after: DataFrame) -> tuple[float, float]:
    row = missed_false_counts(before, after).agg(
        F.avg("missed").alias("m"), F.avg("false_hits").alias("f")
    ).head()
    return float(row["m"] or 0.0), float(row["f"] or 0.0)


def carrier_query_sets(edges: DataFrame, carriers: DataFrame) -> DataFrame:
    """J6 (``record_query_results``, ``test_erro.py:54-61``): for each
    carrier, the set of queries whose top-k contains it. Broadcast
    semi-join on the (small) carrier set, then invert the edge."""
    hits = edges.join(
        F.broadcast(carriers.select(F.col("vec_id").alias("dst"))), on="dst", how="left_semi"
    )
    return hits.groupBy(F.col("dst").alias("carrier")).agg(
        F.collect_set("src").alias("queries")
    )


def carrier_impact(
    edges_before: DataFrame, edges_after: DataFrame, carriers: DataFrame
) -> DataFrame:
    """A13 (``ca``, ``impact/impact.py:70-128``): per-carrier missed and
    extra query sets between the unwatermarked and watermarked indexes.

    Deviation (SURVEY A13 note): the reference returns the *last*
    carrier's before/after counts (loop-variable leak at
    ``impact/impact.py:126-127``); we aggregate over all carriers.
    """
    b = carrier_query_sets(edges_before, carriers).withColumnRenamed("queries", "q_before")
    a = carrier_query_sets(edges_after, carriers).withColumnRenamed("queries", "q_after")
    j = b.join(a, on="carrier", how="full_outer").select(
        "carrier",
        F.coalesce("q_before", F.array()).alias("q_before"),
        F.coalesce("q_after", F.array()).alias("q_after"),
    )
    return j.select(
        "carrier",
        F.size(F.array_intersect("q_before", "q_after")).alias("common"),
        F.size(F.array_except("q_before", "q_after")).alias("missed"),
        F.size(F.array_except("q_after", "q_before")).alias("false_hits"),
        F.size("q_before").alias("n_before"),
        F.size("q_after").alias("n_after"),
    )


def value_histogram(df: DataFrame, col: str) -> DataFrame:
    """A6 (``Counter`` at ``t_vector/e4:60-65``): frequency + ratio."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("ratio", F.col("n") / F.lit(float(total)))
    )


def pearson_corr(df: DataFrame, x: str, y: str) -> float:
    """A7 (``np.corrcoef`` at ``t_vector/Z.py:106-108``)."""
    return df.stat.corr(x, y)


def binned_means(df: DataFrame, x: str, y: str, n_bins: int) -> DataFrame:
    """A8 (``np.linspace`` + ``np.digitize`` + per-bin mean,
    ``t_vector/Z.py:111-125``): equal-width bins over [min(x), max(x)],
    mean of y per bin.

    The bucket is computed arithmetically (``floor((x−lo)/(hi−lo)·n)+1``
    clamped to [1, n] — width_bucket semantics with the max folded into
    the top bin) so the DuckDB oracle can evaluate the identical
    expression.
    """
    lohi = df.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).head()
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    bucket = F.least(
        F.greatest(
            (F.floor((F.col(x) - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_bins)) + 1).cast(
                "int"
            ),
            F.lit(1),
        ),
        F.lit(n_bins),
    )
    return (
        df.withColumn("bin", bucket)
        .groupBy("bin")
        .agg(F.avg(y).alias("mean_y"), F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


def distribution_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Population-stability-index (PSI) drift of ``value_col``'s
    distribution per ``group_col`` slice against the whole corpus —
    the monitor a production pipeline runs per ingest source / corpus
    version to catch a crawler or filter silently changing the data
    (extension; the reference has no monitoring surface).

    Equal-width bins over the global [min, max]; both the slice and
    the reference histogram are additively smoothed (``smooth`` per
    bin) so empty bins stay finite; PSI = Σ (p_g − p_all)·ln(p_g /
    p_all) ≥ 0, with 0 iff identical distributions.

    Scale shape: one partial-aggregated groupBy on (group, bin) — the
    histogram, thousands of rows at most — then joins among
    broadcast-sized aggregates; the raw table is scanned ONCE. The
    (group × bin) completion grid is a cross join of two tiny derived
    relations, never of data.
    """
    lo_hi = df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    )
    width = F.greatest(
        (F.col("hi") - F.col("lo")) / n_bins, F.lit(1e-12)
    )
    bin_ = F.least(
        F.floor((F.col(value_col).cast("double") - F.col("lo")) / width).cast(
            "int"
        ),
        F.lit(n_bins - 1),
    )
    binned = df.crossJoin(F.broadcast(lo_hi)).select(
        F.col(group_col).alias("grp"), bin_.alias("bin")
    )
    # per is the only full-data aggregate here and every downstream
    # relation (grid, full, both marginals, the joined PSI terms)
    # branches off it — materialize the tiny (groups × bins) histogram
    # once instead of re-aggregating the corpus per consumer. The
    # derived `full` is consumed three times but is a constant-size
    # join over this checkpoint, so its recompute is trivial.
    per = (
        binned.groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    grid = (
        per.select("grp")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
            )
        )
    )
    full = grid.join(per, ["grp", "bin"], "left").select(
        "grp", "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    g_tot = full.groupBy("grp").agg(F.sum("n").alias("n_grp"))
    a_tot = full.groupBy("bin").agg(F.sum("n").alias("n_bin"))
    n_all = F.sum("n_bin").over(Window.partitionBy())  # n_bins rows only
    a_frac = a_tot.select(
        "bin",
        ((F.col("n_bin") + smooth) / (n_all + smooth * n_bins)).alias("p_all"),
    )
    joined = (
        full.join(F.broadcast(g_tot), "grp")
        .join(F.broadcast(a_frac), "bin")
        .select(
            "grp",
            (
                (F.col("n") + smooth) / (F.col("n_grp") + smooth * n_bins)
            ).alias("p_grp"),
            "p_all",
            "n_grp",
        )
    )
    term = (F.col("p_grp") - F.col("p_all")) * F.log(
        F.col("p_grp") / F.col("p_all")
    )
    return joined.groupBy("grp").agg(
        F.round(F.sum(term), 6).alias("psi"),
        F.first("n_grp").alias("n_rows"),
    )


def basket_affinity(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence with lift — the association-mining
    shape behind co-purchase recommendation, query co-click analysis,
    and "users who touched X also touched Y" diagnostics: for every
    unordered item pair appearing in at least ``min_support`` baskets,
    the pair support, per-item supports, and lift = N·c_xy/(c_x·c_y)
    shipped as a 1e-4 integer via PURE int64 arithmetic (`div`), so
    the score is bit-identical on any engine with zero float ops.

    Output: (x, y, pair_baskets, x_baskets, y_baskets, lift_e4) with
    x < y.

    Scale shape: baskets dedup with one (basket, item) distinct; the
    pair enumeration is a self-equi-join on the basket key, so
    candidate volume is Σ basket_size² — bounded by real basket
    widths, never |items|²; pair and item supports are partial-agg
    count shuffles, the item-support joins are vocabulary-sized
    aggregation outputs left to AQE, and the basket count is a 1-row
    broadcast. Hot baskets (a basket with millions of items would
    degenerate) are a data bug this operator surfaces rather than
    hides — cap upstream if the domain allows them.
    """
    b = items.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    left = b.select("_b", F.col("_i").alias("x"))
    right = b.select("_b", F.col("_i").alias("y"))
    pairs = (
        left.join(right, on="_b")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_support)
    )
    sup = b.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))
    n_baskets = b.select(
        F.countDistinct("_b").alias("_nb")
    )
    out = (
        pairs.join(sup.select(F.col("_i").alias("x"), F.col("_n").alias("x_baskets")), on="x")
        .join(sup.select(F.col("_i").alias("y"), F.col("_n").alias("y_baskets")), on="y")
        .crossJoin(F.broadcast(n_baskets))
    )
    lift_e4 = F.expr("(10000 * _nb * pair_baskets) div (x_baskets * y_baskets)")
    return out.select(
        "x", "y", "pair_baskets", "x_baskets", "y_baskets",
        lift_e4.cast("long").alias("lift_e4"),
    )


def key_skew(df: DataFrame, key_col: str, label: str | None = None) -> DataFrame:
    """EXACT key-skew audit — the shuffle-planning diagnostic for the
    join/agg keys this engine shuffles on (hot keys are what salting /
    AQE skew-join exist for; this measures whether they're needed):
    one row with the key count, row count, max multiplicity, the top
    key's row share, and the exact Gini coefficient of the key
    multiplicity distribution, every value int64.

    Gini needs ranks in a global sort of per-key counts — a
    scale-killer if done literally (billions of keys on one
    partition). Instead the counts are aggregated once more into the
    COUNT HISTOGRAM (multiplicity c → m_c keys): keys sharing c are
    rank-contiguous, so Σ rank·x collapses per block to
    c·(m·o + m(m+1)/2) with o the number of keys in lower blocks —
    and the histogram is bounded by max multiplicity, so the only
    window runs over a value-bounded relation (ordered by c), never
    over the key set. G = (2·Σrank·x − (n+1)·S) / (n·S), shipped as a
    1e-6 integer via int64 `div`.

    Output: (key_name, n_keys, n_rows, max_n, top_share_e6, gini_e6).
    """
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    hist = counts.groupBy("_n").agg(F.count(F.lit(1)).alias("_m"))
    # value-bounded relation: the non-foldable constant partition key
    # keeps the plan out of WindowExec's unpartitioned path (and its
    # warning; a foldable lit(0) is optimized away — functions.windows)
    from ..functions.windows import one_partition

    w = (
        Window.partitionBy(one_partition("_n"))
        .orderBy("_n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # offset = keys in strictly-lower blocks; rank sum of this block =
    # m*offset + m(m+1)/2, every key in it weighs _n
    blocks = hist.select(
        "_n",
        "_m",
        (F.sum("_m").over(w) - F.col("_m")).alias("_o"),
    )
    agg = blocks.agg(
        F.sum("_m").alias("n_keys"),
        F.sum(F.col("_n") * F.col("_m")).alias("n_rows"),
        F.max("_n").alias("max_n"),
        F.sum(
            F.col("_n")
            * (
                F.col("_m") * F.col("_o")
                + F.expr("(_m * (_m + 1)) div 2")
            )
        ).alias("_sw"),
    )
    return agg.select(
        F.lit(label or key_col).alias("key_name"),
        "n_keys",
        "n_rows",
        "max_n",
        F.expr("(1000000 * max_n) div n_rows").alias("top_share_e6"),
        F.expr(
            "((2 * _sw - (n_keys + 1) * n_rows) * 1000000)"
            " div (n_keys * n_rows)"
        ).alias("gini_e6"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Median/MAD robust outlier flags per group (extension): a row is
    an outlier when ``|x - median| > k * MAD`` within its group — the
    heavy-tail-safe alternative to mean/stddev z-scores for corpus
    length/quality screens (one pathological document cannot shift the
    gate the way it shifts a mean).

    Exact tier (default): two ``percentile(…, 0.5)`` group aggregates
    (median, then MAD over the absolute deviations) and two broadcast
    joins back. On integer inputs every quantity is a dyadic rational
    (interpolated medians are midpoints, deviations are multiples of
    0.25), so ``median``/``mad``/``is_outlier`` are engine-exact and
    SQL-replayable. Scale tier (``exact=False``): same plan with
    ``percentile_approx`` — group state is a bounded sketch instead of
    the sorted value list, the choice at 100 TB where per-group value
    lists no longer fit an aggregation buffer. Group cardinality is
    assumed small (sources/languages), so the stats join is broadcast;
    the only full-data shuffles are the two group aggregates.
    """
    pct = "percentile_approx" if not exact else "percentile"
    v, g = F.col(value_col), F.col(group_col)
    # med's full-data percentile aggregate sits under BOTH dev
    # consumers — materialize the tiny per-group relation once.
    # dev itself is also consumed twice (MAD aggregate + final join)
    # but is left UNmaterialized on purpose: its recompute is one
    # pruned columnar scan plus a broadcast hash join (no shuffle),
    # while checkpointing it would write the full corpus width to
    # executor disk — recompute is the cheaper side at 100 TB.
    med = df.groupBy(group_col).agg(
        F.expr(f"{pct}({value_col}, 0.5)").alias("med")
    ).localCheckpoint(eager=True)
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_dev", F.abs(v.cast("double") - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(F.expr(f"{pct}(_dev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn(
            "is_outlier", F.abs(v.cast("double") - F.col("med")) > k * F.col("mad")
        )
        .drop("_dev")
    )


def quantile_normalize(
    df: DataFrame, value_col: str, group_col: str, exact: bool = True
) -> DataFrame:
    """Per-group rank normalization (extension): adds ``pr_e6`` — the
    ANSI ``percent_rank`` of the value within its group, bucketed to
    integer 1e-6 units. This is how heterogeneous per-source quality
    scores are made comparable before a global curation threshold
    ("keep the top 30% of EVERY source"): raw score scales differ per
    source, rank position doesn't. Ties share a rank (ANSI), so the
    result needs no tie-break column and is partitioning-invariant;
    the single ``(rank-1)/(n-1)`` division is one IEEE op, engine-
    exact before bucketing.

    Exact tier (default): one shuffle on the group key + a per-group
    sort — the exact-rank price. Scale tier (``exact=False``): the
    ``zorder_key_binned`` pattern — 1000 approximate per-group
    quantile edges (``percentile_approx``, one aggregate) broadcast
    back, each row's rank position read off the sorted edge array with
    a binary ``array_position``-free fold; no per-group sort of the
    data itself, error bounded by the sketch accuracy (≤ ~0.1 %
    rank units at the default accuracy; gated by test). The tier for
    100 TB groups where a full sort per group is the bottleneck.
    """
    if exact:
        w = Window.partitionBy(group_col).orderBy(value_col)
        return df.withColumn(
            "pr_e6",
            F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5)).cast("long"),
        )
    probs = [i / 1000.0 for i in range(1001)]
    edges = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, probs, 100000).alias("_edges")
    )
    # rank position = (#edges strictly below v) normalized to [0, 1]:
    # the sketch's per-mille grid read off with one array fold.
    below = F.aggregate(
        F.col("_edges"),
        F.lit(0),
        lambda acc, e: acc + (e < F.col(value_col)).cast("int"),
    )
    return (
        df.join(F.broadcast(edges), group_col)
        .withColumn(
            "pr_e6",
            F.floor(below.cast("double") / F.lit(1000.0) * 1000000 + F.lit(0.5))
            .cast("long"),
        )
        .drop("_edges")
    )


def winsorize_iqr(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
    exact: bool = True,
) -> DataFrame:
    """Tukey-fence winsorization per group (extension): values are
    CLIPPED to ``[q1 - k·IQR, q3 + k·IQR]`` instead of dropped — the
    transform used when outliers must not bias a statistic but every
    row must survive (length features, rate denominators). Adds
    ``lo``/``hi`` (the fences) and ``clipped`` (the winsorized value);
    pairs with :func:`robust_outliers`, which flags rather than
    rewrites.

    On integer inputs q1/q3 interpolate at quarter steps, so with a
    dyadic ``k`` (1.5 default) every fence and clipped value is a
    dyadic rational — engine-exact, SQL-replayable. Same plan as the
    MAD screen: one group percentile aggregate + a broadcast join;
    ``exact=False`` swaps in ``percentile_approx`` for sketch-state
    groups at corpus scale.
    """
    pct = "percentile" if exact else "percentile_approx"
    q = df.groupBy(group_col).agg(
        F.expr(f"{pct}({value_col}, 0.25)").alias("_q1"),
        F.expr(f"{pct}({value_col}, 0.75)").alias("_q3"),
    )
    lo = F.col("_q1") - k * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + k * (F.col("_q3") - F.col("_q1"))
    v = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(q), group_col)
        .withColumn("lo", lo)
        .withColumn("hi", hi)
        .withColumn("clipped", F.least(F.greatest(v, F.col("lo")), F.col("hi")))
        .drop("_q1", "_q3")
    )
