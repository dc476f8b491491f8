"""Deduplication operators for training-data pipelines (north-star
extension, not from the reference — SURVEY §7 M6).

Five tiers, all shuffle-lean and oracle-checkable where exact:

- exact: content-hash groupBy (one shuffle on a 64-bit key);
- MinHash: shingle → H keyed min-hashes per doc (one explode + one
  groupBy with H ``min`` aggregates — map-side partial mins make the
  shuffle O(docs·H), not O(shingles));
- LSH banding: band signature = hash of a signature slice; candidate
  pairs = equi-join on (band, band_hash) — a plain shuffle join AQE
  can skew-split;
- SimHash: per-token hash bit votes → 32-bit signature (one explode +
  one groupBy with 32 conditional sums);
- n-gram Jaccard verification: candidate pairs → exact intersection /
  union via the shingle sets.

Every hash is the engine's keyed 60-bit md5 (``functions.hashing``),
so signatures are partitioning-invariant and reproducible in DuckDB.

Scale notes (100 TB): the explode(shingles) relation is the big one —
it never shuffles raw (doc pairs come from the banded join, never an
all-pairs comparison); stop-shingle capping (drop shingles appearing
in > f% of docs) bounds the worst key. The verification join carries
only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def normalize_text(col: F.Column | str) -> F.Column:
    """Lowercase + collapse whitespace — the canonical form every
    dedup tier hashes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct normalized content, keeping
    the smallest doc_id; reports the multiplicity."""
    h = hash60(normalize_text(text_col))
    return (
        docs.withColumn("content_key", h)
        .groupBy("content_key")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of the normalized
    text. Built natively: split → transform over a sliding index
    sequence → explode → distinct."""
    # Materialize the token array behind an exchange before the
    # per-index slicing: otherwise Catalyst inlines the regex+split
    # into the transform lambda and tokenization reruns for every gram
    # index (O(len²) regex work per doc). The repartition also spreads
    # a single-file scan across cores.
    nparts = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.select("doc_id", F.split(normalize_text(text_col), " ").alias("_toks"))
        .repartition(nparts, "doc_id")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n))
    )
    # dedup per doc INSIDE the gram array (array_distinct) instead of a
    # relation-wide .distinct(): shingles can only repeat within their
    # own document (the row carries doc_id), so the output set is
    # identical. What this removes (plan-verified, optimization round
    # 13): the two-phase distinct AGGREGATE — a hash-table build over
    # the entire exploded shingle stream in every consumer (the
    # distinct's exchange itself was already satisfied by the doc_id
    # repartition above, so the win is the per-row aggregate work, 14
    # HashAggregate nodes in the minhash plan). Measured 13-40% per
    # consumer at sf0.1 (ngram_novelty 1.37->0.83 s).
    return (
        toks.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


#: universal-hash family for MinHash: h_i(x) = (A_i·(hash60(x) mod P) + B_i) mod P.
#: One md5 per shingle + integer arithmetic per hash — O(1) codegen per
#: extra hash function (eight separate md5 chains took ~8 s of Janino
#: compilation) and exactly reproducible in the DuckDB oracle.
MINHASH_P = 2_147_483_647  # 2^31 − 1 (Mersenne prime)


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) pairs derived from the keyed hash."""
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"mh_a_{i}".encode()).hexdigest()[:15], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mh_b_{i}".encode()).hexdigest()[:15], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """MinHash: signature_i = min over shingles of
    ``(A_i·(hash60(shingle) mod P) + B_i) mod P``.
    Output: (doc_id, sig array<long> of length num_hashes)."""
    base = hash60(F.col("shingle")) % F.lit(MINHASH_P)
    with_base = shingle_df.withColumn("_hb", base)
    mins = [
        F.min((F.lit(a) * F.col("_hb") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    sig = with_base.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_bands(
    signatures: DataFrame, rows_per_band: int = 4, num_hashes: int | None = None
) -> DataFrame:
    """Band the signature: (doc_id, band, band_hash). Docs agreeing on
    all rows of any band share a (band, band_hash) key.

    Pass ``num_hashes`` when known — otherwise a ``head()`` job runs
    just to learn the signature width (and recomputes its lineage if
    ``signatures`` isn't cached)."""
    if num_hashes is None:
        num_hashes = int(signatures.select(F.size("sig").alias("n")).head()["n"])
    n_bands = num_hashes // rows_per_band
    rows = []
    for b in range(n_bands):
        band_cols = [
            F.element_at("sig", b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        rows.append(
            F.struct(
                F.lit(b).alias("band"),
                hash60(F.concat_ws("_", *band_cols)).alias("band_hash"),
            )
        )
    return signatures.select(
        "doc_id", F.explode(F.array(*rows)).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_hash")


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: same (band, band_hash), doc1 < doc2."""
    a = bands.select(
        F.col("doc_id").alias("doc1"), "band", "band_hash"
    )
    b = bands.select(
        F.col("doc_id").alias("doc2"), "band", "band_hash"
    )
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def _jaccard_from_inter(
    inter: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Shared tail of every exact-Jaccard path: join per-doc shingle
    counts onto (doc1, doc2, n_inter), jaccard = ∩ / (|A| + |B| − ∩),
    filter by threshold."""
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed(
                "n_shingles", "n1"
            ),
            on="doc1",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed(
                "n_shingles", "n2"
            ),
            on="doc2",
        )
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def jaccard_verify(
    pairs: DataFrame, shingle_df: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs via the shingle
    relation: intersection = join count; union = |A| + |B| − ∩."""
    sizes = shingle_df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1 = shingle_df.select(F.col("doc_id").alias("doc1"), "shingle")
    s2 = shingle_df.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        pairs.join(s1, on="doc1")
        .join(s2, on=["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold).select(
        "doc1", "doc2", "n_inter", "n1", "n2", "jaccard"
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """SimHash: per-token 60-bit hash; each of ``bits`` positions votes
    +1/−1 by its bit; the signature sets bit i when the vote is
    positive. Output: (doc_id, simhash long)."""
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    ).filter(F.length("tok") > 0)
    # the md5-derived token hash is a named projection column so the 32
    # vote aggregates reference one attribute instead of inlining
    # hash60(tok) per bit, and the aggregation runs the default
    # two-phase (map-side partial) plan with NO explicit exchange: a
    # doc's tokens never leave the partition its text row was read in,
    # so the only shuffle carries one 33-column partial row per (doc,
    # input-partition) — at 100 TB that volume is independent of text
    # size, unlike repartitioning doc text or token rows (both measured
    # slower at sf0.1: 0.89 s token-exchange, 0.74 s this plan).
    hashed = tokens.select("doc_id", hash60(F.col("tok")).alias("h"))
    h = F.col("h")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(
    sig: DataFrame, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on the two
    16-bit halves (a pair within Hamming ≤ 3 of 32 bits agrees exactly
    on at least one half — pigeonhole), so no all-pairs join."""
    half = bits // 2
    lo = F.col("simhash").bitwiseAND(F.lit(2**half - 1))
    hi = F.shiftright(F.col("simhash"), half)
    blocked = sig.select(
        "doc_id", "simhash", lo.alias("b_lo"), hi.alias("b_hi")
    )
    pairs = None
    for key in ["b_lo", "b_hi"]:
        a = blocked.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("s1"), key)
        b = blocked.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("s2"), key)
        p = a.join(b, on=key).filter(F.col("doc1") < F.col("doc2")).drop(key)
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


def ngram_jaccard_near_dups(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    text_col: str = "text",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dups WITHOUT MinHash banding: the
    inverted shingle index joins every pair sharing ≥ 1 shingle, so
    the work is output-bound (shared shingles), never all-pairs.

    ``max_doc_freq`` drops "stop shingles" (appearing in more docs)
    from candidate *generation* — the knob that bounds the quadratic
    blowup of hot shingles at scale. Reported Jaccard values stay
    exact for every emitted pair (intersections recount the full
    shingle relation), but RECALL is capped: a pair sharing only stop
    shingles is never generated — in the extreme, exact duplicates of
    a hot template (all shingles above the cap) are missed entirely.
    Run the exact-dedup tier first; it catches precisely those.

    ``shingle_df`` lets the caller pass (and persist) a pre-built
    shingle relation; the operator itself never persists."""
    sh = (
        word_shingles(docs, n=n, text_col=text_col)
        if shingle_df is None
        else shingle_df
    )
    if max_doc_freq is not None:
        # capped path: stop shingles only leave candidate GENERATION;
        # jaccard_verify recounts intersections over the full shingle
        # relation so reported values stay exact for emitted pairs
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        gen = sh.join(
            freq.filter(F.col("df") <= max_doc_freq), on="shingle", how="left_semi"
        )
        cand = (
            gen.select(F.col("doc_id").alias("doc1"), "shingle")
            .join(gen.select(F.col("doc_id").alias("doc2"), "shingle"), on="shingle")
            .filter(F.col("doc1") < F.col("doc2"))
            .select("doc1", "doc2")
            .distinct()
        )
        return jaccard_verify(cand, sh, threshold).select("doc1", "doc2", "jaccard")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1 = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        s1.join(s2, on="shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold).select(
        "doc1", "doc2", "jaccard"
    )


def _pair_components(pairs: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """Connected components of a verified near-dup pair list
    (``doc1 < doc2``, distinct), labeled by min reachable doc id.
    Returns (doc_id, _cid) for edge-incident docs only.

    Tiered like every broadcast-capped operator here: collect + driver
    union-find while the pair list fits ``knn.MAX_BROADCAST_ROWS``
    (the list is output-bound — the near-dup fraction of the corpus —
    so this tier covers realistic corpora far beyond fixture scale);
    distributed min-label propagation past it. Both converge to
    component = min reachable id, so the tiers are output-identical.
    ``sh`` is the persisted shingle relation the pair lineage re-reads;
    the scale tier must checkpoint the edges before unpersisting it.
    """
    from .graph import connected_components, union_find_labels
    from .knn import probe_collect

    sess = pairs.sparkSession
    rows = probe_collect(pairs.select("doc1", "doc2"))
    if rows is not None:
        if sh is not None:
            sh.unpersist()
        labels = union_find_labels([(r["doc1"], r["doc2"]) for r in rows])
        return sess.createDataFrame(labels, "doc_id long, _cid long")

    # verified pairs are distinct with doc1 < doc2, so adding the
    # reverses yields a symmetric, duplicate-free edge set without the
    # symmetrizing distinct shuffle inside connected_components.
    half = pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
    # materialize the edge table ONCE: the components loop, the active-
    # node set, and the loop's own persist all branch off it, and
    # without the checkpoint each branch replays the whole
    # shingle→minhash→band-join→verify pipeline (measured 3× the
    # pipeline cost at sf0.01)
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    if sh is not None:
        sh.unpersist()  # the checkpoint cut the lineage; nothing re-reads it
    active = edges.select(F.col("src").alias("vec_id")).distinct()
    return connected_components(edges, active, assume_symmetric=True).select(
        F.col("vec_id").alias("doc_id"), F.col("component").alias("_cid")
    )


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """New-batch-vs-existing-corpus dedup — the shape production
    ingestion actually runs (you never re-dedup 100 TB to admit a new
    crawl; you probe the new batch against the standing corpus).

    Stages, each asymmetric (batch × corpus, never corpus × corpus):

    1. exact: the batch row's normalized-content key probed against
       the corpus's distinct key set (equi-join on the 60-bit key;
       at scale the corpus side is a pre-materialized, bucketed key
       table, so the probe is a co-located join);
    2. near: MinHash signatures for the *surviving* batch docs only
       (exact dups never reach banding), banded LSH keys joined
       against the corpus's band table — in production that table is
       precomputed once and appended per admitted batch, so each
       ingestion only pays signatures for its own rows;
    3. verify: exact n-gram Jaccard on candidate pairs, best corpus
       match per batch doc (highest Jaccard, ties to smallest id).

    Output: one row per batch doc — (doc_id, status
    'exact_dup'|'near_dup'|'unique', match_doc_id, jaccard).
    ``match_doc_id`` is the smallest corpus holder of the same key for
    exact dups, the best verified match for near dups, null otherwise;
    ``jaccard`` is null unless status = 'near_dup'.

    Scale shape: the corpus is touched only through two skinny derived
    relations (content keys; band keys) that both partition on their
    join key; candidate volume is output-bound via banding; no
    all-pairs join and nothing driver-side anywhere.
    """
    ckey = hash60(normalize_text(text_col))
    # consumed by BOTH the exact-match join and the survivors anti-join
    # — materialize the skinny (key, id) relation once instead of
    # re-hashing and re-aggregating the whole corpus per consumer.
    # LAZY checkpoint (optimization round 13): the `near` checkpoint
    # action below is its first consumer and materializes it there; an
    # eager one serialized a whole extra job barrier before any other
    # work could start (3 serial jobs -> 2 per call, A/B'd at sf0.1).
    corpus_keys = (
        corpus.withColumn("content_key", ckey)
        .groupBy("content_key")
        .agg(F.min("doc_id").alias("match_doc_id"))
        .localCheckpoint(eager=False)
    )
    batch_keyed = batch.withColumn("content_key", ckey)
    exact = batch_keyed.join(corpus_keys, on="content_key").select(
        "doc_id", "match_doc_id"
    )

    survivors = batch_keyed.join(corpus_keys, on="content_key", how="left_anti").drop(
        "content_key"
    )
    sh_batch = word_shingles(survivors, n=n, text_col=text_col).persist()
    sh_corpus = word_shingles(corpus, n=n, text_col=text_col).persist()
    bands_b = lsh_bands(
        minhash_signatures(sh_batch, num_hashes=num_hashes),
        rows_per_band=rows_per_band,
        num_hashes=num_hashes,
    )
    bands_c = lsh_bands(
        minhash_signatures(sh_corpus, num_hashes=num_hashes),
        rows_per_band=rows_per_band,
        num_hashes=num_hashes,
    )
    cand = (
        bands_b.select(F.col("doc_id").alias("doc1"), "band", "band_hash")
        .join(
            bands_c.select(F.col("doc_id").alias("doc2"), "band", "band_hash"),
            on=["band", "band_hash"],
        )
        .select("doc1", "doc2")
        .distinct()
    )
    # verification reads each side's own shingle relation (doc1 =
    # batch, doc2 = corpus — ids may collide across sides, so sizes
    # must stay per-side too: batch sizes join on doc1 only, corpus
    # sizes on doc2 only (a unioned sizes relation would double-join
    # a colliding id and report jaccard > 1)
    bsz = sh_batch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n1"))
    csz = sh_corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n2"))
    inter = (
        cand.join(sh_batch.select(F.col("doc_id").alias("doc1"), "shingle"), on="doc1")
        .join(
            sh_corpus.select(F.col("doc_id").alias("doc2"), "shingle"),
            on=["doc2", "shingle"],
        )
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    near_all = (
        inter.join(bsz.withColumnRenamed("doc_id", "doc1"), on="doc1")
        .join(csz.withColumnRenamed("doc_id", "doc2"), on="doc2")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = Window.partitionBy("doc1").orderBy(F.col("jaccard").desc(), F.col("doc2"))
    near = (
        near_all.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("doc1").alias("doc_id"),
            F.col("doc2").alias("match_doc_id"),
            "jaccard",
        )
    )
    # materialize the skinny near-match relation, then release the two
    # cached shingle relations (they leak storage blocks across calls
    # otherwise); localCheckpoint keeps `near` valid after unpersist.
    near = near.localCheckpoint(eager=True)
    sh_batch.unpersist()
    sh_corpus.unpersist()

    status = (
        F.when(F.col("_exact").isNotNull(), F.lit("exact_dup"))
        .when(F.col("_near").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
    )
    return (
        batch.select("doc_id")
        .join(exact.select("doc_id", F.col("match_doc_id").alias("_exact")), "doc_id", "left")
        .join(
            near.select(
                "doc_id", F.col("match_doc_id").alias("_near"), "jaccard"
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            status.alias("status"),
            F.coalesce("_exact", "_near").alias("match_doc_id"),
            F.when(F.col("_exact").isNull(), F.col("jaccard")).alias("jaccard"),
        )
    )


def near_dup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    quality: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy-dedup canonicalization: MinHash-LSH near-dup pairs →
    connected components → one canonical document per cluster.

    The pair list alone doesn't dedup a corpus — near-duplication is
    transitive in practice (A≈B, B≈C) and a cluster of m copies yields
    up to m(m−1)/2 pairs, so production pipelines collapse the pair
    graph to components and keep one representative per component.
    This operator is that last mile: candidate pairs from the banded
    LSH join (never all-pairs), exact-Jaccard verification, then a
    min-reachable-id components closure (:func:`_pair_components` —
    driver union-find under the broadcast cap, the distributed
    label-propagation fixpoint past it).

    Canonical policy: by default the smallest ``doc_id`` per cluster
    (= the component label itself); pass ``quality`` as a
    ``(doc_id, quality)`` DataFrame to keep the highest-quality copy
    instead (ties broken by smallest id) — the "keep best, not first"
    rule corpus curation wants.

    Output: (doc_id, cluster_id, cluster_size, is_canonical) — one row
    per input document; singletons form their own cluster. Filtering
    ``is_canonical`` yields the deduplicated corpus; keeping all rows
    yields the membership map (for provenance / repeated-content
    weighting a la SemDeDup).

    Scale shape: pair volume is output-bound (banded join + verify);
    the components closure runs ONLY over edge-incident documents — the
    near-dup fraction of the corpus, typically well under 1% — so the
    edge list is tiny relative to the corpus at any scale. While it
    fits the broadcast budget (``knn.MAX_BROADCAST_ROWS`` pairs, the
    same dispatch constant as every broadcast tier here) the closure is
    a driver union-find over the collected pairs — the iterative
    label-propagation loop costs ~6 scheduled jobs in fixed overhead,
    which dwarfs a sub-millisecond union-find at fixture scale
    (MEASURED 1.7 s → 0.3 s at sf0.1, identical output). Past the
    budget the distributed label-propagation fixpoint
    (``graph.connected_components``) takes over. Singletons are
    restored afterwards by a left join with ``coalesce(cluster_id,
    doc_id)`` (either closure would have left their own id untouched,
    so the output is identical). The final size/canonical joins
    shuffle on cluster id.
    """
    sh = word_shingles(docs, n=n, text_col=text_col).persist()
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    bands = lsh_bands(sig, rows_per_band=rows_per_band, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(bands)
    pairs = jaccard_verify(cand, sh, threshold=threshold)

    if quality is None:
        # driver-tier fast path (optimization round 13): while the pair
        # list fits the broadcast budget, cluster SIZES are a Counter
        # over the union-find labels — the per-cluster aggregate, the
        # docs-side checkpoint, and the size join all collapse into ONE
        # broadcast left join (2.3 s → 1.7 s at sf0.1, identical rows;
        # singletons coalesce to (own id, size 1) exactly as the
        # aggregate produced). The quality branch keeps the relational
        # shape — canonical choice needs the quality VALUES, which live
        # distributed.
        from collections import Counter

        from .graph import union_find_labels
        from .knn import probe_collect

        rows = probe_collect(pairs.select("doc1", "doc2"))
        if rows is not None:
            sh.unpersist()
            labels = union_find_labels([(r["doc1"], r["doc2"]) for r in rows])
            csize = Counter(cid for _, cid in labels)
            lbl = docs.sparkSession.createDataFrame(
                [(d, c, csize[c]) for d, c in labels],
                "doc_id long, _cid long, _csz long",
            )
            return (
                docs.select("doc_id")
                .join(F.broadcast(lbl), on="doc_id", how="left")
                .select(
                    "doc_id",
                    F.coalesce(F.col("_cid"), F.col("doc_id")).alias("cluster_id"),
                    F.coalesce(F.col("_csz"), F.lit(1)).alias("cluster_size"),
                    (
                        F.col("doc_id")
                        == F.coalesce(F.col("_cid"), F.col("doc_id"))
                    ).alias("is_canonical"),
                )
            )

    comp_active = _pair_components(pairs, sh)
    # comp feeds the size aggregate AND the final join — materialize
    # the narrow (doc_id, cluster_id) map once so neither consumer
    # re-scans docs or replays the components closure
    comp = (
        docs.select("doc_id")
        .join(comp_active, on="doc_id", how="left")
        .select(
            "doc_id", F.coalesce(F.col("_cid"), F.col("doc_id")).alias("cluster_id")
        )
        .localCheckpoint(eager=True)
    )
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    out = comp.join(sizes, on="cluster_id")
    if quality is None:
        canonical = F.col("doc_id") == F.col("cluster_id")
        return out.select("doc_id", "cluster_id", "cluster_size", canonical.alias("is_canonical"))
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        out.join(quality.select("doc_id", "quality"), on="doc_id", how="left")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("_rn") == 1).alias("is_canonical"),
        )
    )


# ------------------------------------------------ duplicate-span removal


def window_occurrences(
    docs: DataFrame, w: int = 5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, s, whash): every w-token window of the normalized
    text, 1-based start position, 60-bit keyed hash of the joined
    window. The substring-level analogue of :func:`word_shingles`
    (which is position-less and distinct); token arrays are
    materialized behind a doc-keyed exchange for the same
    inline-regex reason."""
    nparts = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.select(
        "doc_id", F.split(normalize_text(text_col), " ").alias("_toks")
    ).repartition(nparts, "doc_id")
    idx = F.when(
        F.size("_toks") >= w, F.sequence(F.lit(1), F.size("_toks") - w + 1)
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        idx,
        lambda s: F.struct(
            s.alias("s"),
            hash60(F.concat_ws(" ", F.slice(F.col("_toks"), s, w))).alias("whash"),
        ),
    )
    return toks.select("doc_id", F.explode(wins).alias("_w")).select(
        "doc_id", F.col("_w.s").alias("s"), F.col("_w.whash").alias("whash")
    )


def duplicate_spans(docs: DataFrame, w: int = 5, text_col: str = "text") -> DataFrame:
    """Exact repeated-substring spans — the training-data dedup step
    that drops REPEATED PASSAGES rather than whole near-duplicate
    documents (boilerplate headers, license blocks, templated
    paragraphs survive document-level dedup; this is the
    suffix-array-free, window-hash formulation of that pass).

    Semantics: a w-token window is *duplicated* when it occurs more
    than once corpus-wide (across or within documents). The first
    occurrence in global (doc_id, s) order is canonical and kept;
    every other occurrence marks its w token positions as duplicate
    coverage. Per document, covered positions merge into maximal
    spans (gaps-and-islands over overlapping/adjacent windows).
    Output: (doc_id, span_start, span_end, span_len), token positions
    1-based inclusive.

    Scale shape: the window relation is one skinny row per token
    (doc_id, s, hash) — no text payload. The canonical occurrence per
    hash comes from a ``groupBy(whash).agg(min(struct(doc_id, s)))``
    — MAP-SIDE COMBINABLE, so a boilerplate window repeated 10^8
    times still reduces to one row per (hash, input partition) before
    the exchange — followed by an equi-join of the occurrences
    against that (distinct-hash-sized) relation, which AQE can
    skew-split; a ``row_number`` window per hash would instead sort
    the hot hash's entire occurrence list in one task. Span merging
    is ONE shuffle on doc_id over duplicate occurrences only
    (output-bound — the duplicated fraction, not the corpus). No
    all-pairs join anywhere.
    """
    wins = window_occurrences(docs, w, text_col)
    canon = wins.groupBy("whash").agg(
        F.min(F.struct("doc_id", "s")).alias("_first"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    dup = (
        wins.join(canon.filter(F.col("_cnt") > 1), on="whash")
        .filter(
            (F.col("doc_id") != F.col("_first.doc_id"))
            | (F.col("s") != F.col("_first.s"))
        )
        .select("doc_id", "s")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("s")
    prev_end = F.max(F.col("s") + w - 1).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.withColumn(
        "_new",
        F.when(F.col("s") > F.coalesce(prev_end, F.lit(-1)) + 1, 1).otherwise(0),
    ).withColumn("_isl", F.sum("_new").over(wdoc))
    return (
        isl.groupBy("doc_id", "_isl")
        .agg(
            F.min("s").alias("span_start"),
            F.max(F.col("s") + w - 1).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame, w: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document duplicate-coverage profile over
    :func:`duplicate_spans`: (doc_id, n_tokens, n_spans, dup_tokens,
    dup_ratio) — zero rows for clean documents, so the output is a
    full curation view (filter ``dup_ratio > x`` to quarantine, or
    feed the spans to a text rewriter)."""
    spans = duplicate_spans(docs, w, text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"), F.sum("span_len").alias("dup_tokens")
    )
    base = docs.select(
        "doc_id", F.size(F.split(normalize_text(text_col), " ")).alias("n_tokens")
    )
    return base.join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        # exact-integer division: raw double is engine-deterministic,
        # rounding would add a half-boundary hazard (see unigram NLL)
        (F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens")).alias(
            "dup_ratio"
        ),
    )


def remove_duplicate_spans(
    docs: DataFrame, w: int = 5, text_col: str = "text"
) -> DataFrame:
    """Rewrite each document with its duplicate-covered tokens REMOVED
    (the canonical first occurrence of every window survives, so
    corpus-wide each repeated passage is kept exactly once). The
    consuming end of :func:`duplicate_spans`.

    Output: (doc_id, clean_text, n_kept_tokens) — one row per input
    document; clean documents pass through verbatim (normalized), a
    fully-duplicate document becomes the empty string.

    Scale shape: token positions explode to one skinny row per token;
    covered positions (output-bound — only duplicated spans) anti-join
    them on (doc_id, position); the rebuild is one doc-keyed
    aggregation whose per-group state is the document itself — the
    unavoidable cost of emitting rewritten text, same as any
    tokenize-detokenize pass.
    """
    spans = duplicate_spans(docs, w, text_col)
    toks = docs.select(
        "doc_id", F.split(normalize_text(text_col), " ").alias("_toks")
    )
    pos = toks.select(
        "doc_id", F.posexplode("_toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("p"),
    )
    kept = pos.join(covered, on=["doc_id", "p"], how="left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept_tokens"),
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept_tokens", F.lit(0)).cast("long").alias(
                "n_kept_tokens"
            ),
        )
    )


def spelling_variants(
    docs: DataFrame, min_len: int = 5, text_col: str = "text"
) -> DataFrame:
    """Edit-distance-1 pairs over the corpus vocabulary via
    deletion-neighborhood blocking (FastSS, Bocek et al. 2007; the
    SymSpell trick): spelling-variant / typo-candidate mining for
    corpus normalization, OCR cleanup, and query rewriting — the
    string-similarity join nobody should run as an all-pairs
    ``levenshtein`` theta join.

    Two strings are within edit distance 1 iff they share an element
    of each other's {self} ∪ {single-character deletions} neighborhood
    (a deletion pair hits the shorter string itself; a substitution
    pair meets at the common delete-at-the-diff-position string), so
    the join is an EQUI-join on the exploded variant key — candidate
    volume is Σ(len+1) per token, never |vocab|². Sharing a variant
    overshoots distance 1 in corner cases (e.g. "ab"/"ba" share "a"),
    so candidates are verified with the exact ``levenshtein`` — on
    candidate pairs only.

    Output: (t1, t2, df1, df2) with t1 < t2 and df = document
    frequency of each token; only tokens of length ≥ ``min_len``
    participate (short tokens make everything a neighbor).

    Scale shape: vocabulary extraction is the standard token explode +
    distinct-count shuffle; the variant explode is narrow; the
    candidate equi-join shuffles on the variant string and AQE splits
    hot variants; the verify filter and df joins touch candidate pairs
    and the skinny vocab relation only.
    """
    from .text import materialized_tokens

    # vocab is consumed three times (variant explode + both df
    # lookups) — materialize the skinny (tok, df) relation once rather
    # than re-tokenizing the corpus per consumer
    vocab = (
        materialized_tokens(docs, text_col)
        .select("doc_id", F.explode("_toks").alias("tok"))
        .filter(F.length("tok") >= min_len)
        .groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
        .localCheckpoint(eager=True)
    )
    variants = vocab.select(
        "tok",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(tok)), p -> "
                    "CASE WHEN p = 0 THEN tok "
                    "ELSE substring(tok, 1, p - 1) || substring(tok, p + 1) "
                    "END)"
                )
            )
        ).alias("_v"),
    )
    a = variants.select(F.col("tok").alias("t1"), "_v")
    b = variants.select(F.col("tok").alias("t2"), "_v")
    pairs = (
        a.join(b, on="_v")
        .filter(F.col("t1") < F.col("t2"))
        .select("t1", "t2")
        .distinct()
        .filter(F.levenshtein("t1", "t2") == 1)
    )
    d1 = vocab.select(F.col("tok").alias("t1"), F.col("df").alias("df1"))
    d2 = vocab.select(F.col("tok").alias("t2"), F.col("df").alias("df2"))
    return pairs.join(d1, on="t1").join(d2, on="t2").select(
        "t1", "t2", "df1", "df2"
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    t_num: int = 4,
    t_den: int = 5,
    text_col: str = "text",
    candidate_budget: int | None = 100_000_000,
) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering (the
    SSJoin/PPJoin family, Chaudhuri et al. ICDE'06 / Xiao et al.
    WWW'08): every document pair whose word-set Jaccard is ≥ the
    rational threshold ``t_num/t_den`` — same answer as the all-pairs
    scan, at candidate volume bounded by the prefix lemma instead of
    n².

    Ordering every doc's distinct tokens by GLOBAL rarity (ties by
    token), a pair with ``|a∩b| ≥ ceil(t·|s|)`` must collide inside
    each side's ``|s| − ceil(t·|s|) + 1`` prefix — so the equi-join on
    prefix tokens is a LOSSLESS blocking step (unlike MinHash banding,
    which trades recall), and rare-token prefixes keep the join's key
    distribution flat. A symmetric size filter (``t·|a| ≤ |b|``)
    prunes candidates before the exact intersection count verifies.

    Everything stays in integer space: ``ceil(t·sz)`` is
    ``(t_num·sz + t_den − 1) div t_den``, the acceptance test is
    ``t_den·|∩| ≥ t_num·|∪|``, and the reported similarity is the
    integer quotient ``jac_e6 = 1e6·|∩| div |∪|`` — cross-engine
    reproducible with no float thresholds.

    Output: (doc1, doc2, inter_size, union_size, jac_e6) with
    ``doc1 < doc2``.

    Scale shape: tokenization + the frequency join shuffle on token;
    the candidate join keys on prefix tokens only, and on a
    NATURAL-vocabulary corpus rarest-first ordering keeps those keys
    cold (a token in many prefixes is by definition not rare relative
    to the docs that carry it); the verify touches candidate pairs
    only. The guarantee has a measurable precondition, though: on a
    LOW-DIVERSITY corpus (synthetic text from a tiny word pool, logs
    with a fixed vocabulary) even each doc's rarest tokens are shared
    by thousands of docs and the exact candidate bound
    ``Σ_tok C(prefix_df, 2)`` degenerates toward all-pairs — measured
    on the sf1 replica corpus: 27 distinct prefix tokens, hottest in
    38k docs, 3.9e9 candidates. So the operator CHECKS the bound first
    (one cheap aggregate over the prefix relation) and fails fast with
    the measured number when it exceeds ``candidate_budget``, instead
    of silently launching a predictably degenerate join — lossless
    prefix filtering is the wrong plan for such data and the banded
    tiers (``minhash_near_dups`` / ``semantic_dedup``) are the right
    one. Pass ``candidate_budget=None`` to run regardless.
    """
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(normalize_text(text_col), " "))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    sized = (
        toks.join(freq, on="tok")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("f", "tok")),
        )
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix_len = (
        F.col("sz")
        - F.expr(f"({t_num} * sz + {t_den - 1}) div {t_den}")
        + F.lit(1)
    )
    prefix = sized.filter(F.col("pos") <= prefix_len).select("doc_id", "tok", "sz")
    if candidate_budget is not None:
        row = (
            prefix.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("cand"),
                F.max("m").alias("hottest"),
            )
            .head()
        )
        cand_bound = int(row["cand"] or 0)
        if cand_bound > candidate_budget:
            raise ValueError(
                "prefix_jaccard_pairs: the exact candidate bound "
                f"sum C(prefix_df, 2) = {cand_bound:,} (hottest prefix "
                f"token in {int(row['hottest']):,} docs) exceeds "
                f"candidate_budget={candidate_budget:,} — this corpus's "
                "vocabulary is too undiverse for lossless prefix "
                "filtering; use the banded tiers (minhash_near_dups / "
                "semantic_dedup) or pass candidate_budget=None to force."
            )
    a = prefix.select(
        F.col("doc_id").alias("doc1"), "tok", F.col("sz").alias("_sza")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc2"), "tok", F.col("sz").alias("_szb")
    )
    cand = (
        a.join(b, on="tok")
        .filter(
            (F.col("doc1") < F.col("doc2"))
            & (t_den * F.col("_sza") >= t_num * F.col("_szb"))
            & (t_den * F.col("_szb") >= t_num * F.col("_sza"))
        )
        .select("doc1", "doc2")
        .distinct()
    )
    # verify via per-doc token ARRAYS + native array_intersect: the
    # intersection rides the candidate pair as one codegen'd array op
    # instead of an exploded candidates × doc-length join (measured:
    # the explode formulation shuffled |cand| · avg_tokens rows — 300M
    # at the 50k-doc replica corpus — and ran >12 min; arrays finish
    # in seconds at the same input). Cost is candidate-bound: |cand|
    # pairs × one sorted-array intersect.
    tok_arrays = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("tok")).alias("_arr"),
        F.count(F.lit(1)).alias("_sz"),
    )
    inter = (
        cand.join(
            tok_arrays.select(
                F.col("doc_id").alias("doc1"),
                F.col("_arr").alias("_arr1"),
                F.col("_sz").alias("_sza"),
            ),
            on="doc1",
        )
        .join(
            tok_arrays.select(
                F.col("doc_id").alias("doc2"),
                F.col("_arr").alias("_arr2"),
                F.col("_sz").alias("_szb"),
            ),
            on="doc2",
        )
        .withColumn(
            "inter_size", F.size(F.array_intersect("_arr1", "_arr2"))
        )
    )
    return (
        inter.withColumn(
            "union_size", F.col("_sza") + F.col("_szb") - F.col("inter_size")
        )
        .filter(t_den * F.col("inter_size") >= t_num * F.col("union_size"))
        .select(
            "doc1",
            "doc2",
            F.col("inter_size").cast("long").alias("inter_size"),
            F.col("union_size").cast("long").alias("union_size"),
            F.expr("(1000000 * inter_size) div union_size").alias("jac_e6"),
        )
    )
