"""Relevance / governance operator tests: BM25 ranking properties and
the deterministic content-keyed corpus split."""

from pyspark.sql import functions as F

from vector_database_watermarking_spark.operators.relevance import (
    bm25_scores,
    corpus_split,
)


def test_bm25_prefers_term_dense_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "needle needle needle in a small stack"),
            (2, "needle in a much longer stack of other words entirely here"),
            (3, "no relevant words at all in this one"),
            (4, "filler filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["needle"]).collect()}
    assert set(out) == {1, 2}  # only docs containing the term
    assert out[1] > out[2]  # higher tf, shorter doc -> higher score


def test_bm25_idf_downweights_common_terms(spark):
    docs = spark.createDataFrame(
        [(i, "common words here" + (" rare" if i == 0 else "")) for i in range(8)],
        "doc_id long, text string",
    )
    out = bm25_scores(docs, ["common", "rare"]).collect()
    row0 = next(r for r in out if r["doc_id"] == 0)
    others = [r for r in out if r["doc_id"] != 0]
    # the rare-term doc must outscore every common-only doc
    assert all(row0["score"] > r["score"] for r in others)


def test_corpus_split_proportions_and_dup_consistency(spark, sf_dir):
    from vector_database_watermarking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = corpus_split(docs)
    n = docs.count()
    frac = {
        r["split"]: r["count"] / n for r in out.groupBy("split").count().collect()
    }
    assert 0.6 < frac.get("train", 0) < 0.95
    assert frac.get("val", 0) < 0.25 and frac.get("test", 0) < 0.25
    # exact duplicates land in the same split: re-id a copy of the
    # corpus and the per-content assignment must not change
    shifted = docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    again = corpus_split(shifted)
    j = (
        docs.select("doc_id", "text")
        .join(out, on="doc_id")
        .select(F.col("text").alias("t1"), F.col("split").alias("s1"))
        .join(
            shifted.select("doc_id", "text").join(again, on="doc_id").select(
                F.col("text").alias("t1"), F.col("split").alias("s2")
            ),
            on="t1",
        )
    )
    assert j.filter(F.col("s1") != F.col("s2")).count() == 0


def test_stratified_sample_exact_quota_and_determinism(spark, sf_dir):
    from vector_database_watermarking_spark.operators.sampling import (
        stratified_exact_sample,
    )
    from vector_database_watermarking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = stratified_exact_sample(docs, "lang", 20, "doc_id", seed=42)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, n in full.items():
        assert counts[lang] == min(20, n)
    # partitioning-invariant: same draw under a different layout
    again = stratified_exact_sample(
        docs.repartition(7), "lang", 20, "doc_id", seed=42
    )
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    # a different seed draws a different sample
    other = stratified_exact_sample(docs, "lang", 20, "doc_id", seed=43)
    assert {r["doc_id"] for r in out.collect()} != {
        r["doc_id"] for r in other.collect()
    }


def test_stratified_sample_dict_quotas_mixing(spark, sf_dir):
    from vector_database_watermarking_spark.operators.sampling import (
        stratified_exact_sample,
    )
    from vector_database_watermarking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    quotas = {"en": 30, "fr": 5, "zh": 2}  # de/es absent -> dropped
    out = stratified_exact_sample(docs, "lang", quotas, "doc_id", seed=42)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, q in quotas.items():
        assert counts.get(lang, 0) == min(q, full.get(lang, 0))
    assert set(counts) <= set(quotas)
    # the dict draw is a prefix of the uniform draw at the same seed:
    # same hash order, smaller cutoff
    uniform = stratified_exact_sample(docs, "lang", 30, "doc_id", seed=42)
    assert {r["doc_id"] for r in out.collect()} <= {
        r["doc_id"] for r in uniform.collect()
    }
    # map-side group-limit still applies with the literal bound
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_weighted_sample_bias_determinism_and_plan(spark, sf_dir):
    from vector_database_watermarking_spark.operators.sampling import (
        weighted_exact_sample,
    )
    from vector_database_watermarking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # plant extreme weights: 20 docs at 10^6, the rest at 1 — the
    # heavy rows must dominate a 25-row draw
    heavy = F.when(F.col("doc_id") < 20, F.lit(1_000_000.0)).otherwise(F.lit(1.0))
    dfw = docs.withColumn("w", heavy)
    out = weighted_exact_sample(dfw, n=25, weight_col="w", key_col="doc_id", seed=5)
    got = {r["doc_id"] for r in out.collect()}
    assert len(got) == 25
    assert len([d for d in got if d < 20]) == 20  # every heavy row drawn
    # deterministic under repartition
    again = weighted_exact_sample(
        dfw.repartition(13), n=25, weight_col="w", key_col="doc_id", seed=5
    )
    assert {r["doc_id"] for r in again.collect()} == got
    # top-n compiles to TakeOrdered, not a global sort exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_merge_apply_changes_semantics(spark):
    from vector_database_watermarking_spark.operators import merge
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
    )
    changes = spark.createDataFrame(
        [
            # key 2: update at seq 10, later delete at seq 11 -> gone
            (2, 10, "update", "b2"),
            (2, 11, "delete", None),
            # key 3: delete then a later upsert -> survives with new text
            (3, 10, "delete", None),
            (3, 12, "insert", "c2"),
            # key 4: brand-new key inserted
            (4, 5, "insert", "d"),
            # key 5: delete of an absent key -> no-op
            (5, 6, "delete", None),
            # key 1: same-seq delete+update tie -> update wins (documented)
            (1, 9, "delete", None),
            (1, 9, "update", "a2"),
        ],
        ["doc_id", "seq", "op", "text"],
    )
    out = {r["doc_id"]: r["text"] for r in merge.apply_changes(base, changes).collect()}
    assert out == {1: "a2", 3: "c2", 4: "d"}


def test_hybrid_search_rrf_properties(spark, sf_dir):
    from vector_database_watermarking_spark.operators.relevance import (
        bm25_scores,
        hybrid_search,
    )
    from vector_database_watermarking_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    terms = ["join", "query", "scan", "stream", "table"]
    out = hybrid_search(docs, terms, n_list=50, k=10)
    rows = out.collect()
    assert len(rows) == 10
    # fused score is exactly the RRF formula over the reported ranks
    for r in rows:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            expect += 1.0 / (60 + r["sem_rank"])
        assert abs(r["rrf_score"] - expect) < 1e-6
    # descending fused order, deterministic tie-break
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc ranked #1 by BM25 must appear in the fused top-k
    spark.catalog.clearCache()
    top_lex = (
        bm25_scores(docs, terms)
        .orderBy(F.round("score", 6).desc(), "doc_id")
        .head()["doc_id"]
    )
    assert any(r["doc_id"] == top_lex for r in rows)


def test_hard_negatives_exclude_near_dups(spark, sf_dir):
    """A planted near-duplicate is the most similar document by
    construction — it must be excluded from the negatives while
    ordinary similar docs survive."""
    from pyspark.sql import functions as F

    from vector_database_watermarking_spark.operators.relevance import hard_negatives
    from vector_database_watermarking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    clone = docs.filter(F.col("doc_id") == 3).select(
        F.lit(9001).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(clone)
    q = corpus.filter(F.col("doc_id") == 3).select("doc_id")
    out = hard_negatives(corpus, q, k=5, jaccard_max=0.5, overfetch=2).collect()
    assert len(out) == 5
    dsts = [r["dst"] for r in out]
    assert 9001 not in dsts  # the near-dup is filtered despite top similarity
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    # sanity: the clone IS the top cosine candidate before filtering
    from vector_database_watermarking_spark.operators.embedding import embed_documents
    from vector_database_watermarking_spark.operators.similarity import cosine_topk

    emb = embed_documents(corpus).select(F.col("doc_id").alias("vec_id"), "embedding")
    raw = cosine_topk(emb.filter(F.col("vec_id") == 3), emb, k=1).head()
    assert raw["dst"] == 9001
