import math

from pyspark.sql import functions as F

from vector_database_watermarking_spark.operators import attacks, knn, stats
from vector_database_watermarking_spark.experiments import robustness_grid


def test_random_delete_exact_count_and_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = attacks.random_delete(emb, 0.3, seed=7)
    assert out.count() == n - math.ceil(n * 0.3)
    ids1 = sorted(r["vec_id"] for r in out.select("vec_id").collect())
    ids2 = sorted(
        r["vec_id"]
        for r in attacks.random_delete(emb.repartition(9), 0.3, seed=7)
        .select("vec_id")
        .collect()
    )
    assert ids1 == ids2


def test_random_modify_touches_exact_rows_and_span(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = attacks.random_modify(emb, 0.2, seed=7, span=30)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    new = {r["vec_id"]: r["embedding"] for r in out.collect()}
    changed = [v for v in orig if orig[v] != new[v]]
    assert len(changed) == math.ceil(n * 0.2)
    for v in changed[:10]:
        diffs = [i for i, (a, b) in enumerate(zip(orig[v], new[v])) if a != b]
        assert len(diffs) <= 30
        vals = {new[v][i] for i in diffs}
        assert len(vals) == 1  # one uniform value across the span


def test_gaussian_insertion_stats(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    out = attacks.gaussian_insertion(emb, 300, seed=7)
    assert out.count() == emb.count() + 300
    new_rows = out.filter(F.col("vec_id") >= 10_000_000).collect()
    X = np.array([r["embedding"] for r in new_rows])
    base = np.array([r["embedding"] for r in emb.collect()])
    # synthetic rows roughly match per-dim stats
    assert abs(X.mean() - base.mean()) < 0.05
    assert abs(X.std() - base.std()) < 0.1


def test_hit_rate_and_missed_false(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = knn.knn_edges(emb, k=5).cache()
    assert stats.hit_rate(edges, edges, 5) == 1.0
    mf = stats.missed_false_counts(edges, edges)
    row = mf.agg(F.sum("missed"), F.sum("false_hits")).head()
    assert row[0] == 0 and row[1] == 0
    # against attacked data the rate drops
    attacked = attacks.random_delete(emb, 0.4, seed=7)
    edges2 = knn.knn_edges(attacked, k=5)
    hr = stats.hit_rate(edges2, edges, 5)
    assert 0.0 < hr < 1.0
    edges.unpersist()


def test_jaccard(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert stats.row_set_jaccard(emb, emb) == 1.0
    smaller = attacks.random_delete(emb, 0.5, seed=7)
    j = stats.row_set_jaccard(emb, smaller)
    assert 0.4 < j < 0.6


def test_robustness_grid_monotone_trend(spark, sf_dir):
    """BER stays 0 with no/low attack and is non-trivially higher at
    p=0.8 than p=0.1 under random deletion (BASELINE.md band)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = robustness_grid(
        emb,
        "10101",
        attack="random_delete",
        strengths=(0.7,),
        ths=(1.0,),
        ps=(0.0, 0.5),
        seed=20,
    )
    by_p = {r.p: r.ber for r in res}
    assert by_p[0.0] == 0.0
    assert by_p[0.5] <= 0.4  # majority usually survives 50% deletion


def test_modify_targets_lockstep_with_random_modify(spark, sf_dir):
    """modify_targets must name exactly the rows random_modify rewrote."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    perturbed = attacks.random_modify(emb, 0.2, seed=42, span=30)
    targets = {r["vec_id"] for r in attacks.modify_targets(emb, 0.2, seed=42).collect()}
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    changed = {
        r["vec_id"]
        for r in perturbed.collect()
        if list(r["embedding"]) != list(orig[r["vec_id"]])
    }
    # every changed row is a target; a target may coincidentally keep its
    # values only if the drawn value already matched (not at this sf)
    assert changed == targets


def test_carrier_impact_tvp_embed(spark, sf_dir):
    """A13 with the real TVP bit-surgery perturbation (the non-SQL
    variant of the registered a13 query): impact must be bounded and
    non-carriers must keep their neighborhoods mostly intact."""
    from vector_database_watermarking_spark.watermark.tvp import tvp_embed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wm_df, carriers = tvp_embed(emb, "101", strength=0.6, th=0.5, seed=20)
    before = knn.knn_edges(emb.select("vec_id", "embedding"), k=10).cache()
    after = knn.knn_edges(wm_df.select("vec_id", "embedding"), k=10).cache()
    imp = stats.carrier_impact(before, after, carriers).collect()
    assert len(imp) > 0
    for r in imp:
        assert r["common"] + r["missed"] == r["n_before"]
        assert r["common"] + r["false_hits"] == r["n_after"]
    # LSB surgery barely moves vectors: the index is nearly unchanged
    rate = stats.hit_rate(before, after, 10)
    assert rate > 0.95, rate


def test_take_ranked_matches_global_window(spark, sf_dir):
    from pyspark.sql import Window

    from vector_database_watermarking_spark.operators.attacks import (
        _rank_key,
        take_ranked,
    )
    from vector_database_watermarking_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    key = _rank_key(7, "trk")
    for n in (0, 1, 37, 499, 10_000):
        got = {r["vec_id"] for r in take_ranked(emb, n, key).collect()}
        w = Window.orderBy(key, F.col("vec_id"))
        want = {
            r["vec_id"]
            for r in emb.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .collect()
        }
        assert got == want, (n, len(got), len(want))
    # descending over a continuous double key with ties
    scored = emb.withColumn("s", (F.col("vec_id") % 17).cast("double"))
    got = {
        r["vec_id"]
        for r in take_ranked(scored, 100, F.col("s"), descending=True).collect()
    }
    w = Window.orderBy(F.col("s").desc(), F.col("vec_id"))
    want = {
        r["vec_id"]
        for r in scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 100)
        .collect()
    }
    assert got == want


def test_take_ranked_null_keys_rank_last(spark):
    from pyspark.sql import Window

    from vector_database_watermarking_spark.operators.attacks import take_ranked

    rows = [(i, float(i % 5) if i % 3 else None) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "score"])
    # nulls must never be selected while scored rows remain
    got = take_ranked(df, 50, F.col("score"), descending=True)
    assert got.filter(F.col("score").isNull()).count() == 0
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id"))
    want = {
        r["vec_id"]
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 50)
        .collect()
    }
    assert {r["vec_id"] for r in got.collect()} == want
    # n beyond the non-null population: nulls fill the tail in tie order
    got2 = take_ranked(df, 150, F.col("score"), descending=True)
    want2 = {
        r["vec_id"]
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 150)
        .collect()
    }
    assert {r["vec_id"] for r in got2.collect()} == want2
    # all-null keys must not crash
    allnull = spark.createDataFrame(
        [(i, None) for i in range(20)], "vec_id long, score double"
    )
    assert take_ranked(allnull, 5, F.col("score"), descending=True).count() == 5
