from vector_database_watermarking_spark.operators.grouping import ber
from vector_database_watermarking_spark.watermark.scpw import scpw_embed, scpw_extract
from vector_database_watermarking_spark.watermark.tabularmark import (
    divide_interval_randomly,
    find_category,
    green_perturbation,
    tabularmark_detect,
    tabularmark_embed,
)

WM = "10101"


def test_scpw_roundtrip(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wm_df, carriers = scpw_embed(emb, WM, strength=0.7, top_k=3, position=10, std_e=0.1)
    wm_df = wm_df.cache()
    assert carriers.count() > 0
    extracted = scpw_extract(wm_df, len(WM), top_k=3, position=10)
    assert ber(WM, extracted) == 0.0
    wm_df.unpersist()


def test_scpw_distribution_preserved(spark, sf_dir):
    """The noise construction preserves column mean/std (found_e,
    SCPW.py:31-62): watermarked column stats stay close."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wm_df, _ = scpw_embed(emb, WM, strength=0.6, top_k=3, position=10, std_e=0.1)
    pos = 10
    orig = np.array([r["embedding"][pos] for r in emb.collect()])
    new = np.array([r["embedding"][pos] for r in wm_df.collect()])
    assert abs(orig.mean() - new.mean()) < 0.2
    assert abs(orig.std() - new.std()) < 0.6


def test_interval_partition_properties():
    for seed_id in ["000", "123456789", "42"]:
        c1, c2 = divide_interval_randomly(4.0, seed_id)
        # equal total length p
        l1 = sum(e - s for s, e in c1)
        l2 = sum(e - s for s, e in c2)
        assert abs(l1 - 4.0) < 1e-9 or abs(l2 - 4.0) < 1e-9
        # deterministic
        d1, d2 = divide_interval_randomly(4.0, seed_id)
        assert c1 == d1 and c2 == d2
        # green draws land in category 1
        delta = green_perturbation(4.0, seed_id)
        assert find_category(delta, c1, c2) == 0


def test_tabularmark_detects_watermark(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wm_df, keys = tabularmark_embed(emb, nw=100, p=4.0, k=3, position=10)
    res = tabularmark_detect(emb, wm_df, keys, p=4.0, k=3, position=10)
    assert res["detected"], res
    assert res["ng"] >= 0.8 * res["nw"]


def test_tabularmark_rejects_clean_data(spark, sf_dir):
    """Clean data has no green bias → z ≈ 0 → not detected.
    (Δ = 0 for unmodified matched rows; zero may fall in either
    category, but never systematically green.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, keys = tabularmark_embed(emb, nw=100, p=4.0, k=3, position=10)
    res = tabularmark_detect(emb, emb, keys, p=4.0, k=3, position=10)
    assert res["z"] <= 1.96 * 1.5, res


def test_tabularmark_match_count_tracks_deletion(spark, sf_dir):
    """Matching_vector semantics (tabularMark.py:129-154) as a count:
    every key row is re-findable pre-attack (match-loss 0); deleting
    rows removes key rows at the corpus rate, so the count drops by
    roughly the deletion fraction — the compare grid's match-loss ≈ p
    line. position=45 sits outside the first-40 id dims so the green
    perturbation cannot corrupt the ids it must later match."""
    from pyspark.sql import functions as F

    from vector_database_watermarking_spark.operators import attacks
    from vector_database_watermarking_spark.sources.tables import load_table
    from vector_database_watermarking_spark.watermark.tabularmark import (
        tabularmark_embed,
        tabularmark_match_count,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    nw = 20
    wm, keys = tabularmark_embed(emb, nw, 4.0, 40, 45)
    wm = wm.localCheckpoint(eager=True)
    assert tabularmark_match_count(wm, keys, 40) == nw

    deleted = attacks.random_delete(wm, 0.5, seed=20)
    m = tabularmark_match_count(deleted, keys, 40)
    assert 0 < m < nw  # some keys gone, not all
    # exact check: the surviving-key count IS the match count
    survivors = deleted.join(
        keys.select("vec_id"), on="vec_id", how="leftsemi"
    ).count()
    assert m == survivors
