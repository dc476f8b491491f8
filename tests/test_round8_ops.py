"""Round-8 operators: IVF index lifecycle (compaction + maintenance
probe) and the signature-collapse LSH tier's member-cap invariants."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_database_watermarking_spark.operators import similarity


def _result_set(df):
    return sorted(
        (r["src"], r["rank"], r["dst"], round(r["cos_sim"], 9))
        for r in df.collect()
    )


@pytest.fixture()
def ivf_dir(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    assigned, cents = similarity.ivf_build_fixed(emb, n_clusters=8)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(assigned, cents, path)
    return path, emb


def test_ivf_compact_preserves_search_and_merges_files(spark, ivf_dir):
    """Repeated appends fragment cluster partitions; compaction must
    merge the files WITHOUT changing any search result."""
    path, emb = ivf_dir
    # three append batches -> >= 4 files in every touched cluster
    for i in range(3):
        batch = emb.filter(
            (F.col("vec_id") >= 20 * i) & (F.col("vec_id") < 20 * (i + 1))
        ).select((F.col("vec_id") + F.lit((i + 1) * 10_000_000)).alias("vec_id"), "embedding")
        similarity.ivf_append(spark, path, batch)

    q = emb.filter(F.col("vec_id") < 10)
    a0, c0 = similarity.load_ivf_index(spark, path)
    before = _result_set(
        similarity.ivf_search_fixed(q, a0, c0, k=5, nprobe=3).localCheckpoint(
            eager=True
        )
    )
    report = similarity.ivf_compact(spark, path)
    a1, c1 = similarity.load_ivf_index(spark, path)
    after = _result_set(similarity.ivf_search_fixed(q, a1, c1, k=5, nprobe=3))
    assert before == after
    # fragmentation actually went down, and rows were preserved
    assert report["after"]["n_files"] < report["before"]["n_files"]
    assert report["rows"] == a1.count()
    # post-compaction: at most one file per cluster partition here
    # (every cluster far below target_rows_per_file)
    base = f"{path}/assigned"
    for entry in os.listdir(base):
        if entry.startswith("cluster="):
            n = sum(
                1
                for f in os.listdir(os.path.join(base, entry))
                if f.endswith(".parquet")
            )
            assert n == 1, (entry, n)


def test_ivf_maintenance_report_flags_fragmentation_then_clears(spark, ivf_dir):
    path, emb = ivf_dir
    for i in range(10):  # heavy fragmentation
        batch = emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + F.lit((i + 1) * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        similarity.ivf_append(spark, path, batch)
    rep = similarity.ivf_maintenance_report(spark, path, files_per_cluster=8)
    assert rep["recommend_compact"] is True
    assert rep["max_files_per_cluster"] > 8
    assert rep["rows"] == rep["rows"]  # well-formed
    similarity.ivf_compact(spark, path)
    rep2 = similarity.ivf_maintenance_report(spark, path, files_per_cluster=8)
    assert rep2["recommend_compact"] is False
    assert rep2["max_files_per_cluster"] == 1
    assert rep2["rows"] == rep["rows"]
    assert rep2["clusters"] == rep["clusters"]


def test_ivf_maintenance_report_flags_occupancy_skew(spark, ivf_dir):
    """Appending a pile of copies of ONE vector makes its cluster hot;
    the probe must recommend retrain on occupancy skew."""
    path, emb = ivf_dir
    one = emb.filter(F.col("vec_id") == 0).select("vec_id", "embedding")
    # ~480 copies of one vector (base is 500 rows over 8 clusters) —
    # all land in a single cluster, skewing its occupancy
    big = one.crossJoin(spark.range(480)).select(
        (F.lit(50_000_000) + F.col("id")).alias("vec_id"), "embedding"
    )
    similarity.ivf_append(spark, path, big)
    rep = similarity.ivf_maintenance_report(spark, path, occupancy_skew=3.0)
    assert rep["recommend_retrain"] is True
    assert any("skew" in r or "drift" in r for r in rep["reasons"])
