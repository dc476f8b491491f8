"""Bucketed co-located joins (SCALING.md): writing both sides
bucketed by the join key removes the shuffle — the plan the 100 TB
edges/embeddings join would use."""

import shutil
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F


def _drop_table_and_location(spark, name: str) -> None:
    # DROP TABLE only removes what the (session-scoped, in-memory
    # derby) metastore knows about; a crashed earlier run can leave
    # the warehouse directory behind with no catalog entry, and
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS — clean the
    # physical location as well.
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # tables land in the session's default warehouse dir and are
    # dropped on teardown (warehouse.dir is a static conf)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from vector_database_watermarking_spark.operators.knn import knn_edges

    edges = knn_edges(emb, k=5)
    _drop_table_and_location(spark, "emb_bucketed")
    _drop_table_and_location(spark, "edges_bucketed")
    (
        emb.write.bucketBy(8, "vec_id")
        .sortBy("vec_id")
        .mode("overwrite")
        .saveAsTable("emb_bucketed")
    )
    (
        edges.withColumnRenamed("src", "vec_id")
        .write.bucketBy(8, "vec_id")
        .sortBy("vec_id")
        .mode("overwrite")
        .saveAsTable("edges_bucketed")
    )
    yield "emb_bucketed", "edges_bucketed"
    _drop_table_and_location(spark, "emb_bucketed")
    _drop_table_and_location(spark, "edges_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    emb_t, edges_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(edges_t)
            .join(spark.table(emb_t), on="vec_id")
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin without any Exchange feeding it
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed_tables):
    emb_t, edges_t = bucketed_tables
    bucketed = (
        spark.table(edges_t).join(spark.table(emb_t), on="vec_id").count()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from vector_database_watermarking_spark.operators.knn import knn_edges

    edges = knn_edges(emb, k=5).withColumnRenamed("src", "vec_id")
    assert bucketed == edges.join(emb, on="vec_id").count()


def test_salted_join_matches_plain_join_under_skew(spark, sf_dir):
    from vector_database_watermarking_spark.operators.skew import salted_join
    from vector_database_watermarking_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # plant heavy skew: fold 60% of rows onto one hot user
    skewed = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 6, F.lit(7)).otherwise(F.col("user_id")),
    )
    dim = (
        skewed.select("user_id").distinct().withColumn("tier", F.col("user_id") % 3)
    )
    plain = skewed.join(dim, on="user_id", how="inner")
    salted = salted_join(skewed, dim, on="user_id", n_salt=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.select("event_id", "user_id", "tier").collect()}
    b = {tuple(r) for r in salted.select("event_id", "user_id", "tier").collect()}
    assert a == b
    # left join keeps unmatched fact rows exactly once
    dim_partial = dim.filter(F.col("user_id") != 7)
    pl = skewed.join(dim_partial, on="user_id", how="left")
    sl = salted_join(skewed, dim_partial, on="user_id", n_salt=8, how="left")
    assert sl.count() == pl.count()
    assert sl.filter(F.col("tier").isNull()).count() == pl.filter(
        F.col("tier").isNull()
    ).count()
