import hashlib

from pyspark.sql import functions as F

from vector_database_watermarking_spark.functions.hashing import (
    compat_md5_mod,
    content_id,
    hash60,
    hash_mod,
    key_dims,
)


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hash60_matches_python_md5_prefix(spark):
    vals = ["0", "42", "hello", "300041111", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", hash60("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == py_hash60(v), v


def test_hash_mod_nonnegative_and_stable(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("s"))
    rows = df.select(hash_mod("s", 21).alias("m")).collect()
    assert all(0 <= r["m"] < 21 for r in rows)
    # stable across partitioning
    rows2 = df.repartition(7).select(hash_mod("s", 21).alias("m")).collect()
    assert sorted(r["m"] for r in rows) == sorted(r["m"] for r in rows2)


def test_compat_md5_mod_matches_reference_semantics():
    # hash_re at watermarking.py:20-27: int(md5(str(x)).hexdigest(), 16) % m
    assert compat_md5_mod("42", 7) == int(hashlib.md5(b"42").hexdigest(), 16) % 7


def test_key_dims_deterministic():
    a = key_dims(64, 20)
    b = key_dims(64, 20)
    c = key_dims(64, 22)
    assert a == b
    assert a != c
    assert len(a) == 10 and len(set(a)) == 10
    assert all(0 <= d < 64 for d in a)


def test_content_id_uses_all_but_last_dim(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dims = key_dims(64, 20)
    ids = emb.select(content_id("embedding", dims).alias("vid")).collect()
    assert all(len(r["vid"]) == 9 for r in ids)  # dims[:-1] → 9 digits
    assert all(r["vid"].isdigit() for r in ids)
