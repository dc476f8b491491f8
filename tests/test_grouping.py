from pyspark.sql import functions as F

from vector_database_watermarking_spark.functions.hashing import key_dims
from vector_database_watermarking_spark.operators.grouping import (
    ber,
    classify,
    decode_bitstring,
    group_counts,
    majority_decode,
)

DIMS = key_dims(64, 20)
L = 21


def test_group_counts_partition_of_input(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    gc = group_counts(classify(emb, DIMS, L=L, d=64)).collect()
    assert sum(r["n_vectors"] for r in gc) == n
    assert all(0 <= r["group_id"] < L for r in gc)
    assert all(r["hidden_bit"] in (0, 1) for r in gc)


def test_majority_decode_consistency(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cls = classify(emb, DIMS, L=L, d=64)
    md = majority_decode(cls).collect()
    for r in md:
        expect = 1 if 2 * r["n_ones"] > r["n_total"] else 0
        assert r["decoded_bit"] == expect


def test_decode_bitstring_length_and_partition_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    s1 = decode_bitstring(classify(emb, DIMS, L=L, d=64), L)
    s2 = decode_bitstring(classify(emb.repartition(11), DIMS, L=L, d=64), L)
    assert len(s1) == L
    assert set(s1) <= {"0", "1"}
    assert s1 == s2


def test_ber():
    assert ber("10101", "10101") == 0.0
    assert ber("10101", "00101") == 0.2
    assert ber("1111", "0000") == 1.0
