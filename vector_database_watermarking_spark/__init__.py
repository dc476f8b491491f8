"""PySpark-native analytics engine re-expressing the computations of
daweiren12/vector_database_watermarking (reference at /root/reference)
as idiomatic Spark DataFrame operators, plus large-scale training-data
pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing, streaming window aggregation).

Design (see SURVEY.md):
- DataFrame/SQL-first: Catalyst optimizes; zero custom Catalyst rules.
- All randomness is a pure function of (seed, vec_id) so results are
  partitioning-invariant (SURVEY §4.2).
- Reference-parity hashing (full 128-bit md5 mod) lives in pandas UDFs
  ("compat" tier); the engine-native hash is a 60-bit md5 prefix that
  both Spark and the DuckDB oracle can compute exactly (SURVEY P1 note).
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
