"""Streaming ingestion dedup (extension, SURVEY §2.10 / §7 M6): probe
a live document stream against the STANDING corpus — the streaming
form of ``operators.dedup.incremental_dedup``.

Two streaming-safe stages, both stateless on the stream side (no
streaming aggregation, so no watermark/state trade-offs):

- exact: stream-static LEFT join of the stream doc's content key
  against the corpus's distinct key table — one output row per stream
  doc, flagged ``exact_dup`` or ``unknown``;
- near-dup candidates: the MinHash signature is computed PER ROW with
  native array expressions (``array_min`` over the shingle array —
  no explode-groupBy, which would be a streaming aggregation), banded
  per row, exploded, and inner-joined against the corpus band table —
  a stream of (stream doc, corpus doc, band) candidates for
  downstream verification or quarantine.

Scale shape: both corpus-side relations are the same skinny derived
tables the batch operator uses (content keys; band keys), maintained
incrementally as batches are admitted. Stream-static joins re-read
the static side per micro-batch, so at 100 TB those tables live
bucketed on their join key (or behind a broadcast when they fit).
The per-row signature trades the batch tier's map-side partial mins
for statelessness — the right trade in-flight, where each doc is
seen exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..operators.dedup import MINHASH_P, minhash_coeffs, normalize_text


def shingle_array(text_col, n: int = 3):
    """Distinct word n-gram shingles as a per-row array column
    (same shingles as ``dedup.word_shingles``, kept in-row)."""
    toks = F.split(normalize_text(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.filter(grams, lambda s: F.length(s) > 0))


def row_minhash_from_base(base, num_hashes: int = 8):
    """Per-row MinHash signature from an already-computed base-hash
    array (``hash60(shingle) % P`` per shingle): one ``array_min``
    affine fold per hash function. Splitting this from the shingling
    lets callers materialize ``base`` behind an exchange so the
    regex+md5 stage runs once per row, not once per hash function
    (the word_shingles O(len²) pitfall, found here by review round 10)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    base, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)
                )
            )
            for a, b in minhash_coeffs(num_hashes)
        ]
    )


def row_minhash(shingles, num_hashes: int = 8):
    """Per-row MinHash signature (array<long>), identical values to
    ``dedup.minhash_signatures``'s explode-groupBy tier — here an
    ``array_min`` fold per hash so it stays a stateless projection."""
    base = F.transform(shingles, lambda s: hash60(s) % F.lit(MINHASH_P))
    return row_minhash_from_base(base, num_hashes)


def row_bands(sig, num_hashes: int = 8, rows_per_band: int = 2):
    """Per-row band keys: array<struct<band, band_hash>> with the same
    band hashing as ``dedup.lsh_bands``."""
    n_bands = num_hashes // rows_per_band
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hash60(
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at(sig, b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )


def ingest_exact_dedup_stream(
    doc_stream: DataFrame, corpus_keys: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flag each stream doc against the corpus's content-key table:
    (doc_id, status 'exact_dup'|'unknown', match_doc_id). One row per
    stream doc; stateless stream-static left join."""
    keyed = doc_stream.withColumn("content_key", hash60(normalize_text(text_col)))
    out = keyed.join(
        corpus_keys.select("content_key", "match_doc_id"), on="content_key", how="left"
    )
    return out.select(
        "doc_id",
        F.when(F.col("match_doc_id").isNotNull(), F.lit("exact_dup"))
        .otherwise(F.lit("unknown"))
        .alias("status"),
        "match_doc_id",
    )


def ingest_band_candidates_stream(
    doc_stream: DataFrame,
    corpus_bands: DataFrame,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate stream: (doc_id, corpus_doc_id, band) for
    every corpus band collision of a stream doc's per-row signature.
    Stateless projection + explode + stream-static inner join.

    Plan shape (review round 10): the shingle→md5 base array and then
    the signature are each materialized behind an exchange before the
    next stage references them. Higher-order-function expressions get
    no whole-stage-codegen CSE, so inlining ``sig`` into the 8 band
    struct fields (and ``base`` into the 8 per-hash folds inside it)
    re-ran the tokenize/shingle/md5 pipeline tens of times per stream
    row — the exact O(len²) pitfall ``dedup.word_shingles`` documents;
    the two narrow (doc_id, array) shuffles per micro-batch are far
    cheaper than the duplicated regex+md5 work they eliminate."""
    nparts = doc_stream.sparkSession.sparkContext.defaultParallelism
    base = F.transform(
        shingle_array(text_col, n=n), lambda s: hash60(s) % F.lit(MINHASH_P)
    )
    based = doc_stream.select("doc_id", base.alias("_base")).repartition(
        nparts, "doc_id"
    )
    sigged = based.select(
        "doc_id",
        row_minhash_from_base(F.col("_base"), num_hashes).alias("_sig"),
    ).repartition(nparts, "doc_id")
    banded = sigged.select(
        "doc_id",
        F.explode(row_bands(F.col("_sig"), num_hashes, rows_per_band)).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    return banded.join(
        corpus_bands.select(
            F.col("doc_id").alias("corpus_doc_id"), "band", "band_hash"
        ),
        on=["band", "band_hash"],
    ).select("doc_id", "corpus_doc_id", "band")
