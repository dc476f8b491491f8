"""Sequence packing for training-data assembly (north-star extension,
not from the reference — SURVEY §7 M6).

LLM pretraining consumes fixed-length token sequences, not documents:
the corpus is concatenated in a deterministic order and chunked every
``seq_len`` tokens ("concat-and-chunk" packing). This operator computes
the document → sequence assignment — which sequences each document
lands in and at what offset — entirely with per-shard window
arithmetic, so a downstream tokenizer/writer can materialize shard
files independently.

Scale shape: a single global concatenation order would need a global
running sum (one unpartitioned window — the scale-killer shape this
repo bans). Instead documents are first routed to ``n_shards``
deterministic shards by keyed hash, and each shard packs
independently: the running sum is a window PARTITIONED by shard, so
shards sort and pack in parallel and the per-task cost is
O(corpus / n_shards). The price is at most one partial trailing
sequence per shard — negligible waste for any real shard count — and
shard files are exactly what a distributed training loader wants
anyway. ``n_shards`` is the parallelism knob (thousands at 100 TB).

Determinism: shard routing and intra-shard order are pure functions of
(seed, doc_id) via the keyed 60-bit md5 — partitioning-invariant,
retry-stable, and replayable in SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from .text import token_count


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    seed: int = 7,
    text_col: str = "text",
) -> DataFrame:
    """Assign every document to its packed training sequences.

    Within each shard, documents are laid out back-to-back in keyed-
    hash order and the token stream is cut every ``seq_len`` tokens.
    A document starting at offset ``start_tok`` of its shard's stream
    spans sequences ``begin_seq .. end_seq`` (documents longer than
    ``seq_len`` span several; short documents share sequences with
    their neighbors — the packing efficiency LLM loaders rely on).

    Output, one row per document:
    (doc_id, shard, n_tokens, start_tok, begin_seq, end_seq,
    offset_in_seq) — ``offset_in_seq`` is the position within
    ``begin_seq`` where the document's first token lands.
    """
    key = hash60(F.concat(F.lit(f"pack_{seed}_"), F.col("doc_id").cast("string")))
    d = docs.select(
        "doc_id",
        token_count(text_col).cast("long").alias("n_tokens"),
        key.alias("_k"),
        (key % F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end_tok = F.sum("n_tokens").over(w)
    start_tok = (end_tok - F.col("n_tokens")).alias("start_tok")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        start_tok,
        F.floor((end_tok - F.col("n_tokens")) / seq_len).alias("begin_seq"),
        F.floor((end_tok - 1) / seq_len).alias("end_seq"),
        ((end_tok - F.col("n_tokens")) % F.lit(seq_len)).alias("offset_in_seq"),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard packing summary: documents, tokens, sequences used,
    and fill ratio (tokens / capacity of the used sequences). The fill
    ratio is 1.0 everywhere except the trailing partial sequence, so
    it converges to 1 as shards grow — the waste-bound the docstring
    above promises, made measurable."""
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("end_seq") + 1).alias("n_seqs"),
        F.round(
            F.sum("n_tokens") / ((F.max("end_seq") + 1) * F.lit(seq_len)), 6
        ).alias("fill_ratio"),
    )


def bucketed_batches(
    docs: DataFrame,
    batch_size: int = 8,
    bucket_width: int = 16,
    n_shards: int = 8,
    seed: int = 7,
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed batch assembly — the inference/SFT counterpart
    of :func:`pack_sequences`: instead of concatenating documents,
    group similar-length documents into fixed-size batches so padding
    (batch is padded to its longest member) is bounded by the bucket
    width rather than the corpus-wide length spread.

    A document of ``n`` tokens lands in bucket ``ceil(n /
    bucket_width)``; within each (shard, bucket), documents are
    numbered in keyed-hash order and cut every ``batch_size`` rows.
    ``pad_tokens`` is the per-document padding cost: its batch's max
    length minus its own.

    Output, one row per document: (doc_id, shard, bucket, n_tokens,
    batch_idx, batch_max_tokens, pad_tokens).

    Scale shape: same shard trick as packing — the row numbering is a
    window PARTITIONED by (shard, bucket), never global, so the
    per-task cost is O(corpus / (shards × buckets)); batch statistics
    are a second window over the assembled (shard, bucket, batch) key
    with no extra exchange (same partitioning prefix). Routing and
    order are pure functions of (seed, doc_id) — partitioning-
    invariant and SQL-replayable.
    """
    key = hash60(F.concat(F.lit(f"bb_{seed}_"), F.col("doc_id").cast("string")))
    d = docs.select(
        "doc_id",
        token_count(text_col).cast("long").alias("n_tokens"),
        key.alias("_k"),
        (key % F.lit(n_shards)).cast("int").alias("shard"),
    ).withColumn(
        "bucket", F.ceil(F.col("n_tokens") / F.lit(bucket_width)).cast("int")
    )
    w = Window.partitionBy("shard", "bucket").orderBy("_k", "doc_id")
    d = d.withColumn(
        "batch_idx", F.floor((F.row_number().over(w) - 1) / batch_size)
    )
    wb = Window.partitionBy("shard", "bucket", "batch_idx")
    bmax = F.max("n_tokens").over(wb)
    return d.select(
        "doc_id",
        "shard",
        "bucket",
        "n_tokens",
        "batch_idx",
        bmax.alias("batch_max_tokens"),
        (bmax - F.col("n_tokens")).alias("pad_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 200,
    stride: int = 150,
    text_col: str = "text",
) -> DataFrame:
    """RAG-style overlapping character chunks: split every document
    into windows of ``size`` characters advancing by ``stride``
    (``size - stride`` characters of overlap), keeping byte-accurate
    offsets — the retrieval-index preprocessing shape (embed chunks,
    not documents) and the context-window splitter for long-document
    SFT. A document of n chars yields 1 chunk if n ≤ size, else
    ceil((n − size) / stride) + 1, so the final chunk always reaches
    the end of the document (it may be shorter than ``size``).

    Output, one row per chunk: (doc_id, chunk_idx, chunk_start,
    chunk_len, chunk_text) with 0-based ``chunk_start`` character
    offsets into the ORIGINAL text.

    Scale shape: a pure narrow transform — ``sequence`` + ``explode``
    + ``substring`` inside one codegen stage, no shuffle, no UDF;
    output partitioning inherits the scan, and chunk volume is
    n/stride per document — output-bound. Empty/NULL texts produce no
    rows (there is nothing to index).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.floor((n - size + stride - 1) / F.lit(stride)) + 1
    )
    start = (F.col("chunk_idx") * stride).cast("long")
    return (
        docs.filter(n > 0)
        .select(
            "doc_id",
            F.col(text_col).alias("_t"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.alias("chunk_start"),
            F.substring(F.col("_t"), (start + 1).cast("int"), size).alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("int"))
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_text")
    )
