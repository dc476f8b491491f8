"""Streaming corpus curation (extension, SURVEY §2.10 / §2.11): the
batch cleaning pipeline — content-key dedup + repetition and quality
gates — applied to an unbounded document stream.

Everything except the dedup is a stateless per-row projection (the
same native expressions as the batch operators, which is why the
composition works unchanged on a streaming DataFrame); the dedup is
``dropDuplicatesWithinWatermark`` on the 60-bit content key, so state
is bounded by the watermark horizon, not by all content ever seen —
the property that makes the pipeline viable on a continuous ingest
feed. Cross-horizon duplicates are the batch ``operators.dedup``
backstop's job (periodic compaction), mirroring how public pipelines
split online vs offline dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..operators.dedup import normalize_text
from ..operators.text import quality_features, repetition_features


def curate_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    min_quality: float = 0.4,
    max_top_unigram: float = 0.6,
    keep: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Curated stream: exact-dup suppression within the watermark
    horizon, then repetition + quality gates.

    Output: (doc_id, *keep, ts, content_key, n_tokens, repetition and
    quality features) for surviving documents. ``watermark`` must
    cover the source's out-of-order horizon (see
    :mod:`streaming.dedup` on replay/backfill pitfalls).
    """
    from ..operators.text import tokens

    # tokenize ONCE, before the stateful dedup: the dedup operator is
    # a projection barrier, so the ~10 downstream feature expressions
    # consume the materialized token array instead of each re-running
    # the split (the measured 6x lang-ID pitfall; see
    # operators.text.materialized_tokens)
    keyed = docs.select(
        "doc_id",
        *keep,
        ts_col,
        "text",
        tokens("text").alias("toks0"),
        hash60(normalize_text("text")).alias("content_key"),
    )
    deduped = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_key"]
    )
    rep = repetition_features(
        deduped,
        toks=F.col("toks0"),
        keep=(*keep, ts_col, "content_key", "text", "toks0"),
    )
    qf = quality_features(
        rep,
        toks=F.col("toks0"),
        keep=(
            *keep,
            ts_col,
            "content_key",
            "distinct_ratio",
            "top_unigram_frac",
            "dup_bigram_frac",
        ),
    )
    return qf.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("top_unigram_frac") <= max_top_unigram)
    )
