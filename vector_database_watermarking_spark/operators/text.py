"""Text-analysis operators for training-data pipelines (north-star
extension — SURVEY §7 M6). All native column expressions (no UDFs):
tokenization by split, counting by higher-order functions, hashing by
the keyed 60-bit md5 — every operator here is DuckDB-oracle-checkable
and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from .dedup import normalize_text

# Tiny stopword inventories for the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es"],
}


def tokens(text_col: Column | str) -> Column:
    return F.split(normalize_text(text_col), " ")


def materialized_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, _toks): the token array materialized behind an
    exchange. Catalyst inlines projection expressions into consumers,
    so any operator reading the same token array in several
    expressions (lang scores, quality features, n-gram windows) would
    re-run the split per expression — the repartition forces one
    tokenization (measured 6× on lang-ID at sf0.1)."""
    nparts = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id", tokens(text_col).alias("_toks")).repartition(
        nparts, "doc_id"
    )


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """A BPE-flavored upper estimate: word count + one extra token per
    4 characters of long words (cheap stand-in for subword splits)."""
    toks = tokens(text_col)
    extra = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(F.length(t) > 6, F.floor(F.length(t) / 4).cast("int")).otherwise(0),
    )
    return F.size(toks) + extra


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(
    text_col: Column | str | None = None, toks: Column | None = None
) -> dict[str, Column]:
    if toks is None:
        if text_col is None:
            raise ValueError("lang_scores needs text_col or toks")
        toks = tokens(text_col)
    return {lang: _stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(
    text_col: Column | str | None = None, toks: Column | None = None
) -> Column:
    """Stopword-ratio language guess: argmax language score, 'und'
    (undetermined) when no stopword hits at all. Ties break by the
    fixed language order (en, fr, de, es). Pass a pre-materialized
    ``toks`` column to avoid re-tokenizing (the split re-runs per
    score expression otherwise)."""
    scores = lang_scores(text_col, toks)
    langs = list(LANG_STOPWORDS)
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def quality_features(
    docs: DataFrame,
    text_col: str = "text",
    keep: tuple[str, ...] = (),
    toks: Column | None = None,
) -> DataFrame:
    """Per-doc quality features: lengths, token stats, stopword ratio,
    punctuation ratio, mean word length, and a combined [0,1] score
    (heuristic quality filter for pretraining corpora). ``keep`` names
    extra input columns to carry through; ``toks`` supplies a
    pre-materialized token array (avoids re-splitting per feature)."""
    toks = tokens(text_col) if toks is None else toks
    n_tok = F.size(toks)
    n_chars = F.length(normalize_text(text_col))
    mean_word_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    stop_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    stop_ratio = stop_hits / n_tok
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    punct_ratio = punct / F.greatest(F.length(text_col), F.lit(1))
    length_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return docs.select(
        "doc_id",
        *keep,
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_norm"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def fingerprint(text_col: Column | str) -> Column:
    """Document fingerprint: keyed 60-bit hash of the normalized text
    (the whole-doc anchor for incremental dedup)."""
    return hash60(normalize_text(text_col))


def rolling_fingerprints(
    docs: DataFrame, window_tokens: int = 8, stride: int = 4, text_col: str = "text"
) -> DataFrame:
    """Rolling window fingerprints: hash of each ``window_tokens``-token
    window every ``stride`` tokens — the substring-level signal used
    for contamination scanning. Output: (doc_id, win_idx, fp)."""
    toks_df = materialized_tokens(docs, text_col)
    n_win = F.greatest(
        F.floor((F.size("_toks") - window_tokens) / stride).cast("int") + 1, F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_win - 1)
    wins = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("win_idx"),
            hash60(
                F.concat_ws(" ", F.slice(F.col("_toks"), i * stride + 1, window_tokens))
            ).alias("fp"),
        ),
    )
    return toks_df.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", "w.win_idx", "w.fp"
    )


def contamination_scan(
    corpus: DataFrame,
    probe: DataFrame,
    window_tokens: int = 8,
    stride: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus contamination scan: which ``corpus`` (training)
    documents contain text windows that also appear in ``probe`` (the
    eval/test set)? The decontamination primitive every pretraining
    pipeline runs before training (not in the reference — north-star
    extension).

    Both sides are reduced to rolling window fingerprints
    (:func:`rolling_fingerprints`), deduplicated per doc, and
    equi-joined on the 60-bit hash; output is one row per contaminated
    corpus doc with the shared-window count, how many probe docs it
    collides with, and the smallest colliding probe doc id.

    Scale shape: the probe side (benchmarks) is orders of magnitude
    smaller than the corpus at 100 TB, so its fingerprint set
    broadcast-joins (the hint below; Catalyst drops it gracefully if
    the probe outgrows the threshold and AQE falls back to a shuffle
    join keyed by the uniform 60-bit hash — no skew). The corpus side
    is a single scan; nothing is ever collected.
    """
    c_fp = rolling_fingerprints(corpus, window_tokens, stride, text_col).select(
        F.col("doc_id").alias("corpus_doc"), "fp"
    ).dropDuplicates(["corpus_doc", "fp"])
    p_fp = rolling_fingerprints(probe, window_tokens, stride, text_col).select(
        F.col("doc_id").alias("probe_doc"), "fp"
    ).dropDuplicates(["probe_doc", "fp"])
    hits = c_fp.join(F.broadcast(p_fp), on="fp")
    return hits.groupBy("corpus_doc").agg(
        F.count_distinct("fp").alias("n_shared_windows"),
        F.count_distinct("probe_doc").alias("n_probe_docs"),
        F.min("probe_doc").alias("first_probe_doc"),
    )
