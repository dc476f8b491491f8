"""Distributed BPE tokenizer training (extension — the step a
training-data pipeline runs between corpus curation and tokenization;
the reference has no text surface at all).

Classic byte-pair-encoding, trained the scalable way: on the WORD
FREQUENCY TABLE, not the corpus. The corpus is scanned once to count
unique words; every merge iteration then aggregates adjacent-pair
counts over that (comparatively tiny, exactly-aggregable) table and
applies the winning merge — at 100 TB the corpus scan is the only
big job, and each of the k iterations is a partial-aggregated
groupBy over unique words plus a 1-row argmax collect (the same
bounded driver touch as the components loop's convergence check).

Merge mechanics are STRING-level, chosen for engine-replayability:
a word's token sequence is kept as a two-space-separated string
(``'  h  e  l  l  o  _  '``). A pair (l, r) occurs as the substring
``' l  r '`` — one space borrowed from each side's pair — so plain
leftmost-non-overlapping global ``replace`` (identical semantics in
Java, Python, and DuckDB) applies the merge left-to-right greedily,
exactly BPE's merge order, and the replacement ``' lr '`` restores
the two-space invariant. No regex, no escaping, no lookarounds; the
DuckDB oracle replays training stage-for-stage with the same
``replace`` calls.

Tokens are restricted to ``[a-z0-9]+`` words (post-normalization)
plus the ``_`` end-of-word marker, so token text never collides with
the separator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

SEP = "  "
END = "_"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over normalized alnum words — the only full-corpus
    scan BPE training performs. One shuffle, partial-aggregated."""
    words = docs.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("word")
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def char_spaced(word: Column) -> Column:
    """``'hello'`` → ``'  h  e  l  l  o  _  '``: every token bounded by
    the two-space separator, end-of-word marker appended."""
    return F.concat(
        F.lit(SEP),
        F.regexp_replace(word, "(.)", "$1" + SEP),
        F.lit(END + SEP),
    )


def pair_counts(spaced: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the spaced word table: explode
    each word's bigrams weighted by word frequency. All native."""
    toks = F.split(F.trim(F.col("s")), SEP)
    # guard: a fully-merged single-token word has no bigrams, and
    # sequence(1, 0) would run DESCENDING ([1, 0]) rather than empty
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i).alias("l"),
            F.element_at(toks, i + 1).alias("r"),
        ),
    )
    return (
        spaced.select(F.explode(bigrams).alias("p"), "freq")
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("c"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[dict], DataFrame]:
    """Train ``num_merges`` BPE merges. Returns (merge list — dicts of
    rank/left/right/merged/pair_count — and the final spaced word
    table for inspection/encoding parity tests).

    Per iteration: one groupBy over unique words (pair counts), one
    deterministic argmax (count desc, then lexicographic — a 1-row
    collect), one ``replace`` projection. The word table is persisted
    and re-persisted each round so the k-deep replace chain never
    re-executes from the corpus scan.
    """
    spaced = (
        word_freq_table(docs, text_col)
        .select(char_spaced(F.col("word")).alias("s"), "freq")
        .persist()
    )
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        top = (
            pair_counts(spaced)
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] <= 0:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append(
            {
                "rank": rank,
                "left": l,
                "right": r,
                "merged": l + r,
                "pair_count": c,
            }
        )
        nxt = spaced.select(
            F.replace(
                F.col("s"),
                F.lit(f" {l}{SEP}{r} "),
                F.lit(f" {l}{r} "),
            ).alias("s"),
            "freq",
        ).persist()
        # materialize the new table from the OLD cache before dropping
        # it — unpersisting first would evict the only materialized
        # ancestor and every later iteration would recompute from the
        # corpus scan (verified: k merges = k corpus reads without
        # this; with it, the corpus is read once)
        nxt.count()
        spaced.unpersist()
        spaced = nxt
    return merges, spaced


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to documents: (doc_id, tokens
    array<string>, n_tokens). The k replaces chain into ONE shuffle-
    free projection (whole-stage codegen'd); per-word cost is linear
    in text length × merges regardless of cluster size."""
    words = docs.select(
        F.col(doc_id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    s = char_spaced(F.col("word"))
    for m in merges:
        s = F.replace(
            s,
            F.lit(f" {m['left']}{SEP}{m['right']} "),
            F.lit(f" {m['left']}{m['right']} "),
        )
    toks = F.split(F.trim(s), SEP)
    # collect_list order is arrival order — sort by word position so
    # the token stream is deterministic under any partitioning
    per_word = F.struct(F.col("pos").alias("pos"), toks.alias("t"))
    return words.groupBy(doc_id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(per_word)), lambda x: x["t"]
            )
        ).alias("tokens"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
    )
