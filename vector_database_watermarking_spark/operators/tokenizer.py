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


def _merge_tokens(toks: list, l: str, r: str, lr: str) -> tuple[list, bool]:
    """Leftmost-non-overlapping greedy merge of the pair (l, r) in one
    token list — the list form of the spaced-string ``replace``."""
    out: list = []
    i, n, changed = 0, len(toks), False
    while i < n:
        if i + 1 < n and toks[i] == l and toks[i + 1] == r:
            out.append(lr)
            i += 2
            changed = True
        else:
            out.append(toks[i])
            i += 1
    return out, changed


def _driver_bpe(
    seqs: list[list], num_merges: int
) -> list[dict]:
    """Driver-finish tier: run the whole merge loop over the collected
    word table with INCREMENTAL pair-count maintenance — a lazy
    max-heap of (−count, l, r) plus a pair→word-index occurrence map,
    so each merge touches only the words containing the winning pair
    (the classic single-process BPE optimization; near-linear in total
    token updates rather than O(merges × vocab)). Mutates ``seqs``
    ([tokens, freq] entries) to the final trained state.

    Selection order is identical to the distributed tier: pair count
    desc, then (l, r) lexicographic — the heap orders exactly that and
    stale entries are discarded by comparing against the live count.
    """
    import heapq
    from collections import defaultdict

    counts: dict = defaultdict(int)
    where: dict = defaultdict(set)
    for idx, (toks, f) in enumerate(seqs):
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] += f
            where[(a, b)].add(idx)
    heap = [(-c, l, r) for (l, r), c in counts.items()]
    heapq.heapify(heap)

    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        pair = None
        while heap:
            negc, l, r = heapq.heappop(heap)
            if counts.get((l, r), 0) == -negc and -negc > 0:
                pair = (l, r, -negc)
                break
        if pair is None:
            break
        l, r, c = pair
        lr = l + r
        merges.append(
            {"rank": rank, "left": l, "right": r, "merged": lr, "pair_count": c}
        )
        touched: set = set()
        for idx in sorted(where.pop((l, r), ())):
            toks, f = seqs[idx]
            new_toks, changed = _merge_tokens(toks, l, r, lr)
            if not changed:  # stale occurrence entry
                continue
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] -= f
                touched.add((a, b))
            for a, b in zip(new_toks, new_toks[1:]):
                counts[(a, b)] += f
                where[(a, b)].add(idx)
                touched.add((a, b))
            seqs[idx][0] = new_toks
        counts.pop((l, r), None)
        for p in touched:
            cp = counts.get(p, 0)
            if cp > 0:
                heapq.heappush(heap, (-cp, p[0], p[1]))
            else:
                counts.pop(p, None)
    return merges


def bpe_train(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    force_distributed: bool = False,
) -> tuple[list[dict], DataFrame]:
    """Train ``num_merges`` BPE merges. Returns (merge list — dicts of
    rank/left/right/merged/pair_count — and the final spaced word
    table for inspection/encoding parity tests).

    Tier choice: after the one corpus scan the word-freq table is
    probed against the broadcast budget (``knn.probe_collect``); when
    it fits — which normalization makes the common case, since the
    table holds unique alnum words, not corpus rows — ALL merges
    finish driver-side in one pass over the collected table with
    incremental pair counts, so a 32k-merge production vocabulary
    costs one Spark job + one driver pass instead of 2 driver-
    synchronized Spark rounds per merge. Past the budget, the
    distributed loop below runs: per iteration one groupBy over
    unique words (pair counts), one deterministic argmax (count desc,
    then lexicographic — a 1-row collect), one ``replace`` projection,
    with the word table re-persisted each round so the k-deep replace
    chain never re-executes from the corpus scan. Both tiers implement
    the same (count desc, lexicographic) selection and leftmost-non-
    overlapping merge; the differential test against a pure-Python
    trainer and the cross-tier equality test pin them together.
    """
    from .knn import probe_collect

    spark = docs.sparkSession
    spaced = (
        word_freq_table(docs, text_col)
        .select(char_spaced(F.col("word")).alias("s"), "freq")
        .persist()
    )
    if not force_distributed:
        rows = probe_collect(spaced)
        if rows is not None:
            seqs = [
                [r["s"].strip().split(SEP), int(r["freq"])] for r in rows
            ]
            spaced.unpersist()
            merges = _driver_bpe(seqs, num_merges)
            final = spark.createDataFrame(
                [(SEP + SEP.join(toks) + SEP, f) for toks, f in seqs],
                "s string, freq bigint",
            )
            return merges, final
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
    # hand back a checkpointed table and release the loop's last cache
    # (same storage-hygiene rule as the driver tier, which collects and
    # unpersists): repeated distributed-tier trainings must not
    # accumulate orphaned storage blocks
    final = spaced.localCheckpoint(eager=True)
    spaced.unpersist()
    return merges, final


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
