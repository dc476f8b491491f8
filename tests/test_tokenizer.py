"""Distributed BPE tokenizer training (operators/tokenizer.py):
hand-computed merges on a tiny corpus, determinism, and encode parity
with the trained word table."""

import pyspark.sql.functions as F

from vector_database_watermarking_spark.operators import tokenizer as tok
from vector_database_watermarking_spark.sources.tables import load_table


def _mini(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower widest widest widest"),
        (2, "newest newest newest newest newest newest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_hand_computed(spark):
    docs = _mini(spark)
    merges, spaced = tok.bpe_train(docs, num_merges=4)
    got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
    # word freqs: low×5, lower×2, widest×3, newest×6
    # pair counts round 1: (e,s) 9, (s,t) 9, (t,_) 9, (w,e) 8, ...
    # tie at 9 → lexicographic: (e,s) first
    assert got[0] == ("e", "s", 9)
    # round 2: 'es' exists; (es,t) 9 and (t,_) 9 → (es,t) < (t,_)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", "_", 9)
    # round 4: l-o appears in low(5)+lower(2)=7, n-e 6, w-e... 'we'
    # in lower(2)+widest? widest='w i d est_' no; newest='n e w est_'
    # → (w,est_) 6, (l,o) 7 wins
    assert got[3] == ("l", "o", 7)

    # final spaced table keeps the two-space invariant
    for r in spaced.collect():
        assert r["s"].startswith("  ") and r["s"].endswith("  ")
        assert "   " not in r["s"].replace("    ", "")  # only 2-space runs

    # determinism under different partitioning
    merges2, _ = tok.bpe_train(docs.repartition(7), num_merges=4)
    assert [(m["left"], m["right"]) for m in merges2] == [
        (m["left"], m["right"]) for m in merges
    ]


def test_bpe_encode_matches_trained_words(spark):
    docs = _mini(spark)
    merges, spaced = tok.bpe_train(docs, num_merges=4)
    enc = tok.bpe_encode(docs, merges)
    out = {r["doc_id"]: r for r in enc.collect()}
    # doc 2 = 'newest' × 6; trained: n e w est_ → 4 tokens each
    assert out[2]["n_tokens"] == 24
    assert out[2]["tokens"][:4] == ["n", "e", "w", "est_"]
    # doc 0 = 'low' × 5 → lo w _
    assert out[0]["tokens"][:3] == ["lo", "w", "_"]

    # encode of the training vocabulary reproduces the trained spaced
    # table exactly (same replace chain ⇒ same tokenization)
    wt = tok.word_freq_table(docs)
    uniq = wt.select(F.col("word").alias("text")).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    enc_w = tok.bpe_encode(uniq, merges)
    trained = {
        tuple(r["s"].strip().split(tok.SEP)) for r in spaced.collect()
    }
    encoded = {tuple(r["tokens"]) for r in enc_w.collect()}
    assert encoded == trained


def test_bpe_train_on_fixture_compresses(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges, _ = tok.bpe_train(docs, num_merges=6)
    assert len(merges) == 6
    # counts are non-increasing (greedy argmax each round)
    counts = [m["pair_count"] for m in merges]
    assert counts == sorted(counts, reverse=True)
    # encoding with merges strictly shortens the token stream vs chars
    enc = tok.bpe_encode(docs.limit(50), merges)
    base = tok.bpe_encode(docs.limit(50), [])
    a = enc.agg(F.sum("n_tokens")).head()[0]
    b = base.agg(F.sum("n_tokens")).head()[0]
    assert a < b


def test_bpe_driver_tier_equals_distributed_tier(spark, sf_dir):
    """The driver-finish tier (incremental pair counts, one collect)
    and the distributed per-merge loop must produce identical merge
    lists and identical final word tables."""
    docs = load_table(spark, sf_dir, "documents").limit(120)
    fast, spaced_fast = tok.bpe_train(docs, num_merges=12)
    slow, spaced_slow = tok.bpe_train(docs, num_merges=12, force_distributed=True)
    assert [
        (m["left"], m["right"], m["pair_count"]) for m in fast
    ] == [(m["left"], m["right"], m["pair_count"]) for m in slow]
    rows_f = {(r["s"], r["freq"]) for r in spaced_fast.collect()}
    rows_s = {(r["s"], r["freq"]) for r in spaced_slow.collect()}
    assert rows_f == rows_s
    # exhausting the pair space terminates early on both tiers
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    m_fast, _ = tok.bpe_train(tiny, num_merges=50)
    m_slow, _ = tok.bpe_train(tiny, num_merges=50, force_distributed=True)
    assert [(m["left"], m["right"]) for m in m_fast] == [
        (m["left"], m["right"]) for m in m_slow
    ]
    assert len(m_fast) < 50


def test_bpe_train_matches_pure_python_reference(spark):
    """Differential test: the distributed trainer must produce exactly
    the merges of a direct single-process BPE implementation (greedy
    argmax with (count desc, lexicographic) tie-break) on randomized
    word multisets."""
    import random

    def ref_bpe(word_freqs, k):
        seqs = {w: tuple(w) + ("_",) for w in word_freqs}
        merges = []
        for _ in range(k):
            counts = {}
            for w, seq in seqs.items():
                f = word_freqs[w]
                for a, b in zip(seq, seq[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((l, r, c))
            for w, seq in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seqs[w] = tuple(out)
        return merges

    rng = random.Random(7)
    vocab = ["ab", "abc", "banana", "bandana", "cab", "aa", "aaa", "x"]
    for trial in range(3):
        words = [rng.choice(vocab) for _ in range(40)]
        freqs = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
        docs = spark.createDataFrame(
            [(i, " ".join(words[i::4])) for i in range(4)],
            "doc_id long, text string",
        )
        got, _ = tok.bpe_train(docs, num_merges=5)
        want = ref_bpe(freqs, 5)
        assert [
            (m["left"], m["right"], m["pair_count"]) for m in got
        ] == want, (trial, words)
