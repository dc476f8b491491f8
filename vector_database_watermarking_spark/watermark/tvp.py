"""TVP and RS watermark pipelines (SURVEY C1/C2/C3).

Reference: ``watermark_embedding_by_ai`` (``/root/reference/
watermarking.py:275-342``), ``watermark_embedding`` (``:345-400``),
``watermark_extraction`` (``:402-427``).

Pipeline shape (C1): kNN graph → accessibility index → compat
group/classify (pandas UDF over the whole collection) → per-group
deficit (F5) → carrier selection (W1 two-tier rank-threshold, or W6
seeded sample for RS) → bit surgery on carriers only (P5).

The reference's per-bit Python loop disappears: groups are disjoint,
so selection and embedding happen for all L groups in one shot —
window functions partitioned by ``group_id`` (SURVEY §3.1 stage 8).

Scale notes: every step shuffles by ``group_id`` or joins on
``vec_id``; the only Python is the two Arrow-batched pandas UDFs
(classification + embedding). At 100 TB the classification UDF is the
hot path — the native parity tier (``operators.grouping``) is the
all-JVM alternative with the same relational shape.

Determinism (SURVEY §4.2): RS "random" selection orders by a keyed
hash of (seed, vec_id) instead of CPython's stateful
``random.sample`` — partitioning-invariant; documented deviation.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import bits
from ..functions.hashing import compat_md5_mod, hash60, key_dims
from ..operators.graph import accessibility_index
from ..operators.knn import knn_edges

_CLS_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.StringType()),
        T.StructField("group_id", T.IntegerType()),
        T.StructField("hidden_bit", T.IntegerType()),
    ]
)


def _make_classifier(dims: list[int], L: int):
    skip = frozenset(dims)

    @F.pandas_udf(_CLS_SCHEMA)
    def _cls(embs: pd.Series) -> pd.DataFrame:
        vids, gids, hbits = [], [], []
        for vec in embs:
            vec = list(vec)
            vid = bits.content_id_py(vec, dims)
            vids.append(vid)
            gids.append(compat_md5_mod(vid, L))
            # integer fast tier — bit-identical (functions.bits)
            hbits.append(bits.extract_bit_fast(vec, vid, skip))
        return pd.DataFrame({"vid": vids, "group_id": gids, "hidden_bit": hbits})

    return _cls


def _make_embedder(dims: list[int]):
    skip = frozenset(dims)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(embs: pd.Series, vids: pd.Series, targets: pd.Series) -> pd.Series:
        out = []
        for vec, vid, target in zip(embs, vids, targets):
            if target is None or (isinstance(target, float) and math.isnan(target)):
                out.append(vec)
            else:
                out.append(bits.embed_bit_fast(list(vec), int(target), vid, skip))
        return pd.Series(out)

    return _embed


def classify_compat(emb: DataFrame, dims: list[int], L: int) -> DataFrame:
    """A1 compat tier: add ``vid``, ``group_id``, ``hidden_bit`` via the
    full-128-bit-md5 / binary-expansion semantics
    (``watermarking.py:119-150``)."""
    cls = _make_classifier(dims, L)
    return emb.withColumn("_c", cls(F.col("embedding"))).select(
        "*", "_c.vid", "_c.group_id", "_c.hidden_bit"
    ).drop("_c")


def _with_wm_bit(cls: DataFrame, watermark: str) -> DataFrame:
    """Attach each row's group-target bit from the watermark string."""
    wm_arr = F.array(*[F.lit(int(b)) for b in watermark])
    return cls.withColumn("wm_bit", F.element_at(wm_arr, F.col("group_id") + 1))


def _group_stats(cls_wm: DataFrame, strength: float) -> DataFrame:
    """F5 deficit algebra (``watermarking.py:316-328``) per group:
    (group_id, n_total, n_have, n_avail, deficit) with the deficit
    capped at the available (disagreeing) rows. The single home of the
    formula — selection and the carrier audit both consume it."""
    stats = cls_wm.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("hidden_bit") == F.col("wm_bit")).cast("int")).alias("n_have"),
    )
    stats = stats.withColumn(
        "deficit",
        F.greatest(
            F.lit(0),
            F.ceil(F.lit(strength) * F.col("n_total")).cast("long") - F.col("n_have"),
        ),
    ).withColumn("n_avail", F.col("n_total") - F.col("n_have"))
    return stats.withColumn("deficit", F.least(F.col("deficit"), F.col("n_avail")))


def _avail_from_classified(cls: DataFrame, watermark: str, strength: float) -> DataFrame:
    """F5 bit-deficit computation (``watermarking.py:316-328``) over an
    already-classified DataFrame: attach the group's target bit,
    compute how many carriers each group still needs, and keep only the
    flippable rows. Classifier-agnostic (compat pandas-UDF tier or the
    native parity tier feed the same deficit algebra)."""
    cls = _with_wm_bit(cls, watermark)
    stats = _group_stats(cls, strength)
    return cls.filter(F.col("hidden_bit") != F.col("wm_bit")).join(
        F.broadcast(stats.select("group_id", "deficit", "n_avail")), on="group_id"
    )


def _selection_base(
    emb: DataFrame, watermark: str, dims: list[int], strength: float
) -> DataFrame:
    """Shared F5 bit-deficit computation (``watermarking.py:316-328``):
    classify (compat tier), then the deficit algebra."""
    cls = classify_compat(emb, dims, len(watermark))
    return _avail_from_classified(cls, watermark, strength)


def _select_by_ai(avail: DataFrame, th: float) -> DataFrame:
    """W1 (``select_by_ai``, ``watermarking.py:203-246``): two-tier
    rank-threshold selection per group.

    Tier 1: rows whose AI ≥ the AI at rank ``int(n_avail·th)`` of the
    AI-descending order, taken in *vec_id order* (the reference
    iterates candidates in data order) up to the deficit. Tier 2
    (backfill, ``:234-244``): remaining rows in AI-descending order.
    """
    w_ai = Window.partitionBy("group_id").orderBy(F.col("ai").desc(), F.col("vec_id"))
    avail = avail.withColumn("ai_rank", F.row_number().over(w_ai))
    thr_rank = F.floor(F.col("n_avail") * F.lit(th)).cast("long")

    thr = (
        avail.filter(F.col("ai_rank") == thr_rank)
        .select("group_id", F.col("ai").alias("thr_ai"))
    )
    avail = avail.join(F.broadcast(thr), on="group_id", how="left").withColumn(
        "passer",
        F.when(F.col("thr_ai").isNull(), F.lit(True)).otherwise(
            F.col("ai") >= F.col("thr_ai")
        ),
    )
    n_pass = F.sum(F.col("passer").cast("long")).over(Window.partitionBy("group_id"))
    avail = avail.withColumn("n_pass", n_pass)

    w_tier = Window.partitionBy("group_id", "passer")
    rn_t1 = F.row_number().over(w_tier.orderBy("vec_id"))
    rn_t2 = F.row_number().over(w_tier.orderBy(F.col("ai").desc(), F.col("vec_id")))
    avail = avail.withColumn("rn_t1", rn_t1).withColumn("rn_t2", rn_t2)

    tier1 = F.col("passer") & (F.col("rn_t1") <= F.col("deficit"))
    tier2 = (~F.col("passer")) & (
        F.col("rn_t2") <= F.col("deficit") - F.least(F.col("deficit"), F.col("n_pass"))
    )
    return avail.filter(tier1 | tier2)


def _select_random(avail: DataFrame, seed: int) -> DataFrame:
    """W6 (``random_select_vectors``, ``watermarking.py:152-165``):
    exact-n per-group sample, ordered by a keyed hash — a pure function
    of (seed, vec_id), unlike the reference's stateful RNG."""
    order_key = hash60(F.concat_ws("_", F.lit(str(seed)), F.col("vec_id")))
    w = Window.partitionBy("group_id").orderBy(order_key, F.col("vec_id"))
    return avail.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.col("deficit")
    )


def _apply_embedding(
    emb: DataFrame, carriers: DataFrame, dims: list[int]
) -> DataFrame:
    """P5 application: join the carrier targets and rewrite only those
    embeddings (the UDF passes non-carriers through untouched)."""
    embedder = _make_embedder(dims)
    tagged = emb.join(
        carriers.select("vec_id", "vid", F.col("wm_bit").alias("_target")),
        on="vec_id",
        how="left",
    )
    out_cols = [c for c in emb.columns]
    return tagged.withColumn(
        "embedding",
        embedder(F.col("embedding"), F.col("vid"), F.col("_target").cast("double")),
    ).select(*out_cols)


def tvp_embed(
    emb: DataFrame,
    watermark: str,
    strength: float,
    th: float,
    seed: int = 20,
    knn_k: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """C1 (``watermark_embedding_by_ai``, ``watermarking.py:275-342``).

    Returns ``(watermarked, carriers)``; ``carriers`` has
    ``(vec_id, group_id, wm_bit, ai)``.
    """
    wm_df, carriers, _ = tvp_embed_with_ai(
        emb, watermark, strength, th, seed=seed, knn_k=knn_k
    )
    return wm_df, carriers


def tvp_embed_with_ai(
    emb: DataFrame,
    watermark: str,
    strength: float,
    th: float,
    seed: int = 20,
    knn_k: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`tvp_embed` plus the per-node accessibility index it
    computed internally — so callers needing the reference's 5-tuple
    (``watermarking.py:342``) don't rebuild the kNN graph (the
    pipeline's dominant cost) a second time."""
    d = len(emb.select("embedding").head()[0])
    dims = key_dims(d, seed)
    edges = knn_edges(emb.select("vec_id", "embedding"), k=knn_k)
    ai = accessibility_index(edges, emb).select("vec_id", "ai").persist()
    avail = _selection_base(emb, watermark, dims, strength).join(ai, on="vec_id")
    carriers = _select_by_ai(avail, th).select("vec_id", "group_id", "wm_bit", "vid", "ai")
    return _apply_embedding(emb, carriers, dims), carriers, ai


def tvp_select_native(
    emb: DataFrame,
    watermark: str,
    strength: float,
    th: float,
    seed: int = 20,
    knn_k: int = 10,
) -> DataFrame:
    """W1+F5 carrier selection over the NATIVE classification tier
    (hash60 group ids + parity hidden bit — ``operators.grouping``):
    the same selection model as :func:`tvp_embed` (deficits, AI
    threshold, two-tier backfill; ``watermarking.py:203-246,316-328``)
    with every step a native SQL expression, so the whole path is
    DuckDB-oracle-checkable. AI is computed over 6-decimal edge lengths
    and rounded to 5 so rankings are cross-engine stable.

    Returns carriers ``(vec_id, group_id, wm_bit)``.
    """
    from ..operators.grouping import classify

    d = len(emb.select("embedding").head()[0])
    dims = key_dims(d, seed)
    cls = classify(emb, dims, L=len(watermark), d=d)
    avail = _avail_from_classified(cls, watermark, strength)
    edges = knn_edges(emb.select("vec_id", "embedding"), k=knn_k)
    ai = accessibility_index(edges, emb, decimals=6).select(
        "vec_id", F.round("ai", 5).alias("ai")
    )
    carriers = _select_by_ai(avail.join(ai, on="vec_id"), th)
    return carriers.select("vec_id", "group_id", "wm_bit")


def tvp_carrier_invariants(
    emb: DataFrame,
    watermark: str,
    strength: float,
    th: float,
    seed: int = 20,
    knn_k: int = 10,
) -> DataFrame:
    """Per-group invariant audit of the compat-tier TVP carrier
    selection and embedding (C1, ``watermark_embedding_by_ai``,
    ``watermarking.py:275-342``).

    The compat classification (full-128-bit md5 group ids + binary-
    expansion hidden bits) lives in a pandas UDF no SQL engine can
    replay, so the carrier *listing* is not oracle-checkable. What IS
    provable — and falsifiable — is the algebra composed around it:

    - ``deficit_met``: the selection takes exactly the capped deficit
      ``min(max(0, ceil(strength·n_total) − n_have), n_avail)`` per
      group (F5 ``watermarking.py:316-328`` + W1 ``:203-246``).
    - ``embed_fixed_carriers``: after embedding, an independent
      re-classification of the watermarked vectors agrees with the
      target bit on exactly ``n_have + n_carriers`` rows — i.e. every
      carrier flipped to its target and no non-carrier was disturbed.
      Wrong carrier targeting, a drifted embed position, or an
      extraction mismatch all break this equality.
    - ``group_bit_decoded``: the post-embed majority decode of each
      group equals its planted bit (guaranteed at strength > 0.5 when
      everything composes; an off-by-one in group indexing flips it).

    Each check crosses the embed/extract boundary or compares
    independently-derived counts, so none is true by construction.
    Returns one row per group: ``(group_id, deficit_met,
    embed_fixed_carriers, group_bit_decoded)``.
    """
    d = len(emb.select("embedding").head()[0])
    dims = key_dims(d, seed)
    L = len(watermark)

    cls = _with_wm_bit(classify_compat(emb, dims, L), watermark)
    stats = _group_stats(cls, strength)
    avail = cls.filter(F.col("hidden_bit") != F.col("wm_bit")).join(
        F.broadcast(stats.select("group_id", "deficit", "n_avail")), on="group_id"
    )
    edges = knn_edges(emb.select("vec_id", "embedding"), k=knn_k)
    ai = accessibility_index(edges, emb).select("vec_id", "ai")
    # carriers feeds the per-group count AND the embedding pass, and
    # its subtree contains the kNN build + accessibility index —
    # materialize the tiny selected set once instead of re-running the
    # graph pipeline per consumer
    carriers = _select_by_ai(avail.join(ai, on="vec_id"), th).select(
        "vec_id", "group_id", "wm_bit", "vid"
    ).localCheckpoint(eager=True)
    n_car = carriers.groupBy("group_id").agg(F.count(F.lit(1)).alias("n_carriers"))

    # embed for real, then re-classify the watermarked vectors — the
    # audit's right-hand sides come from a second, independent pass
    # through the extraction path
    wm_df = _apply_embedding(emb, carriers, dims)
    post = _with_wm_bit(classify_compat(wm_df, dims, L), watermark)
    post_stats = post.groupBy("group_id").agg(
        F.sum((F.col("hidden_bit") == F.col("wm_bit")).cast("int")).alias(
            "n_have_post"
        ),
        F.count(F.lit(1)).alias("n_total_post"),
    )

    audited = (
        stats.join(n_car, on="group_id", how="left")
        .join(post_stats, on="group_id")
        .select(
            "group_id",
            (F.coalesce(F.col("n_carriers"), F.lit(0)) == F.col("deficit")).alias(
                "deficit_met"
            ),
            (
                F.col("n_have_post")
                == F.col("n_have") + F.coalesce(F.col("n_carriers"), F.lit(0))
            ).alias("embed_fixed_carriers"),
            (F.col("n_have_post") * 2 > F.col("n_total_post")).alias(
                "group_bit_decoded"
            ),
        )
    )
    return audited.orderBy("group_id")


def rs_embed(
    emb: DataFrame,
    watermark: str,
    strength: float,
    seed: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """C2 (``watermark_embedding``, ``watermarking.py:345-400``):
    TVP with uniform-random carrier selection (the ablation)."""
    d = len(emb.select("embedding").head()[0])
    dims = key_dims(d, seed)
    avail = _selection_base(emb, watermark, dims, strength)
    carriers = _select_random(avail, seed).select("vec_id", "group_id", "wm_bit", "vid")
    return _apply_embedding(emb, carriers, dims), carriers


def tvp_extract(wm_data: DataFrame, L: int, seed: int = 20) -> str:
    """C3 (``watermark_extraction``, ``watermarking.py:402-427``):
    blind extraction — needs only (seed, L)."""
    from ..operators.grouping import decode_bitstring

    d = len(wm_data.select("embedding").head()[0])
    dims = key_dims(d, seed)
    cls = classify_compat(wm_data, dims, L)
    return decode_bitstring(cls, L)
