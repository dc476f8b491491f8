"""Attack operators (SURVEY C8, W2/W6/P14/SO2 —
``/root/reference/roubust/roubust.py:61-208``, ``compare/roubust.py:50-96``).

All randomness is a pure function of (seed, vec_id) via keyed 60-bit
md5 hashes (SURVEY §4.2): the same attack on the same data gives the
same result under any partitioning — and the DuckDB oracle can replay
it, so even the "random" attacks are oracle-checkable.

Scale notes: every exact-n rank selection goes through
:func:`take_ranked` — an ``approxQuantile`` threshold bracket plus a
bounded tie-band window (never a global single-task sort), with exact
``(key, vec_id)`` order guaranteed by runtime-checked rank bounds.
Modification rewrites arrays with a native ``transform`` — no UDF, no
shuffle. Insertion derives per-dim stats with one posexplode
aggregation and synthesizes rows JVM-side with Box-Muller over keyed
hashes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def _rank_key(seed: int, tag: str) -> Column:
    return hash60(F.concat_ws("_", F.lit(str(seed)), F.lit(tag), F.col("vec_id")))


def take_ranked(
    df: DataFrame,
    n: int,
    key: Column,
    *,
    descending: bool = False,
    tie_col: str = "vec_id",
) -> DataFrame:
    """Exactly the first ``n`` rows of ``df`` in ``(key, tie_col)``
    order (``row_number() <= n`` semantics, NULL keys ranking last —
    matching ``Window.orderBy(key.desc())``'s nulls-last placement the
    adaptive attacks relied on) WITHOUT a global single-task sort.

    Scale shape (the same threshold-plus-tie-band idea as
    ``graph.hidden_nodes``, generalized to continuous keys): an
    ``approxQuantile`` probe over a SLIM (key, tie) projection
    brackets the n-th key between two thresholds whose rank error is
    provably inside the pad — only driver scalars survive the probe
    (the full relation is never persisted). Rows strictly below the
    lower threshold pass a plain parallel filter, and only the
    bracket band — O(relative-error · N), capped ~10⁵ rows — goes
    through a row_number window to resolve the last slots. The
    quantile guarantee is re-checked against exact counts at runtime;
    if it ever fails (pathological key distribution) a global-window
    path runs instead, so results are always exact ``(key, tie)``
    order regardless.

    Ordering inside the band uses the ORIGINAL key (long hashes lose
    precision past 2⁵³ as doubles; the double cast is only used for
    the coarse threshold filters, which strict comparisons keep
    consistent with the exact order).
    """
    out_cols = list(df.columns)
    if n <= 0:
        return df.filter(F.lit(False))
    akey = (-key) if descending else key
    akd = akey.cast("double")
    # single-partition by construction (band is capped ~1e5 rows;
    # fallback is the rare exact path) — the non-foldable constant
    # partition key silences the WindowExec no-partition warning so a
    # NEW unpartitioned window (a real bug) stays visible in the logs
    from ..functions.windows import one_partition

    w_all = Window.partitionBy(one_partition(tie_col)).orderBy(
        F.asc_nulls_last(akey), F.col(tie_col)
    )

    def _fallback() -> DataFrame:
        return (
            df.withColumn("_rn", F.row_number().over(w_all))
            .filter(F.col("_rn") <= n)
            .select(*out_cols)
        )

    # probe on a slim projection: per-row cost is ~16 bytes, persisted
    # only for the four scalar actions below, then released — the full
    # relation (embeddings!) is never cached by this helper
    probe = df.select(akd.alias("_akd"), F.col(tie_col)).persist()
    try:
        total = probe.count()
        if n >= total:
            return df
        n_null = probe.filter(F.col("_akd").isNull()).count()
        nn = total - n_null
        if n >= nn:
            # every non-null row selected; the remainder comes from the
            # null-key tail in tie order (rare; bounded by null count)
            return _fallback()
        eps = max(1e-6, min(1e-3, 50_000.0 / nn))
        pad = max(3.0 * eps * nn, 2.0)
        q_lo = max(0.0, (n - pad) / nn)
        q_hi = min(1.0, (n + pad) / nn)
        # approxQuantile ignores nulls, so ranks are within the
        # non-null population — consistent with nulls-last ordering
        t_lo, t_hi = probe.stat.approxQuantile("_akd", [q_lo, q_hi], eps)
        c_sure = probe.filter(F.col("_akd") < t_lo).count()
        if c_sure > n:  # low-side guarantee violated
            return _fallback()
        quota = n - c_sure
        c_band = probe.filter(
            (F.col("_akd") >= t_lo) & (F.col("_akd") <= t_hi)
        ).count()
        if c_band < quota:  # high-side guarantee violated
            return _fallback()
    finally:
        probe.unpersist()

    sure = df.filter(akd < t_lo)
    if quota == 0:
        return sure.select(*out_cols)
    band = df.filter((akd >= t_lo) & (akd <= t_hi))
    picked = (
        band.withColumn("_rn", F.row_number().over(w_all))
        .filter(F.col("_rn") <= quota)
    )
    return sure.select(*out_cols).unionByName(picked.select(*out_cols))


def _uniform01(*cols: Column) -> Column:
    """U(0,1) from a keyed hash — pure, partitioning-invariant."""
    return (hash60(F.concat_ws("_", *cols)) + F.lit(1).cast("double")) / F.lit(
        float(2**60 + 2)
    )


def random_delete(emb: DataFrame, p: float, seed: int = 42) -> DataFrame:
    """W6 deletion (``roubust/roubust.py:76-97``): keep exactly
    ``n − ceil(n·p)`` rows, chosen by hash order (the reference keeps a
    uniform sample of that size — see SURVEY W6 note on its
    keep-count semantics)."""
    n = emb.count()
    keep = n - int(math.ceil(n * p))
    return take_ranked(emb, keep, _rank_key(seed, "dele"))


def adaptive_delete(emb: DataFrame, ai: DataFrame, p: float) -> DataFrame:
    """W2 adaptive deletion (``adaptive_dele``,
    ``watermarking.py:430-443``): drop the top ``ceil(n·p)`` rows by
    accessibility index (the attacker removes the most likely
    carriers). ``ai`` is ``(vec_id, ai)``.

    Rows of ``emb`` with no ``ai`` entry (an AI snapshot older than an
    insertion attack, say) are KEPT — the attacker can't rank what it
    has no score for. NULL AI scores rank last (never removed while
    scored rows remain), matching the desc-nulls-last window order."""
    n = emb.count()
    remove = int(math.ceil(n * p))
    removed = take_ranked(ai, remove, F.col("ai"), descending=True).select("vec_id")
    return emb.join(removed, on="vec_id", how="left_anti")


def random_modify(
    emb: DataFrame,
    p: float,
    seed: int = 42,
    span: int = 30,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """C8 modification (``random_modify``, ``roubust/roubust.py:132-156``,
    ``tabularMark.py:192-219``): for ``ceil(n·p)`` hash-chosen rows,
    overwrite ``span`` consecutive dims (mod d) starting at a per-row
    offset with one uniform value drawn from a dimension's [min, max].

    Native: the array rewrite is a ``transform`` lambda over the
    element index — whole-stage codegen, no Python.
    """
    n = emb.count()
    modify = int(math.ceil(n * p))
    if lo is None or hi is None:
        stats = (
            emb.select(F.explode("embedding").alias("v"))
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
            .head()
        )
        lo = float(stats["lo"]) if lo is None else lo
        hi = float(stats["hi"]) if hi is None else hi

    targets = take_ranked(
        emb.select("vec_id"), modify, _rank_key(seed, "modi")
    ).withColumn("_hit", F.lit(1))
    d = F.size("embedding")
    offset = (hash60(F.concat_ws("_", F.lit(str(seed)), F.lit("off"), F.col("vec_id"))) % d).cast("int")
    new_val = (
        F.lit(lo)
        + (F.lit(hi) - F.lit(lo))
        * _uniform01(F.lit(str(seed)), F.lit("val"), F.col("vec_id"))
    ).cast("float")

    modified = F.transform(
        "embedding",
        lambda x, i: F.when(
            ((i - F.col("_off") + d) % d) < F.lit(span), F.col("_nv")
        ).otherwise(x),
    )
    return (
        emb.join(targets, on="vec_id", how="left")
        .withColumn("_off", offset)
        .withColumn("_nv", new_val)
        .withColumn(
            "embedding",
            F.when(F.col("_hit").isNotNull(), modified).otherwise(F.col("embedding")),
        )
        .drop("_hit", "_off", "_nv")
    )


def modify_targets(emb: DataFrame, p: float, seed: int = 42) -> DataFrame:
    """The ``ceil(n·p)`` hash-chosen vec_ids that :func:`random_modify`
    rewrites under the same (p, seed) — the attacked-row set, exposed
    so impact studies (A13) can treat them as carriers. Must stay in
    lockstep with ``random_modify``'s ranking key."""
    n = emb.count()
    modify = int(math.ceil(n * p))
    return take_ranked(
        emb.select("vec_id"), modify, _rank_key(seed, "modi")
    ).select("vec_id")


def adaptive_modify(
    emb: DataFrame,
    ai: DataFrame,
    p: float,
    seed: int = 42,
    span: int = 30,
) -> DataFrame:
    """W2 modification (``adaptive_modify``, ``roubust/roubust.py:99-130``):
    same array rewrite, targets = top ``ceil(n·p)`` rows by AI."""
    n = emb.count()
    modify = int(math.ceil(n * p))
    targets = take_ranked(ai, modify, F.col("ai"), descending=True).select("vec_id")
    stats = (
        emb.select(F.explode("embedding").alias("v"))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .head()
    )
    lo, hi = float(stats["lo"]), float(stats["hi"])

    d = F.size("embedding")
    offset = (hash60(F.concat_ws("_", F.lit(str(seed)), F.lit("off"), F.col("vec_id"))) % d).cast("int")
    new_val = (
        F.lit(lo)
        + (F.lit(hi) - F.lit(lo))
        * _uniform01(F.lit(str(seed)), F.lit("val"), F.col("vec_id"))
    ).cast("float")
    modified = F.transform(
        "embedding",
        lambda x, i: F.when(
            ((i - F.col("_off") + d) % d) < F.lit(span), F.col("_nv")
        ).otherwise(x),
    )
    return (
        emb.join(targets.withColumn("_hit", F.lit(1)), on="vec_id", how="left")
        .withColumn("_off", offset)
        .withColumn("_nv", new_val)
        .withColumn(
            "embedding",
            F.when(F.col("_hit").isNotNull(), modified).otherwise(F.col("embedding")),
        )
        .drop("_hit", "_off", "_nv")
    )


def gaussian_insertion(
    emb: DataFrame, num_to_insert: int, seed: int = 42, id_offset: int = 10_000_000
) -> DataFrame:
    """P14+SO2 insertion attack (``generate_vector`` +
    ``adaptive_insertion``, ``roubust/roubust.py:185-208``): append
    synthetic rows drawn ~ N(col_mean, col_std) per dimension.

    Per-dim stats come from one posexplode aggregation; the synthetic
    rows are built natively — ``transform`` over the dim sequence with
    Box-Muller gaussians from keyed hashes. New rows get ids above
    ``id_offset`` (the reference loses identity; we keep it explicit).
    """
    d = len(emb.select("embedding").head()[0])
    stats = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("mean"), F.stddev_pop("v").alias("std"))
        .orderBy("dim")
        .collect()
    )
    means = F.array(*[F.lit(float(r["mean"])) for r in stats])
    stds = F.array(*[F.lit(float(r["std"])) for r in stats])

    spark = emb.sparkSession
    new_rows = spark.range(num_to_insert).select(
        (F.col("id") + F.lit(id_offset)).alias("vec_id")
    )

    def gauss(i: Column) -> Column:
        u1 = _uniform01(F.lit(str(seed)), F.lit("g1"), F.col("vec_id"), i)
        u2 = _uniform01(F.lit(str(seed)), F.lit("g2"), F.col("vec_id"), i)
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    embedding = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: (
            F.element_at(means, i + 1) + F.element_at(stds, i + 1) * gauss(i)
        ).cast("float"),
    )
    new_rows = new_rows.withColumn("embedding", embedding)
    base = emb.select("vec_id", "embedding")
    return base.unionByName(new_rows)
