"""Deterministic sampling operators (north-star extension): exact-n
stratified sampling for training-data balancing.

The reference's only sampling is W6 exact-n uniform deletion
(``random_select_vectors``, ``/root/reference/watermarking.py:152-165``
— mirrored by ``operators.attacks``); this generalizes the same
keyed-hash-order idiom to per-stratum quotas, the shape a pretraining
pipeline uses to balance sources/languages.

Scale notes: one shuffle on the stratum key; the per-stratum rank is a
window over that partitioning (WindowGroupLimit pushes the quota
map-side in Spark 3.5+/4.x, so oversized strata never materialize
their tail). Randomness is a pure function of (seed, row key) —
partitioning-invariant, replayable cross-engine, stable under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash_mod


def stratified_exact_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int | dict[str, int],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(quota, |stratum|)`` rows per stratum, chosen by
    keyed-hash order (hash of seed + row key, ties by key) — a
    deterministic uniform draw without replacement per group.

    ``n_per_group`` is either one quota for every stratum or a
    ``{stratum: quota}`` map (dataset-mixing / domain-reweighting
    shape: down-sample over-represented sources to target ratios).
    Strata absent from the map get quota 0 (dropped) — an explicit
    mixing recipe, not a passthrough."""
    order = hash60(F.concat(F.lit(f"strat_{seed}_"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    if isinstance(n_per_group, dict):
        # small literal CASE map: stays in codegen, no join needed. The
        # extra literal bound (max quota) keeps the WindowGroupLimit
        # rewrite applicable, so the per-group top-N is still taken
        # map-side and oversized strata never materialize their tail.
        quota = F.lit(0)
        for stratum, n in n_per_group.items():
            quota = F.when(F.col(group_col) == stratum, F.lit(n)).otherwise(quota)
        bound = F.col("_rn") <= max(n_per_group.values(), default=0)
    else:
        quota = F.lit(n_per_group)
        bound = F.col("_rn") <= n_per_group
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(bound & (F.col("_rn") <= quota))
        .drop("_rn")
    )


def weighted_exact_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n, |df|)`` rows drawn without replacement with
    probability proportional to ``weight_col`` (must be > 0) — the
    Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 2006): each
    row gets key ``ln(u) / w`` for a per-row uniform ``u``, and the
    top-n keys are the sample. ``u`` is a pure function of
    (seed, row key), so the draw is deterministic,
    partitioning-invariant, and replayable cross-engine.

    The top-n is a TakeOrdered (per-partition heads + driver merge of
    n-row heaps), never a full sort — scale-safe at any corpus size.
    Temperature-style upweighting of high-quality sources is this
    operator with ``w = quality**(1/T)``.
    """
    u = (
        hash60(F.concat(F.lit(f"wsamp_{seed}_"), F.col(key_col).cast("string"))) + 1
    ) / F.lit(float(1 << 60))
    k = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_k", k)
        .orderBy(F.col("_k").desc(), F.col(key_col))
        .limit(n)
        .drop("_k")
    )


def rebalance_classes(
    df: DataFrame,
    class_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exact oversampling to class balance: every class is replicated
    up to the size of the LARGEST class (the classic minority-class
    rebalance for skewed training labels/languages/sources).

    A class with ``c`` rows and target ``m = max_class_count`` emits
    ``m // c`` copies of every row plus one extra copy of the
    ``m % c`` rows with the smallest keyed hash (ties by key) — so
    every class lands on exactly ``m`` rows and the choice of which
    rows repeat is deterministic, partitioning-invariant, and
    SQL-replayable (same keyed-hash-order idiom as
    :func:`stratified_exact_sample`).

    Output = input columns + ``copies`` + ``copy_idx`` (1-based copy
    number, so downstream shuffles can tell replicas apart).

    Scale shape: one tiny class-count aggregate (broadcast back), one
    shuffle on the class key for the within-class hash rank, then a
    row-local ``explode(sequence(1, copies))`` — output-bound, no
    global sort. The rank is needed for every row (all rows keep at
    least ``m // c`` copies), so WindowGroupLimit pruning does not
    apply; the per-class sort is the price of exact quotas.
    """
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("_c"))
    m = counts.agg(F.max("_c").alias("m")).collect()[0]["m"]
    order = hash60(F.concat(F.lit(f"rb_{seed}_"), F.col(key_col).cast("string")))
    w = Window.partitionBy(class_col).orderBy(order, F.col(key_col))
    base = F.expr(f"CAST({int(m)} AS BIGINT) div _c")
    extra = F.lit(int(m)) % F.col("_c")
    return (
        df.join(F.broadcast(counts), class_col)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "copies",
            (base + (F.col("_rk") <= extra).cast("long")).cast("long"),
        )
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1).cast("long"), F.col("copies"))))
        .drop("_c", "_rk")
    )


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_count_col,
    weights_e6: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Static dataset-mixture plan (extension): given per-source
    available token counts, target mixture ``weights_e6`` (integer
    1e-6 parts), and a total token ``budget``, emit per source the
    target token count, the number of epochs (full passes) needed,
    and the sampling rate in e6 units — the planning aggregate behind
    Pile/DoReMi-style weighted mixing, where under-represented sources
    repeat (rate > 1e6) and over-represented ones are subsampled
    (rate < 1e6). Sources absent from the map get weight 0 (an
    explicit recipe, same contract as ``stratified_exact_sample``).

    All-integer arithmetic (``div`` + ceiling-division identity), so
    the plan is engine-exact at any scale; the input scan is one
    group-aggregate over the corpus, the plan itself is |sources|
    rows. Feed the ``rate_e6`` column to ``weighted_exact_sample`` /
    ``rebalance_classes`` to execute the plan.
    """
    w = F.lit(0)
    for src, pw in weights_e6.items():
        w = F.when(F.col(source_col) == src, F.lit(int(pw))).otherwise(w)
    avail = df.groupBy(source_col).agg(
        F.sum(token_count_col).cast("long").alias("available_tokens")
    )
    b = int(budget_tokens)
    return (
        avail.withColumn("weight_e6", w.cast("long"))
        .withColumn(
            "target_tokens", F.expr(f"CAST({b} AS BIGINT) * weight_e6 div 1000000")
        )
        .withColumn(
            "epochs",
            F.when(F.col("target_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(
                    "(target_tokens + available_tokens - 1) div available_tokens"
                )
            ),
        )
        .withColumn(
            "rate_e6",
            F.when(F.col("target_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("target_tokens * 1000000 div available_tokens")
            ),
        )
    )


def mixture_execute(
    df: DataFrame,
    plan: DataFrame,
    source_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Execute a :func:`mixture_plan`: every row is emitted
    ``rate_e6 div 1e6`` times plus one more with probability
    ``(rate_e6 mod 1e6) / 1e6`` — Bernoulli on the fractional part,
    derived from the keyed hash, so rate > 1e6 repeats (epochs) and
    rate < 1e6 subsamples, and the expected per-source token count is
    exactly the plan's target. Output = input columns + ``copy_idx``.

    Deterministic and partitioning-invariant (hash of seed + row key
    decides the fractional draw); the plan joins in as a broadcast
    (|sources| rows); the explode is output-bound. The same replicate-
    by-sequence idiom as :func:`rebalance_classes`, driven by a rate
    instead of a class quota.
    """
    u = hash_mod(
        F.concat(F.lit(f"mix_{seed}_"), F.col(key_col).cast("string")), 1000000
    )
    rates = plan.select(source_col, "rate_e6")
    copies = F.expr("rate_e6 div 1000000") + (
        u < F.col("rate_e6") % 1000000
    ).cast("long")
    return (
        df.join(F.broadcast(rates), source_col)
        .withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies"))),
        )
        .drop("rate_e6", "_copies")
    )
