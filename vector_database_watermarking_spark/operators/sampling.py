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

from ..functions.hashing import hash60


def stratified_exact_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n_per_group, |stratum|)`` rows per stratum,
    chosen by keyed-hash order (hash of seed + row key, ties by key) —
    a deterministic uniform draw without replacement per group."""
    order = hash60(F.concat(F.lit(f"strat_{seed}_"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )
