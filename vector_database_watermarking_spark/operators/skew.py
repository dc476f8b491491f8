"""Skew-resilient equi-join (scale utility, SURVEY §4 partitioning
notes): explicit key salting for joins whose hot keys AQE cannot
split.

AQE's ``skewJoin`` (enabled in ``session.py``) rebalances sort-merge
join partitions at runtime and covers most skew. It cannot help when
the skewed side feeds an operator pinned to a required distribution
(e.g. a window or aggregation immediately over the join key), or when
a single key's rows exceed one executor's memory on the build side.
``salted_join`` handles those: fact rows scatter across ``n_salt``
sub-keys, the dimension side replicates ``n_salt`` times, and the join
runs on ``(key, salt)`` — the hot key's rows spread over ``n_salt``
tasks at the cost of an ``n_salt``-times-larger (usually tiny)
dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` that stays balanced under
    arbitrary fact-side key skew. Result is identical to
    ``fact.join(dim, on, how)`` for row-level semantics (``inner`` or
    ``left``); the salt is internal and dropped.

    The fact side gets a per-row salt in ``[0, n_salt)`` (from
    ``rand(seed)`` — any salt value yields the same join result, so
    retry nondeterminism cannot change the output), the dim side is
    replicated ``n_salt`` times via an ``explode`` of the salt range,
    and the join key becomes ``(on, salt)``: a key with 10⁹ fact rows
    lands on ``n_salt`` tasks instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f_s = fact.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salt).cast("int")
    )
    d_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return f_s.join(d_s, on=[on, "_salt"], how=how).drop("_salt")
