"""Window helpers.

``one_partition``: a constant-valued but NON-FOLDABLE partition key
for windows that legitimately run over a bounded relation (post-limit
rank stamps, |buckets|-row carries). ``Window.partitionBy(F.lit(0))``
does NOT work for this on Spark 4.x — foldable partition expressions
are constant-folded away and ``WindowExec`` still sees an empty
partition spec, logging the no-partition warning (measured; the lit-0
idiom silently reverted). ``pmod(xxhash64(col), 1)`` evaluates to 0
on every row, hashes everything into one partition (identical
semantics to the unpartitioned window), accepts any column type, and
survives the optimizer — so the warning stays reserved for REAL
unbounded unpartitioned windows, which are bugs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def one_partition(*anchor_cols: Column | str) -> Column:
    """Constant-0 partition key the optimizer cannot fold away.
    Pass any column(s) of the relation as the anchor."""
    return F.pmod(F.xxhash64(*anchor_cols), F.lit(1))
