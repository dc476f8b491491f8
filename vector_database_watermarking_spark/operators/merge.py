"""MERGE / upsert semantics (north-star extension — SURVEY §2.11).

The reference mutates numpy arrays in place; a Spark corpus is
immutable parquet, so the equivalent capability is the lakehouse
MERGE INTO: apply a change batch (inserts, updates, deletes keyed by
primary key) to a base table in one pass. This is the shape every
production corpus-refresh pipeline runs (new crawl snapshots, GDPR
deletions, quality re-scores) — without it an engine can only ever
append.

Scale shape: one shuffle on the key for the change-batch window and
the same key for the full-outer join, so the join reuses the window's
hash partitioning (no second exchange of the change side). At 100 TB
the base is bucketed by key on disk, making the merge co-located; the
change batch is typically orders of magnitude smaller than the base
and AQE picks the cheap side. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: recognised change operations. "insert" upserts (insert-or-replace)
#: so replayed change logs are idempotent; "delete" of an absent key
#: is a no-op for the same reason.
OPS = ("insert", "update", "delete")


def latest_changes(
    changes: DataFrame, key: str = "doc_id", seq: str = "seq", op: str = "op"
) -> DataFrame:
    """Collapse a change log to its last-wins state per key: the
    highest ``seq`` row wins; ties break deterministically by op order
    delete < insert < update (so a same-seq delete+upsert pair
    resolves to the upsert) and are a data bug upstream should avoid.
    One shuffle on ``key``."""
    pri = F.array_position(
        F.array(F.lit("delete"), F.lit("insert"), F.lit("update")), F.col(op)
    )
    w = Window.partitionBy(key).orderBy(F.col(seq).desc(), pri.desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """MERGE the change batch into ``base``: per key, the latest
    change (by ``seq``) decides — ``delete`` removes the row,
    ``insert``/``update`` replace the payload (insert-or-replace
    upsert); untouched base rows pass through. Payload columns are
    every ``base`` column except ``key``; ``changes`` must carry them
    plus ``seq`` and ``op``.

    Returns the merged table with exactly ``base``'s schema.
    """
    payload = [c for c in base.columns if c != key]
    latest = latest_changes(changes, key=key, seq=seq, op=op).select(
        F.col(key),
        F.col(op).alias("_op"),
        *[F.col(c).alias(f"_new_{c}") for c in payload],
    )
    merged = base.join(latest, on=key, how="full_outer")
    # base-only rows: _op null → keep. Changed rows: delete drops;
    # insert/update take the new payload (also covering change-only
    # keys, where the base side is null).
    merged = merged.filter(F.col("_op").isNull() | (F.col("_op") != "delete"))
    return merged.select(
        key,
        *[
            F.when(F.col("_op").isNull(), F.col(c))
            .otherwise(F.col(f"_new_{c}"))
            .alias(c)
            for c in payload
        ],
    )
