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


def scd2_history(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one
    row per VERSION of each key, with the sequence interval it was
    valid for — the full-history answer to ``apply_changes``'s
    latest-snapshot answer (audit trails, as-of reconstruction,
    training-data lineage). Base rows open version 1 at sequence 0;
    each insert/update opens a new version at its ``seq``; a delete
    closes the current version without opening one.

    Output: (key, version, valid_from_seq, valid_to_seq, is_current,
    *payload) where ``valid_to_seq`` is the next change's sequence
    (NULL while the version is still open), ``version`` numbers a
    key's surviving versions 1..n in sequence order, and
    ``is_current`` flags the live row of keys whose last change was
    not a delete. All interval columns are exact integers, so the
    history replays bit-for-bit cross-engine.

    Scale shape: one union of the (key-projected) base with the change
    log, then two windows over the SAME (key, seq)-ordered partition —
    one shuffle total; at 100 TB the change log is the small side and
    the base arrives bucketed by key, so the union's exchange is the
    only data movement. Same-seq ties break by op priority
    (delete < insert < update) like ``latest_changes``.
    """
    payload = [c for c in base.columns if c != key]
    pri = F.array_position(
        F.array(F.lit("delete"), F.lit("insert"), F.lit("update")), F.col(op)
    )
    versions = base.select(
        F.col(key),
        F.lit(0).cast("long").alias(seq),
        F.lit("insert").alias(op),
        *payload,
    ).unionByName(changes.select(key, seq, op, *payload))
    w = Window.partitionBy(key).orderBy(F.col(seq), pri)
    opened = versions.select(
        key,
        F.col(op).alias("_op"),
        F.col(seq).alias("valid_from_seq"),
        F.lead(seq).over(w).alias("valid_to_seq"),
        *payload,
    ).filter(F.col("_op") != "delete")
    wv = Window.partitionBy(key).orderBy("valid_from_seq")
    return opened.select(
        key,
        F.row_number().over(wv).cast("int").alias("version"),
        "valid_from_seq",
        "valid_to_seq",
        F.col("valid_to_seq").isNull().cast("int").alias("is_current"),
        *payload,
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation (extension): classify every key as
    ``added`` (only in ``b``), ``removed`` (only in ``a``) or
    ``changed`` (present in both, any compared column differs
    null-safely) — the audit run after every MERGE/backfill to prove
    the delta is exactly the intended change log, and the engine half
    of cross-engine migration checks. Unchanged keys are dropped (the
    overwhelming majority at scale, so the output is delta-sized).

    Adds ``changed_mask`` (bit i set ⇔ ``compare_cols[i]`` differs;
    0 for added/removed) and ``n_changed_cols`` — integer-exact and
    order-stable, so the diff itself is hashable. One full-outer join
    shuffled on the key; with both snapshots bucketed by key on disk
    the join is co-located (``bucketed_table``).
    """
    an = a.select(
        *[F.col(k).alias(f"_ak_{k}") for k in key_cols],
        *[F.col(c).alias(f"_a_{c}") for c in compare_cols],
    )
    bn = b.select(
        *[F.col(k).alias(f"_bk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_ak_{k}") == F.col(f"_bk_{k}")
        cond = c if cond is None else (cond & c)
    j = an.join(bn, cond, "full_outer")
    in_a = F.col(f"_ak_{key_cols[0]}").isNotNull()
    in_b = F.col(f"_bk_{key_cols[0]}").isNotNull()
    mask = F.lit(0).cast("long")
    for i, c in enumerate(compare_cols):
        differs = ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
        mask = mask + F.when(in_a & in_b & differs, F.lit(1 << i)).otherwise(0)
    out = (
        j.withColumn(
            "status",
            F.when(~in_a, F.lit("added"))
            .when(~in_b, F.lit("removed"))
            .otherwise(F.lit("changed")),
        )
        .withColumn("changed_mask", mask)
        .filter((~in_a) | (~in_b) | (mask > 0))
        .withColumn("n_changed_cols", F.bit_count("changed_mask").cast("int"))
    )
    keys = [
        F.coalesce(F.col(f"_bk_{k}"), F.col(f"_ak_{k}")).alias(k) for k in key_cols
    ]
    return out.select(*keys, "status", "changed_mask", "n_changed_cols")
