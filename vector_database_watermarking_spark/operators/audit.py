"""Data-quality / constraint audit (extension — the dbt-test /
Great-Expectations shape expressed as plain aggregates).

The reference trusts its pickles; a 100 TB lakehouse table is fed by
many writers and needs its invariants measured, not assumed. Three
constraint families cover most production checks:

- ``null_violations`` — NOT NULL: one scan, one conditional count per
  column (all map-side; a single pass regardless of column count).
- ``duplicate_keys`` — PRIMARY KEY/uniqueness: rows in excess of one
  per key (``count - countDistinct`` over the NULL-free key tuples;
  one shuffle on the key, partial aggregation map-side; NULL keys are
  excluded, matching UNIQUE-constraint semantics).
- ``orphan_foreign_keys`` — referential integrity: child keys with no
  parent (left-anti join; at scale the parent key set rides a Bloom/
  broadcast runtime filter exactly like ``contamination_scan_bloom``).

Each emits long-format ``(check_name, target, violations)`` rows so audits
compose with ``unionByName`` into one dashboard-ready result; 0 rows
violated means the constraint HOLDS and is still reported (absence of
evidence is made explicit — an audit that silently skips a check is
indistinguishable from a passing one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_violations(df: DataFrame, cols: list[str], table: str) -> DataFrame:
    if not cols:
        raise ValueError("null_violations: cols must name at least one column")
    aggs = [
        F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    parts = [
        wide.select(
            F.lit("not_null").alias("check_name"),
            F.lit(f"{table}.{c}").alias("target"),
            F.col(c).cast("long").alias("violations"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def duplicate_keys(df: DataFrame, key_cols: list[str], table: str) -> DataFrame:
    """Rows in excess of one per key tuple. SQL-style uniqueness: rows
    with a NULL in any key column are excluded (a NULL key equals
    nothing, so it can't collide — matching UNIQUE-constraint
    semantics and the ``count - countDistinct`` formulation, which
    diverge from a raw groupBy exactly on NULL keys)."""
    if not key_cols:
        raise ValueError("duplicate_keys: key_cols must name at least one column")
    nonnull = df
    for c in key_cols:
        nonnull = nonnull.filter(F.col(c).isNotNull())
    excess = nonnull.groupBy(*key_cols).agg(
        (F.count(F.lit(1)) - 1).alias("_x")
    )
    return excess.agg(
        F.coalesce(F.sum("_x"), F.lit(0)).cast("long").alias("violations")
    ).select(
        F.lit("unique").alias("check_name"),
        F.lit(f"{table}({', '.join(key_cols)})").alias("target"),
        "violations",
    )


def orphan_foreign_keys(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    table: str,
    ref_table: str,
) -> DataFrame:
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            on=child_key,
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.select(
        F.lit("foreign_key").alias("check_name"),
        F.lit(f"{table}.{child_key} -> {ref_table}.{parent_key}").alias("target"),
        "violations",
    )
