"""Vector distance/similarity expressions (SURVEY P9) — native
higher-order functions, JVM-side, no UDFs.

Reference: ``np.linalg.norm(a - b)`` inline at
``/root/reference/watermarking.py:198``, ``t_vector/e1_steath_vector.py:84``.

Scale notes: these run inside whole-stage codegen; for the kNN
self-join hot path we rank by *squared* distance (monotone in the
true distance) and only take the sqrt on the survivors, saving a
transcendental per candidate pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def squared_euclidean(a: Column | str, b: Column | str) -> Column:
    """Sum of squared per-dim differences, as double.

    Elements are cast to double *before* subtracting — float32
    subtraction rounds differently and would break cross-engine
    reproducibility of rankings (SURVEY §4.2).
    """
    return F.aggregate(
        F.zip_with(
            _c(a).cast("array<double>"),
            _c(b).cast("array<double>"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(squared_euclidean(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(
            _c(a).cast("array<double>"),
            _c(b).cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def oracle_euclidean(a_expr: str, b_expr: str) -> str:
    """DuckDB fragment matching ``euclidean`` exactly: same left-to-right
    accumulation order via list_transform + list_sum... NOTE: DuckDB's
    ``list_sum`` order is sequential, matching Spark's ``aggregate`` fold;
    both operate in float64 after promoting float32 elements exactly."""
    sq = (
        f"list_sum(list_transform(list_zip({a_expr}, {b_expr}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )
    return f"sqrt({sq})"
