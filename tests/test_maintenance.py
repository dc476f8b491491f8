"""Table-maintenance operators: small-file compaction and Z-order
layout (operators/maintenance.py)."""

import pyspark.sql.functions as F
import pytest

from vector_database_watermarking_spark.operators import maintenance
from vector_database_watermarking_spark.sources.tables import load_table


def _per_file_ranges(spark, path, col):
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), F.col(col).alias("v")
    )
    return {
        r["f"]: (r["lo"], r["hi"])
        for r in df.groupBy("f")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }


def test_compact_defragments_and_range_clusters(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    assert maintenance.parquet_file_stats(frag)["n_files"] == 64

    out = str(tmp_path / "compacted")
    n = ev.count()
    audit = maintenance.compact(
        spark, frag, out, sort_key="event_id", target_rows_per_file=(n + 3) // 4
    )
    assert audit["rows"] == n
    assert audit["after"]["n_files"] <= 5  # range boundaries are sampled
    assert audit["after"]["n_files"] < audit["before"]["n_files"]
    assert audit["after"]["avg_bytes"] > audit["before"]["avg_bytes"]

    # nothing lost, nothing duplicated
    a = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    b = sorted(r["event_id"] for r in ev.collect())
    assert a == b

    # files are range-clustered on the sort key: per-file [min,max]
    # intervals are disjoint, so footer stats prune key predicates
    ranges = sorted(_per_file_ranges(spark, out, "event_id").values())
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


@pytest.mark.parametrize("bits", [3])
def test_zorder_bounds_file_span_on_both_dims(spark, bits):
    # 64x64 grid; 16 files. A y-sorted layout leaves x full-span in
    # every file; the Z-order layout bounds the span of BOTH columns.
    side, n_files = 64, 16
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        zpath, ypath = f"{d}/z", f"{d}/y"
        maintenance.zorder_by(grid, "x", "y", n_files=n_files, bits=bits).write.parquet(
            zpath
        )
        grid.repartitionByRange(n_files, "y").sortWithinPartitions("y").write.parquet(
            ypath
        )

        def max_span(path, col):
            return max(
                hi - lo for lo, hi in _per_file_ranges(spark, path, col).values()
            )

        # y-only layout: x is unclustered (full span) in every file
        assert max_span(ypath, "x") == side - 1
        # Z-order: both dims bounded well below full span → a filter on
        # either column prunes most files by footer min/max
        assert max_span(zpath, "x") <= side // 2
        assert max_span(zpath, "y") <= side // 2

        # layout rewrites preserve the data exactly
        assert spark.read.parquet(zpath).count() == side * side
        got = {
            (r["x"], r["y"]) for r in spark.read.parquet(zpath).collect()
        }
        assert len(got) == side * side


def test_zorder_auto_tier_picks_binned_past_cap(spark):
    """Default (exact=None) tier selection: under the cap the exact
    ntile tier runs; past the cap the plan must contain NO global
    ntile window — the scale tier engages without any caller flag."""
    side = 64
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    small = maintenance.zorder_by(grid, "x", "y", n_files=4, bits=3)
    assert "ntile" in small._jdf.queryExecution().executedPlan().toString().lower()
    big = maintenance.zorder_by(
        grid, "x", "y", n_files=4, bits=3, exact_max_rows=100
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower(), plan
    # both tiers preserve the data exactly
    assert big.count() == side * side


def test_zorder_binned_tier_bounds_spans_without_global_window(spark):
    """The broadcast-quantile tier must produce the same layout
    property (bounded per-file span on both dims) with NO global
    ntile window in its plan."""
    import tempfile

    side, n_files = 64, 16
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    laid = maintenance.zorder_by(grid, "x", "y", n_files=n_files, bits=3, exact=False)
    plan = laid._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower(), plan

    with tempfile.TemporaryDirectory() as d:
        laid.write.parquet(f"{d}/z")
        # The Morton guarantee is aggregate, not per-file: files that
        # straddle a major curve boundary legitimately span a full dim
        # (the sketch-approximate buckets shift range splits off block
        # alignment, so 1-2 straddlers appear). Pruning power = most
        # files tightly bounded + low average span on BOTH dims.
        for col in ("x", "y"):
            spans = [
                hi - lo
                for lo, hi in _per_file_ranges(spark, f"{d}/z", col).values()
            ]
            assert sum(spans) / len(spans) <= 0.55 * side, (col, spans)
            wide = sum(1 for s in spans if s > (3 * side) // 4)
            assert wide <= 2, (col, spans)
        assert spark.read.parquet(f"{d}/z").count() == side * side


def test_compact_refuses_nested_paths(spark, tmp_path):
    """Review round 12: an out_path that is an ANCESTOR of path would
    delete the source tree on overwrite (data loss); a DESCENDANT
    leaves old+new files double-counting under path. Both nesting
    directions are refused before any write."""
    import pytest

    from vector_database_watermarking_spark.operators.maintenance import compact

    src = str(tmp_path / "tbl" / "2024")
    spark.range(10).selectExpr("id AS k").write.parquet(src)
    with pytest.raises(ValueError, match="disjoint"):
        compact(spark, src, str(tmp_path / "tbl"), "k")  # ancestor
    with pytest.raises(ValueError, match="disjoint"):
        compact(spark, src, str(tmp_path / "tbl" / "2024" / "c"), "k")
    with pytest.raises(ValueError, match="disjoint"):
        compact(spark, src, src, "k")  # identity
    # the source is untouched after every refusal
    assert spark.read.parquet(src).count() == 10


def test_zorder_binned_degenerate_inputs(spark):
    """Review round 12: NULL percentile boundaries (empty input or an
    all-NULL column) must yield cell 0, not a TypeError building the
    literal array — and the internal-column clash is refused by name."""
    import pytest
    from pyspark.sql import functions as F

    from vector_database_watermarking_spark.operators.maintenance import (
        zorder_by,
    )

    empty = spark.createDataFrame([], "x double, y double")
    assert zorder_by(empty, "x", "y", n_files=2, exact=False).count() == 0

    nullcol = spark.range(8).select(
        F.lit(None).cast("double").alias("x"), F.col("id").cast("double").alias("y")
    )
    out = zorder_by(nullcol, "x", "y", n_files=2, exact=False)
    assert out.count() == 8  # all rows land in x-cell 0, laid out by y

    clash = spark.range(4).select(F.col("id").alias("_zkey"), F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError, match="_zkey"):
        zorder_by(clash, "x", "y", n_files=2, exact=True)
