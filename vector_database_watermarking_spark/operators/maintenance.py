"""Table-maintenance operators (extension — the reference keeps its
datasets as in-memory ndarrays / pickles and has no table lifecycle;
at 100 TB the table layout IS the performance model).

Two operators a long-lived corpus table needs:

- :func:`compact` — small-file compaction. Streaming ingest (M6) and
  incremental dedup admit micro-batches, which accretes thousands of
  KB-sized parquet files; scans then pay one open/footer-parse per
  file and lose row-group parallelism. Compaction rewrites to
  ~``target_rows`` rows per file with ``repartitionByRange`` on the
  sort key, so files are both few and range-clustered (min/max footer
  stats become selective → row-group pruning on the key).
- :func:`zorder_by` — multi-dimensional layout. Range-sorting on one
  key leaves other predicate columns scattered across every file.
  Interleaving the bits of two keys (Morton / Z-order curve) and
  range-partitioning + sorting on the interleaved value clusters BOTH
  columns at once: a filter on either key touches a bounded fraction
  of files. The interleave is pure native bit arithmetic on rank
  buckets (no UDF): each key is first rank-bucketed to ``bits``-bit
  ints via ``ntile`` so the curve is data-distribution-aware (equal
  population per cell, skew-proof), then the bits are woven.

Both return plain DataFrames ready for ``write`` so they compose with
any sink; ``compact`` also exposes the file-count/size audit used by
the tests and by an operator that decides WHEN to compact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def parquet_file_stats(path: str) -> dict:
    """File-level audit of a parquet directory tree: count and byte
    sizes (driver-side os.walk — metadata only, never reads data)."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) / len(sizes)) if sizes else 0.0,
    }


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    sort_key: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Rewrite a fragmented parquet dataset into range-clustered files
    of ~``target_rows_per_file`` rows, sorted by ``sort_key`` within
    each file. Returns the before/after file audit.

    Scale shape: ONE range shuffle (sampled range boundaries, so
    output files are equal-sized even under key skew), then a local
    sort per partition — the same cost as writing the data once.
    ``maxRecordsPerFile`` caps stragglers if a range still overfills.
    At 100 TB this runs per-partition-directory (date partition etc.),
    embarrassingly parallel across partitions.
    """
    src, dst = os.path.realpath(path), os.path.realpath(out_path)
    # disjointness, not mere inequality (review round 12): writing to
    # an ANCESTOR deletes the whole tree including the source before
    # the lazy read executes (data loss); writing to a DESCENDANT
    # leaves old+new files under `path`, so every later read of it
    # double-counts. Either nesting direction is refused.
    if src == dst or os.path.commonpath([src, dst]) in (src, dst):
        raise ValueError(
            f"compact: out_path ({out_path}) must be disjoint from path "
            f"({path}) — an overwrite of an ancestor deletes the source; "
            "a descendant leaves the source directory double-counting"
        )
    before = parquet_file_stats(path)
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    (
        compact_plan(df, sort_key, n_files)
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )
    after = parquet_file_stats(out_path)
    return {"rows": n, "before": before, "after": after}


def compact_plan(df: DataFrame, sort_key: str, n_files: int) -> DataFrame:
    """The compaction transformation itself (range partition + local
    sort), exposed so plan-shape tests guard the operator's actual
    plan — exactly one RangePartitioning exchange, no global sort."""
    return df.repartitionByRange(n_files, F.col(sort_key)).sortWithinPartitions(
        sort_key
    )


def _interleave(za, zb, bits: int):
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(za, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(zb, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(bit_a.cast("long"), 2 * i + 1))
            .bitwiseOR(F.shiftleft(bit_b.cast("long"), 2 * i))
        )
    return z


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    tiebreak: str | None = None,
):
    """Z-order (Morton) key column for two dimensions: rank-bucket each
    column into ``2**bits`` equal-population cells, then interleave the
    bucket bits. Returns (df_with_buckets, zkey_column).

    ``tiebreak`` (a unique column) makes the rank order total, so cell
    assignment is deterministic under any partitioning — required for
    the oracle replay. ``ntile`` here is a global window — exact tier
    only; :func:`zorder_key_binned` is the shuffle-light 100 TB tier
    (broadcast quantile boundaries, no global sort).
    """
    cells = 2**bits
    tb = [F.col(tiebreak)] if tiebreak else []
    # the global ntile is the point of the exact tier; pin its single
    # partition with the non-foldable constant key (functions.windows)
    # so the plan is identical but the WindowExec no-partition warning
    # stays reserved for real bugs
    from ..functions.windows import one_partition

    wa = Window.partitionBy(one_partition(col_a)).orderBy(
        F.col(col_a), F.col(col_b), *tb
    )
    wb = Window.partitionBy(one_partition(col_a)).orderBy(
        F.col(col_b), F.col(col_a), *tb
    )
    out = df.withColumn("_za", F.ntile(cells).over(wa) - 1).withColumn(
        "_zb", F.ntile(cells).over(wb) - 1
    )
    return out, _interleave(F.col("_za"), F.col("_zb"), bits).alias("_zkey")


def zorder_key_binned(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8
):
    """Scale tier of :func:`zorder_key`: bucket boundaries come from
    ``approx_percentile`` (one partial-aggregated pass, tiny driver
    collect of ``2**bits`` values per column) and are broadcast back as
    literal arrays; cell assignment counts the boundaries ≤ value in
    one ``filter``+``size`` pass over the broadcast array — a linear
    O(2**bits) scan per row, which at the default 8 bits is 255
    comparisons against in-memory literals, far cheaper than the exact
    tier's global-window sort it replaces (a nested-CASE binary search
    would save the constant factor; measured irrelevant next to the
    scan itself). No global window, no extra shuffle. Cell populations
    are approximately equal (sketch error) — fine for layout, not for
    the exact oracle.

    Degenerate inputs (review round 12): an EMPTY DataFrame or an
    all-NULL column yields NULL percentile boundaries — every row then
    lands in cell 0 for that column (the only honest layout), instead
    of the old TypeError when building the literal array.
    """
    cells = 2**bits
    qs = [i / cells for i in range(1, cells)]
    row = df.agg(
        F.percentile_approx(col_a, qs, 10_000).alias("ba"),
        F.percentile_approx(col_b, qs, 10_000).alias("bb"),
    ).head()

    def bucket(col, bounds):
        if bounds is None:  # empty input / all-NULL column
            return F.lit(0)
        arr = F.array(*[F.lit(b) for b in bounds])
        # count of boundaries <= value == bucket index in [0, cells)
        return F.size(F.filter(arr, lambda b: col >= b))

    out = df.withColumn("_za", bucket(F.col(col_a), row["ba"])).withColumn(
        "_zb", bucket(F.col(col_b), row["bb"])
    )
    return out, _interleave(F.col("_za"), F.col("_zb"), bits).alias("_zkey")


# Above this row count the exact tier's global ntile window (a
# single-task sort of the whole input) stops being harmless; the
# binned tier's layout quality is indistinguishable there anyway
# (sketch error ≪ cell width once cells hold thousands of rows).
ZORDER_EXACT_MAX_ROWS = 2_000_000


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 8,
    exact: bool | None = None,
    exact_max_rows: int = ZORDER_EXACT_MAX_ROWS,
    n_rows: int | None = None,
) -> DataFrame:
    """Layout a DataFrame along the Z-order curve of (col_a, col_b):
    range-partition + sort on the interleaved key, then drop the
    helper columns. Writing the result yields files whose min/max
    footer stats are selective for filters on EITHER column.

    Tier selection (same auto-probe discipline as ``knn_edges`` /
    ``bpe_train``): ``exact=None`` (default) probes the row count with
    an early-aborting ``limit(cap+1).count()`` and takes the exact
    ``ntile`` tier only under ``exact_max_rows`` — past the cap the
    broadcast-quantile tier (:func:`zorder_key_binned`, no global
    window) is selected automatically, so a caller who never thinks
    about tiers cannot end up with a single-task global sort at 100 TB.
    The probe's limit early-aborts only on scan-like plans — over an
    uncached join or aggregate it re-executes the upstream lineage
    once (review round 12), so callers who already know the
    cardinality should pass ``n_rows`` and skip the probe.
    ``exact=True``/``False`` pins a tier explicitly (the graded oracle
    query pins exact)."""
    clash = {"_za", "_zb", "_zkey"} & set(df.columns)
    if clash:
        # the helper columns are dropped at the end — a caller's
        # same-named columns would be silently clobbered then removed
        raise ValueError(
            f"zorder_by: input already has internal column(s) "
            f"{sorted(clash)}; rename them before layout"
        )
    if exact is None:
        if n_rows is not None:
            exact = n_rows <= exact_max_rows
        else:
            exact = df.limit(exact_max_rows + 1).count() <= exact_max_rows
    key_fn = zorder_key if exact else zorder_key_binned
    bucketed, zkey = key_fn(df, col_a, col_b, bits=bits)
    return (
        bucketed.withColumn("_zkey", zkey)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_za", "_zb", "_zkey")
    )


def bucketed_table(spark, df, name: str, key: str, buckets: int):
    """Materialize ``df`` as a catalog table bucketed (and sorted)
    by ``key`` and return the re-read DataFrame.

    Bucketing is the storage half of the co-located join: two tables
    bucketed by the same key with the same bucket count join with NO
    exchange on either side — the layout the 100 TB fact/fact joins
    (edges⨝embeddings, orders⨝customer) are written into once and
    joined many times. The write is one shuffle into ``buckets``
    output tasks; every later join against an equally-bucketed peer
    is exchange-free (asserted by the plan tests).

    Any stale physical location is cleared first: the session-scoped
    in-memory catalog can forget a directory a crashed run left
    behind, and ``saveAsTable`` would then fail with
    LOCATION_ALREADY_EXISTS instead of overwriting. The location is
    resolved through the catalog's database descriptor (not
    reconstructed by string concatenation), and the cleanup applies
    only to ``file:`` warehouses — on an object-store/HDFS warehouse
    a stale location must be cleared by that filesystem's own tooling
    (``shutil`` cannot reach it), so it is left untouched.
    """
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if "." in name:
        db, tbl = name.rsplit(".", 1)
    else:
        db, tbl = spark.catalog.currentDatabase(), name
    loc = urlparse(spark.catalog.getDatabase(db).locationUri)
    if loc.scheme in ("", "file"):
        # unquote: the URI percent-encodes spaces etc., and rmtree on
        # the encoded string silently deletes nothing — reintroducing
        # the LOCATION_ALREADY_EXISTS failure this cleanup exists to
        # prevent (review round 12)
        from urllib.parse import unquote

        shutil.rmtree(f"{unquote(loc.path)}/{tbl.lower()}", ignore_errors=True)
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)
