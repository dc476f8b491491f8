"""Temporal join operators (north-star extension — not in the
reference, which has no timestamps at all): as-of join and banded
range join over event streams. Both are operators Spark's DataFrame
API lacks natively; both are built from shuffle-once compositions of
public primitives, no UDFs.

Scale notes (100 TB design point):

- ``asof_join`` is the union+window formulation: ONE shuffle on the
  join key, then a per-key sorted scan — no join operator at all, so
  there is no pair blow-up and no skew amplification; a key's cost is
  linear in its event count. This is the shape pandas' ``merge_asof``
  computes per-partition, expressed relationally.
- ``range_join`` buckets time into band-width intervals and
  equi-joins on (key, bucket): candidate volume is output-bound
  (events actually within one band of each other), never the
  all-pairs product of an inequality-only theta join. AQE splits hot
  (key, bucket) cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: every ``left`` row picks the most recent
    ``right`` row with ``right_ts <= left_ts`` on the same key(s).

    Ties: right rows at exactly ``left_ts`` DO match (at-or-before);
    among right rows sharing a timestamp the one greatest by
    ``tiebreak`` (pass one whenever timestamps can tie — determinism)
    wins. Unmatched left rows keep nulls. ``tolerance_sec`` nulls out
    matches older than the tolerance, like pandas ``merge_asof``.

    Returns all ``left`` columns plus ``<right_ts><suffix>`` (the
    matched row's timestamp) and ``<col><suffix>`` for each of
    ``right_cols`` (default: right's non-key, non-ts columns).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(F.col(right_ts).alias("_mts"), *[F.col(c) for c in right_cols])
    m_type = right.select(payload.alias("_m")).schema["_m"].dataType
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(lstruct.alias("_l")).schema["_l"].dataType
    # keep the tiebreak column's own (orderable) type — a blind numeric
    # cast would silently null out string ids and make tie resolution
    # nondeterministic; left rows never compete on _tb (the _side field
    # already orders them), so a typed NULL is fine there
    if tiebreak:
        tb = F.col(tiebreak)
        tb_type = right.schema[tiebreak].dataType
    else:
        tb = F.lit(0).cast("long")
        tb_type = right.select(tb.alias("_tb")).schema["_tb"].dataType

    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        payload.alias("_m"),
        F.lit(None).cast(l_type).alias("_l"),
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(m_type).alias("_m"),
        lstruct.alias("_l"),
    )
    # right rows sort before left rows at equal _ts (_side 0 < 1), so a
    # running last-non-null over (ts, side, tiebreak) is exactly
    # "latest right at-or-before me"
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        l2.unionByName(r2)
        .withColumn("_matched", F.last("_m", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_sec is not None:
        in_tol = (
            F.col("_ts").cast("double") - F.col("_matched._mts").cast("double")
        ) <= F.lit(float(tolerance_sec))
        out = out.withColumn("_matched", F.when(in_tol, F.col("_matched")))
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        F.col("_matched._mts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_matched.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: float = -600.0,
    upper_sec: float = 0.0,
    suffix: str = "_right",
) -> DataFrame:
    """Banded interval join: pairs every ``left`` row with the
    ``right`` rows of the same key(s) whose timestamp lies in
    ``[left_ts + lower_sec, left_ts + upper_sec)`` (half-open, so
    ``upper_sec = 0`` means "strictly before").

    Plan: both sides bucket time into band-width intervals
    (``upper_sec - lower_sec``); the left emits the (at most two)
    buckets its window overlaps, then an equi-join on (key, bucket)
    plus the exact range predicate. Candidates are bounded by rows
    within one band of each other — output-bound, never all-pairs.

    Returns left columns + right's timestamp and non-key columns,
    suffixed; inner-join semantics (left rows with no match vanish —
    wrap in a left join on the aggregate, as ``rel_range_activity``
    does, when zero-counts matter).
    """
    band = float(upper_sec - lower_sec)
    if band <= 0:
        raise ValueError("upper_sec must exceed lower_sec")
    l_epoch = F.col(left_ts).cast("double")
    r_epoch = F.col(right_ts).cast("double")
    lo = l_epoch + F.lit(float(lower_sec))
    hi = l_epoch + F.lit(float(upper_sec))
    l_buckets = F.array_distinct(
        F.array(
            F.floor(lo / F.lit(band)).cast("long"),
            F.floor(hi / F.lit(band)).cast("long"),
        )
    )
    lb = left.withColumn("_bucket", F.explode(l_buckets))
    rb = right.select(
        *on,
        F.floor(r_epoch / F.lit(band)).cast("long").alias("_bucket"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in on and c != right_ts
        ],
    )
    r_matched = F.col(f"{right_ts}{suffix}").cast("double")
    return (
        lb.join(rb, on=[*on, "_bucket"])
        .filter((r_matched >= lo) & (r_matched < hi))
        .drop("_bucket")
    )


def calendar_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key calendar densification with activity recency — the
    time-series resample/gap-fill shape (fill every calendar day
    between a key's first and last activity, flag inactive days, and
    carry the days-since-last-activity counter forward). Feeds churn
    features, SLA dashboards, and any daily-grid model input where
    missing days must be explicit rows, not absent ones.

    Output: (key, day, is_active, days_since_active) — all
    integer/date, so the result is exactly replayable by any engine.

    Scale shape: the grid comes from ``sequence()`` exploded per key —
    bounded by each key's own day span, never a global calendar cross
    join; the active-day relation aggregates map-side before its one
    shuffle; the forward-fill is a per-key ordered window (a key's
    cost is linear in its span, AQE handles skewed long-lived keys).
    """
    day = F.to_date(ts_col)
    active = events.select(
        F.col(key_col).alias("key"), day.alias("day")
    ).distinct()
    bounds = active.groupBy("key").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "key", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    g = grid.join(
        active.withColumn("_hit", F.lit(1)), on=["key", "day"], how="left"
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_seen = F.last(
        F.when(F.col("_hit").isNotNull(), F.col("day")), ignorenulls=True
    ).over(w)
    return g.select(
        F.col("key").alias(key_col),
        "day",
        F.coalesce("_hit", F.lit(0)).cast("int").alias("is_active"),
        F.datediff(F.col("day"), last_seen).cast("int").alias(
            "days_since_active"
        ),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-key event
    sequences: for each key's events ordered by (ts, tiebreak), count
    every adjacent (from_type → to_type) step and attach the from-state
    marginal — the behavioral-model shape behind next-action
    prediction, anomaly scoring (improbable transitions), and funnel
    drop-off diagnostics. The explicit tiebreak makes same-timestamp
    orderings deterministic, so counts replay exactly cross-engine.

    Scale shape: one shuffle to order each key's events (lead window),
    then a partial-aggregated count into a (|types|²)-sized relation;
    the from-state marginal is a window over that tiny aggregate —
    nothing global touches the event stream itself."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wf = Window.partitionBy("from_type")
    return steps.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.sum("n_transitions").over(wf).alias("from_total"),
    )


def trailing_spikes(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    trail: int = 7,
    min_trail: int = 3,
    sigmas: int = 3,
) -> DataFrame:
    """Per-key daily-count anomaly flags against a trailing baseline —
    the alerting shape (traffic spikes, ingestion anomalies, abuse
    bursts): a day is a spike when its count exceeds the trailing
    ``trail``-day mean by more than ``sigmas`` standard deviations.

    The test runs entirely in int64: with n trailing days summing to
    S with squared sum Q, "x > mean + k·σ" is equivalent to
    n·x − S > 0 AND (n·x − S)² > k²·(n·Q − S²) — both sides exact
    integers, so the flag can never flip on float summation order or
    engine libm differences. Days with fewer than ``min_trail``
    trailing observations are never flagged (no baseline).

    Output: (key, day, n_events, n_trail, sum_trail, is_spike) — the
    trailing stats ship so downstream alerting can re-threshold
    without recomputation.

    Scale shape: one partial-agg shuffle to daily counts (a
    |keys|×|days| relation — tiny relative to the event stream), then
    one per-key ordered window over that aggregate. The current day is
    EXCLUDED from its own baseline (ROWS ... 1 PRECEDING), the
    textbook leak-avoidance.
    """
    daily = (
        events.select(
            F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-trail, -1)
    )
    d = daily.select(
        "key",
        "day",
        "n_events",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).alias("n_trail"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("sum_trail"),
        F.coalesce(
            F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)
        ).alias("_sq_trail"),
    )
    n, x, s, q = (
        F.col("n_trail"),
        F.col("n_events"),
        F.col("sum_trail"),
        F.col("_sq_trail"),
    )
    dev = n * x - s
    spike = (
        (n >= min_trail)
        & (dev > 0)
        & (dev * dev > F.lit(sigmas * sigmas) * (n * q - s * s))
    )
    return d.select(
        "key",
        "day",
        "n_events",
        "n_trail",
        "sum_trail",
        spike.cast("int").alias("is_spike"),
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling distinct actives — DAU/WAU/stickiness, the
    product-analytics metric a windowed aggregation CANNOT compute
    (COUNT DISTINCT is not additive across days, so no rolling-sum
    trick works): for every day with activity, the number of distinct
    keys active in the trailing ``window_days`` days and on the day
    itself.

    Plan: the distinct (key, day) relation fans out to the ≤
    ``window_days`` report days it contributes to (explode of a
    day-offset sequence — the standard exact formulation), then one
    distinct-count aggregation per report day; report days without
    their own activity are dropped (semi-join against the observed
    day set). Fan-out is window_days × |distinct key-days| — bounded,
    never events × days. Output: (day, wau, dau), all integers.
    """
    day = F.to_date(ts_col)
    a = events.select(F.col(key_col).alias("_k"), day.alias("_d")).distinct()
    g = a.select(
        "_k",
        "_d",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("_off"),
    ).select("_k", "_d", F.date_add("_d", F.col("_off")).alias("day"))
    days = a.select(F.col("_d").alias("day")).distinct()
    return (
        g.join(days, on="day", how="left_semi")
        .groupBy("day")
        .agg(
            F.countDistinct("_k").alias("wau"),
            F.countDistinct(
                F.when(F.col("_d") == F.col("day"), F.col("_k"))
            ).alias("dau"),
        )
    )


def ewma_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with α = 1/2 —
    the smoothed per-user signal (latency, spend, engagement) behind
    rate limiting and trend features. Returns one row per key:
    ``n_events`` and the final EWMA over the time-ordered values as
    ``ewma`` plus an integer micro-bucket ``ewma_e6``.

    The recurrence ``e' = (e + x) / 2`` (seeded with the first value)
    is inherently sequential per key, so it cannot be a partial
    aggregate; instead each key's values are gathered with
    ``collect_list`` and folded with the native ``aggregate`` HOF —
    ONE shuffle on the key, fold cost linear in the key's history.
    Per-key state is the value list: bounded by per-key event counts
    (cap histories upstream for adversarially hot keys — the same
    discipline as sessionize). α = 1/2 halves exactly, and every fold
    step is one IEEE-754 double add + one exact halving executed in a
    deterministic order, so the result is bit-reproducible and
    replayable by any engine that folds the same order (DuckDB
    ``list_reduce`` in the oracle).
    """
    pair = F.struct(
        F.col(ts_col).alias("t"),
        F.col(order_tiebreak).alias("k"),
        F.col(value_col).cast("double").alias("v"),
    )
    vals = F.expr("transform(array_sort(_pairs), p -> p.v)")
    fold = F.aggregate(
        F.expr("slice(_vals, 2, size(_vals) - 1)"),
        F.element_at(F.col("_vals"), 1),
        lambda acc, x: (acc + x) / F.lit(2.0),
    )
    return (
        df.select(F.col(key_col), pair.alias("_pairs"))
        .groupBy(key_col)
        .agg(F.collect_list("_pairs").alias("_pairs"))
        .withColumn("_vals", vals)
        .select(
            F.col(key_col),
            F.size("_vals").cast("long").alias("n_events"),
            fold.alias("ewma"),
        )
        .withColumn("ewma_e6", F.floor(F.col("ewma") * 1000000 + F.lit(0.5)).cast("long"))
    )


def running_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Sweep-line concurrency over closed intervals: every interval
    boundary becomes a ±1 delta and the running sum at each boundary
    is the number of intervals active there — concurrent sessions,
    simultaneous connections, peak room occupancy. Returns
    ``(ts, delta, concurrency)`` per boundary.

    A running sum is the textbook "needs one global sort" shape; this
    is the DISTRIBUTED PREFIX SUM instead: boundaries are bucketed by
    ``date_trunc(bucket)``, each bucket computes its local prefix sum
    in parallel (window partitioned BY bucket), and the cross-bucket
    carry is a running total over the per-bucket deltas — a window
    over |buckets| rows (time-range-bounded: one row per hour, never
    one per event), broadcast back. Identical to the single-sort
    answer because bucketing by time truncation respects the sweep
    order.

    Tie rule: at an equal timestamp, starts apply before ends
    (``delta`` descending) — the closed-interval convention, so a
    session ending exactly when another starts counts both as
    concurrent and a single-point interval never dips the count.
    Per-boundary values among identical ``(ts, delta)`` rows are
    permutation-dependent, but any aggregate of them (max/min per
    group) is deterministic.
    """
    starts = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    )
    ends = intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"))
    d = starts.unionByName(ends).withColumn("_b", F.date_trunc(bucket, "ts"))
    w_local = (
        Window.partitionBy("_b")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = d.groupBy("_b").agg(F.sum("delta").alias("_t"))
    # |buckets|-row relation: pin the single partition with a
    # non-foldable key (functions.windows) rather than emit the
    # no-partition warning
    from ..functions.windows import one_partition

    w_carry = Window.partitionBy(one_partition("_b")).orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = totals.select(
        "_b", F.coalesce(F.sum("_t").over(w_carry), F.lit(0)).alias("_carry")
    )
    return (
        d.withColumn("_within", F.sum("delta").over(w_local))
        .join(F.broadcast(carry), "_b")
        .select(
            "ts",
            "delta",
            (F.col("_carry") + F.col("_within")).cast("long").alias("concurrency"),
        )
    )


def rolling_active_users_bitmap(
    events: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Bitmap tier of :func:`rolling_active_users` — same exact
    (day, wau, dau) answer, radically less shuffle at scale: instead
    of fanning out (key, day) PAIRS and re-distinct-counting each
    report day, keys are packed 64-per-row into int64 blocks
    (``block = key div 64``, bit ``key mod 64``) with a ``bit_or``
    aggregate; the day-offset fan-out then moves |blocks| rows per
    day (one row per 64 users instead of per user), the per-report-
    day union is another ``bit_or``, and the distinct count is
    ``Σ bit_count(block)`` — exact, not a sketch. With 10⁹ users a
    day, the fan-out shrinks from 7 × 10⁹ rows to 7 × 1.6 × 10⁷.
    This is the roaring-bitmap pattern expressed in pure relational
    ops (fixed 64-bit chunks instead of adaptive containers).

    Requires non-negative integral keys (the block/bit split);
    re-key via a dense id first otherwise.
    """
    day = F.to_date(ts_col)
    one = F.lit(1).cast("long")
    # daily feeds the window fan-out AND the observed-days semi-join
    # side — materialize the compressed (day, block, bits) relation
    # once instead of re-aggregating the raw event feed per consumer
    daily = (
        events.select(
            day.alias("_d"),
            F.expr(f"{key_col} div 64").alias("_blk"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({key_col}, 64) AS INT))"
            ).alias("_m"),
        )
        .groupBy("_d", "_blk")
        .agg(F.bit_or("_m").alias("bits"))
        .localCheckpoint(eager=True)
    )
    g = daily.select(
        "_d",
        "_blk",
        "bits",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("_off"),
    ).select("_d", "_blk", "bits", F.date_add("_d", F.col("_off")).alias("day"))
    days = daily.select(F.col("_d").alias("day")).distinct()
    merged = (
        g.join(days, on="day", how="left_semi")
        .groupBy("day", "_blk")
        .agg(
            F.bit_or("bits").alias("_w"),
            F.bit_or(
                F.when(F.col("_d") == F.col("day"), F.col("bits")).otherwise(one * 0)
            ).alias("_t"),
        )
    )
    return merged.groupBy("day").agg(
        F.sum(F.bit_count("_w")).alias("wau"),
        F.sum(F.bit_count("_t")).alias("dau"),
    )


def interval_union(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union of closed intervals (gaps-and-islands over TIME,
    not rows): overlapping or touching intervals merge into maximal
    islands — coverage windows, total on-time, SLA clocks. Returns
    ``(key, island_id, union_start, union_end, n_intervals)``.

    The classic formulation: order each key's intervals by (start,
    end); an interval opens a new island iff its start lies strictly
    past the RUNNING MAX of all earlier ends (the running max — not
    ``lag(end)`` — is what makes an interval swallowed entirely by an
    earlier one stay in the same island); islands are then a running
    count of opens. One shuffle on the key, two frames over the same
    sort — per-key linear, no joins, the same single-pass discipline
    as ``duplicate_spans``'s islands merge but over timestamps.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        intervals.withColumn("island_id", island.cast("long"))
        .groupBy(key_col, "island_id")
        .agg(
            F.min(start_col).alias("union_start"),
            F.max(end_col).alias("union_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    value_scale: int = 100,
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation's value
    holds until the NEXT observation, so the mean weights every value
    by its holding duration — the metric that makes irregularly-sampled
    feeds (sensor readings, price ticks, utilization gauges)
    comparable, where a plain ``avg`` over-counts bursts.

    Exact integer formulation (SURVEY §4.2 cross-engine bar): values
    bucket to ``value_scale`` units once (``floor(v·scale + 0.5)`` —
    deterministic on the shared parquet doubles; pick the scale that
    makes the data integral, e.g. 100 for cent-valued feeds),
    durations are exact microsecond deltas from ``lead()``, and the
    output carries the two BIGINT sums (``num_scaled_us = Σ
    value_scaled · dt_us``, ``dur_us = Σ dt_us``) plus their integer
    quotient ``twap_scaled`` (``div`` truncation; values are
    non-negative so truncation == floor on both engines). Overflow
    envelope: ``value_scale · max(value) · key_time_span_us`` must fit
    int64 — at scale 100 that is a ~$10M-valued signal held for ~250
    years; ANSI mode surfaces a violation as an explicit error, never
    a silent wrap. The last observation per key has no successor and
    contributes no duration — the standard left-closed TWAP
    convention. Keys with a single observation (zero total duration)
    are emitted with ``twap_scaled`` null rather than dividing by
    zero.

    Scale shape: ONE shuffle on the key for the lead window; the
    aggregate is map-side partial on the same partitioning. With
    duplicate timestamps the ``tiebreak_col`` ordering pins which
    value absorbs the tie-to-next duration deterministically (the tied
    rows themselves span zero time).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    dt = F.lead(us).over(w) - us
    v_scaled = F.floor(
        F.col(value_col) * F.lit(int(value_scale)) + F.lit(0.5)
    ).cast("long")
    per = events.select(
        F.col(key_col), dt.alias("_dt"), v_scaled.alias("_v")
    ).filter(F.col("_dt").isNotNull())
    out = (
        events.select(key_col)
        .distinct()
        .join(
            per.groupBy(key_col).agg(
                F.sum(F.col("_v") * F.col("_dt")).alias("num_scaled_us"),
                F.sum("_dt").alias("dur_us"),
                F.count(F.lit(1)).alias("n_holds"),
            ),
            on=key_col,
            how="left",
        )
    )
    return out.select(
        key_col,
        F.coalesce(F.col("n_holds"), F.lit(0)).cast("long").alias("n_holds"),
        F.coalesce(F.col("num_scaled_us"), F.lit(0))
        .cast("long")
        .alias("num_scaled_us"),
        F.coalesce(F.col("dur_us"), F.lit(0)).cast("long").alias("dur_us"),
        F.when(
            F.col("dur_us") > 0, F.expr("num_scaled_us div dur_us")
        ).alias("twap_scaled"),
    )
