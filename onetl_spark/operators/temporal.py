"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are built from shuffle-friendly compositions of stock DataFrame ops
(SURVEY build-plan rule: composition first, Pandas UDF only if semantics
demand it):

- ``asof_join`` uses the union-and-carry-forward trick: tag both inputs,
  union them, and for each right row compute the ``last`` left row earlier
  than it with a window ordered by time within the join keys. One shuffle
  on (keys), no per-row range probes, no cross join — this is how as-of
  joins are done at 100 TB (the sort is the shuffle's sort, amortized).
- ``range_join`` buckets time into ``bucket_width`` intervals and joins on
  bucket equality (left row joins buckets floor(lo/w)..floor(hi/w)) before
  applying the exact range predicate — turning an inequality join (which
  Spark would execute as a broadcast nested loop) into an equi-join +
  filter with bounded fan-out.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: str | int | float | None = None,
    allow_single_partition: bool = False,
) -> DataFrame:
    """For each LEFT row, attach the most recent RIGHT row with
    ``right.on <= left.on`` (direction='backward'; 'forward' gives the
    next ``right.on >= left.on``; 'nearest' picks whichever of the two
    is closer, ties to backward — full pandas ``merge_asof`` surface),
    optionally matching ``by`` keys.

    ``tolerance`` (pandas ``merge_asof`` semantics) rejects a match
    farther than the given distance — the right columns become NULL, a
    nearer row is never substituted. Pass a SQL interval string (e.g.
    ``"2 hours"``) for timestamp/date ``on`` columns, or a number for
    numeric ones. A pure post-projection: zero extra shuffles.

    Cost: one union + one partitioned window sort ('nearest' evaluates
    two window passes over the same hash partitioning — one extra sort,
    no extra exchange).

    Returns all left columns plus every non-key right column suffixed.

    ``by=()`` raises unless ``allow_single_partition=True``: without keys
    the window sort runs in a single task, which is only acceptable for
    deliberately small inputs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    by = list(by)
    if not by:
        # the carry-forward window partitions on `by`; with no keys the
        # ENTIRE union lands in one window partition — a single-task sort
        # at scale. A silent warn-and-proceed is how a driver-side
        # bottleneck ships, so this is a hard error unless the caller
        # explicitly accepts the plan (same spirit as the Greenplum
        # connection-count guard, which also warns-then-raises).
        if not allow_single_partition:
            raise ValueError(
                "asof_join with by=() puts the whole dataset in one window "
                "partition — a single-task sort at scale. Pass entity keys "
                "in `by` (e.g. user/device id) for a distributed plan, or "
                "opt in with allow_single_partition=True for small inputs.",
            )
        import warnings

        warnings.warn(
            "asof_join with by=() and allow_single_partition=True: the "
            "whole dataset sorts in one window partition — fine for small "
            "inputs only.",
            stacklevel=2,
        )

    right_cols = [c for c in right.columns if c != on and c not in by]
    renamed = right
    for c in right_cols:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    right_value_cols = [c + suffix for c in right_cols]

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(f"{on}{suffix}", F.lit(None).cast(right.schema[on].dataType))
    r_tagged = (
        renamed.withColumn("_side", F.lit(0))
        .withColumn(f"{on}{suffix}", F.col(on))
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_value_cols:
        if c not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None).cast(renamed.schema[c].dataType))

    all_cols = left.columns + [f"{on}{suffix}"] + right_value_cols + ["_side"]
    unioned = l_tagged.select(*all_cols).unionByName(r_tagged.select(*all_cols))

    carry_cols = [f"{on}{suffix}", *right_value_cols]
    # right rows sort before left rows at equal time → carry forward
    w_back = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        carried = unioned.select(
            *left.columns,
            F.col("_side"),
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry_cols],
        )
        out = carried.filter(F.col("_side") == 1).drop("_side")
    else:
        # nearest: both passes share the hash partitioning (one exchange,
        # two sorts); per row pick the closer match, ties to backward
        carried = unioned.select(
            *left.columns,
            F.col("_side"),
            *[F.last(c, ignorenulls=True).over(w_back).alias(c + "__b") for c in carry_cols],
            *[F.last(c, ignorenulls=True).over(w_fwd).alias(c + "__f") for c in carry_cols],
        )
        rows = carried.filter(F.col("_side") == 1)
        # DATE → DOUBLE is not a valid Spark cast; compare dates as
        # days-since-epoch instead so 'nearest' works on date columns too
        # (timestamps and numerics cast to double directly).
        on_dtype = dict(left.dtypes).get(on, "")

        def _as_num(c: Column) -> Column:
            return F.unix_date(c) if on_dtype == "date" else c.cast("double")

        on_b = _as_num(F.col(f"{on}{suffix}__b"))
        on_f = _as_num(F.col(f"{on}{suffix}__f"))
        here = _as_num(F.col(on))
        take_b = F.col(f"{on}{suffix}__f").isNull() | (
            F.col(f"{on}{suffix}__b").isNotNull() & ((here - on_b) <= (on_f - here))
        )
        out = rows.select(
            *left.columns,
            *[
                F.when(take_b, F.col(c + "__b")).otherwise(F.col(c + "__f")).alias(c)
                for c in carry_cols
            ],
        )

    if tolerance is not None:
        delta = (
            F.lit(tolerance)
            if isinstance(tolerance, (int, float))
            else F.expr(f"INTERVAL {tolerance}")
        )
        on_r = F.col(f"{on}{suffix}")
        if direction == "backward":
            within = on_r >= F.col(on) - delta
        elif direction == "forward":
            within = on_r <= F.col(on) + delta
        else:
            within = (on_r >= F.col(on) - delta) & (on_r <= F.col(on) + delta)
        out = out.select(
            *left.columns,
            *[F.when(within, F.col(c)).alias(c) for c in carry_cols],
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_lower,
    left_upper,
    right_point: str,
    on: Sequence[str] = (),
    bucket_width: float | int = None,
) -> DataFrame:
    """Join each LEFT interval [left_lower, left_upper] with RIGHT rows
    whose ``right_point`` falls inside it (inclusive), using time-bucket
    equi-join + exact filter instead of an inequality join.

    ``left_lower``/``left_upper`` are column names or Columns on left;
    ``bucket_width`` must be >= the maximum interval width (numeric, in
    the column's units — seconds for timestamps).
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width (> 0, >= max interval width) is required")
    on = list(on)

    lo = F.col(left_lower) if isinstance(left_lower, str) else left_lower
    hi = F.col(left_upper) if isinstance(left_upper, str) else left_upper
    point = F.col(right_point)

    # timestamp→double cast yields epoch seconds incl. fractional part
    width = float(bucket_width)
    l_prep = (
        left.withColumn("_lo_b", F.floor(lo.cast("double") / width))
        .withColumn("_hi_b", F.floor(hi.cast("double") / width))
        # width >= max interval ⇒ at most 2 buckets per left interval
        .withColumn("_bucket", F.explode(F.sequence(F.col("_lo_b"), F.col("_hi_b"))))
        .drop("_lo_b", "_hi_b")
    )
    r_prep = right.withColumn("_bucket", F.floor(point.cast("double") / width))

    cond = [l_prep["_bucket"] == r_prep["_bucket"]]
    for key in on:
        cond.append(l_prep[key] == r_prep[key])
    joined = l_prep.join(r_prep, cond).filter((point >= lo) & (point <= hi))
    out = joined.drop(l_prep["_bucket"]).drop(r_prep["_bucket"])
    for key in on:
        out = out.drop(r_prep[key])
    return out


def ohlc_downsample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    unit: str = "day",
) -> DataFrame:
    """OHLC (open/high/low/close) downsampling per group and time
    bucket — the financial-style resample that keeps the four numbers a
    trend monitor needs when raw ticks are too many to keep.

    Determinism: open/close come from the lexicographic min/max of
    ``struct(ts, value)`` — identical to ``ORDER BY ts, value LIMIT 1``
    in any engine, so ties on the timestamp break the same way
    everywhere (``first``/``arg_min`` tie behavior is
    engine-unspecified; this is not). One groupBy; every aggregate is
    map-side combinable — 100 TB of ticks reduce to
    groups × buckets rows.
    """
    if unit not in ("day", "hour", "week", "month"):
        raise ValueError(f"ohlc_downsample: unsupported unit {unit!r}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    v = F.col(value_col).cast("double")
    pair = F.struct(F.col(ts_col).alias("_t"), v.alias("_v"))
    return (
        df.filter(F.col(ts_col).isNotNull() & v.isNotNull())
        .groupBy(*[F.col(c) for c in group_cols], bucket)
        .agg(
            F.min(pair).getField("_v").alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(pair).getField("_v").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def interarrival_burstiness(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key inter-arrival statistics + the Goh–Barabási burstiness
    index ``B = (σ − μ)/(σ + μ)`` over the gaps between consecutive
    events: B → −1 periodic, ≈ 0 Poisson, → 1 bursty — the one-number
    answer to "is this user's activity clockwork or bursts?" (bot
    detection, retention modeling, rate-limit design).

    Exactness: gaps are INTEGER microseconds (lag over a per-key
    window); moment sums accumulate as exact decimals, and μ, σ
    (population), CV and B evaluate in one pinned double
    parenthesization. Keys with fewer than 2 events have no gaps and
    are dropped; a constant gap gives σ=0 → B=−1 exactly; a single gap
    gives σ=0 likewise (document, don't special-case). Windows are
    partitioned BY KEY — scale-safe for high-cardinality keys (users),
    the sessionization shape.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = W.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gaps = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .withColumn("_gap", us - F.lag(us).over(w))
        .filter(F.col("_gap").isNotNull())
    )
    m = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_gap").cast("decimal(38,0)")).alias("_s"),
        F.sum(
            F.col("_gap").cast("decimal(19,0)") * F.col("_gap").cast("decimal(19,0)")
        ).alias("_ss"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mu = s / n
    var = (n * ss - s * s) / (n * n)
    sigma = F.sqrt(F.when(var < 0, F.lit(0.0)).otherwise(var))
    return m.select(
        F.col(key_col),
        F.col("_n").cast("long").alias("n_gaps"),
        F.round(mu / F.lit(1000000.0), 9).alias("mean_gap_s"),
        F.round(sigma / F.nullif(mu, F.lit(0.0)), 9).alias("cv_gap"),
        F.round((sigma - mu) / F.nullif(sigma + mu, F.lit(0.0)), 9).alias("burstiness"),
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change stream into SCD Type 2 validity intervals.

    Classic warehouse dimension maintenance (reference spec: the
    incremental-load surface of onetl's DBWriter + strategy machinery,
    ``onetl/strategy/incremental_strategy.py`` — this operator is the
    *dimension build* step downstream of such a captured change feed):
    consecutive rows per key with the SAME ``value_col`` merge into one
    run; each run becomes a row with ``effective_from`` (first change
    ts), ``effective_to`` (next run's first ts, NULL while current),
    ``is_current`` and ``n_events`` (run length).

    Scale shape: two windows, both partitioned by the full key — one
    LAG to detect change points, one cumulative sum to number runs,
    then a grouped aggregate and a LEAD over the (key, run) relation,
    which is strictly smaller than the input. No single-partition
    window anywhere; skewed keys cost what the per-key history costs.
    Determinism: supply ``tie_break`` columns (e.g. a unique event id)
    so equal-timestamp rows order identically on every engine.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in tie_break]
    w = W.partitionBy(*keys).orderBy(*order)
    # Null-safe change detection: `lag != value` is NULL (not true) when
    # either side is NULL, which would merge a NULL following a non-null
    # value into the previous run. First row per key is detected with
    # row_number, NOT lag-is-null, so a NULL *value* can itself start and
    # terminate runs like any other state.
    flagged = df.withColumn(
        "_chg",
        F.when(F.row_number().over(w) == 1, 1)
        .when(~F.lag(value_col).over(w).eqNullSafe(F.col(value_col)), 1)
        .otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_chg").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    runs = flagged.groupBy(*keys, F.col("_run")).agg(
        F.min(value_col).alias("value"),
        F.min(ts_col).alias("effective_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = W.partitionBy(*keys).orderBy("_run")
    return runs.select(
        *keys,
        F.col("value"),
        F.col("effective_from"),
        F.lead("effective_from").over(w2).alias("effective_to"),
        F.lead("effective_from").over(w2).isNull().alias("is_current"),
        F.col("n_events").cast("long").alias("n_events"),
    )
