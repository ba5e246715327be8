"""Funnel analysis: ordered event-sequence conversion per entity.

``funnel_steps`` computes, per user, the earliest time each step of an
ordered funnel (e.g. signup → view → purchase) could complete: step i's
timestamp is the MIN event time of that step's type occurring STRICTLY
AFTER step i-1's timestamp. A user converts through step i iff the
timestamp is non-null — the standard "first matching subsequence"
funnel semantics (each later step must follow the previous one in time,
other events freely interleave).

Scale shape: one conditional-aggregate pass per step, every pass keyed
by the entity column. After the first shuffle the data is already
hash-partitioned by entity, so AQE/exchange-reuse keeps subsequent
joins co-partitioned — cost is O(steps) narrow aggregates, never a
per-user sort and never a cross-event self-join (an N-step funnel as a
window/pattern scan would sort every user's full history; this touches
each event once per step).
"""

from __future__ import annotations

import logging

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-entity funnel timestamps: columns ``step_1_ts … step_N_ts``
    (NULL once the funnel breaks) plus ``steps_completed``.

    Entities with no step-1 event are absent from the result (they never
    entered the funnel).
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    base = events.select(
        F.col(user_col), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_tp")
    )
    out = (
        base.filter(F.col("_tp") == steps[0])
        .groupBy(user_col)
        .agg(F.min("_ts").alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step_{i - 1}_ts"
        cur = f"step_{i}_ts"
        stage = (
            base.filter(F.col("_tp") == step)
            .join(out.select(user_col, prev), user_col)
            .filter(F.col("_ts") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(cur))
        )
        out = out.join(stage, user_col, "left")
    completed = None
    for i in range(len(steps), 0, -1):
        col = F.col(f"step_{i}_ts")
        completed = (
            F.when(col.isNotNull(), F.lit(i))
            if completed is None
            else completed.when(col.isNotNull(), F.lit(i))
        )
    return out.withColumn(
        "steps_completed", completed.otherwise(F.lit(0)) if completed is not None else F.lit(0)
    )


def position_based_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    touch_id_col: str = "event_id",
    conv_id_col: str = "event_id",
    w_edge: float = 0.4,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each conversion
    credits its preceding touch path ``w_edge`` to the first touch,
    ``w_edge`` to the last, and the remaining ``1 - 2*w_edge`` split
    evenly across the middle (1 touch → full credit, 2 → half each) —
    the standard middle ground between first- and last-touch.

    Conversions sharing a (user, timestamp) instant are MERGED to one
    path end (max conversion id wins): the forward carry can only attach
    a touch to a single next conversion, so simultaneous conversions
    contribute one unit of credit, not two — batch order lines into one
    conversion upstream if each must count.

    Scale shape: touches and conversions UNION into one per-user stream;
    each touch finds its next conversion with ONE forward-carry window
    (``first(conv_id, ignorenulls=True)`` over CURRENT..FOLLOWING) — no
    touch×conversion join, no path explosion; then one window per
    conversion path assigns positions. Two shuffles total, both keyed by
    user/conversion. Credits are exact decimals (the middle split rounds
    to 9 then accumulates as decimal), so channel totals are
    engine-reproducible. Touches after a user's final conversion carry
    NULL ``conv_id`` (unattributed) and are returned for completeness.
    """
    from pyspark.sql.window import Window as W

    if not 0.0 <= w_edge <= 0.5:
        raise ValueError(
            f"position_based_attribution: w_edge must be in [0, 0.5], got {w_edge}"
        )
    conv = conversions.groupBy(
        F.col(user_col).alias("_u"), F.col(time_col).alias("_ts")
    ).agg(F.max(conv_id_col).alias("_conv_id"))
    t = touches.select(
        F.col(user_col).alias("_u"),
        F.col(time_col).alias("_ts"),
        F.col(touch_id_col).alias("_touch_id"),
        F.lit(0).alias("_is_conv"),
        # the conversion id keeps ITS OWN type (a long cast would silently
        # NULL string ids and unattribute every touch)
        F.lit(None).cast(conv.schema["_conv_id"].dataType).alias("_conv_id"),
    )
    c = conv.select(
        "_u",
        "_ts",
        F.lit(None).cast(t.schema["_touch_id"].dataType).alias("_touch_id"),
        F.lit(1).alias("_is_conv"),
        F.col("_conv_id"),
    )
    # ascending (_ts, _is_conv): at an equal timestamp the touch sorts
    # BEFORE the conversion, so the forward frame still sees it — a touch
    # at the conversion instant belongs to that conversion's path
    w = (
        W.partitionBy("_u")
        .orderBy("_ts", "_is_conv")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    attributed = (
        t.unionByName(c)
        .withColumn("_next_conv", F.first("_conv_id", ignorenulls=True).over(w))
        .filter(F.col("_is_conv") == 0)
    )
    wp = W.partitionBy("_u", "_next_conv").orderBy("_ts", "_touch_id")
    sized = (
        attributed.withColumn("_pos", F.row_number().over(wp))
        .withColumn("_n", F.count(F.lit(1)).over(W.partitionBy("_u", "_next_conv")))
    )
    # snap to 12 decimals so the Spark operand equals the decimal literal
    # an external SQL oracle writes (raw 1.0 - 2*0.4 = 0.19999999999999996)
    w_mid = round(1.0 - 2 * w_edge, 12)
    credit = (
        F.when(F.col("_next_conv").isNull(), F.lit(None).cast("decimal(20,9)"))
        .when(F.col("_n") == 1, F.lit(1.0).cast("decimal(20,9)"))
        .when(F.col("_n") == 2, F.lit(0.5).cast("decimal(20,9)"))
        .when(
            (F.col("_pos") == 1) | (F.col("_pos") == F.col("_n")),
            F.lit(w_edge).cast("decimal(20,9)"),
        )
        .otherwise(
            F.round(F.lit(w_mid) / (F.col("_n") - 2), 9).cast("decimal(20,9)")
        )
    )
    return sized.select(
        F.col("_u").alias(user_col),
        F.col("_touch_id").alias("touch_id"),
        F.col("_next_conv").alias("conv_id"),
        F.col("_pos").alias("position"),
        F.col("_n").alias("path_length"),
        credit.alias("credit"),
    )


def frequent_sequences(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    item_col: str,
    k: int = 3,
    min_support: int = 2,
    max_events_per_entity: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Frequent sequential patterns (GSP/PrefixSpan-family semantics):
    ordered, NON-contiguous length-``k`` subsequences of each entity's
    event-item sequence, counted by SUPPORT = number of entities whose
    sequence contains the pattern at least once — the
    market-basket-over-time miner ("signup > view > purchase shows up
    in 40% of users"), strictly more general than contiguous-path
    censuses (a pattern survives arbitrary interleaved noise events).

    Returns ``(pattern, support)`` with pattern rendered ``a>b>c``,
    filtered to ``support >= min_support``.

    Scale shape: per-entity event ranks come from a PARTITIONED window
    (bounded by ``max_events_per_entity``, never a global sort); the
    k-step growth is ``k-1`` self-joins keyed by the entity, and the
    combinatorial blowup is capped by keeping only each entity's FIRST
    ``max_events_per_entity`` events (deterministic ``(ts, tiebreak)``
    order) — C(cap, k)·entities candidate rows worst-case, logged, the
    LSH-bucket-cap posture. Per-entity DISTINCT collapses multiplicity
    before the support count, so the final aggregate is
    (pattern, entity)-sized, map-side combined.
    """
    if k < 1:
        raise ValueError(f"frequent_sequences: k must be >= 1, got {k}")
    if max_events_per_entity < k:
        raise ValueError("frequent_sequences: max_events_per_entity < k")
    from pyspark.sql import Window as W

    log.info(
        "frequent_sequences: entities capped at their first %d events "
        "(recall cap)", max_events_per_entity,
    )
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    ranked = (
        df.select(
            F.col(entity_col).alias("_e"),
            F.col(item_col).cast("string").alias("_it"),
            F.row_number()
            .over(W.partitionBy(entity_col).orderBy(*order))
            .alias("_idx"),
        )
        .filter(F.col("_idx") <= max_events_per_entity)
    )
    # materialize the capped ranked sequence once: the k-1 growth joins
    # plus the seed each re-reference it, and without a checkpoint every
    # reference replays the corpus window (3 windows for k=3, measured).
    # The checkpoint also preserves the window's hash(entity) partitioning,
    # so the entity-keyed growth joins below need NO new exchange at all
    # (guide §2.4: establish the partitioning once, reuse it)
    ranked = ranked.localCheckpoint(eager=False)
    cur = ranked.select("_e", F.col("_idx").alias("_last"), F.col("_it").alias("pattern"))
    for _ in range(k - 1):
        nxt = ranked.select(
            F.col("_e").alias("_e2"), F.col("_idx").alias("_nidx"), "_it"
        )
        cur = (
            cur.join(
                nxt,
                on=[cur["_e"] == nxt["_e2"], nxt["_nidx"] > cur["_last"]],
            )
            .select(
                "_e",
                F.col("_nidx").alias("_last"),
                F.concat_ws(">", "pattern", "_it").alias("pattern"),
            )
        )
    return (
        cur.select("_e", "pattern")
        .distinct()
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
