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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
