"""Skew-aware join utilities.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized SORT-MERGE partitions at runtime, but it only triggers on
post-shuffle partition sizes and does nothing for the build side of a
hash join or for pathological single-key skew where one key exceeds a
whole executor. ``salted_join`` is the explicit counterweight: the skewed
side's hot keys are split into ``salt_buckets`` sub-keys and the other
side replicates its matching rows across the buckets, so one hot key's
work spreads over ``salt_buckets`` tasks instead of one straggler.

Use when a known hot key (null-ish defaults, "unknown" sentinels, a
celebrity user) dominates the key distribution; for uniformly-sized keys
a plain join plus AQE is already optimal.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where the SKEWED (large, hot-keyed) side is salted.

    Each skewed-side row gets a salt bucket derived from
    ``monotonically_increasing_id`` (RNG-free, uniform across a key's
    rows) and the other side is replicated once per bucket. Results are identical
    to ``skewed.join(other, on, how)`` for ``inner`` and ``left`` joins
    (each skewed row still meets each matching other row exactly once).

    Replication costs ``salt_buckets ×`` the small side — the standard
    skew price; keep the replicated side the smaller one.

    ``right``/``outer`` joins are rejected: salting the probe side
    cannot preserve "other-side row with no match" semantics (every
    other-side row is duplicated per bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if not on:
        raise ValueError("salted_join requires at least one join key")
    # monotonically_increasing_id is unique per row → pmod spreads each hot
    # key's rows uniformly over the buckets without any RNG (deterministic
    # within a run; the join RESULT is salt-invariant so reruns are stable)
    salted = skewed.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")


def key_skew_report(df: DataFrame, on: Sequence[str], top: int = 20) -> DataFrame:
    """Per-key row counts for the heaviest keys plus their share of the
    table — the diagnostic you run before deciding to salt. One partial-
    aggregating shuffle; the top-k is a TakeOrdered, never a full sort."""
    counts = df.groupBy(*[F.col(c) for c in on]).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.count()
    return (
        counts.orderBy(F.desc("n_rows"))
        .limit(top)
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 9))
    )
