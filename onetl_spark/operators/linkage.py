"""Record linkage: blocked fuzzy matching by edit distance.

The classic entity-resolution shape (Fellegi–Sunter blocking + string
comparison): an all-pairs fuzzy match is O(n²) and impossible at scale,
so candidates are generated only WITHIN a blocking key (phonetic code,
length bucket, a domain attribute such as region), and only those pairs
pay the edit-distance comparison. Cost is Σ per-block |L|·|R|, bounded by
``max_block_size`` with logged drops — the same recall-knob pattern as
the LSH bucket cap in ``llm/dedup.py``.

Distance is computed with the JVM-side ``levenshtein`` expression with
its ``threshold`` short-circuit (Spark ≥ 3.5 computes at most
``max_distance`` diagonal bands, so long strings that cannot match are
rejected in O(len·d), not O(len²)).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _prep(df: DataFrame, id_col: str, key_col: str, block_col: str, side: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.col(key_col).alias(f"{side}_key"),
        F.coalesce(F.col(block_col).cast("string"), F.lit("")).alias("_blk"),
    )


def _cap_blocks(df: DataFrame, max_block_size: int, side: str, op: str) -> DataFrame:
    oversized = (
        df.groupBy("_blk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > max_block_size)
        .select("_blk")
        .localCheckpoint(eager=False)
    )
    n = oversized.count()
    if n:
        log.warning(
            "%s: dropped %d %s-side blocks larger than %d rows; recall is "
            "reduced for those blocks — tighten the blocking key",
            op, n, side, max_block_size,
        )
        df = df.join(F.broadcast(oversized), "_blk", "left_anti")
    return df


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "name",
    block_col: str = "block",
    id_col: str = "id",
    max_distance: int = 2,
    max_block_size: int = 1000,
) -> DataFrame:
    """Link records of ``right`` to records of ``left`` whose ``key_col``
    is within ``max_distance`` edits, considering only candidates that
    share ``block_col``. Returns ``(a_id, b_id, distance)`` — one row per
    matching (left, right) pair.

    Equi-join on the block key (hash-shuffled, co-located), then the
    edit-distance filter runs inside the join — Catalyst keeps it JVM-side
    with the threshold short-circuit, never a Python round-trip.
    """
    l = _cap_blocks(_prep(left, id_col, key_col, block_col, "a"), max_block_size, "left", "blocked_fuzzy_join")
    r = _cap_blocks(_prep(right, id_col, key_col, block_col, "b"), max_block_size, "right", "blocked_fuzzy_join")
    dist = F.levenshtein(F.col("a_key"), F.col("b_key"), max_distance)
    return (
        l.join(r, "_blk")
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)  # threshold form returns -1 above cutoff
        .select("a_id", "b_id", F.col("distance").cast("long").alias("distance"))
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str = "name",
    block_col: str = "block",
    id_col: str = "id",
    max_distance: int = 2,
    max_block_size: int = 1000,
) -> DataFrame:
    """Self-linkage: near-identical record pairs inside one table
    (``a_id < b_id``), same blocking and cost model as
    :func:`blocked_fuzzy_join`."""
    b = _cap_blocks(_prep(df, id_col, key_col, block_col, "a"), max_block_size, "self", "blocked_fuzzy_pairs")
    l = b.alias("l")
    r = b.select(
        F.col("a_id").alias("b_id"), F.col("a_key").alias("b_key"), "_blk"
    ).alias("r")
    dist = F.levenshtein(F.col("a_key"), F.col("b_key"), max_distance)
    return (
        l.join(r, (F.col("l._blk") == F.col("r._blk")) & (F.col("a_id") < F.col("b_id")))
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select("a_id", "b_id", F.col("distance").cast("long").alias("distance"))
    )
