"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Why not HyperLogLog (``approx_count_distinct``)? Its estimate depends on
engine-internal hashing and register layout — useless when a second
system must reproduce or audit the number. KMV with an md5-derived hash
is fully deterministic: any engine that can md5 computes the identical
estimate, so sketches can be compared across Spark, DuckDB, and whatever
runs downstream.

Estimator: hash every distinct value to a unit float u ∈ (0, 1]; keep
the k smallest per group. If a group has < k distinct hashes the count
is exact; otherwise the classic unbiased KMV estimate is ``(k-1)/u_k``
with ``u_k`` the k-th smallest unit hash.

Scale shape: one distinct-shuffle on (group, hash) — the same cost as
any exact distinct — then a per-group top-k that Catalyst executes as
``WindowGroupLimit`` (partial per-partition heap BEFORE the exchange),
so the post-shuffle volume is ≤ partitions×k rows per group, never the
distinct set. The standard use is sketching MANY groups in one pass
(per-day, per-source cardinalities), where exact count-distinct per
group would carry the full value set per group through the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from onetl_spark.llm.text import md5_long

#: md5_long yields 15 hex digits → uniform integers in [0, 16^15)
_HASH_SPACE = float(16**15)


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via k-minimum-values.

    Returns (group_cols..., n_kept, estimate) where estimate is exact
    (= n_kept) for groups with fewer than k distinct values.
    """
    if k < 2:
        raise ValueError("k must be >= 2 for the (k-1)/u_k estimator")
    hashed = (
        df.select(
            *group_cols,
            (md5_long(F.col(value_col).cast("string")) / F.lit(_HASH_SPACE)).alias("_u"),
        )
        .filter(F.col("_u") > 0)
        .distinct()
    )
    w = W.partitionBy(*group_cols).orderBy("_u")
    kept = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("_u").alias("_uk"),
        )
        .select(
            *group_cols,
            "n_kept",
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                    F.lit(float(k - 1)) / F.col("_uk"),
                ),
                6,
            ).alias("estimate"),
        )
    )


def sql_kmv_distinct_estimate(
    table: str,
    group_cols: list[str],
    value_expr: str,
    k: int = 64,
) -> str:
    """DuckDB oracle for :func:`kmv_distinct_estimate` — byte-identical
    hashing and arithmetic."""
    groups = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups},
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT
           / {_HASH_SPACE:.1f} AS _u
  FROM {table}
  WHERE ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT > 0
), kept AS (
  SELECT {groups}, _u,
         ROW_NUMBER() OVER (PARTITION BY {groups} ORDER BY _u) AS _rn
  FROM hashed QUALIFY _rn <= {k}
)
SELECT {groups}, COUNT(*) AS n_kept,
       round(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(k - 1)} / MAX(_u) END, 6) AS estimate
FROM kept
GROUP BY {groups}
"""
