"""Additional analytics shapes: pivot, cube, exact percentiles.

Rounding/aggregation determinism follows showcase/util.py: decimal sums
for hashed doubles, `round(x, 9)` on interpolated percentiles (Spark's
exact ``percentile`` and DuckDB's ``quantile_cont`` both use linear
interpolation over the sorted values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onetl_spark.showcase.util import dsum, ensure_views, sql_dsum

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user, one count column per event type. The
    explicit value list keeps the plan a single pass (no distinct-values
    pre-query) — mandatory at scale."""
    ensure_views(spark, sf_dir)
    out = (
        spark.table("events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


PIVOT_SQL = """
SELECT user_id,
       SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS n_click,
       SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS n_error,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS n_signup,
       SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS n_view
FROM events
GROUP BY user_id
"""


def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all 4 grouping sets) with grouping flags."""
    ensure_views(spark, sf_dir)
    return (
        spark.table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        )
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per event type (Spark ``percentile``, not the
    approximate sketch — approx_percentile/DuckDB approx sketches differ
    by construction and can never hash-match an oracle)."""
    ensure_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 9).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 9).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 9).alias("p99"),
        )
    )


PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 9) AS p50,
       round(quantile_cont(value, 0.9), 9) AS p90,
       round(quantile_cont(value, 0.99), 9) AS p99
FROM events
GROUP BY event_type
"""


SPARK_QUERIES = {
    "events_pivot_by_type": events_pivot_by_type,
    "agg_cube_status_priority": agg_cube_status_priority,
    "events_value_percentiles": events_value_percentiles,
}

ORACLE_SQL = {
    "events_pivot_by_type": PIVOT_SQL,
    "agg_cube_status_priority": CUBE_SQL,
    "events_value_percentiles": PERCENTILES_SQL,
}
