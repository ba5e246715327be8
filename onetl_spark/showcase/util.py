"""Shared helpers for showcase queries.

Float determinism: double sums are order-dependent, so any aggregate the
driver hashes is computed over per-row DECIMAL casts (exact, associative)
and converted back to DOUBLE at the end — the Spark query and the DuckDB
oracle produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from onetl_spark.connections.catalog import register_parquet_views

_REGISTERED: set[tuple[int, str]] = set()


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    key = (id(spark), sf_dir)
    if key not in _REGISTERED:
        register_parquet_views(spark, sf_dir)
        _REGISTERED.add(key)


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Deterministic double sum: per-row decimal cast → exact decimal sum →
    double result. Mirror in DuckDB with
    ``CAST(SUM(CAST(x AS DECIMAL(38,scale))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Deterministic average = decimal sum / count, evaluated in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE) / COUNT(*)"
