"""Shared statistical expressions used by multiple operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pearson_from_moments(m: DataFrame, n_col: str = "n_days") -> DataFrame:
    """Closed-form Pearson r from exact moment sums ``(n_col, sx, sy,
    sxy, sxx, syy)``, evaluated in ONE fixed double parenthesization so
    any engine reproduces it bit-for-bit when the moments are exact
    (integer or decimal-derived). A zero denominator (constant series,
    or n==1) pins to NULL — Spark's ANSI division would raise and
    DuckDB's IEEE division would give NaN/inf, so both engines' oracles
    use ``NULLIF(sqrt(...), 0)`` to agree. Appends ``pearson_r``."""
    n = F.col(n_col).cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    den = F.when(den == 0, F.lit(None)).otherwise(den)
    return m.withColumn("pearson_r", F.round(num / den, 9))
