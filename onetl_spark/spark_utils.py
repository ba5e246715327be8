"""Spark-session utilities.

``estimate_dataframe_size`` mirrors the reference helper
(onetl/_util/spark.py:132-147): in-memory size estimate of a DRIVER-side
DataFrame via the JVM ``org.apache.spark.util.SizeEstimator``, returning
0 when reflection is unavailable. Used for log guidance on driver-built
frames (``fetch()`` results, Greenplum write sizing) — not for
distributed data, whose size comes from the scan metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def estimate_dataframe_size(df: DataFrame) -> int:
    """Estimated in-memory size in bytes of the DataFrame's JVM object
    graph; 0 when SizeEstimator reflection fails (Java version/module
    restrictions)."""
    try:
        jvm = df.sparkSession._jvm
        return int(jvm.org.apache.spark.util.SizeEstimator.estimate(df._jdf))
    except Exception:
        return 0
