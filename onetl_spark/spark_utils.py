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


def widen_small_scan(df: DataFrame, min_rows_per_task: int = 0) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when the
    source offers fewer partitions than cores.

    CPU-heavy per-row pipelines (shingle hashing, signature aggregation)
    inherit the SCAN's partitioning: a small table stored as a single
    parquet row group is one task, so the expensive compute serializes on
    one core no matter how wide the cluster is. AQE never splits
    partitions (it only coalesces), so this is the one knob Catalyst
    doesn't turn. At production scale the input has more splits than the
    cluster has cores and this is a no-op — the extra exchange only ever
    fires on scan-starved inputs, where shuffling the (by definition
    small) data costs microseconds against the serialized compute it
    unlocks.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
