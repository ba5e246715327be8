"""onetl_spark — a PySpark-native ETL/analytics engine.

A from-scratch engine with the query and data-processing capabilities of
MobileTeleSystems/onetl (the reference), re-expressed Spark-first:

- DB sources/sinks with pushdown query-fragment builders (projection,
  filter, hint, limit, min/max) and parallel-scan partitioning
  (range/hash/mod) — ``onetl_spark.connections``, ``onetl_spark.db``.
- Incremental windowing via high-water-marks (HWM) and strategies —
  ``onetl_spark.hwm``, ``onetl_spark.strategy``.
- Files-as-DataFrame readers/writers and file formats —
  ``onetl_spark.file``.
- Driver-side file-transfer operators — ``onetl_spark.file.transfer``.
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) — ``onetl_spark.llm``.
- Temporal joins (as-of, range) — ``onetl_spark.operators``.
- Structured Streaming extension — ``onetl_spark.streaming``.

All execution is delegated to Spark (DataFrame API / Catalyst); engine
logic is query construction + state + orchestration, as in the reference
(see SURVEY.md §4 conclusion).
"""

from onetl_spark.version import __version__

__all__ = [
    "__version__",
    "DBReader",
    "DBWriter",
    "SnapshotStrategy",
    "SnapshotBatchStrategy",
    "IncrementalStrategy",
    "IncrementalBatchStrategy",
]


def __getattr__(name):
    # lazy top-level conveniences (avoid importing pyspark at package import)
    if name in ("DBReader", "DBWriter"):
        from onetl_spark import db

        return getattr(db, name)
    if name.endswith("Strategy"):
        from onetl_spark import strategy

        return getattr(strategy, name)
    raise AttributeError(name)
