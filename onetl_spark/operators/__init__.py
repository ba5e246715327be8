from onetl_spark.operators.temporal import asof_join, range_join

__all__ = ["asof_join", "range_join"]
