from onetl_spark.strategy.base import BaseStrategy, HWMStrategy, StrategyManager
from onetl_spark.strategy.snapshot import SnapshotStrategy, SnapshotBatchStrategy
from onetl_spark.strategy.incremental import IncrementalStrategy, IncrementalBatchStrategy
from onetl_spark.strategy.batch import BatchHWMStrategy

__all__ = [
    "BaseStrategy",
    "HWMStrategy",
    "StrategyManager",
    "SnapshotStrategy",
    "SnapshotBatchStrategy",
    "IncrementalStrategy",
    "IncrementalBatchStrategy",
    "BatchHWMStrategy",
]
