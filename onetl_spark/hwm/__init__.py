from onetl_spark.hwm.window import Edge, Window
from onetl_spark.hwm.types import (
    HWM,
    ColumnHWM,
    ColumnIntHWM,
    ColumnDateHWM,
    ColumnDateTimeHWM,
    KeyValueIntHWM,
    FileListHWM,
    FileModifiedTimeHWM,
)
from onetl_spark.hwm.registry import SparkTypeToHWM, detect_hwm_class

__all__ = [
    "Edge",
    "Window",
    "HWM",
    "ColumnHWM",
    "ColumnIntHWM",
    "ColumnDateHWM",
    "ColumnDateTimeHWM",
    "KeyValueIntHWM",
    "FileListHWM",
    "FileModifiedTimeHWM",
    "SparkTypeToHWM",
    "detect_hwm_class",
]
