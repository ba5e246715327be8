"""Spark column type → HWM class auto-detection.

Same mapping as the reference registry
(onetl/hwm/store/hwm_class_registry.py:13-74): integer family → Int HWM,
Date → Date HWM, Timestamp → DateTime HWM, Float/Double/Decimal → Int HWM.
"""

from __future__ import annotations

from pyspark.sql import types as T

from onetl_spark.hwm.types import (
    ColumnDateHWM,
    ColumnDateTimeHWM,
    ColumnIntHWM,
)

SparkTypeToHWM: dict[str, type] = {
    "byte": ColumnIntHWM,
    "short": ColumnIntHWM,
    "integer": ColumnIntHWM,
    "long": ColumnIntHWM,
    "date": ColumnDateHWM,
    "timestamp": ColumnDateTimeHWM,
    "timestamp_ntz": ColumnDateTimeHWM,
    "float": ColumnIntHWM,
    "double": ColumnIntHWM,
}


def detect_hwm_class(spark_type: T.DataType) -> type | None:
    name = spark_type.typeName()
    if name == "decimal":
        return ColumnIntHWM
    return SparkTypeToHWM.get(name)
