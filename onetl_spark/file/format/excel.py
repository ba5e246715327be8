"""Excel format (onetl/file/format/excel.py:28).

Requires the third-party spark-excel package
(com.crealytics:spark-excel); ``check_if_supported`` gates usage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from onetl_spark.file.format.base import FileFormat


@dataclass
class Excel(FileFormat):
    name: str = "excel"
    header: bool | None = None
    data_address: str | None = None
    infer_schema: bool | None = None

    def check_if_supported(self, spark: SparkSession) -> None:
        try:
            spark._jvm.java.lang.Class.forName(
                "com.crealytics.spark.excel.v2.ExcelDataSource",
            )
        except Exception as e:
            raise RuntimeError(
                "Excel requires the spark-excel package "
                "(com.crealytics:spark-excel_2.13:<version> via spark.jars.packages)",
            ) from e
