"""XML format + parse column.

Reference: onetl/file/format/xml.py:34 (spark-xml package); Spark 4 ships
native XML support (``format("xml")``, ``from_xml``), so no extra package
is needed here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from onetl_spark.file.format.base import FileFormat


@dataclass
class XML(FileFormat):
    name: str = "xml"
    row_tag: str | None = None
    root_tag: str | None = None
    encoding: str | None = None
    compression: str | None = None

    def check_if_supported(self, spark: SparkSession) -> None:
        if not hasattr(F, "from_xml"):
            raise RuntimeError("XML requires Spark 4+ (native) or the spark-xml package")

    def parse_column(self, column: str | Column, schema: StructType) -> Column:
        col = F.col(column) if isinstance(column, str) else column
        return F.from_xml(col, schema, self.options or None)
