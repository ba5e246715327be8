"""CSV format + column-level parse/serialize.

Mirrors the reference CSV format surface (onetl/file/format/csv.py:37,80):
option bag for the Spark csv reader/writer, plus ``parse_column`` →
``from_csv`` (csv.py:475-552) and ``serialize_column`` → ``to_csv``
(csv.py:554+).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from onetl_spark.file.format.base import FileFormat


@dataclass
class CSV(FileFormat):
    name: str = "csv"
    delimiter: str | None = None
    header: bool | None = None
    quote: str | None = None
    escape: str | None = None
    encoding: str | None = None
    line_sep: str | None = None
    compression: str | None = None
    infer_schema: bool | None = None
    timestamp_format: str | None = None
    date_format: str | None = None

    def parse_column(self, column: str | Column, schema: StructType) -> Column:
        col = F.col(column) if isinstance(column, str) else column
        return F.from_csv(col, schema.simpleString(), self.reader_options())

    def serialize_column(self, column: str | Column) -> Column:
        col = F.col(column) if isinstance(column, str) else column
        return F.to_csv(col, self.writer_options())
