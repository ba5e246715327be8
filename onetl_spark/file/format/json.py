"""JSON (multiline, read-only) format + parse/serialize columns.

Reference: onetl/file/format/json.py:35 (read-only multiLine),
``parse_column`` → ``from_json`` accepting Struct/Array/Map schemas
(json.py:328-402), ``serialize_column`` → ``to_json`` (json.py:404+).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from onetl_spark.file.format.base import FileFormat


@dataclass
class JSON(FileFormat):
    name: str = "json"
    encoding: str | None = None
    line_sep: str | None = None
    timestamp_format: str | None = None
    date_format: str | None = None

    def reader_options(self):
        return {"multiLine": "true", **super().reader_options()}

    def apply_to_writer(self, writer):
        raise ValueError("JSON (multiline) format is read-only; use JSONLine for writing")

    def parse_column(self, column: str | Column, schema: DataType) -> Column:
        if not isinstance(schema, (StructType, ArrayType, MapType)):
            raise ValueError(f"JSON.parse_column requires Struct/Array/Map schema, got {schema}")
        col = F.col(column) if isinstance(column, str) else column
        return F.from_json(col, schema, self.options)

    def serialize_column(self, column: str | Column) -> Column:
        col = F.col(column) if isinstance(column, str) else column
        return F.to_json(col, self.options)
