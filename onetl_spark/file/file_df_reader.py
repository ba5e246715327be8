"""FileDFReader — read a directory or explicit file list into a DataFrame.

Reference: onetl/file/file_df_reader/file_df_reader.py:38,116; load core
spark_file_df_connection.py:66-99 — ``spark.read.format(fmt).schema(s)
.option("basePath", root).load(urls)``. ``basePath`` keeps partition
discovery rooted at ``source_path`` when explicit files are passed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from onetl_spark.file.connections import SparkFileDFConnection
from onetl_spark.file.format.base import FileFormat
from onetl_spark.hooks import slot, support_hooks


@support_hooks
@dataclass
class FileDFReader:
    connection: SparkFileDFConnection
    format: FileFormat
    source_path: str | None = None
    df_schema: StructType | None = None
    options: dict[str, Any] = field(default_factory=dict)

    @slot
    def run(self, files: Iterable[str] | None = None) -> DataFrame:
        self.format.check_if_supported(self.connection.spark)
        reader = self.connection.spark.read
        reader = self.format.apply_to_reader(reader)
        if self.df_schema is not None:
            reader = reader.schema(self.df_schema)
        if self.options:
            reader = reader.options(**self.options)

        if files is not None:
            paths = [self._resolve(f) for f in files]
            if self.source_path:
                reader = reader.option("basePath", self.connection.get_url(self.source_path))
            return reader.load([self.connection.get_url(p) for p in paths])
        if not self.source_path:
            raise ValueError("either source_path or an explicit files list is required")
        return reader.load(self.connection.get_url(self.source_path))

    def _resolve(self, file: str) -> str:
        path = str(file)
        if path.startswith("/"):
            if self.source_path and not path.startswith(str(self.source_path)):
                raise ValueError(f"File {path} is outside source_path {self.source_path}")
            return path
        if not self.source_path:
            raise ValueError(f"Relative path {path} requires source_path")
        return f"{self.source_path}/{path}"
