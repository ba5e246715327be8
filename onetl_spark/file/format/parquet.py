"""Parquet format (onetl/file/format/parquet.py:28)."""

from __future__ import annotations

from dataclasses import dataclass

from onetl_spark.file.format.base import FileFormat


@dataclass
class Parquet(FileFormat):
    name: str = "parquet"
    compression: str | None = None
    merge_schema: bool | None = None
