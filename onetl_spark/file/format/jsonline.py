"""JSONLine: newline-delimited JSON (Spark's native json format).

Reference: onetl/file/format/jsonline.py:22 (Spark format name "json").
"""

from __future__ import annotations

from dataclasses import dataclass

from onetl_spark.file.format.base import FileFormat


@dataclass
class JSONLine(FileFormat):
    name: str = "json"
    encoding: str | None = None
    line_sep: str | None = None
    compression: str | None = None
    timestamp_format: str | None = None
    date_format: str | None = None
