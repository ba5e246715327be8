"""ORC format (onetl/file/format/orc.py:28)."""

from __future__ import annotations

from dataclasses import dataclass

from onetl_spark.file.format.base import FileFormat


@dataclass
class ORC(FileFormat):
    name: str = "orc"
    compression: str | None = None
