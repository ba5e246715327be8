"""File-format option bags.

Formats are applied to Spark readers/writers as
``reader.format(name).options(**opts)`` — the same contract as the
reference (onetl/file/format/file_format.py:29-68). Formats that need
extra Spark packages implement ``check_if_supported`` (e.g. Excel,
avro when spark-avro is absent).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class FileFormat:
    name: str = ""
    options: dict[str, Any] = field(default_factory=dict)

    def reader_options(self) -> dict[str, Any]:
        return {**self._declared_options(), **self.options}

    def writer_options(self) -> dict[str, Any]:
        return self.reader_options()

    def _declared_options(self) -> dict[str, Any]:
        out = {}
        for f in fields(self):
            if f.name in ("name", "options"):
                continue
            value = getattr(self, f.name)
            if value is not None:
                key = f.metadata.get("spark_name", _camel(f.name))
                out[key] = _render(value)
        return out

    def check_if_supported(self, spark: SparkSession) -> None:
        """Raise if the session lacks a package this format requires."""

    def apply_to_reader(self, reader):
        return reader.format(self.name).options(**self.reader_options())

    def apply_to_writer(self, writer):
        return writer.format(self.name).options(**self.writer_options())


def _camel(snake: str) -> str:
    head, *rest = snake.split("_")
    return head + "".join(p.capitalize() for p in rest)


def _render(value: Any) -> Any:
    if isinstance(value, bool):
        return "true" if value else "false"
    return value
