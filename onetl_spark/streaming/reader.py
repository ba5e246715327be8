"""Streaming source reader.

The reference is explicitly batch-only (README.rst:63); this module is the
Spark-native extension: ``spark.readStream`` over file directories (any
onetl_spark file format) or Kafka topics (reusing the Kafka connection's
option synthesis — same bootstrap/offset-window logic as batch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from onetl_spark.file.format.base import FileFormat


@dataclass
class StreamDFReader:
    """Read a file-based directory as a stream (micro-batches of new files)."""

    spark: SparkSession
    format: FileFormat
    source_path: str
    df_schema: StructType
    options: dict[str, Any] = field(default_factory=dict)

    def run(self) -> DataFrame:
        reader = self.spark.readStream.format(self.format.name)
        reader = reader.options(**self.format.reader_options())
        reader = reader.schema(self.df_schema)
        if self.options:
            reader = reader.options(**self.options)
        return reader.load(self.source_path)


@dataclass
class KafkaStreamReader:
    """Kafka topic stream using the batch connection's option synthesis."""

    connection: Any  # onetl_spark.connections.kafka.Kafka
    topic: str
    starting_offsets: str = "latest"
    options: dict[str, Any] = field(default_factory=dict)

    def run(self) -> DataFrame:
        opts = self.connection._common_options()
        opts["subscribe"] = self.topic
        opts["startingOffsets"] = self.starting_offsets
        reader = self.connection.spark.readStream.format("kafka")
        for k, v in {**opts, **self.options}.items():
            reader = reader.option(k, str(v))
        return reader.load()

    @classmethod
    def from_hwm(cls, connection: Any, topic: str, hwm: Any, partitions: list[int], **kwargs):
        """Resume a stream from a batch-side ``KeyValueIntHWM``: the saved
        per-partition offsets become startingOffsets for the FIRST run;
        after that the streaming checkpoint owns progress (Spark ignores
        startingOffsets once a checkpoint exists). This is the handoff
        path from incremental batch reads to a continuous stream —
        partitions unseen by the HWM start at 0, matching the batch
        planner (kafka.starting_offsets_from_hwm)."""
        from onetl_spark.connections.kafka import starting_offsets_from_hwm

        return cls(
            connection=connection,
            topic=topic,
            starting_offsets=starting_offsets_from_hwm(
                topic, getattr(hwm, "value", hwm), partitions,
            ),
            **kwargs,
        )
