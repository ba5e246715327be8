"""Streaming sink writer: files / memory / kafka / foreachBatch with
checkpointing and triggers."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamWriteOptions:
    output_mode: str = "append"  # append|update|complete
    checkpoint_location: str | None = None
    trigger: dict[str, Any] = field(default_factory=dict)  # e.g. {"availableNow": True}
    query_name: str | None = None
    options: dict[str, Any] = field(default_factory=dict)


@dataclass
class StreamDFWriter:
    format: Any = None            # FileFormat for file sinks, or str sink name
    target_path: str | None = None
    options: StreamWriteOptions = field(default_factory=StreamWriteOptions)
    foreach_batch: Callable[[DataFrame, int], None] | None = None

    def run(self, df: DataFrame) -> StreamingQuery:
        if not df.isStreaming:
            raise ValueError("StreamDFWriter requires a streaming DataFrame")
        opts = self.options
        writer = df.writeStream.outputMode(opts.output_mode)

        if self.foreach_batch is not None:
            writer = writer.foreachBatch(self.foreach_batch)
        elif isinstance(self.format, str):
            writer = writer.format(self.format)
        else:
            writer = writer.format(self.format.name).options(**self.format.writer_options())

        if opts.checkpoint_location:
            writer = writer.option("checkpointLocation", opts.checkpoint_location)
        for k, v in opts.options.items():
            writer = writer.option(k, str(v))
        if opts.query_name:
            writer = writer.queryName(opts.query_name)
        if opts.trigger:
            writer = writer.trigger(**opts.trigger)
        if self.target_path and self.foreach_batch is None and not isinstance(self.format, str):
            return writer.start(self.target_path)
        return writer.start()
