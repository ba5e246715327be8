from onetl_spark.streaming.reader import StreamDFReader
from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions
from onetl_spark.streaming.ops import (
    deduplicate_stream,
    sessionize,
    stateful_running_agg,
    windowed_aggregate,
)

__all__ = [
    "StreamDFReader",
    "StreamDFWriter",
    "StreamWriteOptions",
    "windowed_aggregate",
    "deduplicate_stream",
    "sessionize",
    "stateful_running_agg",
]
