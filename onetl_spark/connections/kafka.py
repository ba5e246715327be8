"""Kafka batch connection.

Batch-only topic reads, matching the reference
(onetl/connection/db_connection/kafka/connection.py:246-289):

- fixed DataFrame schema (key/value binary, topic, partition, offset,
  timestamp, timestampType, optional headers — connection.py:334-377);
- an offset window becomes per-partition ``startingOffsets`` /
  ``endingOffsets`` JSON; partitions unseen by the HWM default to offset 0
  (connection.py:270-276);
- writes validate the column set ⊆ {key,value,topic,partition,headers}
  and honor ``includeHeaders`` (connection.py:292-331);
- only ``expression="offset"`` is a valid HWM (kafka/dialect.py:29-57).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from onetl_spark.dialects.base import Dialect
from onetl_spark.hooks import slot, support_hooks
from onetl_spark.hwm.window import Window

KAFKA_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
WRITE_COLUMNS = {"key", "value", "topic", "partition", "headers"}


class KafkaDialect(Dialect):
    name = "kafka"
    supports_columns = False
    supports_where = False
    supports_hint = False

    def validate_hwm_expression(self, expression: str) -> None:
        if expression != "offset":
            raise ValueError("Kafka HWM supports only expression='offset'")


def kafka_schema(include_headers: bool = False) -> T.StructType:
    fields = [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
    if include_headers:
        fields.append(
            T.StructField(
                "headers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", T.BinaryType()),
                        ],
                    ),
                ),
            ),
        )
    return T.StructType(fields)


def offsets_json(topic: str, per_partition: dict[int, int], default: int | str = 0) -> str:
    """Render startingOffsets/endingOffsets JSON for a topic.

    ``default`` fills partitions present in the dict only; callers pass the
    full partition list. Values: offset int, or -1 (latest) / -2 (earliest).
    """
    return json.dumps({topic: {str(p): int(o) for p, o in sorted(per_partition.items())}})


def starting_offsets_from_hwm(topic: str, hwm_value: dict[int, int] | None, partitions: list[int]) -> str:
    """HWM offsets → startingOffsets JSON; unseen partitions start at 0."""
    # normalize keys defensively: a store round-trip may stringify them, and
    # a str-keyed lookup miss would silently re-read whole topics
    hwm_value = {int(k): int(v) for k, v in (hwm_value or {}).items()}
    return offsets_json(topic, {p: int(hwm_value.get(p, 0)) for p in partitions})


@support_hooks
@dataclass
class Kafka:
    spark: SparkSession
    addresses: list[str] = field(default_factory=list)
    cluster: str = ""
    extra: dict[str, Any] = field(default_factory=dict)
    include_headers: bool = False

    def __post_init__(self):
        self.dialect = KafkaDialect()

    @property
    def bootstrap_servers(self) -> str:
        return ",".join(self.addresses)

    def _common_options(self) -> dict[str, str]:
        opts = {"kafka.bootstrap.servers": self.bootstrap_servers}
        for k, v in self.extra.items():
            key = k if k.startswith("kafka.") else f"kafka.{k}"
            opts[key] = str(v)
        return opts

    def read_options(
        self,
        topic: str,
        window: Window | None = None,
        partitions: list[int] | None = None,
    ) -> dict[str, str]:
        """Spark reader options for a batch topic snapshot; pure synthesis,
        unit-testable without a broker."""
        if "*" in topic or "," in topic:
            raise ValueError("Kafka source must be a single topic name (no wildcards/lists)")
        opts = self._common_options()
        opts["subscribe"] = topic
        opts["includeHeaders"] = "true" if self.include_headers else "false"
        start = window.start_from.value if window and window.start_from.is_set else None
        stop = window.stop_at.value if window and window.stop_at.is_set else None
        if start is not None:
            opts["startingOffsets"] = starting_offsets_from_hwm(topic, dict(start), partitions or sorted(dict(start)))
        else:
            opts["startingOffsets"] = "earliest"
        if stop is not None:
            opts["endingOffsets"] = offsets_json(topic, dict(stop))
        else:
            opts["endingOffsets"] = "latest"
        return opts

    @slot
    def read_source_as_df(
        self,
        source: str,
        columns=None,
        hint=None,
        where=None,
        df_schema=None,
        window: Window | None = None,
        limit: int | None = None,
        options: Any = None,
    ) -> DataFrame:
        opts = self.read_options(source, window)
        reader = self.spark.read.format("kafka")
        for k, v in opts.items():
            reader = reader.option(k, v)
        df = reader.load()
        if not self.include_headers and "headers" in df.columns:
            df = df.drop("headers")
        if limit is not None:
            df = df.limit(limit)
        return df

    def validate_write_columns(self, columns: list[str]) -> None:
        extra_cols = set(columns) - WRITE_COLUMNS
        if extra_cols:
            raise ValueError(
                f"Invalid Kafka write columns {sorted(extra_cols)}; "
                f"allowed: {sorted(WRITE_COLUMNS)}",
            )
        if "value" not in columns:
            raise ValueError("Kafka write requires a 'value' column")
        if "headers" in columns and not self.include_headers:
            raise ValueError("headers column requires include_headers=True")

    @slot
    def write_df_to_target(self, df: DataFrame, target: str, options: Any = None) -> None:
        self.validate_write_columns(df.columns)
        writer = df.write.format("kafka")
        for k, v in self._common_options().items():
            writer = writer.option(k, v)
        writer = writer.option("topic", target)
        writer = writer.option("includeHeaders", "true" if self.include_headers else "false")
        writer.save()

    def plan_incremental_read(
        self,
        topic: str,
        hwm_value: dict[int, int] | None,
        latest_offsets: dict[int, int],
    ) -> tuple[dict[str, str], dict[int, int]]:
        """Incremental offset-window planning (pure synthesis).

        Given the saved ``KeyValueIntHWM`` value (partition → next offset)
        and the broker's current end offsets, returns the Spark reader
        options for the delta window and the NEW HWM value to persist on
        success — the Kafka equivalent of the column-HWM
        ``(hwm, max]`` window (kafka/connection.py:264-281 semantics,
        new partitions start at 0).
        """
        from onetl_spark.hwm.window import Edge, Window

        window = Window(
            "offset",
            start_from=Edge(dict(hwm_value or {})),
            stop_at=Edge(dict(latest_offsets)),
        )
        options = self.read_options(topic, window, partitions=sorted(latest_offsets))
        return options, dict(latest_offsets)

    @classmethod
    def get_packages(cls, spark_version: str = "4.0.0", scala_version: str = "2.13") -> list[str]:
        return [f"org.apache.spark:spark-sql-kafka-0-10_{scala_version}:{spark_version}"]
