"""MongoDB connection: $match-pipeline pushdown + arbitrary pipelines.

Reference: onetl/connection/db_connection/mongodb/connection.py:442-478
(scan with ``where`` dict merged with the HWM window into a ``$match``
stage), :224-359 (``pipeline()`` passthrough), mongodb/dialect.py:99-159
(pipeline serialization, ``$gt/$gte/$lt/$lte`` window edges, ``{"$date":
iso}`` datetime literals). ``df_schema`` is REQUIRED
(dialect_mixins/requires_df_schema.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from onetl_spark.dialects.base import Dialect
from onetl_spark.hooks import slot, support_hooks
from onetl_spark.hwm.window import Window


class MongoDBDialect(Dialect):
    name = "mongodb"
    supports_columns = False
    supports_hint = True
    supports_where = True
    supports_df_schema = True
    requires_df_schema = True
    supports_schema_qualified_name = False

    def serialize_json_value(self, value: Any) -> Any:
        if isinstance(value, datetime):
            return {"$date": value.astimezone().isoformat() if value.tzinfo else value.isoformat() + "Z"}
        if isinstance(value, date):
            return {"$date": f"{value.isoformat()}T00:00:00Z"}
        return value

    def window_match(self, window: Window | None) -> dict:
        if window is None or not window.is_set:
            return {}
        ops = {}
        start, stop = window.start_from, window.stop_at
        if start.is_set:
            ops["$gte" if start.including else "$gt"] = self.serialize_json_value(start.value)
        if stop.is_set:
            ops["$lte" if stop.including else "$lt"] = self.serialize_json_value(stop.value)
        return {window.expression: ops}

    def build_match(self, where: dict | None, window: Window | None) -> dict:
        """Merge a user filter dict with HWM window edges → one $match doc."""
        clauses = [c for c in (where, self.window_match(window)) if c]
        if not clauses:
            return {}
        if len(clauses) == 1:
            return clauses[0]
        return {"$and": clauses}

    def serialize_pipeline(self, pipeline: list | dict) -> str:
        return json.dumps(pipeline, default=str)


@support_hooks
@dataclass
class MongoDB:
    spark: SparkSession
    host: str = ""
    port: int = 27017
    user: str | None = None
    password: str | None = None
    database: str = ""
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self.dialect = MongoDBDialect()

    @property
    def connection_url(self) -> str:
        auth = f"{self.user}:{self.password}@" if self.user else ""
        params = "&".join(f"{k}={v}" for k, v in self.extra.items())
        tail = f"?{params}" if params else ""
        return f"mongodb://{auth}{self.host}:{self.port}/{tail}"

    def read_plan(
        self,
        source: str,
        where: dict | None = None,
        hint: dict | None = None,
        window: Window | None = None,
        limit: int | None = None,
    ) -> list[dict]:
        """Aggregation pipeline for a scan — pure synthesis, unit-testable."""
        pipeline: list[dict] = []
        match = self.dialect.build_match(where, window)
        if match:
            pipeline.append({"$match": match})
        if hint:
            # hint is passed as a connector option, not a pipeline stage;
            # kept here for visibility in tests
            pass
        if limit is not None:
            pipeline.append({"$limit": int(limit)})
        return pipeline

    @slot
    def read_source_as_df(
        self,
        source: str,
        columns=None,
        hint: dict | None = None,
        where: dict | None = None,
        df_schema: StructType | None = None,
        window: Window | None = None,
        limit: int | None = None,
        options: Any = None,
    ) -> DataFrame:
        if df_schema is None:
            raise ValueError("MongoDB requires df_schema")
        pipeline = self.read_plan(source, where, hint, window, limit)
        return self.pipeline(source, pipeline, df_schema, options)

    @slot
    def pipeline(
        self,
        collection: str,
        pipeline: list | dict,
        df_schema: StructType | None = None,
        options: Any = None,
    ) -> DataFrame:
        if isinstance(pipeline, dict):
            pipeline = [pipeline]
        reader = (
            self.spark.read.format("mongodb")
            .option("connection.uri", self.connection_url)
            .option("database", self.database)
            .option("collection", collection)
        )
        if pipeline:
            reader = reader.option("aggregation.pipeline", self.dialect.serialize_pipeline(pipeline))
        if df_schema is not None:
            reader = reader.schema(df_schema)
        for k, v in (options or {}).items():
            reader = reader.option(k, str(v))
        return reader.load()

    WRITE_MODES = {"append", "replace_entire_collection", "error", "ignore"}

    @slot
    def write_df_to_target(self, df: DataFrame, target: str, options: Any = None) -> None:
        opts = dict(options or {})
        mode = opts.pop("if_exists", "append")
        if mode not in self.WRITE_MODES:
            raise ValueError(f"Unknown if_exists mode: {mode!r}")
        spark_mode = "overwrite" if mode == "replace_entire_collection" else "append"
        writer = (
            df.write.format("mongodb")
            .option("connection.uri", self.connection_url)
            .option("database", self.database)
            .option("collection", target)
        )
        for k, v in opts.items():
            writer = writer.option(k, str(v))
        writer.mode(spark_mode).save()

    def get_min_max_values(self, source: str, window: Window, hint=None, where=None, options=None):
        pipeline = [
            {"$match": self.dialect.build_match(where, None)} if where else None,
            {
                "$group": {
                    "_id": 1,
                    "min": {"$min": f"${window.expression}"},
                    "max": {"$max": f"${window.expression}"},
                },
            },
        ]
        pipeline = [p for p in pipeline if p]
        from pyspark.sql.types import LongType, StructField, StructType as ST

        schema = ST([StructField("min", LongType()), StructField("max", LongType())])
        row = self.pipeline(source, pipeline, schema).collect()
        if not row:
            return None, None
        return row[0]["min"], row[0]["max"]

    @classmethod
    def get_packages(cls, scala_version: str = "2.13") -> list[str]:
        return [f"org.mongodb.spark:mongo-spark-connector_{scala_version}:10.4.0"]
