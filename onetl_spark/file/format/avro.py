"""Avro format + parse/serialize columns.

Reference: onetl/file/format/avro.py:51; needs the spark-avro package
(avro.py:299); ``parse_column`` → ``from_avro`` (avro.py:326-428),
``serialize_column`` → ``to_avro`` (avro.py:430+).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from onetl_spark.file.format.base import FileFormat


@dataclass
class Avro(FileFormat):
    name: str = "avro"
    schema_dict: dict | None = None
    compression: str | None = None

    def reader_options(self) -> dict[str, Any]:
        out = {**self.options}
        if self.compression:
            out["compression"] = self.compression
        if self.schema_dict:
            out["avroSchema"] = json.dumps(self.schema_dict)
        return out

    def check_if_supported(self, spark: SparkSession) -> None:
        try:
            # resolves the registered data source, not just the class (the
            # avro shim classes ship with pyspark but the provider doesn't)
            spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                "avro", spark._jsparkSession.sessionState().conf(),
            )
        except Exception as e:
            raise RuntimeError(
                "Avro requires the spark-avro package "
                "(org.apache.spark:spark-avro_2.13:<spark version> via spark.jars.packages)",
            ) from e

    def parse_column(self, column: str | Column, schema_dict: dict | None = None) -> Column:
        from pyspark.sql.avro.functions import from_avro

        schema = schema_dict or self.schema_dict
        if not schema:
            raise ValueError("Avro.parse_column requires an Avro schema dict")
        col = F.col(column) if isinstance(column, str) else column
        return from_avro(col, json.dumps(schema))

    def serialize_column(self, column: str | Column, schema_dict: dict | None = None) -> Column:
        from pyspark.sql.avro.functions import to_avro

        col = F.col(column) if isinstance(column, str) else column
        schema = schema_dict or self.schema_dict
        return to_avro(col, json.dumps(schema) if schema else None)
