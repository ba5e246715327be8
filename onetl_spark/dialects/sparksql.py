"""Spark SQL dialect — used by the Hive/Iceberg/local-catalog connections.

Rendering follows the Hive path of the reference
(onetl/connection/db_connection/hive/connection.py:322-341): the SELECT is
built as a string and executed with ``spark.sql``, so Catalyst handles
pushdown, pruning, and codegen.
"""

from __future__ import annotations

from datetime import date, datetime

from onetl_spark.dialects.base import Dialect


class SparkSQLDialect(Dialect):
    name = "sparksql"

    def escape_column(self, value: str) -> str:
        return f"`{value}`"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S.%f')}'"

    def _serialize_date(self, value: date) -> str:
        return f"DATE '{value.isoformat()}'"

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        return f"pmod(hash({partition_column}), {num_partitions})"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"pmod({partition_column}, {num_partitions})"
