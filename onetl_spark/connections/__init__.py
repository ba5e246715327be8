from onetl_spark.connections.sparksql import SparkSQLConnection, Hive
from onetl_spark.connections.catalog import register_parquet_views, drop_table_completely
from onetl_spark.connections.jdbc import (
    JDBCConnection,
    JDBCReadOptions,
    JDBCWriteOptions,
    Postgres,
    MySQL,
    MSSQL,
    Oracle,
    Clickhouse,
    Derby,
)
from onetl_spark.connections.greenplum import Greenplum
from onetl_spark.connections.kafka import Kafka
from onetl_spark.connections.mongodb import MongoDB
from onetl_spark.connections.iceberg import Iceberg

__all__ = [
    "SparkSQLConnection",
    "Hive",
    "register_parquet_views",
    "drop_table_completely",
    "JDBCConnection",
    "JDBCReadOptions",
    "JDBCWriteOptions",
    "Postgres",
    "MySQL",
    "MSSQL",
    "Oracle",
    "Clickhouse",
    "Derby",
    "Greenplum",
    "Kafka",
    "MongoDB",
    "Iceberg",
]
