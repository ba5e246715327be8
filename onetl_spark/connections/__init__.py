from onetl_spark.connections.sparksql import SparkSQLConnection, Hive
from onetl_spark.connections.catalog import register_parquet_views

__all__ = ["SparkSQLConnection", "Hive", "register_parquet_views"]
