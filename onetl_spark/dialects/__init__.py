from onetl_spark.dialects.base import Dialect
from onetl_spark.dialects.jdbc import (
    ClickhouseDialect,
    DerbyDialect,
    GreenplumDialect,
    MSSQLDialect,
    MySQLDialect,
    OracleDialect,
    PostgresDialect,
)
from onetl_spark.dialects.sparksql import SparkSQLDialect

__all__ = [
    "Dialect",
    "SparkSQLDialect",
    "PostgresDialect",
    "MySQLDialect",
    "MSSQLDialect",
    "OracleDialect",
    "ClickhouseDialect",
    "GreenplumDialect",
    "DerbyDialect",
]
