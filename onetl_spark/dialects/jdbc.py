"""Per-RDBMS dialects: literal serialization, LIMIT variants, hash/mod
partition expressions, identifier escaping.

Semantics match the reference (file:line cited per method):

- Postgres: ``'...'::timestamp`` literals (postgres/dialect.py:21-27),
  ``abs(hashtext(col::text)) % N`` hash (postgres/dialect.py:12).
- Oracle: ``TO_DATE/TO_TIMESTAMP`` literals (oracle/dialect.py:54-61),
  ``ora_hash(col, N-1)`` (oracle/dialect.py:45), ``ROWNUM <= n`` limit
  (oracle/dialect.py:11-36).
- MySQL: ``STR_TO_DATE`` literals (mysql/dialect.py:23-29), MD5→CONV hash
  (mysql/dialect.py:11), backtick escaping (mysql/dialect.py:18).
- MSSQL: ``CAST('...' AS datetime2)`` (mssql/dialect.py:44-51),
  ``ABS(BINARY_CHECKSUM(col)) % N`` (mssql/dialect.py:11), ``SELECT TOP n``
  (mssql/dialect.py:21-38).
- ClickHouse: ``toDateTime64`` (clickhouse/dialect.py:33-41),
  ``sipHash64(col) % N`` (clickhouse/dialect.py:12), ``minOrNull/maxOrNull``
  (clickhouse/dialect.py:23-31).
"""

from __future__ import annotations

from datetime import date, datetime
from typing import Iterable

from onetl_spark.dialects.base import Dialect


class PostgresDialect(Dialect):
    name = "postgres"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"'{value.isoformat()}'::timestamp"

    def _serialize_date(self, value: date) -> str:
        return f"'{value.isoformat()}'::date"

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        return f"abs(hashtext({partition_column}::text)) % {num_partitions}"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"{partition_column} % {num_partitions}"


class GreenplumDialect(PostgresDialect):
    """Greenplum shares the Postgres wire dialect; scans apply where/columns/
    limit as post-load DataFrame ops (greenplum/connection.py:321-352)."""

    name = "greenplum"
    supports_hint = False


class MySQLDialect(Dialect):
    name = "mysql"

    def escape_column(self, value: str) -> str:
        return f"`{value}`"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"STR_TO_DATE('{value.strftime('%Y-%m-%d %H:%M:%S.%f')}', '%Y-%m-%d %H:%i:%s.%f')"

    def _serialize_date(self, value: date) -> str:
        return f"STR_TO_DATE('{value.isoformat()}', '%Y-%m-%d')"

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        return f"CONV(CONCAT(SUBSTR(MD5({partition_column}), 1, 16)), 16, 10) % {num_partitions}"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"{partition_column} % {num_partitions}"


class MSSQLDialect(Dialect):
    name = "mssql"

    def escape_column(self, value: str) -> str:
        return f"[{value}]"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"CAST('{value.isoformat()}' AS datetime2)"

    def _serialize_date(self, value: date) -> str:
        return f"CAST('{value.isoformat()}' AS date)"

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        return f"ABS(BINARY_CHECKSUM({partition_column})) % {num_partitions}"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"ABS({partition_column} % {num_partitions})"

    def _apply_limit(self, query: str, limit: int, compact: bool) -> str:
        # SELECT TOP n — injected right after SELECT (+hint)
        if query.startswith("SELECT"):
            head, rest = query[:6], query[6:]
            return f"{head} TOP {limit}{rest}"
        return query


class OracleDialect(Dialect):
    name = "oracle"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"TO_TIMESTAMP('{value.strftime('%Y-%m-%d %H:%M:%S.%f')}', 'YYYY-MM-DD HH24:MI:SS.FF6')"

    def _serialize_date(self, value: date) -> str:
        return f"TO_DATE('{value.isoformat()}', 'YYYY-MM-DD')"

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        return f"ora_hash({partition_column}, {num_partitions - 1})"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"MOD({partition_column}, {num_partitions})"

    def get_sql_query(
        self,
        table: str,
        columns: list[str] | None = None,
        where: str | Iterable[str] | None = None,
        hint: str | None = None,
        limit: int | None = None,
        compact: bool = False,
    ) -> str:
        # ROWNUM <= n joins the WHERE list instead of a LIMIT clause
        if isinstance(where, str):
            where = [where]
        where = [c for c in (where or []) if c]
        if limit is not None and limit > 0:
            where.append(f"ROWNUM <= {limit}")
            limit = None
        return super().get_sql_query(table, columns, where, hint, limit, compact)

    def _apply_limit(self, query: str, limit: int, compact: bool) -> str:
        return query  # handled in get_sql_query


class DerbyDialect(Dialect):
    """Apache Derby (embedded). Not part of the reference's store matrix —
    included because Spark bundles the Derby jars (metastore), making it
    the zero-dependency LIVE target for integration-testing the generic
    JDBC read/write/fetch/execute machinery (tests/test_jdbc_derby.py).
    """

    name = "derby"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"TIMESTAMP('{value.strftime('%Y-%m-%d %H:%M:%S.%f')}')"

    def _serialize_date(self, value: date) -> str:
        return f"DATE('{value.isoformat()}')"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        # Derby has no % operator; MOD() of a possibly-negative int stays
        # negative, so shift into [0, N)
        return f"ABS(MOD({partition_column}, {num_partitions}))"

    def get_sql_query(
        self,
        table: str,
        columns: list[str] | None = None,
        where: str | Iterable[str] | None = None,
        hint: str | None = None,
        limit: int | None = None,
        compact: bool = False,
    ) -> str:
        # Derby rejects a bare `*` mixed with other select items (as the
        # hash/mod partition-column injection produces): qualify it
        if columns and len(columns) > 1:
            columns = [f"{table}.*" if c == "*" else c for c in columns]
        return super().get_sql_query(table, columns, where, hint, limit, compact)

    def _apply_limit(self, query: str, limit: int, compact: bool) -> str:
        sep = " " if compact else chr(10)
        return f"{query}{sep}FETCH FIRST {limit} ROWS ONLY"


class ClickhouseDialect(Dialect):
    name = "clickhouse"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"toDateTime64('{value.strftime('%Y-%m-%d %H:%M:%S.%f')}', 6)"

    def _serialize_date(self, value: date) -> str:
        return f"toDate('{value.isoformat()}')"

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        return f"sipHash64({partition_column}) % {num_partitions}"

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"{partition_column} % {num_partitions}"

    def get_min_max_query(self, table: str, expression: str, where=None) -> str:
        columns = [
            self.aliased(f"minOrNull({expression})", self.escape_column("min")),
            self.aliased(f"maxOrNull({expression})", self.escape_column("max")),
        ]
        return self.get_sql_query(table, columns=columns, where=where, compact=True)
