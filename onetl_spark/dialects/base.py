"""Generic SQL dialect: query-fragment builders.

This is the engine's "planner" layer, matching the reference's semantics:

- ``get_sql_query`` renders ``SELECT /*+hint*/ cols FROM t [WHERE ...]
  [LIMIT n]``; ``limit == 0`` becomes ``WHERE 1=0``; multiple predicates
  are AND-chained (onetl/connection/db_connection/db_connection/dialect.py:22-69).
- ``apply_window`` merges user ``where`` with HWM window edges into a list
  of ANDed conditions (dialect.py:71-81).
- Edge rendering: ``including=True`` → ``>=``/``<=``, else ``>``/``<``
  (dialect.py:103-121).
- Literal serialization per store (dialect.py:136-148 generic fallback).
- MIN/MAX probe query (dialect.py:89-101).
- ``get_partition_column_hash`` / ``_mod`` for parallel-scan partition
  expressions (per-store overrides, see jdbc dialects).

Everything here is pre-Catalyst query construction; the rendered SQL is
handed to ``spark.sql`` or a JDBC subquery and Spark optimizes the rest.
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal
from typing import Any, Iterable

from onetl_spark.hwm.window import Edge, Window


class Dialect:
    """Capability flags + SQL fragment rendering. Subclass per store."""

    name: str = "generic"

    # capability matrix (reference dialect_mixins/*, SURVEY §2.2)
    supports_columns: bool = True
    supports_where: bool = True
    supports_hint: bool = True
    supports_df_schema: bool = False
    requires_df_schema: bool = False
    supports_schema_qualified_name: bool = True

    # --- identifiers -----------------------------------------------------

    def escape_column(self, value: str) -> str:
        return f'"{value}"'

    def aliased(self, expression: str, alias: str) -> str:
        return f"{expression} AS {alias}"

    # --- literals --------------------------------------------------------

    def serialize_value(self, value: Any) -> str:
        """Render a Python value as a dialect SQL literal."""
        if value is None:
            return "NULL"
        if isinstance(value, bool):
            return "TRUE" if value else "FALSE"
        if isinstance(value, (int, float, Decimal)):
            return str(value)
        if isinstance(value, datetime):
            return self._serialize_datetime(value)
        if isinstance(value, date):
            return self._serialize_date(value)
        escaped = str(value).replace("'", "''")
        return f"'{escaped}'"

    def _serialize_datetime(self, value: datetime) -> str:
        return f"'{value.isoformat()}'"

    def _serialize_date(self, value: date) -> str:
        return f"'{value.isoformat()}'"

    # --- predicates ------------------------------------------------------

    def condition_ge(self, expr: str, value: Any) -> str:
        return f"{expr} >= {self.serialize_value(value)}"

    def condition_gt(self, expr: str, value: Any) -> str:
        return f"{expr} > {self.serialize_value(value)}"

    def condition_le(self, expr: str, value: Any) -> str:
        return f"{expr} <= {self.serialize_value(value)}"

    def condition_lt(self, expr: str, value: Any) -> str:
        return f"{expr} < {self.serialize_value(value)}"

    def window_conditions(self, window: Window | None) -> list[str]:
        """Edge(value, including) → comparison predicates."""
        conditions: list[str] = []
        if window is None:
            return conditions
        start, stop = window.start_from, window.stop_at
        if start.is_set:
            fn = self.condition_ge if start.including else self.condition_gt
            conditions.append(fn(window.expression, start.value))
        if stop.is_set:
            fn = self.condition_le if stop.including else self.condition_lt
            conditions.append(fn(window.expression, stop.value))
        return conditions

    def apply_window(
        self,
        where: str | Iterable[str] | None = None,
        window: Window | None = None,
    ) -> list[str]:
        """Merge user filter(s) with HWM window edges → ANDed condition list."""
        conditions: list[str] = []
        if where:
            if isinstance(where, str):
                conditions.append(where)
            else:
                conditions.extend(where)
        conditions.extend(self.window_conditions(window))
        return [c for c in conditions if c]

    # --- query rendering -------------------------------------------------

    def get_sql_query(
        self,
        table: str,
        columns: list[str] | None = None,
        where: str | Iterable[str] | None = None,
        hint: str | None = None,
        limit: int | None = None,
        compact: bool = False,
    ) -> str:
        """Render a full SELECT statement.

        ``limit == 0`` short-circuits to ``WHERE 1 = 0`` (empty-source
        sentinel used by HWM planning), matching dialect.py:30-36.
        """
        if isinstance(where, str):
            where = [where]
        where = [c for c in (where or []) if c]

        if limit == 0:
            where = ["1 = 0"]
            limit = None

        columns = list(columns) if columns else ["*"]
        hint_str = f" /*+ {hint} */" if hint else ""

        if compact:
            query = f"SELECT{hint_str} {', '.join(columns)} FROM {table}"
            if where:
                query += " WHERE " + " AND ".join(f"({c})" for c in where)
        else:
            nl, pad = "\n", " " * 7
            cols = f",{nl}".join(f"{pad}{c}" for c in columns)
            query = f"SELECT{hint_str}{nl}{cols}{nl}FROM{nl}{pad}{table}"
            if where:
                joined = f"{nl}{pad}AND ".join(f"({c})" for c in where)
                query += f"{nl}WHERE{nl}{pad}{joined}"

        if limit is not None:
            query = self._apply_limit(query, limit, compact)
        return query

    def _apply_limit(self, query: str, limit: int, compact: bool) -> str:
        return f"{query}{' ' if compact else chr(10)}LIMIT {limit}"

    def get_min_max_query(self, table: str, expression: str, where: Iterable[str] | None = None) -> str:
        """``SELECT MIN(expr) AS min, MAX(expr) AS max FROM t [WHERE ...]``."""
        columns = [
            self.aliased(f"MIN({expression})", self.escape_column("min")),
            self.aliased(f"MAX({expression})", self.escape_column("max")),
        ]
        return self.get_sql_query(table, columns=columns, where=where, compact=True)

    # --- parallel-scan partition expressions -------------------------------

    def get_partition_column_hash(self, partition_column: str, num_partitions: int) -> str:
        raise NotImplementedError(f"hash partitioning is not supported by {self.name} dialect")

    def get_partition_column_mod(self, partition_column: str, num_partitions: int) -> str:
        return f"abs({partition_column} % {num_partitions})"
