"""Oracle PL/SQL compile-error surfacing.

Oracle swallows PL/SQL compilation failures: ``CREATE PROCEDURE`` with a
syntax error "succeeds" over JDBC and the errors land in the
``ALL_ERRORS`` system view (``SHOW ERRORS`` is a SQL*Plus command, not
available over JDBC). Semantics follow the reference
``onetl/connection/db_connection/oracle/connection.py:312-449``: after
executing a CREATE/ALTER of a compilable object, query ALL_ERRORS for
that object, merge multi-row messages (long messages are split across
rows sharing line/position/severity), log everything, and raise when any
ERROR-severity row exists (WARNING-only compiles succeed with a log).

Everything here is pure (statement parsing, SQL synthesis, row
aggregation, message formatting) so it is fully unit-testable without a
live Oracle; only the ``fetch`` callable passed to
``check_compile_errors`` touches the database.
"""

from __future__ import annotations

import logging
import re
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Mapping

from onetl_spark.exceptions import OnetlSparkError

log = logging.getLogger(__name__)

# multi-word types FIRST: a lazy-prefix regex trying PACKAGE before
# PACKAGE BODY would bind type="PACKAGE", name="BODY" for package bodies
# (the reference's alternation order has exactly that quirk — diverging
# deliberately, covered by tests)
_COMPILABLE_TYPES = (
    "PACKAGE BODY",
    "TYPE BODY",
    "JAVA SOURCE",
    "JAVA CLASS",
    "VIEW",
    "PROCEDURE",
    "FUNCTION",
    "PACKAGE",
    "TRIGGER",
    "TYPE",
    "LIBRARY",
    "DIMENSION",
)

_TYPE_ALT = "|".join(t.replace(" ", r"\s+") for t in _COMPILABLE_TYPES)
_DDL_RE = re.compile(
    rf"^\s*(?:CREATE|ALTER)\b[\s\S]*?\b(?P<type>{_TYPE_ALT})\s+(?P<name>[\w.\"$#]+)",
    re.IGNORECASE,
)


@dataclass(frozen=True, order=True)
class CompileMessagePosition:
    """Identity of one aggregated compiler message."""

    line: int
    position: int
    severity: str  # 'ERROR' | 'WARNING'


def parse_compilable_ddl(statement: str, default_schema: str) -> tuple[str, str, str] | None:
    """``CREATE/ALTER <...> <type> [schema.]name ...`` → (type, schema,
    name), or None for statements that can't produce ALL_ERRORS rows.

    An unqualified object name belongs to the current user's schema.
    """
    match = _DDL_RE.match(statement)
    if not match:
        return None
    type_name = re.sub(r"\s+", " ", match.group("type")).upper()
    full_name = match.group("name")
    schema, dot, obj = full_name.partition(".")
    if not dot:
        schema, obj = default_schema, schema
    return type_name, schema.strip().strip('"') or default_schema, obj.strip().strip('"')


def compile_errors_query(type_name: str, schema: str, object_name: str) -> str:
    """ALL_ERRORS probe for one object, ordered so multi-row messages
    re-assemble in emission order."""
    return (
        "SELECT OWNER, NAME, TYPE, SEQUENCE, LINE, POSITION, TEXT, ATTRIBUTE "
        "FROM ALL_ERRORS "
        f"WHERE UPPER(OWNER) = '{schema.upper()}' "
        f"AND UPPER(NAME) = '{object_name.upper()}' "
        f"AND UPPER(TYPE) = '{type_name.upper()}' "
        "ORDER BY SEQUENCE, LINE, POSITION"
    )


def aggregate_error_rows(
    rows: Iterable[Mapping[str, Any]],
) -> "OrderedDict[CompileMessagePosition, str]":
    """Merge ALL_ERRORS rows into one message per (line, position,
    severity) — Oracle splits long messages across consecutive rows with
    identical coordinates."""
    merged: OrderedDict[CompileMessagePosition, str] = OrderedDict()
    for row in sorted(rows, key=lambda r: (int(r["LINE"]), int(r["POSITION"]), int(r["SEQUENCE"]))):
        key = CompileMessagePosition(
            line=int(row["LINE"]),
            position=int(row["POSITION"]),
            severity=str(row["ATTRIBUTE"]).upper(),
        )
        merged[key] = (merged.get(key, "") + str(row["TEXT"])).rstrip()
    return merged


def format_compile_errors(errors: Mapping[CompileMessagePosition, str]) -> str:
    lines = []
    for pos, text in errors.items():
        lines.append(f"[{pos.severity}] Line {pos.line}, position {pos.position}:")
        for msg_line in text.strip().splitlines():
            lines.append(f"    {msg_line}")
    return "\n".join(lines)


class OracleCompileError(OnetlSparkError):
    """PL/SQL object compiled with ERROR-severity diagnostics."""


def check_compile_errors(
    statement: str,
    default_schema: str,
    fetch: Callable[[str], list[Mapping[str, Any]]],
) -> str | None:
    """Post-execute hook: probe ALL_ERRORS for the object a CREATE/ALTER
    statement (re)compiled. Returns the formatted message (also logged),
    raising ``OracleCompileError`` if any row is ERROR-severity.

    ``fetch(sql)`` must return ALL_ERRORS rows as mappings with keys
    OWNER/NAME/TYPE/SEQUENCE/LINE/POSITION/TEXT/ATTRIBUTE.
    """
    parsed = parse_compilable_ddl(statement, default_schema)
    if parsed is None:
        return None
    type_name, schema, object_name = parsed
    rows = fetch(compile_errors_query(type_name, schema, object_name))
    if not rows:
        return None
    merged = aggregate_error_rows(rows)
    message = format_compile_errors(merged)
    has_error = any(pos.severity == "ERROR" for pos in merged)
    log.log(logging.ERROR if has_error else logging.WARNING, "%s", message)
    if has_error:
        raise OracleCompileError(message)
    return message
