"""Golden-file parity matrix for the named JDBC dialects.

Renders a fixed matrix of (dialect x operation) SQL fragments and
compares it to the committed golden file ``tests/golden/dialect_sql.json``.
The sandbox has no live Postgres/Oracle/MSSQL/MySQL/ClickHouse/Greenplum
to integration-test per-dialect SQL against (the shared machinery is
live-proven on Derby, tests/test_jdbc_derby.py) — so the rendered SQL
itself is the contract, pinned verbatim so a refactor can't silently
drift it. Reference semantics per dialect (file:line):

- postgres/dialect.py:12 (hashtext), :21-27 (::timestamp literals)
- oracle/dialect.py:11-36 (ROWNUM), :45 (ora_hash), :54-61 (TO_DATE)
- mysql/dialect.py:11 (MD5-CONV), :18 (backticks), :23-29 (STR_TO_DATE)
- mssql/dialect.py:11 (BINARY_CHECKSUM), :21-38 (TOP), :44-51 (datetime2)
- clickhouse/dialect.py:12 (sipHash64), :23-31 (minOrNull), :33-41
  (toDateTime64)

Regenerate after an INTENDED contract change:

    python tools/dialect_golden.py --write
"""

from __future__ import annotations

import json
import os
import sys
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_PATH = os.path.join(REPO, "tests", "golden", "dialect_sql.json")

_DT = datetime(2026, 1, 2, 3, 4, 5, 123456)
_DATE = date(2026, 1, 2)


def _dialects():
    from onetl_spark.dialects import (
        ClickhouseDialect,
        DerbyDialect,
        Dialect,
        GreenplumDialect,
        MSSQLDialect,
        MySQLDialect,
        OracleDialect,
        PostgresDialect,
        SparkSQLDialect,
    )

    return [
        Dialect(),
        PostgresDialect(),
        GreenplumDialect(),
        MySQLDialect(),
        MSSQLDialect(),
        OracleDialect(),
        ClickhouseDialect(),
        DerbyDialect(),
        SparkSQLDialect(),
    ]


def render_matrix() -> dict[str, dict[str, str]]:
    """dialect name -> {operation: rendered SQL} for a fixed input matrix."""
    from onetl_spark.hwm.window import Edge, Window

    out: dict[str, dict[str, str]] = {}
    for d in _dialects():
        ops: dict[str, str] = {}
        ops["select_plain"] = d.get_sql_query("sch.tbl", compact=True)
        ops["select_cols_where_limit"] = d.get_sql_query(
            "sch.tbl",
            columns=["id", "name"],
            where=["id > 10", "name IS NOT NULL"],
            limit=7,
            compact=True,
        )
        if d.supports_hint:
            ops["select_hint"] = d.get_sql_query(
                "tbl", hint="INDEX(tbl idx)", columns=["id"], compact=True
            )
        ops["select_limit_zero"] = d.get_sql_query("tbl", limit=0, compact=True)
        ops["min_max_probe"] = d.get_min_max_query("tbl", "id", where=["grp = 1"])
        try:
            ops["partition_hash"] = d.get_partition_column_hash("id", 10)
        except NotImplementedError:
            ops["partition_hash"] = "<not supported>"
        ops["partition_mod"] = d.get_partition_column_mod("id", 10)
        ops["window_predicates"] = " AND ".join(
            d.apply_window(
                "grp = 1",
                Window("id", start_from=Edge(10, including=False), stop_at=Edge(99)),
            )
        )
        ops["lit_datetime"] = d.serialize_value(_DT)
        ops["lit_date"] = d.serialize_value(_DATE)
        ops["lit_str_quote"] = d.serialize_value("o'brien")
        ops["lit_none"] = d.serialize_value(None)
        ops["lit_bool"] = d.serialize_value(True)
        ops["lit_decimal"] = d.serialize_value(Decimal("12.340"))
        ops["escaped_column"] = d.escape_column("order")
        out[d.name] = ops
    return out


def main() -> None:
    got = render_matrix()
    if "--write" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {GOLDEN_PATH} ({sum(len(v) for v in got.values())} entries)")
        return
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    if got != want:
        for name in sorted(set(got) | set(want)):
            for op in sorted(set(got.get(name, {})) | set(want.get(name, {}))):
                g, w = got.get(name, {}).get(op), want.get(name, {}).get(op)
                if g != w:
                    print(f"DRIFT {name}.{op}:\n  golden: {w}\n  now:    {g}")
        sys.exit(1)
    print("dialect SQL matches golden file")


if __name__ == "__main__":
    main()
