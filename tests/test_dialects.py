from datetime import date, datetime

import pytest

from onetl_spark.dialects import (
    ClickhouseDialect,
    Dialect,
    MSSQLDialect,
    MySQLDialect,
    OracleDialect,
    PostgresDialect,
    SparkSQLDialect,
)
from onetl_spark.hwm.window import Edge, Window


def test_get_sql_query_basic():
    q = Dialect().get_sql_query("schema.table", compact=True)
    assert q == "SELECT * FROM schema.table"


def test_get_sql_query_full():
    q = Dialect().get_sql_query(
        "t",
        columns=["a", "b AS c"],
        where=["a > 1", "b < 2"],
        hint="INDEX(t i)",
        limit=10,
        compact=True,
    )
    assert q == "SELECT /*+ INDEX(t i) */ a, b AS c FROM t WHERE (a > 1) AND (b < 2) LIMIT 10"


def test_limit_zero_sentinel():
    q = Dialect().get_sql_query("t", limit=0, compact=True)
    assert q == "SELECT * FROM t WHERE (1 = 0)"


def test_multiline_rendering():
    q = Dialect().get_sql_query("t", columns=["a", "b"], where=["a > 1"], limit=5)
    assert "SELECT" in q and "FROM" in q and "WHERE" in q and "LIMIT 5" in q
    assert q.splitlines()[0] == "SELECT"


def test_window_conditions():
    d = Dialect()
    w = Window("col", start_from=Edge(5, including=False), stop_at=Edge(10, including=True))
    assert d.window_conditions(w) == ["col > 5", "col <= 10"]
    w2 = Window("col", start_from=Edge(5, including=True), stop_at=Edge(10, including=False))
    assert d.window_conditions(w2) == ["col >= 5", "col < 10"]
    assert d.window_conditions(Window("col")) == []


def test_apply_window_merges_where():
    d = Dialect()
    w = Window("col", stop_at=Edge(10))
    assert d.apply_window("a = 1", w) == ["a = 1", "col <= 10"]
    assert d.apply_window(["a = 1", "b = 2"], None) == ["a = 1", "b = 2"]


def test_literal_serialization_per_dialect():
    dt = datetime(2026, 1, 2, 3, 4, 5, 123456)
    d_ = date(2026, 1, 2)
    assert PostgresDialect().serialize_value(dt) == "'2026-01-02T03:04:05.123456'::timestamp"
    assert PostgresDialect().serialize_value(d_) == "'2026-01-02'::date"
    assert OracleDialect().serialize_value(d_) == "TO_DATE('2026-01-02', 'YYYY-MM-DD')"
    assert "TO_TIMESTAMP" in OracleDialect().serialize_value(dt)
    assert MySQLDialect().serialize_value(d_).startswith("STR_TO_DATE")
    assert MSSQLDialect().serialize_value(dt) == "CAST('2026-01-02T03:04:05.123456' AS datetime2)"
    assert ClickhouseDialect().serialize_value(dt) == "toDateTime64('2026-01-02 03:04:05.123456', 6)"
    assert SparkSQLDialect().serialize_value(d_) == "DATE '2026-01-02'"
    assert Dialect().serialize_value("o'brien") == "'o''brien'"
    assert Dialect().serialize_value(None) == "NULL"
    assert Dialect().serialize_value(True) == "TRUE"


def test_limit_variants():
    assert (
        MSSQLDialect().get_sql_query("t", columns=["a"], limit=7, compact=True)
        == "SELECT TOP 7 a FROM t"
    )
    q = OracleDialect().get_sql_query("t", where=["a > 1"], limit=7, compact=True)
    assert q == "SELECT * FROM t WHERE (a > 1) AND (ROWNUM <= 7)"


def test_hash_mod_partition_expressions():
    assert PostgresDialect().get_partition_column_hash("id", 10) == "abs(hashtext(id::text)) % 10"
    assert OracleDialect().get_partition_column_hash("id", 10) == "ora_hash(id, 9)"
    assert ClickhouseDialect().get_partition_column_hash("id", 10) == "sipHash64(id) % 10"
    assert MSSQLDialect().get_partition_column_hash("id", 10) == "ABS(BINARY_CHECKSUM(id)) % 10"
    assert "MD5" in MySQLDialect().get_partition_column_hash("id", 10)
    assert SparkSQLDialect().get_partition_column_hash("id", 10) == "pmod(hash(id), 10)"
    assert Dialect().get_partition_column_mod("id", 4) == "abs(id % 4)"
    with pytest.raises(NotImplementedError):
        Dialect().get_partition_column_hash("id", 4)


def test_min_max_query():
    q = Dialect().get_min_max_query("t", "id", where=["a = 1"])
    assert q == 'SELECT MIN(id) AS "min", MAX(id) AS "max" FROM t WHERE (a = 1)'
    qc = ClickhouseDialect().get_min_max_query("t", "id")
    assert "minOrNull(id)" in qc and "maxOrNull(id)" in qc


def test_dialect_sql_matches_golden_file():
    """Verbatim golden-file pin of the full (dialect x operation) rendered-
    SQL matrix (tools/dialect_golden.py): the sandbox cannot integration-
    test named dialects against live servers, so the rendered SQL IS the
    per-dialect contract. Regenerate intentionally with
    `python tools/dialect_golden.py --write`."""
    import importlib.util
    import json
    import os

    here = os.path.dirname(__file__)
    spec = importlib.util.spec_from_file_location(
        "dialect_golden", os.path.join(here, "..", "tools", "dialect_golden.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    with open(os.path.join(here, "golden", "dialect_sql.json")) as f:
        want = json.load(f)
    got = mod.render_matrix()
    assert got == want, "rendered dialect SQL drifted from tests/golden/dialect_sql.json"
