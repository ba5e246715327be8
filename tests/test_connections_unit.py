"""Unit tests for JDBC/Kafka/MongoDB/Greenplum query+option synthesis —
the reference's unit-test strategy (SURVEY §5: SQL-fragment rendering per
dialect against a mocked/real session, no live services)."""

import json

import pytest

from onetl_spark.connections.jdbc import (
    Clickhouse,
    JDBCReadOptions,
    JDBCWriteOptions,
    MSSQL,
    MySQL,
    Oracle,
    Postgres,
)
from onetl_spark.connections.kafka import Kafka, kafka_schema, starting_offsets_from_hwm
from onetl_spark.connections.mongodb import MongoDB
from onetl_spark.hwm.window import Edge, Window


@pytest.fixture()
def pg(spark):
    return Postgres(spark, host="db", database="test", user="u", password="p")


def test_jdbc_urls(spark):
    assert Postgres(spark, host="h", database="d").jdbc_url == "jdbc:postgresql://h:5432/d"
    assert MySQL(spark, host="h", database="d").jdbc_url == "jdbc:mysql://h:3306/d"
    assert MSSQL(spark, host="h", database="d").jdbc_url == "jdbc:sqlserver://h:1433;databaseName=d"
    assert Oracle(spark, host="h", sid="XE").jdbc_url == "jdbc:oracle:thin:@h:1521:XE"
    assert (
        Oracle(spark, host="h", service_name="svc").jdbc_url
        == "jdbc:oracle:thin:@//h:1521/svc"
    )
    assert Clickhouse(spark, host="h", database="d").jdbc_url == "jdbc:clickhouse://h:8123/d"


def test_jdbc_fetchsize_default(pg):
    _, opts, _ = pg.get_read_plan("public.t")
    assert opts["fetchsize"] == "100000"
    assert opts["stringtype"] == "unspecified"
    assert opts["driver"] == "org.postgresql.Driver"


def test_jdbc_range_partitioning_options(pg):
    query, opts, alias = pg.get_read_plan(
        "public.t",
        options=JDBCReadOptions(
            partitioning_mode="range",
            partition_column="id",
            num_partitions=10,
            lower_bound=5,
            upper_bound=500,
        ),
    )
    assert alias is None
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "10"
    assert opts["lowerBound"] == "5"
    assert opts["upperBound"] == "500"


def test_jdbc_hash_partitioning_adds_aliased_expr(pg):
    query, opts, alias = pg.get_read_plan(
        "public.t",
        columns=["id", "name"],
        options=JDBCReadOptions(
            partitioning_mode="hash", partition_column="id", num_partitions=8,
        ),
    )
    assert alias and alias.startswith("part_col_")
    assert f"abs(hashtext(id::text)) % 8 AS {alias}" in query
    assert opts["partitionColumn"] == alias
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "8"


def test_jdbc_mod_partitioning(pg):
    query, opts, alias = pg.get_read_plan(
        "public.t",
        options=JDBCReadOptions(partitioning_mode="mod", partition_column="id", num_partitions=4),
    )
    assert f"id % 4 AS {alias}" in query


def test_jdbc_window_and_limit_rendered(pg):
    window = Window("id", start_from=Edge(10, including=False), stop_at=Edge(99, including=True))
    query, _, _ = pg.get_read_plan("public.t", where="x = 1", window=window, limit=7)
    flat = " ".join(query.split())
    assert "(x = 1)" in flat and "(id > 10)" in flat and "(id <= 99)" in flat
    assert flat.endswith("LIMIT 7")


def test_jdbc_write_mode_mapping():
    assert JDBCWriteOptions.MODE_MAP["replace_entire_table"] == "overwrite"
    assert JDBCWriteOptions.MODE_MAP["append"] == "append"
    assert set(JDBCWriteOptions.MODE_MAP) == {"append", "ignore", "error", "replace_entire_table"}


def test_get_packages():
    assert Postgres.get_packages() == ["org.postgresql:postgresql:42.7.4"]
    assert any("mssql-jdbc" in p for p in MSSQL.get_packages())
    assert any("spark-sql-kafka" in p for p in Kafka.get_packages())
    assert any("mongo-spark-connector" in p for p in MongoDB.get_packages())


# --- Kafka -------------------------------------------------------------------


def test_kafka_schema_fixed():
    names = [f.name for f in kafka_schema()]
    assert names == ["key", "value", "topic", "partition", "offset", "timestamp", "timestampType"]
    with_headers = [f.name for f in kafka_schema(include_headers=True)]
    assert with_headers[-1] == "headers"


def test_kafka_offset_window_json(spark):
    k = Kafka(spark, addresses=["b1:9092", "b2:9092"])
    window = Window(
        "offset",
        start_from=Edge({0: 100, 1: 200}),
        stop_at=Edge({0: 150, 1: 250, 2: 50}),
    )
    opts = k.read_options("events", window, partitions=[0, 1, 2])
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    start = json.loads(opts["startingOffsets"])
    # unseen partition 2 defaults to offset 0 (kafka/connection.py:270-276)
    assert start == {"events": {"0": 100, "1": 200, "2": 0}}
    stop = json.loads(opts["endingOffsets"])
    assert stop == {"events": {"0": 150, "1": 250, "2": 50}}


def test_kafka_topic_validation(spark):
    k = Kafka(spark, addresses=["b:9092"])
    with pytest.raises(ValueError):
        k.read_options("a,b")
    with pytest.raises(ValueError):
        k.read_options("top*")


def test_kafka_write_column_validation(spark):
    k = Kafka(spark, addresses=["b:9092"])
    k.validate_write_columns(["key", "value"])
    with pytest.raises(ValueError):
        k.validate_write_columns(["key"])  # value missing
    with pytest.raises(ValueError):
        k.validate_write_columns(["value", "bogus"])
    with pytest.raises(ValueError):
        k.validate_write_columns(["value", "headers"])  # headers w/o include_headers
    Kafka(spark, addresses=["b:9092"], include_headers=True).validate_write_columns(
        ["value", "headers"],
    )


def test_kafka_hwm_expression():
    from onetl_spark.connections.kafka import KafkaDialect

    KafkaDialect().validate_hwm_expression("offset")
    with pytest.raises(ValueError):
        KafkaDialect().validate_hwm_expression("timestamp")


# --- MongoDB -----------------------------------------------------------------


def test_mongo_match_pipeline(spark):
    from datetime import datetime

    m = MongoDB(spark, host="mongo", database="db")
    window = Window(
        "updated_at",
        start_from=Edge(datetime(2026, 1, 1), including=False),
        stop_at=Edge(datetime(2026, 2, 1), including=True),
    )
    plan = m.read_plan("coll", where={"status": "active"}, window=window, limit=10)
    assert plan[0]["$match"]["$and"][0] == {"status": "active"}
    edges = plan[0]["$match"]["$and"][1]["updated_at"]
    assert edges["$gt"] == {"$date": "2026-01-01T00:00:00Z"}
    assert edges["$lte"] == {"$date": "2026-02-01T00:00:00Z"}
    assert plan[1] == {"$limit": 10}


def test_mongo_requires_schema(spark):
    m = MongoDB(spark, host="mongo", database="db")
    with pytest.raises(ValueError):
        m.read_source_as_df("coll")


def test_mongo_url(spark):
    m = MongoDB(spark, host="mongo", port=27018, user="u", password="p", database="db")
    assert m.connection_url == "mongodb://u:p@mongo:27018/"


# --- Greenplum ---------------------------------------------------------------


def test_greenplum_guard(spark):
    from onetl_spark.connections.greenplum import Greenplum

    g = Greenplum(spark, host="gp", database="db")
    df = spark.range(0, 1000)
    # local[4] session: parallelism far below limits — no raise
    g._check_expected_jobs_number(df, action="read")

    g.CONNECTIONS_EXCEPTION_LIMIT = 1
    from onetl_spark.exceptions import TooManyParallelJobsError

    with pytest.raises(TooManyParallelJobsError):
        g._check_expected_jobs_number(df.repartition(50), action="read")


def test_kafka_incremental_read_planning(spark):
    from onetl_spark.hwm.types import KeyValueIntHWM

    k = Kafka(spark, addresses=["b:9092"])
    hwm = KeyValueIntHWM(name="topic_hwm")
    hwm.update({0: 100, 1: 250})

    # broker reports a new partition 2 and fresh data on 0/1
    latest = {0: 180, 1: 250, 2: 40}
    opts, new_value = k.plan_incremental_read("events", hwm.value, latest)

    start = json.loads(opts["startingOffsets"])["events"]
    stop = json.loads(opts["endingOffsets"])["events"]
    assert start == {"0": 100, "1": 250, "2": 0}  # new partition from 0
    assert stop == {"0": 180, "1": 250, "2": 40}

    hwm.update(new_value)
    assert hwm.value == {0: 180, 1: 250, 2: 40}

    # first run ever: no hwm → everything from 0
    opts2, _ = k.plan_incremental_read("events", None, {0: 10})
    assert json.loads(opts2["startingOffsets"])["events"] == {"0": 0}


# ---------------------------------------------------------------------------
# Oracle PL/SQL compile-error surfacing (ref oracle/connection.py:312-449)


def _err_row(seq, line, pos, text, attr="ERROR"):
    return {
        "OWNER": "SCOTT", "NAME": "MY_PROC", "TYPE": "PROCEDURE",
        "SEQUENCE": seq, "LINE": line, "POSITION": pos,
        "TEXT": text, "ATTRIBUTE": attr,
    }


def test_oracle_parse_compilable_ddl_variants():
    from onetl_spark.connections.oracle_errors import parse_compilable_ddl

    cases = [
        ("CREATE PROCEDURE my_proc AS BEGIN NULL; END;", ("PROCEDURE", "scott", "my_proc")),
        ("CREATE OR REPLACE FUNCTION sc.fn RETURN NUMBER IS BEGIN RETURN 1; END;",
         ("FUNCTION", "sc", "fn")),
        ('create package "SC"."PKG" as end;', ("PACKAGE", "SC", "PKG")),
        ("CREATE OR REPLACE PACKAGE BODY sc.pkg AS END;", ("PACKAGE BODY", "sc", "pkg")),
        ("ALTER TRIGGER sc.trg COMPILE", ("TRIGGER", "sc", "trg")),
        ("CREATE TYPE BODY tb AS END;", ("TYPE BODY", "scott", "tb")),
    ]
    for stmt, expected in cases:
        assert parse_compilable_ddl(stmt, "scott") == expected, stmt
    # non-DDL / non-compilable statements short-circuit
    assert parse_compilable_ddl("SELECT 1 FROM dual", "scott") is None
    assert parse_compilable_ddl("INSERT INTO t VALUES (1)", "scott") is None
    assert parse_compilable_ddl("CREATE TABLE t (a NUMBER)", "scott") is None


def test_oracle_compile_errors_query_filters_and_orders():
    from onetl_spark.connections.oracle_errors import compile_errors_query

    q = compile_errors_query("PACKAGE BODY", "sc", "pkg")
    assert "UPPER(OWNER) = 'SC'" in q
    assert "UPPER(NAME) = 'PKG'" in q
    assert "UPPER(TYPE) = 'PACKAGE BODY'" in q
    assert q.rstrip().endswith("ORDER BY SEQUENCE, LINE, POSITION")


def test_oracle_multirow_messages_merge_and_raise():
    import pytest

    from onetl_spark.connections.oracle_errors import (
        OracleCompileError,
        check_compile_errors,
    )

    rows = [
        _err_row(1, 3, 5, "PLS-00103: Encountered the symbol \"END\" "),
        _err_row(2, 3, 5, "when expecting one of the following:"),
        _err_row(3, 7, 1, "PLW-05016: shadows a definition", attr="WARNING"),
    ]
    queries = []

    def fetch(sql):
        queries.append(sql)
        return rows

    with pytest.raises(OracleCompileError) as exc:
        check_compile_errors("CREATE PROCEDURE my_proc AS BEGIN END;", "scott", fetch)
    msg = str(exc.value)
    # split rows merged into one message at the same coordinates
    assert "PLS-00103" in msg and "when expecting" in msg
    assert "[ERROR] Line 3, position 5:" in msg
    assert "[WARNING] Line 7, position 1:" in msg
    assert len(queries) == 1 and "ALL_ERRORS" in queries[0]


def test_oracle_warning_only_compile_does_not_raise():
    from onetl_spark.connections.oracle_errors import check_compile_errors

    rows = [_err_row(1, 2, 1, "PLW-07203: parameter may benefit from NOCOPY", attr="WARNING")]
    msg = check_compile_errors("CREATE FUNCTION f RETURN NUMBER IS BEGIN RETURN 1; END;", "scott", lambda q: rows)
    assert msg is not None and "[WARNING]" in msg


def test_oracle_clean_compile_and_noncompilable_skip():
    from onetl_spark.connections.oracle_errors import check_compile_errors

    calls = []
    assert check_compile_errors("CREATE PROCEDURE p AS BEGIN NULL; END;", "u", lambda q: calls.append(q) or []) is None
    assert len(calls) == 1
    # plain DML never probes ALL_ERRORS
    assert check_compile_errors("DELETE FROM t", "u", lambda q: (_ for _ in ()).throw(AssertionError)) is None


def test_jdbc_check_probes_driver_and_executor_paths():
    from onetl_spark.connections.jdbc import Postgres

    class Probe(Postgres):
        def __init__(self):
            super().__init__(spark=None, host="h", database="d")
            self.calls = []

        def fetch(self, query, options=None):
            self.calls.append(("driver", query))

            class _R:
                def collect(self):
                    return [1]
            return _R()

        def sql(self, query, options=None):
            self.calls.append(("executor", query))

            class _R:
                def collect(self):
                    return [1]
            return _R()

    p = Probe()
    assert p.check() is p
    assert ("driver", "SELECT 1") in p.calls
    assert ("executor", "SELECT 1") in p.calls


def test_oracle_check_query_uses_dual():
    from onetl_spark.connections.jdbc import JDBCConnection, Oracle

    assert Oracle.CHECK_QUERY == "SELECT 1 FROM DUAL"
    assert JDBCConnection.CHECK_QUERY == "SELECT 1"
