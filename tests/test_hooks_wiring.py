"""Production hook wiring: @support_hooks/@slot applied to real classes.

The reference decorates its public lifecycle methods with @slot
(onetl/db/db_reader/db_reader.py:452,514,550,
jdbc_connection/connection.py:90,109,161,
file_downloader/file_downloader.py:274) so users can bind before/after/
result-replacing hooks; these tests pin the same surface here:
DBReader.run/has_data, DBWriter.run, SparkSQLConnection.sql/check,
FileDownloader.run, FileUploader.run, FileMover.run.
"""

import pytest
from pyspark.sql import DataFrame

from onetl_spark.connections import SparkSQLConnection
from onetl_spark.db import DBReader, DBWriter
from onetl_spark.file.transfer import (
    FileDownloader,
    FileMover,
    FileUploader,
    LocalFileConnection,
)
from onetl_spark.hooks import resume_all_hooks, stop_all_hooks


SLOTS = [
    DBReader.run,
    DBReader.has_data,
    DBReader.raise_if_no_data,
    DBWriter.run,
    SparkSQLConnection.check,
    SparkSQLConnection.sql,
    SparkSQLConnection.execute,
    SparkSQLConnection.read_source_as_df,
    SparkSQLConnection.write_df_to_target,
    FileDownloader.run,
    FileDownloader.view_files,
    FileUploader.run,
    FileMover.run,
]


@pytest.fixture(autouse=True)
def fresh_hooks():
    for s in SLOTS:
        s.hooks.clear()
    resume_all_hooks()
    yield
    for s in SLOTS:
        s.hooks.clear()
    resume_all_hooks()


@pytest.fixture()
def conn(spark, testdata):
    return SparkSQLConnection(spark)


def test_dbreader_before_hook_sees_instance(conn):
    seen = []

    @DBReader.run.bind
    def before(reader):
        seen.append((reader.source, reader.columns))

    df = DBReader(conn, "orders", columns=["o_orderkey"]).run()
    assert seen == [("orders", ["o_orderkey"])]
    assert df.columns == ["o_orderkey"]


def test_dbreader_after_hook_sees_result(conn):
    results = []

    @DBReader.run.bind
    def wrapper(reader):
        result = yield
        results.append(result)

    df = DBReader(conn, "orders").run()
    assert len(results) == 1
    assert isinstance(results[0], DataFrame)
    assert results[0] is df


def test_dbreader_result_replacing_hook(conn):
    @DBReader.run.bind
    def cap_rows(reader):
        result = yield
        yield result.limit(1)

    df = DBReader(conn, "orders").run()
    assert df.count() == 1


def test_dbreader_hooks_disabled_zero_overhead(conn):
    calls = []

    @DBReader.run.bind
    def before(reader):
        calls.append(1)

    stop_all_hooks()
    assert DBReader(conn, "orders").run().columns
    assert calls == []
    resume_all_hooks()
    DBReader(conn, "orders").run()
    assert calls == [1]


def test_dbreader_unbind_removes_hook(conn):
    calls = []

    @DBReader.run.bind
    def before(reader):
        calls.append(1)

    DBReader(conn, "orders").run()
    assert calls == [1]
    DBReader.run.unbind(DBReader.run.hooks[0])
    DBReader(conn, "orders").run()
    assert calls == [1]
    assert DBReader.run.hooks == []


def test_dbreader_skip_hooks_context(conn):
    calls = []

    @DBReader.run.bind
    def before(reader):
        calls.append(1)

    with DBReader.run.skip_hooks():
        DBReader(conn, "orders").run()
    assert calls == []


def test_dbreader_has_data_hook(conn):
    calls = []

    @DBReader.has_data.bind
    def before(reader):
        calls.append(reader.source)

    assert DBReader(conn, "orders").has_data()
    assert calls == ["orders"]


def test_dbwriter_run_hooks(conn, spark, tmp_path):
    events = []

    @DBWriter.run.bind
    def around(writer, df):
        events.append(("before", writer.target))
        yield
        events.append(("after", writer.target))

    df = spark.range(5).withColumnRenamed("id", "v")
    DBWriter(conn, "hooks_sink").run(df)
    try:
        assert events == [("before", "hooks_sink"), ("after", "hooks_sink")]
        assert spark.table("hooks_sink").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS hooks_sink")


def test_connection_sql_and_check_hooks(conn):
    seen = []

    @SparkSQLConnection.sql.bind
    def on_sql(connection, query):
        seen.append(query)

    @SparkSQLConnection.check.bind
    def on_check(connection):
        seen.append("check")

    conn.check()
    df = conn.sql("SELECT 1 AS one")
    assert df.collect()[0].one == 1
    assert seen == ["check", "SELECT 1 AS one"]


def test_read_source_as_df_hook_fires_through_dbreader(conn):
    sources = []

    @SparkSQLConnection.read_source_as_df.bind
    def on_read(connection, **kwargs):
        sources.append(kwargs.get("source"))

    DBReader(conn, "nation").run()
    assert sources == ["nation"]


@pytest.fixture()
def transfer_tree(tmp_path):
    root = tmp_path / "remote"
    root.mkdir()
    (root / "a.csv").write_text("1,2")
    (root / "b.csv").write_text("3,4")
    return str(root)


def test_downloader_run_hooks(transfer_tree, tmp_path):
    events = []

    @FileDownloader.run.bind
    def around(downloader, files=None):
        events.append("before")
        result = yield
        events.append(("after", len(result.successful)))

    dl = FileDownloader(LocalFileConnection(), transfer_tree, str(tmp_path / "local"))
    result = dl.run()
    assert len(result.successful) == 2
    assert events == ["before", ("after", 2)]


def test_downloader_result_replacing_hook(transfer_tree, tmp_path):
    @FileDownloader.run.bind
    def replace(downloader, files=None):
        result = yield
        yield "REPLACED"

    dl = FileDownloader(LocalFileConnection(), transfer_tree, str(tmp_path / "local"))
    assert dl.run() == "REPLACED"


def test_uploader_and_mover_run_hooks(transfer_tree, tmp_path):
    calls = []

    @FileUploader.run.bind
    def on_upload(uploader, files=None):
        calls.append("upload")

    @FileMover.run.bind
    def on_move(mover, files=None):
        calls.append("move")

    up = FileUploader(LocalFileConnection(), transfer_tree, str(tmp_path / "up"))
    assert len(up.run().successful) == 2
    mv = FileMover(LocalFileConnection(), str(tmp_path / "up"), str(tmp_path / "moved"))
    assert len(mv.run().successful) == 2
    assert calls == ["upload", "move"]


def test_filedf_and_remaining_connection_slots_exist():
    """Every remaining production class mirrors the reference's @slot
    surface: FileDF reader/writer run, Mongo read/pipeline/write, Kafka
    read/write, Greenplum + Iceberg overrides."""
    from onetl_spark.connections.greenplum import Greenplum
    from onetl_spark.connections.iceberg import Iceberg
    from onetl_spark.connections.kafka import Kafka
    from onetl_spark.connections.mongodb import MongoDB
    from onetl_spark.file.file_df_reader import FileDFReader
    from onetl_spark.file.file_df_writer import FileDFWriter
    from onetl_spark.hooks import Slot

    for s in [
        FileDFReader.run,
        FileDFWriter.run,
        MongoDB.read_source_as_df,
        MongoDB.pipeline,
        MongoDB.write_df_to_target,
        Kafka.read_source_as_df,
        Kafka.write_df_to_target,
        Greenplum.read_source_as_df,
        Greenplum.write_df_to_target,
        Iceberg.read_source_as_df,
        Iceberg.write_df_to_target,
    ]:
        assert isinstance(s, Slot)


def test_filedf_reader_run_hook_fires(spark, tmp_path):
    from onetl_spark.file.file_df_reader import FileDFReader
    from onetl_spark.file.file_df_writer import FileDFWriter, FileDFWriterOptions
    from onetl_spark.file.format import CSV

    events = []

    @FileDFReader.run.bind
    def on_read(reader, files=None):
        events.append("read")

    @FileDFWriter.run.bind
    def on_write(writer, df):
        events.append("write")

    from onetl_spark.file.connections import SparkLocalFS

    local_fs = SparkLocalFS(spark)
    try:
        df = spark.range(3).selectExpr("id AS a")
        FileDFWriter(
            local_fs,
            CSV(header=True),
            str(tmp_path / "out"),
            options=FileDFWriterOptions(if_exists="replace_entire_directory"),
        ).run(df)
        out = FileDFReader(
            local_fs,
            CSV(header=True),
            str(tmp_path / "out"),
            df_schema=df.schema,
        ).run()
        assert out.count() == 3
        assert events == ["write", "read"]
    finally:
        FileDFReader.run.hooks.clear()
        FileDFWriter.run.hooks.clear()
