"""Strategy state-machine tests over a mutable table (Hive-semantics write
+ incremental re-reads), modeled on the reference's integration tests
(tests_strategy_integration/)."""

import pytest

from onetl_spark.connections import SparkSQLConnection
from onetl_spark.db import DBReader, DBWriter
from onetl_spark.hwm.store import HWMStoreStackManager, MemoryHWMStore, YamlHWMStore
from onetl_spark.hwm.types import ColumnIntHWM
from onetl_spark.strategy import (
    IncrementalBatchStrategy,
    IncrementalStrategy,
    SnapshotBatchStrategy,
)


@pytest.fixture()
def conn(spark, testdata):
    return SparkSQLConnection(spark)


def make_table(spark, conn, name, lo, hi):
    df = spark.range(lo, hi + 1).withColumnRenamed("id", "id_int")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    DBWriter(conn, name).run(df)
    return df


def test_incremental_first_run_reads_all_then_only_new(spark, conn):
    make_table(spark, conn, "inc_t", 1, 50)
    reader = DBReader(conn, "inc_t", hwm=ColumnIntHWM(name="inc_t_hwm", expression="id_int"))

    with IncrementalStrategy():
        df1 = reader.run()
    assert df1.count() == 50
    assert HWMStoreStackManager.get_current().get_hwm("inc_t_hwm").value == 50

    # no new rows → empty read
    with IncrementalStrategy():
        df2 = reader.run()
    assert df2.count() == 0

    # append 51..100 → only the delta is read
    DBWriter(conn, "inc_t").run(
        spark.range(51, 101).withColumnRenamed("id", "id_int"),
    )
    with IncrementalStrategy():
        df3 = reader.run()
    rows = sorted(r.id_int for r in df3.collect())
    assert rows == list(range(51, 101))
    assert HWMStoreStackManager.get_current().get_hwm("inc_t_hwm").value == 100


def test_incremental_failed_run_does_not_save_hwm(spark, conn):
    make_table(spark, conn, "inc_fail", 1, 10)
    reader = DBReader(conn, "inc_fail", hwm=ColumnIntHWM(name="inc_fail_hwm", expression="id_int"))
    with pytest.raises(RuntimeError):
        with IncrementalStrategy():
            reader.run()
            raise RuntimeError("boom")
    assert HWMStoreStackManager.get_current().get_hwm("inc_fail_hwm") is None


def test_incremental_offset_rereads_tail(spark, conn):
    make_table(spark, conn, "inc_off", 1, 100)
    reader = DBReader(conn, "inc_off", hwm=ColumnIntHWM(name="inc_off_hwm", expression="id_int"))
    with IncrementalStrategy():
        reader.run()
    with IncrementalStrategy(offset=10):
        df = reader.run()
    rows = sorted(r.id_int for r in df.collect())
    assert rows == list(range(91, 101))


def test_incremental_batch_covers_range_in_chunks(spark, conn):
    make_table(spark, conn, "inc_b", 1, 100)
    reader = DBReader(conn, "inc_b", hwm=ColumnIntHWM(name="inc_b_hwm", expression="id_int"))
    seen = []
    n_batches = 0
    with IncrementalBatchStrategy(step=30) as batches:
        for _ in batches:
            df = reader.run()
            seen.extend(r.id_int for r in df.collect())
            n_batches += 1
    assert sorted(seen) == list(range(1, 101))
    assert n_batches == 4  # (1..30](30..60](60..90](90..100], first inclusive
    assert HWMStoreStackManager.get_current().get_hwm("inc_b_hwm").value == 100

    # second run: nothing new
    seen2 = []
    with IncrementalBatchStrategy(step=30) as batches:
        for _ in batches:
            seen2.extend(r.id_int for r in reader.run().collect())
    assert seen2 == []


def test_snapshot_batch_ignores_hwm_store(spark, conn):
    make_table(spark, conn, "snap_b", 1, 100)
    reader = DBReader(conn, "snap_b", hwm=ColumnIntHWM(name="snap_b_hwm", expression="id_int"))
    seen = []
    with SnapshotBatchStrategy(step=25) as batches:
        for _ in batches:
            seen.extend(r.id_int for r in reader.run().collect())
    assert sorted(seen) == list(range(1, 101))
    assert HWMStoreStackManager.get_current().get_hwm("snap_b_hwm") is None

    # full reload every time
    seen2 = []
    with SnapshotBatchStrategy(step=50) as batches:
        for _ in batches:
            seen2.extend(r.id_int for r in reader.run().collect())
    assert sorted(seen2) == list(range(1, 101))


def test_yaml_hwm_store_roundtrip(tmp_path):
    store = YamlHWMStore(str(tmp_path))
    hwm = ColumnIntHWM(name="a/b c", expression="col")
    hwm.update(42)
    store.set_hwm(hwm)
    loaded = store.get_hwm("a/b c")
    assert type(loaded) is ColumnIntHWM
    assert loaded.value == 42
    hwm.update(43)
    store.set_hwm(hwm)
    assert store.get_hwm("a/b c").value == 43


def test_store_context_stack():
    outer = HWMStoreStackManager.get_current()
    inner = MemoryHWMStore()
    with inner:
        assert HWMStoreStackManager.get_current() is inner
    assert HWMStoreStackManager.get_current() is outer
