import pytest

from onetl_spark.connections import SparkSQLConnection
from onetl_spark.db import DBReader
from onetl_spark.exceptions import NoDataError, StrategyError
from onetl_spark.hwm.types import HWM, ColumnIntHWM
from onetl_spark.strategy import IncrementalStrategy


@pytest.fixture()
def conn(spark, testdata):
    return SparkSQLConnection(spark)


def test_snapshot_read_full(conn, spark):
    df = DBReader(conn, "orders").run()
    assert df.count() == spark.table("orders").count()


def test_projection_and_filter(conn, spark):
    reader = DBReader(
        conn,
        "orders",
        columns=["o_orderkey", "o_totalprice"],
        where="o_totalprice > 100000",
    )
    df = reader.run()
    assert df.columns == ["o_orderkey", "o_totalprice"]
    expected = spark.table("orders").filter("o_totalprice > 100000").count()
    assert df.count() == expected


def test_expression_columns(conn):
    df = DBReader(conn, "orders", columns=["o_orderkey", "o_totalprice * 2 AS doubled"]).run()
    assert df.columns == ["o_orderkey", "doubled"]


def test_has_data_and_raise(conn, spark):
    assert DBReader(conn, "orders").has_data()
    empty = DBReader(conn, "orders", where="o_totalprice < 0")
    assert not empty.has_data()
    with pytest.raises(NoDataError):
        empty.raise_if_no_data()


def test_hwm_requires_incremental_strategy(conn):
    reader = DBReader(conn, "orders", hwm=ColumnIntHWM(name="x", expression="o_orderkey"))
    with pytest.raises(StrategyError):
        reader.run()


def test_hwm_autodetect_class(conn):
    reader = DBReader(conn, "orders", hwm=HWM(name="auto", expression="o_orderkey"))
    with IncrementalStrategy():
        df = reader.run()
        assert df.count() > 0
    from onetl_spark.hwm.store import HWMStoreStackManager

    saved = HWMStoreStackManager.get_current().get_hwm("auto")
    assert type(saved).__name__ == "ColumnIntHWM"
