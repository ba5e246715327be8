"""FileDFReader/FileDFWriter + format round-trips on SparkLocalFS."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from onetl_spark.exceptions import DirectoryExistsError
from onetl_spark.file import FileDFReader, FileDFWriter, FileDFWriterOptions
from onetl_spark.file.connections import SparkLocalFS
from onetl_spark.file.format import CSV, JSON, JSONLine, ORC, Parquet

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("value", DoubleType()),
    ],
)


@pytest.fixture()
def sample_df(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -0.25)],
        SCHEMA,
    )


@pytest.fixture()
def local_fs(spark):
    return SparkLocalFS(spark).check()


@pytest.mark.parametrize(
    "fmt_out,fmt_in",
    [
        (CSV(header=True), CSV(header=True)),
        (JSONLine(), JSONLine()),
        (Parquet(), Parquet()),
        (ORC(), ORC()),
        (CSV(delimiter=";", header=False), CSV(delimiter=";", header=False)),
    ],
    ids=["csv", "jsonline", "parquet", "orc", "csv-delim"],
)
def test_format_roundtrip(spark, local_fs, sample_df, tmp_path, fmt_out, fmt_in):
    target = str(tmp_path / "out")
    FileDFWriter(local_fs, fmt_out, target).run(sample_df)
    df = FileDFReader(local_fs, fmt_in, target, df_schema=SCHEMA).run()
    assert sorted(df.collect()) == sorted(sample_df.collect())


def test_json_multiline_read(spark, local_fs, tmp_path):
    path = tmp_path / "data.json"
    path.write_text('[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]')
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    df = FileDFReader(local_fs, JSON(), str(tmp_path), df_schema=schema).run(files=["data.json"])
    assert df.count() == 2
    with pytest.raises(ValueError):
        FileDFWriter(local_fs, JSON(), str(tmp_path / "o")).run(df)


def test_writer_mode_matrix(spark, local_fs, sample_df, tmp_path):
    target = str(tmp_path / "modes")
    writer = lambda mode: FileDFWriter(  # noqa: E731
        local_fs, Parquet(), target, FileDFWriterOptions(if_exists=mode),
    )
    writer("append").run(sample_df)
    writer("append").run(sample_df)
    rt = FileDFReader(local_fs, Parquet(), target, df_schema=SCHEMA)
    assert rt.run().count() == 6

    with pytest.raises(DirectoryExistsError):
        writer("error").run(sample_df)
    writer("skip_entire_directory").run(sample_df)
    assert rt.run().count() == 6

    writer("replace_entire_directory").run(sample_df)
    assert rt.run().count() == 3


def test_replace_overlapping_partitions(spark, local_fs, sample_df, tmp_path):
    target = str(tmp_path / "parts")
    opts = FileDFWriterOptions(if_exists="append", partition_by=["name"])
    FileDFWriter(local_fs, Parquet(), target, opts).run(sample_df)

    # overwrite ONLY the 'alpha' partition with a new value
    new = spark.createDataFrame([(10, "alpha", 9.9)], SCHEMA)
    opts2 = FileDFWriterOptions(if_exists="replace_overlapping_partitions", partition_by=["name"])
    FileDFWriter(local_fs, Parquet(), target, opts2).run(new)

    df = FileDFReader(local_fs, Parquet(), target).run()
    rows = {r["name"]: r["id"] for r in df.collect()}
    assert rows == {"alpha": 10, "beta": 2, "gamma": 3}


def test_explicit_file_list_and_base_path(spark, local_fs, sample_df, tmp_path):
    target = str(tmp_path / "files")
    FileDFWriter(local_fs, CSV(header=True), target).run(sample_df.repartition(3))
    parts = sorted(f for f in os.listdir(target) if f.endswith(".csv"))
    assert len(parts) >= 2
    df = FileDFReader(local_fs, CSV(header=True), target, df_schema=SCHEMA).run(files=parts[:1])
    assert 0 < df.count() < 3
    with pytest.raises(ValueError):
        FileDFReader(local_fs, CSV(), target, df_schema=SCHEMA).run(files=["/etc/passwd"])


def test_parse_serialize_columns(spark):
    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    df = spark.createDataFrame([('{"a": 5, "b": "x"}',)], "raw string")
    parsed = df.select(JSON().parse_column("raw", schema).alias("s")).select("s.a", "s.b")
    assert parsed.collect()[0].asDict() == {"a": 5, "b": "x"}

    csv_df = spark.createDataFrame([("7;hi",)], "raw string")
    parsed_csv = csv_df.select(
        CSV(delimiter=";").parse_column("raw", schema).alias("s"),
    ).select("s.a", "s.b")
    assert parsed_csv.collect()[0].asDict() == {"a": 7, "b": "hi"}

    ser = parsed.select(F.struct("a", "b").alias("s")).select(
        CSV(delimiter=",").serialize_column("s").alias("out"),
    )
    assert ser.collect()[0]["out"] == "5,x"
