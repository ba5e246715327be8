"""Tests for compaction and range-partitioned writes."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from onetl_spark.operators.maintenance import (
    compact_directory,
    directory_stats,
    range_partitioned_write,
)


def _data_files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(p).startswith(("_", "."))
    ]


def test_compact_directory_reduces_files(spark, tmp_path):
    target = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(target)
    assert len(_data_files(target)) == 40
    before_bytes, before_files = directory_stats(spark, target)
    assert before_files == 40

    report = compact_directory(spark, target, target_file_bytes=max(before_bytes // 2, 1))
    assert report["compacted"]
    assert report["files_before"] == 40
    assert report["files_after"] <= 3
    # data survived intact
    df = spark.read.parquet(target)
    assert df.count() == 4000
    assert df.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(4000))
    # no staging/backup leftovers
    assert not glob.glob(str(tmp_path / "frag__*"))


def test_compact_directory_skips_single_file(spark, tmp_path):
    target = str(tmp_path / "single")
    spark.range(0, 10).coalesce(1).write.parquet(target)
    report = compact_directory(spark, target)
    assert not report["compacted"]
    assert spark.read.parquet(target).count() == 10


def test_range_partitioned_write_prunes(spark, tmp_path):
    target = str(tmp_path / "ranged")
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"),
    )
    range_partitioned_write(df, target, sort_cols=["k"], num_files=8)

    files = _data_files(target)
    assert len(files) == 8
    # each file owns a disjoint slice of the sort-key domain
    ranges = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges overlap — no pruning possible"

    # a point predicate scans 1 of 8 files (Spark prunes via footer stats)
    hit = spark.read.parquet(target).filter(F.col("k") == 12_345)
    assert hit.count() == 1


@pytest.mark.parametrize("bad_mode", ["overwrite"])
def test_range_partitioned_write_mode_passthrough(spark, tmp_path, bad_mode):
    target = str(tmp_path / "modes")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    range_partitioned_write(df, target, ["k"], 2)
    range_partitioned_write(df, target, ["k"], 2, mode=bad_mode)
    assert spark.read.parquet(target).count() == 100


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from onetl_spark.operators.maintenance import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    # interleave: bit j of col i → position j*2+i
    # x=101: bits 0,2 → positions 0,4 ; y=011: bits 0,1 → positions 1,3
    got = df.select(zorder_key(["x", "y"], bits=3).alias("z")).collect()[0]["z"]
    assert got == (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)


def test_zorder_key_validation(spark):
    import pytest as _pytest

    from onetl_spark.operators.maintenance import zorder_key

    with _pytest.raises(ValueError):
        zorder_key([], bits=8)
    with _pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits > signed range


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    import itertools

    from pyspark.sql import functions as F

    from onetl_spark.operators.maintenance import zorder_write

    # 32×32 grid — under plain x-sort, a filter on y touches every file;
    # under z-order it should touch a strict subset
    rows = [(x, y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, "x long, y long")
    dest = str(tmp_path / "zordered")
    zorder_write(df, dest, ["x", "y"], num_files=16, bits=5)

    back = spark.read.parquet(dest).withColumn("_f", F.input_file_name())
    n_files = back.select("_f").distinct().count()
    assert n_files > 4
    # every file should span a bounded sub-rectangle: for each file the
    # x-range AND y-range must be well under the full domain
    stats = (
        back.groupBy("_f")
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
        )
        .collect()
    )
    assert all(r["xspan"] <= 16 and r["yspan"] <= 16 for r in stats)
    # correctness: nothing lost
    assert back.count() == 32 * 32


def test_zorder_key_matches_python_reference_random(spark):
    from onetl_spark.operators.maintenance import zorder_key

    import random

    rng = random.Random(7)
    rows = [(rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16)) for _ in range(50)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=16)).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for x, y in rows:
        assert got[(x, y)] == ref(x, y)


def test_zorder_cell_stats_cells_are_rectangles(spark):
    from onetl_spark.operators.maintenance import zorder_cell_stats

    df = spark.range(0, 4096).selectExpr("id % 64 AS x", "CAST(id / 64 AS LONG) AS y")
    out = zorder_cell_stats(df, ["x", "y"], bits=6, cell_bits=2).collect()
    # 64x64 grid, top-2 bits per dim -> 16 cells of 16x16 each
    assert len(out) == 16
    for r in out:
        assert r["n_rows"] == 256
        assert r["max_x"] - r["min_x"] == 15 and r["max_y"] - r["min_y"] == 15
        assert r["min_x"] % 16 == 0 and r["min_y"] % 16 == 0
