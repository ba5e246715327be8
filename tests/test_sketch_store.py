"""Sketch-store ingest monitoring (`operators/sketch_store.py`,
`streaming/ingest.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from onetl_spark.operators.sketch_store import hll_ingest_series


def _rows(spark, triples):
    """(batch, group, value) triples."""
    return spark.createDataFrame(triples, "b int, g string, v long")


def test_cumulative_equals_union_sketch(spark):
    """The series' cum_distinct at batch k must equal the plain
    `hll_registers`/`hll_estimate` sketch of the UNION of batches ≤ k —
    the merge-exactness property, surfaced through the grid/window
    path."""
    from onetl_spark.operators.sketches import hll_estimate, hll_registers

    data = [(b, "s", v) for b in range(3) for v in range(b * 40, b * 40 + 60)]
    df = _rows(spark, data)
    series = {
        r["b"]: r["cum_distinct"]
        for r in hll_ingest_series(df, "b", ["g"], "v").collect()
    }
    for k in range(3):
        union = df.filter(F.col("b") <= k)
        ref = hll_estimate(hll_registers(union, "v", b=8), b=8).collect()[0][
            "estimate"
        ]
        # same registers, same expression — equal through the fsig grid
        assert series[k] == pytest.approx(ref, rel=1e-6), k


def test_series_new_distinct_and_rate(spark):
    """Batch 1 repeats every batch-0 key → new ≈ 0, returning_rate ≈ 1;
    batch 2 is entirely fresh keys → returning_rate near 0."""
    data = (
        [(0, "s", v) for v in range(50)]
        + [(1, "s", v) for v in range(50)]
        + [(2, "s", v) for v in range(1000, 1050)]
    )
    out = {
        r["b"]: r for r in hll_ingest_series(_rows(spark, data), "b", ["g"], "v").collect()
    }
    assert out[0]["batch_rows"] == 50
    assert out[0]["new_distinct"] == out[0]["cum_distinct"]
    assert out[1]["new_distinct"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["returning_rate"] == pytest.approx(1.0, abs=1e-9)
    # HLL estimate error for 50 fresh keys in the linear-counting regime
    # is small but nonzero; the rate must still show a fresh-key batch
    assert out[2]["returning_rate"] < 0.2


def test_series_is_per_group_and_dense(spark):
    """A group silent in one batch still emits a row (batch_rows 0,
    rate NULL) — the dense grid; groups never contaminate each other."""
    data = [(0, "a", 1), (0, "a", 2), (1, "a", 1), (0, "b", 9), (1, "b", 9)]
    # group "c" appears only in batch 1
    data += [(1, "c", 7)]
    out = {
        (r["g"], r["b"]): r
        for r in hll_ingest_series(_rows(spark, data), "b", ["g"], "v").collect()
    }
    assert len(out) == 6  # 3 groups × 2 batches, dense
    assert out[("c", 0)]["batch_rows"] == 0
    assert out[("c", 0)]["returning_rate"] is None
    assert out[("c", 0)]["cum_distinct"] == 0.0
    assert out[("b", 1)]["returning_rate"] == pytest.approx(1.0, abs=1e-9)


def test_null_keys_and_values_are_excluded(spark):
    df = spark.createDataFrame(
        [(0, "a", 1), (0, "a", None), (None, "a", 2), (0, None, 3)],
        "b int, g string, v long",
    )
    out = hll_ingest_series(df, "b", ["g"], "v").collect()
    assert len(out) == 1
    assert out[0]["batch_rows"] == 1  # only the fully non-null row


def test_streaming_fn_reproduces_batch_series(spark, tmp_path):
    """The foreachBatch pipeline (external register store) must emit the
    batch operator's series value-for-value when replaying the same
    batch split — including a row for a store group absent from the
    current batch."""
    from onetl_spark.streaming.ingest import ingest_monitor_batch_fn

    data = (
        [(0, "a", v) for v in range(30)]
        + [(0, "b", v) for v in range(10)]
        + [(1, "a", v) for v in range(15, 45)]
        # group b silent in batch 1; group c first appears in batch 2
        + [(2, "a", v) for v in range(100, 110)]
        + [(2, "b", v) for v in range(5)]
        + [(2, "c", v) for v in range(3)]
    )
    df = _rows(spark, data)
    batch_series = {
        (r["b"], r["g"]): r
        for r in hll_ingest_series(df, "b", ["g"], "v").collect()
    }

    fn = ingest_monitor_batch_fn(
        str(tmp_path / "store"), str(tmp_path / "series"), ["g"], "v",
        batch_out_col="b",
    )
    for k in range(3):
        fn(df.filter(F.col("b") == k).drop("b"), k)
    stream_series = {
        (r["b"], r["g"]): r
        for r in spark.read.parquet(str(tmp_path / "series")).collect()
    }

    # the batch grid also has rows for ("c", 0/1) — before group c ever
    # appeared, which no online pipeline can know; everything the
    # streaming side emits must match the batch side exactly
    assert set(stream_series) == set(batch_series) - {(0, "c"), (1, "c")}
    for key, s in stream_series.items():
        b = batch_series[key]
        for col in ("batch_rows", "cum_distinct", "new_distinct", "returning_rate"):
            assert s[col] == b[col], (key, col, s[col], b[col])
