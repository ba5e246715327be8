"""Changepoint / drift monitoring operators (`operators/changepoint.py`)."""

from __future__ import annotations

import pytest

from onetl_spark.operators.changepoint import cusum_excursions, single_changepoint


def _series(spark, values, key="a"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(values)],
        "k string, t int, x double",
    )


def _textbook_cusum(values, k_sigma=0.5):
    """Sequential reference recursion S⁺/S⁻ the window identity must match."""
    n = len(values)
    mu = sum(values) / n
    sigma = (sum(v * v for v in values) / n - mu * mu) ** 0.5
    k = k_sigma * sigma
    pos, neg, sp, sn = [], [], 0.0, 0.0
    for v in values:
        sp = max(0.0, sp + v - mu - k)
        sn = max(0.0, sn + (mu - k) - v)
        pos.append(sp)
        neg.append(sn)
    return pos, neg, mu, sigma


def test_cusum_matches_textbook_recursion(spark):
    values = [1.0, 2.0, 1.5, 8.0, 9.0, 8.5, 1.0, 0.5]
    pos, neg, mu, sigma = _textbook_cusum(values)
    rows = sorted(
        cusum_excursions(_series(spark, values), ["k"], "t", "x").collect(),
        key=lambda r: r["t"],
    )
    for i, r in enumerate(rows):
        assert r["cusum_pos"] == pytest.approx(pos[i], abs=1e-6), i
        assert r["cusum_neg"] == pytest.approx(neg[i], abs=1e-6), i
        assert r["mu"] == pytest.approx(mu, abs=1e-6)
        assert r["sigma"] == pytest.approx(sigma, abs=1e-6)


def test_cusum_constant_series_is_flat(spark):
    rows = cusum_excursions(_series(spark, [5.0] * 6), ["k"], "t", "x").collect()
    assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in rows)
    assert all(r["sigma"] == 0.0 and r["mu"] == 5.0 for r in rows)


def test_cusum_is_per_key(spark):
    """Two keys with opposite shifts must not contaminate each other."""
    up = _series(spark, [0.0, 0.0, 0.0, 10.0, 10.0, 10.0], key="up")
    down = _series(spark, [10.0, 10.0, 10.0, 0.0, 0.0, 0.0], key="down")
    out = cusum_excursions(up.union(down), ["k"], "t", "x").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    up_peak = max(r["cusum_pos"] for r in by_key["up"])
    down_peak = max(r["cusum_neg"] for r in by_key["down"])
    assert up_peak == pytest.approx(down_peak, abs=1e-9)  # mirror series
    assert max(r["cusum_neg"] for r in by_key["up"][3:]) <= up_peak


def test_cusum_validation(spark):
    with pytest.raises(ValueError):
        cusum_excursions(_series(spark, [1.0]), ["k"], "t", "x", k_sigma=-1.0)


def test_changepoint_clean_step(spark):
    df = _series(spark, [0.0, 0.0, 0.0, 10.0, 10.0, 10.0])
    row = single_changepoint(df, ["k"], "t", "x").collect()[0]
    assert row["split_at"] == 2  # last left index (0-based order values)
    assert row["n_points"] == 6
    assert row["pre_mean"] == 0.0 and row["post_mean"] == 10.0
    assert row["sse_split"] == 0.0
    assert row["var_explained"] == 1.0


def test_changepoint_constant_series(spark):
    row = single_changepoint(_series(spark, [3.0] * 5), ["k"], "t", "x").collect()[0]
    assert row["sse_total"] == 0.0 and row["sse_split"] == 0.0
    assert row["var_explained"] == 0.0
    assert row["split_at"] == 0  # earliest split on ties


def test_changepoint_single_point_emits_no_row(spark):
    assert single_changepoint(_series(spark, [1.0]), ["k"], "t", "x").count() == 0


def test_changepoint_brute_force_equivalence(spark):
    """The windowed SSE decomposition must equal the brute-force two-segment
    least-squares scan."""
    values = [2.0, 3.0, 2.5, 2.8, 7.0, 6.5, 7.2, 1.0, 1.2]

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    costs = [sse(values[:i]) + sse(values[i:]) for i in range(1, len(values))]
    # tie-break with the operator's own quantization (round(float32, 9)),
    # not raw doubles: costs that tie on one grid but not the other would
    # otherwise disagree on split_at
    import numpy as np

    def qcost(j):
        return round(float(np.float32(costs[j])), 9) + 0.0

    best_i = min(range(len(costs)), key=lambda j: (qcost(j), j))
    row = single_changepoint(_series(spark, values), ["k"], "t", "x").collect()[0]
    assert row["split_at"] == best_i
    # sse columns carry float32 significant precision (~7 digits, the
    # magnitude-robust rounding) — compare relatively, not at abs=1e-6
    assert row["sse_split"] == pytest.approx(costs[best_i], rel=1e-6)
    assert row["sse_total"] == pytest.approx(sse(values), rel=1e-6)


def test_null_values_raise_not_skew(spark):
    """A NULL value or order entry must abort, not silently skew the
    baseline (COUNT counts the row while SUM skips it)."""
    from pyspark.sql import functions as F

    base = _series(spark, [1.0, 2.0, 3.0, 4.0])
    with_null_x = base.select(
        "k", "t", F.when(F.col("t") == 2, None).otherwise(F.col("x")).alias("x")
    )
    with_null_t = base.select(
        "k", F.when(F.col("t") == 1, None).otherwise(F.col("t")).alias("t"), "x"
    )
    for broken in (with_null_x, with_null_t):
        with pytest.raises(Exception, match="non-null"):
            cusum_excursions(broken, ["k"], "t", "x").collect()
        with pytest.raises(Exception, match="non-null"):
            single_changepoint(broken, ["k"], "t", "x").collect()
