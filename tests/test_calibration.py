"""Calibration operators (`operators/calibration.py`)."""

from __future__ import annotations

import pytest

from onetl_spark.operators.calibration import (
    calibration_by_group,
    calibration_report,
    reliability_bins,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


def _textbook(rows, n_bins=10):
    """Reference ECE/MCE/Brier/decomposition computed sequentially."""
    bins = {}
    for p, y in rows:
        b = min(n_bins - 1, int(p * n_bins))
        bins.setdefault(b, []).append((p, y))
    n = len(rows)
    base = sum(y for _, y in rows) / n
    ece = mce = rel = res = 0.0
    for members in bins.values():
        nb = len(members)
        pred = sum(p for p, _ in members) / nb
        rate = sum(y for _, y in members) / nb
        gap = abs(rate - pred)
        ece += nb / n * gap
        mce = max(mce, gap)
        rel += nb / n * (pred - rate) ** 2
        res += nb / n * (rate - base) ** 2
    brier = sum((p - y) ** 2 for p, y in rows) / n
    return ece, mce, brier, rel, res, base * (1 - base), base


def test_report_matches_textbook(spark):
    rows = [
        (0.05, 0), (0.08, 0), (0.12, 0), (0.15, 1), (0.35, 0),
        (0.42, 1), (0.55, 1), (0.61, 0), (0.78, 1), (0.95, 1),
        (0.97, 1), (0.99, 0), (0.22, 0), (0.31, 1), (0.66, 1),
    ]
    ece, mce, brier, rel, res, unc, base = _textbook(rows)
    r = calibration_report(_scored(spark, rows)).collect()[0]
    assert r["n"] == len(rows)
    assert r["base_rate"] == pytest.approx(base, abs=1e-8)
    assert r["ece"] == pytest.approx(ece, abs=1e-7)
    assert r["mce"] == pytest.approx(mce, abs=1e-8)
    assert r["brier"] == pytest.approx(brier, abs=1e-7)
    assert r["reliability"] == pytest.approx(rel, abs=1e-7)
    assert r["resolution"] == pytest.approx(res, abs=1e-7)
    assert r["uncertainty"] == pytest.approx(unc, abs=1e-8)
    # Murphy identity holds up to within-bin prediction variance
    assert abs(r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])) < 0.05


def test_perfectly_calibrated_score_has_zero_gap(spark):
    # each bin's mean prediction equals its empirical rate exactly
    rows = []
    for b in range(10):
        p = b / 10 + 0.05
        n_pos = b  # of 10 rows in the bin, b positives → rate ≈ pred
        rows += [(p, 1)] * n_pos + [(p, 0)] * (10 - n_pos)
    # rate(bin b) = b/10, pred = b/10 + 0.05 → |gap| = 0.05 everywhere
    r = calibration_report(_scored(spark, rows)).collect()[0]
    assert r["mce"] == pytest.approx(0.05, abs=1e-9)
    assert r["ece"] == pytest.approx(0.05, abs=1e-9)


def test_reliability_bins_edges(spark):
    rows = [(0.0, 0), (1.0, 1), (0.999999, 1)]  # p = 1 folds into the top bin
    out = {r["bin"]: r for r in reliability_bins(_scored(spark, rows)).collect()}
    assert set(out) == {0, 9}
    assert out[9]["n"] == 2 and out[9]["event_rate"] == 1.0


def test_by_group_slices_independently(spark):
    rows = [("a", 0.1, 0)] * 8 + [("a", 0.1, 1)] * 2 + [("b", 0.9, 1)] * 9 + [
        ("b", 0.9, 0)
    ]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = {r["g"]: r for r in calibration_by_group(df, ["g"]).collect()}
    assert out["a"]["n"] == 10 and out["b"]["n"] == 10
    assert out["a"]["base_rate"] == pytest.approx(0.2)
    assert out["b"]["base_rate"] == pytest.approx(0.9)
    # slice "a": rate .2 vs pred .1 → ece 0.1; slice "b": .9 vs .9 → 0
    assert out["a"]["ece"] == pytest.approx(0.1, abs=1e-9)
    assert out["b"]["ece"] == pytest.approx(0.0, abs=1e-9)


def test_validation_guard_fires_on_any_column(spark):
    bad_score = _scored(spark, [(0.5, 1), (1.5, 0)])  # score > 1
    bad_label = _scored(spark, [(0.5, 1), (0.5, 2)])  # label not 0/1
    null_score = _scored(spark, [(0.5, 1), (None, 0)])
    for df in (bad_score, bad_label, null_score):
        for col in ("ece", "n", "brier"):
            with pytest.raises(Exception, match="scores must be"):
                calibration_report(df).select(col).collect()
        with pytest.raises(Exception, match="scores must be"):
            reliability_bins(df).select("event_rate").collect()


def test_reliability_guard_is_global_across_bins(spark):
    """A bad row in one bin must trip the guard even when the caller
    filters to OTHER bins (the max(_bad) broadcast onto the grid)."""
    bad = _scored(spark, [(0.5, 1), (1.5, 0)])  # bad row lands in bin 9
    with pytest.raises(Exception, match="scores must be"):
        reliability_bins(bad).filter("bin = 5").select("mean_pred").collect()
