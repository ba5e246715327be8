"""Unit tests for `operators/privacy.py` — the DP release mechanisms.

The noise chain is deterministic by design, so the tests recompute it
independently (hashlib md5 + math.log + numpy float32 quantization) and
assert EXACT equality — the same bar the DuckDB oracle holds the
showcase queries to.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from onetl_spark.operators.privacy import (
    bound_group_contributions,
    cap_rows_per_group,
    dp_count_release,
    dp_sum_release,
    hash_uniform,
    laplace_noise,
)


def _ref_uniform(key: str, seed: str) -> float:
    h = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:13], 16)
    return (h + 0.5) / 2.0**52


def _ref_fsig(x: float) -> float:
    # Spark round() = HALF_UP on the double's shortest decimal repr
    # (BigDecimal.valueOf); Python's round() is half-to-even and
    # disagrees on the exact dyadic ties float32-grid values produce
    f = float(np.float32(x))
    return float(Decimal(repr(f)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)) + 0.0


def _ref_laplace(key: str, scale: float, seed: str) -> float:
    u = _ref_uniform(key, seed)
    t = u - 0.5
    sign = (t > 0) - (t < 0)
    return _ref_fsig(-scale * sign * math.log(1.0 - 2.0 * abs(t)))


@pytest.fixture(scope="module")
def events(spark):
    # 4 users × up to 5 types, ≥ 7 rows per (user, type) cell so both
    # caps BIND; event_id unique per row
    rows = []
    eid = 0
    for u in range(4):
        for ty in range(5):
            if u == 3 and ty > 1:
                continue  # user 3 touches only 2 types (cap must NOT truncate)
            for r in range(7):
                rows.append(
                    Row(
                        event_id=eid,
                        user_id=u,
                        event_type=f"type_{ty}",
                        value=float(10 * ty + r) * 7.5,  # exceeds 100 for big ty
                    )
                )
                eid += 1
    return spark.createDataFrame(rows)


def test_hash_uniform_matches_reference_and_is_open_interval(spark):
    keys = [f"k{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).select(
        "k", hash_uniform(F.col("k"), "seedx").alias("u")
    )
    got = {r["k"]: r["u"] for r in df.collect()}
    for k in keys:
        assert got[k] == _ref_uniform(k, "seedx")
        assert 0.0 < got[k] < 1.0


def test_laplace_noise_matches_reference(spark):
    keys = [f"cell{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).select(
        "k", laplace_noise(F.col("k"), 3.0, "nz").alias("n")
    )
    got = {r["k"]: r["n"] for r in df.collect()}
    signs = set()
    for k in keys:
        assert got[k] == _ref_laplace(k, 3.0, "nz")
        signs.add(got[k] > 0)
    assert signs == {True, False}  # both tails appear


def test_bound_group_contributions_cap_binds_and_is_deterministic(events):
    kept = bound_group_contributions(events, "user_id", ["event_type"], 3)
    per_user = {
        r["user_id"]: r["n"]
        for r in kept.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_user[0] == per_user[1] == per_user[2] == 3  # cap binds at 5 types
    assert per_user[3] == 2  # under-cap user untouched
    # deterministic selection: identical on re-run
    again = bound_group_contributions(events, "user_id", ["event_type"], 3)
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))
    # kept units are a subset of the real units
    extra = kept.join(
        events.select("user_id", "event_type").distinct(),
        ["user_id", "event_type"],
        "anti",
    )
    assert extra.count() == 0


def test_cap_rows_per_group_binds(events):
    capped = cap_rows_per_group(events, "user_id", ["event_type"], "event_id", 5)
    top = (
        capped.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
    )
    assert top == 5
    # capped rows are a subset (event_id preserved, no duplication)
    assert capped.count() == capped.select("event_id").distinct().count()
    assert capped.join(events, "event_id", "anti").count() == 0


def test_dp_count_release_values_and_accounting(events):
    rel = dp_count_release(
        events, ["event_type"], "user_id", epsilon=1.0, max_groups_per_user=3,
        seed="dpu",
    ).collect()
    assert {r["event_type"] for r in rel} <= {f"type_{t}" for t in range(5)}
    for r in rel:
        assert r["epsilon"] == 1.0
        assert r["sensitivity"] == 3.0
        assert r["noise_scale"] == 3.0
        noise = _ref_laplace(r["event_type"], 3.0, "dpu-noise")
        assert r["noisy_count"] == _ref_fsig(r["true_count"] + noise)
    # bounded counts can only undercount the true distinct users
    assert all(0 < r["true_count"] <= 4 for r in rel)


def test_dp_sum_release_clamps_caps_and_matches_reference(events):
    rel = dp_sum_release(
        events,
        ["event_type"],
        "user_id",
        "value",
        "event_id",
        epsilon=1.0,
        lo=0.0,
        hi=100.0,
        max_groups_per_user=3,
        max_rows_per_group=5,
        seed="dpv",
    ).collect()
    for r in rel:
        assert r["sensitivity"] == 1500.0 and r["noise_scale"] == 1500.0
        # ≤ 4 users × ≤ 5 rows × ≤ 100 per row
        assert 0.0 <= r["true_sum"] <= 4 * 5 * 100.0
        noise = _ref_laplace(r["event_type"], 1500.0, "dpv-noise")
        assert r["noisy_sum"] == _ref_fsig(r["true_sum"] + noise)
    # clamping binds: type_4 raw values reach 7.5*(40..46) > 100
    t4 = [r for r in rel if r["event_type"] == "type_4"]
    if t4:
        assert t4[0]["true_sum"] <= 4 * 5 * 100.0


def test_dp_sum_release_rejects_bad_clamp(events):
    with pytest.raises(ValueError, match="lo < hi"):
        dp_sum_release(
            events, ["event_type"], "user_id", "value", "event_id",
            epsilon=1.0, lo=5.0, hi=5.0,
            max_groups_per_user=3, max_rows_per_group=5,
        )


def test_release_is_partitioning_invariant(events):
    """The order-independence claim: repartitioning the input must not
    change a single released bit (decimal sums + exact hash noise)."""
    a = dp_sum_release(
        events, ["event_type"], "user_id", "value", "event_id",
        epsilon=1.0, lo=0.0, hi=100.0,
        max_groups_per_user=3, max_rows_per_group=5,
    ).collect()
    b = dp_sum_release(
        events.repartition(13, "event_id"),
        ["event_type"], "user_id", "value", "event_id",
        epsilon=1.0, lo=0.0, hi=100.0,
        max_groups_per_user=3, max_rows_per_group=5,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
