"""as-of join / range join semantics on crafted data."""

import pytest
from pyspark.sql import functions as F

from onetl_spark.operators.temporal import asof_join, range_join


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "b", 10), (4, "b", 5)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, 100.0), ("a", 20, 200.0), ("b", 7, 700.0)],
        "k string, t long, v double",
    )
    out = {r["id"]: (r["t_right"], r["v_right"]) for r in asof_join(left, right, on="t", by=["k"]).collect()}
    assert out[1] == (10, 100.0)   # equal time matches
    assert out[2] == (20, 200.0)   # most recent earlier
    assert out[3] == (7, 700.0)
    assert out[4] == (None, None)  # nothing earlier → left join null


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 10), (2, 30)], "id long, t long")
    right = spark.createDataFrame([(15, 1.0), (25, 2.0)], "t long, v double")
    out = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left, right, on="t", direction="forward", allow_single_partition=True
        ).collect()
    }
    assert out[1] == 1.0   # next value at t>=10 is 15
    assert out[2] is None  # nothing at or after 30


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, 10.0, 20.0)], "lid long, lo double, hi double")
    right = spark.createDataFrame(
        [(100, 9.99), (101, 10.0), (102, 15.0), (103, 20.0), (104, 20.01)],
        "rid long, p double",
    )
    out = sorted(
        r["rid"]
        for r in range_join(left, right, "lo", "hi", "p", bucket_width=10.0).collect()
    )
    assert out == [101, 102, 103]


def test_range_join_with_keys_no_cross_bucket_dupes(spark):
    left = spark.createDataFrame(
        [(1, "u1", 0.0, 50.0), (2, "u2", 0.0, 50.0)],
        "lid long, k string, lo double, hi double",
    )
    right = spark.createDataFrame(
        [("u1", 25.0), ("u2", 60.0), ("u1", 49.9999)],
        "k string, p double",
    )
    rows = range_join(left, right, "lo", "hi", "p", on=["k"], bucket_width=50.0).collect()
    assert sorted((r["lid"], r["p"]) for r in rows) == [(1, 25.0), (1, 49.9999)]
    # output keeps exactly one copy of the key column
    assert [c for c in rows[0].asDict() if c == "k"] == ["k"]


def test_asof_join_raises_without_by_keys(spark):
    import warnings

    from onetl_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1,)], "t INT")
    right = spark.createDataFrame([(0, 10)], "t INT, v INT")
    with pytest.raises(ValueError, match="single-task sort"):
        asof_join(left, right, on="t")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = asof_join(left, right, on="t", allow_single_partition=True)
        assert any("one window partition" in str(w.message) for w in caught)
    assert out.collect()[0]["v_right"] == 10


def test_estimate_dataframe_size(spark):
    from onetl_spark.spark_utils import estimate_dataframe_size

    df = spark.range(10).toDF("x")
    size = estimate_dataframe_size(df)
    assert isinstance(size, int) and size >= 0


def test_asof_tolerance_nulls_far_matches(spark):
    from onetl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 210), (3, "b", 500)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        [("a", 90, "near"), ("a", 10, "far"), ("b", 100, "veryfar")],
        "k string, t long, v string",
    )
    # numeric tolerance 50: id=1 matches t=90 (gap 10); id=2's best match is
    # ALSO t=90 (gap 120 > 50) -> nulled, NOT replaced by anything; id=3's
    # best is t=100 (gap 400) -> nulled
    out = {
        r["id"]: (r["t_right"], r["v_right"])
        for r in asof_join(left, right, on="t", by=["k"], tolerance=50).collect()
    }
    assert out[1] == (90, "near")
    assert out[2] == (None, None)
    assert out[3] == (None, None)
    # without tolerance the same rows DO match (sanity that only the
    # post-filter differs)
    loose = {
        r["id"]: r["v_right"]
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert loose == {1: "near", 2: "near", 3: "veryfar"}


def test_asof_tolerance_forward_interval(spark):
    from pyspark.sql import functions as F

    from onetl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", "2026-01-01 10:00:00")], "id long, k string, t string"
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [("a", "2026-01-01 13:00:00", 9.0)], "k string, t string, v double"
    ).withColumn("t", F.to_timestamp("t"))
    near = asof_join(left, right, on="t", by=["k"], direction="forward",
                     tolerance="4 hours").collect()[0]
    assert near["v_right"] == 9.0
    far = asof_join(left, right, on="t", by=["k"], direction="forward",
                    tolerance="1 hour").collect()[0]
    assert far["v_right"] is None and far["t_right"] is None


def test_asof_nearest_picks_closer_side(spark):
    from onetl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 198), (3, "a", 50), (4, "b", 10)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 90, "b90"), ("a", 200, "f200")], "k string, t long, v string"
    )
    out = {
        r["id"]: (r["t_right"], r["v_right"])
        for r in asof_join(left, right, on="t", by=["k"], direction="nearest").collect()
    }
    assert out[1] == (90, "b90")    # 10 behind beats 100 ahead
    assert out[2] == (200, "f200")  # 2 ahead beats 108 behind
    assert out[3] == (90, "b90")    # nothing behind t=50 -> forward match (t=90)
    assert out[4] == (None, None)   # key with no right rows at all

    # exact tie goes backward
    left_tie = spark.createDataFrame([(9, "a", 145)], "id long, k string, t long")
    tie = asof_join(left_tie, right, on="t", by=["k"], direction="nearest").collect()[0]
    assert (tie["t_right"], tie["v_right"]) == (90, "b90")  # |145-90|=55 == |200-145|=55

    # tolerance applies on the CHOSEN side, both-sided
    tol = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left, right, on="t", by=["k"], direction="nearest", tolerance=20
        ).collect()
    }
    assert tol == {1: "b90", 2: "f200", 3: None, 4: None}


def test_asof_join_matches_pandas_merge_asof_random(spark):
    """Randomized equivalence against pandas.merge_asof — the reference
    implementation of as-of semantics — across all three directions and
    with/without tolerance. Right keys are unique per (k, t): duplicate
    right timestamps make the winner order-dependent in every engine."""
    import random

    import pandas as pd

    from onetl_spark.operators.temporal import asof_join

    rng = random.Random(13)
    for trial in range(6):
        keys = ["a", "b", "c"]
        left_rows = [
            (i, rng.choice(keys), rng.randrange(0, 300))
            for i in range(rng.randrange(5, 40))
        ]
        right_pairs = set()
        while len(right_pairs) < rng.randrange(3, 25):
            right_pairs.add((rng.choice(keys), rng.randrange(0, 300)))
        right_rows = [(k, t, f"v{k}{t}") for k, t in sorted(right_pairs)]

        ldf = spark.createDataFrame(left_rows, "id long, k string, t long")
        rdf = spark.createDataFrame(right_rows, "k string, t long, v string")
        lpd = pd.DataFrame(left_rows, columns=["id", "k", "t"]).sort_values("t")
        # merge_asof does not emit the matched right-on value; carry it as
        # an explicit column so t_right can be compared too
        rpd = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t")
        rpd["rt"] = rpd["t"]

        for direction in ("backward", "forward", "nearest"):
            for tol in (None, rng.randrange(5, 80)):
                got = {
                    r["id"]: (r["t_right"], r["v_right"])
                    for r in asof_join(
                        ldf, rdf, on="t", by=["k"],
                        direction=direction, tolerance=tol,
                    ).collect()
                }
                ref_df = pd.merge_asof(
                    lpd, rpd, on="t", by="k", direction=direction,
                    suffixes=("", "_right"),
                    tolerance=tol,
                )
                ref = {}
                for rec in ref_df.to_dict("records"):
                    if pd.isna(rec["v"]):
                        ref[rec["id"]] = (None, None)
                    else:
                        ref[rec["id"]] = (int(rec["rt"]), rec["v"])
                assert got == ref, (
                    f"trial={trial} direction={direction} tol={tol}: "
                    f"{ {k: (got.get(k), ref.get(k)) for k in set(got) | set(ref) if got.get(k) != ref.get(k)} }"
                )


def test_range_join_matches_brute_force_random(spark):
    """Randomized equivalence of the bucketed range join against the
    brute-force nested-loop definition, across bucket widths that do and
    don't divide the interval lengths."""
    import random

    from onetl_spark.operators.temporal import range_join

    rng = random.Random(29)
    for trial in range(4):
        keys = ["u1", "u2"]
        left_rows = []
        for i in range(rng.randrange(4, 15)):
            lo = rng.uniform(0, 100)
            left_rows.append((i, rng.choice(keys), lo, lo + rng.uniform(0, 30)))
        right_rows = [
            (j, rng.choice(keys), rng.uniform(-10, 140))
            for j in range(rng.randrange(5, 40))
        ]
        ldf = spark.createDataFrame(left_rows, "lid long, k string, lo double, hi double")
        rdf = spark.createDataFrame(right_rows, "rid long, k string, p double")

        for width in (7.3, 25.0, 200.0):
            got = sorted(
                (r["lid"], r["rid"])
                for r in range_join(
                    ldf, rdf, "lo", "hi", "p", on=["k"], bucket_width=width
                ).collect()
            )
            want = sorted(
                (lid, rid)
                for lid, lk, lo, hi in left_rows
                for rid, rk, p in right_rows
                if lk == rk and lo <= p <= hi
            )
            assert got == want, f"trial={trial} width={width}"


def test_asof_nearest_on_date_column(spark):
    """'nearest' on a DATE on-column: DATE→DOUBLE is not a valid Spark
    cast, so distances must be compared as days-since-epoch."""
    import datetime as dt

    from onetl_spark.operators.temporal import asof_join

    d = dt.date
    left = spark.createDataFrame(
        [(1, "a", d(2024, 1, 10)), (2, "a", d(2024, 1, 20))],
        "id long, k string, t date",
    )
    right = spark.createDataFrame(
        [("a", d(2024, 1, 8), "early"), ("a", d(2024, 1, 21), "late")],
        "k string, t date, v string",
    )
    out = {
        r["id"]: r["v_right"]
        for r in asof_join(left, right, on="t", by=["k"], direction="nearest").collect()
    }
    # Jan 10: 2 days behind (Jan 8) beats 11 ahead; Jan 20: 1 ahead beats 12 behind
    assert out == {1: "early", 2: "late"}


def test_ohlc_downsample_deterministic_ties(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from onetl_spark.operators.temporal import ohlc_downsample

    rows = [
        ("a", "2024-01-01 09:00:00", 10.0),
        ("a", "2024-01-01 12:00:00", 30.0),
        ("a", "2024-01-01 16:00:00", 5.0),
        ("a", "2024-01-02 10:00:00", 7.0),
        # day 3: tied timestamps — open must be the SMALLER value at the
        # earliest ts (struct lexicographic order), close the LARGER at
        # the latest
        ("a", "2024-01-03 09:00:00", 4.0),
        ("a", "2024-01-03 09:00:00", 2.0),
        ("a", "2024-01-03 18:00:00", 9.0),
        ("a", "2024-01-03 18:00:00", 11.0),
        ("b", "2024-01-01 01:00:00", 100.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r["g"], str(r["bucket"])[:10]): r
        for r in ohlc_downsample(df, "ts", "v", ("g",)).collect()
    }
    d1 = out[("a", "2024-01-01")]
    assert (d1["open"], d1["high"], d1["low"], d1["close"], d1["n_ticks"]) == (
        10.0, 30.0, 5.0, 5.0, 3,
    )
    d3 = out[("a", "2024-01-03")]
    assert (d3["open"], d3["close"]) == (2.0, 11.0)
    assert out[("b", "2024-01-01")]["n_ticks"] == 1

    with _pt.raises(ValueError, match="unit"):
        ohlc_downsample(df, "ts", "v", ("g",), unit="fortnight")


def test_interarrival_burstiness_hand_cases(spark):
    from pyspark.sql import functions as F

    from onetl_spark.operators.temporal import interarrival_burstiness

    rows = []
    # user 1: perfectly periodic (every 60s) -> sigma 0 -> B = -1, CV 0
    for i in range(5):
        rows.append((1, f"2024-01-01 00:{i:02d}:00"))
    # user 2: gaps 10s, 10s, 1000s -> bursty, B > 0
    for s in (0, 10, 20, 1020):
        rows.append((2, f"2024-01-01 00:00:00")) if False else None
    rows += [
        (2, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:10"),
        (2, "2024-01-01 00:00:20"), (2, "2024-01-01 00:17:00"),
    ]
    # user 3: single event -> no gaps -> dropped
    rows.append((3, "2024-01-01 00:00:00"))
    df = spark.createDataFrame(rows, "u long, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["u"]: r for r in interarrival_burstiness(df, "ts", "u").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_gaps"] == 4 and out[1]["mean_gap_s"] == 60.0
    assert out[1]["cv_gap"] == 0.0 and out[1]["burstiness"] == -1.0
    assert out[2]["burstiness"] > 0.1  # bursty side of Poisson
    # hand check user 2: gaps 10, 10, 1000 -> mu = 340
    import math

    mu = 340.0
    var = (10**2 + 10**2 + 1000**2) / 3 - mu**2
    b = (math.sqrt(var) - mu) / (math.sqrt(var) + mu)
    assert abs(out[2]["burstiness"] - b) < 1e-6


def test_scd2_intervals_hand_case(spark):
    from onetl_spark.operators.temporal import scd2_intervals

    # key "u": A A B A  (ts 1,2,3,4)  → 3 runs; key "v": C (ts 1) → 1 run
    df = spark.createDataFrame(
        [
            ("u", 1, "A", 1),
            ("u", 2, "A", 2),
            ("u", 3, "B", 3),
            ("u", 4, "A", 4),
            ("v", 1, "C", 5),
        ],
        "k string, t long, state string, eid long",
    )
    rows = sorted(
        scd2_intervals(df, ["k"], "t", "state", tie_break=["eid"]).collect(),
        key=lambda r: (r["k"], r["effective_from"]),
    )
    got = [
        (r["k"], r["value"], r["effective_from"], r["effective_to"],
         r["is_current"], r["n_events"])
        for r in rows
    ]
    assert got == [
        ("u", "A", 1, 3, False, 2),
        ("u", "B", 3, 4, False, 1),
        ("u", "A", 4, None, True, 1),
        ("v", "C", 1, None, True, 1),
    ]


def test_scd2_intervals_null_values_are_states(spark):
    from onetl_spark.operators.temporal import scd2_intervals

    # a NULL value is a state like any other: a,NULL,NULL,a -> 3 runs.
    # The pre-r8 lag-based change flag merged the first NULL into the
    # 'a' run (lag != value is NULL, not true) and split the NULL pair
    # (ADVICE r7: null-safe eqNullSafe + row_number first-row detection).
    df = spark.createDataFrame(
        [("u", 1, "a", 1), ("u", 2, None, 2), ("u", 3, None, 3), ("u", 4, "a", 4)],
        "k string, t long, state string, eid long",
    )
    rows = sorted(
        scd2_intervals(df, ["k"], "t", "state", tie_break=["eid"]).collect(),
        key=lambda r: r["effective_from"],
    )
    got = [
        (r["value"], r["effective_from"], r["effective_to"], r["n_events"])
        for r in rows
    ]
    assert got == [("a", 1, 2, 1), (None, 2, 4, 2), ("a", 4, None, 1)]


def test_scd2_intervals_tie_break_determinism(spark):
    from onetl_spark.operators.temporal import scd2_intervals

    # two rows at the SAME ts with different states: eid decides order
    df = spark.createDataFrame(
        [("u", 1, "A", 2), ("u", 1, "B", 1)],
        "k string, t long, state string, eid long",
    )
    rows = sorted(
        scd2_intervals(df, ["k"], "t", "state", tie_break=["eid"]).collect(),
        key=lambda r: not r["is_current"],
    )
    # eid=1 (B) first, then eid=2 (A) which stays current
    assert [r["value"] for r in rows] == ["A", "B"]
    assert rows[0]["is_current"] is True


def test_scd2_point_in_time_exactly_one_match(spark):
    from onetl_spark.operators.temporal import scd2_intervals

    # dimension: u: A(1..3) B(3..6) A(6..); facts at 2, 3, 6, 10
    src = spark.createDataFrame(
        [("u", 1, "A", 1), ("u", 3, "B", 2), ("u", 6, "A", 3)],
        "k string, t long, state string, eid long",
    )
    dim = scd2_intervals(src, ["k"], "t", "state", tie_break=["eid"])
    facts = spark.createDataFrame(
        [("u", 2), ("u", 3), ("u", 6), ("u", 10)], "k string, t long"
    )
    from pyspark.sql import functions as F

    j = facts.join(
        dim,
        (facts["k"] == dim["k"])
        & (facts["t"] >= dim["effective_from"])
        & (dim["effective_to"].isNull() | (facts["t"] < dim["effective_to"])),
    )
    got = sorted((r["t"], r["value"]) for r in j.collect())
    # boundary t=3 belongs to the NEW interval (from-inclusive)
    assert got == [(2, "A"), (3, "B"), (6, "A"), (10, "A")]
    # exactly one interval per fact
    assert j.count() == facts.count()
