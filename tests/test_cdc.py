"""Unit tests for CDC operators: changelog apply, SCD2, merge upsert."""

from __future__ import annotations

import datetime as dt

import pytest

from onetl_spark.operators.cdc import cdc_latest_snapshot, merge_upsert, scd2_history


def _changes(spark):
    rows = [
        # key, ts, seq, op, payload
        (1, 10, 0, "I", "a"),
        (1, 20, 0, "U", "b"),
        (2, 10, 0, "I", "c"),
        (2, 30, 0, "D", None),
        (3, 10, 0, "I", "d"),
        (3, 10, 1, "U", "e"),  # same ts — seq breaks the tie
    ]
    return spark.createDataFrame(rows, "k int, ts int, seq int, op string, v string")


def test_cdc_latest_snapshot_applies_updates_and_deletes(spark):
    out = cdc_latest_snapshot(
        _changes(spark), key_cols=["k"], order_cols=["ts", "seq"], op_col="op"
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "b", 3: "e"}  # key 2 deleted; key 3 tie broken by seq
    assert "op" not in out.columns


def test_cdc_latest_snapshot_keeps_deletes_without_op_col(spark):
    out = cdc_latest_snapshot(_changes(spark), key_cols=["k"], order_cols=["ts", "seq"])
    assert out.count() == 3


def test_cdc_latest_snapshot_validates_args(spark):
    with pytest.raises(ValueError):
        cdc_latest_snapshot(_changes(spark), key_cols=[], order_cols=["ts"])
    with pytest.raises(ValueError):
        cdc_latest_snapshot(_changes(spark), key_cols=["k"], order_cols=[])


def test_scd2_history_intervals(spark):
    out = scd2_history(
        _changes(spark), key_cols=["k"], ts_col="ts", tiebreak_cols=["seq"]
    )
    rows = {(r["k"], r["ts"], r["seq"]): r for r in out.collect()}
    assert rows[(1, 10, 0)]["valid_to"] == 20 and not rows[(1, 10, 0)]["is_current"]
    assert rows[(1, 20, 0)]["valid_to"] is None and rows[(1, 20, 0)]["is_current"]
    # same-ts versions ordered by seq
    assert rows[(3, 10, 0)]["valid_to"] == 10
    assert rows[(3, 10, 1)]["is_current"]


def test_merge_upsert_updates_inserts_deletes(spark):
    target = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (3, "gone")], "k int, v string"
    )
    source = spark.createDataFrame(
        [(1, "new", False), (3, None, True), (4, "ins", False)],
        "k int, v string, is_delete boolean",
    )
    out = merge_upsert(target, source, key_cols=["k"], delete_col="is_delete")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "new", 2: "keep", 4: "ins"}
    assert out.columns == target.columns


def test_merge_upsert_schema_mismatch_raises(spark):
    target = spark.createDataFrame([(1, "a")], "k int, v string")
    source = spark.createDataFrame([(1, "a", 2)], "k int, v string, extra int")
    with pytest.raises(ValueError, match="extra"):
        merge_upsert(target, source, key_cols=["k"])


def test_scd2_with_timestamps(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    df = spark.createDataFrame([(1, t0, "x"), (1, t1, "y")], "k int, ts timestamp, v string")
    out = scd2_history(df, key_cols=["k"], ts_col="ts")
    cur = {r["v"]: r["is_current"] for r in out.collect()}
    assert cur == {"x": False, "y": True}


def test_salted_join_matches_plain_join(spark):
    from onetl_spark.operators.joins import key_skew_report, salted_join

    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "a", "b") for i in range({"hot": 50, "a": 3, "b": 0}[k])],
        "k string, v int",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("a", 10), ("c", 99)], "k string, w int"
    )
    got = sorted((r["k"], r["v"], r["w"]) for r in salted_join(left, right, ["k"]).collect())
    want = sorted((r["k"], r["v"], r["w"]) for r in left.join(right, ["k"]).collect())
    assert got == want and len(got) == 50 * 2 + 3

    got_l = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(left, right, ["k"], how="left").collect()
    )
    want_l = sorted(
        (r["k"], r["v"], r["w"]) for r in left.join(right, ["k"], "left").collect()
    )
    assert got_l == want_l  # unmatched left rows survive exactly once

    report = key_skew_report(left, ["k"], top=1).collect()
    assert report[0]["k"] == "hot" and report[0]["n_rows"] == 50


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    from onetl_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, 1)], "k int, v int")
    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="outer")


def test_merge_aggregate_state(spark):
    from onetl_spark.operators.cdc import merge_aggregate_state

    running = spark.createDataFrame(
        [("a", 2, 10, 1, 5), ("b", 1, 7, 7, 7)], "k string, n long, s long, mn long, mx long"
    )
    delta = spark.createDataFrame(
        [("a", 1, 4, 0, 9), ("c", 3, 3, 1, 2)], "k string, n long, s long, mn long, mx long"
    )
    out = {
        r["k"]: r
        for r in merge_aggregate_state(
            running, delta, ["k"], {"n": "sum", "s": "sum", "mn": "min", "mx": "max"}
        ).collect()
    }
    assert out["a"]["n"] == 3 and out["a"]["s"] == 14
    assert out["a"]["mn"] == 0 and out["a"]["mx"] == 9
    assert out["b"]["n"] == 1 and out["c"]["n"] == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="avg"):
        merge_aggregate_state(running, delta, ["k"], {"n": "avg"})


def test_cdc_snapshot_matches_reference_model_random(spark):
    import random

    rnd = random.Random(20260813)
    rows = [
        (rnd.randrange(30), rnd.randrange(100), i, rnd.choice("IUD"), rnd.randrange(1000))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "k int, ts int, seq int, op string, v int")
    got = {
        (r["k"]): (r["ts"], r["seq"], r["v"])
        for r in cdc_latest_snapshot(
            df, key_cols=["k"], order_cols=["ts", "seq"], op_col="op", delete_ops=("D",)
        ).collect()
    }
    # reference model: plain python max by (ts, seq)
    want = {}
    for k, ts, seq, op, v in rows:
        cur = want.get(k)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            want[k] = (ts, seq, op, v)
    want = {k: (ts, seq, v) for k, (ts, seq, op, v) in want.items() if op != "D"}
    assert got == want


def test_salted_join_matches_plain_join_random(spark):
    import random

    from onetl_spark.operators.joins import salted_join

    rnd = random.Random(7)
    left = spark.createDataFrame(
        [(rnd.randrange(10), i) for i in range(500)], "k int, v int"
    )
    right = spark.createDataFrame(
        [(rnd.randrange(12), i) for i in range(60)], "k int, w int"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(left, right, ["k"], how=how, salt_buckets=5).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["w"]) for r in left.join(right, ["k"], how).collect()
        )
        assert got == want, how


def test_funnel_steps_semantics(spark):
    from onetl_spark.operators.funnel import funnel_steps

    rows = [
        # u1 completes: signup@1, view@3 (after 1), purchase@5 (after 3)
        (1, 1, "signup"), (1, 2, "purchase"), (1, 3, "view"), (1, 5, "purchase"),
        # u2 breaks at step 2: view BEFORE signup only
        (2, 1, "view"), (2, 2, "signup"), (2, 3, "purchase"),
        # u3 never signs up → absent
        (3, 1, "view"), (3, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, event_type string")
    out = {r["user_id"]: r for r in funnel_steps(df, ["signup", "view", "purchase"]).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["step_1_ts"], out[1]["step_2_ts"], out[1]["step_3_ts"]) == (1, 3, 5)
    assert out[1]["steps_completed"] == 3
    # u2: purchase@3 exists but requires a view after signup@2 — none
    assert out[2]["step_2_ts"] is None and out[2]["steps_completed"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_steps(df, [])


def test_snapshot_diff_add_remove_change_nullsafe(spark):
    from onetl_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, None)],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"),        # unchanged → absent from output
         (2, 25.0, "b"),        # changed value
         (3, 30.0, "c"),        # NULL → value counts as change
         (5, 50.0, "e")],       # added; key 4 removed
        "k long, v double, s string",
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(rows) == {2, 3, 4, 5}
    assert rows[2]["change_type"] == "changed" and rows[2]["new_v"] == 25.0
    assert rows[3]["change_type"] == "changed" and rows[3]["old_v"] is None
    assert rows[4]["change_type"] == "removed" and rows[4]["new_v"] is None
    assert rows[5]["change_type"] == "added" and rows[5]["old_v"] is None


def test_snapshot_diff_requires_keys(spark):
    import pytest

    from onetl_spark.operators.cdc import snapshot_diff

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [])


def test_scd2_matches_reference_model_random(spark):
    """Randomized SCD2 vs a Python reference model: per key, versions
    ordered by (ts, seq) chain valid_from -> next ts; exactly one current
    version per key; intervals tile the key's history with no gaps."""
    import random

    rng = random.Random(41)
    for trial in range(4):
        rows = []
        for k in range(rng.randrange(2, 8)):
            n = rng.randrange(1, 6)
            ts_list = sorted(rng.sample(range(0, 50), n))
            for seq_dup in range(rng.randrange(1, 3)):
                for i, ts in enumerate(ts_list):
                    rows.append((k, ts, seq_dup, f"v{k}-{ts}-{seq_dup}"))
        df = spark.createDataFrame(rows, "k long, ts long, seq long, v string")
        got = {
            (r["k"], r["ts"], r["seq"]): (r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_history(df, key_cols=["k"], ts_col="ts", tiebreak_cols=["seq"]).collect()
        }
        # reference: sort each key's rows by (ts, seq); valid_to = next ts
        by_key = {}
        for k, ts, seq, _ in rows:
            by_key.setdefault(k, []).append((ts, seq))
        want = {}
        for k, versions in by_key.items():
            versions.sort()
            for i, (ts, seq) in enumerate(versions):
                nxt = versions[i + 1][0] if i + 1 < len(versions) else None
                want[(k, ts, seq)] = (ts, nxt, nxt is None)
        assert got == want, f"trial={trial}"
        # invariants: one current per key; intervals tile without gaps
        for k, versions in by_key.items():
            currents = [v for key, v in got.items() if key[0] == k and v[2]]
            assert len(currents) == 1


def test_position_based_attribution_hand_path(spark):
    """U-shaped credits on crafted paths: 1-touch -> 1.0; 2 -> 0.5/0.5;
    4 -> 0.4/0.1/0.1/0.4; tie at the conversion instant belongs to the
    path; touches after the last conversion stay unattributed."""
    from onetl_spark.operators.funnel import position_based_attribution

    touches = spark.createDataFrame(
        [
            # user 1: four touches then a conversion at t=40
            (1, 10, 101), (1, 20, 102), (1, 30, 103), (1, 40, 104),
            # user 2: one touch, conversion later
            (2, 10, 201),
            # user 2 second path: two touches -> second conversion
            (2, 30, 202), (2, 35, 203),
            # user 3: touch AFTER their only conversion -> unattributed
            (3, 99, 301),
        ],
        "user_id long, ts long, event_id long",
    )
    convs = spark.createDataFrame(
        [(1, 40, 900), (2, 20, 901), (2, 50, 902), (3, 5, 903)],
        "user_id long, ts long, event_id long",
    )
    out = {
        r["touch_id"]: (r["conv_id"], r["position"], r["path_length"],
                        float(r["credit"]) if r["credit"] is not None else None)
        for r in position_based_attribution(touches, convs).collect()
    }
    assert out[101] == (900, 1, 4, 0.4)
    assert out[102] == (900, 2, 4, 0.1)
    assert out[103] == (900, 3, 4, 0.1)
    assert out[104] == (900, 4, 4, 0.4)   # tie at conversion instant included
    assert out[201] == (901, 1, 1, 1.0)
    assert out[202] == (902, 1, 2, 0.5)
    assert out[203] == (902, 2, 2, 0.5)
    assert out[301][0] is None and out[301][3] is None


def test_frequent_sequences_matches_brute_force(spark):
    import datetime as _dt
    from itertools import combinations

    import pytest as _pt

    from onetl_spark.operators.funnel import frequent_sequences

    t0 = _dt.datetime(2024, 1, 1)
    rows, seqs = [], {
        1: list("abcab"),
        2: list("aacb"),
        3: list("bca"),
        4: list("abc"),
    }
    eid = 0
    for u, items in seqs.items():
        for i, it in enumerate(items):
            rows.append((u, t0 + _dt.timedelta(minutes=i), it, eid))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, item string, event_id long")

    def brute(k, min_support):
        from collections import Counter

        c = Counter()
        for items in seqs.values():
            pats = {">".join(items[i] for i in idx)
                    for idx in combinations(range(len(items)), k)}
            c.update(pats)
        return {p: n for p, n in c.items() if n >= min_support}

    for k, ms in ((2, 2), (3, 2), (3, 3)):
        got = {r["pattern"]: r["support"] for r in frequent_sequences(
            df, "user_id", "ts", "item", k=k, min_support=ms,
            tiebreak_col="event_id").collect()}
        assert got == brute(k, ms), (k, ms)

    # the per-entity cap truncates sequences deterministically: with
    # cap=3 user 1 contributes only "abc" prefixes
    capped = {r["pattern"]: r["support"] for r in frequent_sequences(
        df, "user_id", "ts", "item", k=3, min_support=2,
        max_events_per_entity=3, tiebreak_col="event_id").collect()}
    assert capped == {"a>b>c": 2}  # users 1 (truncated to abc) and 4; 2->aac, 3->bca stay unique

    with _pt.raises(ValueError, match="k must be"):
        frequent_sequences(df, "user_id", "ts", "item", k=0)
    with _pt.raises(ValueError, match="max_events_per_entity"):
        frequent_sequences(df, "user_id", "ts", "item", k=3, max_events_per_entity=2)
