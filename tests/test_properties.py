"""Property-based tests (hypothesis) for the pure planning layer — the
reference has none (SURVEY §5); these harden dialect rendering and
HWM/batch-strategy invariants."""

from datetime import date, datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from onetl_spark.dialects import Dialect, MSSQLDialect, OracleDialect, PostgresDialect
from onetl_spark.hwm.types import ColumnDateTimeHWM, ColumnIntHWM, FileListHWM, HWM
from onetl_spark.hwm.window import Edge, Window
from onetl_spark.strategy.batch import BatchHWMStrategy

DIALECTS = [Dialect(), PostgresDialect(), MSSQLDialect(), OracleDialect()]


@given(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF), max_size=40),
)
def test_string_literals_always_quote_safely(value):
    for d in DIALECTS:
        lit = d.serialize_value(value)
        assert lit.startswith("'") and lit.endswith("'")
        # no unescaped single quote can terminate the literal early
        inner = lit[1:-1]
        assert "'" not in inner.replace("''", "")


@given(st.integers(min_value=0, max_value=10_000))
def test_limit_zero_always_renders_empty_predicate(limit):
    q = Dialect().get_sql_query("t", limit=limit, compact=True)
    if limit == 0:
        assert "WHERE (1 = 0)" in q and "LIMIT" not in q
    else:
        assert q.endswith(f"LIMIT {limit}")


@given(
    lo=st.integers(min_value=-1_000_000, max_value=1_000_000),
    span=st.integers(min_value=0, max_value=1_000_000),
    incl_lo=st.booleans(),
    incl_hi=st.booleans(),
)
def test_window_conditions_render_consistent_operators(lo, span, incl_lo, incl_hi):
    w = Window("c", Edge(lo, incl_lo), Edge(lo + span, incl_hi))
    conds = Dialect().window_conditions(w)
    assert conds[0] == f"c {'>=' if incl_lo else '>'} {lo}"
    assert conds[1] == f"c {'<=' if incl_hi else '<'} {lo + span}"


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
def test_int_hwm_update_is_monotonic_max(values):
    hwm = ColumnIntHWM(name="h", expression="c")
    for v in values:
        hwm.update(v)
    assert hwm.value == max(values)


@given(
    st.lists(
        st.datetimes(min_value=datetime(1990, 1, 1), max_value=datetime(2100, 1, 1)),
        min_size=1,
        max_size=30,
    ),
)
def test_datetime_hwm_roundtrips_through_serialization(values):
    hwm = ColumnDateTimeHWM(name="h", expression="c")
    for v in values:
        hwm.update(v)
    restored = HWM.deserialize(hwm.serialize())
    assert type(restored) is ColumnDateTimeHWM
    assert restored.value == max(values)


@given(st.sets(st.text(min_size=1, max_size=20), max_size=30))
def test_filelist_hwm_union_semantics(paths):
    hwm = FileListHWM(name="f")
    hwm.update(paths)
    hwm.update(paths)  # idempotent
    assert set(hwm.value) == set(paths)
    restored = HWM.deserialize(hwm.serialize())
    assert set(restored.value) == set(paths)


@settings(max_examples=200)
@given(
    start=st.integers(min_value=-10_000, max_value=10_000),
    span=st.integers(min_value=0, max_value=5_000),
    step=st.integers(min_value=1, max_value=1_000),
    from_hwm=st.booleans(),
)
def test_batch_strategy_windows_partition_the_range(start, span, step, from_hwm):
    """Chunks must tile (start, stop] without gaps/overlap, first chunk
    inclusive iff the lower bound is not a previously-read HWM."""
    from hypothesis import assume

    assume(span // step + 1 <= BatchHWMStrategy.MAX_ITERATIONS)
    stop = start + span
    strategy = BatchHWMStrategy(step=step)
    windows = []
    for _ in strategy:
        if not strategy._bounds_ready:
            strategy.set_bounds(start, stop, start_including=not from_hwm)
        windows.append(
            (strategy.current, strategy.current_including, strategy.window_right),
        )
    # bounds
    assert windows[0][0] == start
    assert windows[0][1] == (not from_hwm)
    assert windows[-1][2] == stop
    # adjacency: next window starts where the previous ended, exclusive
    for (_, _, prev_right), (cur, incl, _) in zip(windows, windows[1:]):
        assert cur == prev_right
        assert incl is False
    # coverage: every integer in (start, stop] (plus start if inclusive)
    covered = set()
    for left, incl, right in windows:
        lo = left if incl else left + 1
        covered.update(range(lo, right + 1))
    expected = set(range(start if not from_hwm else start + 1, stop + 1))
    assert covered == expected


@given(st.integers(min_value=1, max_value=3))
def test_batch_strategy_guard_trips_past_max_iterations(step):
    """Ranges needing more than MAX_ITERATIONS chunks must raise the guard
    (batch_hwm_strategy.py:28,125-131 semantics)."""
    import pytest

    from onetl_spark.exceptions import StrategyError

    span = step * (BatchHWMStrategy.MAX_ITERATIONS + 1)
    strategy = BatchHWMStrategy(step=step)
    with pytest.raises(StrategyError):
        for _ in strategy:
            if not strategy._bounds_ready:
                strategy.set_bounds(0, span)


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=128),
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=16,
    ),
)
def test_keyvalue_hwm_store_roundtrip_preserves_int_keys(offsets):
    """Regression: serialize() stringifies partition keys for YAML/JSON
    safety; deserialize() must coerce them back to int or Kafka incremental
    planning misses every partition and re-reads entire topics."""
    from onetl_spark.connections.kafka import starting_offsets_from_hwm
    from onetl_spark.hwm.types import KeyValueIntHWM

    hwm = KeyValueIntHWM(name="topic_hwm", entity="t")
    hwm.update(offsets)
    restored = HWM.deserialize(hwm.serialize())
    assert restored.value == offsets
    assert all(isinstance(k, int) for k in restored.value)

    parts = sorted(set(offsets) | {max(offsets) + 1})
    import json as _json

    rendered = _json.loads(starting_offsets_from_hwm("t", restored.value, parts))
    assert rendered["t"] == {str(p): offsets.get(p, 0) for p in parts}


def test_keyvalue_hwm_yaml_store_roundtrip(tmp_path):
    from onetl_spark.hwm.store import YamlHWMStore
    from onetl_spark.hwm.types import KeyValueIntHWM

    store = YamlHWMStore(str(tmp_path))
    hwm = KeyValueIntHWM(name="k", entity="topic")
    hwm.update({0: 5, 1: 7})
    store.set_hwm(hwm)
    restored = store.get_hwm("k")
    assert restored.value == {0: 5, 1: 7}


def test_filelist_hwm_deserialize_restores_frozenset():
    hwm = FileListHWM(name="f")
    hwm.update(["/a", "/b"])
    restored = HWM.deserialize(hwm.serialize())
    assert isinstance(restored.value, frozenset)
    assert restored == hwm or restored.value == hwm.value


def test_batch_strategy_rejects_descending_range():
    import pytest

    from onetl_spark.exceptions import IllegalWindowError

    strategy = BatchHWMStrategy(step=-10)
    with pytest.raises(IllegalWindowError):
        strategy.set_bounds(100, 0)
