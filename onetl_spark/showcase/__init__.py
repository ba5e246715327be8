"""Showcase queries — the driver-facing correctness surface.

Each module exposes ``SPARK_QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLE_SQL: dict[str, str]`` (DuckDB-runnable ANSI SQL on the same
parquet views). ``__spark_entry__.py`` merges them.
"""

from onetl_spark.showcase import (
    analytics,
    cdc,
    file_transfer,
    graphs,
    operators,
    sampling,
    sessions,
    streaming,
    temporal,
    tpch,
    tpch_ext,
)


def all_queries():
    out = {}
    for mod in _modules():
        _merge_unique(out, mod.SPARK_QUERIES, mod.__name__, "SPARK_QUERIES")
    return _debt_ordered(out)


def _merge_unique(out, new, mod_name, kind):
    """dict.update silently shadowed q10_returned_items across modules in
    round 7 (358 declared, 357 reachable) — duplicate keys are now a hard
    error at registry-build time."""
    dup = out.keys() & new.keys()
    if dup:
        raise ValueError(
            f"duplicate {kind} keys from {mod_name}: {sorted(dup)} — "
            "rename the new entry; registry keys must be globally unique"
        )
    out.update(new)


def _debt_ordered(queries):
    """Order the registry by verification debt.

    The driver oracle-checks only the first 50 entries of ``queries()``
    (dict order), so a static order starves the tail: 42 declared queries
    had never been hash-checked by round 3.  Instead, order by the
    committed ``CORRECTNESS_r*.json`` history: queries that have NEVER
    had a green (hash_match) row come first, then ascending
    last-green-round, ties broken by registry order.  Each round the
    driver commits a new CORRECTNESS file, so the window rotates itself:
    freshly-verified queries sink, stale ones resurface.
    """
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last_green = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
            with open(path) as f:
                rows = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):  # pragma: no cover
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last_green[name] = max(last_green.get(name, -1), rnd)
    # Self-pruning: an override member with a green row at/after the round
    # its contract changed has been re-verified — it re-enters normal debt
    # ordering automatically (r8 lesson: manual pruning left a stale
    # override that displaced never-green queries out of the r9 window).
    reverify = {
        n for n in REVERIFY_FIRST if last_green.get(n, -1) < REVERIFY_SINCE
    }
    names = list(queries)
    order = sorted(
        range(len(names)),
        key=lambda i: (
            names[i] not in reverify,
            last_green.get(names[i], -1),
            i,
        ),
    )
    return {names[i]: queries[names[i]] for i in order}


# Queries whose OUTPUT CONTRACT changed since their last driver check must
# lead the next window regardless of debt age — a contract change voids any
# green history and a never-green entry must not queue behind 50 older ones.
# r8: the seven DECIMAL→DOUBLE output-boundary fixes (judge r7 task 1).
# Entries prune THEMSELVES once a CORRECTNESS_r*.json at round >=
# REVERIFY_SINCE shows them green (see _debt_ordered); when adding new
# members after a fresh contract change, bump REVERIFY_SINCE to that round.
REVERIFY_SINCE = 8
REVERIFY_FIRST = frozenset(
    {
        "q18_large_volume_customer",
        "q10_returned_item_reporting",
        "orders_cube_priority_status",
        "events_time_grouping_sets",
        "region_nation_revenue_share",
        "orders_price_date_skyline",
        "events_scd2_point_in_time",
    }
)


def all_oracles():
    out = {}
    for mod in _modules():
        _merge_unique(out, mod.ORACLE_SQL, mod.__name__, "ORACLE_SQL")
    return out


def _modules():
    mods = [tpch, tpch_ext, analytics, operators, temporal, sessions, streaming, sampling, cdc, graphs, file_transfer]
    try:
        from onetl_spark.showcase import llm

        mods.append(llm)
    except ImportError:  # pragma: no cover
        pass
    # r9+ additions register LAST: their never-green entries must sort
    # BEHIND the existing verification debt (ties in _debt_ordered break
    # by registry index), so a new module never displaces older
    # never-checked queries out of the driver window
    from onetl_spark.showcase import (
        ann_index,
        calibration,
        changepoint,
        hygiene,
        incremental,
        ingest,
        preference,
        privacy,
        retrieval,
        ri_monitor,
        scd2_store,
        selection,
    )

    mods.append(preference)
    mods.append(retrieval)
    mods.append(hygiene)
    mods.append(selection)
    mods.append(changepoint)
    mods.append(calibration)
    mods.append(incremental)
    mods.append(ingest)
    mods.append(privacy)
    mods.append(ann_index)
    mods.append(scd2_store)
    mods.append(ri_monitor)
    return mods
