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
        out.update(mod.SPARK_QUERIES)
    return _debt_ordered(out)


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
    names = list(queries)
    order = sorted(range(len(names)), key=lambda i: (last_green.get(names[i], -1), i))
    return {names[i]: queries[names[i]] for i in order}


def all_oracles():
    out = {}
    for mod in _modules():
        out.update(mod.ORACLE_SQL)
    return out


def _modules():
    mods = [tpch, tpch_ext, analytics, operators, temporal, sessions, streaming, sampling, cdc, graphs, file_transfer]
    try:
        from onetl_spark.showcase import llm

        mods.append(llm)
    except ImportError:  # pragma: no cover
        pass
    return mods
