"""Showcase queries — the driver-facing correctness surface.

Each module exposes ``SPARK_QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLE_SQL: dict[str, str]`` (DuckDB-runnable ANSI SQL on the same
parquet views). ``__spark_entry__.py`` merges them.
"""

from onetl_spark.showcase import (
    analytics,
    cdc,
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
    return out


def all_oracles():
    out = {}
    for mod in _modules():
        out.update(mod.ORACLE_SQL)
    return out


def _modules():
    mods = [tpch, tpch_ext, analytics, operators, temporal, sessions, streaming, sampling, cdc, graphs]
    try:
        from onetl_spark.showcase import llm

        mods.append(llm)
    except ImportError:  # pragma: no cover
        pass
    return mods
