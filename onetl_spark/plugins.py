"""Plugin autoload via setuptools entry points.

Reference: onetl/plugins/import_plugins.py:66 — plugins register under an
entry-point group and are imported at setup; ``ONETL_SPARK_PLUGINS_BLACKLIST``
/ ``ONETL_SPARK_PLUGINS_WHITELIST`` env vars gate loading.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

ENTRY_POINT_GROUP = "onetl_spark.plugins"
BLACKLIST_ENV = "ONETL_SPARK_PLUGINS_BLACKLIST"
WHITELIST_ENV = "ONETL_SPARK_PLUGINS_WHITELIST"
ENABLED_ENV = "ONETL_SPARK_PLUGINS_ENABLED"


def import_plugins() -> list[str]:
    """Import every registered plugin module, honoring env filters.
    Returns the list of loaded plugin names."""
    if os.environ.get(ENABLED_ENV, "true").lower() in ("false", "0", "no"):
        return []

    from importlib.metadata import entry_points

    blacklist = set(filter(None, os.environ.get(BLACKLIST_ENV, "").split(",")))
    whitelist = set(filter(None, os.environ.get(WHITELIST_ENV, "").split(",")))

    loaded = []
    try:
        eps = entry_points(group=ENTRY_POINT_GROUP)
    except TypeError:  # pragma: no cover - older importlib.metadata
        eps = entry_points().get(ENTRY_POINT_GROUP, [])

    for ep in eps:
        if whitelist and ep.name not in whitelist:
            continue
        if ep.name in blacklist:
            continue
        try:
            ep.load()
            loaded.append(ep.name)
        except Exception:
            log.exception("Failed to load plugin %r", ep.name)
            raise
    return loaded
