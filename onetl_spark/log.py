"""Structured logging helpers (onetl/log.py:39-533)."""

from __future__ import annotations

import io
import json
import logging

BASE_LOG_INDENT = 8
HALF_INDENT = 4

onetl_log = logging.getLogger("onetl_spark")


def setup_logging(level: int = logging.INFO, enable_clients: bool = False) -> None:
    logging.basicConfig(level=level, format="%(asctime)s [%(levelname)-8s] %(message)s")
    onetl_log.setLevel(level)
    for noisy in ("py4j", "paramiko", "urllib3"):
        logging.getLogger(noisy).setLevel(level if enable_clients else logging.WARNING)


def entity_boundary_log(logger: logging.Logger, msg: str, char: str = "=") -> None:
    logger.info(char * 10 + " " + msg + " " + char * max(0, 60 - len(msg)))


def log_with_indent(logger: logging.Logger, msg: str, *args, indent: int = 0, level: int = logging.INFO) -> None:
    logger.log(level, " " * (BASE_LOG_INDENT + indent) + msg, *args)


def log_lines(logger: logging.Logger, text: str, indent: int = 0, level: int = logging.INFO) -> None:
    for line in text.splitlines():
        log_with_indent(logger, line, indent=indent, level=level)


def log_json(logger: logging.Logger, data, name: str = "", indent: int = 0) -> None:
    prefix = f"{name} = " if name else ""
    log_lines(logger, prefix + json.dumps(data, indent=4, default=str), indent=indent)


def log_collection(logger: logging.Logger, name: str, collection, indent: int = 0, max_items: int | None = None) -> None:
    log_with_indent(logger, "%s = [", name, indent=indent)
    items = list(collection)
    shown = items if max_items is None else items[:max_items]
    for item in shown:
        log_with_indent(logger, "%r,", item, indent=indent + HALF_INDENT)
    if max_items is not None and len(items) > max_items:
        log_with_indent(logger, "... %d more", len(items) - max_items, indent=indent + HALF_INDENT)
    log_with_indent(logger, "]", indent=indent)


def log_options(logger: logging.Logger, options, name: str = "options", indent: int = 0) -> None:
    if options is None:
        log_with_indent(logger, "%s = None", name, indent=indent)
        return
    data = options if isinstance(options, dict) else getattr(options, "__dict__", {})
    log_json(logger, data, name=name, indent=indent)


def log_dataframe_schema(logger: logging.Logger, df) -> None:
    log_with_indent(logger, "df_schema:")
    buffer = io.StringIO()
    # treeString is JVM-side; fall back to simpleString pieces
    try:
        buffer.write(df._jdf.schema().treeString())
    except Exception:
        for f in df.schema.fields:
            buffer.write(f" |-- {f.name}: {f.dataType.simpleString()}\n")
    log_lines(logger, buffer.getvalue(), indent=HALF_INDENT)


def log_hwm(logger: logging.Logger, hwm) -> None:
    log_with_indent(logger, "hwm = %s(name=%r, expression=%r, value=%r)",
                    type(hwm).__name__, hwm.name, hwm.expression, hwm.value)
