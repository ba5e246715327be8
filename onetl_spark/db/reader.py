"""DBReader — read one source into a DataFrame with pushdown + strategy.

The canonical lifecycle follows the reference (SURVEY §3.1,
onetl/db/db_reader/db_reader.py:52,551-609):

1. validate columns/where/hint against the connection's dialect
   capabilities;
2. resolve the current strategy from the thread-global stack;
3. auto-detect the HWM class from the column's Spark type via a LIMIT-0
   schema probe when needed (db_reader.py:665-716);
4. plan ``(window, limit)`` — ``_calculate_window_and_limit`` semantics
   replicated exactly (db_reader.py:718-794): snapshot → no window;
   incremental → min/max probe, exclusive start after first run,
   ``limit=0`` empty-source sentinel (HWM left unset); batch →
   ``(current, next]`` chunks with first-start-inclusive;
5. pin the stop value into the strategy pre-read (db_reader.py:592-595) —
   persisted only on clean strategy exit;
6. delegate to ``connection.read_source_as_df`` which renders dialect SQL
   and lets Catalyst optimize.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from onetl_spark.base import BaseDBConnection
from onetl_spark.exceptions import NoDataError, StrategyError
from onetl_spark.hooks import slot, support_hooks
from onetl_spark.hwm.registry import detect_hwm_class
from onetl_spark.hwm.types import HWM, ColumnHWM
from onetl_spark.hwm.window import Edge, Window
from onetl_spark.strategy.base import HWMStrategy, StrategyManager
from onetl_spark.strategy.batch import BatchHWMStrategy

log = logging.getLogger(__name__)


@support_hooks
@dataclass
class DBReader:
    connection: BaseDBConnection
    source: str
    columns: list[str] | None = None
    where: Any = None
    hint: str | None = None
    df_schema: StructType | None = None
    hwm: HWM | None = None
    options: Any = None

    def __post_init__(self) -> None:
        dialect = self.connection.dialect
        if self.columns is not None and not dialect.supports_columns:
            raise ValueError(f"{dialect.name} connection does not support `columns`")
        if self.columns is not None and not self.columns:
            raise ValueError("`columns` must be a non-empty list")
        if self.where is not None and not dialect.supports_where:
            raise ValueError(f"{dialect.name} connection does not support `where`")
        if self.hint is not None and not dialect.supports_hint:
            raise ValueError(f"{dialect.name} connection does not support `hint`")
        if self.df_schema is not None and not dialect.supports_df_schema:
            raise ValueError(f"{dialect.name} connection does not support `df_schema`")
        if dialect.requires_df_schema and self.df_schema is None:
            raise ValueError(f"{dialect.name} connection requires `df_schema`")
        if self.hwm is not None and not self.hwm.expression:
            raise ValueError("hwm.expression must be set (column or expression to track)")
        if self.hwm is not None and self.hwm.entity is None:
            self.hwm.entity = self.source

    # --- public API ---------------------------------------------------------
    # run/has_data/raise_if_no_data are hookable slots, mirroring the
    # reference placement (onetl/db/db_reader/db_reader.py:452,514,550).

    @slot
    def run(self) -> DataFrame:
        strategy = StrategyManager.get_current()
        strategy = self._bind_strategy(strategy)
        window, limit = self._calculate_window_and_limit(strategy)
        df = self.connection.read_source_as_df(
            source=self.source,
            columns=self.columns,
            hint=self.hint,
            where=self.where,
            df_schema=self.df_schema,
            window=window,
            limit=limit,
            options=self.options,
        )
        return df

    @slot
    def has_data(self) -> bool:
        """Existence probe with ``limit=1`` inside the current strategy
        window (db_reader.py:453-512)."""
        strategy = StrategyManager.get_current()
        window = None
        if isinstance(strategy, HWMStrategy) and self.hwm is not None:
            strategy = self._bind_strategy(strategy)
            start = strategy.current_value
            if start is not None:
                window = Window(self.hwm.expression, start_from=Edge(start, including=False))
        df = self.connection.read_source_as_df(
            source=self.source,
            columns=self.columns,
            hint=self.hint,
            where=self.where,
            df_schema=self.df_schema,
            window=window,
            limit=1,
            options=self.options,
        )
        return bool(df.take(1))

    @slot
    def raise_if_no_data(self) -> None:
        if not self.has_data():
            raise NoDataError(f"No data in the source {self.source!r}")

    # --- strategy binding -----------------------------------------------------

    def _bind_strategy(self, strategy) -> Any:
        if self.hwm is None:
            if isinstance(strategy, BatchHWMStrategy):
                raise StrategyError(
                    f"{type(strategy).__name__} requires a DBReader with hwm set",
                )
            return strategy
        if not isinstance(strategy, HWMStrategy):
            raise StrategyError(
                f"hwm is set on DBReader but current strategy "
                f"{type(strategy).__name__} is not incremental; "
                "wrap the run in IncrementalStrategy()",
            )
        if strategy.hwm is None:
            strategy.hwm = self._detect_hwm()
            strategy.fetch_hwm()
        elif strategy.hwm.name != self.hwm.name:
            raise StrategyError(
                f"Strategy already bound to HWM {strategy.hwm.name!r}, "
                f"cannot rebind to {self.hwm.name!r}",
            )
        return strategy

    def _detect_hwm(self) -> HWM:
        """Auto-detect the HWM class from the column Spark type when the
        user passed a generic HWM (db_reader.py:665-716)."""
        hwm = self.hwm
        if type(hwm) not in (HWM, ColumnHWM):
            return hwm.copy()
        schema = self.connection.get_df_schema(
            self.source,
            columns=[hwm.expression],
        )
        spark_type = schema.fields[0].dataType
        klass = detect_hwm_class(spark_type)
        if klass is None:
            raise ValueError(
                f"Spark type {spark_type.simpleString()!r} of expression "
                f"{hwm.expression!r} has no matching HWM class",
            )
        detected = klass(name=hwm.name, entity=hwm.entity, expression=hwm.expression)
        detected.value = hwm.value
        return detected

    # --- window planning ------------------------------------------------------

    def _calculate_window_and_limit(self, strategy) -> tuple[Window | None, int | None]:
        if self.hwm is None or not isinstance(strategy, HWMStrategy):
            return None, None

        expression = strategy.hwm.expression

        if isinstance(strategy, BatchHWMStrategy):
            if strategy.is_first_batch:
                start = strategy.start
                stop = strategy.stop
                start_including = True
                if start is None or stop is None:
                    min_value, max_value = self.connection.get_min_max_values(
                        source=self.source,
                        window=Window(expression),
                        hint=self.hint,
                        where=self.where,
                        options=self.options,
                    )
                    if max_value is None:
                        # empty source: read nothing, leave HWM unset
                        return Window(expression), 0
                    hwm_value = strategy.current_value
                    if start is None:
                        if hwm_value is not None:
                            # lower bound was already read in a previous run
                            start, start_including = hwm_value, False
                        else:
                            start = min_value
                    if stop is None:
                        stop = max_value
                strategy.set_bounds(start, stop, start_including=start_including)
            window = Window(
                expression,
                start_from=Edge(strategy.current, including=strategy.current_including),
                stop_at=Edge(strategy.window_right, including=True),
            )
            strategy.update_hwm(window.stop_at.value)
            return window, None

        # plain incremental
        hwm_value = strategy.current_value
        _, max_value = self.connection.get_min_max_values(
            source=self.source,
            window=Window(expression),
            hint=self.hint,
            where=self.where,
            options=self.options,
        )
        if max_value is None:
            # empty source → limit=0 sentinel, HWM stays unset (db_reader.py:758-776)
            return Window(expression), 0
        start = Edge(hwm_value, including=False) if hwm_value is not None else Edge()
        window = Window(expression, start_from=start, stop_at=Edge(max_value, including=True))
        strategy.update_hwm(max_value)
        return window, None
