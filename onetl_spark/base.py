"""Base protocols for DB connections.

Mirrors the reference's ``BaseDBConnection`` contract
(onetl/base/base_db_connection.py:17-152): a connection exposes a
``dialect``, reads one source into a DataFrame, writes one DataFrame to a
target, and can probe schema / min-max values for HWM planning.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Iterable

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from onetl_spark.dialects.base import Dialect
from onetl_spark.hwm.window import Window


class BaseDBConnection(ABC):
    dialect: Dialect

    @abstractmethod
    def check(self) -> "BaseDBConnection":
        """Liveness probe; raises on failure, returns self."""

    @abstractmethod
    def read_source_as_df(
        self,
        source: str,
        columns: list[str] | None = None,
        hint: str | None = None,
        where: Any = None,
        df_schema: StructType | None = None,
        window: Window | None = None,
        limit: int | None = None,
        options: Any = None,
    ) -> DataFrame:
        ...

    @abstractmethod
    def write_df_to_target(self, df: DataFrame, target: str, options: Any = None) -> None:
        ...

    @abstractmethod
    def get_df_schema(self, source: str, columns: list[str] | None = None) -> StructType:
        ...

    @abstractmethod
    def get_min_max_values(
        self,
        source: str,
        window: Window,
        hint: str | None = None,
        where: Any = None,
        options: Any = None,
    ) -> tuple[Any, Any]:
        """Driver-side MIN/MAX probe over the window expression."""
