"""Greenplum connection.

The reference uses the proprietary Pivotal connector and applies
where/columns/limit as POST-LOAD DataFrame ops
(greenplum/connection.py:321-352) — we keep those semantics but emulate
transport over the Postgres wire protocol via JDBC (SURVEY §7: "emulate
via JDBC + explicit partitioning, keep the connection-guard semantics").

The connection guard (greenplum/connection.py:544-607): refuse/warn when
``df partitions × executor cores`` would exceed server connection limits
(31 warn / 100 raise).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from onetl_spark.connections.jdbc import JDBCReadOptions, Postgres
from onetl_spark.dialects.jdbc import GreenplumDialect
from onetl_spark.exceptions import TooManyParallelJobsError
from onetl_spark.hooks import slot
from onetl_spark.hwm.window import Window

log = logging.getLogger(__name__)


@dataclass
class Greenplum(Postgres):
    dialect_class = GreenplumDialect

    CONNECTIONS_WARNING_LIMIT = 31
    CONNECTIONS_EXCEPTION_LIMIT = 100

    @slot
    def read_source_as_df(
        self,
        source: str,
        columns: list[str] | None = None,
        hint: str | None = None,
        where: Any = None,
        df_schema: StructType | None = None,
        window: Window | None = None,
        limit: int | None = None,
        options: JDBCReadOptions | None = None,
    ) -> DataFrame:
        # full-source parallel scan, then post-load DataFrame ops
        # (greenplum/connection.py:321-352: df.filter / selectExpr / limit)
        df = super().read_source_as_df(
            source, columns=None, hint=None, where=None,
            df_schema=df_schema, window=None, limit=None, options=options,
        )
        self._check_expected_jobs_number(df, action="read")
        for condition in self.dialect.apply_window(where, window):
            df = df.filter(condition)
        if columns:
            df = df.selectExpr(*columns)
        if limit is not None:
            df = df.limit(limit)
        return df

    @slot
    def write_df_to_target(self, df: DataFrame, target: str, options: Any = None) -> None:
        self._check_expected_jobs_number(df, action="write")
        super().write_df_to_target(df, target, options)

    def _executor_parallelism(self) -> int:
        conf = self.spark.conf
        try:
            cores = int(conf.get("spark.executor.cores", "1") or 1)
        except Exception:
            cores = 1
        master = conf.get("spark.master", "")
        if master.startswith("local"):
            dc = self.spark.sparkContext.defaultParallelism
            return dc
        try:
            instances = int(conf.get("spark.executor.instances", "1") or 1)
        except Exception:
            instances = 1
        return cores * instances

    def _check_expected_jobs_number(self, df: DataFrame, action: str) -> None:
        partitions = df.rdd.getNumPartitions()
        expected = min(partitions, self._executor_parallelism())
        if expected >= self.CONNECTIONS_EXCEPTION_LIMIT:
            raise TooManyParallelJobsError(
                f"{action} would open {expected} parallel connections to Greenplum "
                f"(limit {self.CONNECTIONS_EXCEPTION_LIMIT}); repartition the DataFrame",
            )
        if expected >= self.CONNECTIONS_WARNING_LIMIT:
            log.warning(
                "%s opens %d parallel Greenplum connections (warning threshold %d)",
                action, expected, self.CONNECTIONS_WARNING_LIMIT,
            )

    @classmethod
    def get_packages(cls) -> list[str]:
        return ["org.postgresql:postgresql:42.7.4"]
