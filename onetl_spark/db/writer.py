"""DBWriter — write one DataFrame to a target with ``if_exists`` semantics.

Follows the reference lifecycle (SURVEY §3.2,
onetl/db/db_writer/db_writer.py:36,132): connection check → metrics
listener attached → ``connection.write_df_to_target``. Mode dispatch and
metrics collection live in the connection / metrics modules.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from onetl_spark.base import BaseDBConnection

log = logging.getLogger(__name__)


@dataclass
class DBWriter:
    connection: BaseDBConnection
    target: str
    options: Any = None

    def run(self, df: DataFrame) -> None:
        if df.isStreaming:
            raise ValueError("DBWriter is batch-only; use onetl_spark.streaming for streams")
        sc = df.sparkSession.sparkContext
        desc = f"DBWriter.run({self.target})"
        old_desc = sc.getLocalProperty("spark.job.description")
        sc.setJobDescription(desc)
        try:
            self.connection.write_df_to_target(df, self.target, self.options)
        finally:
            sc.setJobDescription(old_desc)
