"""FileDFWriter — write a DataFrame as files with ``if_exists`` semantics.

Reference: onetl/file/file_df_writer/file_df_writer.py:35,99; mode matrix
options.py:62-159:

- ``error``: target dir exists and is non-empty → raise;
- ``skip_entire_directory``: exists → silently do nothing;
- ``append``: Spark append mode;
- ``replace_overlapping_partitions``: dynamic partition overwrite
  (options.py:123-126 → partitionOverwriteMode=dynamic + mode overwrite);
- ``replace_entire_directory``: full overwrite.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from onetl_spark.connections.sparksql import inject_spark_param
from onetl_spark.exceptions import DirectoryExistsError
from onetl_spark.file.connections import SparkFileDFConnection
from onetl_spark.file.format.base import FileFormat
from onetl_spark.hooks import slot, support_hooks

log = logging.getLogger(__name__)


@dataclass
class FileDFWriterOptions:
    if_exists: str = "append"
    partition_by: list[str] | None = None
    options: dict[str, Any] = field(default_factory=dict)


@support_hooks
@dataclass
class FileDFWriter:
    connection: SparkFileDFConnection
    format: FileFormat
    target_path: str = ""
    options: FileDFWriterOptions | None = None

    @slot
    def run(self, df: DataFrame) -> None:
        self.format.check_if_supported(self.connection.spark)
        opts = self.options or FileDFWriterOptions()
        if isinstance(opts, dict):
            opts = FileDFWriterOptions(**opts)
        mode = opts.if_exists
        url = self.connection.get_url(self.target_path)

        exists = self._dir_exists_nonempty(url)
        if exists and mode == "error":
            raise DirectoryExistsError(f"Target directory {url} already exists")
        if exists and mode == "skip_entire_directory":
            log.info("Target %s exists, skipping write entirely", url)
            return

        spark_mode = {
            "error": "errorifexists",
            "skip_entire_directory": "errorifexists",
            "append": "append",
            "replace_overlapping_partitions": "overwrite",
            "replace_entire_directory": "overwrite",
        }.get(mode)
        if spark_mode is None:
            raise ValueError(f"Unknown if_exists mode: {mode!r}")

        writer = self.format.apply_to_writer(df.write)
        if opts.partition_by:
            writer = writer.partitionBy(*opts.partition_by)
        if opts.options:
            writer = writer.options(**opts.options)

        if mode == "replace_overlapping_partitions":
            with inject_spark_param(
                df.sparkSession.conf, "spark.sql.sources.partitionOverwriteMode", "dynamic",
            ):
                writer.mode("overwrite").save(url)
        else:
            writer.mode(spark_mode).save(url)

    def _dir_exists_nonempty(self, url: str) -> bool:
        spark = self.connection.spark
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(url)
        fs = path.getFileSystem(conf)
        return fs.exists(path) and bool(fs.listStatus(path))
