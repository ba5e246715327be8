"""Files-as-DataFrame connections: URL scheme + Hadoop conf injection.

Reference equivalents: SparkLocalFS (spark_local_fs.py:23), SparkHDFS
(spark_hdfs/connection.py:35), SparkS3 (spark_s3/connection.py:48 with
per-bucket ``fs.s3a.*`` config injection).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class SparkFileDFConnection:
    spark: SparkSession

    def get_url(self, path: str) -> str:
        raise NotImplementedError

    def check(self) -> "SparkFileDFConnection":
        # cheap liveness probe: the Hadoop FS for our scheme must resolve
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        uri = jvm.java.net.URI(self.get_url("/"))
        jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
        return self


@dataclass
class SparkLocalFS(SparkFileDFConnection):
    """Driver-local filesystem (file://); only valid with local master."""

    def get_url(self, path: str) -> str:
        from pathlib import Path

        return Path(path).absolute().as_uri()


@dataclass
class SparkHDFS(SparkFileDFConnection):
    """HDFS connection addressed by cluster/namenode."""

    cluster: str = ""
    host: str | None = None
    ipc_port: int = 8020

    def get_url(self, path: str) -> str:
        authority = self.host and f"{self.host}:{self.ipc_port}" or self.cluster
        return f"hdfs://{authority}{path}"


@dataclass
class SparkS3(SparkFileDFConnection):
    """S3 connection with per-bucket fs.s3a.* Hadoop conf injection."""

    host: str = ""
    port: int | None = None
    bucket: str = ""
    access_key: str | None = None
    secret_key: str | None = None
    protocol: str = "https"
    region: str | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self._inject_conf()

    def _inject_conf(self) -> None:
        conf = self.spark._jsc.hadoopConfiguration()
        prefix = f"fs.s3a.bucket.{self.bucket}"
        endpoint = f"{self.protocol}://{self.host}" + (f":{self.port}" if self.port else "")
        conf.set(f"{prefix}.endpoint", endpoint)
        if self.access_key:
            conf.set(f"{prefix}.access.key", self.access_key)
        if self.secret_key:
            conf.set(f"{prefix}.secret.key", self.secret_key)
        if self.region:
            conf.set(f"{prefix}.endpoint.region", self.region)
        conf.set(f"{prefix}.path.style.access", "true")
        for key, value in self.extra.items():
            suffix = key.removeprefix("fs.s3a.").removeprefix(f"bucket.{self.bucket}.")
            conf.set(f"{prefix}.{suffix}", str(value))

    def get_url(self, path: str) -> str:
        return f"s3a://{self.bucket}{path}"
