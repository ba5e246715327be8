"""Register parquet directories/files as Spark temp views.

Utility for the local-catalog connection and for tests: each
``<dir>/<name>.parquet`` becomes a temp view ``name``, so the Spark-SQL
connection (Hive semantics, hive/connection.py:322-341) can query it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def drop_table_completely(spark: SparkSession, name: str) -> None:
    """DROP TABLE IF EXISTS + remove any orphaned managed-table location.

    With the in-memory catalog, a previous process' managed table survives
    as a warehouse directory the new session's catalog doesn't know about;
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS. On a real
    metastore DROP TABLE is sufficient and the rmtree is a no-op.
    """
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    parsed = urlparse(warehouse)
    if parsed.scheme in ("", "file"):
        path = parsed.path or warehouse
        if path:
            shutil.rmtree(os.path.join(path, name.lower()), ignore_errors=True)


def read_table(spark: SparkSession, data_dir: str, name: str):
    """Read one testdata parquet table, normalizing the events timestamp.

    Handles both generations of the testdata: ``events.ts`` was originally
    an INT64 TIMESTAMP(NANOS) column (rejected by Spark's parquet reader
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case it
    loads as long nanoseconds we convert to a µs timestamp) and is now a
    plain µs TIMESTAMP, which may surface as TIMESTAMP_NTZ. We normalize to
    session-local TIMESTAMP so downstream date arithmetic and the DuckDB
    oracles (whose TIMESTAMP is µs, no zone) agree.

    The TIMESTAMP_NTZ→TIMESTAMP cast interprets the wall-clock in
    ``spark.sql.session.timeZone`` — callers MUST run with a UTC session
    (the bench, tests, and driver all pin it) or instants shift relative
    to the zone-naive DuckDB oracle, and DST-gap wall-clocks can move.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = os.path.join(data_dir, f"{name}.parquet")
    if name == "events":
        # left enabled session-wide: the lazy scan re-reads the conf at
        # execution time, and it only affects NANOS columns (which would
        # otherwise fail to load at all)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer division: double division of ns epochs loses µs precision
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            # The NTZ→TIMESTAMP cast reads the session zone AT ACTION TIME
            # (lazy plan), so quietly flipping the conf here could shift
            # instants under a caller who later restores their zone. Fail
            # loudly instead — the contract is a UTC session.
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
                raise ValueError(
                    "events.ts is TIMESTAMP_NTZ; casting it to TIMESTAMP uses "
                    f"spark.sql.session.timeZone={tz!r}, which would shift "
                    "instants relative to the zone-naive oracles. Set the "
                    "session timezone to UTC before reading events."
                )
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_parquet_views(
    spark: SparkSession,
    data_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> list[str]:
    """Create or replace one temp view per parquet table found in data_dir."""
    registered = []
    for name in tables:
        path = os.path.join(data_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_table(spark, data_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    return registered
