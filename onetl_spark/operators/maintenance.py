"""Table/directory maintenance operators for large-scale pipelines.

A 100 TB corpus that's written incrementally (per-batch appends, Kafka
micro-batches, per-day partitions) rots into millions of small files:
every scan pays an open/footer cost per file, drivers choke on listing,
and shuffle planning degrades. These operators are the counterweight:

- :func:`compact_directory` — rewrite a directory (or its partitions)
  into size-targeted files, then atomically swap.
- :func:`range_partitioned_write` — write sorted, range-partitioned
  files so min/max statistics actually prune (a parquet file whose
  sort column spans the whole domain prunes nothing).

Both are driver-light: sizing decisions come from file-system metadata
(listing), never from scanning data.
"""

from __future__ import annotations

import logging
import uuid

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _fs_for(spark: SparkSession, url: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(url)
    return path.getFileSystem(conf), path, jvm


def directory_stats(spark: SparkSession, url: str) -> tuple[int, int]:
    """(total_bytes, n_files) for every data file under ``url``
    (recursive, dotfiles/_SUCCESS excluded). Pure namenode metadata —
    no data read."""
    fs, path, _ = _fs_for(spark, url)
    total = 0
    count = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        total += status.getLen()
        count += 1
    return total, count


def compact_directory(
    spark: SparkSession,
    url: str,
    fmt: str = "parquet",
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite the files under ``url`` into ≈``target_file_bytes`` files.

    The output file count is computed from the CURRENT on-disk size
    (metadata listing, no scan), the data is rewritten with a single
    ``coalesce`` (no shuffle — compaction only narrows partitioning) into
    a staging directory next to the target, and the swap is two renames —
    the windows where readers see a partial state are the rename calls,
    which are atomic per-directory on HDFS-like stores. Returns a report
    dict (files/bytes before → after).

    Partitioned layouts: run per partition directory (the caller iterates
    partitions — compacting independent partitions is embarrassingly
    parallel across many calls and keeps each rename window small).
    """
    before_bytes, before_files = directory_stats(spark, url)
    if before_files < min_files_to_compact:
        log.info("compact_directory: %s has %d files, skipping", url, before_files)
        return {
            "url": url,
            "compacted": False,
            "files_before": before_files,
            "bytes_before": before_bytes,
        }
    n_out = max(1, -(-before_bytes // target_file_bytes))  # ceil
    fs, target, jvm = _fs_for(spark, url)
    staging = jvm.org.apache.hadoop.fs.Path(f"{url}__compact_{uuid.uuid4().hex[:12]}")
    backup = jvm.org.apache.hadoop.fs.Path(f"{url}__precompact_{uuid.uuid4().hex[:12]}")

    df = spark.read.format(fmt).load(url)
    # coalesce, not repartition: narrowing file count needs no exchange
    df.coalesce(int(n_out)).write.format(fmt).mode("errorifexists").save(str(staging))

    if not fs.rename(target, backup):
        raise OSError(f"compact_directory: could not move {url} aside")
    if not fs.rename(staging, target):
        fs.rename(backup, target)  # roll back
        raise OSError(f"compact_directory: could not install compacted {url}")
    fs.delete(backup, True)

    after_bytes, after_files = directory_stats(spark, url)
    report = {
        "url": url,
        "compacted": True,
        "files_before": before_files,
        "files_after": after_files,
        "bytes_before": before_bytes,
        "bytes_after": after_bytes,
    }
    log.info("compact_directory: %s", report)
    return report


def range_partitioned_write(
    df: DataFrame,
    url: str,
    sort_cols: list[str],
    num_files: int,
    fmt: str = "parquet",
    mode: str = "errorifexists",
) -> None:
    """Write ``df`` as ``num_files`` files range-partitioned AND sorted on
    ``sort_cols`` — the layout that makes parquet min/max statistics
    prune: each file owns a disjoint slice of the sort-key domain, so a
    point or range predicate on the leading sort column touches O(1)
    files instead of all of them.

    ``repartitionByRange`` samples the key distribution (one extra
    sampling pass, negligible) to build balanced ranges even under skew;
    ``sortWithinPartitions`` costs a per-partition sort, no exchange.
    """
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode(mode)
        .save(url)
    )


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) interleave of pre-bucketed column ranks.

    ``cols`` are integer bucket columns in ``[0, 2^bits)`` (use
    ``F.width_bucket`` or ntile-style bucketing upstream); the returned
    column interleaves their bits — bit j of column i lands at position
    ``j * n_cols + i`` — so sorting by it clusters rows that are close in
    EVERY dimension. Pure bit arithmetic, whole-stage-codegen friendly.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key requires at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed 64-bit key")
    cast = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cast):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def zorder_write(
    df: DataFrame,
    url: str,
    cluster_cols: list[str],
    num_files: int,
    bits: int = 12,
    fmt: str = "parquet",
    mode: str = "errorifexists",
) -> None:
    """Multi-dimensional clustering write: bucket each cluster column by
    its min/max range, sort by the Z-order interleave, and write range-
    partitioned files — so predicates on ANY cluster column (not just the
    leading one, as with a plain sort) skip most files via parquet
    min/max stats.

    The min/max probe is one tiny aggregate (2·n_cols scalars to the
    driver); linear min/max bucketing keeps the key a pure per-row
    expression. Heavily skewed columns cluster better with quantile
    bucketing — pre-bucket upstream and call ``zorder_key`` directly.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cluster_cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cluster_cols],
    ).collect()[0]
    buckets = []
    top = (1 << bits) - 1
    for c in cluster_cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        span = (hi - lo) or 1
        buckets.append(
            F.least(
                F.lit(top),
                ((F.col(c) - F.lit(lo)) * F.lit(top) / F.lit(span)).cast("long"),
            )
        )
    keyed = df.withColumn("_zkey", zorder_key(buckets, bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.format(fmt)
        .mode(mode)
        .save(url)
    )


def zorder_cell_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    cell_bits: int = 4,
) -> DataFrame:
    """Locality report for :func:`zorder_key`: coarse Morton cells (top
    ``cell_bits`` bits of each dimension) with per-cell row counts and
    per-dimension min/max — the numbers that show WHY z-ordering prunes:
    every cell covers a contiguous range in every dimension, so a filter
    on any one column touches few cells (→ few files after
    :func:`zorder_write`). One groupBy over ``2**(n_cols*cell_bits)``
    cells; inputs must already be integer ranks in ``[0, 2**bits)``,
    same contract as ``zorder_key``."""
    from pyspark.sql import functions as F

    k = len(cols)
    cell = F.shiftright(zorder_key(cols, bits), k * (bits - cell_bits))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(cell.alias("cell")).agg(*aggs)


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Mergeable aggregate state for incremental materialized-view
    maintenance: per key group, ``(n, n_nulls, sum, min, max)`` with the
    sum held as an exact ``decimal(30,scale)`` — every field is a
    semigroup, so states from disjoint batches merge exactly (see
    :func:`merge_aggregate_state`) and a maintained rollup never drifts
    from a from-scratch recompute. The 100-TB pattern: aggregate each
    ingest batch once, merge key-aligned states, never re-scan history."""
    from pyspark.sql import functions as F

    col = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(col.isNull().cast("long")).alias("n_nulls"),
        F.sum(col.cast(f"decimal(30,{scale})")).alias("sum"),
        F.min(col.cast("double")).alias("min"),
        F.max(col.cast("double")).alias("max"),
    )


def merge_aggregate_state(
    prev: DataFrame,
    delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge two :func:`aggregate_state` frames (full outer join on the
    keys; counts/sums add, min/max combine). Exact by construction: the
    decimal sums carry no float error to accumulate across thousands of
    merges. One key-aligned shuffle join, state-sized not data-sized."""
    from pyspark.sql import functions as F

    p = prev.select(
        *keys, *[F.col(c).alias(f"_p_{c}") for c in ("n", "n_nulls", "sum", "min", "max")]
    )
    d = delta.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in ("n", "n_nulls", "sum", "min", "max")]
    )
    j = p.join(d, keys, "full_outer")

    def add(a: str, b: str):
        # both present -> a+b; one side missing (key new to that side)
        # -> the present one. Type-agnostic, so any decimal scale works.
        return F.coalesce(F.col(a) + F.col(b), F.col(a), F.col(b))

    return j.select(
        *keys,
        add("_p_n", "_d_n").alias("n"),
        add("_p_n_nulls", "_d_n_nulls").alias("n_nulls"),
        add("_p_sum", "_d_sum").alias("sum"),
        F.least("_p_min", "_d_min").alias("min"),
        F.greatest("_p_max", "_d_max").alias("max"),
    )
