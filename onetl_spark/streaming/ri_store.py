"""Streaming referential-integrity monitoring: the `operators/ri_store.py`
loop run as a continuous pipeline via ``foreachBatch`` over a MULTIPLEXED
change feed (dimension arrivals and fact rows in one stream, tagged by a
``kind`` column — the shape a single CDC topic carrying several tables
delivers).

Each micro-batch splits the feed, registers this window's dimension keys
into the persisted key store, checks the window's facts against the
store as of this batch, appends ``ok``/``orphan``/``healed`` verdict
events to the sink, and carries unresolved facts in the pending store —
exactly :func:`ri_apply_batch`'s semantics per window, so the event log
collapses (`ri_final_status`) to the same per-fact statuses as the batch
operator over the same split.

Store consistency: the events append and the two store overwrites are
separate writes; production deployments should point all three at
transactional tables (the parquet layout keeps the showcase
dependency-free). Store probes resolve the filesystem from the path via
the Hadoop FS API, so any Hadoop URI works.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onetl_spark.operators.ri_store import ri_apply_batch
from onetl_spark.streaming.incremental import _store_exists

__all__ = ["ri_monitor_batch_fn"]


def ri_monitor_batch_fn(
    key_store_dir: str,
    pending_dir: str,
    events_dir: str,
    kind_col: str = "kind",
    key_col: str = "key",
    fact_id_col: str = "fact_id",
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callback for a multiplexed dim+fact
    feed: rows with ``kind='dim'`` carry a dimension key in ``key_col``;
    rows with ``kind='fact'`` carry the fact id and its reference key.
    Dimension arrivals register before facts are checked (the
    dimensions-first load convention of :func:`ri_apply_batch`)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        key_store = (
            spark.read.parquet(key_store_dir)
            if _store_exists(spark, key_store_dir)
            else None
        )
        pending = (
            spark.read.parquet(pending_dir)
            if _store_exists(spark, pending_dir)
            else None
        )
        dim = batch_df.filter(F.col(kind_col) == "dim").select(
            F.col(key_col).alias("_dim_key")
        )
        fact = batch_df.filter(F.col(kind_col) == "fact").select(
            F.col(fact_id_col).alias("_fid"), F.col(key_col).alias("_ref")
        )
        key_store2, pending2, events = ri_apply_batch(
            key_store, pending, dim, fact, "_dim_key", "_fid", "_ref", batch_id
        )
        # pin the new states BEFORE any overwrite: their plans read the
        # store parquet that mode("overwrite") is about to delete; the
        # events append happens first (its plan reads the old pending dir)
        key_store2 = key_store2.localCheckpoint(eager=True)
        pending2 = pending2.localCheckpoint(eager=True)
        events.write.mode("append").parquet(events_dir)
        key_store2.write.mode("overwrite").parquet(key_store_dir)
        pending2.write.mode("overwrite").parquet(pending_dir)

    return fn
