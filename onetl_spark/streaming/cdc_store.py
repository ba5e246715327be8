"""Streaming SCD2 dimension-store maintenance: the `operators/cdc.py
scd2_apply_batch` loop run as a continuous CDC pipeline via
``foreachBatch`` with an EXTERNAL persisted dimension store.

The production shape of warehouse dimension maintenance downstream of an
incremental capture (reference spec: the window each
``onetl/strategy/incremental_strategy.py`` run hands to DBWriter): each
micro-batch of change events folds into the SCD2 store persisted from
every previous batch — closed validity intervals never change, current
rows of untouched keys pass through, and only the touched keys' current
rows plus the batch enter the per-key windowed collapse. The store read
back after the last batch is EXACTLY ``scd2_intervals`` over the full
concatenated history (the apply-batch invariant), so the pipeline's
correctness is checkable against the plain full-history oracle.

Store consistency: the overwrite per batch is not transactional with the
stream checkpoint; production deployments should point ``store_dir`` at
a transactional table (the parquet layout keeps the showcase
dependency-free). The store probe resolves the filesystem from the path
via the Hadoop FS API, so any Hadoop URI works.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from onetl_spark.operators.cdc import scd2_apply_batch
from onetl_spark.streaming.incremental import _store_exists

__all__ = ["scd2_store_batch_fn"]


def scd2_store_batch_fn(
    store_dir: str,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_break: Sequence[str] = (),
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callback for a change-event stream.

    Batch 0 (store missing) bootstraps the store with a plain
    ``scd2_intervals`` build; every later batch applies
    :func:`scd2_apply_batch` and overwrites the store. The batch
    DataFrame is localCheckpoint-pinned before the overwrite so the new
    state never reads the files it is about to replace.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = (
            spark.read.parquet(store_dir)
            if _store_exists(spark, store_dir)
            else None
        )
        new_store = scd2_apply_batch(
            store, batch_df, key_cols, ts_col, value_col, tie_break
        )
        # pin BEFORE overwriting: the plan reads the store parquet that
        # mode("overwrite") is about to delete
        new_store = new_store.localCheckpoint(eager=True)
        new_store.write.mode("overwrite").parquet(store_dir)

    return fn
