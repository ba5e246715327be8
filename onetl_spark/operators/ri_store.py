"""Incremental referential-integrity monitoring with orphan healing.

The day-2 integrity shape of an EL pipeline (reference spec: the
fact/dimension transfer surface of onetl's DBReader/DBWriter +
incremental strategies, ``onetl/strategy/incremental_strategy.py`` —
facts and dimensions arrive in SEPARATE incremental windows, so a fact
can reference a dimension row its own batch has not seen yet): instead
of the one-shot audit (`operators/quality.py referential_integrity_audit`
— both tables fully at hand), this class maintains two tiny persisted
relations across load windows:

- a **key store** — every dimension key ever seen, with the batch it
  first arrived in;
- a **pending store** — facts whose reference had no match when their
  batch landed (orphans), carried forward until a later dimension batch
  heals them.

Each window emits verdict events: ``ok`` (reference resolved against
the store as of this batch, same-batch dimension arrivals included),
``orphan`` (no match yet), and ``healed`` rows when a previously-pending
fact's key finally arrives (the late-arriving-dimension event every
warehouse monitors). Everything is exact integer/string arithmetic — no
float discipline needed.

Scale shape (100 TB facts, daily windows): the key store is
dimension-keyed (compact — keys only, never payloads); each window
costs equi-joins of the fact batch and the pending store against the
key store on the reference key, with the batch's new-key relation
broadcastable; the pending store shrinks as keys heal; history facts
are never re-read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ri_apply_batch", "ri_final_status"]

_EVENT_COLS = ("fact_id", "ref_key", "fact_batch", "status", "matched_batch")


def ri_apply_batch(
    key_store: DataFrame | None,
    pending: DataFrame | None,
    dim_batch: DataFrame,
    fact_batch: DataFrame,
    dim_key: str,
    fact_id: str,
    fact_ref: str,
    batch_id: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold one load window into the integrity stores.

    Within a window, dimension arrivals are registered BEFORE facts are
    checked (the load-order convention: dimensions first, then facts —
    a same-batch arrival resolves). Returns ``(key_store', pending',
    events)`` where ``events`` carries this window's verdict rows:
    one ``ok``/``orphan`` row per fact in the batch (``matched_batch``
    = the referenced key's arrival batch for ``ok``), plus one
    ``healed`` row (``fact_batch`` = the orphan's origin window,
    ``matched_batch`` = this window) per pending fact whose key arrived
    in THIS batch. A NULL reference never matches and never heals.

    ``key_store``/``pending`` are ``None`` on the first window.
    """
    b = F.lit(int(batch_id)).cast("int")

    new_keys = (
        dim_batch.select(F.col(dim_key).alias("ref_key"))
        .filter(F.col("ref_key").isNotNull())
        .distinct()
    )
    if key_store is not None:
        new_keys = new_keys.join(key_store, ["ref_key"], "left_anti")
    new_keys = new_keys.select(
        "ref_key", b.alias("first_seen_batch")
    )
    key_store2 = (
        key_store.unionByName(new_keys) if key_store is not None else new_keys
    )

    facts = fact_batch.select(
        F.col(fact_id).alias("fact_id"), F.col(fact_ref).alias("ref_key")
    )
    checked = facts.join(key_store2, ["ref_key"], "left").select(
        "fact_id",
        "ref_key",
        b.alias("fact_batch"),
        F.when(F.col("first_seen_batch").isNotNull(), F.lit("ok"))
        .otherwise(F.lit("orphan"))
        .alias("status"),
        F.col("first_seen_batch").alias("matched_batch"),
    )

    orphans = checked.filter(F.col("status") == "orphan").select(
        "fact_id", "ref_key", F.col("fact_batch").alias("origin_batch")
    )
    if pending is not None:
        healed = pending.join(new_keys, ["ref_key"], "inner").select(
            "fact_id",
            "ref_key",
            F.col("origin_batch").alias("fact_batch"),
            F.lit("healed").alias("status"),
            F.col("first_seen_batch").alias("matched_batch"),
        )
        still = pending.join(new_keys, ["ref_key"], "left_anti")
        pending2 = still.unionByName(orphans)
        events = checked.select(*_EVENT_COLS).unionByName(
            healed.select(*_EVENT_COLS)
        )
    else:
        pending2 = orphans
        events = checked.select(*_EVENT_COLS)
    return key_store2, pending2, events


def ri_final_status(events: DataFrame) -> DataFrame:
    """Collapse the verdict event log to one row per fact: ``ok`` facts
    keep their check row; orphans that later healed take the ``healed``
    row (with the healing window as ``matched_batch``); the rest stay
    ``orphan``. One map-side-combined ``max_by`` aggregate keyed by the
    fact id — never a window sort."""
    prio = (
        F.when(F.col("status") == "healed", 2)
        .when(F.col("status") == "ok", 1)
        .otherwise(0)
    )
    return (
        events.groupBy("fact_id")
        .agg(
            F.max_by(
                F.struct("ref_key", "fact_batch", "status", "matched_batch"),
                prio,
            ).alias("_r")
        )
        .select(
            "fact_id",
            F.col("_r.ref_key").alias("ref_key"),
            F.col("_r.fact_batch").alias("fact_batch"),
            F.col("_r.status").alias("status"),
            F.col("_r.matched_batch").alias("matched_batch"),
        )
    )
