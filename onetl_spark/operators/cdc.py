"""Change-data-capture operators: changelog → snapshot, SCD2 history, upsert.

The reference delegates all transformation to Spark (README.rst:48-63); a
warehouse-grade engine needs the standard CDC/merge primitives on top of the
reader/writer surface. Everything here is declarative DataFrame API so
Catalyst keeps partial aggregation / pushdown; no Python UDFs.

Scale notes (100 TB):
- ``cdc_latest_snapshot`` uses ``max_by(struct(payload), struct(order))`` —
  a hash aggregate with map-side partial combine, ONE shuffle keyed by the
  primary key, no per-key sort. A ``row_number`` window would sort every
  partition; ``max_by`` folds each task's rows to one row per key before the
  exchange, which is the difference between shuffling the changelog and
  shuffling the (much smaller) key set.
- ``scd2_history`` genuinely needs per-key event order, so it uses a window
  ``lead``; the shuffle is keyed by the entity key and each partition holds
  one key's history (bounded by per-entity change counts, not corpus size).
- ``merge_upsert`` is left-anti + union: two narrow stages, and when the
  delta is small relative to the target Spark/AQE broadcasts the anti-join
  side automatically, so the target table is never shuffled.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str]) -> list[Column]:
    return [F.col(c) for c in names]


def cdc_latest_snapshot(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D", "delete"),
) -> DataFrame:
    """Apply an insert/update/delete changelog and return the latest snapshot.

    For each key, picks the payload of the row with the greatest
    ``order_cols`` tuple (e.g. ``("ts", "seq")`` — pass enough columns to
    break ties deterministically), then drops keys whose final operation is
    a delete.

    Equivalent SQL: ``row_number() OVER (PARTITION BY key ORDER BY ord DESC)
    = 1 AND op NOT IN deletes``, but executed as a partial-aggregating
    ``max_by`` instead of a sort window.
    """
    if not key_cols:
        raise ValueError("cdc_latest_snapshot requires at least one key column")
    if not order_cols:
        raise ValueError("cdc_latest_snapshot requires order columns for determinism")
    payload = [c for c in changes.columns if c not in key_cols]
    ordering = F.struct(*_cols(order_cols))
    latest = changes.groupBy(*_cols(key_cols)).agg(
        F.max_by(F.struct(*_cols(payload)), ordering).alias("_row")
    )
    out = latest.select(*key_cols, *[F.col(f"_row.{c}").alias(c) for c in payload])
    if op_col is not None:
        out = out.filter(~F.col(op_col).isin(list(delete_ops))).drop(op_col)
    return out


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build slowly-changing-dimension type-2 validity intervals.

    Each change row becomes a version valid from its own timestamp until the
    next change of the same key (``valid_to`` NULL on the current version,
    ``is_current`` flags it). Rows are ordered by ``(ts, *tiebreak)``; pass
    tiebreak columns when timestamps can collide.
    """
    if not key_cols:
        raise ValueError("scd2_history requires at least one key column")
    order = [F.col(ts_col)] + _cols(tiebreak_cols)
    w = Window.partitionBy(*_cols(key_cols)).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE: source rows replace matching target rows, new keys append.

    ``delete_col`` (boolean) marks source rows whose key should be removed
    instead of upserted. Matches Delta's
    ``WHEN MATCHED [AND delete] THEN DELETE / UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *`` for the whole-row case.
    """
    if not key_cols:
        raise ValueError("merge_upsert requires at least one key column")
    keep = target.join(source.select(*key_cols).distinct(), list(key_cols), "left_anti")
    incoming = source
    if delete_col is not None:
        incoming = incoming.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    missing = set(target.columns) - set(incoming.columns)
    extra = set(incoming.columns) - set(target.columns)
    if missing or extra:
        raise ValueError(
            f"merge_upsert schema mismatch: source missing {sorted(missing)}, extra {sorted(extra)}"
        )
    return keep.unionByName(incoming.select(*target.columns))


def merge_aggregate_state(
    running: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    measures: dict[str, str],
) -> DataFrame:
    """Merge a delta of ALGEBRAIC partial aggregates into a running
    aggregate table: the incremental-rollup step that lets a 100 TB
    pipeline maintain daily/hourly summaries by re-aggregating only new
    data instead of recomputing history.

    ``measures`` maps column → merge function (``sum``/``min``/``max``;
    counts merge via ``sum``). Averages must be carried as sum+count and
    divided at read time; store exact types (decimal for money-like
    doubles) so merge order can never change the result.

    Cost: one union + one group-key aggregate over (running ∪ delta) —
    both already one-row-per-key, so the shuffle is summary-sized, never
    corpus-sized.
    """
    allowed = {"sum", "min", "max"}
    bad = {fn for fn in measures.values() if fn not in allowed}
    if bad:
        raise ValueError(f"unsupported merge functions: {sorted(bad)} (use sum/min/max)")
    merged = running.unionByName(delta)
    aggs = [getattr(F, fn)(col).alias(col) for col, fn in measures.items()]
    return merged.groupBy(*[F.col(c) for c in key_cols]).agg(*aggs)


def _scd2_collapse(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_break: Sequence[str],
) -> DataFrame:
    """Run-collapse a unified (seed ∪ batch) change relation.

    ``events`` carries ``_w`` (run weight: 1 per raw change row, the old
    run's ``n_events`` on a seed row) and ``_seed`` (1 on the re-entered
    current run). Ordering is ``(ts, _seed DESC, *tie_break)`` — the seed
    sorts first on a (never expected) timestamp tie so the continuing run
    keeps its original start. Output columns: ``_run``, ``_chg`` kept for
    the audit aggregate.
    """
    keys = _cols(key_cols)
    order = [F.col(ts_col).asc(), F.col("_seed").desc()] + [
        F.col(c).asc() for c in tie_break
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return events.withColumn(
        "_chg",
        F.when(F.row_number().over(w) == 1, 1)
        .when(~F.lag(value_col).over(w).eqNullSafe(F.col(value_col)), 1)
        .otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def _scd2_seed_union(
    store: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_break: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Split the store into pass-through rows and the seed∪batch change
    relation for the keys this batch touches.

    Returns ``(pass_through, events)``: closed history rows and current
    rows of untouched keys flow through untouched (a union, no shuffle);
    only ``touched current ∪ batch`` enters the windowed collapse.
    """
    keys = list(key_cols)
    batch_keys = batch.select(*keys).distinct()
    current = store.filter(F.col("is_current"))
    closed = store.filter(~F.col("is_current"))
    untouched = current.join(batch_keys, keys, "left_anti")
    touched = current.join(batch_keys, keys, "left_semi")
    tb_null = [
        F.lit(None).cast(batch.schema[c].dataType).alias(c) for c in tie_break
    ]
    seeds = touched.select(
        *keys,
        F.col("effective_from").alias(ts_col),
        F.col("value").alias(value_col),
        F.col("n_events").cast("long").alias("_w"),
        F.lit(1).alias("_seed"),
        *tb_null,
    )
    ev = batch.select(
        *keys,
        F.col(ts_col),
        F.col(value_col),
        F.lit(1).cast("long").alias("_w"),
        F.lit(0).alias("_seed"),
        *[F.col(c) for c in tie_break],
    )
    return closed.unionByName(untouched), seeds.unionByName(ev)


def scd2_apply_batch(
    store: DataFrame | None,
    batch: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Apply one time-ordered change batch to a persisted SCD2 store.

    The day-2 shape of warehouse dimension maintenance (reference spec:
    the incremental-load surface of onetl's strategy machinery,
    ``onetl/strategy/incremental_strategy.py`` — each window the
    IncrementalStrategy captures lands here as ``batch``): the store is
    the output of :func:`onetl_spark.operators.temporal.scd2_intervals`
    persisted from every previous batch (columns ``*key_cols, value,
    effective_from, effective_to, is_current, n_events``); the batch is a
    raw change feed whose timestamps are all ≥ the store's (the
    incremental-strategy window guarantee). ``store=None`` bootstraps.

    INVARIANT (the correctness contract, unit-proven): applying batches
    in time order reproduces ``scd2_intervals`` over the concatenated
    full history exactly — closed rows never change, a continuing run
    keeps its ``effective_from`` and accumulates ``n_events``, a value
    change closes the current run at the first changed event's ts.

    Scale shape (100 TB dimension, daily batch): closed history and
    untouched current rows PASS THROUGH — a union, never shuffled,
    never windowed. Only ``(current rows of touched keys) ∪ batch``
    enters the two per-key windows, so the windowed relation is
    batch-sized, not store-sized; the touched/untouched split is a
    semi/anti join against the batch's (tiny, broadcastable) distinct
    key set.
    """
    from onetl_spark.operators.temporal import scd2_intervals

    if store is None:
        return scd2_intervals(batch, key_cols, ts_col, value_col, tie_break)
    keys = list(key_cols)
    pass_through, events = _scd2_seed_union(
        store, batch, keys, ts_col, value_col, tie_break
    )
    flagged = _scd2_collapse(events, keys, ts_col, value_col, tie_break)
    runs = flagged.groupBy(*_cols(keys), F.col("_run")).agg(
        F.min(value_col).alias("value"),
        F.min(ts_col).alias("effective_from"),
        F.sum("_w").alias("n_events"),
    )
    w2 = Window.partitionBy(*_cols(keys)).orderBy("_run")
    merged = runs.select(
        *keys,
        F.col("value"),
        F.col("effective_from"),
        F.lead("effective_from").over(w2).alias("effective_to"),
        F.lead("effective_from").over(w2).isNull().alias("is_current"),
        F.col("n_events").cast("long").alias("n_events"),
    )
    cols = [*keys, "value", "effective_from", "effective_to", "is_current", "n_events"]
    return pass_through.select(*cols).unionByName(merged.select(*cols))


def scd2_batch_audit(
    store: DataFrame | None,
    batch: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Per-key change verdicts for one batch against the current store —
    the load-audit row a dimension pipeline logs before committing
    :func:`scd2_apply_batch`'s result.

    One row per key present in the batch: ``verdict`` (``new_key`` —
    first appearance ever; ``changed`` — at least one new run opened;
    ``unchanged`` — every event continued the current run),
    ``n_runs_opened`` (runs whose ``effective_from`` falls in this
    batch; for a new key that includes its first run) and ``n_events``.

    Cost: the same batch-sized collapse as the apply step, then one
    per-key aggregate — history is never touched beyond the semi-join
    for the seeds.
    """
    keys = list(key_cols)
    if store is None:
        spark_cols = [
            *keys,
            F.col(ts_col),
            F.col(value_col),
            F.lit(1).cast("long").alias("_w"),
            F.lit(0).alias("_seed"),
            *[F.col(c) for c in tie_break],
        ]
        events = batch.select(*spark_cols)
    else:
        _, events = _scd2_seed_union(
            store, batch, keys, ts_col, value_col, tie_break
        )
    flagged = _scd2_collapse(events, keys, ts_col, value_col, tie_break)
    per_key = flagged.groupBy(*_cols(keys)).agg(
        F.max("_run").alias("_n_runs"),
        F.max("_seed").alias("_had_seed"),
        F.sum(F.lit(1) - F.col("_seed")).cast("long").alias("n_events"),
    )
    opened = (F.col("_n_runs") - F.col("_had_seed")).cast("long")
    return per_key.select(
        *keys,
        F.when(F.col("_had_seed") == 0, F.lit("new_key"))
        .when(opened > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("verdict"),
        opened.alias("n_runs_opened"),
        F.col("n_events"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of the same table: one row
    per key that was added, removed, or changed, with the old and new
    value of every compared column (``old_<c>`` / ``new_<c>``).

    The load-validation primitive around any full-refresh transfer:
    "what did this reload actually change?" without re-reading history.

    Cost: one full-outer shuffle join on the key — the minimum for a
    row-level diff; with both snapshots bucketed by the key it is
    shuffle-free. Change detection is a null-safe comparison per column
    (NULL→value and value→NULL count as changes); unchanged keys are
    filtered before any further processing, so the output is
    change-sized, not table-sized.
    """
    if not key_cols:
        raise ValueError("snapshot_diff requires at least one key column")
    compare_cols = [c for c in (compare_cols or old.columns) if c not in key_cols]
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = functools.reduce(
        operator.and_, [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols],
    )
    joined = o.join(n, cond, "full_outer")
    old_present = functools.reduce(
        operator.or_, [F.col(f"o.{k}").isNotNull() for k in key_cols],
    )
    new_present = functools.reduce(
        operator.or_, [F.col(f"n.{k}").isNotNull() for k in key_cols],
    )
    same = functools.reduce(
        operator.and_,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
        F.lit(True),
    )
    change = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.select(
            *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols],
            change.alias("change_type"),
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in compare_cols],
        )
        .filter(F.col("change_type").isNotNull())
    )
