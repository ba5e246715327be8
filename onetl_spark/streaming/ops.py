"""Streaming operators: watermarked windowed aggregation, streaming dedup,
and custom stateful operators via ``applyInPandasWithState``.

The stateful path follows the Spark-first rule: built-ins first
(``window``/``session_window``/``dropDuplicatesWithinWatermark``), and an
Arrow-batched ``applyInPandasWithState`` only for semantics they can't
express (arbitrary per-key running state).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_aggregate(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    aggs: dict[str, Column],
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_by: Iterable[str] = (),
) -> DataFrame:
    """Tumbling/sliding event-time windows with a late-data watermark.

    Watermark timing (pinned by
    ``test_watermark_drops_late_rows_across_microbatches``): Spark's
    late-row filter uses the watermark computed through the PREVIOUS
    micro-batch, and state eviction merges the current batch's rows
    first — a late row landing in the same batch that finalizes its
    window is still included; rows arriving in later batches are dropped
    (``numRowsDroppedByWatermark``)."""
    withmark = df.withWatermark(time_col, watermark)
    window = F.window(F.col(time_col), window_duration, slide) if slide else F.window(
        F.col(time_col), window_duration,
    )
    grouped = withmark.groupBy(window.alias("win"), *group_by)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *group_by,
        *aggs.keys(),
    )


def sessionize(
    df: DataFrame,
    time_col: str,
    gap: str,
    aggs: dict[str, Column],
    group_by: Iterable[str] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based) via the built-in ``session_window``."""
    withmark = df.withWatermark(time_col, watermark)
    grouped = withmark.groupBy(
        F.session_window(F.col(time_col), gap).alias("session"),
        *group_by,
    )
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *group_by,
        *aggs.keys(),
    )


def deduplicate_stream(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon — state is
    bounded by the watermark, so it holds up on unbounded streams."""
    return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def stateful_running_agg(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) maintained in
    ``applyInPandasWithState`` — the pattern for state the built-ins can't
    express. Emits one row per key per micro-batch with updated totals.
    """
    output_schema = T.StructType(
        [T.StructField(c, df.schema[c].dataType) for c in key_cols]
        + [
            T.StructField("running_count", T.LongType()),
            T.StructField("running_sum", T.DoubleType()),
        ],
    )
    state_schema = T.StructType(
        [
            T.StructField("count", T.LongType()),
            T.StructField("sum", T.DoubleType()),
        ],
    )

    def update(key, pdfs, state: GroupState):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((count, total))
        yield pd.DataFrame(
            [[*key, count, total]],
            columns=[*key_cols, "running_count", "running_sum"],
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def idempotent_batch_sink(write_fn, ledger_dir: str):
    """Exactly-once wrapper for ``foreachBatch`` sinks.

    Structured Streaming guarantees foreachBatch runs AT LEAST once per
    epoch: after a crash, the last uncommitted micro-batch REPLAYS with
    the same ``batch_id``. A sink that isn't idempotent (plain INSERT,
    Kafka produce, HTTP POST) duplicates that batch's output. This
    wrapper makes any sink idempotent with a commit ledger: one marker
    per committed epoch, written only AFTER ``write_fn`` succeeds; a
    replayed epoch sees its marker and is skipped.

    The ledger lives next to the checkpoint (any Hadoop-visible path —
    local, HDFS, S3). Marker writes are tiny metadata ops; at one per
    micro-batch they're irrelevant at any scale. This is the same
    batchId-dedup pattern Spark's own docs prescribe for transactional
    foreachBatch sinks.
    """
    import os

    os.makedirs(ledger_dir, exist_ok=True)

    def wrapped(df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"epoch-{batch_id}.committed")
        if os.path.exists(marker):
            return
        write_fn(df, batch_id)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, marker)  # atomic publish of the commit record

    return wrapped


def load_published_state(spark, run_dir: str):
    """Read the current committed state of :func:`publish_state`.
    Returns ``(df_or_None, last_batch_id)`` — ``(None, -1)`` before the
    first publication."""
    import os

    pointer = os.path.join(run_dir, "CURRENT")
    if not os.path.exists(pointer):
        return None, -1
    with open(pointer) as fh:
        name, batch_id = fh.read().strip().split(":")
    return spark.read.parquet(os.path.join(run_dir, name)), int(batch_id)


def publish_state(df: DataFrame, run_dir: str, batch_id: int) -> None:
    """Crash-atomic state publication for foreachBatch-maintained state.

    A delete-then-rename swap has a window where the accumulated state is
    GONE: a crash between the two calls makes the replayed epoch rebuild
    from only its own batch — silent data loss for merge-style sinks.
    Here every version writes to its own directory and a one-line pointer
    file flips atomically (``os.replace``); the pointer also records the
    batch id, so a NON-idempotent merge (e.g. additive aggregate state)
    can skip an epoch the state already folded in — exactly-once at the
    state level, independent of the commit ledger. Superseded versions
    are pruned only after the flip.
    """
    import os
    import shutil

    name = f"state-{batch_id}"
    df.write.mode("overwrite").parquet(os.path.join(run_dir, name))
    tmp = os.path.join(run_dir, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{name}:{batch_id}")
    os.replace(tmp, os.path.join(run_dir, "CURRENT"))
    for entry in os.listdir(run_dir):
        if entry.startswith("state-") and entry != name:
            shutil.rmtree(os.path.join(run_dir, entry), ignore_errors=True)


def stateful_histogram(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    edges: list[float],
) -> DataFrame:
    """Custom stateful operator: per-key fixed-bin histogram maintained in
    ``applyInPandasWithState`` — bounded state (len(edges)+1 counters per
    key) no matter how long the stream runs, the streaming form of the
    batch quantile-sketch build. Bin i counts values in
    (edges[i-1], edges[i]]; bin 0 is (-inf, edges[0]]; the last bin is
    (edges[-1], +inf). Counts are ORDER-INDEPENDENT, so the final state
    per key equals the batch bucket counts exactly — which is what makes
    a deterministic oracle possible where an order-sensitive state (an
    EWMA) would not be. Emits one row per key per micro-batch with the
    running counts array.
    """
    if not edges or sorted(edges) != list(edges):
        raise ValueError("stateful_histogram: edges must be non-empty ascending")
    n_bins = len(edges) + 1
    output_schema = T.StructType(
        [T.StructField(c, df.schema[c].dataType) for c in key_cols]
        + [
            T.StructField("bin_counts", T.ArrayType(T.LongType())),
            T.StructField("n_total", T.LongType()),
        ],
    )
    state_schema = T.StructType(
        [T.StructField("counts", T.ArrayType(T.LongType()))],
    )

    def update(key, pdfs, state: GroupState):
        import bisect

        counts = list(state.get[0]) if state.exists else [0] * n_bins
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None or pd.isna(v):
                    continue
                counts[bisect.bisect_left(edges, float(v))] += 1
        state.update((counts,))
        yield pd.DataFrame(
            [[*key, counts, int(sum(counts))]],
            columns=[*key_cols, "bin_counts", "n_total"],
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_topk(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """Custom stateful operator: per-key running top-k values maintained
    in ``applyInPandasWithState`` — bounded state (k floats + one
    counter per key) no matter how long the stream runs, the streaming
    form of a per-group TakeOrdered. The top-k MULTISET of a stream is
    ORDER-INDEPENDENT (merge is commutative/associative), so the final
    state per key equals the batch per-group top-k exactly — the same
    property that makes the histogram operator oracle-checkable where
    an order-sensitive EWMA would not be. Emits one row per key per
    micro-batch: ``(keys..., topk_values (desc), n_seen)``.
    """
    if k < 1:
        raise ValueError("stateful_topk: k must be >= 1")
    output_schema = T.StructType(
        [T.StructField(c, df.schema[c].dataType) for c in key_cols]
        + [
            T.StructField("topk_values", T.ArrayType(T.DoubleType())),
            T.StructField("n_seen", T.LongType()),
        ],
    )
    state_schema = T.StructType(
        [
            T.StructField("topk", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
        ],
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            top, n = list(state.get[0]), int(state.get[1])
        else:
            top, n = [], 0
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None or pd.isna(v):
                    continue
                n += 1
                top.append(float(v))
        top = sorted(top, reverse=True)[:k]
        state.update((top, n))
        yield pd.DataFrame(
            [[*key, top, n]], columns=[*key_cols, "topk_values", "n_seen"]
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_daily_stats(
    df: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    micro_col: str = "v_micro",
    sq_micro_col: str = "sq_micro",
    max_days: int = 64,
) -> DataFrame:
    """Custom stateful operator: per-key rolling grid of DAILY sufficient
    statistics ``(n, Σx, Σx²)`` in integer micro-units, maintained in
    ``applyInPandasWithState`` — the streaming substrate for drift/
    changepoint monitoring: downstream analytics (CUSUM, changepoint,
    z-scores) are plain batch arithmetic OVER the emitted grid, so the
    state holds statistics, not conclusions.

    Order-independence (the oracle-checkability property this suite
    requires): integer sums are commutative/associative, and day
    retention keeps the ``max_days`` LARGEST day keys of the set seen —
    a set operation — so the final state per key is identical under any
    micro-batch split, as long as no late row arrives for an already-
    evicted day (the cap is a production state bound: size it to the
    lateness horizon; it never binds in the committed test window of 30
    days). State per key is ≤ max_days × 4 scalars forever.

    Inputs must be pre-projected by the caller: ``day_col`` a sortable
    day string, ``micro_col``/``sq_micro_col`` int64 micro-units
    (``round(value·10⁶)``) — exact commutative addition; int64 holds
    per-day totals up to ~9.2e18 micro-units (≈9.2e12 in value units).
    Emits one row per key per micro-batch: the full grid as parallel
    arrays plus ``n_total`` (monotone — take the max-n row for the
    final state).
    """
    if max_days < 1:
        raise ValueError("stateful_daily_stats: max_days must be >= 1")
    output_schema = T.StructType(
        [T.StructField(c, df.schema[c].dataType) for c in key_cols]
        + [
            T.StructField("days", T.ArrayType(T.StringType())),
            T.StructField("day_n", T.ArrayType(T.LongType())),
            T.StructField("day_sum_micro", T.ArrayType(T.LongType())),
            T.StructField("day_sq_micro", T.ArrayType(T.LongType())),
            T.StructField("n_total", T.LongType()),
        ],
    )
    state_schema = T.StructType(
        [
            T.StructField("days", T.ArrayType(T.StringType())),
            T.StructField("ns", T.ArrayType(T.LongType())),
            T.StructField("sums", T.ArrayType(T.LongType())),
            T.StructField("sqs", T.ArrayType(T.LongType())),
        ],
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            days, ns, sums, sqs = state.get
            grid = {
                d: [int(n), int(s), int(q)]
                for d, n, s, q in zip(days, ns, sums, sqs)
            }
        else:
            grid = {}
        for pdf in pdfs:
            agg = pdf.groupby(day_col).agg(
                n=(micro_col, "size"),
                s=(micro_col, "sum"),
                q=(sq_micro_col, "sum"),
            )
            for d, row in agg.iterrows():
                cell = grid.setdefault(str(d), [0, 0, 0])
                cell[0] += int(row["n"])
                cell[1] += int(row["s"])
                cell[2] += int(row["q"])
        kept = sorted(grid)[-max_days:]
        state.update(
            (
                kept,
                [grid[d][0] for d in kept],
                [grid[d][1] for d in kept],
                [grid[d][2] for d in kept],
            )
        )
        yield pd.DataFrame(
            [
                [
                    *key,
                    kept,
                    [grid[d][0] for d in kept],
                    [grid[d][1] for d in kept],
                    [grid[d][2] for d in kept],
                    int(sum(grid[d][0] for d in kept)),
                ]
            ],
            columns=[
                *key_cols,
                "days",
                "day_n",
                "day_sum_micro",
                "day_sq_micro",
                "n_total",
            ],
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
