"""Mergeable-sketch ingest monitoring: cross-batch distinct/dup-rate
series from persisted HyperLogLog registers.

The day-2 side of the sketch family (`operators/sketches.py`): every
existing sketch query summarizes ONE fixed corpus; a production ingest
pipeline instead asks, per source per batch, "how many of today's keys
have we EVER seen?" — distinct users per event type per day, fresh
URLs per crawl snapshot, dedup-rate drift per feed. Because HLL
registers merge exactly (register-wise max == the sketch of the union),
the whole cumulative series is a RELATION, not a driver loop:

- :func:`hll_ingest_series` — per (group, batch) time series of the
  cumulative distinct estimate, the per-batch new-distinct delta, and
  the returning-key rate, computed declaratively: one groupBy to the
  per-batch registers, a dense (batch × group × bucket) grid (constant
  size: batches × groups × m — independent of corpus rows), and ONE
  running-max window for the cumulative registers.

Reference parity: onetl has no sketch layer; this extends the
incremental/HWM direction (`strategy/incremental.py`,
`llm/dedup.py minhash_signature_store`) to corpus observability. The
streaming twin with an external persisted register store lives in
`streaming/ingest.py`.

Scale posture (100 TB): corpus rows are touched exactly once by the
per-(batch, group) register aggregation (map-side combined to ≤
batches×groups×m partials per partition); everything downstream — the
dense grid, the cumulative window, the estimates, the lag — runs on the
grid, whose size is batches × groups × 2^b rows (30 days × 100 sources
× 256 = 768k rows for a petabyte corpus). No joins against the corpus,
no collects, no iteration.

Float determinism: registers and their harmonic sums are EXACT integers
(each term 2^(W+1-rho), summed as decimal); the only doubles are the
final estimate expression and the derived deltas/rates, all emitted
through the composed fsig discipline (round(float32(x), 9) + 0.0) and —
critically — every downstream statistic (delta, rate) is computed FROM
the already-quantized values, so both engines walk the same grid.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from onetl_spark.operators.sketches import _hll_alpha, _HLL_HASH_BITS, hll_registers_by

__all__ = ["hll_ingest_series", "hll_cumulative_registers", "hll_grid_estimate"]


def _fsig(col):
    """round(float32(x), 9) + 0.0 — see `showcase/util.fsig`."""
    return F.round(col.cast("float").cast("double"), 9) + F.lit(0.0)


def hll_cumulative_registers(
    df: DataFrame,
    batch_col: str,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """Dense cumulative register grid: for every (batch, group, bucket)
    the max rho over ALL batches ≤ this one — i.e. the register table of
    the union of every batch so far, per group, at every point of the
    series, in one window pass.

    Rows with a NULL batch key, group key, or value are excluded (a NULL
    key is not a batch; a NULL value is not a key observation — the same
    rule `hll_registers_by` applies to values).
    """
    m = 1 << b
    keep = F.col(value_col).isNotNull() & F.col(batch_col).isNotNull()
    for g in group_cols:
        keep = keep & F.col(g).isNotNull()
    staged = df.filter(keep)
    regs = hll_registers_by(staged, value_col, [batch_col, *group_cols], b=b)
    spark = df.sparkSession
    # constant-size grid: batches × groups × m, independent of corpus rows
    batches = staged.select(batch_col).distinct()
    groups = staged.select(*group_cols).distinct()
    buckets = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    grid = batches.crossJoin(groups).crossJoin(F.broadcast(buckets))
    dense = grid.join(regs, [batch_col, *group_cols, "bucket"], "left").select(
        batch_col,
        *group_cols,
        "bucket",
        F.coalesce("rho", F.lit(0)).alias("rho"),
    )
    w_cum = (
        W.partitionBy(*group_cols, "bucket")
        .orderBy(batch_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return dense.select(
        batch_col, *group_cols, "bucket", F.max("rho").over(w_cum).alias("rho")
    )


def hll_grid_estimate(
    cum_registers: DataFrame,
    batch_col: str,
    group_cols: Sequence[str],
    b: int = 8,
) -> DataFrame:
    """Per-(batch, group) distinct estimate over a dense register grid —
    the `hll_estimate` expression (exact decimal harmonic sum, standard
    linear-counting correction) applied grid-wise in one aggregation.
    The estimate is emitted through the composed fsig rounding."""
    m = 1 << b
    w_bits = _HLL_HASH_BITS - b
    alpha = _hll_alpha(m)
    term = F.pow(F.lit(2.0), F.lit(w_bits + 1) - F.col("rho")).cast("decimal(38,0)")
    agg = cum_registers.groupBy(batch_col, *group_cols).agg(
        F.sum(term).alias("_s"),
        F.sum((F.col("rho") == 0).cast("long")).alias("_z"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(2 ** (w_bits + 1)))
        / F.col("_s").cast("double")
    )
    est = F.when(
        (raw < 2.5 * m) & (F.col("_z") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_z")),
    ).otherwise(raw)
    return agg.select(
        batch_col, *group_cols, _fsig(est).alias("cum_distinct")
    )


def hll_ingest_series(
    df: DataFrame,
    batch_col: str,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """Cross-batch ingest-monitoring series, fully declarative.

    Returns one row per (group, batch):

    - ``batch_rows`` — rows observed in the batch (non-null values)
    - ``cum_distinct`` — HLL estimate of distinct values over ALL
      batches up to and including this one
    - ``new_distinct`` — the delta vs the previous batch's cumulative
      estimate (the estimated number of never-seen-before keys)
    - ``returning_rate`` — ``1 − new_distinct / batch_rows`` clamped to
      [0, 1] (estimator jitter can push the raw ratio slightly out);
      NULL for a (group, batch) with zero observed rows

    The series is the natural input of the drift monitors
    (`operators/changepoint.py cusum_excursions` over
    ``returning_rate``): a returning-rate collapse means the source
    started emitting fresh keys (a crawler breakout), a spike means it
    is re-sending history (a replay incident).

    ``new_distinct`` and ``returning_rate`` are computed FROM the
    fsig-quantized ``cum_distinct`` values (not the raw doubles), so
    any engine reproducing ``cum_distinct`` reproduces the whole series.
    """
    keep = F.col(value_col).isNotNull() & F.col(batch_col).isNotNull()
    for g in group_cols:
        keep = keep & F.col(g).isNotNull()
    staged = df.filter(keep)
    cum = hll_cumulative_registers(df, batch_col, group_cols, value_col, b=b)
    est = hll_grid_estimate(cum, batch_col, group_cols, b=b)
    rows = staged.groupBy(batch_col, *group_cols).agg(
        F.count(F.lit(1)).alias("batch_rows")
    )
    w_lag = W.partitionBy(*group_cols).orderBy(batch_col)
    series = est.join(rows, [batch_col, *group_cols], "left").select(
        batch_col,
        *group_cols,
        F.coalesce("batch_rows", F.lit(0)).alias("batch_rows"),
        "cum_distinct",
        _fsig(
            F.col("cum_distinct") - F.lag("cum_distinct", 1, 0.0).over(w_lag)
        ).alias("new_distinct"),
    )
    rate = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(1.0) - F.col("new_distinct") / F.col("batch_rows"),
        ),
    )
    return series.select(
        batch_col,
        *group_cols,
        "batch_rows",
        "cum_distinct",
        "new_distinct",
        F.when(F.col("batch_rows") > 0, _fsig(rate)).alias("returning_rate"),
    )
