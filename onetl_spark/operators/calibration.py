"""Model-eval calibration operators: reliability diagram, expected /
maximum calibration error, Brier score with the Murphy decomposition.

The inference side the scoring family lacks: `operators/stats.py
roc_auc`/`auc_delong` measure DISCRIMINATION (ranking quality), while
calibration measures whether predicted probabilities MEAN what they say
— the "is 0.9 actually 90%?" question every model-filtered training-data
pipeline asks before thresholding a classifier's scores at corpus scale.

- :func:`reliability_bins` — the reliability-diagram relation: scores
  bucketed into ``n_bins`` equal-width bins; per bin the mean predicted
  probability, the empirical event rate, and their gap.
- :func:`calibration_report` — one row: ECE (bin-weighted |gap|), MCE
  (max |gap|), Brier score, and the Murphy decomposition
  ``brier ≈ reliability − resolution + uncertainty``.
- :func:`calibration_by_group` — per-group ECE/Brier grid (calibration
  drift across slices/time, pairing with `operators/changepoint.py`).

Scale posture (100 TB): one hash shuffle on the bin (or group×bin) key
with map-side partial aggregation — corpus rows never move unaggregated;
every downstream statistic runs on the bin grid (``n_bins`` rows, or
groups × n_bins). No windows, no joins except a 1-row broadcast of the
grand totals onto the grid.

Float determinism: per-row terms (score, squared error) are rounded to
9 dp then summed as DECIMAL and KEPT decimal through every re-aggregation
level (summing the per-bin doubles would reintroduce order dependence);
the single decimal→double cast happens at the final division. Bin-level
combined terms (ECE/decomposition) carry the ``n_b/N`` weight BEFORE
rounding, so they stay ≤ 1 in magnitude and the 9-dp rounding is always
effective (the magnitude-aware discipline) at any corpus size. Validity
checks (score ∈ [0,1], label ∈ {0,1}, non-null) ride the bin aggregate
itself and wrap EVERY output column, so any projection raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reliability_bins", "calibration_report", "calibration_by_group"]

_DEC = "decimal(38,9)"


def _guard(col, bad_col, op_name, typ="double"):
    return F.when(
        bad_col == 1,
        F.raise_error(
            F.lit(f"{op_name}: scores must be non-null in [0, 1] and labels 0/1")
        ).cast(typ),
    ).otherwise(col)


def _bin_relation(
    df: DataFrame, score_col: str, label_col: str, n_bins: int, extra_keys: list[str]
) -> DataFrame:
    """Shared per-bin aggregate. ``_sp``/``_sq`` stay DECIMAL (exact);
    the validity flag rides the same aggregate — no validation scan."""
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    bad_row = (
        p.isNull() | y.isNull() | (p < 0) | (p > 1) | ((y != 0) & (y != 1))
    ).cast("int")
    b = F.least(F.lit(n_bins - 1), F.floor(p * n_bins)).cast("int")
    return (
        df.select(
            *extra_keys,
            F.coalesce(b, F.lit(0)).alias("bin"),
            p.alias("_p"),
            F.coalesce(y, F.lit(0)).alias("_y"),
            bad_row.alias("_bad"),
        )
        .groupBy(*extra_keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("_p"), 9).cast(_DEC)).alias("_sp"),
            F.sum("_y").alias("n_pos"),
            F.sum(
                F.round(
                    (F.col("_p") - F.col("_y")) * (F.col("_p") - F.col("_y")), 9
                ).cast(_DEC)
            ).alias("_sq"),
            F.max("_bad").alias("_anybad"),
        )
    )


def reliability_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram relation: one row per non-empty score bin with
    ``(bin, n, n_pos, mean_pred, event_rate, gap)``; ``gap = event_rate −
    mean_pred`` (positive = model under-confident in that bin).

    The validity guard is GLOBAL: a bad row anywhere in the corpus trips
    every emitted bin (a 1-row broadcast of ``max(_bad)`` onto the grid,
    the `_grid_report` pattern), so a caller that filters to other bins
    still cannot collect past an invalid input."""
    bins = _bin_relation(df, score_col, label_col, n_bins, [])
    gbad = bins.groupBy().agg(F.max("_anybad").alias("_gbad"))
    bins = bins.crossJoin(F.broadcast(gbad))
    mean_pred = F.col("_sp").cast("double") / F.col("n")
    rate = F.col("n_pos").cast("double") / F.col("n")

    def g(col, name, typ="double"):
        return _guard(col, F.col("_gbad"), "reliability_bins", typ).alias(name)

    return bins.select(
        "bin",
        g(F.col("n"), "n", "long"),
        g(F.col("n_pos"), "n_pos", "long"),
        g(F.round(mean_pred, 9) + F.lit(0.0), "mean_pred"),
        g(F.round(rate, 9) + F.lit(0.0), "event_rate"),
        g(F.round(rate - mean_pred, 9) + F.lit(0.0), "gap"),
    )


def _grid_report(bins: DataFrame, extra_keys: list[str], op_name: str) -> DataFrame:
    """Bin grid → calibration report rows (one per key combination).

    All combined terms carry the ``w_b = n_b/N`` weight BEFORE the 9-dp
    rounding, so the decimal re-sum over bins stays ≤ 1 in magnitude —
    engine-stable regardless of corpus size.
    """
    totals = bins.groupBy(*extra_keys).agg(
        F.sum("n").alias("_N"),
        F.sum("n_pos").alias("_Npos"),
        F.sum("_sq").alias("_sqsum"),  # decimal-exact across bins
        F.max("_anybad").alias("_anybad2"),
    )
    joined = (
        bins.join(F.broadcast(totals), extra_keys)
        if extra_keys
        else bins.crossJoin(F.broadcast(totals))
    )
    w = F.col("n").cast("double") / F.col("_N")
    mean_pred = F.col("_sp").cast("double") / F.col("n")
    rate = F.col("n_pos").cast("double") / F.col("n")
    base = F.col("_Npos").cast("double") / F.col("_N")
    gap = rate - mean_pred
    per_bin = joined.select(
        *extra_keys,
        F.col("_N"),
        F.col("_Npos"),
        F.col("_sqsum"),
        F.col("_anybad2"),
        F.round(w * F.abs(gap), 9).cast(_DEC).alias("_ece_t"),
        F.abs(gap).alias("_absgap"),
        F.round(w * gap * gap, 9).cast(_DEC).alias("_rel_t"),
        F.round(w * (rate - base) * (rate - base), 9).cast(_DEC).alias("_res_t"),
    )
    out = per_bin.groupBy(*extra_keys).agg(
        F.max("_N").alias("_n"),
        F.max("_Npos").alias("_np"),
        F.sum("_ece_t").alias("_ece"),
        F.max("_absgap").alias("_mce"),
        F.max("_sqsum").alias("_sq2"),
        F.sum("_rel_t").alias("_rel"),
        F.sum("_res_t").alias("_res"),
        F.max("_anybad2").alias("_bad3"),
    )
    base2 = F.col("_np").cast("double") / F.col("_n")

    def emit(col, name, typ="double"):
        return _guard(col, F.col("_bad3"), op_name, typ).alias(name)

    return out.select(
        *extra_keys,
        emit(F.col("_n"), "n", "long"),
        emit(F.round(base2, 9) + F.lit(0.0), "base_rate"),
        emit(F.round(F.col("_ece").cast("double"), 9) + F.lit(0.0), "ece"),
        emit(F.round(F.col("_mce"), 9) + F.lit(0.0), "mce"),
        emit(
            F.round(F.col("_sq2").cast("double") / F.col("_n"), 9) + F.lit(0.0),
            "brier",
        ),
        emit(F.round(F.col("_rel").cast("double"), 9) + F.lit(0.0), "reliability"),
        emit(F.round(F.col("_res").cast("double"), 9) + F.lit(0.0), "resolution"),
        emit(
            F.round(base2 * (F.lit(1.0) - base2), 9) + F.lit(0.0), "uncertainty"
        ),
    )


def calibration_report(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """One-row calibration report: ``(n, base_rate, ece, mce, brier,
    reliability, resolution, uncertainty)`` — the Murphy decomposition
    satisfies ``brier ≈ reliability − resolution + uncertainty`` up to
    within-bin variance of the predictions."""
    bins = _bin_relation(df, score_col, label_col, n_bins, [])
    return _grid_report(bins, [], "calibration_report")


def calibration_by_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Per-group calibration grid — ECE/Brier per slice or time bucket,
    the input a drift monitor (`cusum_excursions`) watches for
    "the model got worse on THIS segment" at ingest time."""
    bins = _bin_relation(df, score_col, label_col, n_bins, list(group_cols))
    return _grid_report(bins, list(group_cols), "calibration_by_group")
