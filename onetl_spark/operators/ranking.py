"""Global ranking primitives without a single-partition sort.

``ROW_NUMBER() OVER (ORDER BY ...)`` and ``NTILE(n) OVER (ORDER BY ...)``
with an empty PARTITION BY are the canonical 100-TB scale-killers: Spark
plans them as ``Exchange SinglePartition`` + one task sorting the whole
table. These helpers reconstruct the exact same numbering from a
bucket-partitioned window plus driver-side prefix offsets — the same
decomposition :func:`onetl_spark.llm.sampling.trim_to_token_budget` uses
for its global running sum:

1. ``approxQuantile`` on the leading order column defines ``buckets``
   value ranges (deterministic Greenwald–Khanna, no RNG; equal values
   always share a bucket);
2. per-bucket row counts (map-side combined, ≤ ``buckets`` rows to the
   driver) become exclusive prefix offsets;
3. ``row_number`` over a window partitioned BY BUCKET (ordered by the
   full key) plus the bucket's offset equals the global row number for
   ANY boundary placement.

Cost: one stats pass + one tiny count shuffle + ONE full shuffle (the
bucket window) — the same exchange count as a distributed ORDER BY,
with every bucket sorted in parallel instead of on one task.

Reference parity: the reference engine exposes window ranking through
its SQL surface (SURVEY.md §2.10); this module is the scale-correct
Spark expression of the partition-less case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def ascending_bucket(bounds: list[float], col: Column) -> Column:
    """Ascending range id: #boundaries strictly below the value. The
    shared quantile-bucketing expression (also used by the PSI drift
    monitor in ``operators/quality.py``)."""
    b = F.lit(0)
    for v in bounds:
        b = b + F.when(col > F.lit(v), 1).otherwise(0)
    return b.cast("int")



def bucket_prefix_offsets(per_bucket: dict, n_buckets: int) -> "tuple[dict, int]":
    """Driver-side prefix offsets from per-bucket totals (≤ buckets
    numbers) — the stitching step every bucketed global computation in
    this module shares (row index, NTILE, Gini, the KS ECDFs)."""
    off, acc = {}, 0
    for b in range(n_buckets):
        off[b] = acc
        acc += per_bucket.get(b, 0)
    return off, acc


def prefix_offset_expr(off_map: dict, bucket_col: str = "_bucket") -> Column:
    """CASE chain adding each bucket's prefix offset — pure projection."""
    expr = F.lit(0)
    for b, v in off_map.items():
        if v:
            expr = F.when(F.col(bucket_col) == b, F.lit(v)).otherwise(expr)
    return expr


def global_row_index(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    index_col: str = "row_idx",
    buckets: int = 32,
) -> DataFrame:
    """Contiguous 1-based global row numbers in ``(order_col,
    *tiebreak_cols)`` ascending order, equal to
    ``ROW_NUMBER() OVER (ORDER BY order_col, tiebreaks)`` — without the
    ``Exchange SinglePartition`` that the window form plans.

    ``order_col`` must be numeric/date-castable-to-double for the
    quantile probe and NOT NULL (Spark and DuckDB disagree on default
    NULL placement in ORDER BY; make NULL handling explicit upstream).
    The full key must be unique for the numbering to be deterministic —
    pass id columns in ``tiebreak_cols``.
    """
    indexed, _ = _global_row_index_with_total(
        df, order_col, tiebreak_cols, index_col, buckets
    )
    return indexed


def _global_row_index_with_total(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: tuple[str, ...],
    index_col: str,
    buckets: int,
) -> tuple[DataFrame, int]:
    """Shared core: also returns the total row count, which falls out of
    the per-bucket counts for free — callers like :func:`exact_ntile`
    would otherwise pay a second full pass for ``.count()``.

    Cost = 2 scans (quantile probe, bucket counts) + the bucket window.
    Like every multi-pass offset algorithm (see ``trim_to_token_budget``),
    the input must be stable across those jobs — cache or checkpoint a
    source that could change (e.g. a streaming-appended table) upstream.
    NULL order keys are detected inside the counts pass (sentinel
    bucket), not with a dedicated scan.
    """
    reserved = {"_ordd", "_bucket", index_col}
    clash = sorted(c for c in reserved if c in df.columns)
    if clash:
        raise ValueError(
            f"global_row_index: input already has column(s) {clash}; "
            "these names are reserved by the operator (rename them upstream)"
        )
    # monotone numeric image of the order column for the quantile probe
    # (DATE→DOUBLE is a disallowed cast in Spark; go through day numbers)
    dtype = dict(df.dtypes)[order_col]
    if dtype == "date":
        ordd = F.unix_date(F.col(order_col)).cast("double")
    elif dtype == "timestamp_ntz":
        # compose the image from NTZ wall-clock fields: an NTZ→TIMESTAMP
        # cast is session-tz-dependent and NON-monotone across a DST
        # spring-forward gap. Second resolution suffices — the image only
        # needs to be non-decreasing (ties share a bucket; the window
        # orders by the original column)
        c = F.col(order_col)
        ordd = (
            F.unix_date(c.cast("date")) * 86400
            + F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
        ).cast("double")
    elif dtype.startswith("timestamp"):
        ordd = F.col(order_col).cast("double")
    elif dtype in ("string", "binary", "boolean") or dtype.startswith(
        ("array", "struct", "map", "interval")
    ):
        # a string of digits would bucket numerically but window-sort
        # lexicographically — silently divergent numbering; a non-numeric
        # string casts to all-NULL, collapsing every row into one bucket
        raise ValueError(
            f"global_row_index: {order_col} has type {dtype}; the order "
            "column must be numeric, date, or timestamp"
        )
    else:
        ordd = F.col(order_col).cast("double")
    probed = df.withColumn("_ordd", ordd)
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(probed.stat.approxQuantile("_ordd", qs, 0.001)))
    t = probed.withColumn(
        "_bucket",
        F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(
            ascending_bucket(bounds, F.col("_ordd"))
        ),
    ).drop("_ordd")

    counts = {
        r["_bucket"]: r["n"]
        for r in t.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if counts.get(-1):
        raise ValueError(
            f"global_row_index: {order_col} contains NULLs; coalesce or filter "
            "them first (engines disagree on default NULL sort placement)"
        )
    off_map, acc = bucket_prefix_offsets(counts, len(bounds) + 1)
    off = prefix_offset_expr(off_map)

    w = W.partitionBy("_bucket").orderBy(
        F.col(order_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    indexed = t.withColumn(
        index_col, (F.row_number().over(w) + off).cast("long")
    ).drop("_bucket")
    return indexed, acc


def exact_ntile(
    df: DataFrame,
    n: int,
    order_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    tile_col: str = "tile",
    buckets: int = 32,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_col, tiebreaks)`` — equal
    frequency binning — derived from :func:`global_row_index` so no
    single-partition exchange is planned.

    SQL-standard tile sizes: with ``total = q*n + r`` rows, the first
    ``r`` tiles get ``q+1`` rows and the rest ``q`` — reproduced here in
    closed form from the global index, bit-identical to DuckDB/Spark
    ``NTILE``.
    """
    if n <= 0:
        raise ValueError(f"exact_ntile: n must be positive, got {n}")
    idx, total = _global_row_index_with_total(
        df, order_col, tiebreak_cols, "_gidx", buckets
    )
    q, r = divmod(total, n)
    i = F.col("_gidx")
    if q == 0:
        tile = i
    else:
        # integer `div`, not double `/`: double division mis-rounds once
        # row counts approach 2^53, and exactness at any total is free
        head = r * (q + 1)
        tile = F.when(
            i <= F.lit(head), F.expr(f"((_gidx - 1) div {q + 1}) + 1")
        ).otherwise(F.expr(f"{r} + ((_gidx - {head} - 1) div {q}) + 1"))
    return idx.withColumn(tile_col, tile.cast("int")).drop("_gidx")


def exact_percent_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    rank_col: str = "pct_rank",
    buckets: int = 32,
) -> DataFrame:
    """Exact ``PERCENT_RANK() OVER (ORDER BY order_col, tiebreaks)`` =
    ``(row_number - 1) / (total - 1)`` via the distributed global index —
    same single-shuffle shape, no single-partition sort. A single-row
    input gets rank 0.0 (the SQL convention)."""
    idx, total = _global_row_index_with_total(
        df, order_col, tiebreak_cols, "_gidx", buckets
    )
    denom = float(total - 1) if total > 1 else 1.0
    return idx.withColumn(
        rank_col, (F.col("_gidx") - 1).cast("double") / F.lit(denom)
    ).drop("_gidx")


def exact_cume_dist(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    dist_col: str = "cume_dist",
    buckets: int = 32,
) -> DataFrame:
    """Exact ``CUME_DIST() OVER (ORDER BY order_col, tiebreaks)`` =
    ``row_number / total`` via the distributed global index. With the
    full (order, tiebreak) key unique — the same requirement
    :func:`global_row_index` already imposes — no two rows tie, so the
    row-number form equals the peers-inclusive SQL definition. With a
    NON-unique key the builtins give all peers one shared value while
    this gives them distinct arbitrary ones — enforcing uniqueness would
    cost a full extra pass, so it stays a documented precondition (same
    contract as :func:`global_row_index`)."""
    idx, total = _global_row_index_with_total(
        df, order_col, tiebreak_cols, "_gidx", buckets
    )
    return idx.withColumn(
        dist_col, F.col("_gidx").cast("double") / F.lit(float(max(total, 1)))
    ).drop("_gidx")


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    scale: int = 6,
    buckets: int = 32,
) -> DataFrame:
    """Gini coefficient of a non-negative value column — the
    concentration number behind "the top 1% of users drive X% of
    revenue". Uses the closed form over ascending ranks,
    ``G = (2·Σ i·x_i) / (n·Σ x) − (n+1)/n``, with the rank ``i`` coming
    from :func:`global_row_index` — so there is NO single-partition sort
    anywhere (the property the whole ranking family guards).

    Exactness: values scale to integer micro-units (``decimal``), so
    both Σ x and Σ i·x_i are exact integers; the final expression is a
    fixed double parenthesization any engine reproduces. One
    bucket-window shuffle + one 1-row aggregate — the non-negativity
    check rides the same aggregate (``raise_error`` at execution time,
    no dedicated validation scan). The unique (value, tiebreak) ordering
    key is the same UNENFORCED precondition as
    :func:`global_row_index`.
    """
    mu = 10**scale
    idx, total = _global_row_index_with_total(
        df, value_col, tiebreak_cols, "_gidx", buckets
    )
    units = (
        F.col(value_col).cast(f"decimal(30,{scale})") * F.lit(mu).cast("decimal(8,0)")
    ).cast("decimal(38,0)")
    m = idx.agg(
        F.sum(units).alias("_sx"),
        F.sum(units * F.col("_gidx").cast("decimal(12,0)")).alias("_six"),
        F.min(F.col(value_col).cast("double")).alias("_minv"),
    )
    n = F.lit(float(total))
    gini = F.round(
        (F.lit(2.0) * F.col("_six").cast("double"))
        / (n * F.col("_sx").cast("double"))
        - (n + F.lit(1.0)) / n,
        9,
    )
    return m.select(
        F.lit(total).cast("long").alias("n"),
        F.when(
            F.col("_minv") < 0,
            F.raise_error(
                F.lit("gini_coefficient: values must be non-negative")
            ).cast("double"),
        )
        .otherwise(gini)
        .alias("gini"),
    )


def stitched_cumsums(
    counts: DataFrame,
    value_col: str,
    weight_cols: "tuple[str, ...]",
    buckets: int = 32,
) -> "tuple[DataFrame, dict[str, int]]":
    """Shared scaffold for global cumulative sums over a DISTINCT-value
    relation (the KS/Mann-Whitney/Spearman rank machinery): bucket the
    values by sampled quantiles, run per-bucket inclusive cumulative
    sums of every weight column, and stitch them global with driver
    prefix offsets — no single-partition window anywhere.

    ``counts`` must already be one row per distinct value (and stable
    across jobs — localCheckpoint upstream; every caller here does).
    Returns ``(frame, totals)``: the input columns plus ``_cum_<w>``
    (inclusive global cumsum) per weight, and each weight's grand total.
    """
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(counts.stat.approxQuantile(value_col, qs, 0.001)))
    t = counts.withColumn("_bkt", ascending_bucket(bounds, F.col(value_col)))
    per_bucket = t.groupBy("_bkt").agg(
        *[F.sum(wc).alias(wc) for wc in weight_cols]
    ).collect()
    n_buckets = len(bounds) + 1
    offs, totals = {}, {}
    for wc in weight_cols:
        offs[wc], totals[wc] = bucket_prefix_offsets(
            {r["_bkt"]: r[wc] for r in per_bucket}, n_buckets
        )
    w = (
        W.partitionBy("_bkt")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = t
    for wc in weight_cols:
        out = out.withColumn(
            f"_cum_{wc}", F.sum(wc).over(w) + prefix_offset_expr(offs[wc], "_bkt")
        )
    return out.drop("_bkt"), totals


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    buckets: int = 32,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not dominated on
    (``minimize_col`` ↓, ``maximize_col`` ↑) — the multi-objective
    "best tradeoffs" operator (Börzsönyi et al. ICDE'01). The classic
    sweep — sort by the minimized axis, keep a point iff it beats the
    running max of the maximized axis — needs a GLOBAL prefix max; here
    it runs as the bucketed scaffold's MAX variant: same-price dominance
    collapses map-side (one groupBy to (min_val → max of max_val)),
    values bucket by sampled quantiles, the prefix max runs per bucket
    (distributed windows) and a ≤``buckets``-entry literal map carries
    each bucket's predecessor maximum. No single-partition window; the
    swept relation is distinct-value-sized. Output (the skyline itself)
    is famously tiny — O(log n) expected for independent dimensions.
    Returns ``(<minimize_col>, <maximize_col>)`` sorted by the first.
    """
    from pyspark.sql.window import Window as W

    pd_rel = (
        df.select(
            F.col(minimize_col).alias("_p"), F.col(maximize_col).alias("_d")
        )
        .filter(F.col("_p").isNotNull() & F.col("_d").isNotNull())
        .groupBy("_p")
        .agg(F.max("_d").alias("_d"))
        .localCheckpoint(eager=False)
    )
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(
        set(pd_rel.stat.approxQuantile("_p", qs, 0.001))
    )
    t = pd_rel.withColumn("_bkt", ascending_bucket(bounds, F.col("_p")))
    per_bucket = t.groupBy("_bkt").agg(F.max("_d").alias("_dmax")).collect()
    n_buckets = len(bounds) + 1
    dmax = {r["_bkt"]: r["_dmax"] for r in per_bucket}
    prev_max: dict = {}
    running = None
    for bkt in range(n_buckets):
        if running is not None:
            prev_max[bkt] = running
        if bkt in dmax:
            running = dmax[bkt] if running is None else max(running, dmax[bkt])
    w = (
        W.partitionBy("_bkt")
        .orderBy("_p")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    in_bucket_prev = F.max("_d").over(w)
    prev_expr = None
    for bkt, pv in prev_max.items():
        c = F.when(F.col("_bkt") == bkt, F.lit(pv))
        prev_expr = c if prev_expr is None else prev_expr.when(
            F.col("_bkt") == bkt, F.lit(pv)
        )
    bucket_prev = (
        prev_expr.otherwise(F.lit(None)) if prev_expr is not None else F.lit(None)
    )
    prevmax = F.greatest(
        F.coalesce(in_bucket_prev, bucket_prev),
        F.coalesce(bucket_prev, in_bucket_prev),
    )
    return (
        t.withColumn("_pm", prevmax)
        .filter(F.col("_pm").isNull() | (F.col("_d") > F.col("_pm")))
        .select(
            F.col("_p").alias(minimize_col), F.col("_d").alias(maximize_col)
        )
        .orderBy(minimize_col)
    )
