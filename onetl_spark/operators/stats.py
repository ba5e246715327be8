"""Shared statistical expressions used by multiple operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pearson_from_moments(m: DataFrame, n_col: str = "n_days") -> DataFrame:
    """Closed-form Pearson r from exact moment sums ``(n_col, sx, sy,
    sxy, sxx, syy)``, evaluated in ONE fixed double parenthesization so
    any engine reproduces it bit-for-bit when the moments are exact
    (integer or decimal-derived). A zero denominator (constant series,
    or n==1) pins to NULL — Spark's ANSI division would raise and
    DuckDB's IEEE division would give NaN/inf, so both engines' oracles
    use ``NULLIF(sqrt(...), 0)`` to agree. Appends ``pearson_r``."""
    n = F.col(n_col).cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    den = F.when(den == 0, F.lit(None)).otherwise(den)
    return m.withColumn("pearson_r", F.round(num / den, 9))


def ks_two_sample(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic:
    ``D = sup_x |F_ref(x) − F_cur(x)|`` — the distribution-shape drift
    test that needs no binning choices (the companion to the PSI
    monitor, which tests pinned bins). Returns one row:
    ``(n_ref, n_cur, ks_stat, at_value)`` with ``at_value`` the smallest
    value achieving the supremum.

    Scale shape: the ECDFs need a GLOBAL cumulative sum over sorted
    distinct values — the same problem the global row index solves, and
    the same solution: per-side counts collapse to one row per distinct
    value (map-side combined), values bucket by sampled quantiles, the
    cumulative sums run per-bucket (distributed windows) and driver-side
    prefix offsets (≤ ``buckets`` numbers per side) stitch them into
    global ECDFs. NO single-partition window anywhere; the shuffles
    carry distinct values, not rows. NULLs are excluded (an ECDF has no
    place for them — PSI's NULL bucket covers missing-rate drift). Like
    every multi-pass offset algorithm here, the inputs must be stable
    across the internal jobs — the distinct-count relation is therefore
    localCheckpointed once and reused by the quantile probe, the bucket
    totals, and the ECDF pass.
    """
    a = df_ref.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    b = df_cur.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    counts = (
        a.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_na"))
        .join(
            b.groupBy("_v").agg(F.count(F.lit(1)).alias("_nb")),
            "_v",
            "full_outer",
        )
        .select(
            "_v",
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_na", "_nb"), buckets)
    acc_a, acc_b = totals["_na"], totals["_nb"]
    if acc_a == 0 or acc_b == 0:
        raise ValueError("ks_two_sample: both samples must be non-empty")
    ecdf = stitched.select(
        "_v", F.col("_cum__na").alias("_ca"), F.col("_cum__nb").alias("_cb")
    )
    d = ecdf.select(
        "_v",
        F.round(
            F.abs(
                F.col("_ca") / F.lit(float(acc_a))
                - F.col("_cb") / F.lit(float(acc_b))
            ),
            9,
        ).alias("_d"),
    )
    best = d.agg(
        F.max(
            F.struct(F.col("_d"), (-F.col("_v")).alias("_nv"), F.col("_v").alias("_at"))
        ).alias("_b")
    )
    return best.select(
        F.lit(acc_a).cast("long").alias("n_ref"),
        F.lit(acc_b).cast("long").alias("n_cur"),
        F.col("_b._d").alias("ks_stat"),
        F.col("_b._at").alias("at_value"),
    )


def mann_whitney_u(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact Mann–Whitney U (Wilcoxon rank-sum) with tie correction — the
    nonparametric location-shift test (KS asks "any shape difference?",
    this asks "is one sample systematically larger?"). Returns one row:
    ``(n_ref, n_cur, u_stat, z_score)`` with ``U`` for the REF side and
    the normal-approximation z (tie-corrected variance, continuity
    correction deliberately omitted — both engines then share one exact
    formula).

    Exactness: with integer counts per distinct value, the rank sum is
    the exact rational ``Σ na_v·(cum_before_v + (n_v+1)/2)`` — computed
    as integer ``2·ranksum`` so no float enters until the final z. Same
    bucketed distributed prefix-sum shape as :func:`ks_two_sample` (no
    single-partition window); NULLs excluded.
    """
    a = df_ref.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    b = df_cur.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    counts = (
        a.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_na"))
        .join(
            b.groupBy("_v").agg(F.count(F.lit(1)).alias("_nb")),
            "_v",
            "full_outer",
        )
        .select(
            "_v",
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    counts = counts.withColumn("_nv", F.col("_na") + F.col("_nb"))
    stitched, totals = stitched_cumsums(counts, "_v", ("_nv", "_na"), buckets)
    n_total, n_a = totals["_nv"], totals["_na"]
    n_b = n_total - n_a
    if n_a == 0 or n_b == 0:
        raise ValueError("mann_whitney_u: both samples must be non-empty")

    staged = stitched.select(
        "_na",
        "_nv",
        (F.col("_cum__nv") - F.col("_nv")).alias("_before"),
    )
    # 2·ranksum = Σ na·(2·before + nv + 1): exact integers end to end —
    # in DECIMAL, because a value tied >2.1M times would overflow the
    # LONG cube (the oracle's HUGEINT would not, silently diverging)
    nvd = F.col("_nv").cast("decimal(12,0)")
    m = staged.agg(
        F.sum(
            F.col("_na").cast("decimal(12,0)")
            * (
                F.lit(2).cast("decimal(1,0)") * F.col("_before").cast("decimal(14,0)")
                + nvd
                + F.lit(1)
            )
        ).alias("_rs2"),
        F.sum(nvd * nvd * nvd - nvd).alias("_ties"),
    )
    na_d, nb_d, n_d = float(n_a), float(n_b), float(n_total)
    u = (F.col("_rs2").cast("double") / F.lit(2.0)) - F.lit(na_d * (na_d + 1) / 2.0)
    mean_u = F.lit(na_d * nb_d / 2.0)
    var_u = (
        F.lit(na_d * nb_d / 12.0)
        * (
            F.lit(n_d + 1.0)
            - F.col("_ties").cast("double") / F.lit(n_d * (n_d - 1.0))
        )
    )
    z = F.when(var_u == 0, F.lit(None)).otherwise(
        F.round((u - mean_u) / F.sqrt(var_u), 9)
    )
    return m.select(
        F.lit(n_a).cast("long").alias("n_ref"),
        F.lit(n_b).cast("long").alias("n_cur"),
        F.round(u, 9).alias("u_stat"),
        z.alias("z_score"),
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cramér's V association strength between two categorical columns —
    the normalized chi-square (0 = independent, 1 = fully determined),
    the number a feature-selection pass ranks categorical pairs by.

    One contingency aggregate (map-side combined, |A|×|B| cells), the
    row/column margins re-aggregated from the cells (cell-table-sized),
    and the chi-square terms rounded to 9 then summed as exact decimals.
    Returns ``(n, n_a, n_b, chi2, cramers_v)``; NULL categories count as
    their own level (dropping them silently would bias the margins).
    """
    cells = (
        df.select(
            F.coalesce(F.col(col_a).cast("string"), F.lit("<null>")).alias("_a"),
            F.coalesce(F.col(col_b).cast("string"), F.lit("<null>")).alias("_b"),
        )
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
        .localCheckpoint(eager=False)
    )
    ra = cells.groupBy("_a").agg(F.sum("_o").alias("_rt"))
    cb = cells.groupBy("_b").agg(F.sum("_o").alias("_ct"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.countDistinct("_a").alias("_ka"),
        F.countDistinct("_b").alias("_kb"),
    )
    # the full |A|x|B| grid, NOT just observed cells: an empty cell
    # contributes its whole expectation ((0-e)^2/e = e) to chi-square —
    # dropping zero cells understates association (a perfectly
    # deterministic pair would score V=0.707 instead of 1)
    grid = ra.crossJoin(cb).join(cells, ["_a", "_b"], "left").select(
        "_a", "_b", "_rt", "_ct", F.coalesce("_o", F.lit(0)).alias("_o")
    )
    terms = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (
                    F.col("_o")
                    - F.col("_rt").cast("double") * F.col("_ct") / F.col("_n")
                )
                * (
                    F.col("_o")
                    - F.col("_rt").cast("double") * F.col("_ct") / F.col("_n")
                )
                / (F.col("_rt").cast("double") * F.col("_ct") / F.col("_n")),
                9,
            )
            .cast("decimal(25,9)")
            .alias("_t"),
            "_n",
            "_ka",
            "_kb",
        )
    )
    m = terms.groupBy("_n", "_ka", "_kb").agg(
        F.sum("_t").cast("double").alias("_chi2")
    )
    denom = F.col("_n").cast("double") * (
        F.least(F.col("_ka"), F.col("_kb")).cast("double") - F.lit(1.0)
    )
    v = F.when(denom == 0, F.lit(None)).otherwise(
        F.round(F.sqrt(F.col("_chi2") / denom), 9)
    )
    return m.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_ka").cast("long").alias("n_a"),
        F.col("_kb").cast("long").alias("n_b"),
        F.round(F.col("_chi2"), 9).alias("chi2"),
        v.alias("cramers_v"),
    )


def association_lift(
    df: DataFrame,
    basket_cols: "list[str]",
    item_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Market-basket association rules: for every unordered item pair
    co-present in a basket, support, both confidences, and lift
    ``P(a,b)/(P(a)P(b))`` — the classic "people who did A also did B"
    statistic (lift > 1: positive association).

    Scale shape: presence is one distinct over (basket, item); the pair
    generation self-joins per BASKET, so the fan-out is bounded by the
    basket's item count squared (items-per-basket is small by the
    problem's nature — cap upstream if a degenerate basket holds
    thousands of distinct items, same recall-knob convention as the
    LSH/blocking operators). Item totals join by item key (NOT broadcast
    — item vocabularies can be web-scale; AQE may still choose broadcast
    at runtime). ``min_count`` floors the pair count. All ratios are one
    pinned double parenthesization, rounded to 9.
    """
    b = [F.col(c) for c in basket_cols]
    # checkpointed: the basket count is baked into result literals, and
    # the presence relation feeds three further jobs — an unstable source
    # would otherwise divide fresh pair counts by a stale basket count
    items = (
        df.select(*b, F.col(item_col).alias("_it"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    baskets = items.select(*basket_cols).distinct()
    n_baskets = baskets.count()
    if n_baskets == 0:
        raise ValueError("association_lift: no baskets")
    totals = items.groupBy("_it").agg(F.count(F.lit(1)).alias("_cnt"))
    x, y = items.alias("x"), items.alias("y")
    cond = [F.col(f"x.{c}") == F.col(f"y.{c}") for c in basket_cols]
    pairs = (
        x.join(y, cond)
        .filter(F.col("x._it") < F.col("y._it"))
        .groupBy(
            F.col("x._it").alias("item_a"), F.col("y._it").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_count)
    )
    ta = totals.select(F.col("_it").alias("item_a"), F.col("_cnt").alias("_na"))
    tb = totals.select(F.col("_it").alias("item_b"), F.col("_cnt").alias("_nb"))
    nb_d = float(n_baskets)
    return (
        pairs.join(ta, "item_a")
        .join(tb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.col("_na").alias("n_a"),
            F.col("_nb").alias("n_b"),
            F.round(F.col("n_both") / F.lit(nb_d), 9).alias("support"),
            F.round(F.col("n_both") / F.col("_na"), 9).alias("conf_a_to_b"),
            F.round(F.col("n_both") / F.col("_nb"), 9).alias("conf_b_to_a"),
            F.round(
                (F.col("n_both").cast("double") * F.lit(nb_d))
                / (F.col("_na").cast("double") * F.col("_nb")),
                9,
            ).alias("lift"),
        )
    )


def spearman_correlation(
    df: DataFrame,
    col_a: str,
    col_b: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact Spearman rank correlation (tie-averaged ranks) — the
    monotone-dependence companion to Pearson (robust to outliers and
    nonlinearity; the feature-screening default for skewed metrics).

    Exactness: the tie-averaged rank of a value is
    ``cum_before + (n_v + 1)/2``; DOUBLED ranks
    (``2·cum_before + n_v + 1``) are integers, Pearson is scale-
    invariant, so all five moment sums run as exact decimal integers
    into the shared :func:`pearson_from_moments` parenthesization. Rank
    assignment per column uses the same bucketed distributed prefix-sum
    as the KS/Mann-Whitney ECDFs (distinct-value relations, driver
    offsets, NO single-partition window), then joins back to rows by
    value. Rows with a NULL in either column are excluded (pairwise
    deletion). Returns ``(n, spearman_rho)``.
    """
    pairs = df.select(
        F.col(col_a).cast("double").alias("_a"),
        F.col(col_b).cast("double").alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    pairs = pairs.localCheckpoint(eager=False)

    from onetl_spark.operators.ranking import stitched_cumsums

    def doubled_ranks(col: str, alias: str) -> DataFrame:
        counts = (
            pairs.groupBy(col)
            .agg(F.count(F.lit(1)).alias("_nv"))
            .localCheckpoint(eager=False)
        )
        stitched, _totals = stitched_cumsums(counts, col, ("_nv",), buckets)
        return stitched.select(
            col,
            (
                F.lit(2) * (F.col("_cum__nv") - F.col("_nv"))
                + F.col("_nv")
                + F.lit(1)
            ).alias(alias),
        )
    ra = doubled_ranks("_a", "_ra")
    rb = doubled_ranks("_b", "_rb")
    ranked = pairs.join(ra, "_a").join(rb, "_b")
    # products in DECIMAL, not LONG: doubled ranks reach 2n+1, so a LONG
    # multiply wraps past ~1.5e9 rows while the oracle's HUGEINT stays
    # exact — cast BEFORE multiplying ((16,0)x(16,0) -> (33,0))
    ra16 = F.col("_ra").cast("decimal(16,0)")
    rb16 = F.col("_rb").cast("decimal(16,0)")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ra16).cast("double").alias("sx"),
        F.sum(rb16).cast("double").alias("sy"),
        F.sum(ra16 * rb16).cast("double").alias("sxy"),
        F.sum(ra16 * ra16).cast("double").alias("sxx"),
        F.sum(rb16 * rb16).cast("double").alias("syy"),
    )
    return pearson_from_moments(m, n_col="n").select(
        F.col("n").cast("long").alias("n"),
        F.col("pearson_r").alias("spearman_rho"),
    )


def ols_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Closed-form simple linear regression (OLS) per group — slope,
    intercept, R², and the slope's standard error, all from ONE moment
    aggregate: the classical trend fit next to the robust Theil–Sen
    (which resists outliers; OLS is the efficiency baseline and the one
    with a finite-sample inference story).

    Exactness discipline: per-row terms round to 9 and accumulate as
    exact decimals (order-independent across any partitioning), then
    every statistic evaluates in ONE pinned double parenthesization via
    the centered sums ``Sxx = sxx − sx·sx/n`` etc., so any engine
    reproduces the numbers bit-for-bit. Degenerate cases pin to NULL:
    constant x (``Sxx == 0``) → NULL slope/intercept/R²/stderr; n ≤ 2 →
    NULL stderr (zero degrees of freedom); constant y → R² NULL (0/0).
    NULL pairs are pairwise-deleted.

    Scale shape: one map-side-combined aggregate per group — no
    windows, no driver data. 100 TB of points per group reduce to six
    numbers.
    """
    gx = [F.col(c) for c in group_cols]
    pairs = df.select(
        *gx,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())

    def dterm(c):
        return F.round(c, 9).cast("decimal(30,9)")

    m = pairs.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dterm(F.col("_x"))).cast("double").alias("sx"),
        F.sum(dterm(F.col("_y"))).cast("double").alias("sy"),
        F.sum(dterm(F.col("_x") * F.col("_y"))).cast("double").alias("sxy"),
        F.sum(dterm(F.col("_x") * F.col("_x"))).cast("double").alias("sxx"),
        F.sum(dterm(F.col("_y") * F.col("_y"))).cast("double").alias("syy"),
    )
    return ols_from_moments(m, n_col="_n").select(
        *[F.col(c) for c in group_cols],
        F.col("_n").cast("long").alias("n"),
        "slope",
        "intercept",
        "r2",
        "stderr_slope",
    )


def ols_from_moments(m: DataFrame, n_col: str = "n") -> DataFrame:
    """Closed-form OLS from moment sums ``(n_col, sx, sy, sxy, sxx,
    syy)`` — the expression layer under :func:`ols_fit`, exposed (like
    :func:`pearson_from_moments`) so callers that can produce EXACT
    moments (integer micro-unit series) get bit-identical cross-engine
    results. Appends ``slope``, ``intercept``, ``r2``, ``stderr_slope``
    (each rounded to 9); degenerate inputs pin to NULL as documented on
    :func:`ols_fit`."""
    n = F.col(n_col).cast("double")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / n
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / n
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / n
    den = F.nullif(sxx_c, F.lit(0.0))
    slope = sxy_c / den
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    # float cancellation can push SSE a hair below 0 — clamp, but via
    # when/otherwise (NOT greatest, which IGNORES nulls and would turn a
    # NULL slope's NULL sse into 0, leaking r2=1 on constant-x input)
    sse_raw = syy_c - slope * sxy_c
    sse = F.when(sse_raw < 0, F.lit(0.0)).otherwise(sse_raw)
    r2 = F.lit(1.0) - sse / F.nullif(syy_c, F.lit(0.0))
    stderr = F.when(
        F.col(n_col) > 2, F.sqrt((sse / (n - F.lit(2.0))) / den)
    )
    return (
        m.withColumn("slope", F.round(slope, 9))
        .withColumn("intercept", F.round(intercept, 9))
        .withColumn("r2", F.round(r2, 9))
        .withColumn("stderr_slope", F.round(stderr, 9))
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information between two categorical columns, in nats —
    the model-free dependence measure next to Cramér's V (MI sees any
    deviation from independence, not just chi-square-style association),
    plus both marginal entropies and the normalized MI
    ``NMI = MI / √(H(X)·H(Y))`` for a 0-1 scale.

    Exactness: counts are integers; each term evaluates in one pinned
    double parenthesization ``(cxy/n)·ln((cxy·n)/(cx·cy))`` with IEEE
    ln, rounds to 9 and accumulates as exact decimals — any engine
    reproduces the sums bit-for-bit. Degenerate single-category margins
    give H = 0 and NMI pins to NULL (0/0). NULL pairs are dropped
    (a NULL category is missingness, not a value — PSI's NULL bucket
    covers missing-rate drift).

    Scale shape: one (x,y) pair aggregate + two marginal aggregates,
    joined on category keys — all relations category-bounded; the
    1-row totals broadcast. No windows, no driver data.
    """
    pairs = df.select(
        F.col(x_col).cast("string").alias("_x"),
        F.col(y_col).cast("string").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    joint = pairs.groupBy("_x", "_y").agg(F.count(F.lit(1)).alias("_cxy"))
    mx = pairs.groupBy("_x").agg(F.count(F.lit(1)).alias("_cx"))
    my = pairs.groupBy("_y").agg(F.count(F.lit(1)).alias("_cy"))
    tot = pairs.agg(F.count(F.lit(1)).alias("_n"))

    n = F.col("_n").cast("double")

    def ent(cnt_col: str, cnt_frame: DataFrame) -> DataFrame:
        c = F.col(cnt_col).cast("double")
        term = F.round(-(c / n) * F.log(c / n), 9).cast("decimal(30,9)")
        return (
            cnt_frame.crossJoin(F.broadcast(tot))
            .agg(F.sum(term).cast("double").alias("_h"))
        )

    mi_terms = (
        joint.join(mx, "_x")
        .join(my, "_y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("_cxy").cast("double") / n)
                * F.log(
                    (F.col("_cxy").cast("double") * n)
                    / (F.col("_cx").cast("double") * F.col("_cy").cast("double"))
                ),
                9,
            )
            .cast("decimal(30,9)")
            .alias("_t")
        )
    )
    mi = mi_terms.agg(F.sum("_t").cast("double").alias("_mi"))
    hx = ent("_cx", mx).select(F.col("_h").alias("_hx"))
    hy = ent("_cy", my).select(F.col("_h").alias("_hy"))
    out = (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(tot))
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.round(F.col("_mi"), 9).alias("mi_nats"),
        F.round(F.col("_hx"), 9).alias("h_x_nats"),
        F.round(F.col("_hy"), 9).alias("h_y_nats"),
        F.round(
            F.col("_mi") / F.nullif(F.sqrt(F.col("_hx") * F.col("_hy")), F.lit(0.0)),
            9,
        ).alias("nmi"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label via the rank
    (Mann–Whitney) identity: ``AUC = P(score_pos > score_neg) + ties/2``
    — the one-number ranking-quality metric every classifier eval at
    corpus scale needs (quality-filter scores vs human labels, reward
    models vs preferences). Returns one row
    ``(n_pos, n_neg, auc, gini_ml)`` with ``gini_ml = 2·AUC − 1``.

    Exactness: per-distinct-score counts ride the same bucketed
    prefix-sum scaffold as :func:`mann_whitney_u`
    (`operators/ranking.py stitched_cumsums` — no single-partition
    window), the doubled tie-averaged rank sum stays integer in DECIMAL
    to the end, and one double division produces the AUC. Rows with a
    NULL score or label are excluded; raises if either class is empty
    (AUC is undefined).

    100-TB shape: the distinct-score relation is what shuffles, counts
    travel as map-side-combined aggregates, and the stitch is a
    bucket-count driver exchange — the same scale envelope as the other
    five statistics on this scaffold.
    """
    s = df.select(
        F.col(score_col).cast("double").alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
    counts = (
        s.groupBy("_v")
        .agg(
            F.count(F.lit(1)).alias("_nv"),
            F.sum("_y").alias("_na"),
        )
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_nv", "_na"), buckets)
    n_total, n_pos = totals["_nv"], totals["_na"]
    n_neg = n_total - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"roc_auc: need both classes, got n_pos={n_pos}, n_neg={n_neg}"
        )
    staged = stitched.select(
        "_na",
        "_nv",
        (F.col("_cum__nv") - F.col("_nv")).alias("_before"),
    )
    # 2·ranksum_pos = Σ na·(2·before + nv + 1), integer-exact in DECIMAL
    # (the mann_whitney_u overflow posture); AUC needs ONE division:
    # (2R − n_pos(n_pos+1)) / (2·n_pos·n_neg)
    m = staged.agg(
        F.sum(
            F.col("_na").cast("decimal(12,0)")
            * (
                F.lit(2).cast("decimal(1,0)")
                * F.col("_before").cast("decimal(14,0)")
                + F.col("_nv").cast("decimal(12,0)")
                + F.lit(1)
            )
        ).alias("_rs2")
    )
    num2 = F.col("_rs2").cast("decimal(30,0)") - F.lit(
        n_pos * (n_pos + 1)
    ).cast("decimal(30,0)")
    auc_raw = num2.cast("double") / F.lit(2.0 * n_pos * n_neg)
    return m.select(
        F.lit(n_pos).cast("long").alias("n_pos"),
        F.lit(n_neg).cast("long").alias("n_neg"),
        F.round(auc_raw, 9).alias("auc"),
        F.round(F.lit(2.0) * auc_raw - F.lit(1.0), 9).alias("gini_ml"),
    )


def cumulative_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_cols: "tuple[str, ...]" = (),
    n_buckets: int = 10,
    buckets: int = 32,
) -> DataFrame:
    """Cumulative-gains / lift table: rank by score DESCENDING, cut into
    ``n_buckets`` exact equal-frequency tiles, and report how fast the
    positives accumulate — the campaign-targeting / screening-efficiency
    view of a score ("the top decile captures X% of all positives at
    Y× random"). Returns per tile ``(bucket, n, n_pos, cum_pos_share,
    lift)``, ordered.

    The descending NTILE is :func:`onetl_spark.operators.ranking.
    exact_ntile` on the NEGATED score (ascending-negated ≡ descending,
    ties broken by ``tiebreak_cols`` ascending — the (order, tiebreak)
    key must be unique, the scaffold's standard contract), so no
    single-partition sort is ever planned. The cumulative window then
    runs over the ``n_buckets``-row SUMMARY — bounded by construction,
    never over data.
    """
    if n_buckets <= 0:
        raise ValueError(f"cumulative_gains: n_buckets must be positive")
    from pyspark.sql import Window

    from onetl_spark.operators.ranking import exact_ntile

    s = df.select(
        (-F.col(score_col).cast("double")).alias("_negscore"),
        F.col(label_col).cast("int").alias("_y"),
        *[F.col(c) for c in tiebreak_cols],
    ).filter(F.col("_negscore").isNotNull() & F.col("_y").isNotNull())
    t = exact_ntile(
        s, n_buckets, "_negscore", tiebreak_cols, tile_col="bucket", buckets=buckets
    )
    b = t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    tot = b.agg(
        F.sum("n").alias("_nt"), F.sum("n_pos").alias("_pt")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.crossJoin(F.broadcast(tot))  # 1-row totals
        .withColumn("_cum", F.sum("n_pos").over(w))
        .select(
            "bucket",
            "n",
            "n_pos",
            F.round(
                F.col("_cum").cast("double")
                / F.nullif(F.col("_pt").cast("double"), F.lit(0.0)),
                9,
            ).alias("cum_pos_share"),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n").cast("double"))
                / F.nullif(
                    F.col("_pt").cast("double") / F.col("_nt").cast("double"),
                    F.lit(0.0),
                ),
                9,
            ).alias("lift"),
        )
        .orderBy("bucket")
    )


def acf_ljung_box(
    df: DataFrame,
    index_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function (Box–Jenkins ACF, global-mean
    normalization) of an evenly spaced series, plus the cumulative
    Ljung–Box Q white-noise statistic — the seasonality/memory probe
    (a daily series with a weekly cycle spikes at lag 7; Q rejects
    "this metric is noise"). Returns per lag ``1..max_lag``:
    ``(lag, n_pairs, acf, ljung_box_q)``.

    ``r_k = Σ(x_t − x̄)(x_{t+k} − x̄) / Σ(x_t − x̄)²`` with the GLOBAL
    mean/variance (the classic estimator — unlike the per-lag-mean
    Pearson of a lead-lag cross-correlation). ``index_col`` must be an
    integer position on an evenly spaced grid (missing positions simply
    contribute no pairs); ``value_col`` must be integer-valued and fit
    ``decimal(18,0)`` — callers scale to micro-units first — so every
    moment sum is EXACT (decimal products, precision 37 ≤ the 38 cap)
    before the one cast to double, making the result order-independent
    and oracle-checkable.

    100-TB shape: lag pairing is an equi-join of the series with itself
    shifted by a BROADCAST max_lag-row relation — one shuffle keyed by
    the index; moment sums are map-side combined; the Ljung–Box
    cumulative window runs over the ``max_lag``-row summary only.
    Typical inputs are already pre-aggregated series (daily/hourly
    rollups), so the series relation is calendar-bounded regardless of
    raw data volume.
    """
    if max_lag < 1:
        raise ValueError(f"acf_ljung_box: max_lag must be >= 1, got {max_lag}")
    from pyspark.sql import Window

    spark = df.sparkSession
    s = df.select(
        F.col(index_col).cast("long").alias("_t"),
        F.col(value_col).cast("decimal(18,0)").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    tot = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast("double").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
    )
    lags = spark.range(1, max_lag + 1).select(F.col("id").cast("int").alias("lag"))
    a, b = s.alias("a"), s.alias("b")
    m = (
        a.join(F.broadcast(lags))
        .join(b, F.expr("b._t = a._t + lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a._x") * F.col("b._x")).cast("double").alias("_sxy"),
            F.sum("a._x").cast("double").alias("_sh"),
            F.sum("b._x").cast("double").alias("_st"),
        )
    )
    mean = F.col("_s") / F.col("n")
    r_raw = (
        F.col("_sxy")
        - mean * (F.col("_sh") + F.col("_st"))
        + F.col("n_pairs") * mean * mean
    ) / F.nullif(
        F.col("_sxx") - F.col("_s") * F.col("_s") / F.col("n"), F.lit(0.0)
    )
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return (
        m.crossJoin(F.broadcast(tot))
        .withColumn("_r", r_raw)
        .select(
            "lag",
            "n_pairs",
            F.round("_r", 9).alias("acf"),
            F.round(
                F.col("n")
                * (F.col("n") + F.lit(2.0))
                * F.sum(
                    F.col("_r") * F.col("_r") / (F.col("n") - F.col("lag"))
                ).over(w),
                9,
            ).alias("ljung_box_q"),
        )
        .orderBy("lag")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier product-limit survival estimator with right
    censoring — the retention/churn curve done correctly (a user still
    active at observation end is CENSORED, not a survivor forever;
    naive retention curves conflate the two). Input: one row per
    subject with ``duration_col`` (time observed) and ``event_col``
    (1 = event occurred at that time, 0 = censored there). Returns one
    row per distinct EVENT time: ``(duration, n_risk, n_events,
    n_censored, survival)`` with
    ``S(t) = Π_{s<=t} (1 − d_s / n_risk(s))``.

    Contract: durations must be DISCRETIZED (days/weeks/buckets) — the
    per-duration summary is then calendar-bounded, and both the
    risk-set cumsum and the product run as ordered windows over that
    bounded summary, never over subject rows (for continuous durations,
    bucket first). The product is evaluated as ``exp(Σ ln(1 − d/n))``
    with the factors accumulated in ascending duration order — the
    identical sequential expression on any engine — and an explicit
    zero pin once a duration kills the whole risk set (``ln(0)`` is
    NULL on Spark but −inf on DuckDB, so the pin keeps engines
    agreeing). Subject rows with NULL duration/event are excluded.

    100-TB shape: one map-side-combined aggregate collapses any number
    of subjects to the per-duration table; everything after is bounded
    by the duration grid.
    """
    from pyspark.sql import Window as W

    s = df.select(
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    ).filter(F.col("_t").isNotNull() & F.col("_e").isNotNull())
    per_t = s.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_e").cast("long").alias("_d"),
    )
    tot = per_t.agg(F.sum("_n").alias("_total"))
    w_all = W.orderBy("_t").rowsBetween(W.unboundedPreceding, -1)
    at_risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn("_before", F.coalesce(F.sum("_n").over(w_all), F.lit(0)))
        .withColumn("n_risk", (F.col("_total") - F.col("_before")).cast("long"))
    )
    ev = at_risk.filter(F.col("_d") > 0)
    w_ev = W.orderBy("_t").rowsBetween(W.unboundedPreceding, 0)
    term = F.when(
        F.col("_d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("_d").cast("double") / F.col("n_risk").cast("double")),
    ).otherwise(F.lit(0.0))
    zflag = F.max((F.col("_d") >= F.col("n_risk")).cast("int")).over(w_ev)
    return (
        ev.withColumn("_term", term)
        .select(
            F.col("_t").alias("duration"),
            "n_risk",
            F.col("_d").alias("n_events"),
            (F.col("_n") - F.col("_d")).cast("long").alias("n_censored"),
            F.when(zflag == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum("_term").over(w_ev)), 9))
            .alias("survival"),
        )
        .orderBy("duration")
    )


def kendall_tau_b(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Kendall's tau-b rank correlation between two ORDINAL columns with
    bounded distinct values (grades, quantities, small counts, bucketed
    scores) — the tie-corrected concordance coefficient.

    Strategy: ONE contingency aggregate over the fact table (map-side
    combined, |X|×|Y| cells), then concordant/discordant pair mass from a
    cells×cells self-join — O(cells²) on the AGGREGATED grid, never on
    rows, so a 100-TB fact table costs one shuffle plus an O(k²)
    epilogue. All pair counts stay exact integers; only the final ratio
    is floating point, with the denominator computed as
    ``sqrt(n0-n1)*sqrt(n0-n2)`` because the product ``(n0-n1)(n0-n2)``
    overflows int64 beyond ~2 billion rows (both engines pin the same
    parenthesization). Like Spearman (``spearman_corr``) this targets
    ordinal data; unlike it, tau-b is defined directly on the
    contingency grid, so it needs no global rank scaffold. Rows with a
    NULL in either column are dropped (standard for rank correlation).
    Cardinality contract: distinct counts must be bounded (the grid is
    collect-free but the self-join is quadratic in cells); use bucketed
    inputs for continuous data.

    Returns ``(n, concordant, discordant, ties_x, ties_y, tau_b)``.
    """
    cells = (
        df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .select(
            F.col(col_x).cast("double").alias("_x"),
            F.col(col_y).cast("double").alias("_y"),
        )
        .groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("_x").alias("_x1"), F.col("_y").alias("_y1"), F.col("_c").alias("_c1")
    )
    b = cells.select(
        F.col("_x").alias("_x2"), F.col("_y").alias("_y2"), F.col("_c").alias("_c2")
    )
    conc = (
        a.join(
            F.broadcast(b),
            (F.col("_x2") > F.col("_x1")) & (F.col("_y2") > F.col("_y1")),
        )
        .agg(F.coalesce(F.sum(F.col("_c1") * F.col("_c2")), F.lit(0)).alias("p"))
    )
    disc = (
        a.join(
            F.broadcast(b),
            (F.col("_x2") > F.col("_x1")) & (F.col("_y2") < F.col("_y1")),
        )
        .agg(F.coalesce(F.sum(F.col("_c1") * F.col("_c2")), F.lit(0)).alias("q"))
    )
    # t(t-1) and n(n-1) in DECIMAL(38,0): a LONG product overflows
    # (ANSI abort) once a tie group / the row count exceeds ~3.04e9 —
    # the advertised 100-TB fact-table shape (ADVICE r7).
    _td = F.col("_t").cast("decimal(38,0)")
    tx = (
        cells.groupBy("_x")
        .agg(F.sum("_c").alias("_t"))
        .agg(
            F.coalesce(
                F.sum(_td * (_td - 1)), F.lit(0).cast("decimal(38,0)")
            ).alias("tx2")
        )
    )
    ty = (
        cells.groupBy("_y")
        .agg(F.sum("_c").alias("_t"))
        .agg(
            F.coalesce(
                F.sum(_td * (_td - 1)), F.lit(0).cast("decimal(38,0)")
            ).alias("ty2")
        )
    )
    n_tot = cells.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("n"))
    j = (
        n_tot.crossJoin(F.broadcast(conc))
        .crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    _nd = F.col("n").cast("decimal(38,0)")
    n0x2 = _nd * (_nd - 1)  # 2*n0, exact at any row count (decimal, not long)
    den = F.sqrt(((n0x2 - F.col("tx2")) / 2).cast("double")) * F.sqrt(
        ((n0x2 - F.col("ty2")) / 2).cast("double")
    )
    return j.select(
        "n",
        F.col("p").alias("concordant"),
        F.col("q").alias("discordant"),
        (F.col("tx2") / 2).cast("long").alias("ties_x"),
        (F.col("ty2") / 2).cast("long").alias("ties_y"),
        F.when(
            (n0x2 > F.col("tx2")) & (n0x2 > F.col("ty2")),
            F.round((F.col("p") - F.col("q")).cast("double") / den, 9),
        ).alias("tau_b"),
    )




def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator with right censoring —
    ``H(t) = Σ_{s<=t} d_s / n_risk(s)`` — the additive companion to
    :func:`kaplan_meier` (same input contract: one row per subject,
    discretized durations, ``event_col`` 1 = observed / 0 = censored).
    Hazard is what rate-comparison and proportional-hazards screens
    consume directly; it also behaves better than the KM product in the
    small-risk-set tail. Returns one row per distinct EVENT time:
    ``(duration, n_risk, n_events, cum_hazard, na_survival)`` with
    ``na_survival = exp(−H)`` (the Fleming–Harrington survival).

    Same 100-TB shape as Kaplan–Meier: subjects collapse to the
    calendar-bounded per-duration table in one map-side-combined
    aggregate; cumulative sums run over that bounded summary. Per-step
    hazard increments round to 12 and accumulate as exact decimals, so
    both engines walk an identical sequence.
    """
    from pyspark.sql import Window as W

    s = df.select(
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    ).filter(F.col("_t").isNotNull() & F.col("_e").isNotNull())
    per_t = s.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_e").cast("long").alias("_d"),
    )
    tot = per_t.agg(F.sum("_n").alias("_total"))
    w_all = W.orderBy("_t").rowsBetween(W.unboundedPreceding, -1)
    at_risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn("_before", F.coalesce(F.sum("_n").over(w_all), F.lit(0)))
        .withColumn("n_risk", (F.col("_total") - F.col("_before")).cast("long"))
    )
    ev = at_risk.filter(F.col("_d") > 0)
    w_ev = W.orderBy("_t").rowsBetween(W.unboundedPreceding, 0)
    inc = F.round(
        F.col("_d").cast("double") / F.col("n_risk").cast("double"), 12
    ).cast("decimal(30,12)")
    return (
        ev.withColumn("_h", inc)
        .select(
            F.col("_t").alias("duration"),
            "n_risk",
            F.col("_d").alias("n_events"),
            F.round(F.sum("_h").over(w_ev).cast("double"), 9).alias("cum_hazard"),
            F.round(F.exp(-F.sum("_h").over(w_ev).cast("double")), 9).alias("na_survival"),
        )
        .orderBy("duration")
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Two-group log-rank test — the standard censoring-aware "do these
    two survival curves differ?" statistic (Mantel 1966) that compares
    the WHOLE curves where a t-test on durations would be biased by
    censoring. Input contract matches :func:`kaplan_meier` plus a binary
    ``group_col``; the group with the smaller value is "group 1".
    Returns one row ``(n1, n2, observed_1, expected_1, variance,
    chi2)`` — chi2 ~ χ²(1) under H0.

    Same 100-TB shape as Kaplan–Meier: subjects collapse to the
    calendar-bounded per-(duration, group) table in one aggregate;
    at-risk counts are ordered windows over that bounded summary; the
    hypergeometric terms round to 12 and accumulate as exact decimals.
    Durations where the combined risk set is 1 contribute no variance
    (the standard n_t > 1 guard).
    """
    from pyspark.sql import Window as W

    s = df.select(
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
        F.col(group_col).alias("_g"),
    ).filter(
        F.col("_t").isNotNull() & F.col("_e").isNotNull() & F.col("_g").isNotNull()
    )
    groups = sorted(r["_g"] for r in s.select("_g").distinct().collect())
    if len(groups) != 2:
        raise ValueError(
            f"logrank_test: group_col must have exactly 2 levels, got {groups}"
        )
    g1 = groups[0]
    per_t = s.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_e").cast("long").alias("_d"),
        F.sum((F.col("_g") == g1).cast("int")).cast("long").alias("_n1c"),
        F.sum(((F.col("_g") == g1) & (F.col("_e") == 1)).cast("int"))
        .cast("long")
        .alias("_d1"),
    )
    tot = per_t.agg(
        F.sum("_n").alias("_total"), F.sum("_n1c").alias("_total1")
    )
    w_before = W.orderBy("_t").rowsBetween(W.unboundedPreceding, -1)
    at_risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn("_nb", F.coalesce(F.sum("_n").over(w_before), F.lit(0)))
        .withColumn("_nb1", F.coalesce(F.sum("_n1c").over(w_before), F.lit(0)))
        .select(
            "_t",
            "_d",
            "_d1",
            (F.col("_total") - F.col("_nb")).alias("_nt"),
            (F.col("_total1") - F.col("_nb1")).alias("_nt1"),
            "_total",
            "_total1",
        )
        .filter(F.col("_d") > 0)
    )
    frac1 = F.col("_nt1").cast("double") / F.col("_nt")
    e_term = F.round(F.col("_d").cast("double") * frac1, 12).cast("decimal(30,12)")
    v_term = F.when(
        F.col("_nt") > 1,
        F.round(
            F.col("_d").cast("double")
            * frac1
            * (1 - frac1)
            * (F.col("_nt") - F.col("_d")).cast("double")
            / (F.col("_nt") - 1).cast("double"),
            12,
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(30,12)")
    agg = at_risk.agg(
        F.max("_total1").alias("n1"),
        (F.max("_total") - F.max("_total1")).alias("n2"),
        F.sum("_d1").alias("observed_1"),
        F.round(F.sum(e_term).cast("double"), 9).alias("expected_1"),
        F.round(F.sum(v_term).cast("double"), 9).alias("variance"),
    )
    return agg.select(
        "n1",
        "n2",
        "observed_1",
        "expected_1",
        "variance",
        F.when(
            F.col("variance") > 0,
            F.round(
                (F.col("observed_1").cast("double") - F.col("expected_1"))
                * (F.col("observed_1").cast("double") - F.col("expected_1"))
                / F.col("variance"),
                9,
            ),
        ).alias("chi2"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact tie-corrected Kruskal–Wallis H — the k-group extension of
    :func:`mann_whitney_u` ("do ANY of these groups differ in
    location?"), e.g. event value across event types before trusting a
    pooled mean. Returns one row ``(n_total, k_groups, h_stat)``.

    Computed via the rank-moment identity ``H = (N-1) · Σ_g n_g(r̄_g -
    r̄)² / Σ_i (r_i - r̄)²`` (equivalent to the classic 12/(N(N+1))
    form WITH tie correction, but needing only exact integer rank
    moments): doubled average ranks ``2r̄_v = 2·before_v + n_v + 1`` are
    integers, so every moment is an exact decimal sum; per-group squared
    deviations are rounded to 9 then decimal-accumulated, making the
    cross-group sum order-independent — the oracle reproduces it
    bit-for-bit. Scale shape: the same bucketed distributed prefix-sum
    scaffold as KS/MWU (:func:`onetl_spark.operators.ranking.
    stitched_cumsums` — no single-partition window); the per-(value,
    group) relation joins back on distinct values and collapses to k
    group rows. A zero rank variance (all values tied) pins ``h_stat``
    to NULL rather than tripping ANSI division.
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull() & F.col("_g").isNotNull())
    gcounts = (
        base.groupBy("_v", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    counts = gcounts.groupBy("_v").agg(F.sum("_c").alias("_nv")).localCheckpoint(
        eager=False
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_nv",), buckets)
    n = totals["_nv"]
    if n is None or n == 0:
        raise ValueError("kruskal_wallis: input must be non-empty")
    # 2·avg_rank at each distinct value is the integer 2·before + nv + 1
    ranked = stitched.select(
        "_v",
        F.col("_nv").cast("decimal(14,0)").alias("_nvd"),
        (
            F.lit(2).cast("decimal(1,0)")
            * (F.col("_cum__nv") - F.col("_nv")).cast("decimal(16,0)")
            + F.col("_nv").cast("decimal(14,0)")
            + F.lit(1)
        ).alias("_r2"),
    ).localCheckpoint(eager=False)
    # Σ nv·(2r̄)² — exact integer, the global rank second moment (×4)
    s2_row = ranked.agg(F.sum(F.col("_nvd") * F.col("_r2") * F.col("_r2")).alias("_s2"))
    per_g = (
        gcounts.join(ranked.select("_v", "_r2"), "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_ng"),
            F.sum(F.col("_c").cast("decimal(14,0)") * F.col("_r2")).alias("_s1g"),
        )
    )
    rbar = float((n + 1) / 2.0)
    ng_d = F.col("_ng").cast("double")
    dev = F.col("_s1g").cast("double") / (F.lit(2.0) * ng_d) - F.lit(rbar)
    terms = per_g.select(
        F.round(ng_d * (dev * dev), 9).cast("decimal(38,9)").alias("_t")
    )
    agg = terms.agg(
        F.sum("_t").alias("_num"), F.count(F.lit(1)).alias("_k")
    ).crossJoin(s2_row)
    den = F.col("_s2").cast("double") / F.lit(4.0) - F.lit(float(n) * rbar * rbar)
    h = F.when(den <= 0, F.lit(None)).otherwise(
        F.round((F.lit(float(n - 1)) * F.col("_num").cast("double")) / den, 9)
    )
    return agg.select(
        F.lit(n).cast("long").alias("n_total"),
        F.col("_k").cast("long").alias("k_groups"),
        h.alias("h_stat"),
    )


def cliffs_delta(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Cliff's delta effect size ``δ = P(ref>cur) − P(ref<cur)`` — the
    magnitude companion to the Mann–Whitney z (which only says whether a
    shift exists, not whether it is big enough to matter). Derived
    exactly from the tie-corrected U of :func:`mann_whitney_u` via
    ``δ = (2U − n₁n₂)/(n₁n₂)`` (U counts cross-pairs with ties at ½, so
    the identity is exact; ``u_stat`` is a multiple of 0.5 and survives
    its round-9 unchanged). Returns one row ``(n_ref, n_cur,
    cliffs_delta, magnitude)`` with the standard |δ| bands
    (0.147/0.33/0.474 → negligible/small/medium/large). Same bucketed
    rank scaffold, no additional scans.
    """
    m = mann_whitney_u(df_ref, df_cur, column, buckets)
    na = F.col("n_ref").cast("double")
    nb = F.col("n_cur").cast("double")
    delta = F.round(
        (F.lit(2.0) * F.col("u_stat") - na * nb) / (na * nb), 9
    )
    out = m.select("n_ref", "n_cur", delta.alias("cliffs_delta"))
    ad = F.abs(F.col("cliffs_delta"))
    return out.withColumn(
        "magnitude",
        F.when(ad < 0.147, F.lit("negligible"))
        .when(ad < 0.33, F.lit("small"))
        .when(ad < 0.474, F.lit("medium"))
        .otherwise(F.lit("large")),
    )


def jarque_bera(df: DataFrame, column: str) -> DataFrame:
    """Jarque–Bera normality test from exact raw moments — the
    moment-based screen ("is this metric even roughly normal before I
    z-test it?") that costs ONE map-side-combined scan. Returns one row
    ``(n, skewness, excess_kurtosis, jb_stat)``.

    Exactness: each power term is cast to decimal(38,6) before summing
    (order-independent, the ANOVA recipe); the central-moment epilogue
    is fixed double arithmetic on those exact sums, with ``m2^1.5``
    spelled ``m2*sqrt(m2)`` so both engines evaluate the identical IEEE
    expression. Degenerate variance (constant column) pins the
    statistics to NULL instead of tripping ANSI division.
    """
    v = F.col(column).cast("double")
    m = df.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(38,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(38,6)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(38,6)")).cast("double").alias("s3"),
        F.sum((v * v * v * v).cast("decimal(38,6)")).cast("double").alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - F.lit(3.0) * mu * (F.col("s2") / n) + F.lit(2.0) * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * mu * (F.col("s3") / n)
        + F.lit(6.0) * mu * mu * (F.col("s2") / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0))
    ok = m2 > 0
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.when(ok, F.round(skew, 6)).alias("skewness"),
        F.when(ok, F.round(kurt, 6)).alias("excess_kurtosis"),
        F.when(ok, F.round(jb, 6)).alias("jb_stat"),
    )


def levene_test(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Levene's test for equal variances across k groups (mean-centered
    variant) — the gatekeeper before trusting the pooled-variance ANOVA
    F. Returns one row ``(k, n_total, w_stat)``.

    Two scans: (1) exact per-group means (decimal sums), broadcast back
    (k rows); (2) absolute deviations ``z = |v − mean_g|`` rounded to
    9 dp, then the one-way-ANOVA F applied to z with the same
    round-then-decimal-accumulate recipe — every cross-group reduction
    order-independent, so the oracle reproduces it exactly. Scale
    shape: two groupBy(type) shuffles over the fact table, a k-row
    broadcast join, nothing else.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    means = base.groupBy("_g").agg(
        (
            F.sum(F.col("_v").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_mg")
    )
    z = base.join(F.broadcast(means), "_g").select(
        "_g", F.round(F.abs(F.col("_v") - F.col("_mg")), 9).alias("_z")
    )
    g = z.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_z").cast("decimal(38,9)")).cast("double").alias("_s"),
        F.sum(F.round(F.col("_z") * F.col("_z"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("_q"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_n").alias("n_total"),
        F.sum(F.round(F.col("_s"), 9).cast("decimal(38,9)")).cast("double").alias("_st"),
        F.sum(F.round(F.col("_q"), 9).cast("decimal(38,9)")).cast("double").alias("_qt"),
        F.sum(F.round(F.col("_s") * F.col("_s") / F.col("_n"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("_br"),
    )
    ssb = F.col("_br") - F.col("_st") * F.col("_st") / F.col("n_total")
    ssw = F.col("_qt") - F.col("_br")
    w = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("n_total").cast("long").alias("n_total"),
        F.when((F.col("k") > 1) & (F.col("n_total") > F.col("k")) & (ssw > 0), F.round(w, 6)).alias(
            "w_stat"
        ),
    )


def tukey_hsd(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Tukey HSD post-hoc studentized-range q per group pair — the
    follow-up ANOVA's F deliberately cannot give: WHICH pairs differ.
    Returns one row per unordered pair ``(group_a, group_b, n_a, n_b,
    mean_diff, q_stat)`` with ``q = |m̄_a − m̄_b| / sqrt(MSW/2·(1/n_a +
    1/n_b))`` (Tukey–Kramer unequal-n form).

    One fact-table scan builds the k group moments (the ANOVA recipe:
    decimal sums, round-9 s²/n terms re-accumulated as decimal for the
    within-variance); the pairwise epilogue is a self-join of the k-row
    aggregate — k(k−1)/2 rows, broadcast, never touching the fact table
    again.
    """
    v = F.col(value_col).cast("double")
    g = (
        df.filter(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(v.cast("decimal(38,6)")).cast("double").alias("_s"),
            F.sum((v * v).cast("decimal(38,6)")).cast("double").alias("_q"),
        )
        .localCheckpoint(eager=False)
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum(F.round(F.col("_q"), 6).cast("decimal(38,6)")).cast("double").alias("_qt"),
        F.sum(F.round(F.col("_s") * F.col("_s") / F.col("_n"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("_br"),
    )
    msw = (F.col("_qt") - F.col("_br")) / (F.col("_nt") - F.col("_k")).cast("double")
    a = g.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("n_a"),
        F.col("_s").alias("_sa"),
    )
    b = g.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("n_b"),
        F.col("_s").alias("_sb"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b")).crossJoin(
        F.broadcast(tot)
    )
    md = F.col("_sa") / F.col("n_a").cast("double") - F.col("_sb") / F.col(
        "n_b"
    ).cast("double")
    se = F.sqrt(
        msw
        / F.lit(2.0)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    q = F.when(se > 0, F.round(F.abs(md) / se, 6))
    return pairs.select(
        "group_a",
        "group_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(md, 6).alias("mean_diff"),
        q.alias("q_stat"),
    ).orderBy("group_a", "group_b")


def mcnemar_test(df: DataFrame, flag_a: str, flag_b: str) -> DataFrame:
    """McNemar's test on paired binary flags — the paired-data answer to
    "did the second condition flip outcomes?", which an unpaired
    two-proportion z silently gets wrong when the two flags live on the
    SAME subjects. Consumes 0/1 (or boolean) columns; only the
    discordant cells enter: ``chi2 = (b−c)²/(b+c)`` (no continuity
    correction — one exact formula both engines). Returns one row
    ``(n, n_a_only, n_b_only, chi2)``; ``b+c = 0`` (perfect agreement)
    pins chi2 to NULL. One map-side-combined aggregate — no shuffle
    beyond the single reduce."""
    a = F.col(flag_a).cast("int")
    b = F.col(flag_b).cast("int")
    m = df.filter(a.isNotNull() & b.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * (1 - b)).alias("n_a_only"),
        F.sum((1 - a) * b).alias("n_b_only"),
    )
    d = (F.col("n_a_only") - F.col("n_b_only")).cast("double")
    s = (F.col("n_a_only") + F.col("n_b_only")).cast("double")
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_a_only").cast("long").alias("n_a_only"),
        F.col("n_b_only").cast("long").alias("n_b_only"),
        F.when(s > 0, F.round(d * d / s, 9)).alias("chi2"),
    )


def cohens_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Cohen's kappa between two categorical raters — chance-corrected
    agreement (raw accuracy flatters raters that both predict the
    majority class). Returns one row ``(n, n_agree, po, pe, kappa)``
    with ``kappa = (po − pe)/(1 − pe)`` computed from the ROUND-9
    po/pe so both engines share one arithmetic path; ``pe = 1``
    (a single shared category) pins kappa to NULL.

    Scale shape: one groupBy(a, b) cell aggregate over the fact rows
    (category-bounded), then marginal joins on the tiny cell relation —
    the k×k grid never leaves the executors until the final scalar
    reduce."""
    base = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b"))
    cells = (
        base.groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("_n").alias("n"))
    diag = cells.filter(F.col("_a") == F.col("_b")).agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n_agree")
    )
    ra = cells.groupBy("_a").agg(F.sum("_n").alias("_ta"))
    cb = cells.groupBy("_b").agg(F.sum("_n").alias("_tb"))
    cross = ra.join(cb, ra["_a"] == cb["_b"]).agg(
        F.coalesce(
            F.sum(
                F.col("_ta").cast("decimal(19,0)") * F.col("_tb").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_x")
    )
    m = tot.crossJoin(diag).crossJoin(cross)
    n_d = F.col("n").cast("double")
    po = F.round(F.col("n_agree").cast("double") / n_d, 9)
    pe = F.round(F.col("_x").cast("double") / (n_d * n_d), 9)
    out = m.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_agree").cast("long").alias("n_agree"),
        po.alias("po"),
        pe.alias("pe"),
    )
    return out.withColumn(
        "kappa",
        F.when(
            F.lit(1.0) - F.col("pe") != 0,
            F.round((F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")), 9),
        ),
    )


def durbin_watson(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Durbin–Watson serial-correlation statistic of the residuals from
    the OLS trend of ``value_col`` on integer ``order_col`` — the
    autocorrelation-in-residuals check that tells you whether the
    trend's stderr is lying (DW≈2 independent, →0 positive, →4
    negative serial correlation). Returns one row
    ``(n, slope, intercept, dw_stat, rho_approx)`` with
    ``rho_approx = 1 − DW/2``.

    Intended for CALENDAR-BOUNDED series (daily aggregates): the input
    is a small derived relation, never fact rows. Exactness contract:
    BOTH columns must be exact integers (scale values to micro-units
    first — DW is scale-invariant, slope/intercept come back in the
    scaled units) so the five moment sums are exact decimals and the
    rounded-9 slope/intercept are bit-identical across engines.
    Residuals evaluate from the ROUNDED slope/intercept in fixed double
    arithmetic; the numerator pairs consecutive order values via a
    self-join on ``t+1`` (gap days simply contribute no pair — no
    window, no sort), and both quadratic sums re-accumulate as round-9
    decimals so the reduction is order-independent. Zero residual
    variance pins DW to NULL.
    """
    pts = df.select(
        F.col(order_col).cast("decimal(38,0)").alias("_x"),
        F.col(value_col).cast("decimal(38,0)").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    pts = pts.localCheckpoint(eager=False)
    m = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").cast("double").alias("sx"),
        F.sum("_y").cast("double").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("double").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("double").alias("syy"),
    )
    fit = ols_from_moments(m, n_col="_n").select(
        F.col("_n").alias("n"), "slope", "intercept"
    )
    resid = pts.crossJoin(F.broadcast(fit)).select(
        F.col("_x").cast("long").alias("_t"),
        "n",
        "slope",
        "intercept",
        (
            F.col("_y").cast("double")
            - (F.col("intercept") + F.col("slope") * F.col("_x").cast("double"))
        ).alias("_e"),
    )
    resid = resid.localCheckpoint(eager=False)
    den_row = resid.agg(
        F.sum(F.round(F.col("_e") * F.col("_e"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("_den"),
        F.first("n").alias("n"),
        F.first("slope").alias("slope"),
        F.first("intercept").alias("intercept"),
    )
    nxt = resid.select(F.col("_t").alias("_t2"), F.col("_e").alias("_e2"))
    num_row = resid.join(nxt, F.col("_t2") == F.col("_t") + 1).agg(
        F.coalesce(
            F.sum(
                F.round(
                    (F.col("_e2") - F.col("_e")) * (F.col("_e2") - F.col("_e")), 9
                ).cast("decimal(38,9)")
            ),
            F.lit(0).cast("decimal(38,9)"),
        )
        .cast("double")
        .alias("_num")
    )
    m = den_row.crossJoin(num_row)
    dw = F.when(F.col("_den") > 0, F.round(F.col("_num") / F.col("_den"), 9))
    return m.select(
        F.col("n").cast("long").alias("n"),
        "slope",
        "intercept",
        dw.alias("dw_stat"),
        F.when(
            F.col("_den") > 0,
            F.round(F.lit(1.0) - (F.col("_num") / F.col("_den")) / F.lit(2.0), 9),
        ).alias("rho_approx"),
    )


def runs_test(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of a BOUNDED ordered
    series around its median — "is this daily metric drifting/cyclic
    rather than noise?" without assuming any distribution. Values equal
    to the median are dropped (the standard convention); the median is
    the LOWER median (smallest value whose cumulative count reaches
    ⌈n/2⌉), computed by an exact bounded cumsum so both engines agree
    with zero interpolation. Returns one row ``(n_above, n_below,
    n_runs, z_score)`` (normal approximation; degenerate one-sided
    series pins z to NULL).

    The series is expected to be a calendar-bounded aggregate (≤ a few
    thousand rows): the ordered lag runs in ONE window over that small
    relation — documented bounded-input exception to the
    no-single-partition-window rule, matching the daily ACF family.
    """
    from pyspark.sql.window import Window as W

    pts = df.select(
        F.col(order_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_y"),
    ).filter(F.col("_t").isNotNull() & F.col("_y").isNotNull())
    pts = pts.localCheckpoint(eager=False)
    n_row = pts.agg(F.count(F.lit(1)).alias("_n"))
    vcounts = pts.groupBy("_y").agg(F.count(F.lit(1)).alias("_c"))
    wv = W.orderBy("_y").rowsBetween(W.unboundedPreceding, W.currentRow)
    med = (
        vcounts.withColumn("_cum", F.sum("_c").over(wv))
        .crossJoin(F.broadcast(n_row))
        .filter(F.col("_cum") >= F.ceil(F.col("_n") / F.lit(2.0)))
        .agg(F.min("_y").alias("_med"))
    )
    signed = (
        pts.crossJoin(F.broadcast(med))
        .filter(F.col("_y") != F.col("_med"))
        .select("_t", (F.col("_y") > F.col("_med")).cast("int").alias("_s"))
    )
    wo = W.orderBy("_t")
    runs = signed.withColumn("_prev", F.lag("_s").over(wo)).agg(
        F.sum(F.col("_s")).alias("n_above"),
        F.sum(F.lit(1) - F.col("_s")).alias("n_below"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_s")), 1
                ).otherwise(0)
            )
        ).alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / nn + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - nn)
        / (nn * nn * (nn - F.lit(1.0)))
    )
    z = F.when(
        (n1 > 0) & (n2 > 0) & (var > 0),
        F.round((F.col("n_runs").cast("double") - mu) / F.sqrt(var), 9),
    )
    return runs.select(
        F.col("n_above").cast("long").alias("n_above"),
        F.col("n_below").cast("long").alias("n_below"),
        F.col("n_runs").cast("long").alias("n_runs"),
        z.alias("z_score"),
    )


def dispersion_index(df: DataFrame, count_col: str) -> DataFrame:
    """Variance-to-mean dispersion index of a count column, with the
    chi-square overdispersion statistic ``(n−1)·D`` — the one-aggregate
    screen for "is this Poisson or do I need the negative binomial?"
    (D≈1 Poisson, ≫1 overdispersed/bursty). Returns one row
    ``(n, mean, variance, dispersion, chi2)``.

    Counts are integers, so the two moment sums are exact decimals and
    every statistic evaluates in one pinned double parenthesization —
    bit-identical across engines. ``n ≤ 1`` or zero mean pins the
    ratios to NULL. One map-side-combined aggregate, no shuffle beyond
    the single reduce.
    """
    c = F.col(count_col).cast("decimal(38,0)")
    m = df.filter(c.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).cast("double").alias("_s1"),
        F.sum(c * c).cast("double").alias("_s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s1") / n
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - F.lit(1.0))
    d = var / mean
    ok = (F.col("n") > 1) & (mean > 0)
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.when(F.col("n") > 0, F.round(mean, 9)).alias("mean"),
        F.when(F.col("n") > 1, F.round(var, 9)).alias("variance"),
        F.when(ok, F.round(d, 9)).alias("dispersion"),
        F.when(ok, F.round((n - F.lit(1.0)) * d, 9)).alias("chi2"),
    )


def erfc_approx(x):
    """Abramowitz–Stegun 7.1.26 complementary error function (|error| <
    1.5e-7) as a pinned Horner chain over ``exp``/division only — both
    engines evaluate the identical IEEE expression tree, making
    normal-tail p-values reproducible cross-engine without a native
    ``erf`` (which Spark SQL lacks). Valid for x >= 0."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = t * (
        F.lit(0.254829592)
        + t
        * (
            F.lit(-0.284496736)
            + t
            * (
                F.lit(1.421413741)
                + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
            )
        )
    )
    return poly * F.exp(-(x * x))


def bh_adjust(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    tie_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR adjustment over a BOUNDED family
    of tests — the multiple-comparisons discipline for "which of these
    k metrics actually moved?" (per-test α over k tests fires k·α false
    alarms; BH controls the false-discovery RATE instead). Appends
    ``p_rank``, ``p_adj`` (the standard running-min ``min_{j≥i} m·p_(j)
    /j`` capped at 1, rounded 9) and ``rejected`` (``p_adj ≤ alpha``).

    The input is a per-test relation (one row per hypothesis — event
    types, metrics, segments), inherently category-bounded: the ordered
    windows run over k rows, never fact rows — the documented
    bounded-input exception to the no-single-partition-window rule.
    NULL p-values (degenerate tests) are dropped, and ``m`` counts only
    the surviving tests; ties order deterministically via ``tie_cols``.
    """
    from pyspark.sql.window import Window as W

    t = df.filter(F.col(p_col).isNotNull())
    m_row = t.agg(F.count(F.lit(1)).alias("_m"))
    order = [F.col(p_col)] + [F.col(c) for c in tie_cols]
    t = t.crossJoin(F.broadcast(m_row)).withColumn(
        "p_rank", F.row_number().over(W.orderBy(*order))
    )
    raw = (
        F.col("_m").cast("double")
        * F.col(p_col)
        / F.col("p_rank").cast("double")
    )
    wmin = W.orderBy(F.col("p_rank").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    adj = F.least(F.min(raw).over(wmin), F.lit(1.0))
    out = t.withColumn("p_adj", F.round(adj, 9)).drop("_m")
    return out.withColumn("rejected", F.col("p_adj") <= F.lit(alpha))


def pr_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact average precision (PR-AUC) of a score against a binary
    label — the ranking metric that, unlike ROC-AUC, does not reward a
    classifier for ranking the ocean of easy negatives correctly: the
    right headline for rare-positive problems (purchase prediction,
    toxicity flags). ``AP = Σ_v ΔR_v · P_v`` over DESCENDING distinct
    score thresholds, ties grouped. Returns one row ``(n_pos, n_neg,
    pr_auc, prevalence)`` — prevalence is the random-classifier
    baseline AP.

    Same bucketed prefix-sum scaffold as :func:`roc_auc` (ascending
    cumsums flipped into descending-inclusive TP/total counts — no
    single-partition window); every per-threshold term is exact-integer
    ratios rounded to 9 then decimal-accumulated, so the reduction is
    order-independent. Raises when either class is empty.
    """
    s = df.select(
        F.col(score_col).cast("double").alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
    counts = (
        s.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_nv"), F.sum("_y").alias("_na"))
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_nv", "_na"), buckets)
    n_total, n_pos = totals["_nv"], totals["_na"]
    n_neg = n_total - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"pr_auc: need both classes, got n_pos={n_pos}, n_neg={n_neg}"
        )
    tp = F.lit(n_pos) - F.col("_cum__na") + F.col("_na")
    tot = F.lit(n_total) - F.col("_cum__nv") + F.col("_nv")
    term = (F.col("_na").cast("double") / F.lit(float(n_pos))) * (
        tp.cast("double") / tot.cast("double")
    )
    m = stitched.agg(
        F.sum(F.round(term, 9).cast("decimal(38,9)")).cast("double").alias("_ap")
    )
    return m.select(
        F.lit(n_pos).cast("long").alias("n_pos"),
        F.lit(n_neg).cast("long").alias("n_neg"),
        F.round(F.col("_ap"), 9).alias("pr_auc"),
        F.round(F.lit(float(n_pos)) / F.lit(float(n_total)), 9).alias("prevalence"),
    )


def info_gain(
    df: DataFrame, label_col: str, feature_cols: "tuple[str, ...]"
) -> DataFrame:
    """Information gain (and gain ratio) of each categorical feature
    against a binary label — the C4.5-style feature ranking ("which of
    these bounded attributes actually predicts the outcome?") that
    precedes any model fit. One row per feature: ``(feature, n_values,
    entropy_y, cond_entropy, info_gain, gain_ratio)``, entropies in
    nats; ``gain_ratio`` divides by the feature's own entropy (NULL for
    a constant feature) to stop high-cardinality features winning for
    free.

    Exactness: every per-value term — weighted conditional entropy and
    feature entropy — is a pinned double expression over exact integer
    counts, rounded to 9 and decimal-accumulated (order-independent
    across values); ``0·ln 0`` pins to 0 via explicit guards, never NaN.
    Scale shape: one groupBy per feature over the fact rows (bounded
    category relations), a k-feature union of one-row aggregates; NULL
    feature values become the ``'<null>'`` category, NULL labels are
    excluded.
    """
    y = F.col(label_col).cast("int")
    base = df.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<null>")).alias(c)
            for c in feature_cols
        ],
        y.alias("_y"),
    ).filter(F.col("_y").isNotNull())
    base = base.localCheckpoint(eager=False)
    tot = base.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_r")
    ).collect()[0]
    n_total, r_total = tot["_n"], tot["_r"]
    if not n_total:
        raise ValueError("info_gain: input must be non-empty")

    def binary_entropy(r, n):
        p = r.cast("double") / n.cast("double")
        q = (n - r).cast("double") / n.cast("double")
        tp = F.when(r > 0, -(p * F.log(p))).otherwise(F.lit(0.0))
        tq = F.when(n - r > 0, -(q * F.log(q))).otherwise(F.lit(0.0))
        return tp + tq

    outs = []
    for c in feature_cols:
        cells = base.groupBy(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("_nv"), F.sum("_y").alias("_rv")
        )
        w = F.col("_nv").cast("double") / F.lit(float(n_total))
        cond_term = F.round(w * binary_entropy(F.col("_rv"), F.col("_nv")), 9)
        hx_term = F.round(-(w * F.log(w)), 9)
        agg = cells.agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(cond_term.cast("decimal(38,9)")).cast("double").alias("_cond"),
            F.sum(hx_term.cast("decimal(38,9)")).cast("double").alias("_hx"),
        )
        hy = F.round(
            binary_entropy(F.lit(r_total).cast("long"), F.lit(n_total).cast("long")),
            9,
        )
        row = agg.select(
            F.lit(c).alias("feature"),
            F.col("n_values").cast("long").alias("n_values"),
            hy.alias("entropy_y"),
            F.round(F.col("_cond"), 9).alias("cond_entropy"),
            F.round(hy - F.round(F.col("_cond"), 9), 9).alias("info_gain"),
            F.when(
                F.col("_hx") > 0,
                F.round(
                    F.round(hy - F.round(F.col("_cond"), 9), 9)
                    / F.round(F.col("_hx"), 9),
                    9,
                ),
            ).alias("gain_ratio"),
        )
        outs.append(row)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("feature")


def cochran_armitage(
    df: DataFrame, score_col: str, flag_col: str
) -> DataFrame:
    """Cochran–Armitage trend test: does the rate of a binary outcome
    move MONOTONICALLY across ordered integer categories (dose levels,
    priority tiers, quality buckets) — strictly more powerful than the
    omnibus chi-square when the alternative is a trend. Returns one row
    ``(n, n_pos, t_stat, z_score)`` with ``T = Σw·r − R·Σw·n/N`` and
    the standard variance ``R(N−R)/(N(N−1))·(Σw²n − (Σwn)²/N)``.

    One bounded groupBy(score) aggregate over the fact rows; all sums
    are exact integers, the statistic is one pinned double expression.
    Degenerate variance (single level, or all/no positives) pins z to
    NULL.
    """
    s = df.select(
        F.col(score_col).cast("long").alias("_w"),
        F.col(flag_col).cast("int").alias("_y"),
    ).filter(F.col("_w").isNotNull() & F.col("_y").isNotNull())
    cells = s.groupBy("_w").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_r")
    )
    wd = F.col("_w").cast("decimal(19,0)")
    m = cells.agg(
        F.sum("_n").alias("n"),
        F.sum("_r").alias("n_pos"),
        F.sum(wd * F.col("_n").cast("decimal(19,0)")).cast("double").alias("_swn"),
        F.sum(wd * F.col("_r").cast("decimal(19,0)")).cast("double").alias("_swr"),
        F.sum(wd * wd * F.col("_n").cast("decimal(19,0)")).cast("double").alias("_sw2n"),
    )
    n = F.col("n").cast("double")
    r = F.col("n_pos").cast("double")
    t = F.col("_swr") - r * F.col("_swn") / n
    var = (
        r
        * (n - r)
        / (n * (n - F.lit(1.0)))
        * (F.col("_sw2n") - F.col("_swn") * F.col("_swn") / n)
    )
    z = F.when(var > 0, F.round(t / F.sqrt(var), 9))
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(t, 9).alias("t_stat"),
        z.alias("z_score"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test over complete blocks — "does any treatment
    differ when every block (day, user cohort) sees ALL treatments?",
    the repeated-measures companion to :func:`kruskal_wallis` (which
    assumes independent groups and is confounded by block effects).
    Returns one row ``(n_blocks, k_treatments, chi2)`` using the
    tie-robust variance form ``χ² = n²(k−1)·Σ_j(R̄_j − r̄)² /
    Σ_ij(r_ij − r̄)²`` (reduces to the classic 12/(nk(k+1)) formula
    when ties are absent).

    Blocks missing any treatment are dropped (Friedman requires
    complete blocks); within-block average ranks come from a self-join
    on the block key — the block size is the TREATMENT count, so the
    join fan-out is k², attribute-bounded, never row-bounded. Doubled
    ranks are integers: the denominator is an exact integer sum, the
    k numerator terms round to 9 and decimal-accumulate. Degenerate
    rank variance pins χ² to NULL.
    """
    cell = (
        df.select(
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(
            F.col("_b").isNotNull() & F.col("_t").isNotNull() & F.col("_v").isNotNull()
        )
        .groupBy("_b", "_t")
        .agg(F.sum(F.col("_v").cast("decimal(38,6)")).cast("double").alias("_v"))
        .localCheckpoint(eager=False)
    )
    k = cell.select("_t").distinct().count()
    if k < 2:
        raise ValueError("friedman_test: need at least 2 treatments")
    complete = (
        cell.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt")).filter(
            F.col("_cnt") == k
        )
    )
    kept = cell.join(complete.select("_b"), "_b").localCheckpoint(eager=False)
    n = kept.select("_b").distinct().count()
    if n == 0:
        raise ValueError("friedman_test: no complete blocks")
    o = kept.select(
        F.col("_b").alias("_b2"), F.col("_t").alias("_t2"), F.col("_v").alias("_v2")
    )
    # doubled within-block average rank: 2·cnt_less + cnt_eq(+self) + 1
    r2 = (
        kept.join(o, F.col("_b") == F.col("_b2"))
        .groupBy("_b", "_t", "_v")
        .agg(
            (
                F.lit(2) * F.sum(F.when(F.col("_v2") < F.col("_v"), 1).otherwise(0))
                + F.sum(F.when(F.col("_v2") == F.col("_v"), 1).otherwise(0))
                + F.lit(1)
            ).alias("_r2")
        )
    ).localCheckpoint(eager=False)
    rbar2 = k + 1  # doubled mid-rank
    den_row = r2.agg(
        F.sum(
            (F.col("_r2") - F.lit(rbar2)).cast("decimal(19,0)")
            * (F.col("_r2") - F.lit(rbar2)).cast("decimal(19,0)")
        )
        .cast("double")
        .alias("_den4")
    )
    per_t = r2.groupBy("_t").agg(F.sum("_r2").cast("double").alias("_s2"))
    dev = F.col("_s2") / F.lit(2.0 * n) - F.lit((k + 1) / 2.0)
    num_row = per_t.select(
        F.round(dev * dev, 9).cast("decimal(38,9)").alias("_term")
    ).agg(F.sum("_term").cast("double").alias("_num"))
    m = num_row.crossJoin(den_row)
    chi2 = F.when(
        F.col("_den4") > 0,
        F.round(
            (F.lit(float(n * n * (k - 1))) * F.col("_num"))
            / (F.col("_den4") / F.lit(4.0)),
            9,
        ),
    )
    return m.select(
        F.lit(n).cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k_treatments"),
        chi2.alias("chi2"),
    )


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio across strata — the
    confounding-aware version of a single 2×2 odds ratio ("does the
    exposure move the outcome once the stratifying attribute is
    controlled for?"), the workhorse of stratified A/B readouts.
    Consumes binary (0/1) exposure/outcome columns plus a bounded
    stratum key; returns one row ``(n, n_strata, or_mh, log_or_mh)``
    with ``OR_MH = Σ(a_i·d_i/n_i) / Σ(b_i·c_i/n_i)``.

    One groupBy(stratum) aggregate builds every 2×2 from exact integer
    sums; the per-stratum ``ad/n`` and ``bc/n`` terms round to 9 and
    decimal-accumulate (order-independent); a zero denominator (no
    discordant cells anywhere) pins the ratio to NULL. Strata are
    attribute-bounded — the epilogue never touches fact rows.
    """
    e = F.col(exposure_col).cast("int")
    y = F.col(outcome_col).cast("int")
    s = df.filter(
        F.col(stratum_col).isNotNull() & e.isNotNull() & y.isNotNull()
    ).select(F.col(stratum_col).alias("_s"), e.alias("_e"), y.alias("_y"))
    g = s.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_e") * F.col("_y")).alias("_a"),
        F.sum(F.col("_e") * (1 - F.col("_y"))).alias("_b"),
        F.sum((1 - F.col("_e")) * F.col("_y")).alias("_c"),
        F.sum((1 - F.col("_e")) * (1 - F.col("_y"))).alias("_d"),
    )
    nd = F.col("_n").cast("double")
    ad = F.round(F.col("_a").cast("double") * F.col("_d").cast("double") / nd, 9)
    bc = F.round(F.col("_b").cast("double") * F.col("_c").cast("double") / nd, 9)
    m = g.agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(ad.cast("decimal(38,9)")).cast("double").alias("_num"),
        F.sum(bc.cast("decimal(38,9)")).cast("double").alias("_den"),
    )
    orr = F.when(F.col("_den") > 0, F.round(F.col("_num") / F.col("_den"), 9))
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_strata").cast("long").alias("n_strata"),
        orr.alias("or_mh"),
        F.when(
            (F.col("_den") > 0) & (F.col("_num") > 0),
            F.round(F.log(F.col("_num") / F.col("_den")), 9),
        ).alias("log_or_mh"),
    )


def cronbach_alpha(df: DataFrame, item_cols: "tuple[str, ...]") -> DataFrame:
    """Cronbach's alpha over k numeric item columns — internal
    consistency ("do these per-entity signals measure one underlying
    trait?"), e.g. whether a user's per-event-type activity counts form
    one coherent engagement scale. ``α = k/(k−1)·(1 − Σσ²_i/σ²_total)``
    with VARIANCES of items and of the row-sum total. Returns one row
    ``(n, k_items, alpha)``.

    Exactness: item values are cast to exact decimals; every variance
    comes from integer/decimal moment sums evaluated in one pinned
    double parenthesization, per-item variances round to 9 and
    decimal-accumulate across the k bounded items. One
    map-side-combined aggregate; zero total variance pins α to NULL.
    Rows with any NULL item are excluded (complete-case convention).
    """
    k = len(item_cols)
    if k < 2:
        raise ValueError("cronbach_alpha: need at least 2 items")
    cols = [F.col(c).cast("decimal(19,0)") for c in item_cols]
    cond = cols[0].isNotNull()
    for c in cols[1:]:
        cond = cond & c.isNotNull()
    base = df.filter(cond).select(
        *[c.alias(f"_i{i}") for i, c in enumerate(cols)]
    )
    total = None
    for i in range(k):
        total = F.col(f"_i{i}") if total is None else total + F.col(f"_i{i}")
    base = base.withColumn("_tot", total)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i in range(k):
        c = F.col(f"_i{i}")
        aggs.append(F.sum(c).cast("double").alias(f"_s{i}"))
        aggs.append(F.sum(c * c).cast("double").alias(f"_q{i}"))
    t = F.col("_tot")
    aggs.append(F.sum(t).cast("double").alias("_st"))
    aggs.append(F.sum(t * t).cast("double").alias("_qt"))
    m = base.agg(*aggs)
    n = F.col("_n").cast("double")

    def var(s, q):
        return (F.col(q) - F.col(s) * F.col(s) / n) / (n - F.lit(1.0))

    # the k variances live on ONE aggregate row, so a fixed left-assoc
    # double chain is already order-independent — no round-9 decimal
    # re-accumulation (which would re-introduce cross-engine round()
    # divergence on arbitrary doubles)
    item_var_sum = None
    for i in range(k):
        term = var(f"_s{i}", f"_q{i}")
        item_var_sum = term if item_var_sum is None else item_var_sum + term
    tot_var = var("_st", "_qt")
    alpha = F.lit(float(k) / (k - 1.0)) * (F.lit(1.0) - item_var_sum / tot_var)
    return m.select(
        F.col("_n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k_items"),
        F.when((F.col("_n") > 1) & (tot_var > 0), F.round(alpha, 9)).alias("alpha"),
    )


def _ecdf_segment_grid(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int,
    op_name: str,
) -> "tuple[DataFrame, int, int]":
    """Shared scaffold for ECDF-functional two-sample statistics
    (:func:`wasserstein_1`, :func:`energy_distance`): one row per
    distinct value carrying the PREVIOUS-value ECDFs of both samples
    (``_fa``, ``_fb`` — via the cum-minus-own-count identity, exact
    across bucket boundaries) and the segment width ``_delta`` (in-
    bucket lag; bucket-first rows take the predecessor bucket's max
    value from a ≤``buckets``-entry literal map; the global first row
    gets 0, and its ECDFs are exactly 0 anyway). Same stitched-bucket
    discipline as :func:`ks_two_sample` — no single-partition window,
    shuffles carry distinct values only."""
    from pyspark.sql.window import Window as W

    from onetl_spark.operators.ranking import (
        ascending_bucket,
        bucket_prefix_offsets,
        prefix_offset_expr,
    )

    a = df_ref.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    b = df_cur.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    counts = (
        a.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_na"))
        .join(
            b.groupBy("_v").agg(F.count(F.lit(1)).alias("_nb")),
            "_v",
            "full_outer",
        )
        .select(
            "_v",
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
        .localCheckpoint(eager=False)
    )
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(counts.stat.approxQuantile("_v", qs, 0.001)))
    t = counts.withColumn("_bkt", ascending_bucket(bounds, F.col("_v")))
    per_bucket = t.groupBy("_bkt").agg(
        F.sum("_na").alias("_na"),
        F.sum("_nb").alias("_nb"),
        F.max("_v").alias("_vmax"),
    ).collect()
    n_buckets = len(bounds) + 1
    offs_a, acc_a = bucket_prefix_offsets(
        {r["_bkt"]: r["_na"] for r in per_bucket}, n_buckets
    )
    offs_b, acc_b = bucket_prefix_offsets(
        {r["_bkt"]: r["_nb"] for r in per_bucket}, n_buckets
    )
    if acc_a == 0 or acc_b == 0:
        raise ValueError(f"{op_name}: both samples must be non-empty")
    # predecessor bucket's max value, for each bucket that has one
    vmax = {r["_bkt"]: r["_vmax"] for r in per_bucket}
    prev_vmax: dict = {}
    running = None
    for bkt in range(n_buckets):
        if running is not None:
            prev_vmax[bkt] = running
        if bkt in vmax:
            running = vmax[bkt]
    w = (
        W.partitionBy("_bkt")
        .orderBy("_v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum_a = F.sum("_na").over(w) + prefix_offset_expr(offs_a, "_bkt")
    cum_b = F.sum("_nb").over(w) + prefix_offset_expr(offs_b, "_bkt")
    lagv = F.lag("_v").over(W.partitionBy("_bkt").orderBy("_v"))
    prev_expr = None
    for bkt, pv in prev_vmax.items():
        c = F.when(F.col("_bkt") == bkt, F.lit(float(pv)))
        prev_expr = c if prev_expr is None else prev_expr.when(
            F.col("_bkt") == bkt, F.lit(float(pv))
        )
    boundary_v = (
        prev_expr.otherwise(F.lit(None)) if prev_expr is not None else F.lit(None)
    )
    fa = (cum_a - F.col("_na")).cast("double") / F.lit(float(acc_a))
    fb = (cum_b - F.col("_nb")).cast("double") / F.lit(float(acc_b))
    delta = F.coalesce(F.col("_v") - F.coalesce(lagv, boundary_v), F.lit(0.0))
    grid = t.select(
        "_v",
        "_na",
        "_nb",
        fa.alias("_fa"),
        fb.alias("_fb"),
        delta.alias("_delta"),
    )
    return grid, acc_a, acc_b


def wasserstein_1(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two empirical
    distributions: ``W1 = ∫|F_ref − F_cur| dx`` — the drift metric that,
    unlike KS (sup only) or PSI (binned), weighs BOTH how far apart the
    CDFs are and over how wide a value range. Rides
    :func:`_ecdf_segment_grid` (no lag across buckets — the exclusive
    cumulative prefix IS the previous value's ECDF); terms are round-8
    decimal accumulated (order-independent, magnitude-safe
    cross-engine)."""
    grid, acc_a, acc_b = _ecdf_segment_grid(
        df_ref, df_cur, column, buckets, "wasserstein_1"
    )
    d_prev = F.col("_fa") - F.col("_fb")
    term = F.round(F.abs(d_prev) * F.col("_delta"), 8).cast("decimal(38,8)")
    scored = grid.select(term.alias("_term"))
    return scored.agg(
        F.lit(acc_a).cast("long").alias("n_ref"),
        F.lit(acc_b).cast("long").alias("n_cur"),
        F.round(F.sum("_term").cast("double"), 8).alias("w1_distance"),
    )


def energy_distance(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact (squared) energy distance between two samples —
    ``D² = 2E|X−Y| − E|X−X'| − E|Y−Y'|`` (Székely & Rizzo) — the
    two-sample test with power against ANY distributional difference,
    where KS keys on the largest CDF gap and W1 on transported mass. In
    1-D every expectation is an ECDF integral over the same segment
    grid: ``E|X−Y| = ∫ (F_x(1−F_y) + F_y(1−F_x)) dt``, so all three
    compute in the one pass :func:`_ecdf_segment_grid` already does for
    W1 — no pairwise join ever. Also returns the normalized e-coefficient
    ``D²/(2E|X−Y|)`` ∈ [0, 1]. Round-8 decimal term accumulation."""
    grid, acc_a, acc_b = _ecdf_segment_grid(
        df_ref, df_cur, column, buckets, "energy_distance"
    )
    fa, fb, dv = F.col("_fa"), F.col("_fb"), F.col("_delta")
    t_xy = F.round((fa * (1 - fb) + fb * (1 - fa)) * dv, 8).cast("decimal(38,8)")
    t_xx = F.round(2 * fa * (1 - fa) * dv, 8).cast("decimal(38,8)")
    t_yy = F.round(2 * fb * (1 - fb) * dv, 8).cast("decimal(38,8)")
    scored = grid.select(t_xy.alias("_xy"), t_xx.alias("_xx"), t_yy.alias("_yy"))
    agg = scored.agg(
        F.sum("_xy").cast("double").alias("e_xy"),
        F.sum("_xx").cast("double").alias("e_xx"),
        F.sum("_yy").cast("double").alias("e_yy"),
    )
    d2 = 2 * F.col("e_xy") - F.col("e_xx") - F.col("e_yy")
    return agg.select(
        F.lit(acc_a).cast("long").alias("n_ref"),
        F.lit(acc_b).cast("long").alias("n_cur"),
        F.round(F.col("e_xy"), 8).alias("e_between"),
        F.round(F.col("e_xx"), 8).alias("e_within_ref"),
        F.round(F.col("e_yy"), 8).alias("e_within_cur"),
        F.round(d2, 8).alias("energy_d2"),
        F.round(
            F.when(F.col("e_xy") > 0, d2 / (2 * F.col("e_xy"))), 8
        ).alias("e_coefficient"),
    )


def cramer_von_mises(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic — ``T = (nm/(n+m)²) ·
    Σ_pooled (F_ref(x) − F_cur(x))²`` summed over every pooled
    observation (with multiplicity) — the ECDF test weighing the WHOLE
    squared gap profile where KS takes only its sup. Needs only the
    INCLUSIVE stitched cumsums (no segment widths, no boundary map):
    per distinct value, weight = combined multiplicity, gap evaluated
    at the value itself. Round-9 decimal term accumulation of the per-value
    weighted squared gap."""
    a = df_ref.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    b = df_cur.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    counts = (
        a.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_na"))
        .join(
            b.groupBy("_v").agg(F.count(F.lit(1)).alias("_nb")),
            "_v",
            "full_outer",
        )
        .select(
            "_v",
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_na", "_nb"), buckets)
    acc_a, acc_b = totals["_na"], totals["_nb"]
    if acc_a == 0 or acc_b == 0:
        raise ValueError("cramer_von_mises: both samples must be non-empty")
    d = F.col("_cum__na").cast("double") / F.lit(float(acc_a)) - F.col(
        "_cum__nb"
    ).cast("double") / F.lit(float(acc_b))
    # one pinned double product per row, THEN the decimal cast — a
    # long × decimal(38,12) product would trip Spark's precision-loss
    # rule and silently truncate the scale to ~6
    term = F.round(
        d * d * (F.col("_na") + F.col("_nb")).cast("double"), 9
    ).cast("decimal(38,9)")
    agg = stitched.select(term.alias("_t")).agg(
        F.sum("_t").cast("double").alias("_s")
    )
    scale = float(acc_a) * float(acc_b) / float(acc_a + acc_b) ** 2
    return agg.select(
        F.lit(acc_a).cast("long").alias("n_ref"),
        F.lit(acc_b).cast("long").alias("n_cur"),
        F.round(F.lit(scale) * F.col("_s"), 9).alias("cvm_stat"),
    )


_Z975 = 1.959963984540054


def auc_delong(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 32,
) -> DataFrame:
    """ROC-AUC with the DeLong (1988) standard error and 95% CI — the
    inference-grade companion to :func:`roc_auc`: a point AUC without
    its sampling error is uninterpretable when comparing models.

    Mid-rank placement formulation (Sun & Xu 2014): for each positive,
    its placement is the tie-corrected fraction of negatives below it —
    derivable from the SAME inclusive cumulative counts the rank
    scaffold already produces (placement at value v = (cum_neg(v) −
    0.5·n_neg(v)) / N_neg), so no per-row lag and no second shuffle.
    AUC = mean positive placement; Var = S₁₀/m + S₀₁/n with S the
    sample variances of the two placement populations, computed from
    round-9 decimal moment sums (placements ∈ [0,1] — magnitude-safe).
    Returns ``(n_pos, n_neg, auc, se, ci_lo, ci_hi)``.

    Scale shape: identical to ks_two_sample — distinct-value counts,
    stitched bucketed cumsums, 1-row epilogue with pinned arithmetic.
    """
    s = df.select(
        F.col(score_col).cast("double").alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
    counts = (
        s.groupBy("_v")
        .agg(
            F.sum("_y").alias("_np"),
            F.sum(1 - F.col("_y")).alias("_nn"),
        )
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_np", "_nn"), buckets)
    m, n = totals["_np"], totals["_nn"]
    if m == 0 or n == 0:
        raise ValueError("auc_delong: need at least one positive and one negative")
    plc_pos = (
        F.col("_cum__nn").cast("double") - 0.5 * F.col("_nn").cast("double")
    ) / F.lit(float(n))
    plc_neg = (
        F.col("_cum__np").cast("double") - 0.5 * F.col("_np").cast("double")
    ) / F.lit(float(m))

    def dmom(expr, w):
        return F.sum(
            F.round(expr * F.col(w).cast("double"), 9).cast("decimal(38,9)")
        ).cast("double")

    agg = stitched.agg(
        dmom(plc_pos, "_np").alias("_sp"),
        dmom(plc_pos * plc_pos, "_np").alias("_spp"),
        dmom(plc_neg, "_nn").alias("_sn"),
        dmom((1 - plc_neg) * (1 - plc_neg), "_nn").alias("_snn"),
    )
    auc = F.col("_sp") / F.lit(float(m))
    # S10: variance of positive placements; S01: of (1 - negative placements)
    s10 = (F.col("_spp") - F.col("_sp") * F.col("_sp") / F.lit(float(m))) / F.lit(
        float(m - 1) if m > 1 else 1.0
    )
    sn1 = F.lit(float(n)) - F.col("_sn")  # sum of (1 - plc_neg)
    s01 = (F.col("_snn") - sn1 * sn1 / F.lit(float(n))) / F.lit(
        float(n - 1) if n > 1 else 1.0
    )
    var = s10 / F.lit(float(m)) + s01 / F.lit(float(n))
    se = F.sqrt(F.when(var < 0, F.lit(0.0)).otherwise(var))
    return agg.select(
        F.lit(m).cast("long").alias("n_pos"),
        F.lit(n).cast("long").alias("n_neg"),
        F.round(auc, 9).alias("auc"),
        F.round(se, 9).alias("se"),
        F.round(auc - F.lit(_Z975) * se, 9).alias("ci_lo"),
        F.round(auc + F.lit(_Z975) * se, 9).alias("ci_hi"),
    )


def anderson_darling_2s(
    df_ref: DataFrame,
    df_cur: DataFrame,
    column: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-sample Anderson–Darling statistic (Pettitt 1976 rank form):
    ``A² = (nm/N) · Σ_pooled (F_ref − F_cur)² / (H(1−H))`` with ``H``
    the pooled ECDF, summed over pooled observations except where
    H ∈ {0, 1} — the tail-weighted member of the ECDF family (KS: sup,
    CvM: unweighted integral, W1/energy: mass-transport): the 1/(H(1−H))
    weight makes it the drift test that catches tail divergence first.
    Same inclusive stitched cumsums as :func:`cramer_von_mises`; the
    per-value weighted term multiplies in DOUBLE with one pinned order,
    rounds to 9, then decimal-accumulates. Returns
    ``(n_ref, n_cur, ad_stat)``.
    """
    a = df_ref.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    b = df_cur.select(F.col(column).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    counts = (
        a.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_na"))
        .join(
            b.groupBy("_v").agg(F.count(F.lit(1)).alias("_nb")),
            "_v",
            "full_outer",
        )
        .select(
            "_v",
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
        .localCheckpoint(eager=False)
    )
    from onetl_spark.operators.ranking import stitched_cumsums

    stitched, totals = stitched_cumsums(counts, "_v", ("_na", "_nb"), buckets)
    acc_a, acc_b = totals["_na"], totals["_nb"]
    if acc_a == 0 or acc_b == 0:
        raise ValueError("anderson_darling_2s: both samples must be non-empty")
    big_n = acc_a + acc_b
    d = F.col("_cum__na").cast("double") / F.lit(float(acc_a)) - F.col(
        "_cum__nb"
    ).cast("double") / F.lit(float(acc_b))
    h = (F.col("_cum__na") + F.col("_cum__nb")).cast("double") / F.lit(
        float(big_n)
    )
    w = F.col("_na") + F.col("_nb")
    term = F.when(
        (h > 0) & (h < 1),
        F.round(
            d * d / (h * (1 - h)) * w.cast("double"), 9
        ).cast("decimal(38,9)"),
    )
    agg = stitched.select(term.alias("_t")).agg(
        F.sum("_t").cast("double").alias("_s")
    )
    scale = float(acc_a) * float(acc_b) / float(big_n)
    return agg.select(
        F.lit(acc_a).cast("long").alias("n_ref"),
        F.lit(acc_b).cast("long").alias("n_cur"),
        F.round(F.lit(scale) / F.lit(float(big_n)) * F.col("_s"), 9).alias(
            "ad_stat"
        ),
    )
