"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Why not HyperLogLog (``approx_count_distinct``)? Its estimate depends on
engine-internal hashing and register layout — useless when a second
system must reproduce or audit the number. KMV with an md5-derived hash
is fully deterministic: any engine that can md5 computes the identical
estimate, so sketches can be compared across Spark, DuckDB, and whatever
runs downstream.

Estimator: hash every distinct value to a unit float u ∈ (0, 1]; keep
the k smallest per group. If a group has < k distinct hashes the count
is exact; otherwise the classic unbiased KMV estimate is ``(k-1)/u_k``
with ``u_k`` the k-th smallest unit hash.

Scale shape: one distinct-shuffle on (group, hash) — the same cost as
any exact distinct — then a per-group top-k that Catalyst executes as
``WindowGroupLimit`` (partial per-partition heap BEFORE the exchange),
so the post-shuffle volume is ≤ partitions×k rows per group, never the
distinct set. The standard use is sketching MANY groups in one pass
(per-day, per-source cardinalities), where exact count-distinct per
group would carry the full value set per group through the shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from onetl_spark.llm.text import md5_long

#: md5_long yields 15 hex digits → uniform integers in [0, 16^15)
_HASH_SPACE = float(16**15)


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via k-minimum-values.

    Returns (group_cols..., n_kept, estimate) where estimate is exact
    (= n_kept) for groups with fewer than k distinct values.
    """
    if k < 2:
        raise ValueError("k must be >= 2 for the (k-1)/u_k estimator")
    hashed = (
        df.select(
            *group_cols,
            (md5_long(F.col(value_col).cast("string")) / F.lit(_HASH_SPACE)).alias("_u"),
        )
        .filter(F.col("_u") > 0)
        .distinct()
    )
    w = W.partitionBy(*group_cols).orderBy("_u")
    kept = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("_u").alias("_uk"),
        )
        .select(
            *group_cols,
            "n_kept",
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                    F.lit(float(k - 1)) / F.col("_uk"),
                ),
                6,
            ).alias("estimate"),
        )
    )


def sql_kmv_distinct_estimate(
    table: str,
    group_cols: list[str],
    value_expr: str,
    k: int = 64,
) -> str:
    """DuckDB oracle for :func:`kmv_distinct_estimate` — byte-identical
    hashing and arithmetic."""
    groups = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups},
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT
           / {_HASH_SPACE:.1f} AS _u
  FROM {table}
  WHERE ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT > 0
), kept AS (
  SELECT {groups}, _u,
         ROW_NUMBER() OVER (PARTITION BY {groups} ORDER BY _u) AS _rn
  FROM hashed QUALIFY _rn <= {k}
)
SELECT {groups}, COUNT(*) AS n_kept,
       round(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(k - 1)} / MAX(_u) END, 6) AS estimate
FROM kept
GROUP BY {groups}
"""


def kmv_set_ops(
    df: DataFrame,
    group_cols: list[str],
    side_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Mergeable-sketch set operations: per group, estimate the distinct
    cardinality of two sides A/B, their UNION, and their INTERSECTION —
    without ever shuffling the full value sets together.

    ``side_col`` must hold exactly two values ``'a'`` / ``'b'`` (map your
    period/table/variant onto them). Union sketch = k smallest unit
    hashes over both sides' sketches (valid because K(A∪B) ⊆ K(A)∪K(B) —
    the KMV mergeability property); resemblance ρ̂ = |K ∩ K_A ∩ K_B| / |K|
    (Beyer et al., SIGMOD'07), and |A∩B| ≈ ρ̂·|A∪B|. Everything is
    md5-derived and rank-based — bit-reproducible in any engine.

    Scale shape: one distinct-shuffle on (group, side, hash), per-(group,
    side) and per-group WindowGroupLimit top-k (partial heaps before the
    exchange), then k-bounded joins. The full distinct sets never meet:
    exact |A∩B| would carry both sides' value sets through one shuffle;
    the sketch carries 2k rows per group.
    """
    if k < 2:
        raise ValueError("k must be >= 2 for the (k-1)/u_k estimator")
    hashed = (
        df.select(
            *group_cols,
            # restrict to the two declared sides up front: a stray third
            # side value would silently join the union sketch (skewing
            # |A∪B| and the resemblance) while being dropped from est_a/b
            F.col(side_col).alias("_side"),
            (md5_long(F.col(value_col).cast("string")) / F.lit(_HASH_SPACE)).alias("_u"),
        )
        .filter((F.col("_u") > 0) & F.col("_side").isin("a", "b"))
        .distinct()
    )
    w_side = W.partitionBy(*group_cols, "_side").orderBy("_u")
    kept = hashed.withColumn("_rn", F.row_number().over(w_side)).filter(F.col("_rn") <= k)

    def _estimate(n_col, uk_col):
        return F.round(
            F.when(n_col < k, n_col.cast("double")).otherwise(F.lit(float(k - 1)) / uk_col),
            6,
        )

    per_side = (
        kept.groupBy(*group_cols, "_side")
        .agg(F.count(F.lit(1)).alias("_n"), F.max("_u").alias("_uk"))
        .select(*group_cols, "_side", _estimate(F.col("_n"), F.col("_uk")).alias("_est"))
    )
    est_ab = (
        per_side.groupBy(*group_cols)
        .pivot("_side", ["a", "b"])
        .agg(F.first("_est"))
        .select(
            *group_cols,
            F.coalesce("a", F.lit(0.0)).alias("est_a"),
            F.coalesce("b", F.lit(0.0)).alias("est_b"),
        )
    )
    # membership of each sketch hash per side, then the k smallest overall
    members = kept.groupBy(*group_cols, "_u").agg(
        F.max((F.col("_side") == "a").cast("int")).alias("_in_a"),
        F.max((F.col("_side") == "b").cast("int")).alias("_in_b"),
    )
    w_union = W.partitionBy(*group_cols).orderBy("_u")
    union_kept = members.withColumn("_rn", F.row_number().over(w_union)).filter(
        F.col("_rn") <= k
    )
    out = (
        union_kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("_u").alias("_uk"),
            F.sum((F.col("_in_a") * F.col("_in_b"))).alias("_n_both"),
        )
        .select(
            *group_cols,
            _estimate(F.col("_n"), F.col("_uk")).alias("est_union"),
            F.round(F.col("_n_both") / F.col("_n"), 9).alias("jaccard_est"),
            F.round(
                (F.col("_n_both") / F.col("_n"))
                * _estimate(F.col("_n"), F.col("_uk")),
                6,
            ).alias("est_intersection"),
        )
    )
    return est_ab.join(out, group_cols)


def sql_kmv_set_ops(
    table_expr: str,
    group_cols: list[str],
    side_expr: str,
    value_expr: str,
    k: int = 64,
) -> str:
    """DuckDB oracle for :func:`kmv_set_ops` (identical hash + arithmetic).
    ``table_expr`` is a FROM-able relation; ``side_expr`` must yield 'a'/'b'."""
    groups = ", ".join(group_cols)
    h = f"('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT / {_HASH_SPACE:.1f}"
    est = lambda n, uk: f"round(CASE WHEN {n} < {k} THEN CAST({n} AS DOUBLE) ELSE {float(k - 1)} / {uk} END, 6)"
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups}, {side_expr} AS _side, {h} AS _u
  FROM {table_expr}
  WHERE {h} > 0 AND ({side_expr}) IN ('a', 'b')
), kept AS (
  SELECT {groups}, _side, _u,
         ROW_NUMBER() OVER (PARTITION BY {groups}, _side ORDER BY _u) AS _rn
  FROM hashed QUALIFY _rn <= {k}
), per_side AS (
  SELECT {groups}, _side, COUNT(*) AS _n, MAX(_u) AS _uk
  FROM kept GROUP BY {groups}, _side
), est_ab AS (
  SELECT {groups},
         COALESCE(MAX(CASE WHEN _side = 'a' THEN {est('_n', '_uk')} END), 0.0) AS est_a,
         COALESCE(MAX(CASE WHEN _side = 'b' THEN {est('_n', '_uk')} END), 0.0) AS est_b
  FROM per_side GROUP BY {groups}
), members AS (
  SELECT {groups}, _u,
         MAX(CASE WHEN _side = 'a' THEN 1 ELSE 0 END) AS _in_a,
         MAX(CASE WHEN _side = 'b' THEN 1 ELSE 0 END) AS _in_b
  FROM kept GROUP BY {groups}, _u
), union_kept AS (
  SELECT {groups}, _u, _in_a, _in_b,
         ROW_NUMBER() OVER (PARTITION BY {groups} ORDER BY _u) AS _rn
  FROM members QUALIFY _rn <= {k}
), u AS (
  SELECT {groups}, COUNT(*) AS _n, MAX(_u) AS _uk,
         SUM(_in_a * _in_b) AS _n_both
  FROM union_kept GROUP BY {groups}
)
SELECT est_ab.{group_cols[0]}{"".join(", est_ab." + c for c in group_cols[1:])},
       est_a, est_b,
       {est('u._n', 'u._uk')} AS est_union,
       round(u._n_both * 1.0 / u._n, 9) AS jaccard_est,
       round((u._n_both * 1.0 / u._n) * {est('u._n', 'u._uk')}, 6) AS est_intersection
FROM est_ab JOIN u USING ({groups})
"""


def cms_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Count–min sketch of a key column: ``depth × width`` counters,
    ``counter[i][h_i(x)] += 1`` — the mergeable frequency sketch (union
    = cell-wise add) that answers "how often did key x appear?" in
    ``depth·width`` integers regardless of cardinality. Estimates only
    OVERcount (collisions add, never subtract) — the one-sided error a
    monitoring pipeline can reason about.

    Hashes are md5-derived (seeded per row ``i``), so any engine builds
    the identical sketch. One scan exploded ×depth, map-side combined
    into ≤ depth·width partial rows per partition. Returns
    ``(row, bucket, cnt, width, depth)`` — the geometry travels WITH the
    sketch so a probe with mismatched parameters is rejected instead of
    silently undercounting."""
    if width < 1 or depth < 1:
        raise ValueError("cms_sketch: width and depth must be positive")
    return (
        df.select(F.explode(_cms_cells(key_col, width, depth)).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("row", "bucket", "cnt", F.lit(width).alias("width"), F.lit(depth).alias("depth"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise union of two count–min sketches (counts add). Both
    sides must declare the SAME geometry — merging mismatched sketches
    would mix incompatible hash spaces. One shuffle on (row, bucket)."""
    ga = _cms_geometry(a)
    gb = _cms_geometry(b)
    if ga != gb:
        raise ValueError(
            f"cms_merge: sketch geometry mismatch {ga} vs {gb}"
        )
    w, d = ga
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .select("row", "bucket", "cnt", F.lit(w).alias("width"), F.lit(d).alias("depth"))
    )


def _cms_geometry(sketch: DataFrame) -> tuple[int, int]:
    """The (width, depth) a sketch was built with — read from its
    geometry columns (one bounded agg; raises on a mixed union)."""
    if "width" not in sketch.columns or "depth" not in sketch.columns:
        raise ValueError(
            "cms sketch is missing geometry columns (width, depth) — "
            "build it with cms_sketch"
        )
    g = sketch.agg(
        F.min("width").alias("_w0"), F.max("width").alias("_w1"),
        F.min("depth").alias("_d0"), F.max("depth").alias("_d1"),
    ).collect()[0]
    if g["_w0"] is None:
        return (0, 0)  # empty sketch: every cell reads 0, any probe valid
    if g["_w0"] != g["_w1"] or g["_d0"] != g["_d1"]:
        raise ValueError("cms sketch mixes geometries — merge with cms_merge")
    return (g["_w0"], g["_d0"])


def _cms_cells(key_col: str, width: int, depth: int):
    """The (row, bucket) cell coordinates of a key — ONE definition shared
    by build and probe (divergent hashing would silently undercount)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    md5_long(
                        F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))
                    ),
                    F.lit(width),
                ).cast("int").alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_sketch`: for each key,
    ``min_i counter[i][h_i(key)]``. The sketch (depth·width rows)
    broadcasts against the key list; missing cells read 0. The sketch's
    RECORDED geometry is validated EXACTLY against the probe parameters
    — a smaller-geometry sketch would pass a max-cell check yet leave
    probe hashes in never-populated cells, silently inverting the
    never-undercount guarantee into undercounts."""
    gw, gd = _cms_geometry(sketch)
    if (gw, gd) != (0, 0) and (gw, gd) != (width, depth):
        raise ValueError(
            f"cms_estimate: sketch geometry (width={gw}, depth={gd}) does "
            f"not match probe geometry (width={width}, depth={depth})"
        )
    sketch = sketch.select("row", "bucket", "cnt")
    probes = keys.select(
        F.col(key_col),
        F.explode(_cms_cells(key_col, width, depth)).alias("_p"),
    ).select(key_col, F.col("_p.row").alias("row"), F.col("_p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


#: HLL geometry: md5_long yields 60 hash bits; b index bits leave W
#: rho-bits, so rho ∈ [1, W+1] and register sums fit exact decimals.
_HLL_HASH_BITS = 60


def _hll_alpha(m: int) -> float:
    """Standard bias constant, emitted at fixed 12 decimals so SQL
    oracles can embed the identical literal."""
    if m >= 128:
        a = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        a = 0.709
    elif m == 32:
        a = 0.697
    else:
        a = 0.673
    return float(f"{a:.12f}")


def hll_registers(
    df: DataFrame,
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """HyperLogLog register table for a column: ``m = 2**b`` rows
    ``(bucket, rho)`` where ``rho`` is the max leading-zero rank seen in
    the bucket (empty registers present with rho 0) — the mergeable
    distinct sketch (union = register-wise max, an EXACT operation, so
    merged sketches equal the sketch of the union bit-for-bit).

    The hash is md5-derived and the rank comes from the binary-string
    length of the remaining bits (both engines share ``bin()``/string
    semantics) — no floating point anywhere in the sketch itself. One
    scan, map-side combined into ≤ m partials per partition.
    """
    if not 4 <= b <= 16:
        raise ValueError(f"hll_registers: b must be in [4, 16], got {b}")
    m = 1 << b
    w_bits = _HLL_HASH_BITS - b
    staged = (
        df.filter(F.col(value_col).isNotNull())
        .select(md5_long(F.col(value_col).cast("string")).alias("_h"))
    )
    bucket = F.pmod(F.col("_h"), F.lit(m)).cast("int")
    # integer division — a double `/` on a ~1e18 hash loses low bits
    w = F.expr(f"_h div {m}")
    rho = (
        F.when(w == F.lit(0), F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    observed = (
        staged.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    spark = df.sparkSession
    all_buckets = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    return all_buckets.join(observed, "bucket", "left").select(
        "bucket", F.coalesce("rho", F.lit(0)).alias("rho")
    )


def hll_registers_by(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    b: int = 8,
) -> DataFrame:
    """Per-group HLL register tables in ONE aggregation — the scale path
    for "a sketch per segment": ``(group_cols..., bucket, rho)`` with
    absent registers meaning rho 0 (no per-group empty-bucket fill; fill
    once after merging with :func:`hll_fill_buckets`). Unlike looping
    ``hll_registers`` over collected group values (one filtered scan +
    join PER GROUP — 21 Spark jobs for 9 event types, r7 bench), this is
    a single scan and a single groupBy((groups, bucket)) shuffle no
    matter how many groups exist, and it never collects the group list
    to the driver."""
    if not 4 <= b <= 16:
        raise ValueError(f"hll_registers_by: b must be in [4, 16], got {b}")
    if not group_cols:
        raise ValueError("hll_registers_by: need at least one group column")
    m = 1 << b
    w_bits = _HLL_HASH_BITS - b
    staged = df.filter(F.col(value_col).isNotNull()).select(
        *[F.col(g) for g in group_cols],
        md5_long(F.col(value_col).cast("string")).alias("_h"),
    )
    bucket = F.pmod(F.col("_h"), F.lit(m)).cast("int")
    w = F.expr(f"_h div {m}")
    rho = (
        F.when(w == F.lit(0), F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return (
        staged.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_fill_buckets(registers: DataFrame, b: int = 8) -> DataFrame:
    """Densify an observed-only ``(bucket, rho)`` relation to the full
    ``m = 2**b`` rows (absent → rho 0) — the shape :func:`hll_estimate`
    validates. Apply AFTER merging :func:`hll_registers_by` groups."""
    m = 1 << b
    spark = registers.sparkSession
    all_buckets = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    return all_buckets.join(registers, "bucket", "left").select(
        "bucket", F.coalesce("rho", F.lit(0)).alias("rho")
    )


def hll_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """Distinct-count estimate from :func:`hll_registers`: the harmonic
    mean is computed as the EXACT integer ``Σ 2**(W+1-rho)`` (every term
    a power of two, summed as decimal — no float accumulation), then one
    pinned double expression with the standard small-range linear-
    counting correction. Returns ``(m, n_zero, raw_estimate, estimate)``.
    """
    m = 1 << b
    w_bits = _HLL_HASH_BITS - b
    alpha = _hll_alpha(m)
    n_regs = registers.count()
    if n_regs != m:
        raise ValueError(
            f"hll_estimate: register table has {n_regs} rows, expected "
            f"m=2^{b}={m} — the sketch was built with a different b"
        )
    # 2^(W+1-rho) via shift on a decimal-safe path: rho<=W+1 so exp>=0
    term = F.pow(F.lit(2.0), F.lit(w_bits + 1) - F.col("rho")).cast("decimal(38,0)")
    agg = registers.agg(
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
        F.lit(m).cast("long").alias("m"),
        F.col("_z").cast("long").alias("n_zero"),
        F.round(raw, 9).alias("raw_estimate"),
        F.round(est, 9).alias("estimate"),
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union HLL sketches: register-wise max — exact, so
    ``hll_merge(sketch(A), sketch(B))`` equals ``sketch(A ∪ B)``
    register for register."""
    if not register_tables:
        raise ValueError("hll_merge: need at least one sketch")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def _bloom_positions(key_col: str, m_bits: int, k_hashes: int):
    """The k bit positions of a key — ONE definition shared by build and
    probe (the CMS `_cms_cells` discipline: divergent hashing would
    silently break the no-false-negative guarantee)."""
    return F.array(
        *[
            F.pmod(
                md5_long(F.concat(F.lit(f"b{i}:"), F.col(key_col).cast("string"))),
                F.lit(m_bits),
            ).cast("long")
            for i in range(k_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 5,
) -> DataFrame:
    """Bloom filter of a key column — the mergeable MEMBERSHIP sketch
    next to CMS (frequency), HLL (distinct) and KMV (set ops): "was this
    key ever seen?" with no false negatives and a tunable false-positive
    rate ``(1 - e^{-kn/m})^k``. Stored as the SET-BIT relation
    ``(bit, m_bits, k_hashes)`` — ≤ m rows regardless of input size, so
    the sketch broadcasts; geometry travels WITH the sketch and probes
    with mismatched parameters are rejected (the CMS lesson: a silent
    mismatch inverts the guarantee).

    One scan exploded ×k, map-side-combined distinct — the same shuffle
    shape as an aggregate. NULL keys are excluded (SQL membership of
    NULL is undefined, matching the dialect predicate conventions).
    """
    if m_bits < 8:
        raise ValueError("bloom_build: m_bits must be >= 8")
    if k_hashes < 1:
        raise ValueError("bloom_build: k_hashes must be >= 1")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(_bloom_positions(key_col, m_bits, k_hashes)).alias("bit"))
        .distinct()
        .select(
            "bit",
            F.lit(m_bits).alias("m_bits"),
            F.lit(k_hashes).alias("k_hashes"),
        )
    )


def _bloom_geometry(sketch: DataFrame) -> "tuple[int, int]":
    if "m_bits" not in sketch.columns or "k_hashes" not in sketch.columns:
        raise ValueError(
            "bloom sketch is missing geometry columns (m_bits, k_hashes) — "
            "build it with bloom_build"
        )
    g = sketch.agg(
        F.min("m_bits").alias("_m0"), F.max("m_bits").alias("_m1"),
        F.min("k_hashes").alias("_k0"), F.max("k_hashes").alias("_k1"),
    ).collect()[0]
    if g["_m0"] is None:
        return (0, 0)  # empty filter: nothing is a member, any probe valid
    if g["_m0"] != g["_m1"] or g["_k0"] != g["_k1"]:
        raise ValueError("bloom sketch mixes geometries — merge with bloom_merge")
    return (g["_m0"], g["_k0"])


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two Bloom filters (bitwise OR == set union of set bits)
    — exact: ``merge(bloom(A), bloom(B)) == bloom(A ∪ B)`` bit for bit,
    which is what makes per-partition builds combinable. Geometry must
    match on both sides."""
    ga, gb = _bloom_geometry(a), _bloom_geometry(b)
    if ga != (0, 0) and gb != (0, 0) and ga != gb:
        raise ValueError(f"bloom_merge: sketch geometry mismatch {ga} vs {gb}")
    m, k = ga if ga != (0, 0) else gb
    return (
        a.unionByName(b)
        .select("bit")
        .distinct()
        .select("bit", F.lit(m).alias("m_bits"), F.lit(k).alias("k_hashes"))
    )


def bloom_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 5,
) -> DataFrame:
    """Membership probe: a key *might* be present iff ALL k of its bit
    positions are set. Returns the keys frame plus ``might_contain`` —
    true has a bounded false-positive rate, false is EXACT (the property
    joins downstream rely on: a Bloom pre-filter before an expensive
    join may pass extra rows, never drop real ones).

    The sketch (≤ m rows) broadcasts against the keys; per key the probe
    is a k-row semi-match counted to k. Geometry is validated exactly.
    """
    gm, gk = _bloom_geometry(sketch)
    if (gm, gk) != (0, 0) and (gm, gk) != (m_bits, k_hashes):
        raise ValueError(
            f"bloom_probe: sketch geometry (m_bits={gm}, k_hashes={gk}) does "
            f"not match probe geometry (m_bits={m_bits}, k_hashes={k_hashes})"
        )
    bits = sketch.select("bit")
    probes = keys.select(
        F.col(key_col),
        F.explode(_bloom_positions(key_col, m_bits, k_hashes)).alias("bit"),
    )
    return (
        probes.join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
        )
        .groupBy(key_col)
        .agg(
            (F.sum(F.coalesce("_set", F.lit(0))) == F.lit(k_hashes)).alias(
                "might_contain"
            )
        )
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Pinned-bin mergeable histogram — the SCALE path to quantiles
    (the exact global-rank machinery answers the same question
    perfectly but pays a distinct-value shuffle; this pays ONE
    map-side-combined aggregate and merges across days/partitions by
    cell-wise add, the PSI pinned-bins convention). Bin −1 catches
    underflow, bin ``bins`` overflow, so drifting data is visible
    instead of silently clamped. Returns ``(bin, cnt, lo, hi, bins)``
    — geometry travels with the sketch (the CMS/Bloom discipline).
    NULLs are excluded."""
    if not lo < hi:
        raise ValueError(f"histogram_sketch: need lo < hi, got {lo} >= {hi}")
    if bins < 1:
        raise ValueError("histogram_sketch: bins must be >= 1")
    v = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    b = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"))
    )
    return (
        df.filter(v.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin", "cnt",
            F.lit(float(lo)).alias("lo"),
            F.lit(float(hi)).alias("hi"),
            F.lit(bins).alias("bins"),
        )
    )


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise union of two pinned-bin histograms (counts add) —
    exact; geometry must match."""
    ga = _histogram_geometry(a)
    gb = _histogram_geometry(b)
    if ga is not None and gb is not None and ga != gb:
        raise ValueError(f"histogram_merge: geometry mismatch {ga} vs {gb}")
    g = ga if ga is not None else gb
    merged = a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    if g is None:  # both empty
        return merged.select(
            "bin", "cnt",
            F.lit(None).cast("double").alias("lo"),
            F.lit(None).cast("double").alias("hi"),
            F.lit(None).cast("int").alias("bins"),
        )
    return merged.select(
        "bin", "cnt",
        F.lit(g[0]).alias("lo"), F.lit(g[1]).alias("hi"), F.lit(g[2]).alias("bins"),
    )


def _histogram_geometry(sketch: DataFrame):
    for c in ("lo", "hi", "bins"):
        if c not in sketch.columns:
            raise ValueError(
                "histogram sketch is missing geometry columns (lo, hi, bins)"
            )
    g = sketch.agg(
        F.min("lo").alias("_l0"), F.max("lo").alias("_l1"),
        F.min("hi").alias("_h0"), F.max("hi").alias("_h1"),
        F.min("bins").alias("_b0"), F.max("bins").alias("_b1"),
    ).collect()[0]
    if g["_l0"] is None:
        return None
    if g["_l0"] != g["_l1"] or g["_h0"] != g["_h1"] or g["_b0"] != g["_b1"]:
        raise ValueError("histogram sketch mixes geometries")
    return (g["_l0"], g["_h0"], g["_b0"])


def histogram_quantiles(
    sketch: DataFrame,
    quantiles: "list[float]",
) -> DataFrame:
    """Quantile ESTIMATES from a :func:`histogram_sketch`: find the bin
    where the cumulative count crosses ``q·n`` and interpolate linearly
    inside it — deterministic (one pinned expression), with the
    guaranteed error bound of one bin width (reported per row, the
    "approximate but honest" contract; tighten by adding bins, or use
    the exact rank machinery when the cost is acceptable). Estimates
    clamp to [lo, hi]: a target landing in the underflow/overflow bin
    reports the boundary. The cumulative window runs over the
    bin-count-sized relation — bounded, not data-sized."""
    if not quantiles or not all(0 <= q <= 1 for q in quantiles):
        raise ValueError("histogram_quantiles: quantiles must lie in [0, 1]")
    g = _histogram_geometry(sketch)
    if g is None:
        raise ValueError("histogram_quantiles: empty sketch")
    lo, hi, bins = g
    width = (hi - lo) / bins
    cum = (
        sketch.select("bin", "cnt")
        .withColumn(
            "_cum",
            F.sum("cnt").over(
                W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .withColumn("_before", F.col("_cum") - F.col("cnt"))
    )
    tot = sketch.agg(F.sum("cnt").alias("_n"))
    qdf = cum.crossJoin(F.broadcast(tot)).crossJoin(
        F.broadcast(
            sketch.sparkSession.createDataFrame([(float(q),) for q in quantiles], "q double")
        )
    )
    target = F.col("q") * F.col("_n").cast("double")
    hit = qdf.filter(
        (F.col("_cum").cast("double") >= target)
        & (F.col("_before").cast("double") < target)
        | ((F.col("q") == 0) & (F.col("_before") == 0))
    )
    est_raw = (
        F.lit(lo)
        + (
            F.col("bin").cast("double")
            + (target - F.col("_before").cast("double")) / F.col("cnt").cast("double")
        )
        * F.lit(width)
    )
    est = F.least(F.greatest(est_raw, F.lit(float(lo))), F.lit(float(hi)))
    return (
        hit.groupBy("q")
        .agg(
            F.min(F.struct(F.col("bin"), F.round(est, 9).alias("_e"))).alias("_m"),
            F.first("_n").alias("_nn"),
        )
        .select(
            "q",
            F.col("_m.bin").alias("bin"),
            F.col("_m._e").alias("estimate"),
            F.lit(float(width)).alias("error_bound"),
            F.col("_nn").cast("long").alias("n"),
        )
    )
