"""Deterministic sampling, splitting, and sequence packing for training-
data pipelines.

Everything here is HASH-DRIVEN, not RNG-driven: ``rand()`` samples are
irreproducible across retries, engines, and partition layouts, which
breaks both incremental pipelines (a retried task samples different
rows) and train/test hygiene (the split must be a pure function of the
example, or examples migrate between splits when the corpus is
re-sharded). ``md5_long`` (first 15 hex chars of md5 → bigint) is the
cross-engine hash used everywhere in this package — DuckDB mirrors it as
``('0x' || substr(md5(x),1,15))::BIGINT``.

Scale notes:

- ``split_by_hash`` / ``sample_by_hash`` are pure per-row projections —
  ZERO shuffle at any corpus size; the filter/projection pushes down to
  the scan.
- ``pack_sequences`` packs WITHIN a shard column (source, date, path —
  whatever bounds a window partition): one shuffle on the shard key,
  never a global sort. Global greedy packing is inherently sequential;
  per-shard packing is what production pipelines do, and the shard
  boundary waste is at most one under-filled bin per shard.

Reference parity note: the reference EL framework has no sampling
operators (non-goal per its README); these follow the common web-corpus
recipes (hash-mod splits, per-stratum rates, greedy context packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from onetl_spark.llm.text import bpe_ish_token_count, md5_long, token_count, word_tokens

#: denominator for mapping the hash to a unit interval; 1e6 buckets keeps
#: split boundaries exact for fractions with ≤6 decimal places
UNIT_BUCKETS = 1_000_000


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic uniform value in [0, 1): ``(md5_long(salt||x) %
    1e6) / 1e6``. Salting yields independent draws from the same key —
    use a distinct salt per decision (split vs subsample) so one doesn't
    bias the other."""
    return (
        F.pmod(md5_long(F.concat(F.lit(salt), col.cast("string"))), F.lit(UNIT_BUCKETS))
        / F.lit(float(UNIT_BUCKETS))
    )


def sql_hash_unit(expr: str, salt: str = "") -> str:
    """DuckDB mirror of :func:`hash_unit` for oracle queries."""
    salted = f"'{salt}' || CAST({expr} AS VARCHAR)"
    return (
        f"(('0x' || substr(md5({salted}), 1, 15))::BIGINT % {UNIT_BUCKETS})"
        f" / {UNIT_BUCKETS}.0"
    )


def split_by_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test…) as a pure
    function of its id. Fractions must sum to 1. Rows keep their split
    across re-runs, re-sharding, and engines."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = hash_unit(F.col(id_col), salt)
    expr = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = u < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def sample_by_hash(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``hash_unit(id) < fraction[stratum]``. The reproducible counterpart
    of ``DataFrame.sampleBy`` — no RNG, no shuffle, no per-stratum sort
    (an exact-count variant would need a rank per stratum: a per-stratum
    global sort that a 100 TB corpus can't afford; hash thresholding is
    exact in expectation and each stratum concentrates tightly around
    fraction·n)."""
    u = hash_unit(F.col(id_col), salt)
    rate = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, F.lit(frac)) if rate is None else rate.when(cond, F.lit(frac))
    rate = F.lit(default) if rate is None else rate.otherwise(F.lit(default))
    return df.filter(u < rate)


def pack_sequences(
    df: DataFrame,
    token_col: Column | str,
    budget: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy contiguous packing of documents into context-window bins.

    Documents are ordered by id within each shard; a document opens a new
    bin when the tokens accumulated BEFORE it have crossed a multiple of
    ``budget`` (documents are never split, so a bin may overflow by at
    most one document — the standard no-split streaming packer).

    Returns one row per (shard, bin_id): n_docs, tokens_total, and the
    packed doc ids in order. One shuffle on the shard key; the window
    sort is per-shard, so parallelism is the shard count — pick a shard
    column with enough distinct values for the cluster (source file,
    date, path prefix).
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        tok.alias("_tok"),
    ).withColumn("_cum", F.sum("_tok").over(w))
    binned = staged.withColumn(
        "bin_id", F.floor((F.col("_cum") - F.col("_tok")) / F.lit(budget)),
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("tokens_total"),
            F.array_sort(F.collect_list(F.struct(id_col, "_tok"))).alias("_members"),
        )
        .select(
            "shard",
            "bin_id",
            "n_docs",
            "tokens_total",
            F.transform(F.col("_members"), lambda s: s[id_col]).alias("member_ids"),
        )
    )


def split_leakage_safe(
    df: DataFrame,
    fingerprint_col: str,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Cluster-aware train/val/test split: every row sharing a
    ``fingerprint_col`` value receives the split of the cluster
    REPRESENTATIVE (min ``id_col``), so duplicates can never straddle
    train and test — per-row hash splits leak verbatim copies of training
    documents into eval sets, silently inflating benchmark scores.

    Rows with a NULL ``fingerprint_col`` are treated as SINGLETON clusters
    (keyed by their own ``id_col``), not dropped: a plain equi-join on the
    fingerprint would never match NULL keys and those documents would land
    in no split at all. ``id_col`` must be non-null for such rows — a row
    with BOTH columns NULL has no stable key, and the job fails fast
    (``raise_error``) instead of silently dropping the row at the join.

    Cost beyond :func:`split_by_hash`: one fingerprint-keyed groupBy and
    one shuffle join back (both on the dedup key, which is exactly how
    exact-dedup already partitions the corpus — co-partitioned, no extra
    exchange when chained after it)."""
    fp = "__osk_fp"
    rep = "__osk_cluster_rep"
    for internal in (fp, rep):
        if internal in df.columns:
            raise ValueError(f"input already has internal column {internal!r}")
    # NULL fingerprint → singleton cluster keyed by the row's own id; the
    # "\x00id:" prefix cannot collide with a real md5/text fingerprint.
    # CASE WHEN (not coalesce) so the raise_error branch is evaluated
    # lazily, only for rows where BOTH keys are NULL.
    keyed = df.withColumn(
        fp,
        F.when(
            F.col(fingerprint_col).isNotNull(), F.col(fingerprint_col).cast("string")
        )
        .when(
            F.col(id_col).isNotNull(),
            F.concat(F.lit("\x00id:"), F.col(id_col).cast("string")),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    f"split_leakage_safe: row with NULL {fingerprint_col!r} "
                    f"and NULL {id_col!r} has no stable split key"
                )
            )
        ),
    )
    reps = keyed.groupBy(fp).agg(F.min(id_col).alias(rep))
    out = split_by_hash(keyed.join(reps, fp), rep, splits, salt)
    return out.drop(fp, rep)


def shuffle_into_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic corpus shuffle for training export: assign each row a
    ``shard`` (hash of salted id, mod ``n_shards``) and a within-shard
    ``pos`` (rank of a SECOND independent hash) — a reproducible
    pseudorandom permutation of the corpus, the standard prerequisite for
    training-order randomization without an irreproducible ``rand()``.

    Scale shape: one exchange on the shard key, then a per-shard window
    sort — never a global sort; parallelism = ``n_shards``, so pick it at
    least as large as the cluster's core count (it is also the natural
    output-file count). Re-running on re-sharded/re-partitioned input
    yields the identical permutation, because both hashes are pure
    functions of the id.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sid = F.col(id_col).cast("string")
    shard = F.pmod(md5_long(F.concat(F.lit(f"{salt}|s|"), sid)), F.lit(n_shards))
    order_key = md5_long(F.concat(F.lit(f"{salt}|p|"), sid))
    w = W.partitionBy("shard").orderBy("_ord", id_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("_ord", order_key)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_ord")
    )


def sql_shuffle_shards(
    n_shards: int, id_expr: str = "doc_id", salt: str = "shuffle"
) -> tuple[str, str]:
    """DuckDB mirror of :func:`shuffle_into_shards`: returns the
    (shard expression, within-shard order-key expression) pair."""
    sid = f"CAST({id_expr} AS VARCHAR)"
    h = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
    shard = h.format(x=f"'{salt}|s|' || {sid}") + f" % {n_shards}"
    order_key = h.format(x=f"'{salt}|p|' || {sid}")
    return shard, order_key


def trim_to_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    token_col: Column | str,
    id_col: str = "doc_id",
    buckets: int = 32,
    persist: "StorageLevel | None" = None,
) -> DataFrame:
    """Keep the best-scoring documents whose cumulative token count fits a
    global ``budget`` — the data-mixing primitive ("give me the top-quality
    X-billion-token slice of this corpus").

    ``persist``: storage level for the input frame. The operator makes
    THREE passes over ``df`` (quantile stats, bucket totals, the final
    window) — when ``score_col``/``token_col`` are expensive expressions
    (regex-chain quality scores), pass ``StorageLevel.MEMORY_AND_DISK``
    so they compute once. CALLER CONTRACT: what gets cached is ``df``
    with ALL its columns — pass a slim projection (id, score, tokens,
    and only the columns you need back), NOT the raw corpus with its
    text payload, or you cache the full corpus. The frame is left
    cached for the caller to release (the output is lazy over it).

    Semantically this is ``SUM(tokens) OVER (ORDER BY score DESC, id)``
    filtered to ``cum <= budget`` — but a partition-less window is a
    single-task global sort, the canonical 100-TB scale-killer. Instead:

    1. score quantile boundaries via ``approxQuantile`` (Greenwald–Khanna:
       deterministic for a given dataset, no RNG) define ``buckets``
       score ranges — one small driver-side pass;
    2. per-bucket token totals (map-side combined, ≤ ``buckets`` rows to
       the driver) become exclusive prefix offsets for each bucket;
    3. a window partitioned BY BUCKET (orderBy score DESC, id) plus the
       bucket's offset reconstructs the exact global running sum, and
       ``cum <= budget`` keeps exactly the ranked prefix.

    The kept set equals the single-sort definition no matter where the
    quantile boundaries land (offsets correct for any split), so the
    result is deterministic and DuckDB-reproducible. Equal scores always
    share a bucket (bucketing is on score alone; ties order by ``id``
    inside the window). Cost: one stats pass + one tiny shuffle + ONE
    full shuffle (the bucket window) — same exchange count as a
    distributed ORDER BY, minus its global merge.

    Returns the kept rows with their ``cum_tokens`` running total.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    # NULL token counts would poison the bucket totals (SUM → NULL →
    # TypeError when accumulating offsets) and give their rows a NULL
    # running sum that the <= budget filter silently drops. Treat unknown
    # length as 0 tokens: the row still competes by score but costs
    # nothing against the budget.
    t = df.withColumn("_tok", F.coalesce(tok.cast("long"), F.lit(0)))
    if persist is not None:
        t = t.persist(persist)

    qs = [i / buckets for i in range(1, buckets)]
    # approxQuantile ignores NULL scores; treat NULL as the worst score
    # (excluded unless budget admits the whole corpus)
    bounds = sorted(set(t.na.fill({score_col: float("-inf")}).stat.approxQuantile(score_col, qs, 0.001)))
    score = F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf")))
    # bucket 0 = highest scores; boundary b_i splits descending ranges
    bucket = F.lit(len(bounds))
    for i, b in enumerate(bounds):
        bucket = bucket - F.when(score > F.lit(b), 1).otherwise(0)
    t = t.withColumn("_bucket", bucket.cast("int"))

    totals = {
        r["_bucket"]: r["s"]
        for r in t.groupBy("_bucket").agg(F.sum("_tok").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for b in range(len(bounds) + 1):
        offsets[b] = acc
        acc += totals.get(b) or 0

    off = F.lit(0)
    for b, v in offsets.items():
        if v:
            off = F.when(F.col("_bucket") == b, F.lit(v)).otherwise(off)
    w = (
        W.partitionBy("_bucket")
        .orderBy(F.col(score_col).desc_nulls_last(), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("_tok").over(w) + off)
        .filter(F.col("cum_tokens") <= budget)
        .drop("_tok", "_bucket")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: Column | str,
    k: int,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each row gets key ``u^(1/w)`` with u a hash-derived
    uniform, and the k largest keys per stratum are the sample — exactly
    equivalent to sequential weighted draws without replacement, but
    embarrassingly parallel and reproducible (no RNG state).

    Rows with non-positive weight are excluded. Catalyst executes the
    per-stratum top-k as ``WindowGroupLimit`` (partial pre-shuffle
    heap), so a giant stratum never lands on one task as a full sort.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = hash_unit(F.col(id_col), salt)
    keyed = (
        df.filter(wcol > 0)
        .withColumn("_wkey", F.round(F.pow(u, F.lit(1.0) / wcol), 12))
    )
    parts = [strata_col] if strata_col else []
    w = W.partitionBy(*parts).orderBy(F.desc("_wkey"), F.asc(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with optional overlap
    (the concatenate-free variant of training-window construction: one
    sample per window, stride = chunk_tokens - overlap).

    Returns (doc_id, chunk_idx, n_tokens, chunk_text); the trailing window
    may be shorter than ``chunk_tokens``. Zero-token documents produce no
    rows. Pure per-row array expressions (sequence → slice → posexplode):
    narrow, no shuffle, codegen-friendly — output partitioning follows the
    input, which is exactly what a downstream pack/shuffle step wants.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tokens = word_tokens(F.col(text_col))
    # sequence() raises on inverted bounds, so zero-token docs take the
    # empty branch (CASE WHEN evaluates lazily — the sequence never runs)
    starts = F.when(
        F.size(tokens) > 0,
        F.sequence(F.lit(0), F.size(tokens) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: F.slice(tokens, s + 1, chunk_tokens))
    return (
        df.select(F.col(id_col), chunks.alias("_chunks"))
        .filter(F.size("_chunks") > 0)
        .select(F.col(id_col), F.posexplode("_chunks").alias("chunk_idx", "_toks"))
        .select(
            id_col,
            "chunk_idx",
            F.size("_toks").alias("n_tokens"),
            F.array_join("_toks", " ").alias("chunk_text"),
        )
    )


def reweight_domains(
    df: DataFrame,
    target_shares: dict[str, float],
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "reweight",
) -> DataFrame:
    """Deterministic domain-mixture downsampling: cap each listed domain's
    token contribution at ``target_share × total corpus tokens`` by
    subsampling its documents (rate = min(1, target·total/domain_tokens));
    unlisted domains pass through whole.

    Returns the kept rows with ``sample_rate`` attached. Reproducible —
    the keep decision is ``hash_unit(id, salt) < rate``, so the same
    inputs always select the same documents (and the DuckDB oracle can
    replay the exact choice).

    Scale shape: one aggregate builds the per-domain token totals (a
    domain-count-sized table — the only full pass), the grand total is a
    window over that tiny table, and the rate map is broadcast back onto
    the corpus: the corpus itself is never shuffled.
    """
    tok = token_count(F.col(text_col))
    staged = df.withColumn("_nt", tok)
    totals = staged.groupBy(domain_col).agg(F.sum("_nt").alias("_dt"))
    grand = W.partitionBy()
    target = None
    for dom, share in target_shares.items():
        cond = F.col(domain_col) == dom
        expr = F.least(
            F.lit(1.0), F.lit(share) * F.sum("_dt").over(grand) / F.col("_dt")
        )
        target = F.when(cond, expr) if target is None else target.when(cond, expr)
    rate = F.lit(1.0) if target is None else target.otherwise(F.lit(1.0))
    rates = totals.select(domain_col, rate.alias("sample_rate"))
    return (
        staged.join(F.broadcast(rates), domain_col)
        .filter(hash_unit(F.col(id_col), salt) < F.col("sample_rate"))
        .drop("_nt")
    )


def quantile_threshold_filter(
    df: DataFrame,
    score_col: str,
    q: float = 0.75,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep rows whose score is at or above the corpus ``q``-quantile —
    the "train on the best X% of the corpus" selection step.

    ``exact=True`` uses Spark's exact linear-interpolation ``percentile``
    aggregate (map-side-combined buffer, one scalar out); prefer INTEGER
    score columns with it — integer lo/hi and dyadic q make the
    interpolated threshold exact in binary, so the boundary comparison is
    deterministic cross-engine. At 100 TB exact percentile of a double
    column is still one aggregate pass, but ``exact=False`` switches to
    ``percentile_approx`` (a fixed-size QuantileSummaries sketch) when a
    ±ε threshold is acceptable — same plan shape, bounded memory.

    The threshold is a 1-row broadcast join — the corpus is never
    shuffled; the subsequent filter is a scan-side predicate.
    """
    fn = "percentile" if exact else "percentile_approx"
    arg = f"{score_col}, {q!r}" if exact else f"{score_col}, {q!r}, {accuracy}"
    thr = df.select(F.round(F.expr(f"{fn}({arg})"), 9).alias("_thr"))
    return df.join(F.broadcast(thr)).filter(F.col(score_col) >= F.col("_thr"))


#: power-of-two padded-sequence sizes for batch shape bucketing
LENGTH_BUCKETS: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def length_bucket(token_col: Column | str, buckets: tuple[int, ...] = LENGTH_BUCKETS) -> Column:
    """Smallest bucket >= the token count (overflow clamps to the largest)
    — the padded sequence length this document would occupy in a fixed-
    shape training batch. A pure CASE chain over integer literals: no
    floats, no log2, bit-identical in any engine."""
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    expr = F.lit(buckets[-1])
    for b in reversed(buckets):
        expr = F.when(c <= b, F.lit(b)).otherwise(expr)
    return expr.cast("long")


def length_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    buckets: tuple[int, ...] = LENGTH_BUCKETS,
) -> DataFrame:
    """Padding-waste report per power-of-two length bucket: how many
    documents land in each padded batch shape, and what fraction of the
    padded tokens would be waste. The query a pipeline owner runs before
    choosing packing vs padding (compare with :func:`pack_sequences`).

    One projection + one tiny hash aggregate keyed by bucket (≤ a dozen
    groups, map-side combined) — a map-only pass at any corpus size.
    """
    nt = bpe_ish_token_count(F.col(text_col))
    staged = df.select(nt.alias("_nt"), length_bucket(nt, buckets).alias("bucket"))
    return staged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("actual_tokens"),
        (F.col("bucket") * F.count(F.lit(1))).alias("padded_tokens"),
        F.round(
            1.0 - F.sum("_nt") / (F.col("bucket") * F.count(F.lit(1))), 9,
        ).alias("waste_ratio"),
    )


def temperature_mix_rates(
    df: DataFrame,
    temperature: float = 2.0,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-training
    recipe: p_i ∝ n_i^(1/T) over domain token counts — T>1 flattens the
    mixture toward low-resource domains, T=1 is proportional).

    Rates are normalized by the binding constraint K = min_i(n_i / p_i)
    (the kept-token total at which the scarcest domain is exhausted), so
    no domain ever needs upsampling: rate_i = p_i·K/n_i ≤ 1 with equality
    for the binding domain. Returns one row per domain with its token
    count, tempered share, and sampling rate (rounded to 9 so the
    boundary comparison in :func:`apply_mix_rates` is engine-exact).

    Scale shape: ONE aggregate over the corpus builds the domain-count-
    sized totals table; the share/rate arithmetic is windows over that
    tiny table. The corpus itself is read once and never shuffled.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    alpha = 1.0 / temperature
    totals = df.groupBy(domain_col).agg(F.sum(token_count(F.col(text_col))).alias("n_tokens"))
    over = W.partitionBy()
    tempered = totals.withColumn("_p", F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)))
    share = F.col("_p") / F.sum("_p").over(over)
    staged = tempered.withColumn("share", share)
    k = F.min(F.col("n_tokens") / F.col("share")).over(over)
    return staged.select(
        domain_col,
        "n_tokens",
        F.round("share", 9).alias("share"),
        F.round(F.col("share") * k / F.col("n_tokens"), 9).alias("rate"),
    )


def apply_mix_rates(
    df: DataFrame,
    rates: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tempmix",
) -> DataFrame:
    """Deterministically subsample each domain at its mixture rate:
    keep iff hash_unit(id, salt) < rate. The rates table is domain-count
    sized → broadcast; the corpus filter is scan-side."""
    return df.join(F.broadcast(rates.select(domain_col, "rate")), domain_col).filter(
        hash_unit(F.col(id_col), salt) < F.col("rate"),
    )


def span_corruption(
    df: DataFrame,
    rate_pct: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    sentinel: str = "<X>",
    salt: str = "spancorr",
) -> DataFrame:
    """T5-style span corruption, hash-driven: token ``i`` of a document is
    masked iff ``md5(id:salt:i) % 100 < rate_pct``; runs of adjacent
    masked tokens collapse to ONE sentinel. Returns id, corrupted text,
    and the span statistics (token/masked/span counts, mask fraction).

    Retry- and re-shard-deterministic like every sampler here (the mask
    is a pure function of (document id, position), never RNG), so the
    corrupted corpus is reproducible across engines and runs — the
    property that lets the denoising objective be regenerated instead of
    stored. Pure per-row array expressions: zero shuffle, zero UDFs; the
    whole transform pushes down next to the scan.
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    toks = word_tokens(F.col(text_col))
    key_prefix = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    # sequence(1, 0) would be DESCENDING [1, 0] for an empty document
    # (Spark infers step -1 when start > stop) — guard to an empty index
    idx = F.when(
        F.size(toks) > 0, F.sequence(F.lit(1), F.size(toks))
    ).otherwise(F.array().cast("array<int>"))
    flags = F.transform(
        idx,
        lambda i: md5_long(F.concat_ws(":", key_prefix, i.cast("string"))) % 100
        < rate_pct,
    )
    with_flags = df.select(
        F.col(id_col),
        toks.alias("_t"),
        flags.alias("_m"),
        idx.alias("_i"),
    )
    # NB: element_at(_, i-1) would be index 0 for the first token — an ANSI
    # error even under the OR (no short-circuit in vectorized eval), so the
    # previous index is clamped to 1 and the (i == 1) disjunct decides
    span_start = lambda i: F.element_at("_m", i) & (
        (i == 1) | ~F.element_at("_m", F.greatest(i - 1, F.lit(1)))
    )
    pieces = F.filter(
        F.transform(
            "_i",
            lambda i: F.when(span_start(i), F.lit(sentinel))
            .when(~F.element_at("_m", i), F.element_at("_t", i))
            .otherwise(F.lit(None).cast("string")),
        ),
        lambda x: x.isNotNull(),
    )
    n_masked = F.size(F.filter("_m", lambda m: m))
    n_spans = F.size(F.filter("_i", span_start))
    return with_flags.select(
        id_col,
        F.array_join(pieces, " ").alias("corrupted_text"),
        F.size("_t").cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        n_spans.cast("long").alias("n_spans"),
        F.round(
            n_masked / F.greatest(F.size("_t"), F.lit(1)), 9
        ).alias("mask_frac"),
    )
