"""Importance-resampling data selection (DSIR-style).

Implements the hashed n-gram importance-resampling recipe of Xie et al.,
"Data Selection for Language Models via Importance Resampling" (NeurIPS
2023): featurize every document into hashed n-gram bucket counts, fit two
smoothed bag-of-words distributions — a TARGET corpus (the high-quality
domain you want more of) and the RAW pool — and score each raw document
by its log importance weight  log w(x) = Σ_b c_b(x) · (log p_b − log q_b).
Selection is a deterministic Gumbel top-k over the weights, which is the
exchangeable-sample equivalent of sampling without replacement with
probability ∝ w(x)^(1/T).

This is a different operation from the corpus-self LM scores in
``llm/text.py`` (``unigram_logprob_scores`` ranks by a single
distribution; DSIR CONTRASTS two) and from ``sampling.reweight_domains``
(which reweights labelled groups; DSIR scores each document
individually from its content).

Scale posture (100 TB):
- Featurization is SHUFFLE-FREE: per-doc bucket arrays are sorted and
  run-length encoded inside the row (scan → project → generate — a
  (doc, bucket) groupBy would have almost no map-side reduction and
  degenerate into a spill-prone corpus-sized partial aggregate). The
  bucket space is a FIXED size B (default 4096), so the model relation
  never grows with the corpus.
- ``bucket_log_ratio`` reduces both corpora to B-row aggregates; the
  only broadcasts are the two 1-row totals and the final B-row ratio
  table — never the corpus.
- ``dsir_importance`` joins the B-row ratio table broadcast-side onto
  the per-doc features: one shuffle (the groupBy back to doc grain).
- ``dsir_select`` is a global ``orderBy().limit(k)`` → Catalyst's
  TakeOrderedAndProject: per-partition bounded heaps, no global sort,
  no single-partition window.

Float determinism: per-bucket log-ratios are rounded to ``scale`` dp
BEFORE the per-doc weighted sum, which runs in bounded-precision
decimals (decimal(20,s) × decimal(10,0)) exactly as
``text.unigram_logprob_scores`` does — bit-stable across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onetl_spark.llm.sampling import hash_unit
from onetl_spark.llm.text import md5_long, word_tokens
from onetl_spark.spark_utils import widen_small_scan

__all__ = [
    "hashed_ngram_features",
    "bucket_log_ratio",
    "dsir_importance",
    "dsir_select",
]

DEFAULT_BUCKETS = 4096


def _feature_terms(tokens_col: Column) -> Column:
    """Unigram and bigram feature strings over a MATERIALIZED token-array
    column, namespaced so a unigram can never collide with a bigram of
    the same spelling: ``1|w`` and ``2|w1 w2``.

    The argument must be a plain column reference, not the tokenizer
    expression itself: ``element_at`` runs once per bigram index, and an
    inlined ``split(lower(text))`` argument re-tokenizes the document on
    EVERY access — O(tokens²) regex work per doc (measured 13 s → 1 s on
    5k docs when the array is projected first)."""
    w = tokens_col
    unis = F.transform(w, lambda x: F.concat(F.lit("1|"), x))
    bis = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat(
                F.lit("2|"), F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(unis, bis)


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Hashed unigram+bigram bucket counts per document:
    ``(id_col, *carry_cols, bucket, cnt)``.

    Buckets come from ``md5_long(term) % buckets`` (md5_long is always
    non-negative, so plain ``%`` matches across engines). Explode →
    groupBy(doc, bucket); linear in corpus size, output bounded by
    min(tokens, B) rows per document. An in-row run-length-encoding
    variant (zero exchanges) was tried and REVERTED: only a Generate
    blocks CollapseProject, so the sorted bucket array inlines into
    every element_at of the RLE lambdas — O(tokens²) re-sorts per doc
    (measured: array_sort ×45 in the optimized plan). The explode path
    keeps the multi-use token array safely under a Generate.

    ``carry_cols`` rides per-document constant columns (a domain label,
    a pool flag) through the aggregate so a caller can featurize ONCE
    and derive both the target and raw model inputs by filtering —
    tokenization is the pipeline's hot loop, and the DSIR recipe is
    featurize-once / fit / score, not three corpus passes.
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    carry = list(carry_cols or [])
    base = widen_small_scan(df.select(F.col(id_col), *carry, F.col(text_col)))
    # Staged projections: every lambda below does element_at on a column
    # materialized by the PREVIOUS stage (CollapseProject keeps multi-use
    # non-trivial aliases un-inlined) — an inlined expression re-runs per
    # element access, O(tokens²) per doc (measured 13 s → 1 s on 5k docs).
    toks = base.select(F.col(id_col), *carry, word_tokens(F.col(text_col)).alias("_w"))
    terms = toks.select(
        F.col(id_col), *carry, F.explode(_feature_terms(F.col("_w"))).alias("_t")
    )
    return (
        terms.withColumn("bucket", md5_long(F.col("_t")) % F.lit(buckets))
        .groupBy(id_col, *carry, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    scale: int = 9,
) -> DataFrame:
    """Per-bucket smoothed log importance ratio:
    ``(bucket, target_cnt, raw_cnt, log_ratio)`` with

        log_ratio = ln((t_b + 1) / (T + B)) − ln((r_b + 1) / (R + B))

    (add-1 smoothing over the fixed B-bucket space). Inputs are the
    ``hashed_ngram_features`` relations of the target and raw corpora.

    Emits ALL ``B`` buckets, not just the observed ones: add-1 smoothing
    assigns unseen buckets the nonzero ratio ``ln((R+B)/(T+B))``, and a
    fitted table restricted to observed buckets would silently DROP those
    terms when scoring a corpus the model was not fitted on (the
    production shape: fit once, score new pools — an inner bucket join in
    :func:`dsir_importance` is complete because every bucket is present).
    An EMPTY corpus likewise degrades to pure smoothing (totals coalesce
    to 0) instead of nulling every ratio.

    Both sides reduce to ≤B rows broadcast onto the static bucket range;
    the two grand totals ride along as 1-row broadcast crossJoins. The
    log is rounded to ``scale`` dp here — downstream sums then add
    identical decimals on every engine.
    """
    # Materialize the two ≤B-row bucket aggregates: each is consumed
    # twice (the ratio join and its grand total) and a lazy reference
    # would re-derive it from a fresh corpus scan — localCheckpoint caps
    # the whole ratio build at exactly one scan per corpus (measured:
    # 8 corpus-scale scans → 3 for the full score pipeline).
    t = (
        target_feats.groupBy("bucket")
        .agg(F.sum("cnt").alias("target_cnt"))
        .localCheckpoint(eager=False)
    )
    r = (
        raw_feats.groupBy("bucket")
        .agg(F.sum("cnt").alias("raw_cnt"))
        .localCheckpoint(eager=False)
    )
    t_total = t.select(F.coalesce(F.sum("target_cnt"), F.lit(0)).alias("_T"))
    r_total = r.select(F.coalesce(F.sum("raw_cnt"), F.lit(0)).alias("_R"))
    spark = target_feats.sparkSession
    all_buckets = spark.range(buckets).select(F.col("id").alias("bucket"))
    joined = (
        all_buckets.join(F.broadcast(t), "bucket", "left")
        .join(F.broadcast(r), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("target_cnt", F.lit(0)).alias("target_cnt"),
            F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
        )
        .join(F.broadcast(t_total))
        .join(F.broadcast(r_total))
    )
    b = F.lit(float(buckets))
    log_ratio = F.round(
        F.log((F.col("target_cnt") + 1) / (F.col("_T") + b))
        - F.log((F.col("raw_cnt") + 1) / (F.col("_R") + b)),
        scale,
    )
    return joined.select(
        "bucket", "target_cnt", "raw_cnt", log_ratio.alias("log_ratio")
    )


def dsir_importance(
    doc_feats: DataFrame,
    ratio: DataFrame,
    id_col: str = "doc_id",
    scale: int = 9,
) -> DataFrame:
    """Per-document log importance weight:
    ``(id_col, n_feats, log_weight)`` where

        log_weight = Σ_b cnt_b · log_ratio_b

    ``ratio`` (B rows — :func:`bucket_log_ratio` emits the full bucket
    space, so the inner join is complete for any corpus) is broadcast
    onto the per-doc features; the only shuffle is the groupBy back to
    document grain. The weighted sum runs in bounded-precision decimals
    (decimal(20,s) × decimal(10,0) keeps scale exactly within 38
    digits) — order-independent, engine-exact.

    Documents with no tokens (empty or NULL text) have no feature rows
    and therefore no output row here — their mathematical weight is 0,
    but this operator cannot know the id universe; left-join these
    scores from the pool if empty documents must stay selectable.
    """
    joined = doc_feats.join(F.broadcast(ratio.select("bucket", "log_ratio")), "bucket")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.round(
                F.sum(
                    F.col("log_ratio").cast(f"decimal(20,{scale})")
                    * F.col("cnt").cast("decimal(10,0)")
                ).cast("double"),
                scale,
            ).alias("log_weight"),
        )
    )


def dsir_select(
    scores: DataFrame,
    k: int,
    id_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "dsir-gumbel",
    scale: int = 9,
) -> DataFrame:
    """Deterministic Gumbel top-k selection over log importance weights:
    keep the k rows with the largest ``log_weight / temperature + g`` where
    ``g = −ln(−ln(u))`` and ``u`` is a hash-derived uniform per document
    (Gumbel-max — equivalent to sampling without replacement with
    probability ∝ exp(log_weight / T), but embarrassingly parallel and
    reproducible: no RNG state, same sample on any cluster).

    Adds ``gumbel_key`` (rounded to ``scale`` dp, the ordering key).
    The top-k is ``orderBy(...).limit(k)`` — Catalyst compiles that to
    TakeOrderedAndProject (per-partition bounded heaps, k·partitions
    rows moved), NOT a global sort: a partition-less row_number window
    would funnel the whole corpus through one task (Spark only inserts
    WindowGroupLimit for windows WITH a partition spec).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = hash_unit(F.col(id_col), salt)
    # u ∈ [0, 1): guard the u == 0 atom (−ln(−ln(0)) = −ln(inf) = −inf is
    # well-defined but drags one doc to the bottom deterministically;
    # nudging to the bucket midpoint keeps the draw strictly interior)
    u_safe = F.when(u > 0, u).otherwise(F.lit(5e-7))
    key = F.round(
        F.col("log_weight") / F.lit(float(temperature)) - F.log(-F.log(u_safe)),
        scale,
    )
    keyed = scores.withColumn("gumbel_key", key)
    return keyed.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(k)
