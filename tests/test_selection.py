"""DSIR importance-resampling selection operators (`llm/selection.py`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from onetl_spark.llm.selection import (
    bucket_log_ratio,
    dsir_importance,
    dsir_select,
    hashed_ngram_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_features_counts_and_range(spark):
    """'a b a' → unigrams [1|a ×2, 1|b] + bigrams [2|a b, 2|b a]: 5 features
    total, every bucket inside [0, B)."""
    df = _docs(spark, [(1, "a b a")])
    feats = hashed_ngram_features(df, buckets=64).collect()
    assert sum(r["cnt"] for r in feats) == 5
    assert all(0 <= r["bucket"] < 64 for r in feats)
    # determinism: same text, same buckets
    again = hashed_ngram_features(_docs(spark, [(1, "a b a")]), buckets=64).collect()
    assert sorted((r["bucket"], r["cnt"]) for r in feats) == sorted(
        (r["bucket"], r["cnt"]) for r in again
    )


def test_bucket_log_ratio_hand_case(spark):
    """Single shared bucket arithmetic: target = {x:2}, raw = {x:2, y:1}
    with B buckets — ratios must match the add-1 closed form."""
    b = 16
    target = _docs(spark, [(1, "x x")])
    raw = _docs(spark, [(1, "x x"), (2, "y")])
    # unigram-only texts: 'x x' contributes bigram '2|x x' too; compute the
    # expected values from the actual feature relations instead of by hand
    tf = hashed_ngram_features(target, buckets=b)
    rf = hashed_ngram_features(raw, buckets=b)
    t_counts = {r["bucket"]: r["cnt"] for r in tf.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()}
    r_counts = {r["bucket"]: r["cnt"] for r in rf.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()}
    T, R = sum(t_counts.values()), sum(r_counts.values())
    out = {r["bucket"]: r for r in bucket_log_ratio(tf, rf, buckets=b).collect()}
    # the fitted table covers the FULL bucket space: unseen buckets carry
    # the pure-smoothing ratio so out-of-sample scoring never drops terms
    assert set(out) == set(range(b))
    for bucket, row in out.items():
        expect = round(
            math.log((t_counts.get(bucket, 0) + 1) / (T + b))
            - math.log((r_counts.get(bucket, 0) + 1) / (R + b)),
            9,
        )
        assert row["log_ratio"] == pytest.approx(expect, abs=1e-12)
        assert row["target_cnt"] == t_counts.get(bucket, 0)
        assert row["raw_cnt"] == r_counts.get(bucket, 0)


def test_importance_orders_target_like_docs_first(spark):
    """Docs made of target-domain tokens must outscore docs of pool-only
    tokens — the defining DSIR property."""
    target = _docs(spark, [(100, "alpha beta alpha beta alpha")])
    raw = _docs(
        spark,
        [
            (1, "alpha beta alpha beta"),   # target-like
            (2, "zeta omega zeta omega"),   # pool-only
        ],
    )
    rf = hashed_ngram_features(raw)
    ratio = bucket_log_ratio(hashed_ngram_features(target), rf)
    scores = {r["doc_id"]: r["log_weight"] for r in dsir_importance(rf, ratio).collect()}
    assert scores[1] > scores[2]


def test_dsir_select_topk_and_determinism(spark):
    scores = spark.createDataFrame(
        [(i, 10, float(i % 7)) for i in range(40)],
        "doc_id long, n_feats long, log_weight double",
    )
    sel = dsir_select(scores, k=10)
    rows = sel.collect()
    assert len(rows) == 10
    # reproducible: the same call returns the identical id set
    again = {r["doc_id"] for r in dsir_select(scores, k=10).collect()}
    assert {r["doc_id"] for r in rows} == again
    # a different salt draws a different sample (overwhelmingly likely on 40 ids)
    other = {r["doc_id"] for r in dsir_select(scores, k=10, salt="other").collect()}
    assert again != other
    # temperature → 0 approaches exact top-k by weight: with T tiny the
    # weight term dominates the bounded Gumbel noise
    cold = {r["doc_id"] for r in dsir_select(scores, k=10, temperature=1e-6).collect()}
    top_by_weight = {
        r["doc_id"]
        for r in scores.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(10).collect()
    }
    assert cold == top_by_weight


def test_validation_errors(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        hashed_ngram_features(df, buckets=0)
    scores = spark.createDataFrame([(1, 1, 0.0)], "doc_id long, n_feats long, log_weight double")
    with pytest.raises(ValueError):
        dsir_select(scores, k=0)
    with pytest.raises(ValueError):
        dsir_select(scores, k=1, temperature=0.0)


def test_empty_target_corpus_degrades_to_smoothing(spark):
    """An empty target corpus must yield finite pure-smoothing ratios
    (totals coalesce to 0), not NULL scores that scramble selection."""
    b = 16
    raw = _docs(spark, [(1, "x x"), (2, "y")])
    rf = hashed_ngram_features(raw, buckets=b)
    empty = rf.filter(F.lit(False))
    ratio = bucket_log_ratio(empty, rf, buckets=b)
    rows = ratio.collect()
    assert len(rows) == b
    assert all(r["log_ratio"] is not None for r in rows)
    scores = dsir_importance(rf, ratio).collect()
    assert scores and all(r["log_weight"] is not None for r in scores)


def test_out_of_sample_scoring_keeps_unseen_bucket_terms(spark):
    """Scoring a corpus the model was NOT fitted on must include the
    smoothed contribution of buckets unseen at fit time."""
    b = 64
    fit = _docs(spark, [(1, "x x")])
    ff = hashed_ngram_features(fit, buckets=b)
    ratio = bucket_log_ratio(ff, ff, buckets=b)
    new = _docs(spark, [(9, "zebra quark")])
    nf = hashed_ngram_features(new, buckets=b)
    fit_buckets = {r["bucket"] for r in ff.select("bucket").collect()}
    new_buckets = {r["bucket"] for r in nf.select("bucket").collect()}
    assert new_buckets - fit_buckets, "test needs genuinely unseen buckets"
    out = dsir_importance(nf, ratio).collect()
    assert len(out) == 1
    # every feature of the new doc contributes (n_feats complete)
    assert out[0]["n_feats"] == sum(r["cnt"] for r in nf.collect())
