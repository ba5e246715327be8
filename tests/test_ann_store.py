"""Unit tests for `llm/ann_store.py` / `streaming/ann_store.py` — the
incremental centroid store. The fold arithmetic is exact by design, so
the tests assert EXACT equalities (merge associativity, whole-corpus
consistency, streaming/batch agreement), not tolerances.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from onetl_spark.llm.ann_store import (
    assign_to_centroids,
    centroid_seed_store,
    fold_into_store,
    incremental_ann_assign,
    incremental_ann_report,
    store_centroids,
    _pts,
)

DIM = 4


@pytest.fixture(scope="module")
def emb(spark):
    # 4 tight clusters around unit corners so assignments are unambiguous
    corners = [
        [10.0, 0.0, 0.0, 0.0],
        [0.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 0.0],
        [0.0, 0.0, 0.0, 10.0],
    ]
    rows = []
    for i in range(48):
        c = corners[i % 4]
        rows.append(
            Row(vec_id=i, embedding=[v + 0.125 * ((i // 4) % 3) for v in c])
        )
    return spark.createDataFrame(rows)


def test_seed_store_shape_and_values(emb):
    pts = _pts(emb, "vec_id", "embedding")
    store = centroid_seed_store(pts.filter("_id % 3 = 0"), k=4).collect()
    assert len(store) == 4 * DIM
    assert all(r["cnt"] == 1 for r in store)
    # seeds are the 4 smallest ids with id%3=0 → 0,3,6,9
    cents = {r["cluster"] for r in store}
    assert cents == {0, 1, 2, 3}


def test_assignment_is_argmin_with_index_tiebreak(emb):
    pts = _pts(emb, "vec_id", "embedding")
    store = centroid_seed_store(pts, k=4)
    a = assign_to_centroids(pts, store_centroids(store)).collect()
    assert len(a) == 48
    # seeds 0..3 sit exactly on the four corners (offset 0), so every
    # vector joins the centroid of its own corner
    for r in a:
        assert r["cluster"] == r["_id"] % 4, r


def test_fold_is_exactly_mergeable(emb):
    """Folding batches one at a time == folding the union once — the
    associativity that makes the store correct across any batch split."""
    pts = _pts(emb, "vec_id", "embedding")
    store0 = centroid_seed_store(pts.filter("_id % 3 = 0"), k=4)
    cents = store_centroids(store0)
    a01 = assign_to_centroids(pts.filter("_id % 2 = 0"), cents)
    a02 = assign_to_centroids(pts.filter("_id % 2 = 1"), cents)
    a_all = assign_to_centroids(pts, cents)
    two_step = fold_into_store(a02, fold_into_store(a01, store0)).collect()
    one_step = fold_into_store(a_all, store0).collect()
    assert sorted(map(tuple, two_step)) == sorted(map(tuple, one_step))


def test_incremental_assign_covers_corpus_once(emb):
    v = incremental_ann_assign(emb, n_batches=3, k=4)
    rows = v.collect()
    assert len(rows) == 48
    assert {r["batch_id"] for r in rows} == {0, 1, 2}
    assert len({r["vec_id"] for r in rows}) == 48
    assert all(r["dist"] >= 0.0 for r in rows)


def test_report_shares_and_running_means(emb):
    v = incremental_ann_assign(emb, n_batches=3, k=4)
    rep = incremental_ann_report(v).collect()
    by_batch: dict = {}
    for r in rep:
        by_batch.setdefault(r["batch_id"], []).append(r)
    for t, rs in by_batch.items():
        assert sum(r["n_assigned"] for r in rs) == 16
        assert abs(sum(r["batch_share"] for r in rs) - 1.0) < 1e-6
    # cum_n telescopes per cluster
    per_cluster: dict = {}
    for r in sorted(rep, key=lambda r: (r["cluster"], r["batch_id"])):
        prev = per_cluster.get(r["cluster"], 0)
        assert r["cum_n"] == prev + r["n_assigned"]
        per_cluster[r["cluster"]] = r["cum_n"]
        if r["drift_ratio"] is not None:
            assert r["drift_ratio"] >= 0.0


def test_streaming_matches_batch_operator(spark, emb, tmp_path):
    """The foreachBatch pipeline must reproduce the batch operator's
    verdicts EXACTLY when replaying the same id%3 split."""
    from onetl_spark.streaming.ann_store import ann_index_batch_fn

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    for t in range(3):
        emb.filter(F.col("vec_id") % 3 == t).coalesce(1).write.parquet(
            os.path.join(src, f"b{t}")
        )
    fn = ann_index_batch_fn(
        os.path.join(str(tmp_path), "store"),
        os.path.join(str(tmp_path), "verdicts"),
        k=4,
    )
    for t in range(3):
        fn(spark.read.parquet(os.path.join(src, f"b{t}")), t)
    got = sorted(
        map(tuple, spark.read.parquet(os.path.join(str(tmp_path), "verdicts")).collect())
    )
    want = sorted(map(tuple, incremental_ann_assign(emb, n_batches=3, k=4).collect()))
    assert got == want


def test_streaming_bootstrap_not_retaken_for_existing_store(spark, emb, tmp_path):
    """Batch 1 must fold into the EXISTING store, not re-seed it: after
    two batches the store counts cover both batches plus the seeds."""
    from onetl_spark.streaming.ann_store import ann_index_batch_fn

    store_dir = os.path.join(str(tmp_path), "store")
    fn = ann_index_batch_fn(store_dir, os.path.join(str(tmp_path), "v"), k=4)
    b0 = emb.filter(F.col("vec_id") % 3 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 1)
    fn(b0, 0)
    fn(b1, 1)
    store = spark.read.parquet(store_dir + "/moments")
    total = store.groupBy("dim").agg(F.sum("cnt").alias("c")).collect()
    # 4 seeds + 16 batch-0 + 16 batch-1 members per dim
    assert all(r["c"] == 4 + 16 + 16 for r in total)
