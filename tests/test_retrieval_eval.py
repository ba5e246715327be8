"""Retrieval-eval operators: hand-checkable recall/MRR/quantization cases."""

from __future__ import annotations

import math

import pytest

from onetl_spark.llm.retrieval_eval import (
    mrr_eval,
    probe_sweep,
    quantization_ledger,
    recall_by_slice,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


@pytest.fixture(scope="module")
def planted(spark):
    """Two well-separated unit-vector clusters in 4-d, one centroid
    planted INSIDE each cluster (ids 0 and 100 via the filter
    ``vec_id % 100 = 0``), so IVF assignment is unambiguous and every
    expected recall/rank value is hand-computable.

    Cluster A (ids 0..4): e1-dominant; cluster B (ids 100..104):
    e3-dominant. Within a cluster, similarity to the query falls off
    with index distance (each member rotated slightly more), so exact
    top-k order is known by construction.
    """
    def unit(x, y, z, w):
        n = math.sqrt(x * x + y * y + z * z + w * w)
        return [x / n, y / n, z / n, w / n]

    rows = []
    for i in range(5):
        rows.append((i, unit(1.0, 0.02 * i, 0.0, 0.0), 0))
    for i in range(5):
        rows.append((100 + i, unit(0.0, 0.0, 1.0, 0.02 * i), 1))
    return _emb(spark, rows)


def test_recall_by_slice_perfect_when_probe_covers_cluster(spark, planted):
    """With one centroid per cluster and queries probing their own
    cluster, candidates = the query's whole cluster = the exact top-k
    universe (k >= cluster size - 1) -> recall 1.0 for every slice."""
    out = {
        r["slice"]: r
        for r in recall_by_slice(
            planted, "vec_id % 2 = 1", k=3,
            slice_col="label", centroid_filter="vec_id % 100 = 0",
        ).collect()
    }
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["mean_recall"] == pytest.approx(1.0)
        assert r["min_recall"] == pytest.approx(1.0)
    assert out[0]["n_queries"] == 2 and out[1]["n_queries"] == 2


def test_recall_by_slice_cross_cluster_miss(spark):
    """A query whose true NN set lives in the UNPROBED cell must lose
    recall: plant one centroid only (all corpus assigned there), panel
    query in the other region still probes that single cell, so the
    approximate list equals the exact list -> recall 1; but with two
    cells and a panel vector sitting between them biased to cell A while
    its true neighbours sit in cell B, recall collapses to 0."""
    def unit(x, y):
        n = math.sqrt(x * x + y * y)
        return [x / n, y / n, 0.0, 0.0]

    rows = [
        (0, unit(1.0, 0.0), 0),        # centroid A
        (100, unit(0.0, 1.0), 1),      # centroid B
        (7, unit(0.9, 0.45), 0),       # panel query: cos closer to A
        (101, unit(0.05, 1.0), 1),     # B-cluster members = its true NNs
        (102, unit(0.1, 1.0), 1),
    ]
    emb = _emb(spark, rows)
    out = {
        r["slice"]: r
        for r in recall_by_slice(
            emb, "vec_id = 7", k=2, slice_col="label",
            centroid_filter="vec_id % 100 = 0",
        ).collect()
    }
    # query 7's exact top-2 are 101/102? cos(7,101/102) < cos(7,0) since 7
    # leans toward A — its exact list is {0, 102-or-101}; single-probe A
    # yields candidates = A's members only. Recall must be strictly < 1.
    assert out[0]["mean_recall"] < 1.0


def test_mrr_rank_and_miss(spark, planted):
    """The true NN of each panel member is its index neighbour inside
    its own cluster (similarity falls off with index distance), which
    single-probe IVF finds at rank 1 -> rr = 1. A query whose cell
    excludes the NN gets rr = 0 (miss is reported, not dropped)."""
    out = {r["query_id"]: r for r in mrr_eval(
        planted, "vec_id % 2 = 1", k=3, centroid_filter="vec_id % 100 = 0",
    ).collect()}
    assert set(out) == {1, 3, 101, 103}
    for r in out.values():
        assert r["approx_rank"] == 1 and r["rr"] == pytest.approx(1.0)


def test_quantization_ledger_shares_and_losses(spark, planted):
    out = {r["centroid_id"]: r for r in quantization_ledger(
        planted, centroid_filter="vec_id % 100 = 0",
    ).collect()}
    assert set(out) == {0, 100}
    assert out[0]["n_vecs"] == 5 and out[100]["n_vecs"] == 5
    assert out[0]["corpus_share"] == pytest.approx(0.5)
    # centroid is a cluster member: its own loss is 0, so min of the cell
    # loss must be 0 <= mean < max, and losses tiny for tight clusters
    for r in out.values():
        assert 0.0 <= r["mean_loss"] <= r["max_loss"] < 0.01


def test_probe_sweep_monotone_recall(spark):
    """Recall@k must be non-decreasing in nprobe (more cells scanned can
    only add candidates), reaching 1.0 when every cell is probed."""
    def unit(x, y, z):
        n = math.sqrt(x * x + y * y + z * z)
        return [x / n, y / n, z / n, 0.0]

    rows, label = [], 0
    # three separated clusters; centroids = ids 0, 100, 200
    for base, axis in ((0, (1, 0, 0)), (100, (0, 1, 0)), (200, (0, 0, 1))):
        for i in range(4):
            v = [axis[0], axis[1], axis[2]]
            rows.append((base + i, unit(v[0], v[1] + 0.02 * i, v[2] + 0.01 * i), label))
        label += 1
    emb = _emb(spark, rows)
    out = {r["nprobe"]: r["mean_recall"] for r in probe_sweep(
        emb, "vec_id % 100 = 2", k=5, probes=(1, 2, 3),
        centroid_filter="vec_id % 100 = 0",
    ).collect()}
    assert sorted(out) == [1, 2, 3]
    assert out[1] <= out[2] <= out[3] == pytest.approx(1.0)


def test_probe_sweep_validates_probes(spark, planted):
    with pytest.raises(ValueError, match="probes"):
        probe_sweep(planted, "vec_id % 2 = 1", probes=())
    with pytest.raises(ValueError, match="probes"):
        probe_sweep(planted, "vec_id % 2 = 1", probes=(0, 2))


def test_recall_by_slice_consistent_with_ivf_recall_eval(spark, testdata):
    """Cross-operator invariant on real testdata: the query-count-weighted
    mean of per-slice recalls must equal the plain mean of
    ivf_recall_eval's per-query recalls for the same panel, k, and
    centroid set — the slice breakdown is a partition of the same
    measurements, not a different metric."""
    from onetl_spark.llm.similarity import ivf_recall_eval

    emb = spark.table("embeddings")
    panel_ids = [r["vec_id"] for r in emb.filter("vec_id % 25 = 3").select("vec_id").collect()]
    per_query = ivf_recall_eval(emb, panel_ids, k=5).collect()
    overall = sum(r["recall"] for r in per_query) / len(per_query)

    sliced = recall_by_slice(emb, "vec_id % 25 = 3", k=5, slice_col="label").collect()
    weighted = sum(r["mean_recall"] * r["n_queries"] for r in sliced) / sum(
        r["n_queries"] for r in sliced
    )
    assert sum(r["n_queries"] for r in sliced) == len(per_query)
    assert abs(weighted - overall) < 1e-9


def test_banded_near_dup_finds_planted_duplicates(spark):
    """Identical vectors share every band bucket, so exact duplicates are
    found with recall 1 regardless of plane draw; orthogonal vectors at
    cos 0 never pass the threshold."""
    import math

    from onetl_spark.llm.similarity import banded_near_dup_pairs

    def unit(*xs):
        n = math.sqrt(sum(x * x for x in xs))
        return [x / n for x in xs]

    base = unit(1.0, 0.2, 0.0, 0.3)
    near = unit(1.0, 0.21, 0.01, 0.3)     # cosine ~0.9998
    rows = [
        (1, base, 0), (2, list(base), 0),  # exact duplicate pair
        (3, near, 0),                      # near-duplicate of 1/2
        (4, unit(0.0, 0.0, 1.0, 0.0), 1),  # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r["a_id"], r["b_id"]): r["cos_sim"] for r in banded_near_dup_pairs(
        emb, threshold=0.9, bands=6, planes_per_band=4, dim=4,
    ).collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    # pairs are unordered-unique and never include the unrelated vector
    assert all(a < b for a, b in got)
    assert not any(4 in pair for pair in got)


def test_banded_near_dup_bucket_cap_drops_and_logs(spark, caplog):
    """A mass-duplicated region must hit the logged cap, not the
    quadratic self-join: 30 identical vectors with cap 10 -> their bucket
    is dropped in every band and no pairs return (recall knob, loudly)."""
    import logging

    from onetl_spark.llm.similarity import banded_near_dup_pairs

    rows = [(i, [1.0, 0.5, 0.25, 0.125], 0) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with caplog.at_level(logging.WARNING):
        out = banded_near_dup_pairs(
            emb, threshold=0.5, bands=4, planes_per_band=4,
            max_bucket_size=10, dim=4,
        ).collect()
    assert out == []
    assert any("dropped" in r.message for r in caplog.records)


def test_banded_near_dup_validation(spark):
    from onetl_spark.llm.similarity import banded_near_dup_pairs

    emb = spark.createDataFrame([(1, [1.0], 0)], "vec_id long, embedding array<float>, label int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        banded_near_dup_pairs(emb, bands=0)
