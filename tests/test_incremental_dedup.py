"""Cross-batch incremental MinHash dedup (`llm/dedup.py
minhash_signature_store` / `incremental_minhash_dedup`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from onetl_spark.llm.dedup import (
    incremental_minhash_dedup,
    minhash_signature_store,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the rain falls softly outside"
)
_NEAR = _BASE.replace("lazy dog", "sleepy dog")  # near-dup of _BASE
_OTHER = (
    "completely different subject matter entirely unrelated to animals "
    "this text discusses quarterly financial projections and revenue"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verdicts_three_way(spark):
    history = _docs(spark, [(1, _BASE), (2, _OTHER)])
    batch = _docs(
        spark,
        [
            (10, _NEAR),      # near-dup of history doc 1
            (11, "brand new text about gardening tulips and daffodils in spring"),
            (12, "brand new text about gardening tulips and daffodils in spring"),
        ],
    )
    store = minhash_signature_store(history)
    out = {r["doc_id"]: r for r in incremental_minhash_dedup(batch, store).collect()}
    assert out[10]["verdict"] == "dup_of_history" and out[10]["match_id"] == 1
    assert 0.5 <= out[10]["est_jaccard"] <= 1.0
    assert out[11]["verdict"] == "fresh" and out[11]["match_id"] is None
    # exact duplicate within the batch: the LATER id is the dup, the
    # earlier copy is the surviving fresh row
    assert out[12]["verdict"] == "dup_in_batch" and out[12]["match_id"] == 11
    assert out[12]["est_jaccard"] == 1.0


def test_history_takes_precedence_over_batch(spark):
    history = _docs(spark, [(1, _BASE)])
    batch = _docs(spark, [(10, _BASE), (11, _BASE)])  # both match history AND each other
    store = minhash_signature_store(history)
    out = {r["doc_id"]: r for r in incremental_minhash_dedup(batch, store).collect()}
    assert out[10]["verdict"] == "dup_of_history" and out[10]["match_id"] == 1
    assert out[11]["verdict"] == "dup_of_history" and out[11]["match_id"] == 1


def test_two_increment_pipeline(spark):
    """The HWM shape: fresh signatures from increment 1 extend the store;
    increment 2 then matches against them as history."""
    history = _docs(spark, [(1, _OTHER)])
    store = minhash_signature_store(history)
    inc1 = _docs(spark, [(10, _BASE)])
    v1 = incremental_minhash_dedup(inc1, store)
    assert v1.collect()[0]["verdict"] == "fresh"
    # persist the increment: store ∪ fresh signatures
    fresh_ids = [r["doc_id"] for r in v1.filter("verdict = 'fresh'").collect()]
    sigs1 = minhash_signature_store(inc1).filter(F.col("doc_id").isin(fresh_ids))
    store2 = store.unionAll(sigs1)
    inc2 = _docs(spark, [(20, _NEAR)])
    v2 = incremental_minhash_dedup(inc2, store2).collect()[0]
    assert v2["verdict"] == "dup_of_history" and v2["match_id"] == 10


def test_signature_store_shape(spark):
    store = minhash_signature_store(_docs(spark, [(1, _BASE), (2, _OTHER)]))
    rows = store.collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(len(r["sig"]) == 32 for r in rows)


def test_threshold_filters_weak_matches(spark):
    history = _docs(spark, [(1, _BASE)])
    store = minhash_signature_store(history)
    # shares a few words but well under 0.9 signature agreement
    weak = _docs(spark, [(10, "the quick brown fox discusses revenue projections")])
    out = incremental_minhash_dedup(weak, store, threshold=0.9).collect()[0]
    assert out["verdict"] == "fresh"


def test_foreach_batch_fn_bootstrap_then_verdicts(spark, tmp_path):
    """The streaming foreachBatch callback: batch 0 seeds the store with
    no verdicts; batch 1 emits verdicts against it and appends only the
    fresh signatures; batch 2 then matches batch-1 fresh docs as
    history — the store is a real cross-batch accumulator."""
    import os

    from onetl_spark.streaming.incremental import incremental_dedup_batch_fn

    store = str(tmp_path / "store")
    sink = str(tmp_path / "verdicts")
    fn = incremental_dedup_batch_fn(store, sink)

    fn(_docs(spark, [(1, _BASE), (2, _OTHER)]), 0)  # bootstrap
    assert not os.path.exists(sink)
    assert spark.read.parquet(os.path.join(store, "sigs")).count() == 2

    fresh_text = "entirely novel content about deep sea exploration vessels"
    fn(_docs(spark, [(10, _NEAR), (11, fresh_text)]), 1)
    v = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    assert v[10]["verdict"] == "dup_of_history" and v[10]["match_id"] == 1
    assert v[11]["verdict"] == "fresh"
    # only the fresh signature extended the store
    assert spark.read.parquet(os.path.join(store, "sigs")).count() == 3

    fn(_docs(spark, [(20, fresh_text)]), 2)
    v2 = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    assert v2[20]["verdict"] == "dup_of_history" and v2[20]["match_id"] == 11


def test_foreach_batch_store_probe_is_filesystem_agnostic(spark, tmp_path):
    """The store-exists probe must work for URI-style Hadoop paths, not
    just driver-local filesystem paths: with a ``file://`` store URI an
    ``os.path.isdir`` probe reports "missing" on every batch and the
    bootstrap branch OVERWRITES the accumulated store — silent data
    loss. Batch 1 must take the verdict branch, not re-seed."""
    from onetl_spark.streaming.incremental import incremental_dedup_batch_fn

    store = "file://" + str(tmp_path / "store")
    sink = str(tmp_path / "verdicts")
    fn = incremental_dedup_batch_fn(store, sink)

    fn(_docs(spark, [(1, _BASE)]), 0)  # bootstrap via the file:// URI
    assert spark.read.parquet(store + "/sigs").count() == 1

    fn(_docs(spark, [(10, _NEAR), (11, _OTHER)]), 1)
    v = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    assert v[10]["verdict"] == "dup_of_history" and v[10]["match_id"] == 1
    assert v[11]["verdict"] == "fresh"
    # the store ACCUMULATED (1 seed + 1 fresh) — it was not re-seeded
    assert spark.read.parquet(store + "/sigs").count() == 2
