"""Streaming cross-batch incremental dedup: the `llm/dedup.py
incremental_minhash_dedup` batch operator run as a continuous ingest
pipeline via ``foreachBatch`` with an EXTERNAL persisted signature store.

This is the production shape of the daily-ingest dedup loop: each
micro-batch of new documents is scored against the store accumulated
from every previous batch, its verdicts land in a sink, and only the
FRESH documents' signatures extend the store — the corpus text is never
re-read, the store grows by ~256 bytes per surviving document, and the
whole loop is exactly the batch operator's semantics applied per batch
(foreachBatch hands over a plain batch DataFrame, so there is no state
store to bound: the "state" is the parquet store itself, shared with any
batch consumer of :func:`minhash_signature_store`).

Bootstrap: when the store does not exist yet, the first micro-batch
seeds it (its documents are by definition the first ever seen — no
verdicts are emitted for the seed corpus). Every later batch appends
``(id, verdict, match_id, est_jaccard)`` rows to the verdict sink.

Scale posture (100 TB): identical to the batch operator — the store
contributes band keys + signatures only; over-capacity LSH buckets are
dropped under the logged union-population cap; the verdict sink and the
store append are each one small write per batch. Checkpointing is
Structured Streaming's own file-source checkpoint; the store append is
idempotent per batch only if the sink/store writes are committed
together, so production deployments should point ``store_dir`` at a
transactional table (the parquet layout here keeps the showcase
dependency-free).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from onetl_spark.llm.dedup import (
    LSH_BANDS,
    LSH_MAX_BUCKET,
    NUM_PERM,
    incremental_minhash_dedup,
    minhash_signature_store,
)

__all__ = ["incremental_dedup_batch_fn"]


def _store_exists(spark, path: str) -> bool:
    """Hadoop-FS store probe: does ``path`` exist and contain at least one
    parquet part, for ANY Hadoop URI (file://, hdfs://, s3a://…)?

    A driver-local ``os.path.isdir`` probe silently reports "missing" for
    every non-local store URI, so each batch would re-bootstrap and
    OVERWRITE the accumulated store — data loss, not a perf nit. Resolving
    the filesystem from the path through the JVM gateway uses whatever
    Hadoop filesystems the cluster has configured.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if not fs.exists(jpath) or not fs.getFileStatus(jpath).isDirectory():
        return False
    for status in fs.listStatus(jpath):
        if status.getPath().getName().endswith(".parquet"):
            return True
    return False


def incremental_dedup_batch_fn(
    store_dir: str,
    verdict_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
    max_bucket_size: int = LSH_MAX_BUCKET,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callback for a document stream.

    Use with any streaming writer::

        StreamDFWriter(
            foreach_batch=incremental_dedup_batch_fn(store, verdicts),
            options=StreamWriteOptions(trigger={"availableNow": True}),
        ).run(doc_stream)
    """
    # posixpath-style join keeps URI store_dirs (hdfs://, s3a://) intact
    sig_path = store_dir.rstrip("/") + "/sigs"

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not _store_exists(spark, sig_path):
            # bootstrap: the first corpus seeds the store, no verdicts
            minhash_signature_store(batch_df, text_col, id_col, num_perm).write.mode(
                "overwrite"
            ).parquet(sig_path)
            return
        store = spark.read.parquet(sig_path)
        # compute the batch signatures ONCE and share them between the
        # verdict operator and the store append (the shingle+md5 pipeline
        # is the batch side's dominant cost)
        sigs = minhash_signature_store(
            batch_df, text_col, id_col, num_perm
        ).localCheckpoint(eager=True)
        verdicts = incremental_minhash_dedup(
            batch_df,
            store,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            num_perm=num_perm,
            bands=bands,
            max_bucket_size=max_bucket_size,
            batch_sigs=sigs,
        ).localCheckpoint(eager=True)  # consumed twice: sink + fresh filter
        verdicts.write.mode("append").parquet(verdict_dir)
        fresh = verdicts.filter(verdicts.verdict == "fresh").select(id_col)
        sigs.join(fresh, id_col, "semi").write.mode("append").parquet(sig_path)

    return fn
