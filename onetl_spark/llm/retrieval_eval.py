"""Retrieval-eval operators: first-class quality measurement of the ANN
scale paths against exact brute force.

Every ANN index trades recall for speed; a training-data pipeline that
feeds dedup/retrieval from an IVF index must measure that trade on its
OWN corpus — aggregate recall@k hides per-slice collapse (one shard of
the corpus landing in the wrong cells), rank quality (MRR), and the
quantization error that drives both. This family extends
``similarity.ivf_recall_eval`` (the single-number recall probe) into
the evaluation suite a deployment actually tunes with — the FAISS
benchmarking protocol (recall@k / MRR vs nprobe sweeps, per-slice
breakdowns) re-expressed as Spark relations.

Scale posture shared by all operators here: the query panel is a
FILTER over the corpus (never a driver-side id list), exact top-k rides
the broadcast-panel × corpus join with Catalyst's partial
WindowGroupLimit (map-side top-k, nothing data-sized shuffles), the
corpus is assigned to broadcast centroids exactly once per operator,
and every output is panel- or centroid-bounded. Deterministic
tie-breaks (cos desc, id asc) everywhere make recall/MRR engine-exact,
so the DuckDB oracles hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from onetl_spark.llm.similarity import (
    cosine,
    ivf_assign,
    ivf_seed_centroids,
    topk_per_query,
)

__all__ = [
    "recall_by_slice",
    "mrr_eval",
    "quantization_ledger",
    "probe_sweep",
]


def _panel(embeddings: DataFrame, query_filter: str, id_col: str, vec_col: str,
           slice_col: str | None = None) -> DataFrame:
    """Materialized query panel. The panel filter is a modulo predicate —
    NOT parquet-pushable — so every lazy reference would re-read the
    corpus' id+vector columns; each operator here references the panel
    2-3 times (exact arm, probe arm, outer grid). localCheckpoint makes
    those references read the panel-bounded relation instead (measured:
    7 corpus-scale scans -> 2 per operator)."""
    cols = [F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")]
    if slice_col:
        cols.append(F.col(slice_col).alias("slice"))
    return embeddings.filter(query_filter).select(*cols).localCheckpoint(eager=False)


def _centroids(embeddings: DataFrame, centroid_filter: str, id_col: str,
               vec_col: str) -> DataFrame:
    """Materialized centroid set (the codebook). It feeds 2-3 consumers
    per operator (corpus assignment, query probe ranking, loss rejoin)
    and must be broadcastable anyway — checkpointing it once replaces
    repeated corpus re-scans with reads of the codebook itself."""
    return ivf_seed_centroids(
        embeddings, centroid_filter, id_col, vec_col
    ).localCheckpoint(eager=False)


def _qprobe(queries: DataFrame, centroids: DataFrame, max_probe: int = 1) -> DataFrame:
    """Rank ALL centroids per panel query (broadcast product, bounded by
    panel × centroids) and keep the top ``max_probe`` probes."""
    ranked = (
        queries.join(F.broadcast(centroids))
        .select(
            "query_id",
            "qvec",
            "centroid_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 9).alias("_qcos"),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("_qcos"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("probe_rank") <= max_probe)
    )
    return ranked.select("query_id", "qvec", "centroid_id", "probe_rank")


def _approx_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    max_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Scored IVF candidates: (query_id, neighbor_id, cos_sim, probe_rank).
    The corpus is assigned once; candidates are the cluster members of
    each query's top-``max_probe`` probes. probe_rank carries WHICH probe
    admitted the candidate so a single relation serves every nprobe ≤
    max_probe (the probe sweep reuses it instead of re-scoring)."""
    clustered = ivf_assign(
        embeddings, id_col=id_col, vec_col=vec_col, centroids=centroids, carry_vec=True,
    )
    qp = _qprobe(queries, centroids, max_probe)
    return (
        clustered.join(F.broadcast(qp), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 9).alias("cos_sim"),
            "probe_rank",
        )
    )


def recall_by_slice(
    embeddings: DataFrame,
    query_filter: str = "vec_id % 25 = 3",
    k: int = 10,
    slice_col: str = "label",
    centroid_filter: str = "vec_id % 64 = 7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of single-probe IVF per QUERY SLICE — the breakdown that
    catches a slice of the corpus (a language, a modality, a label) whose
    vectors straddle cell boundaries and silently get unfindable while
    the aggregate recall still looks fine (the per-slice protocol of the
    FAISS / big-ann-benchmarks evaluation suites).

    Returns one row per slice value present in the panel:
    ``(slice, n_queries, mean_recall, min_recall)`` — mean for the
    headline, min for the worst query in the slice.
    """
    queries = _panel(embeddings, query_filter, id_col, vec_col, slice_col)
    exact = topk_per_query(
        embeddings, queries.select("query_id", "qvec"), k=k,
        id_col=id_col, vec_col=vec_col,
    )
    centroids = _centroids(embeddings, centroid_filter, id_col, vec_col)
    approx = _approx_candidates(
        embeddings, queries.select("query_id", "qvec"), centroids, 1, id_col, vec_col,
    )
    approx_topk = (
        approx.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
            ),
        )
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id")
    )
    per_query = (
        queries.select("query_id", "slice")
        .join(
            exact.select("query_id", "neighbor_id")
            .join(approx_topk, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("_hits")),
            "query_id",
            "left",
        )
        .select(
            "slice",
            F.round(F.coalesce("_hits", F.lit(0)).cast("double") / k, 9).alias("_r"),
        )
    )
    # decimal-summed mean: double summation order varies with partitioning,
    # so Σ as exact DECIMAL then ONE double division — engine-exact
    return per_query.groupBy("slice").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(
            F.sum(F.col("_r").cast("decimal(30,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_recall"),
        F.round(F.min("_r"), 9).alias("min_recall"),
    )


def mrr_eval(
    embeddings: DataFrame,
    query_filter: str = "vec_id % 25 = 3",
    k: int = 10,
    centroid_filter: str = "vec_id % 64 = 7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean-reciprocal-rank probe: where does each query's TRUE nearest
    neighbour land in the IVF top-k list? Recall@k treats position 1 and
    position k the same; retrieval stacked on the index (kNN
    classification, RAG contexts, near-dup verdicts) does not. rr = 1/rank
    of the exact NN inside the approximate list, 0 when the index misses
    it entirely (the NN's cell wasn't probed).

    Returns per-query rows ``(query_id, nn_id, approx_rank, rr)`` —
    panel-bounded; aggregate MRR is one more avg over this relation.
    """
    queries = _panel(embeddings, query_filter, id_col, vec_col)
    nn = (
        topk_per_query(embeddings, queries, k=1, id_col=id_col, vec_col=vec_col)
        .select("query_id", F.col("neighbor_id").alias("nn_id"))
    )
    centroids = _centroids(embeddings, centroid_filter, id_col, vec_col)
    approx = _approx_candidates(embeddings, queries, centroids, 1, id_col, vec_col)
    approx_ranked = (
        approx.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
            ),
        )
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", F.col("_rn").alias("approx_rank"))
    )
    return (
        nn.join(
            approx_ranked,
            (nn["query_id"] == approx_ranked["query_id"])
            & (nn["nn_id"] == approx_ranked["neighbor_id"]),
            "left",
        )
        .select(
            nn["query_id"],
            "nn_id",
            F.coalesce("approx_rank", F.lit(0)).alias("approx_rank"),
            F.round(
                F.when(F.col("approx_rank").isNull(), F.lit(0.0)).otherwise(
                    F.lit(1.0) / F.col("approx_rank")
                ),
                9,
            ).alias("rr"),
        )
    )


def quantization_ledger(
    embeddings: DataFrame,
    centroid_filter: str = "vec_id % 64 = 7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-centroid quantization-loss ledger: how much similarity each
    cell destroys. ``1 - cos(v, centroid)`` is the coarse-quantization
    loss that upper-bounds what cluster-restricted search can recover;
    cells with high mean loss or huge membership are where recall dies
    first (the "imbalanced inverted lists" failure mode every IVF tuning
    guide warns about).

    One corpus pass: ``ivf_assign``'s broadcast argmax (its exact
    tie-break semantics, not a re-implementation), a broadcast rejoin to
    the centroid set to score only the N ASSIGNED pairs (not N×C), then
    a centroid-keyed aggregate. The cells relation is eagerly
    ``localCheckpoint``-ed before fan-out (it feeds both the output and
    the 1-row corpus total; without the checkpoint each consumer re-runs
    the whole corpus aggregation — measured 6 scans vs 0 after), so
    corpus_share costs one bounded pass over the operator's own output.
    Returns one row per non-empty cell:
    ``(centroid_id, n_vecs, corpus_share, mean_loss, max_loss)``.
    """
    centroids = _centroids(embeddings, centroid_filter, id_col, vec_col)
    clustered = ivf_assign(
        embeddings, id_col=id_col, vec_col=vec_col, centroids=centroids, carry_vec=True,
    )
    losses = clustered.join(F.broadcast(centroids), "centroid_id").select(
        "centroid_id",
        F.round(
            F.lit(1.0) - F.round(cosine(F.col(vec_col), F.col("cvec")), 9), 9,
        ).alias("_loss"),
    )
    cells = losses.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # decimal-summed mean (summation-order-independent, engine-exact)
        F.round(
            F.sum(F.col("_loss").cast("decimal(30,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_loss"),
        F.round(F.max("_loss"), 9).alias("max_loss"),
    )
    # corpus total via 1-row broadcast crossJoin — the centroid set scales
    # as corpus/64, so an empty-partitionBy window here would funnel a
    # corpus-scale relation through one partition. Materialize cells ONCE:
    # it feeds two consumers and is bounded by the output size.
    cells = cells.localCheckpoint(eager=False)
    total = cells.agg(F.sum("n_vecs").alias("_total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "centroid_id",
        "n_vecs",
        F.round(F.col("n_vecs").cast("double") / F.col("_total"), 9).alias(
            "corpus_share"
        ),
        "mean_loss",
        "max_loss",
    )


def probe_sweep(
    embeddings: DataFrame,
    query_filter: str = "vec_id % 25 = 3",
    k: int = 10,
    probes: "list[int]" = (1, 2, 4),
    centroid_filter: str = "vec_id % 64 = 7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The index-parameter sweep table: mean recall@k as a function of
    nprobe — the curve an IVF deployment reads to pick its latency/recall
    operating point (more probes = more cells scanned = higher recall,
    linearly more work).

    The candidate relation is scored ONCE at max(probes) with each
    candidate tagged by the probe_rank that admitted it; every sweep
    point p then just filters ``probe_rank <= p`` — no re-scoring, no
    extra corpus pass per sweep point. The probes axis joins in as a
    broadcast literal array (|probes| rows), so the fan-out is bounded
    by the sweep size, never the corpus.

    Returns ``(nprobe, n_queries, mean_recall, min_recall)``.
    """
    probes = sorted(set(int(p) for p in probes))
    if not probes or probes[0] < 1:
        raise ValueError("probe_sweep: probes must be positive ints")
    queries = _panel(embeddings, query_filter, id_col, vec_col)
    exact = topk_per_query(embeddings, queries, k=k, id_col=id_col, vec_col=vec_col)
    centroids = _centroids(embeddings, centroid_filter, id_col, vec_col)
    cands = _approx_candidates(
        embeddings, queries, centroids, probes[-1], id_col, vec_col,
    )
    probe_axis = F.array(*[F.lit(p) for p in probes])
    swept = (
        cands.select(
            "query_id", "neighbor_id", "cos_sim",
            F.explode(F.filter(probe_axis, lambda p: p >= F.col("probe_rank"))).alias(
                "nprobe"
            ),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("query_id", "nprobe").orderBy(
                    F.desc("cos_sim"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("_rn") <= k)
        .select("nprobe", "query_id", "neighbor_id")
    )
    hits = (
        swept.join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("nprobe", "query_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    grid = queries.select("query_id").crossJoin(
        F.broadcast(
            embeddings.sparkSession.range(1)
            .select(F.explode(probe_axis).alias("nprobe"))
        )
    )
    per_query = grid.join(hits, ["nprobe", "query_id"], "left").select(
        "nprobe",
        F.round(F.coalesce("_hits", F.lit(0)).cast("double") / k, 9).alias("_r"),
    )
    return per_query.groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(
            F.sum(F.col("_r").cast("decimal(30,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_recall"),
        F.round(F.min("_r"), 9).alias("min_recall"),
    )
