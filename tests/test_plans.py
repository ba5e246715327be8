"""Executed-plan regression guards.

Correctness tests prove the VALUES; these prove the SHAPE — the
properties that decide whether a plan survives a 100× scale-up:
filters reaching the scan, projections pruning columns, dims being
broadcast, per-group top-k running as a partial pre-shuffle limit, and
no accidental cartesian products. A future edit that silently loses one
of these still passes value checks at test scale; this file is where it
fails instead.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def tables(spark):
    from onetl_spark.connections.catalog import register_parquet_views

    register_parquet_views(spark, SF_DIR)
    return spark


def test_dbreader_pushes_filter_and_prunes_columns(tables):
    from onetl_spark.connections.sparksql import SparkSQLConnection
    from onetl_spark.db import DBReader

    reader = DBReader(
        connection=SparkSQLConnection(tables),
        source="orders",
        columns=["o_orderkey", "o_totalprice"],
        where="o_totalprice > 100000",
    )
    df = reader.run()
    plan = executed_plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(o_totalprice" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_comment" not in read_schema and "o_orderdate" not in read_schema


def test_tpch_q3_broadcasts_dimension(tables, sf_dir_queries):
    plan = executed_plan(sf_dir_queries["q3_shipping_priority"])
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_per_query_uses_window_group_limit(tables):
    from onetl_spark.llm.similarity import topk_per_query

    emb = tables.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"),
    )
    plan = executed_plan(topk_per_query(emb, queries, k=5))
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_weighted_sample_uses_window_group_limit(tables):
    from onetl_spark.llm.sampling import weighted_sample_topk

    docs = tables.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = executed_plan(weighted_sample_topk(docs, "n_chars", 10, strata_col="lang"))
    assert "WindowGroupLimit" in plan


def test_budget_trim_has_no_global_window(tables):
    # the running sum must ride a bucket-partitioned window (hash
    # exchange), never a partition-less window (SinglePartition exchange
    # = one-task global sort — the 100-TB killer this operator avoids)
    from onetl_spark.llm.sampling import trim_to_token_budget

    docs = tables.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", F.col("n_chars").cast("double").alias("score"), F.lit(10).alias("tok")
    )
    df = trim_to_token_budget(docs, 1000, "score", "tok")
    plan = executed_plan(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(_bucket" in plan


def test_sample_by_hash_is_scan_side(tables):
    from onetl_spark.llm.sampling import sample_by_hash

    docs = tables.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = executed_plan(sample_by_hash(docs, {"en": 0.5}))
    assert "Exchange" not in plan  # pure filter: no shuffle anywhere


def test_ivf_assign_no_corpus_self_join(tables):
    from onetl_spark.llm.similarity import ivf_assign

    emb = tables.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    df = ivf_assign(emb, carry_vec=True)
    plan = executed_plan(df)
    # exactly one broadcast (centroids); the corpus is scanned once and
    # never joined back to itself
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_blocked_pair_join_is_salted(tables):
    from onetl_spark.llm.similarity import near_dup_pairs_by_label

    emb = tables.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    plan = optimized_plan(near_dup_pairs_by_label(emb))
    assert "_gb" in plan  # salt key present in the join
    assert "CartesianProduct" not in plan
    # the quadratic guard's bucket-count window partitions by the join
    # key, so in the at-scale SortMergeJoin regime (the one the guard
    # exists for) it rides the join's own right-side exchange — zero
    # extra shuffles; in the small-data broadcast regime it may add at
    # most one (the corpus is broadcast-small there anyway)
    spark = emb.sparkSession
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        guarded = executed_plan(near_dup_pairs_by_label(emb))
        free = executed_plan(near_dup_pairs_by_label(emb, allow_quadratic=True))
        assert "SortMergeJoin" in guarded
        assert guarded.count("Exchange") == free.count("Exchange")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    guarded_bc = executed_plan(near_dup_pairs_by_label(emb))
    free_bc = executed_plan(near_dup_pairs_by_label(emb, allow_quadratic=True))
    assert guarded_bc.count("Exchange") <= free_bc.count("Exchange") + 1


def test_bruteforce_topk_is_take_ordered(tables):
    from onetl_spark.llm.similarity import bruteforce_topk

    emb = tables.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    plan = executed_plan(bruteforce_topk(emb, query_id=1, k=5))
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no global sort


def test_tfidf_docfreq_not_broadcast(tables):
    from onetl_spark.llm.text import tfidf_top_terms

    docs = tables.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    df = tfidf_top_terms(docs)
    plan = optimized_plan(df)
    # the vocabulary-sized side must NOT carry a broadcast hint; only the
    # 1-row n_docs aggregate may broadcast
    import re

    hints = re.findall(r"ResolvedHint.*", plan)
    assert all("broadcast" not in h.lower() or "n_docs" in h for h in hints)


@pytest.fixture(scope="module")
def sf_dir_queries(tables):
    from onetl_spark.showcase import all_queries

    qs = all_queries()
    return {name: qs[name](tables, SF_DIR) for name in ["q3_shipping_priority"]}


def test_cdc_snapshot_partial_aggregates_no_window(tables):
    from onetl_spark.operators.cdc import cdc_latest_snapshot

    df = cdc_latest_snapshot(
        tables.table("events"), ["user_id"], ["ts", "event_id"], op_col="event_type"
    )
    plan = executed_plan(df)
    assert "partial_max_by" in plan or "partial" in plan.lower()
    assert "Window" not in plan  # the changelog is never sort-shuffled
    assert plan.count("Exchange hashpartitioning") == 1


def test_decontamination_broadcasts_benchmark_not_corpus(tables):
    from onetl_spark.llm.dedup import benchmark_contamination

    docs = tables.table("documents")
    df = benchmark_contamination(
        docs.filter("doc_id % 17 <> 0"), docs.filter("doc_id % 17 = 0")
    )
    plan = executed_plan(df)
    assert "BroadcastExchange" in plan  # benchmark shingle set
    # corpus side: explode → broadcast join → ONE aggregate exchange
    assert plan.count("Exchange hashpartitioning") <= 2


def test_top_terms_partial_topk(tables):
    from onetl_spark.llm.text import top_terms

    plan = executed_plan(top_terms(tables.table("documents"), k=5))
    assert "WindowGroupLimit" in plan  # pre-shuffle per-group heap


def test_reweight_corpus_never_shuffled(tables):
    from onetl_spark.llm.sampling import reweight_domains

    df = reweight_domains(tables.table("documents"), {"src0": 0.01})
    plan = executed_plan(df)
    assert "BroadcastExchange" in plan  # rate map
    # the only hash exchanges belong to the tiny totals aggregate
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_side


def test_multiprobe_assign_partial_topk(tables):
    from onetl_spark.llm.similarity import multiprobe_assign

    plan = executed_plan(multiprobe_assign(tables.table("embeddings"), nprobe=2))
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan  # centroids
    assert "CartesianProduct" not in plan


def test_profile_prunes_each_scan_to_one_column(tables):
    from onetl_spark.operators.quality import profile

    df = profile(
        tables.table("orders"), ["o_orderkey", "o_totalprice", "o_orderstatus"],
    )
    plan = executed_plan(df)
    schemas = [s.splitlines()[0] for s in plan.split("ReadSchema: struct<")[1:]]
    assert len(schemas) == 3
    # every scan reads exactly one column — no Expand multi-distinct
    assert all(s.split(">")[0].count(",") == 0 for s in schemas), schemas
    assert "Expand" not in plan


def test_snapshot_diff_is_single_outer_join(tables):
    from onetl_spark.operators.cdc import snapshot_diff

    orders = tables.table("orders").select("o_orderkey", "o_totalprice")
    df = snapshot_diff(orders, orders.limit(100), ["o_orderkey"])
    plan = executed_plan(df)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_chi2_broadcasts_customer_dim(tables):
    from onetl_spark.showcase.analytics import chi2_type_by_segment

    plan = executed_plan(chi2_type_by_segment(tables, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_connected_components_shuffles_only_edges(tables):
    from onetl_spark.operators.graph import connected_components

    edges = tables.createDataFrame(
        [(i, i + 1) for i in range(50)], "src long, dst long",
    )
    out = connected_components(edges)
    plan = executed_plan(out)
    # the final mapping is derived from checkpointed edge-set-sized data:
    # no scan of any corpus table can appear in the plan
    assert "parquet" not in plan.lower()
    assert "CartesianProduct" not in plan


def test_triangle_count_no_unbounded_joins(tables):
    from onetl_spark.showcase.graphs import supplier_triangle_counts

    df = supplier_triangle_counts(tables, SF_DIR)
    plan = executed_plan(df)
    # degree-ordered orientation keeps every join an equi-join on a
    # bounded key; a cartesian/nested-loop here means the orientation or
    # the closing-edge probe regressed to an inequality join (the edge
    # set is checkpointed, so the lineitem scan lives in the edge plan)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    from onetl_spark.showcase.graphs import _supplier_edges

    edge_plan = executed_plan(_supplier_edges(tables, SF_DIR))
    assert "CartesianProduct" not in edge_plan
    # lineitem scan must prune to the two graph columns
    read_schema = edge_plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_suppkey" in read_schema
    assert "l_extendedprice" not in read_schema


def test_pagerank_iterations_checkpointed(tables):
    from onetl_spark.operators.graph import pagerank_fixed_point

    edges = tables.createDataFrame(
        [(i, (i * 7 + 1) % 40) for i in range(40)], "src long, dst long",
    )
    out = pagerank_fixed_point(edges, iterations=4)
    plan = executed_plan(out)
    # localCheckpoint per iteration: the final plan reads checkpointed
    # node/contribution data, it does NOT replay 4 iterations of joins
    # (plan growth with iteration count is the classic iterative-Spark bug)
    assert plan.count("ShuffledHashJoin") + plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 3
    assert "CartesianProduct" not in plan


def test_widen_small_scan_parallelizes_starved_input_only(tables):
    from onetl_spark.spark_utils import widen_small_scan

    cores = tables.sparkContext.defaultParallelism
    starved = tables.range(1000).coalesce(1)
    widened = widen_small_scan(starved)
    assert widened.rdd.getNumPartitions() == cores
    # values survive the round-robin exchange
    assert widened.count() == 1000

    # already-wide input: no extra exchange is inserted
    wide = tables.range(1000).repartition(cores + 4)
    assert widen_small_scan(wide) is wide


def test_minhash_widens_single_partition_scan(tables):
    """The shingle/signature pipeline must not serialize on a scan-starved
    input: with a 1-partition source the hashing stage is widened to
    session parallelism, and the pairs are identical to the wide-input
    run (the result plan itself is a checkpoint scan, so the widening is
    asserted on the staged frame plus result-equivalence)."""
    from onetl_spark.llm.dedup import minhash_lsh_pairs, shingle_hashes
    from onetl_spark.spark_utils import widen_small_scan

    docs = tables.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 7}") for i in range(300)],
        "doc_id long, text string",
    ).coalesce(1)
    staged = widen_small_scan(docs).select("doc_id", shingle_hashes("text"))
    assert staged.rdd.getNumPartitions() == tables.sparkContext.defaultParallelism

    narrow = {tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.9).collect()}
    wide = {
        tuple(r)
        for r in minhash_lsh_pairs(
            docs.repartition(8, "doc_id"), threshold=0.9
        ).collect()
    }
    assert narrow == wide and narrow


def test_two_stage_rerank_broadcasts_candidates_and_heap_topk(tables):
    """Stage 2 must touch only the candidate set: the coarse winners and
    the query vector join broadcast (no corpus shuffle), and both stage
    top-ks reduce via TakeOrderedAndProject partial heaps — never a
    global Sort of the corpus."""
    from onetl_spark.llm.similarity import two_stage_rerank_topk

    df = two_stage_rerank_topk(tables.table("embeddings"), query_id=0, k=5, candidates=20)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # no full-corpus sort: every Sort in the plan must sit under a
    # TakeOrdered limit, which renders as TakeOrderedAndProject (no
    # standalone global Sort node)
    assert "\nSort " not in plan.replace("TakeOrderedAndProject", "")


def test_projected_topk_single_scan_no_shuffle_before_topk(tables):
    """The projection is a pure per-row expression: the only wide
    operation in the whole plan is the final top-k heap merge."""
    from onetl_spark.llm.similarity import projected_topk

    df = projected_topk(tables.table("embeddings"), query_id=0, k=5, out_dim=8)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # one broadcast (the single-row query projection); zero shuffle
    # exchanges of the corpus
    assert "Exchange hashpartitioning" not in plan


def test_knn_classify_partial_topk_and_broadcast_queries(tables):
    """The query set broadcasts against one corpus scan and the per-query
    top-k runs as WindowGroupLimit with a Partial pre-shuffle pass — the
    corpus is never globally sorted."""
    from onetl_spark.llm.similarity import knn_classify

    df = knn_classify(tables.table("embeddings"), query_ids=[0, 1, 2], k=5)
    plan = executed_plan(df)
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_no_vocab_broadcast(tables):
    """The corpus term-frequency table joins term-keyed (sort-merge /
    shuffled-hash) — a web corpus vocabulary must NOT be broadcast; only
    the 1-row total-token count is."""
    from onetl_spark.llm.text import unigram_logprob_scores

    df = unigram_logprob_scores(tables.table("documents"))
    assert "CartesianProduct" not in executed_plan(df)
    # the vocabulary-sized cf side must NOT carry a broadcast HINT (AQE
    # may still broadcast it at toy scale when it fits — that's correct
    # runtime behavior; the hint is what would force it at 100 TB). Only
    # the 1-row total aggregate is explicitly broadcast.
    import re

    hints = re.findall(r"ResolvedHint.*", optimized_plan(df))
    assert all("broadcast" not in h.lower() or "n_total" in h for h in hints)


def test_markov_model_broadcast_to_test_join(tables):
    """The |types|²-sized model side is broadcast; the event-sized test
    transitions are never shuffled for the join."""
    from onetl_spark.showcase.analytics import markov_next_event_eval

    df = markov_next_event_eval(tables, SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmv_set_ops_partial_topk(tables):
    """Both the per-side and the merged sketches run their top-k as
    WindowGroupLimit partial heaps — post-shuffle volume is ≤ 2k rows per
    group, never the distinct user set."""
    from onetl_spark.showcase.analytics import events_user_overlap_kmv

    df = events_user_overlap_kmv(tables, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("WindowGroupLimit") >= 2 and "Partial" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_linkage_block_equijoin_no_cartesian(tables):
    """Candidate generation is an equi-join on the block key (hash
    shuffled, co-located); the edit-distance filter must not degrade the
    join into a cartesian/BNL product."""
    from onetl_spark.showcase.operators import supplier_fuzzy_linkage

    df = supplier_fuzzy_linkage(tables, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan  # JVM-side expression, not a Python UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duplicate_ngram_coverage_no_pair_join(tables):
    """The coverage signal is inverted-index shaped: shingle-keyed
    aggregation + join back, one row per (doc, shingle) — never the
    quadratic per-bucket pair join of the pairwise dedup operators."""
    from onetl_spark.llm.dedup import duplicate_ngram_coverage

    df = duplicate_ngram_coverage(tables.table("documents"))
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bfs_frontier_join_stays_edge_sized(tables):
    """Each BFS round joins the frontier against the adjacency list —
    no cartesian products and no Python evaluation anywhere in the
    iterative plan."""
    from onetl_spark.showcase.graphs import supplier_bfs_hops

    df = supplier_bfs_hops(tables, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lag_correlation_broadcasts_lag_relation_no_cartesian_on_data(tables):
    from onetl_spark.showcase.analytics import events_lag_correlation

    df = events_lag_correlation(tables, SF_DIR)
    plan = executed_plan(df)
    # the 8-row lag relation joins broadcast; the daily series never
    # cross-joins itself
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_theilsen_pair_join_is_keyed_not_cartesian(tables):
    from onetl_spark.showcase.analytics import events_theilsen_trend

    df = events_theilsen_trend(tables, SF_DIR)
    plan = executed_plan(df)
    # the pairwise-slope join is event_type-keyed (hash/sort-merge/
    # broadcast-HASH), never an unkeyed cross product over the daily rows
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scene_changes_single_arrow_pass_no_shuffle(tables):
    from onetl_spark.showcase.llm import multimodal_scene_changes

    df = multimodal_scene_changes(tables, SF_DIR)
    plan = executed_plan(df)
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # zero shuffles: one row in, one row out


def test_hard_negative_mining_broadcasts_queries_with_partial_topk(tables):
    from onetl_spark.llm.similarity import hard_negative_topk

    df = hard_negative_topk(tables.table("embeddings"), query_ids=[0, 1, 2], k=5)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan  # partial per-query top-k pre-shuffle
    assert "CartesianProduct" not in plan


def test_integrity_audit_scans_key_columns_only(tables):
    from onetl_spark.operators.quality import referential_integrity_audit

    df = referential_integrity_audit(
        tables.table("lineitem"), tables.table("orders"), "l_orderkey", "o_orderkey"
    )
    df.collect()
    # the orphan probe itself: key-only projection reaching the scans
    child = tables.table("lineitem").select(F.col("l_orderkey").alias("_ck"))
    parent = tables.table("orders").select(F.col("o_orderkey").alias("_pk")).distinct()
    probe = child.join(parent, F.col("_ck") == F.col("_pk"), "left_anti")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    for schema in [s.splitlines()[0] for s in plan.split("ReadSchema:")[1:]]:
        assert "l_comment" not in schema and "o_comment" not in schema
        assert "l_extendedprice" not in schema and "o_totalprice" not in schema


def test_column_stats_drift_single_aggregate_per_side(tables):
    from onetl_spark.operators.quality import column_stats_drift

    ev = tables.table("events")
    df = column_stats_drift(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        ["value", "user_id"],
    )
    plan = optimized_plan(df)
    # all columns aggregate together: exactly two Aggregate pairs
    # (partial+final per side), not one per column per side
    assert plan.count("Aggregate") <= 4


def test_session_top_paths_windows_share_one_exchange(tables):
    from onetl_spark.showcase.sessions import session_top_paths

    df = session_top_paths(tables, SF_DIR)
    plan = executed_plan(df)
    # the gaps-and-islands windows and the in-session ranking all key on
    # user_id-prefixed sorts: one hashpartitioning exchange on user_id
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan


def test_association_lift_no_cartesian_and_keyed_joins(tables):
    from onetl_spark.operators.stats import association_lift

    ev = tables.table("events").select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    )
    df = association_lift(ev, ["user_id", "day"], "event_type", min_count=5)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # the pair generation is an equi-join on the basket key
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_cms_sketch_single_pass_build(tables):
    from onetl_spark.operators.sketches import cms_sketch

    df = cms_sketch(tables.table("events"), "user_id")
    plan = optimized_plan(df)
    # one scan, one explode, one aggregate: no joins in the build
    assert "Join" not in plan
    assert plan.count("Relation") == 1


def test_winnow_selection_has_no_gram_row_shuffle(tables):
    # the sliding-window min must run in ARRAY LAND per document — the old
    # explode→window shape shuffled+sorted corpus×300 gram rows
    from onetl_spark.llm.text import winnow_fingerprints

    df = winnow_fingerprints(tables.table("documents"), k=7, window=5)
    plan = optimized_plan(df)
    assert "Window" not in plan  # no window function over exploded grams
    # exactly the dedup aggregate touches exchange-worthy state; no sort
    # of gram rows appears below the explode
    assert "Generate explode" in plan or "Generate" in plan


def test_kendall_grid_joins_are_broadcast_bounded(tables):
    from onetl_spark.operators.stats import kendall_tau_b

    df = kendall_tau_b(tables.table("lineitem"), "l_quantity", "l_linenumber")
    plan = executed_plan(df)
    # concordance pairs come from broadcast nested loop over the AGGREGATED
    # cell grid — never a shuffle join or cartesian over fact rows
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_blocklist_phrase_table_is_broadcast(tables):
    from onetl_spark.llm.text import phrase_blocklist_counts

    df = phrase_blocklist_counts(tables.table("documents"), ["fast table", "value"])
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan  # phrase parts broadcast, corpus streams
    assert "CartesianProduct" not in plan


def test_copurchase_topk_partial_window_limit(tables, spark):
    from onetl_spark.showcase.analytics import part_copurchase_topk

    df = part_copurchase_topk(spark, SF_DIR)
    plan = executed_plan(df)
    # the per-part top-k must pre-limit on the map side before the exchange
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "CartesianProduct" not in plan


def test_hits_half_step_is_edge_keyed(tables, spark):
    from onetl_spark.operators.graph import hits_fixed_point

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 10) for i in range(10)], "src long, dst long"
    )
    df = hits_fixed_point(e, iterations=1)
    plan = executed_plan(df)
    # normalizer totals ride 1-row broadcasts; no cartesian on node/edge data
    assert "CartesianProduct" not in plan


def test_wasserstein_no_single_partition_exchange(tables):
    from onetl_spark.operators.stats import wasserstein_1

    ev = tables.table("events")
    split = F.lit("2024-01-16").cast("timestamp")
    df = wasserstein_1(
        ev.filter(F.col("ts") < split), ev.filter(F.col("ts") >= split), "value"
    )
    plan = executed_plan(df)
    # the ECDF cumsums and the in-bucket lag must be bucket-partitioned
    # windows — a global ORDER BY window would plan Exchange SinglePartition
    # over the distinct-value relation
    assert "_bkt" in plan
    import re

    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert w_specs and all("_bkt" in ws for ws in w_specs)


def test_abc_classification_cumsum_is_bucketed(tables, spark):
    from onetl_spark.showcase.analytics import part_abc_classification

    df = part_abc_classification(spark, SF_DIR)
    plan = executed_plan(df)
    assert "_bkt" in plan  # stitched scaffold, not a global ORDER BY window


def test_kruskal_and_pr_auc_ride_bucketed_windows(tables):
    import re

    from onetl_spark.operators.stats import kruskal_wallis, pr_auc

    ev = tables.table("events")
    # the localCheckpoint of the ranked relation hides the window stages
    # from the FINAL plan, so guard the scaffold directly plus the
    # epilogue: no single-partition exchange may appear anywhere
    from onetl_spark.operators.ranking import stitched_cumsums

    counts = (
        ev.select(F.col("value").cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_nv"))
    )
    stitched, _ = stitched_cumsums(counts.localCheckpoint(eager=True), "_v", ("_nv",))
    splan = executed_plan(stitched)
    assert "_bkt" in splan
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", splan)
    assert w_specs and all("_bkt" in ws for ws in w_specs)
    # the final KW plan may contain the benign 1-row reduce exchanges
    # (partial_sum -> SinglePartition -> sum), but never a global-ORDER
    # window: every windowspec anywhere must be bucket-partitioned
    plan = executed_plan(kruskal_wallis(ev, "value", "event_type"))
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert all("_bkt" in ws for ws in w_specs)

    lab = ev.select(
        "value", (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    plan = executed_plan(pr_auc(lab, "value", "y"))
    assert "_bkt" in plan
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert w_specs and all("_bkt" in ws for ws in w_specs)


def test_adamic_adar_wedge_join_no_cartesian(tables):
    from onetl_spark.showcase.graphs import _part_edges

    from onetl_spark.operators.graph import adamic_adar

    df = adamic_adar(_part_edges(tables, SF_DIR), top_k=5)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # top-k must run as TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_partition_modularity_labels_are_broadcast(tables):
    from onetl_spark.showcase.graphs import supplier_nation_modularity

    df = supplier_nation_modularity(tables, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_info_gain_no_cartesian_single_scan_per_feature(tables):
    from onetl_spark.showcase.operators import events_purchase_info_gain

    df = events_purchase_info_gain(tables, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan


def test_scd2_windows_are_key_partitioned(tables):
    import re

    from onetl_spark.showcase.temporal import user_state_scd2

    plan = executed_plan(user_state_scd2(tables, SF_DIR))
    # every window is partitioned by user_id — no global-order window
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert w_specs and all("user_id" in ws for ws in w_specs)
    assert "CartesianProduct" not in plan


def test_brand_triples_prune_is_broadcast_no_cartesian(tables):
    from onetl_spark.showcase.analytics import order_brand_triples

    plan = executed_plan(order_brand_triples(tables, SF_DIR))
    # r12: the broadcast singleton-frequent prune executes inside the
    # checkpointed basket relation's build job (the final plan reads the
    # pruned LogicalRDD), so the guards that carry weight here are the
    # negative ones: the triple growth joins must never degenerate into
    # a nested loop / cartesian over the basket relation. (A positive
    # "some equi-join exists" assert was dropped as tautological —
    # ADVICE r12.)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_permutation_test_shuffles_only_on_b(tables):
    from onetl_spark.showcase.analytics import events_value_permutation_test

    plan = executed_plan(events_value_permutation_test(tables, SF_DIR))
    # the exploded B x n relation must partial-aggregate map-side:
    # the shuffle key is the replicate id, never a global sort
    assert "Generate explode" in plan
    assert "partial_" in plan.lower() or "partial" in plan
    assert "CartesianProduct" not in plan


def test_bootstrap_ci_rank_window_is_bounded_relation(tables):
    import re

    from onetl_spark.showcase.analytics import events_bootstrap_mean_ci

    plan = executed_plan(events_bootstrap_mean_ci(tables, SF_DIR))
    # the only unpartitioned window orders the B-row replicate relation
    # (bounded by construction); the corpus-scale stages are agg-only
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert len(w_specs) >= 1
    assert "CartesianProduct" not in plan


def test_kmeans_centroids_are_broadcast(tables):
    from onetl_spark.llm.similarity import kmeans_lloyd

    df = kmeans_lloyd(tables.table("embeddings"), k=2, iters=1)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # the centroid table meets the corpus as a broadcast nested loop of
    # a k-row side at worst — never a shuffled corpus-vs-corpus join
    assert "Broadcast" in plan


def test_ndcg_windows_are_brand_partitioned(tables):
    import re

    from onetl_spark.showcase.analytics import brand_ranking_ndcg

    plan = executed_plan(brand_ranking_ndcg(tables, SF_DIR))
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert w_specs and all("p_brand" in ws for ws in w_specs)


def test_skyline_prefix_max_is_bucketed(tables):
    import re

    from onetl_spark.operators.ranking import skyline_2d

    o = tables.table("orders").select(
        F.col("o_totalprice").alias("p"), F.col("o_orderdate").alias("d")
    )
    plan = executed_plan(skyline_2d(o, "p", "d"))
    # the prefix-max sweep must ride bucket-partitioned windows
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert w_specs and all("_bkt" in ws for ws in w_specs)
    assert "CartesianProduct" not in plan


def test_scd2_pit_join_no_cartesian(tables):
    from onetl_spark.showcase.temporal import events_scd2_point_in_time

    plan = executed_plan(events_scd2_point_in_time(tables, SF_DIR))
    assert "CartesianProduct" not in plan


def test_block_power_iteration_scan_and_job_shape(tables):
    """The block iteration's contract is ONE corpus-scan job per
    iteration advancing BOTH directions (the whole point vs the deflated
    two-run design, which needed two scans/iteration plus a deflation
    pass and a second mean pass). Absolute job counts depend on how many
    stage-jobs AQE materializes per pass — a constant that shifts across
    Spark versions/configs — so guard the PER-ITERATION job delta
    instead: run iterations=1 and iterations=3 and bound the marginal
    cost of an extra iteration. One fused scan/iteration costs one
    reduce (≤3 AQE stage-jobs) + 2 one-row normalize collects ≈ 5 jobs;
    a regression to per-direction scans adds a second reduce → ≥8."""
    from onetl_spark.llm.similarity import top_two_principal_components

    emb = tables.table("embeddings")
    sc = tables.sparkContext
    tracker = sc.statusTracker()

    # Count jobs in a DEDICATED job group per probe: the default-group id
    # list rides the status tracker's bounded retention window
    # (spark.ui.retainedJobs), so late in a long suite old ids evict while
    # new ones append and a before/after length delta can go NEGATIVE
    # (observed: iters=1 "cost" -89 jobs once the suite's cumulative job
    # count crossed the window). A fresh group holds only this probe's
    # ~25 jobs — far inside the window, eviction-immune.
    def jobs_for(iters, tag):
        sc.setJobGroup(tag, "job-shape probe")
        df = top_two_principal_components(emb, iterations=iters)
        return df, len(tracker.getJobIdsForGroup(tag) or [])

    try:
        _, j_one = jobs_for(1, "pca-probe-1")
        df, j_three = jobs_for(3, "pca-probe-3")
        sc.setJobGroup("pca-probe-epilogue", "job-shape probe epilogue")
        per_iter = (j_three - j_one) / 2
        assert per_iter <= 6, (
            f"block iteration costs {per_iter} jobs/iteration "
            f"(iters=1: {j_one}, iters=3: {j_three}; one-scan contract is ~5)"
        )
        # epilogue is a d-row range projection — no further corpus scans
        plan = executed_plan(df)
        assert "FileScan" not in plan and "CartesianProduct" not in plan
    finally:
        # drop the group so later jobs on this thread don't inherit it
        # (a lingering group would poison any later group-based probe)
        sc.setJobGroup(None, None)


def test_retrieval_eval_plan_shapes(tables):
    """Retrieval-eval family (r10): exact top-k must ride the partial
    WindowGroupLimit (map-side top-k — nothing corpus-sized shuffles),
    centroid/panel relations must join as broadcasts, and the only
    allowed nested-loop joins are broadcast ones (bounded panel or the
    1-row total); a plain CartesianProduct is a scale killer."""
    from onetl_spark.llm.retrieval_eval import (
        probe_sweep,
        quantization_ledger,
        recall_by_slice,
    )

    emb = tables.table("embeddings")
    for df in (
        recall_by_slice(emb, "vec_id % 25 = 3", k=5),
        probe_sweep(emb, "vec_id % 25 = 3", k=5, probes=(1, 2)),
    ):
        plan = executed_plan(df)
        assert "WindowGroupLimit" in plan and "Partial" in plan
        assert "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan
        # panel + centroid materialization caps corpus scans at the two
        # required passes (exact top-k arm, IVF assignment arm); the
        # modulo panel filter is not parquet-pushable, so lazy panel
        # references would each re-read the corpus (was 7 scans)
        assert plan.count("Scan parquet") <= 2

    df = quantization_ledger(emb)
    plan = executed_plan(df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # the cells checkpoint must cut the corpus-share fan-out: the final
    # plan reads the materialized cells, never re-scanning the corpus
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert "Scan parquet" not in plan


def test_hygiene_single_scan_no_shuffle_blowup(tables):
    """Hygiene family (r10): each audit is ONE scan of documents with
    pure column expressions — the executed plan must contain exactly one
    parquet scan, no join of any kind, and stay inside whole-stage
    codegen (regexp_count/regexp_replace are JVM expressions, not UDFs)."""
    from onetl_spark.llm.hygiene import (
        combining_mark_audit,
        confusable_screen,
        control_char_audit,
        script_profile,
    )

    docs = tables.table("documents")
    for op in (script_profile, control_char_audit, confusable_screen,
               combining_mark_audit):
        plan = executed_plan(op(docs))
        assert plan.count("Scan parquet") == 1, op.__name__
        assert "Join" not in plan and "CartesianProduct" not in plan, op.__name__
        # '*(n)' prefixes mark whole-stage-codegen stages in executedPlan
        assert "*(1)" in plan, op.__name__
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_banded_near_dup_plan_bounded(tables):
    """Banded sign-LSH near-dup (r10): the pair join must key on
    (band, bucket) — never a cartesian — and the bucket expression must
    stay a compact HOF fold (array literals), not a chained multiply-add
    tree that blows janino's method limit into interpreted fallback."""
    from onetl_spark.llm.similarity import banded_near_dup_pairs

    emb = tables.table("embeddings")
    df = banded_near_dup_pairs(emb, bands=4, planes_per_band=4)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "_bkt" in plan  # bucket key present in the join
    # both pair-join sides must read the persisted bucketed rows — the
    # cached relation's stored child plan still PRINTS its parquet scan,
    # so count InMemoryTableScan, not scan strings
    assert plan.count("InMemoryTableScan") >= 2


def test_dsir_plan_shapes(tables):
    """DSIR family (r10): the B-row log-ratio table must BROADCAST onto
    the per-doc features (the corpus side never re-shuffles for the
    model join), scoring must re-scan the corpus at most once (the
    ratio build is localCheckpoint-materialized — lazy references were
    re-deriving it from 5 extra corpus scans), and the global top-k must
    compile to TakeOrderedAndProject: a partition-less row_number window
    is a one-task global sort (Spark only inserts WindowGroupLimit for
    windows WITH a partition spec)."""
    from onetl_spark.llm.selection import (
        bucket_log_ratio,
        dsir_importance,
        dsir_select,
        hashed_ngram_features,
    )

    docs = tables.table("documents")
    raw = hashed_ngram_features(docs)
    target = hashed_ngram_features(docs.filter(F.col("lang") == "en"))
    scores = dsir_importance(raw, bucket_log_ratio(target, raw))
    plan = executed_plan(scores)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 1, plan.count("Scan parquet")

    sel = dsir_select(scores, k=10)
    plan = executed_plan(sel)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_changepoint_windows_are_key_partitioned(tables):
    """Changepoint family (r10): all window work must ride key-partitioned
    windows over the grid-sized daily pre-aggregate — never a
    partition-less window (SinglePartition exchange = one-task global
    sort), never a join back to the event-sized input."""
    from onetl_spark.operators.changepoint import cusum_excursions, single_changepoint

    daily = (
        tables.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("v"))
    )
    for df in (
        cusum_excursions(daily, ["event_type"], "day", "v"),
        single_changepoint(daily, ["event_type"], "day", "v"),
    ):
        plan = executed_plan(df)
        assert "Exchange SinglePartition" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("Scan parquet") == 1
        assert "windowspecdefinition(event_type" in plan


def test_calibration_plan_shapes(tables):
    """Calibration family (r11): the corpus aggregates into the bin grid
    with a map-side partial pass before ONE exchange; the grand-totals
    join onto the 10-row grid is a broadcast; no sort-merge join, no
    window, no plain cartesian product anywhere."""
    from pyspark.sql import functions as F

    from onetl_spark.operators.calibration import (
        calibration_by_group,
        calibration_report,
        reliability_bins,
    )

    ev = tables.table("events")
    mx = ev.agg(F.max("value").alias("_mx"))
    scored = ev.crossJoin(F.broadcast(mx)).select(
        (F.col("value") / F.col("_mx")).alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    )
    for df in (
        reliability_bins(scored),
        calibration_report(scored),
        calibration_by_group(scored, ["week"]),
    ):
        plan = executed_plan(df)
        assert "partial" in plan.lower()  # map-side combine before shuffle
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Window" not in plan


def test_incremental_dedup_plan_shapes(tables):
    """Incremental-dedup family (r11): the store contributes band keys
    and signatures only (no text columns read from the store side), the
    candidate joins are band equi-joins — never a cartesian product —
    and the batch signature relation is reused via localCheckpoint
    rather than recomputing the shingle pipeline per consumer arm."""
    from onetl_spark.llm.dedup import (
        incremental_minhash_dedup,
        minhash_signature_store,
    )

    docs = tables.table("documents")
    store = minhash_signature_store(docs.filter("doc_id % 5 <> 0"))
    df = incremental_minhash_dedup(docs.filter("doc_id % 5 = 0"), store)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "band_key" in plan  # candidates form on the band equi-join
    # batch signatures come from the checkpointed relation, so the
    # shingle/md5 pipeline does not appear once per consumer arm
    assert plan.count("Scan ExistingRDD") >= 1


def test_ingest_series_plan_shapes(tables):
    """Sketch-store ingest series (r12): corpus rows are touched by ONE
    map-side-combined register aggregation; everything downstream (dense
    grid, cumulative window, estimates, lag) is grid-sized; the bucket
    relation joins by broadcast; unused event columns never reach the
    scan."""
    from onetl_spark.operators.sketch_store import hll_ingest_series

    ev = tables.table("events").withColumn("day", F.col("ts").cast("date"))
    df = hll_ingest_series(ev, "day", ["event_type"], "user_id")
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # the corpus is scanned exactly ONCE: the register relation is
    # checkpointed (its three consumers read the pinned RDD), so no
    # events parquet scan may appear in the final plan at all
    events_scans = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "event_type" in seg.splitlines()[0]
    ]
    assert events_scans == [], events_scans
    assert plan.count("Scan ExistingRDD") >= 3


def test_incremental_decon_plan_shapes(tables):
    """Incremental decontamination (r12): the new benchmark collapses to
    a broadcast distinct shingle set — the index (the corpus-sized side)
    is never shuffled by the join; per-doc counts map-side combine."""
    from onetl_spark.llm.dedup import (
        contamination_index,
        incremental_decontamination,
    )

    docs = tables.table("documents")
    index = contamination_index(docs.filter("doc_id % 4 <> 0"))
    bench = docs.filter("doc_id % 4 = 0").select("doc_id", "text")
    df = incremental_decontamination(index, bench)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()


def test_dp_release_plan_shapes(tables):
    """DP releases (r12): the count release bounds contributions on the
    (already tiny) distinct-unit relation; the sum release pays ONE
    corpus exchange (hash by user) with both cap windows riding it —
    the (user, type) row-cap window's clustering is satisfied by the
    user partitioning, so it costs a sort, not a second shuffle — zero
    joins, the release aggregate map-side combines onto the group grid,
    and the events scan never reads unused columns (props/ts)."""
    from onetl_spark.operators.privacy import dp_count_release, dp_sum_release

    ev = tables.table("events").filter(
        "user_id IS NOT NULL AND event_type IS NOT NULL AND event_id IS NOT NULL"
    )
    plan = executed_plan(
        dp_count_release(ev, ["event_type"], "user_id", 1.0, 3)
    )
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()  # map-side combine on the grid agg
    for seg in plan.split("ReadSchema:")[1:]:
        head = seg.splitlines()[0]
        assert "props" not in head and "ts" not in head, head

    plan2 = executed_plan(
        dp_sum_release(
            ev.filter("value IS NOT NULL"),
            ["event_type"], "user_id", "value", "event_id",
            1.0, 0.0, 100.0, 3, 5,
        )
    )
    assert "CartesianProduct" not in plan2
    # join-free: both caps are windows on one user-hash exchange
    for op in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        assert op not in plan2, op
    assert plan2.count("Exchange hashpartitioning(user_id") == 1, plan2
    assert plan2.count("Window") >= 2
    for seg in plan2.split("ReadSchema:")[1:]:
        head = seg.splitlines()[0]
        assert "props" not in head, head


def test_ann_store_plan_shapes(tables):
    """Incremental ANN store (r12): each batch meets the centroids as a
    broadcast of a k-row table (never a shuffled corpus-vs-corpus join),
    the store folds stay k×d-sized, and the corpus is scanned once per
    batch — the verdict union reads the checkpoint-pinned assignment
    RDDs, so no embeddings parquet scan survives into the final plan."""
    from onetl_spark.llm.ann_store import incremental_ann_assign

    df = incremental_ann_assign(tables.table("embeddings"), n_batches=3, k=4)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    scans = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "embedding" in seg.splitlines()[0]
    ]
    assert scans == [], scans
    assert plan.count("Scan ExistingRDD") >= 3


def test_scd2_apply_batch_plan_shapes(tables):
    """Incremental SCD2 store (r12): every window partitions by the
    dimension key (no global-order window anywhere), the touched-key
    split resolves as broadcast semi/anti joins against the batch's
    tiny distinct-key relation — the store side is never shuffled for
    the split — and no cartesian product appears."""
    import re

    from onetl_spark.operators.cdc import scd2_apply_batch
    from onetl_spark.operators.temporal import scd2_intervals

    ev = tables.table("events").select("user_id", "ts", "event_type", "event_id")
    cut = F.to_timestamp(F.lit("2024-01-15"))
    store = scd2_intervals(
        ev.filter(F.col("ts") < cut), ["user_id"], "ts", "event_type", ["event_id"]
    )
    df = scd2_apply_batch(
        store, ev.filter(F.col("ts") >= cut), ["user_id"], "ts", "event_type",
        ["event_id"],
    )
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    w_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert w_specs and all("user_id" in ws for ws in w_specs)
    # the pass-through split is a broadcast semi/anti join — the store
    # relation must not pay an exchange to meet the batch key set
    assert "BroadcastHashJoin" in plan
    assert plan.count("LeftSemi") >= 1 and plan.count("LeftAnti") >= 1


def test_ri_store_plan_shapes(tables):
    """Incremental referential integrity (r12): every join is a key
    equi-join (no cartesian), the final-status collapse is a map-side
    combined max_by hash aggregate — never a window sort — and the fact
    scan reads only the id and reference columns."""
    from onetl_spark.operators.ri_store import ri_apply_batch, ri_final_status

    cust = tables.table("customer").select("c_custkey")
    orders = tables.table("orders").select("o_orderkey", "o_custkey")
    key_store, pending, log = None, None, None
    for k in range(3):
        key_store, pending, events = ri_apply_batch(
            key_store,
            pending,
            cust.filter(F.col("c_custkey") % 4 == k),
            orders.filter(F.col("o_orderkey") % 3 == k),
            "c_custkey",
            "o_orderkey",
            "o_custkey",
            k,
        )
        log = events if log is None else log.unionByName(events)
    df = ri_final_status(log)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "max_by" in plan and "partial_max_by" in plan
    for seg in plan.split("ReadSchema:")[1:]:
        head = seg.splitlines()[0]
        assert "o_totalprice" not in head and "o_orderdate" not in head, head
