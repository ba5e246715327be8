"""Unit tests for deterministic sampling / splitting / packing
(onetl_spark.llm.sampling) and PII redaction (llm.text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from onetl_spark.llm.sampling import pack_sequences, sample_by_hash, split_by_hash
from onetl_spark.llm.text import redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shard"), (F.col("id") % 4).cast("string")).alias("source"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de").otherwise("zh").alias("lang"),
        (F.col("id") % 7 + 1).alias("tokens"),
    )


def test_split_is_deterministic_and_total(docs):
    a = split_by_hash(docs, "doc_id")
    b = split_by_hash(docs, "doc_id")
    rows_a = {r["doc_id"]: r["split"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["split"] for r in b.collect()}
    assert rows_a == rows_b
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    # 90/5/5 within loose tolerance on 1000 rows
    assert 850 <= counts["train"] <= 950
    assert set(counts) == {"train", "val", "test"}


def test_split_fractions_must_sum_to_one(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_split_is_stable_under_resharding(docs):
    base = {r["doc_id"]: r["split"] for r in split_by_hash(docs, "doc_id").collect()}
    reshuffled = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(docs.repartition(13), "doc_id").collect()
    }
    assert base == reshuffled


def test_sample_by_hash_rates_and_subset(docs):
    kept = sample_by_hash(docs, {"en": 1.0, "de": 0.0}, strata_col="lang", id_col="doc_id")
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == docs.filter(F.col("lang") == "en").count()
    assert "de" not in by_lang
    assert "zh" not in by_lang  # default rate 0.0
    # sampling twice with the same salt keeps the identical row set
    ids1 = {r["doc_id"] for r in sample_by_hash(docs, {"en": 0.4}).select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in sample_by_hash(docs, {"en": 0.4}).select("doc_id").collect()}
    assert ids1 == ids2
    # a higher rate strictly grows the kept set (nested samples property)
    ids_big = {r["doc_id"] for r in sample_by_hash(docs, {"en": 0.8}).select("doc_id").collect()}
    assert ids1 <= ids_big


def test_pack_sequences_structure(docs):
    packed = pack_sequences(docs, token_col="tokens", budget=20, shard_col="source", id_col="doc_id")
    rows = packed.collect()
    # every doc lands in exactly one bin
    assert sum(r["n_docs"] for r in rows) == 1000
    for r in rows:
        assert r["tokens_total"] == sum(
            1 + (i % 7) for i in r["member_ids"]
        )
        # no-split greedy: a bin exceeds budget by at most its last doc (<= max token len 7)
        assert r["tokens_total"] < 20 + 7
    # bins within a shard are contiguous in doc order
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["bin_id"])
        flat = [i for r in shard_rows for i in r["member_ids"]]
        assert flat == sorted(flat)


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk please"),
            (2, "call +1-555-867-5309 or 44 20 7946 0958 now"),
            (3, "server at 10.0.0.1 responded"),
            (4, "nothing sensitive here"),
        ],
        ["id", "t"],
    )
    out = {r["id"]: r["c"] for r in df.select("id", redact_pii("t").alias("c")).collect()}
    assert out[1] == "mail me at <EMAIL> please"
    assert "<PHONE>" in out[2]
    assert "5309" not in out[2]
    assert out[3] == "server at <IP> responded"
    assert out[4] == "nothing sensitive here"


def test_kmv_estimate_accuracy(spark):
    from onetl_spark.operators.sketches import kmv_distinct_estimate

    df = spark.range(0, 20000).select(
        (F.col("id") % 2).alias("g"),
        # group 0: 10000 distinct values; group 1: 100 distinct values
        F.when(F.col("id") % 2 == 0, F.col("id")).otherwise(F.col("id") % 200).alias("v"),
    )
    out = {r["g"]: r for r in kmv_distinct_estimate(df, ["g"], "v", k=256).collect()}
    # small group: below k → exact
    assert out[1]["estimate"] == out[1]["n_kept"] == 100
    # large group: within 20% at k=256 (theoretical rel-err ~1/sqrt(k-2) ≈ 6%)
    assert out[0]["n_kept"] == 256
    assert abs(out[0]["estimate"] - 10000) / 10000 < 0.2


def test_kmv_rejects_tiny_k(spark):
    from onetl_spark.operators.sketches import kmv_distinct_estimate

    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct_estimate(spark.range(1).select(F.col("id").alias("g"), F.col("id").alias("v")), ["g"], "v", k=1)


def test_weighted_sample_prefers_heavy_rows(spark):
    from onetl_spark.llm.sampling import weighted_sample_topk

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        # half the rows carry 50× the weight
        F.when(F.col("id") < 1000, 50.0).otherwise(1.0).alias("w"),
    )
    kept = weighted_sample_topk(df, "w", k=200, id_col="doc_id")
    rows = kept.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r["doc_id"] < 1000)
    assert heavy > 150  # heavy rows dominate the sample
    # deterministic across invocations
    again = {r["doc_id"] for r in weighted_sample_topk(df, "w", k=200, id_col="doc_id").collect()}
    assert again == {r["doc_id"] for r in rows}
    # zero/negative weights never sampled
    df2 = df.withColumn("w", F.when(F.col("doc_id") < 1900, F.lit(0.0)).otherwise(F.lit(-1.0)))
    assert weighted_sample_topk(df2, "w", k=10, id_col="doc_id").count() == 0


def test_leakage_safe_split_keeps_clusters_together(spark):
    from onetl_spark.llm.sampling import split_by_hash, split_leakage_safe

    # 300 clusters; cluster i has i%4+1 member docs sharing a fingerprint
    rows = []
    doc_id = 0
    for c in range(300):
        for _ in range(c % 4 + 1):
            rows.append((doc_id, f"fp-{c}"))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    out = split_leakage_safe(df, "fp").collect()

    by_fp = {}
    for r in out:
        by_fp.setdefault(r["fp"], set()).add(r["split"])
    assert len(out) == len(rows)
    # the invariant per-row splits violate: no cluster straddles splits
    assert all(len(s) == 1 for s in by_fp.values())
    # each cluster's split equals the per-id split of its representative
    reps = {fp: min(r["doc_id"] for r in out if r["fp"] == fp) for fp in by_fp}
    rep_df = spark.createDataFrame(
        [(v,) for v in reps.values()], "doc_id long",
    )
    rep_split = {r["doc_id"]: r["split"] for r in split_by_hash(rep_df, "doc_id").collect()}
    assert {fp: rep_split[rep] for fp, rep in reps.items()} == {
        fp: next(iter(s)) for fp, s in by_fp.items()
    }
    # all three splits actually populated at this size
    assert {r["split"] for r in out} == {"train", "val", "test"}


def test_leakage_safe_split_null_fingerprints_are_singletons(spark):
    from onetl_spark.llm.sampling import split_by_hash, split_leakage_safe

    # 40 docs share one fingerprint, 60 docs have NULL fingerprints
    rows = [(i, "fp-shared") for i in range(40)]
    rows += [(100 + i, None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    out = split_leakage_safe(df, "fp").collect()

    # no row dropped at the join — the bug singleton keying prevents
    assert len(out) == len(rows)
    assert sorted(r["doc_id"] for r in out) == sorted(r[0] for r in rows)
    # each row lands in exactly one split, internal columns dropped
    assert all(r["split"] in ("train", "val", "test") for r in out)
    assert "__osk_fp" not in split_leakage_safe(df, "fp").columns
    # the shared cluster stays together
    shared = {r["split"] for r in out if r["fp"] == "fp-shared"}
    assert len(shared) == 1
    # each NULL-fp doc is keyed by its OWN id: split == per-id hash split
    null_ids = [r["doc_id"] for r in out if r["fp"] is None]
    per_id = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(
            spark.createDataFrame([(i,) for i in null_ids], "doc_id long"), "doc_id"
        ).collect()
    }
    assert {r["doc_id"]: r["split"] for r in out if r["fp"] is None} == per_id


def test_leakage_safe_split_null_fp_and_null_id_raises(spark):
    from onetl_spark.llm.sampling import split_leakage_safe
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    df = spark.createDataFrame([(1, "fp-a"), (None, None)], "doc_id long, fp string")
    with pytest.raises((Py4JJavaError, PySparkException), match="no stable split key"):
        split_leakage_safe(df, "fp").collect()


def test_trim_to_token_budget_matches_global_sort(spark):
    import random

    from onetl_spark.llm.sampling import trim_to_token_budget

    rng = random.Random(7)
    # scores from a tiny value set force heavy ties; a few NULL scores
    rows = [
        (
            i,
            rng.choice([0.1, 0.25, 0.25, 0.5, 0.9, None]),
            rng.randrange(1, 50),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, tok long")
    budget = 3000
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in trim_to_token_budget(df, budget, "score", "tok").collect()
    }

    # brute force: global sort (score DESC NULLS LAST, id), ranked prefix
    ranked = sorted(rows, key=lambda r: (-(r[1] if r[1] is not None else float("-inf")), r[0]))
    cum = 0
    want = {}
    for i, s, t in ranked:
        cum += t
        if cum > budget:
            break
        want[i] = cum
    assert got == want

    # degenerate budgets
    assert trim_to_token_budget(df, 0, "score", "tok").count() == 0
    total = sum(t for _, _, t in rows)
    assert trim_to_token_budget(df, total, "score", "tok").count() == len(rows)
    with pytest.raises(ValueError, match="budget"):
        trim_to_token_budget(df, -1, "score", "tok")


def test_leakage_safe_split_rejects_internal_column_collision(spark):
    from onetl_spark.llm.sampling import split_leakage_safe

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, fp string, __osk_fp string")
    with pytest.raises(ValueError, match="__osk_fp"):
        split_leakage_safe(df, "fp")


def test_shuffle_into_shards_is_deterministic_permutation(spark):
    from onetl_spark.llm.sampling import shuffle_into_shards

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = shuffle_into_shards(df, 8).collect()
    # every doc exactly once, positions are 1..n per shard with no gaps
    assert sorted(r["doc_id"] for r in out) == list(range(1000))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # shards are roughly balanced (hash-uniform: 125 expected per shard)
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 80 and max(sizes) < 180
    # deterministic across re-execution and re-partitioning
    again = shuffle_into_shards(df.repartition(13), 8).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }
    # the permutation actually shuffles (not identity order within shard)
    first_shard = sorted(by_shard.keys())[0]
    docs_in_order = [
        r["doc_id"] for r in sorted(out, key=lambda r: (r["shard"], r["pos"]))
        if r["shard"] == first_shard
    ]
    assert docs_in_order != sorted(docs_in_order)

    with pytest.raises(ValueError, match="n_shards"):
        shuffle_into_shards(df, 0)


def test_trim_to_token_budget_degenerate_uniform_scores(spark):
    """All-identical scores collapse every approxQuantile boundary into
    one bucket — the result must still equal the ranked-prefix definition
    (ordering degrades to pure id order), and totals stay exact."""
    from onetl_spark.llm.sampling import trim_to_token_budget

    df = spark.range(0, 300).selectExpr(
        "id AS doc_id", "CAST(0.5 AS DOUBLE) AS score", "CAST(10 AS LONG) AS tok"
    )
    out = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in trim_to_token_budget(df, 1005, "score", "tok").collect()
    )
    # ties order by doc_id: first 100 docs fit (1000 <= 1005), doc 100 would
    # overflow to 1010 and is excluded
    assert out == [(i, (i + 1) * 10) for i in range(100)]


def test_trim_to_token_budget_null_tokens(spark):
    """NULL token counts: treated as 0-cost rows (still rank by score),
    never a TypeError from a NULL bucket total, never silently dropped."""
    from onetl_spark.llm.sampling import trim_to_token_budget

    rows = [(1, 0.9, None), (2, 0.8, 100), (3, 0.7, None), (4, 0.6, 100)]
    df = spark.createDataFrame(rows, "doc_id long, score double, tok long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in trim_to_token_budget(df, 150, "score", "tok", buckets=2).collect()
    }
    # ranked by score: 1 (0 tok, cum 0), 2 (cum 100), 3 (cum 100), 4 would
    # push cum to 200 > 150 and is trimmed
    assert got == {1: 0, 2: 100, 3: 100}

    # all-NULL tokens: every row fits any budget >= 0 at cum 0
    all_null = spark.createDataFrame(
        [(i, float(i), None) for i in range(8)], "doc_id long, score double, tok long"
    )
    assert trim_to_token_budget(all_null, 0, "score", "tok", buckets=2).count() == 8


def test_temperature_mix_rates_flatten_and_bind(spark):
    from onetl_spark.llm.sampling import temperature_mix_rates

    rows = [(i, "big", "w " * 16) for i in range(90)] + [
        (1000 + i, "small", "w " * 16) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in temperature_mix_rates(df, temperature=2.0).collect()}
    import math

    p_big, p_small = math.sqrt(90 * 16), math.sqrt(10 * 16)
    share_big = p_big / (p_big + p_small)
    assert abs(out["big"]["share"] - round(share_big, 9)) < 1e-9
    # T=2 flattens: big's tempered share (0.75) < raw share (0.9)
    assert out["big"]["share"] < 0.9
    # the binding (scarcest-relative) domain keeps everything
    assert out["small"]["rate"] == 1.0
    assert 0 < out["big"]["rate"] < 1.0
    # T=1 degenerates to proportional shares → every rate is 1
    prop = {r["source"]: r for r in temperature_mix_rates(df, temperature=1.0).collect()}
    assert prop["big"]["rate"] == 1.0 and prop["small"]["rate"] == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix_rates(df, temperature=0)


def test_apply_mix_rates_deterministic(spark):
    from onetl_spark.llm.sampling import apply_mix_rates, temperature_mix_rates

    rows = [(i, "big", "w " * 16) for i in range(90)] + [
        (1000 + i, "small", "w " * 16) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rates = temperature_mix_rates(df, temperature=2.0)
    a = sorted(r["doc_id"] for r in apply_mix_rates(df, rates).collect())
    b = sorted(r["doc_id"] for r in apply_mix_rates(df.repartition(7), rates).collect())
    assert a == b  # hash-driven: identical under re-partitioning
    assert set(a) >= {1000 + i for i in range(10)}  # binding domain all kept


def test_span_corruption_rate_bounds_and_empty(spark):
    import pytest

    from onetl_spark.llm.sampling import span_corruption

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "")], "doc_id long, text string"
    )
    with pytest.raises(ValueError):
        span_corruption(df, rate_pct=101)
    # rate 0: nothing masked, text round-trips
    out0 = {r["doc_id"]: r for r in span_corruption(df, rate_pct=0).collect()}
    assert out0[1]["corrupted_text"] == "a b c d e f g h"
    assert out0[1]["n_masked"] == 0 and out0[1]["n_spans"] == 0
    assert out0[2]["corrupted_text"] == "" and out0[2]["n_tokens"] == 0
    assert out0[2]["mask_frac"] == 0.0
    # rate 100: everything masked into ONE span
    out100 = {r["doc_id"]: r for r in span_corruption(df, rate_pct=100).collect()}
    assert out100[1]["corrupted_text"] == "<X>"
    assert out100[1]["n_masked"] == 8 and out100[1]["n_spans"] == 1
    assert out100[1]["mask_frac"] == 1.0


def test_span_corruption_spans_collapse_and_deterministic(spark):
    from onetl_spark.llm.sampling import span_corruption

    df = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(200)))], "doc_id long, text string"
    )
    a = span_corruption(df, rate_pct=30).collect()[0]
    b = span_corruption(df, rate_pct=30).collect()[0]
    assert a == b  # hash-driven, not RNG
    assert 0 < a["n_masked"] < 200
    assert a["n_spans"] <= a["n_masked"]
    # sentinel count in the text equals the span count
    assert a["corrupted_text"].split().count("<X>") == a["n_spans"]
    # masked tokens are gone, unmasked survive in order
    kept = [t for t in a["corrupted_text"].split() if t != "<X>"]
    assert kept == sorted(kept, key=lambda t: int(t[1:]))
    assert len(kept) == 200 - a["n_masked"]


def test_kmv_set_ops_exact_small_groups(spark):
    from onetl_spark.operators.sketches import kmv_set_ops

    # below k everything is exact: A={1..10}, B={6..15} per one group
    rows = [("g", "a", v) for v in range(1, 11)] + [("g", "b", v) for v in range(6, 16)]
    df = spark.createDataFrame(rows, "grp string, side string, val long")
    r = kmv_set_ops(df, ["grp"], "side", "val", k=64).collect()[0]
    assert r["est_a"] == 10.0 and r["est_b"] == 10.0
    assert r["est_union"] == 15.0
    assert abs(r["jaccard_est"] - 5 / 15) < 1e-9
    assert abs(r["est_intersection"] - 5.0) < 1e-4


def test_kmv_set_ops_estimates_near_truth(spark):
    from onetl_spark.operators.sketches import kmv_set_ops

    # A = 0..999, B = 500..1499 → union 1500, intersection 500
    rows = [("g", "a", v) for v in range(1000)] + [("g", "b", v) for v in range(500, 1500)]
    df = spark.createDataFrame(rows, "grp string, side string, val long")
    r = kmv_set_ops(df, ["grp"], "side", "val", k=128).collect()[0]
    assert abs(r["est_union"] - 1500) / 1500 < 0.25
    assert abs(r["est_intersection"] - 500) / 500 < 0.45  # resemblance is noisier
    # repeatable bit-for-bit
    r2 = kmv_set_ops(df, ["grp"], "side", "val", k=128).collect()[0]
    assert r == r2


def test_kmv_set_ops_one_sided_group(spark):
    from onetl_spark.operators.sketches import kmv_set_ops

    rows = [("g", "a", v) for v in range(5)]
    df = spark.createDataFrame(rows, "grp string, side string, val long")
    r = kmv_set_ops(df, ["grp"], "side", "val", k=16).collect()[0]
    assert r["est_a"] == 5.0 and r["est_b"] == 0.0
    assert r["est_union"] == 5.0 and r["est_intersection"] == 0.0


def test_kmv_set_ops_ignores_undeclared_sides(spark):
    from onetl_spark.operators.sketches import kmv_set_ops

    rows = [("g", "a", v) for v in range(5)] + [("g", "b", v) for v in range(3, 8)]
    noisy = rows + [("g", "c", v) for v in range(100, 200)]  # stray side
    df_clean = spark.createDataFrame(rows, "grp string, side string, val long")
    df_noisy = spark.createDataFrame(noisy, "grp string, side string, val long")
    r1 = kmv_set_ops(df_clean, ["grp"], "side", "val", k=32).collect()[0]
    r2 = kmv_set_ops(df_noisy, ["grp"], "side", "val", k=32).collect()[0]
    assert r1 == r2  # the 'c' rows must not skew the union sketch
    assert r1["est_union"] == 8.0 and r1["est_intersection"] == 2.0
