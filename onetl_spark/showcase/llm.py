"""LLM-data-pipeline showcase: dedup / similarity / text analysis /
multimodal over the ``documents`` and ``embeddings`` tables, each paired
with a DuckDB oracle that reproduces the computation independently
(identical md5-derived hashing, double-precision arithmetic, rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onetl_spark.llm import dedup, multimodal, sampling, similarity, text
from onetl_spark.llm.sampling import sql_hash_unit
from onetl_spark.llm.dedup import (
    LSH_BANDS,
    LSH_MAX_BUCKET,
    LSH_ROWS,
    MOD,
    NUM_PERM,
    SIMHASH_BITS,
    perm_constants,
)
from onetl_spark.showcase.util import ensure_views, sql_round_hu

# ---------------------------------------------------------------------------
# shared oracle SQL fragments (mirror onetl_spark/llm/text.py exactly)

SQL_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
SQL_SHINGLES = (
    "CASE WHEN len(w) >= 3 THEN "
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) "
    "ELSE [array_to_string(w, ' ')] END"
)
SQL_MD5LONG = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _sql_sig_entries() -> str:
    parts = [
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MOD}))"
        for a, b in perm_constants(NUM_PERM)
    ]
    return "[" + ", ".join(parts) + "]"


# ---------------------------------------------------------------------------
# text analysis


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    return d.select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        text.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       len({SQL_TOKENS}) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       length(text) AS n_chars_actual
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    feats = text.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["stopword_hits"].alias("stopword_hits"),
        text.quality_score("text").alias("quality"),
    )


_EN = "['the','of','and','to','in','is','it','you','that','for']"
QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id, text, {SQL_TOKENS} AS w, length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS n_punct
  FROM documents
), f AS (
  SELECT doc_id, len(w) AS n_tokens,
         {sql_round_hu('n_alpha * 1.0 / greatest(n_chars, 1)')} AS alpha_ratio,
         {sql_round_hu('n_punct * 1.0 / greatest(n_chars, 1)')} AS punct_ratio,
         len(list_intersect(list_distinct(w), {_EN})) AS stopword_hits
  FROM t
)
SELECT doc_id, n_tokens, alpha_ratio, stopword_hits,
       {sql_round_hu("0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * alpha_ratio + 0.2 * least(stopword_hits / 5.0, 1.0) + 0.1 * (1 - least(punct_ratio * 5, 1.0))")} AS quality
FROM f
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    return d.select("doc_id", "lang", text.lang_id("text").alias("lang_pred"))


def _lang_sql() -> str:
    score_cols = []
    for lang, words in text.LANG_STOPWORDS.items():
        arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
        score_cols.append(f"len(list_intersect(dw, {arr})) AS s_{lang}")
    best = "greatest(" + ", ".join(f"s_{l}" for l in text.LANG_PRIORITY) + ")"
    cases = " ".join(
        f"WHEN s_{l} = best AND best > 0 THEN '{l}'" for l in text.LANG_PRIORITY
    )
    return rf"""
WITH t AS (
  SELECT doc_id, lang, list_distinct({SQL_TOKENS}) AS dw FROM documents
), s AS (
  SELECT doc_id, lang, {', '.join(score_cols)} FROM t
), b AS (
  SELECT *, {best} AS best FROM s
)
SELECT doc_id, lang, CASE {cases} ELSE 'und' END AS lang_pred FROM b
"""


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    return d.select("doc_id", text.fingerprint("text").alias("fp"))


FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# dedup


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return dedup.exact_dedup(spark.table("documents"))


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return dedup.minhash_lsh_pairs(spark.table("documents"), threshold=0.5)


def _minhash_sql(source: str = "documents") -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM {source}
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tok
), hs AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {SQL_MD5LONG.format(x='s')} % {MOD}) AS h
  FROM sh
), sig AS (
  SELECT doc_id, h, {_sql_sig_entries()} AS sig FROM hs
), bands AS (
  -- LSH bucket-size cap mirrors minhash_lsh_pairs(max_bucket_size=...)
  SELECT doc_id, b AS band_id,
         md5(array_to_string(sig[b*{LSH_ROWS}+1 : b*{LSH_ROWS}+{LSH_ROWS}], ',')) AS band_key
  FROM sig, range(0, {LSH_BANDS}) t(b)
  QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_key) <= {LSH_MAX_BUCKET}
), cand AS (
  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), ver AS (
  -- verification intersects the HASHED shingle sets, mirroring the Spark
  -- pipeline (which caches long arrays instead of string arrays)
  SELECT a_id, b_id,
         round(len(list_intersect(sa.h, sb.h)) * 1.0 /
               (len(sa.h) + len(sb.h)
                - len(list_intersect(sa.h, sb.h))), 9) AS jaccard
  FROM cand
  JOIN sig sa ON sa.doc_id = a_id
  JOIN sig sb ON sb.doc_id = b_id
)
SELECT a_id, b_id, jaccard FROM ver WHERE jaccard >= 0.5
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(spark.table("documents"), threshold=0.6)


NGRAM_JACCARD_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tok
), sz AS (
  SELECT doc_id, len(shingles) AS size FROM sh
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), common AS (
  -- inverted-index candidates, mirroring ngram_jaccard_pairs: only pairs
  -- that SHARE a shingle can reach any positive Jaccard, so this is
  -- exactly equivalent to all-pairs — the r10/r11 naive a.doc_id<b.doc_id
  -- pair join was a corpus-quadratic PIECEWISE_MERGE_JOIN in DuckDB
  -- (the 600s+ sf1 oracle ceiling); the shingle equality stays ALONE in
  -- the ON clause so DuckDB hash-joins it
  SELECT l.doc_id AS a_id, r.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM inv l JOIN inv r ON l.s = r.s
  WHERE l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(n_common * 1.0 / (sa.size + sb.size - n_common), 9) AS jaccard
FROM common
JOIN sz sa ON sa.doc_id = a_id
JOIN sz sb ON sb.doc_id = b_id
WHERE round(n_common * 1.0 / (sa.size + sb.size - n_common), 9) >= 0.6
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return dedup.simhash_signatures(spark.table("documents"))


def _simhash_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(h, x -> (x >> {b}) & 1 = 1)) > len(h) "
        f"THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), hs AS (
  SELECT doc_id, list_transform(w, t -> {SQL_MD5LONG.format(x='t')}) AS h FROM tok
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM hs
"""


# ---------------------------------------------------------------------------
# similarity search

_COS_SQL = (
    "list_sum(list_transform(range(1, len(a.embedding)+1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return similarity.bruteforce_topk(spark.table("embeddings"), query_id=0, k=10)


ANN_TOPK_SQL = f"""
SELECT b.vec_id, round({_COS_SQL}, 9) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
ORDER BY cos_sim DESC, b.vec_id ASC
LIMIT 10
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT within-label near-dup pairs (salted blocked self-join).
    Guaranteed-complete within each label, and therefore quadratic in
    label-block size BY CONSTRUCTION — the r10 scale screen measured
    108.9x wall-clock for 10x data (SCALE_SCREEN.json): every pair must
    be examined for the completeness guarantee to hold. This is the
    exactness baseline; the linear production path is
    `semantic_near_dup_banded` (banded sign-LSH, logged recall caps),
    with this query as its ground truth for recall evaluation."""
    ensure_views(spark, sf_dir)
    return similarity.near_dup_pairs_by_label(spark.table("embeddings"), threshold=0.3)


NEAR_DUP_SQL = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id, round({_COS_SQL}, 9) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_COS_SQL}, 9) >= 0.3
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the 100TB scale path). Oracle
    reproduces the identical deterministic hyperplanes."""
    ensure_views(spark, sf_dir)
    return similarity.lsh_bucket_topk(spark.table("embeddings"), query_id=0, k=10, n_planes=6)


def _lsh_topk_sql() -> str:
    # identical deterministic hyperplanes, embedded as literals
    planes = []
    for p in range(6):
        comps = [similarity.lsh_plane_component(p, d) for d in range(64)]
        proj = " + ".join(
            f"CAST({{e}}.embedding[{d + 1}] AS DOUBLE) * ({comps[d]!r})" for d in range(64)
        )
        planes.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(planes)
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, ({bucket.format(e='embeddings')}) AS bucket
  FROM embeddings
), q AS (
  SELECT embedding AS qvec, bucket AS qbucket FROM bucketed WHERE vec_id = 0
)
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, len(b.embedding)+1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)
           AS cos_sim
FROM bucketed b, q
WHERE b.bucket = q.qbucket AND b.vec_id <> 0
ORDER BY cos_sim DESC, b.vec_id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# multimodal


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text → binary payload + typed metadata →
    Arrow-batched mapInPandas feature extraction (decode stubbed)."""
    ensure_views(spark, sf_dir)
    payloads = multimodal.with_binary_payload(spark.table("documents"))
    return multimodal.extract_features(payloads)


MULTIMODAL_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       lower(hex(encode(text))[1:2]) AS head_hex
FROM documents
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: 1-in/1-out mapInPandas over binary payloads
    (decode stubbed — digest proves each payload crossed the Arrow batch
    exactly once with the target geometry)."""
    ensure_views(spark, sf_dir)
    payloads = multimodal.with_binary_payload(spark.table("documents"))
    return multimodal.resize_images(payloads, width=64, height=64)


RESIZE_SQL = """
SELECT doc_id, 64 AS width, 64 AS height,
       md5(text || ':64x64') AS resized_digest
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: 1-in/N-out mapInPandas — every 2nd 256-byte frame
    of each payload becomes its own row (the video-keyframe shape)."""
    ensure_views(spark, sf_dir)
    payloads = multimodal.with_binary_payload(spark.table("documents"))
    return multimodal.sample_frames(payloads, frame_size=256, every=2)


# byte-accurate chunking through the hex encoding (DuckDB has no BLOB
# slicing): byte k of the payload = hex chars [2k+1, 2k+2]
FRAME_SAMPLE_SQL = """
WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
SELECT doc_id,
       i AS frame_id,
       CAST(length(substring(hx, CAST(i * 512 + 1 AS BIGINT), 512)) / 2 AS BIGINT)
         AS n_frame_bytes,
       lower(substring(hx, CAST(i * 512 + 1 AS BIGINT), 16)) AS frame_hex
FROM h, unnest(range(0, CAST(ceil(length(hx) / 512.0) AS BIGINT), 2)) t(i)
"""


SPARK_QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality": text_quality,
    "text_lang_id": text_lang_id,
    "text_fingerprints": text_fingerprints,
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "multimodal_features": multimodal_features,
}

ORACLE_SQL = {
    "text_token_stats": TOKEN_STATS_SQL,
    "text_quality": QUALITY_SQL,
    "text_lang_id": _lang_sql(),
    "text_fingerprints": FINGERPRINT_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_simhash": _simhash_sql(),
    "ann_cosine_topk": ANN_TOPK_SQL,
    "ann_lsh_topk": _lsh_topk_sql(),
    "embedding_near_dup_pairs": NEAR_DUP_SQL,
    "multimodal_features": MULTIMODAL_SQL,
}


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return text.tfidf_top_terms(spark.table("documents"), k=3)


TFIDF_SQL = rf"""
WITH words AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS w FROM documents
), tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w
), docfreq AS (
  SELECT w, COUNT(*) AS df FROM tf GROUP BY w
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, w, tf, round(tf * ln(n_docs * 1.0 / df), 9) AS tfidf
  FROM tf JOIN docfreq USING (w) CROSS JOIN n
), ranked AS (
  SELECT doc_id, w AS term, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3
"""

SPARK_QUERIES["text_tfidf_top_terms"] = text_tfidf_top_terms
ORACLE_SQL["text_tfidf_top_terms"] = TFIDF_SQL


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup groups from MinHash-verified pairs: every doc gets
    the min doc_id of its duplicate component."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.dedup_survivors(docs, pairs)


def _survivors_sql() -> str:
    pairs_sql = _minhash_sql().strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
)
SELECT d.doc_id, coalesce(MIN(reach.r), d.doc_id) AS rep_id
FROM documents d LEFT JOIN reach ON reach.node = d.doc_id
GROUP BY d.doc_id
"""

SPARK_QUERIES["dedup_survivors"] = dedup_survivors
ORACLE_SQL["dedup_survivors"] = _survivors_sql()


def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same transitive dedup groups, but forcing the DISTRIBUTED
    connected-components path (large-star/small-star contraction,
    O(log^2 n) rounds independent of component diameter) — the plan a
    100-TB run uses when the duplicate-pair graph itself exceeds driver
    memory. Oracle-identical to ``dedup_survivors``: the algorithm choice
    must never change the answer."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.dedup_survivors(docs, pairs, collect_threshold=0)


SPARK_QUERIES["dedup_components_star"] = dedup_components_star
ORACLE_SQL["dedup_components_star"] = _survivors_sql()


def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composition: quality filter →
    exact dedup (fingerprint) → near-dup removal (MinHash survivors).
    The output is the cleaned corpus a pretraining run would consume.

    Near-dup detection runs ONLY on the quality-kept, fingerprint-distinct
    representatives — mass-duplicated boilerplate is removed by the cheap
    exact stage first, so it can never blow up an LSH bucket (k identical
    docs → k²/2 candidate pairs); this is the order a web-scale dedup
    pipeline must use.
    """
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")

    scored = docs.select(
        "doc_id", "lang",
        text.quality_score("text").alias("quality"),
        text.fingerprint("text").alias("fp"),
    ).filter(F.col("quality") >= 0.5)

    # exact dedup: survivor = min doc_id per fingerprint
    fp_survivors = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # materialize the kept set once: the near-dup stage below runs several
    # jobs (bucket audit, pair checkpoint, component collect) and each
    # would otherwise re-run the regex-heavy quality+fingerprint scoring.
    # kept is (id, lang, quality) — corpus-survivor-sized, not corpus-text
    kept = (
        scored.join(fp_survivors, ["fp", "doc_id"])
        .select("doc_id", "lang", "quality")
        .localCheckpoint(eager=False)
    )

    # near-dup removal over the exact-deduped survivors only
    rep_docs = docs.join(kept.select("doc_id"), "doc_id")
    pairs = dedup.minhash_lsh_pairs(rep_docs, threshold=0.5)
    reps = dedup.dedup_survivors(rep_docs, pairs)
    return (
        kept.join(reps, "doc_id")
        .filter(F.col("rep_id") == F.col("doc_id"))
        .select("doc_id", "lang", "quality")
    )


def _corpus_pipeline_sql() -> str:
    # mirrors the Spark pipeline: quality filter + fingerprint exact dedup
    # FIRST, then MinHash near-dup over the kept representatives only
    pairs_sql = _minhash_sql("kept_docs").strip().rstrip(";")
    return rf"""
WITH RECURSIVE qt AS (
  SELECT doc_id, lang, text, {SQL_TOKENS} AS w, length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS n_punct,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]', '', 'g'),
                                 '\s+', ' ', 'g'))) AS fp
  FROM documents
),
q AS (
  SELECT doc_id, lang, text, fp,
         {sql_round_hu("0.4 * least(len(w) / 100.0, 1.0) + 0.3 * " + sql_round_hu('n_alpha * 1.0 / greatest(n_chars, 1)') + " + 0.2 * least(len(list_intersect(list_distinct(w), " + _EN + ")) / 5.0, 1.0) + 0.1 * (1 - least(" + sql_round_hu('n_punct * 1.0 / greatest(n_chars, 1)') + " * 5, 1.0))")}
           AS quality
  FROM qt
),
scored AS (
  SELECT * FROM q WHERE quality >= 0.5
),
fp_surv AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM scored GROUP BY fp
),
kept_docs AS (
  SELECT s.doc_id, s.lang, s.quality, s.text
  FROM scored s JOIN fp_surv f ON f.fp = s.fp AND f.doc_id = s.doc_id
),
pairs AS ({pairs_sql}),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
),
reps AS (
  SELECT node, MIN(r) AS rep FROM reach GROUP BY node
)
SELECT k.doc_id, k.lang, k.quality
FROM kept_docs k
LEFT JOIN reps ON reps.node = k.doc_id
WHERE coalesce(reps.rep, k.doc_id) = k.doc_id
"""

SPARK_QUERIES["training_corpus_pipeline"] = training_corpus_pipeline
ORACLE_SQL["training_corpus_pipeline"] = _corpus_pipeline_sql()


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids, cluster assignment,
    then exact search within the query's cluster (the 100TB scale path:
    broadcast centroids, no corpus shuffle, candidate set = one cluster)."""
    ensure_views(spark, sf_dir)
    return similarity.ivf_topk(spark.table("embeddings"), query_id=0, k=10)


_IVF_COS = (
    "round(list_sum(list_transform(range(1, len({a}.embedding)+1), "
    "i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform({a}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform({b}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)"
)

ANN_IVF_SQL = f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 64 = 7
), scored AS (
  SELECT v.vec_id, c.centroid_id,
         {_IVF_COS.format(a='v', b='c')} AS ccos
  FROM embeddings v CROSS JOIN centroids c
), assigned AS (
  SELECT vec_id, centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY ccos DESC, centroid_id ASC) AS rn
        FROM scored)
  WHERE rn = 1
), q AS (
  SELECT e.embedding AS qvec, a.centroid_id AS qc
  FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id
  WHERE e.vec_id = 0
)
SELECT v.vec_id,
       round(list_sum(list_transform(range(1, len(v.embedding)+1),
             i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)
         AS cos_sim
FROM embeddings v
JOIN assigned a ON a.vec_id = v.vec_id
CROSS JOIN q
WHERE a.centroid_id = q.qc AND v.vec_id <> 0
ORDER BY cos_sim DESC, v.vec_id ASC
LIMIT 10
"""

SPARK_QUERIES["ann_ivf_topk"] = ann_ivf_topk
ORACLE_SQL["ann_ivf_topk"] = ANN_IVF_SQL


def ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with Lloyd-refined centroids (2 iterations) and nprobe=2:
    the recall-improved scale path — centroid refinement is broadcast-join
    + map-side-combined means (never a corpus shuffle), search touches
    only the 2 clusters nearest the query."""
    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    refined = similarity.ivf_refine_centroids(emb, iterations=2)
    return similarity.ivf_topk(emb, query_id=0, k=10, nprobe=2, centroids=refined)


def _cos_sql(a: str, b: str) -> str:
    """Cosine between two SQL list expressions, double math, round 9 —
    identical shape to the Spark zip_with/aggregate fold."""
    return (
        f"round(list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
        f"(sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
        f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)"
    )


def _ivf_nprobe_sql(iterations: int = 2, nprobe: int = 2, k: int = 10) -> str:
    # unrolled Lloyd iterations: c0 → (assign, means) → c1 → ... → c{n};
    # final assignment + probe selection mirror similarity.ivf_topk
    def assign(src_c: str) -> str:
        return f"""(
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.embedding', 'c.cvec')} DESC,
                                       c.centroid_id ASC) AS rn
    FROM embeddings v CROSS JOIN {src_c} c)
  WHERE rn = 1
)"""

    def means(src_a: str, src_c: str) -> str:
        return f"""(
  SELECT s.centroid_id, coalesce(m.mvec, s.cvec) AS cvec
  FROM {src_c} s LEFT JOIN (
    SELECT centroid_id, list(mm ORDER BY d) AS mvec FROM (
      SELECT a.centroid_id, t.d,
             CAST(SUM(CAST(CAST(v.embedding[t.d] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS mm
      FROM {src_a} a
      JOIN embeddings v ON v.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(d)
      GROUP BY a.centroid_id, t.d)
    GROUP BY centroid_id) m ON m.centroid_id = s.centroid_id
)"""

    ctes = ["c0 AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 64 = 7)"]
    for i in range(iterations):
        ctes.append(f"a{i} AS {assign(f'c{i}')}")
        ctes.append(f"c{i + 1} AS {means(f'a{i}', f'c{i}')}")
    final_c = f"c{iterations}"
    ctes.append(f"afinal AS {assign(final_c)}")
    ctes.append("qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)")
    ctes.append(
        f"""probes AS (
  SELECT centroid_id FROM (
    SELECT c.centroid_id, {_cos_sql('c.cvec', 'q.qvec')} AS qcos
    FROM {final_c} c CROSS JOIN qv q)
  ORDER BY qcos DESC, centroid_id ASC
  LIMIT {nprobe}
)""",
    )
    return f"""
WITH {','.join(ctes)}
SELECT v.vec_id, {_cos_sql('v.embedding', 'q.qvec')} AS cos_sim
FROM embeddings v
JOIN afinal a ON a.vec_id = v.vec_id
JOIN probes p ON p.centroid_id = a.centroid_id
CROSS JOIN qv q
WHERE v.vec_id <> 0
ORDER BY cos_sim DESC, v.vec_id ASC
LIMIT {k}
"""


SPARK_QUERIES["ann_ivf_nprobe"] = ann_ivf_nprobe
ORACLE_SQL["ann_ivf_nprobe"] = _ivf_nprobe_sql()


def ann_topk_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN: top-5 neighbours for each of 3 query vectors in one
    pass (two-phase top-k — no corpus-sized single-partition window)."""
    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"),
    )
    out = similarity.topk_per_query(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"),
    )


ANN_TOPK_PER_QUERY_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_cos_sql('v.embedding', 'q.qvec')} AS cos_sim
  FROM embeddings v CROSS JOIN q
  WHERE v.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

SPARK_QUERIES["ann_topk_per_query"] = ann_topk_per_query
ORACLE_SQL["ann_topk_per_query"] = ANN_TOPK_PER_QUERY_SQL


def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over int8-quantized embeddings — 4× smaller scan/shuffle than
    float32, integer dot products (exact cross-engine arithmetic)."""
    ensure_views(spark, sf_dir)
    return similarity.quantized_topk(spark.table("embeddings"), query_id=0, k=10)


# per-vector symmetric int8: scale = max|x|/127, q = round(x/scale);
# cosine over the INTEGER vectors (scales cancel in the ratio)
ANN_QUANTIZED_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) /
                (greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30)
                 / 127.0)) AS BIGINT)) AS qvec
  FROM embeddings
), n AS (
  SELECT vec_id, qvec,
         sqrt(CAST(list_sum(list_transform(qvec, v -> v * v)) AS DOUBLE)) AS qn
  FROM q
), qq AS (
  SELECT qvec AS _qq, qn AS _qqn FROM n WHERE vec_id = 0
)
SELECT b.vec_id,
       round(CAST(list_sum(list_transform(range(1, len(b.qvec)+1),
                 i -> b.qvec[i] * qq._qq[i])) AS DOUBLE) / (b.qn * qq._qqn), 9) AS qcos_sim
FROM n b CROSS JOIN qq
WHERE b.vec_id <> 0
ORDER BY qcos_sim DESC, b.vec_id ASC
LIMIT 10
"""

SPARK_QUERIES["ann_quantized_topk"] = ann_quantized_topk
ORACLE_SQL["ann_quantized_topk"] = ANN_QUANTIZED_SQL


def dedup_minhash_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-blocked MinHash near-dup pairs: the lang column is hashed
    into every LSH band key, so candidates only form within a language —
    fewer false positives AND bounded bucket sizes on multilingual data."""
    ensure_views(spark, sf_dir)
    return dedup.minhash_lsh_pairs(
        spark.table("documents"), threshold=0.5, block_col="lang",
    )


def _minhash_by_lang_sql() -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id, coalesce(CAST(lang AS VARCHAR), '') AS _blk, {SQL_TOKENS} AS w
  FROM documents
), sh AS (
  SELECT doc_id, _blk, {SQL_SHINGLES} AS shingles FROM tok
), hs AS (
  SELECT doc_id, _blk,
         list_transform(shingles, s -> {SQL_MD5LONG.format(x='s')} % {MOD}) AS h
  FROM sh
), sig AS (
  SELECT doc_id, _blk, h, {_sql_sig_entries()} AS sig FROM hs
), bands AS (
  SELECT doc_id, b AS band_id,
         md5(_blk || '|' ||
             array_to_string(sig[b*{LSH_ROWS}+1 : b*{LSH_ROWS}+{LSH_ROWS}], ',')) AS band_key
  FROM sig, range(0, {LSH_BANDS}) t(b)
  QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_key) <= {LSH_MAX_BUCKET}
), cand AS (
  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), ver AS (
  SELECT a_id, b_id,
         round(len(list_intersect(sa.h, sb.h)) * 1.0 /
               (len(sa.h) + len(sb.h)
                - len(list_intersect(sa.h, sb.h))), 9) AS jaccard
  FROM cand
  JOIN sig sa ON sa.doc_id = a_id
  JOIN sig sb ON sb.doc_id = b_id
)
SELECT a_id, b_id, jaccard FROM ver WHERE jaccard >= 0.5
"""


SPARK_QUERIES["dedup_minhash_by_lang"] = dedup_minhash_by_lang
ORACLE_SQL["dedup_minhash_by_lang"] = _minhash_by_lang_sql()

SPARK_QUERIES["multimodal_resize"] = multimodal_resize
ORACLE_SQL["multimodal_resize"] = RESIZE_SQL

SPARK_QUERIES["multimodal_frame_sample"] = multimodal_frame_sample
ORACLE_SQL["multimodal_frame_sample"] = FRAME_SAMPLE_SQL


# ---------------------------------------------------------------------------
# benchmark decontamination, corpus stats, document chunking


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 17th document plays the benchmark/eval set; the rest of the
    corpus is scored for n-gram overlap against it."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    bench = docs.filter("doc_id % 17 = 0")
    corpus = docs.filter("doc_id % 17 <> 0")
    return dedup.benchmark_contamination(corpus, bench, threshold=0.2)


DECONTAM_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tok
), hs AS (
  SELECT doc_id,
         list_transform(shingles, s -> {SQL_MD5LONG.format(x='s')} % {MOD}) AS h
  FROM sh
), bench AS (
  SELECT DISTINCT unnest(h) AS g FROM hs WHERE doc_id % 17 = 0
), grams AS (
  SELECT doc_id, unnest(h) AS g FROM hs WHERE doc_id % 17 <> 0
), counts AS (
  SELECT grams.doc_id,
         CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS matched_shingles,
         COUNT(*) AS total_shingles
  FROM grams LEFT JOIN bench ON grams.g = bench.g
  GROUP BY grams.doc_id
)
SELECT doc_id, matched_shingles, total_shingles,
       round(matched_shingles * 1.0 / total_shingles, 9) AS overlap_ratio,
       round(matched_shingles * 1.0 / total_shingles, 9) >= 0.2 AS contaminated
FROM counts
"""


def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return text.corpus_stats(spark.table("documents"), group_cols=("lang",))


CORPUS_STATS_SQL = rf"""
WITH t AS (SELECT lang, len({SQL_TOKENS}) AS n FROM documents)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
       SUM(n) * 1.0 / COUNT(*) AS avg_tokens,
       round(quantile_cont(n, 0.5), 9) AS p50_tokens,
       round(quantile_cont(n, 0.9), 9) AS p90_tokens,
       MIN(n) AS min_tokens, MAX(n) AS max_tokens
FROM t GROUP BY lang
"""


def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token training windows with 16-token overlap (stride 48)."""
    ensure_views(spark, sf_dir)
    return sampling.chunk_documents(
        spark.table("documents"), chunk_tokens=64, overlap=16
    )


CHUNKS_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), s AS (
  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 48)) AS st
  FROM tok WHERE len(w) > 0
)
SELECT doc_id, st // 48 AS chunk_idx,
       len(w[st + 1 : st + 64]) AS n_tokens,
       array_to_string(w[st + 1 : st + 64], ' ') AS chunk_text
FROM s
"""


SPARK_QUERIES["benchmark_decontamination"] = benchmark_decontamination
ORACLE_SQL["benchmark_decontamination"] = DECONTAM_SQL

SPARK_QUERIES["corpus_stats_by_lang"] = corpus_stats_by_lang
ORACLE_SQL["corpus_stats_by_lang"] = CORPUS_STATS_SQL

SPARK_QUERIES["document_chunks"] = document_chunks
ORACLE_SQL["document_chunks"] = CHUNKS_SQL


def segment_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove 16-token segments shared by more than 2 documents (line-level
    boilerplate removal), reassembling each document in order."""
    ensure_views(spark, sf_dir)
    return dedup.remove_repeated_segments(
        spark.table("documents"), segment_tokens=16, max_df=2
    )


SEGMENT_DEDUP_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), s AS (
  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 16)) AS st
  FROM tok WHERE len(w) > 0
), seg AS (
  SELECT doc_id, st // 16 AS idx, array_to_string(w[st + 1 : st + 16], ' ') AS t
  FROM s
), segh AS (
  SELECT doc_id, idx, t, {SQL_MD5LONG.format(x='t')} AS h FROM seg
), c AS (
  SELECT h, count(DISTINCT doc_id) AS dfc FROM segh GROUP BY h
)
SELECT segh.doc_id,
       COALESCE(string_agg(CASE WHEN c.dfc <= 2 THEN segh.t END, ' ' ORDER BY segh.idx), '') AS clean_text,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN c.dfc > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_segments_removed
FROM segh JOIN c ON segh.h = c.h
GROUP BY segh.doc_id
"""


def domain_reweight_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap src0 at 1% and src1 at 2% of total corpus tokens via
    deterministic subsampling; report the per-domain outcome."""
    ensure_views(spark, sf_dir)
    kept = sampling.reweight_domains(
        spark.table("documents"), {"src0": 0.01, "src1": 0.02}
    )
    return kept.groupBy("source").agg(
        F.round(F.first("sample_rate"), 9).alias("sample_rate"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(text.token_count(F.col("text"))).alias("tokens_kept"),
    )


DOMAIN_REWEIGHT_SQL = rf"""
WITH t AS (
  SELECT source, doc_id, text, len({SQL_TOKENS}) AS nt FROM documents
), dom AS (
  SELECT source, SUM(nt) AS dt FROM t GROUP BY source
), r AS (
  SELECT source, dt,
         CASE source
           WHEN 'src0' THEN LEAST(1.0, 0.01 * (SELECT SUM(dt) FROM dom) / dt)
           WHEN 'src1' THEN LEAST(1.0, 0.02 * (SELECT SUM(dt) FROM dom) / dt)
           ELSE 1.0
         END AS sample_rate
  FROM dom
)
SELECT t.source, round(r.sample_rate, 9) AS sample_rate,
       COUNT(*) AS n_kept, CAST(SUM(t.nt) AS BIGINT) AS tokens_kept
FROM t JOIN r ON t.source = r.source
WHERE {sql_hash_unit('t.doc_id', 'reweight')} < r.sample_rate
GROUP BY t.source, r.sample_rate
"""


def encoding_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health per document: graft deterministic mojibake /
    replacement-char / control-char corruption onto doc_id-selected
    subsets (the clean synthetic corpus has none), then measure — pure
    per-row JVM regexp projections, zero shuffle."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" cafÃ© aâ€™s")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" bad�char")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" ctl\x07x")).otherwise(F.lit("")),
        ).alias("_t"),
    )
    feats = text.encoding_quality("_t")
    return dirty.select(
        "doc_id", *[v.alias(k) for k, v in feats.items()]
    )


ENCODING_SQL = (
    """
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' cafÃ© aâ€™s' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' bad' || chr(65533) || 'char' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' ctl' || chr(7) || 'x' ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '"""
    + text.REPLACEMENT_CHAR
    + """')) AS BIGINT) AS n_replacement,
       CAST(len(regexp_extract_all(t, '"""
    + text.CONTROL_PATTERN
    + """')) AS BIGINT) AS n_control,
       CAST(len(regexp_extract_all(t, '"""
    + text.MOJIBAKE_PATTERN
    + """')) AS BIGINT) AS n_mojibake,
       len(regexp_extract_all(t, '"""
    + text.REPLACEMENT_CHAR
    + """')) + len(regexp_extract_all(t, '"""
    + text.CONTROL_PATTERN
    + """')) + len(regexp_extract_all(t, '"""
    + text.MOJIBAKE_PATTERN
    + """')) = 0 AS enc_clean
FROM d
"""
)

SPARK_QUERIES["encoding_quality_stats"] = encoding_quality_stats
ORACLE_SQL["encoding_quality_stats"] = ENCODING_SQL


SPARK_QUERIES["segment_dedup_clean"] = segment_dedup_clean
ORACLE_SQL["segment_dedup_clean"] = SEGMENT_DEDUP_SQL

SPARK_QUERIES["domain_reweight_sample"] = domain_reweight_sample
ORACLE_SQL["domain_reweight_sample"] = DOMAIN_REWEIGHT_SQL


def top_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return text.top_terms(spark.table("documents"), k=10)


TOP_TERMS_SQL = rf"""
WITH words AS (
  SELECT lang, unnest({SQL_TOKENS}) AS term FROM documents
), counts AS (
  SELECT lang, term, COUNT(*) AS n_occurrences FROM words GROUP BY lang, term
)
SELECT lang, term, n_occurrences, rank FROM (
  SELECT lang, term, n_occurrences,
         row_number() OVER (PARTITION BY lang ORDER BY n_occurrences DESC, term) AS rank
  FROM counts
) WHERE rank <= 10
"""


SPARK_QUERIES["top_terms_by_lang"] = top_terms_by_lang
ORACLE_SQL["top_terms_by_lang"] = TOP_TERMS_SQL


def semantic_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-blocked embedding near-dups with 2-probe assignment — no
    metadata label needed. The centroid set grows as corpus/64, so the
    assignment arm is O(N²/64): the r10 scale harness measured α = 1.22
    (SCALE_CURVE.json). Kept as the exact-within-cells variant; the
    linear scale path is `semantic_near_dup_banded`."""
    ensure_views(spark, sf_dir)
    return similarity.semantic_near_dup_pairs(
        spark.table("embeddings"), threshold=0.3, nprobe=2
    )


SEMANTIC_NEAR_DUP_SQL = f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 64 = 7
), scored AS (
  SELECT v.vec_id, v.embedding AS vvec, c.centroid_id,
         {_IVF_COS.format(a='v', b='c')} AS ccos
  FROM embeddings v CROSS JOIN centroids c
), assigned AS (
  SELECT vec_id, vvec AS embedding, centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY ccos DESC, centroid_id ASC) AS rn
        FROM scored)
  WHERE rn <= 2
)
SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id, round({_COS_SQL}, 9) AS cos_sim
FROM assigned a JOIN assigned b
  ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
WHERE round({_COS_SQL}, 9) >= 0.3
"""


SPARK_QUERIES["semantic_near_dup"] = semantic_near_dup
ORACLE_SQL["semantic_near_dup"] = SEMANTIC_NEAR_DUP_SQL


_CONTAINMENT_MAX_DF = 64


def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents whose shingles are ≥60% contained in another document,
    over the informative-shingle universe (document frequency ≤ 64 — the
    hot-shingle cap that keeps the Σdf² inverted-index join bounded at
    corpus scale)."""
    ensure_views(spark, sf_dir)
    return dedup.ngram_containment_pairs(
        spark.table("documents"), threshold=0.6, max_df=_CONTAINMENT_MAX_DF
    )


NGRAM_CONTAINMENT_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tok
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), keep AS (
  -- mirror max_df={_CONTAINMENT_MAX_DF}: drop hot shingles from the universe
  SELECT doc_id, s FROM ex
  QUALIFY COUNT(*) OVER (PARTITION BY s) <= {_CONTAINMENT_MAX_DF}
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM keep GROUP BY doc_id
), p AS (
  SELECT a.doc_id AS x_id, b.doc_id AS y_id, COUNT(*) AS n_common
  FROM keep a JOIN keep b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, containment FROM (
  SELECT p.x_id AS a_id, p.y_id AS b_id,
         round(p.n_common * 1.0 / sx.sz, 9) AS containment
  FROM p JOIN sizes sx ON sx.doc_id = p.x_id
  UNION ALL
  SELECT p.y_id AS a_id, p.x_id AS b_id,
         round(p.n_common * 1.0 / sy.sz, 9) AS containment
  FROM p JOIN sizes sy ON sy.doc_id = p.y_id
)
WHERE containment >= 0.6
"""


SPARK_QUERIES["ngram_containment"] = ngram_containment
ORACLE_SQL["ngram_containment"] = NGRAM_CONTAINMENT_SQL


def multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over binary payloads via the Arrow-batched
    multimodal path; bits are integer cross-multiplications so the SQL
    oracle reproduces them exactly."""
    ensure_views(spark, sf_dir)
    # same ASCII byte==char guard as multimodal_scene_changes: the hash is
    # over UTF-8 bytes, the oracle over ascii() codepoints.
    payloads = multimodal.with_binary_payload(
        spark.table("documents").filter(F.octet_length("text") == F.length("text"))
    )
    return multimodal.image_ahash(payloads)


def _ahash_sql() -> str:
    from onetl_spark.llm.multimodal import AHASH_CELLS

    terms = " + ".join(
        f"(CASE WHEN coalesce(list_sum(c[({i} * n) // {AHASH_CELLS} + 1 : ({i + 1} * n) // {AHASH_CELLS}]), 0) * n"
        f" > total * ((({i + 1} * n) // {AHASH_CELLS}) - (({i} * n) // {AHASH_CELLS}))"
        f" THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(AHASH_CELLS)
    )
    return rf"""
WITH codes AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))) AS c,
         length(text) AS n
  FROM documents WHERE length(text) > 0 AND strlen(text) = length(text)
), t AS (
  SELECT doc_id, c, n, list_sum(c) AS total FROM codes
)
SELECT doc_id, CAST({terms} AS BIGINT) AS ahash FROM t
UNION ALL
SELECT doc_id, 0 AS ahash FROM documents WHERE length(text) = 0
"""


SPARK_QUERIES["multimodal_ahash"] = multimodal_ahash
ORACLE_SQL["multimodal_ahash"] = _ahash_sql()


_PNG_W, _PNG_H, _PNG_DOCS = 16, 16, 48


def png_roundtrip_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec oracle check (`llm/png.py encode_png_gray/
    decode_png_gray` + `llm/multimodal.py image_ahash`): deterministic
    16×16 grayscale fixtures (pixel = f(doc_id, y, x)) are PNG-ENCODED
    with all five scanline filters cycling per row, then pushed through
    the production `image_ahash` operator, which detects the PNG
    signature, inflates + unfilters the payload, and hashes the decoded
    pixels. The DuckDB oracle computes the expected aHash directly from
    the pixel formula — a hash match proves encode→decode→hash is the
    identity on pixels THROUGH the codec, with an engine that never saw
    a PNG. Arrow-batched mapInPandas both ways; payloads never leave
    the executor batch — the shape scales to billions of images."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm import png as _png

    w, h = _PNG_W, _PNG_H

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                px = bytes(
                    (int(doc_id) * 7 + y * 5 + x * 3) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(_png.encode_png_gray(px, w, h, filters=[0, 1, 2, 3, 4]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})

    fixtures = (
        spark.table("documents")
        .filter(F.col("doc_id") < _PNG_DOCS)
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )
    return multimodal.image_ahash(fixtures)


def _png_roundtrip_sql() -> str:
    from onetl_spark.llm.multimodal import AHASH_CELLS

    n = _PNG_W * _PNG_H
    terms = " + ".join(
        f"(CASE WHEN list_sum(c[({i} * {n}) // {AHASH_CELLS} + 1 : ({i + 1} * {n}) // {AHASH_CELLS}]) * {n}"
        f" > total * ((({i + 1} * {n}) // {AHASH_CELLS}) - (({i} * {n}) // {AHASH_CELLS}))"
        f" THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(AHASH_CELLS)
    )
    return f"""
WITH px AS (
  SELECT doc_id,
         list_transform(range(0, {n}),
           i -> (doc_id * 7 + (i // {_PNG_W}) * 5 + (i % {_PNG_W}) * 3) % 256) AS c
  FROM documents WHERE doc_id < {_PNG_DOCS}
), t AS (
  SELECT doc_id, c, list_sum(c) AS total FROM px
)
SELECT doc_id, CAST({terms} AS BIGINT) AS ahash FROM t
"""


SPARK_QUERIES["png_roundtrip_ahash"] = png_roundtrip_ahash
ORACLE_SQL["png_roundtrip_ahash"] = _png_roundtrip_sql()


_JPEG_W, _JPEG_H, _JPEG_DOCS, _JPEG_Q = 16, 16, 12, 90


def _jpeg_fixture_pixels(doc_id: int) -> bytes:
    return bytes(
        (doc_id * 11 + y * 7 + x * 5) % 256
        for y in range(_JPEG_H)
        for x in range(_JPEG_W)
    )


def jpeg_roundtrip_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG codec check through the production multimodal path
    (`llm/jpeg.py encode/decode` + `llm/multimodal.py image_ahash`):
    deterministic fixtures are JPEG-encoded with restart markers AND an
    interleaved 3-component scan (the decoder must entropy-skip chroma
    to stay in sync), then hashed by the distributed `image_ahash`.
    JPEG is lossy, so the oracle cannot derive the hash from the pixel
    formula (that engine-independent check is `png_roundtrip_ahash`);
    instead the oracle embeds the DRIVER-side pure-Python
    encode→decode→ahash results as literals — the distributed
    Arrow-batched path must reproduce the local codec bit-for-bit, the
    same local-vs-distributed contract BPE driver mode pins."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm import jpeg as _jpeg

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads = [
                _jpeg.encode_jpeg_gray(
                    _jpeg_fixture_pixels(int(d)), _JPEG_W, _JPEG_H,
                    quality=_JPEG_Q, restart_interval=2, components=3,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})

    fixtures = (
        spark.table("documents")
        .filter(F.col("doc_id") < _JPEG_DOCS)
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )
    return multimodal.image_ahash(fixtures)


def _jpeg_roundtrip_sql() -> str:
    from onetl_spark.llm import jpeg as _jpeg
    from onetl_spark.llm.multimodal import ahash_bits

    rows = []
    for d in range(_JPEG_DOCS):
        payload = _jpeg.encode_jpeg_gray(
            _jpeg_fixture_pixels(d), _JPEG_W, _JPEG_H,
            quality=_JPEG_Q, restart_interval=2, components=3,
        )
        rows.append((d, ahash_bits(_jpeg.decode_jpeg_gray(payload)[2])))
    values = ", ".join(f"({d}, {h}::BIGINT)" for d, h in rows)
    # join against documents so the oracle only claims doc_ids that exist
    return f"""
WITH expected(doc_id, ahash) AS (VALUES {values})
SELECT d.doc_id, e.ahash
FROM documents d JOIN expected e ON e.doc_id = d.doc_id
"""


SPARK_QUERIES["jpeg_roundtrip_ahash"] = jpeg_roundtrip_ahash
ORACLE_SQL["jpeg_roundtrip_ahash"] = _jpeg_roundtrip_sql()


_WAV_N, _WAV_DOCS, _WAV_FRAME, _WAV_HOP, _WAV_THRESH = 120, 24, 16, 8, 60_000


def wav_roundtrip_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-audio oracle check (`llm/wav.py encode/decode` +
    `llm/multimodal.py audio_frame_energy`): deterministic int16
    "chirps" (sample = f(doc_id, i)) are encoded as STEREO RIFF/PCM
    WAV files, then pushed through the production frame-energy
    operator, which detects the RIFF signature, chunk-walks the file,
    PCM-decodes + integer-downmixes, and computes integer frame
    statistics. The DuckDB oracle computes the SAME statistics straight
    from the sample formula — a hash match proves
    encode→decode→analyze is the identity on samples through a codec
    the oracle never runs. Arrow-batched mapInPandas; payloads stay on
    executors."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm import wav as _wav

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                s = [
                    (int(d) * 13 + i * 37) % 200 - 100 for i in range(_WAV_N)
                ]
                payloads.append(_wav.encode_wav_pcm16(s, channels=2))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})

    fixtures = (
        spark.table("documents")
        .filter(F.col("doc_id") < _WAV_DOCS)
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )
    return multimodal.audio_frame_energy(
        fixtures, frame=_WAV_FRAME, hop=_WAV_HOP, active_threshold=_WAV_THRESH
    )


def _wav_roundtrip_sql() -> str:
    n, frame, hop = _WAV_N, _WAV_FRAME, _WAV_HOP
    n_frames = (n - frame) // hop + 1 if n >= frame else 0
    return f"""
WITH s AS (
  SELECT doc_id, i.i AS i,
         (doc_id * 13 + i.i * 37) % 200 - 100 AS v
  FROM documents, range(0, {n}) i(i)
  WHERE doc_id < {_WAV_DOCS}
), base AS (
  SELECT doc_id,
         COUNT(*) AS n_samples,
         CAST(SUM(v * v) AS BIGINT) AS sum_sq,
         CAST(MAX(abs(v)) AS BIGINT) AS peak_dev
  FROM s GROUP BY doc_id
), fr AS (
  SELECT s.doc_id, k.k AS k, SUM(s.v * s.v) AS e
  FROM s, range(0, {n_frames}) k(k)
  WHERE s.i >= k.k * {hop} AND s.i < k.k * {hop} + {frame}
  GROUP BY s.doc_id, k.k
), act AS (
  SELECT doc_id,
         COUNT(*) AS n_frames,
         CAST(SUM(CASE WHEN e >= {_WAV_THRESH} THEN 1 ELSE 0 END) AS BIGINT) AS n_active
  FROM fr GROUP BY doc_id
)
SELECT base.doc_id,
       CAST(base.n_samples AS BIGINT) AS n_samples,
       base.sum_sq, base.peak_dev,
       CAST(act.n_frames AS BIGINT) AS n_frames,
       act.n_active
FROM base JOIN act USING (doc_id)
"""


SPARK_QUERIES["wav_roundtrip_energy"] = wav_roundtrip_energy
ORACLE_SQL["wav_roundtrip_energy"] = _wav_roundtrip_sql()


_SIMHASH_MAX_DIST = 3  # shared by the Spark query AND its oracle banding


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pairs within Hamming distance 3 via multi-index banding —
    the pigeonhole equi-join, never an N² comparison."""
    ensure_views(spark, sf_dir)
    sigs = dedup.simhash_signatures(spark.table("documents"))
    return dedup.hamming_near_dup_pairs(sigs, max_dist=_SIMHASH_MAX_DIST)


def _simhash_near_dup_sql() -> str:
    # Mirrors hamming_near_dup_pairs EXACTLY — including the multi-index
    # banding and the over-capacity-band drop (the same QUALIFY cap the
    # MinHash-LSH oracles carry). An idealized all-pairs oracle matches
    # only while no band exceeds LSH_MAX_BUCKET; on a low-entropy corpus
    # at sf1 the cap binds (by design, logged) and the idealized form
    # diverged 230k vs 627k pairs — the sf1 parity sweep caught it.
    sim = _simhash_sql().strip().rstrip(";")
    # derive banding from the operator's own constants so the oracle can
    # never silently desync from hamming_near_dup_pairs (r10 advice):
    # n_bands = max_dist + 1 disjoint bands over SIMHASH_BITS
    max_dist = _SIMHASH_MAX_DIST
    n_bands = max_dist + 1
    width = dedup.SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    return f"""
WITH sigs AS ({sim}), bands AS (
  SELECT doc_id, simhash, band_idx,
         (simhash >> (band_idx * {width})) & {mask} AS band_bits
  FROM sigs CROSS JOIN (SELECT unnest(range({n_bands})) AS band_idx)
  QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_bits) <= {LSH_MAX_BUCKET}
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
              AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, hamming FROM cand WHERE hamming <= {max_dist}
"""


SPARK_QUERIES["simhash_near_dup"] = simhash_near_dup
ORACLE_SQL["simhash_near_dup"] = _simhash_near_dup_sql()


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return similarity.embedding_outlier_scores(spark.table("embeddings"))


EMBEDDING_OUTLIERS_SQL = f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 64 = 7
), scored AS (
  SELECT v.vec_id, c.centroid_id,
         {_IVF_COS.format(a='v', b='c')} AS ccos
  FROM embeddings v CROSS JOIN centroids c
)
SELECT vec_id, centroid_id, round(1.0 - ccos, 9) AS outlier_score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ccos DESC, centroid_id ASC) AS rn
      FROM scored)
WHERE rn = 1
"""


def hybrid_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-prefiltered exact vector search: only documents containing
    'spark' compete for the top-10 by cosine to query vector 0."""
    ensure_views(spark, sf_dir)
    return similarity.hybrid_filtered_topk(
        spark.table("documents"), spark.table("embeddings"), query_id=0, keyword="spark", k=10
    )


HYBRID_SEARCH_SQL = f"""
WITH keep AS (
  SELECT doc_id FROM documents WHERE text LIKE '%spark%'
), q AS (
  SELECT embedding FROM embeddings WHERE vec_id = 0
)
SELECT b.vec_id, round({_COS_SQL.replace('a.embedding', 'q.embedding').replace('b.embedding', 'b.embedding')}, 9) AS cos_sim
FROM embeddings b CROSS JOIN q
WHERE b.vec_id IN (SELECT doc_id FROM keep) AND b.vec_id <> 0
ORDER BY cos_sim DESC, b.vec_id ASC
LIMIT 10
"""


SPARK_QUERIES["embedding_outliers"] = embedding_outliers
ORACLE_SQL["embedding_outliers"] = EMBEDDING_OUTLIERS_SQL

SPARK_QUERIES["hybrid_search_topk"] = hybrid_search_topk
ORACLE_SQL["hybrid_search_topk"] = HYBRID_SEARCH_SQL


def ann_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank: int8-quantized coarse top-50, exact float
    cosine rerank to top-10 — the production coarse+refine ANN shape."""
    ensure_views(spark, sf_dir)
    return similarity.two_stage_rerank_topk(
        spark.table("embeddings"), query_id=0, k=10, candidates=50,
    )


ANN_TWO_STAGE_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) /
                (greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30)
                 / 127.0)) AS BIGINT)) AS qvec
  FROM embeddings
), n AS (
  SELECT vec_id, qvec,
         sqrt(CAST(list_sum(list_transform(qvec, v -> v * v)) AS DOUBLE)) AS qn
  FROM q
), qq AS (
  SELECT qvec AS _qq, qn AS _qqn FROM n WHERE vec_id = 0
), coarse AS (
  SELECT b.vec_id,
         round(CAST(list_sum(list_transform(range(1, len(b.qvec)+1),
                   i -> b.qvec[i] * qq._qq[i])) AS DOUBLE) / (b.qn * qq._qqn), 9) AS qcos_sim
  FROM n b CROSS JOIN qq
  WHERE b.vec_id <> 0
  ORDER BY qcos_sim DESC, b.vec_id ASC
  LIMIT 50
), fq AS (
  SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0
)
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, len(b.embedding)+1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(fq.qvec[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(fq.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)
           AS cos_sim
FROM embeddings b CROSS JOIN fq
WHERE b.vec_id IN (SELECT vec_id FROM coarse)
ORDER BY cos_sim DESC, b.vec_id ASC
LIMIT 10
"""

SPARK_QUERIES["ann_two_stage_rerank"] = ann_two_stage_rerank
ORACLE_SQL["ann_two_stage_rerank"] = ANN_TWO_STAGE_SQL


def ann_projected_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k in an 8-dim Johnson-Lindenstrauss random projection of
    the 64-dim embeddings — an 8x narrower scan/shuffle for approximate
    angular search."""
    ensure_views(spark, sf_dir)
    return similarity.projected_topk(
        spark.table("embeddings"), query_id=0, k=10, out_dim=8, in_dim=64,
    )


def _projected_topk_sql(out_dim: int = 8, in_dim: int = 64, k: int = 10) -> str:
    # identical deterministic hyperplanes, embedded as literals (same
    # left-to-right multiply-add order as the Spark column expression so
    # the doubles agree bit-for-bit)
    comps = []
    for p in range(out_dim):
        terms = " + ".join(
            f"CAST(e.embedding[{d + 1}] AS DOUBLE) * ({similarity.lsh_plane_component(p, d)!r})"
            for d in range(in_dim)
        )
        comps.append(f"({terms})")
    proj_list = "[" + ", ".join(comps) + "]"
    return f"""
WITH proj AS (
  SELECT e.vec_id, {proj_list} AS p FROM embeddings e
), q AS (
  SELECT p AS qp, sqrt(list_sum(list_transform(p, x -> x * x))) AS qn
  FROM proj WHERE vec_id = 0
)
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, len(b.p)+1),
                 i -> b.p[i] * q.qp[i])) /
             (sqrt(list_sum(list_transform(b.p, x -> x * x))) * q.qn), 9) AS pcos_sim
FROM proj b CROSS JOIN q
WHERE b.vec_id <> 0
ORDER BY pcos_sim DESC, b.vec_id ASC
LIMIT {k}
"""


SPARK_QUERIES["ann_projected_topk"] = ann_projected_topk
ORACLE_SQL["ann_projected_topk"] = _projected_topk_sql()


def gopher_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard quality rules, reported per source: total docs,
    docs kept, and per-rule violation counts."""
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    r = text.gopher_rules("text")
    flagged = d.select(
        "source",
        *[v.alias(k) for k, v in r.items()],
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum((~F.col("r_word_count")).cast("long")).alias("v_word_count"),
        F.sum((~F.col("r_mean_word_len")).cast("long")).alias("v_mean_word_len"),
        F.sum((~F.col("r_alpha_words")).cast("long")).alias("v_alpha_words"),
        F.sum((~F.col("r_stopwords")).cast("long")).alias("v_stopwords"),
        F.sum((~F.col("r_symbol_ratio")).cast("long")).alias("v_symbol_ratio"),
    )


_EN10 = "['the','of','and','to','in','is','it','you','that','for']"
GOPHER_RULES_SQL = rf"""
WITH t AS (
  SELECT source, {SQL_TOKENS} AS w,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
         len(regexp_extract_all(text, '[#…]')) AS n_symbols
  FROM documents
), r AS (
  SELECT source,
         len(w) BETWEEN 20 AND 80 AS r_word_count,
         (n_nonspace * 1.0 / greatest(len(w), 1)) BETWEEN 3.0 AND 10.0 AS r_mean_word_len,
         (len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0 / greatest(len(w), 1)) >= 0.8 AS r_alpha_words,
         len(list_intersect(list_distinct(w), {_EN10})) >= 2 AS r_stopwords,
         (n_symbols * 1.0 / greatest(len(w), 1)) < 0.1 AS r_symbol_ratio
  FROM t
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len AND r_alpha_words
                 AND r_stopwords AND r_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN NOT r_word_count THEN 1 ELSE 0 END) AS BIGINT) AS v_word_count,
       CAST(SUM(CASE WHEN NOT r_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS v_mean_word_len,
       CAST(SUM(CASE WHEN NOT r_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS v_alpha_words,
       CAST(SUM(CASE WHEN NOT r_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS v_stopwords,
       CAST(SUM(CASE WHEN NOT r_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS v_symbol_ratio
FROM r GROUP BY source
"""

SPARK_QUERIES["gopher_rules_filter"] = gopher_rules_filter
ORACLE_SQL["gopher_rules_filter"] = GOPHER_RULES_SQL


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the canonical (lower/punct-stripped/whitespace-
    collapsed) fingerprint — catches re-cased and re-punctuated copies
    raw-text dedup misses; the shuffle key is the 32-byte md5, not the
    document body."""
    ensure_views(spark, sf_dir)
    return dedup.normalized_dedup(spark.table("documents"))


DEDUP_NORMALIZED_SQL = r"""
SELECT MIN(doc_id) AS doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fp,
       COUNT(*) AS n_copies
FROM documents
GROUP BY fp
"""

SPARK_QUERIES["dedup_normalized"] = dedup_normalized
ORACLE_SQL["dedup_normalized"] = DEDUP_NORMALIZED_SQL


def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents at or above the corpus P75 of BPE-ish token count
    (integer scores + dyadic q → the interpolated threshold is exact in
    binary, so the boundary is deterministic cross-engine); report the
    surviving slice per source."""
    ensure_views(spark, sf_dir)
    d = spark.table("documents").select(
        "source", text.bpe_ish_token_count("text").cast("long").alias("n_bpe"),
    )
    kept = sampling.quantile_threshold_filter(d, "n_bpe", q=0.75, exact=True)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_keep"),
        F.sum("n_bpe").alias("kept_tokens"),
        F.min("n_bpe").alias("min_tokens"),
    )


QUALITY_QUANTILE_SQL = r"""
WITH s AS (
  SELECT source, len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
  FROM documents
), thr AS (
  SELECT round(quantile_cont(n_bpe, 0.75), 9) AS t FROM s
)
SELECT source, COUNT(*) AS n_keep, CAST(SUM(n_bpe) AS BIGINT) AS kept_tokens, MIN(n_bpe) AS min_tokens
FROM s, thr WHERE n_bpe >= thr.t GROUP BY source
"""

SPARK_QUERIES["quality_quantile_filter"] = quality_quantile_filter
ORACLE_SQL["quality_quantile_filter"] = QUALITY_QUANTILE_SQL


def length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste report per power-of-two sequence-length bucket — the
    padded-batch-shape planning query (compare against sequence_packing)."""
    ensure_views(spark, sf_dir)
    return sampling.length_bucket_stats(spark.table("documents"))


_BUCKET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n_bpe <= {b} THEN {b}" for b in (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
    )
    + " ELSE 8192 END"
)
LENGTH_BUCKET_SQL = rf"""
WITH s AS (
  SELECT len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
  FROM documents
), b AS (
  SELECT n_bpe, {_BUCKET_CASE} AS bucket FROM s
)
SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n_bpe) AS BIGINT) AS actual_tokens,
       CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
       round(1.0 - SUM(n_bpe) * 1.0 / (bucket * COUNT(*)), 9) AS waste_ratio
FROM b GROUP BY bucket
"""

SPARK_QUERIES["length_bucket_stats"] = length_bucket_stats
ORACLE_SQL["length_bucket_stats"] = LENGTH_BUCKET_SQL


def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram LM — the CCNet-style perplexity-proxy quality signal."""
    ensure_views(spark, sf_dir)
    return text.unigram_logprob_scores(spark.table("documents"))


UNIGRAM_LOGPROB_SQL = rf"""
WITH words AS (
  SELECT doc_id AS _id, unnest({SQL_TOKENS}) AS _w FROM documents
), tf AS (
  SELECT _id, _w, COUNT(*) AS tf FROM words GROUP BY _id, _w
), cf AS (
  SELECT _w, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY _w
), total AS (
  SELECT CAST(SUM(cf) AS BIGINT) AS n_total FROM cf
), scored AS (
  SELECT tf._id, tf.tf, {sql_round_hu('ln(cf.cf * 1.0 / total.n_total)')} AS _lp
  FROM tf JOIN cf ON tf._w = cf._w CROSS JOIN total
)
SELECT _id AS doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       {sql_round_hu('CAST(SUM(CAST(_lp AS DECIMAL(20,9)) * CAST(tf AS DECIMAL(10,0))) AS DOUBLE) / SUM(tf)')} AS mean_logprob
FROM scored GROUP BY _id
"""

SPARK_QUERIES["unigram_logprob_quality"] = unigram_logprob_quality
ORACLE_SQL["unigram_logprob_quality"] = UNIGRAM_LOGPROB_SQL


def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label vote for the first 10 vectors: majority label among the
    10 highest-cosine neighbours — the auto-labeling primitive."""
    ensure_views(spark, sf_dir)
    return similarity.knn_classify(
        spark.table("embeddings"), query_ids=list(range(10)), k=10,
    )


KNN_VOTE_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT q.qid, b.vec_id, b.label,
         round({_COS_SQL.replace('a.embedding', 'q.qv').replace('b.embedding', 'b.embedding')}, 9) AS c
  FROM embeddings b CROSS JOIN q
  WHERE b.vec_id <> q.qid
), ranked AS (
  SELECT qid, label,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rk
  FROM scored
), votes AS (
  SELECT qid, label, COUNT(*) AS votes FROM ranked WHERE rk <= 10 GROUP BY qid, label
), best AS (
  SELECT qid, label, votes,
         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) AS vr
  FROM votes
)
SELECT qid AS vec_id, label AS knn_label, votes FROM best WHERE vr = 1
"""

SPARK_QUERIES["knn_label_vote"] = knn_label_vote
ORACLE_SQL["knn_label_vote"] = KNN_VOTE_SQL


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup: odd-id docs arrive as the new batch, even-id
    docs are the already-ingested corpus; only fingerprint-fresh batch
    docs (first copy within the batch) survive."""
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    new_batch = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source", "text")
    existing = d.filter(F.col("doc_id") % 2 == 0)
    out = dedup.incremental_dedup(new_batch, existing)
    return out.select("doc_id", "source")


DEDUP_INCREMENTAL_SQL = r"""
WITH fp AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
                                 '\s+', ' ', 'g'))) AS fp
  FROM documents
), new_batch AS (
  SELECT * FROM fp WHERE doc_id % 2 = 1
), old AS (
  SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0
), fresh AS (
  SELECT n.* FROM new_batch n WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.fp = n.fp)
), surv AS (
  SELECT fp, MIN(doc_id) AS m FROM fresh GROUP BY fp
)
SELECT f.doc_id, f.source
FROM fresh f JOIN surv s ON f.fp = s.fp AND f.doc_id = s.m
"""

SPARK_QUERIES["dedup_incremental_batch"] = dedup_incremental_batch
ORACLE_SQL["dedup_incremental_batch"] = DEDUP_INCREMENTAL_SQL


def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivors: within each normalized-fingerprint
    group the LONGEST copy wins (ties to smallest id) — the keep-best
    curation policy, not arbitrary min-id."""
    ensure_views(spark, sf_dir)
    return dedup.dedup_keep_best(spark.table("documents"), score_col=F.length("text"))


DEDUP_KEEP_LONGEST_SQL = r"""
WITH fp AS (
  SELECT doc_id, CAST(length(text) AS DOUBLE) AS score,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
                                 '\s+', ' ', 'g'))) AS fp
  FROM documents
), ranked AS (
  SELECT doc_id, score, fp,
         row_number() OVER (PARTITION BY fp ORDER BY score DESC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY fp) AS n_copies
  FROM fp
)
SELECT doc_id, score AS best_score, CAST(n_copies AS BIGINT) AS n_copies
FROM ranked WHERE rk = 1
"""

SPARK_QUERIES["dedup_keep_longest"] = dedup_keep_longest
ORACLE_SQL["dedup_keep_longest"] = DEDUP_KEEP_LONGEST_SQL


def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-2.0 domain mixture: tempered shares flatten the source
    distribution toward low-resource domains; rates normalized so the
    binding domain keeps everything; deterministic hash subsample."""
    ensure_views(spark, sf_dir)
    d = spark.table("documents")
    rates = sampling.temperature_mix_rates(d, temperature=2.0)
    kept = sampling.apply_mix_rates(d, rates).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_tokens",
            "share",
            "rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


TEMPERATURE_MIX_SQL = rf"""
WITH totals AS (
  SELECT source, CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tempered AS (
  SELECT source, n_tokens, pow(CAST(n_tokens AS DOUBLE), 0.5) AS _p FROM totals
), shares AS (
  SELECT source, n_tokens, _p / SUM(_p) OVER () AS share FROM tempered
), rates AS (
  SELECT source, n_tokens, round(share, 9) AS share,
         round(share * (MIN(n_tokens / share) OVER ()) / n_tokens, 9) AS rate
  FROM shares
), kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE {sql_hash_unit('doc_id', 'tempmix')} < r.rate
  GROUP BY d.source
)
SELECT r.source, r.n_tokens, r.share, r.rate,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.source = k.source
"""

SPARK_QUERIES["temperature_mix_sample"] = temperature_mix_sample
ORACLE_SQL["temperature_mix_sample"] = TEMPERATURE_MIX_SQL


def duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-shingle coverage per document — the
    exact-substring dedup signal (fraction of a doc's shingles shared
    with >= 2 docs). Inverted-index aggregation, no pair join."""
    ensure_views(spark, sf_dir)
    return dedup.duplicate_ngram_coverage(spark.table("documents"))


DUP_NGRAM_COVERAGE_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tok
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), dfq AS (
  SELECT s, COUNT(*) AS dfn FROM inv GROUP BY s
)
SELECT inv.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN dfn >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
       round(SUM(CASE WHEN dfn >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 9) AS dup_frac
FROM inv JOIN dfq USING (s)
GROUP BY inv.doc_id
"""

SPARK_QUERIES["duplicate_ngram_coverage"] = duplicate_ngram_coverage
ORACLE_SQL["duplicate_ngram_coverage"] = DUP_NGRAM_COVERAGE_SQL


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated-vs-exact Jaccard calibration of the MinHash/LSH stack,
    micro-averaged per exact-similarity decile — integer-sum statistics,
    bit-exact across engines."""
    ensure_views(spark, sf_dir)
    return dedup.minhash_calibration(spark.table("documents"))


MINHASH_CALIBRATION_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tok
), hs AS (
  SELECT doc_id,
         list_transform(shingles, s -> {SQL_MD5LONG.format(x='s')} % {MOD}) AS h
  FROM sh
), sig AS (
  SELECT doc_id, h, {_sql_sig_entries()} AS sig FROM hs
), bands AS (
  SELECT doc_id, b AS band_id,
         md5(array_to_string(sig[b*{LSH_ROWS}+1 : b*{LSH_ROWS}+{LSH_ROWS}], ',')) AS band_key
  FROM sig, range(0, {LSH_BANDS}) t(b)
  QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_key) <= {LSH_MAX_BUCKET}
), cand AS (
  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), p AS (
  SELECT a_id, b_id,
         len(list_intersect(sa.h, sb.h)) AS i,
         len(sa.h) + len(sb.h) - len(list_intersect(sa.h, sb.h)) AS u,
         len(list_filter(range(1, {NUM_PERM} + 1), k -> sa.sig[k] = sb.sig[k])) AS m
  FROM cand
  JOIN sig sa ON sa.doc_id = a_id
  JOIN sig sb ON sb.doc_id = b_id
)
SELECT least(CAST(i * 10 // u AS BIGINT), 9) AS bucket,
       COUNT(*) AS n_pairs,
       CAST(SUM(m) AS BIGINT) AS sum_matches,
       CAST(SUM(i) AS BIGINT) AS sum_inter,
       CAST(SUM(u) AS BIGINT) AS sum_union,
       CAST(SUM(abs(m * u - i * {NUM_PERM})) AS BIGINT) AS sum_abs_err_scaled,
       round(SUM(m) * 1.0 / (COUNT(*) * {NUM_PERM}), 9) AS micro_est_jaccard,
       round(SUM(i) * 1.0 / SUM(u), 9) AS micro_exact_jaccard
FROM p
GROUP BY 1
"""

SPARK_QUERIES["minhash_calibration"] = minhash_calibration
ORACLE_SQL["minhash_calibration"] = MINHASH_CALIBRATION_SQL


def doc_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching detection: primary/secondary language + mix ratio
    per document (staged score projection — each tokenize+intersect runs
    once, zero shuffle)."""
    ensure_views(spark, sf_dir)
    return text.lang_mix_stats(spark.table("documents"))


def _lang_mix_sql() -> str:
    score_cols = []
    for lang, words in text.LANG_STOPWORDS.items():
        arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
        score_cols.append(f"len(list_intersect(dw, {arr})) AS s_{lang}")
    langs = text.LANG_PRIORITY
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    prim_cases = " ".join(f"WHEN s_{l} = best AND best > 0 THEN '{l}'" for l in langs)
    excl_cols = ", ".join(
        f"CASE WHEN primary_lang = '{l}' THEN -1 ELSE s_{l} END AS e_{l}" for l in langs
    )
    second = "greatest(" + ", ".join(f"e_{l}" for l in langs) + ")"
    sec_cases = " ".join(
        f"WHEN e_{l} = second_best AND second_best > 0 THEN '{l}'" for l in langs
    )
    return rf"""
WITH t AS (
  SELECT doc_id, list_distinct({SQL_TOKENS}) AS dw FROM documents
), s AS (
  SELECT doc_id, {', '.join(score_cols)} FROM t
), b AS (
  SELECT *, {best} AS best FROM s
), p AS (
  SELECT *, CASE {prim_cases} ELSE 'und' END AS primary_lang FROM b
), e AS (
  SELECT *, {excl_cols} FROM p
), b2 AS (
  SELECT *, {second} AS second_best FROM e
)
SELECT doc_id, primary_lang,
       CASE {sec_cases} ELSE 'und' END AS secondary_lang,
       CASE WHEN second_best > 0
            THEN round(second_best * 1.0 / (best + second_best), 9)
            ELSE 0.0 END AS mix_ratio
FROM b2
"""


SPARK_QUERIES["doc_lang_mix"] = doc_lang_mix
ORACLE_SQL["doc_lang_mix"] = _lang_mix_sql()


def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per document (vowel-group syllable proxy,
    pure JVM regexp counting)."""
    ensure_views(spark, sf_dir)
    r = text.readability("text")
    return spark.table("documents").select(
        "doc_id",
        r["n_words"].alias("n_words"),
        r["n_sentences"].alias("n_sentences"),
        r["n_syllables"].alias("n_syllables"),
        r["flesch"].alias("flesch"),
    )


READABILITY_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         len({SQL_TOKENS}) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0
            THEN round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                               - 84.6 * (n_syllables * 1.0 / n_words), 9)
            ELSE 0.0 END AS flesch
FROM t
"""

SPARK_QUERIES["doc_readability"] = doc_readability
ORACLE_SQL["doc_readability"] = READABILITY_SQL


_PQ_M = 4
_PQ_DSUB = 16
_PQ_SEED = "vec_id % 64 = 5"
_PQ_QUERY = 17
_PQ_K = 10


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: per-subspace k-means codebooks (1 Lloyd
    iteration over deterministic seeds), asymmetric-distance top-10 for
    one query (`llm/similarity.py pq_topk`)."""
    ensure_views(spark, sf_dir)
    return similarity.pq_topk(
        spark.table("embeddings"),
        query_id=_PQ_QUERY,
        k=_PQ_K,
        m=_PQ_M,
        dim=_PQ_M * _PQ_DSUB,
        seed_filter=_PQ_SEED,
        iterations=1,
    )


def _pq_sql() -> str:
    d = _PQ_DSUB
    l2 = lambda a, b: (
        f"list_sum(list_transform(range(1, {d} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    return f"""
WITH sub AS (
  SELECT vec_id, t.m AS m,
         list_transform(embedding[t.m*{d}+1 : t.m*{d}+{d}],
                        x -> CAST(x AS DOUBLE)) AS sv
  FROM embeddings, range(0, {_PQ_M}) t(m)
), cb0 AS (
  SELECT m, vec_id AS code_id, sv AS cvec FROM sub WHERE {_PQ_SEED}
), a1 AS (
  SELECT sub.vec_id, sub.m, code_id, sv,
         round({l2('sv', 'cvec')}, 9) AS dd
  FROM sub JOIN cb0 USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                             ORDER BY dd, code_id) = 1
), m1 AS (
  SELECT m, code_id, r.i AS i,
         CAST(SUM(CAST(sv[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM a1, range(1, {d} + 1) r(i)
  GROUP BY m, code_id, r.i
), mv AS (
  SELECT m, code_id, list(mu ORDER BY i) AS mvec FROM m1 GROUP BY m, code_id
), cb1 AS (
  SELECT cb0.m, cb0.code_id, COALESCE(mv.mvec, cb0.cvec) AS cvec
  FROM cb0 LEFT JOIN mv ON mv.m = cb0.m AND mv.code_id = cb0.code_id
), codes AS (
  SELECT sub.vec_id, sub.m, code_id,
         round({l2('sv', 'cvec')}, 9) AS dd
  FROM sub JOIN cb1 USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                             ORDER BY dd, code_id) = 1
), q AS (
  SELECT m, sv AS qsv FROM sub WHERE vec_id = {_PQ_QUERY}
), dt AS (
  SELECT cb1.m, cb1.code_id, round({l2('qsv', 'cvec')}, 9) AS qd
  FROM cb1 JOIN q USING (m)
)
SELECT codes.vec_id,
       CAST(SUM(CAST(qd AS DECIMAL(38,9))) AS DOUBLE) AS approx_l2
FROM codes JOIN dt ON dt.m = codes.m AND dt.code_id = codes.code_id
WHERE codes.vec_id <> {_PQ_QUERY}
GROUP BY codes.vec_id
ORDER BY approx_l2 ASC, vec_id ASC
LIMIT {_PQ_K}
"""


SPARK_QUERIES["ann_pq_topk"] = ann_pq_topk
ORACLE_SQL["ann_pq_topk"] = _pq_sql()


_AE_FRAME, _AE_HOP, _AE_THR = 16, 8, 60_000
_AE_HEAD = 64


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM8 frame-energy over binary payloads (Arrow-batched numpy inside
    mapInPandas — `llm/multimodal.py audio_frame_energy`). The payload
    here is the ASCII head of each document (showcase scaffolding so the
    DuckDB oracle can recompute sample values via code points); the
    operator takes arbitrary binary audio."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id",
        F.regexp_replace(F.substring("text", 1, _AE_HEAD), r"[^ -~]", "").alias("_clean"),
    )
    payloads = docs.select(
        "doc_id", F.encode(F.col("_clean"), "utf-8").alias("payload")
    )
    return multimodal.audio_frame_energy(
        payloads, frame=_AE_FRAME, hop=_AE_HOP, active_threshold=_AE_THR
    )


AUDIO_ENERGY_SQL = f"""
WITH c AS (
  SELECT doc_id, regexp_replace(substr(text, 1, {_AE_HEAD}), '[^ -~]', '', 'g') AS clean
  FROM documents
), s AS (
  SELECT doc_id,
         list_transform(range(1, length(clean) + 1),
                        i -> unicode(substr(clean, i, 1)) - 128) AS dev,
         length(clean) AS n
  FROM c
), f AS (
  SELECT doc_id, dev, n,
         CASE WHEN n >= {_AE_FRAME} THEN (n - {_AE_FRAME}) // {_AE_HOP} + 1 ELSE 0 END AS n_frames
  FROM s
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(dev, x -> x * x)), 0) AS BIGINT) AS sum_sq,
       CAST(COALESCE(list_max(list_transform(dev, x -> abs(x))), 0) AS BIGINT) AS peak_dev,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(len(list_filter(range(0, n_frames),
                k -> list_sum(list_transform(range(k * {_AE_HOP} + 1, k * {_AE_HOP} + {_AE_FRAME} + 1),
                                             i -> dev[i] * dev[i])) >= {_AE_THR})) AS BIGINT) AS n_active
FROM f
"""

SPARK_QUERIES["multimodal_audio_energy"] = multimodal_audio_energy
ORACLE_SQL["multimodal_audio_energy"] = AUDIO_ENERGY_SQL


_EMB_DECON_THR = 0.5


def embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: corpus vectors scored against a
    broadcast benchmark slice (vec_id % 50 = 3); flags cosine >= 0.5 —
    paraphrase-level leakage that n-gram overlap misses."""
    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    bench = emb.filter("vec_id % 50 = 3")
    corpus = emb.filter("vec_id % 50 <> 3")
    return similarity.embedding_contamination(corpus, bench, threshold=_EMB_DECON_THR)


EMB_DECON_SQL = f"""
WITH bench AS (
  SELECT vec_id AS bid, embedding AS bvec FROM embeddings WHERE vec_id % 50 = 3
), corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 3
), scored AS (
  SELECT c.vec_id,
         round(
           list_sum(list_transform(range(1, len(c.embedding) + 1),
             i -> CAST(c.embedding[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.bvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           9) AS cos_sim
  FROM corpus c CROSS JOIN bench b
)
SELECT vec_id, MAX(cos_sim) AS max_bench_cos,
       MAX(cos_sim) >= {_EMB_DECON_THR} AS contaminated
FROM scored GROUP BY vec_id
"""

SPARK_QUERIES["embedding_decontamination"] = embedding_decontamination
ORACLE_SQL["embedding_decontamination"] = EMB_DECON_SQL


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BPE merge candidates (most frequent adjacent character
    pairs, occurrence-weighted) over the corpus — the inner statistic of
    tokenizer training (`llm/text.py bpe_merge_candidates`)."""
    ensure_views(spark, sf_dir)
    return text.bpe_merge_candidates(spark.table("documents"), k=10)


BPE_MERGE_SQL = rf"""
WITH w AS (
  SELECT unnest({SQL_TOKENS}) AS w FROM documents
), b AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
  FROM w WHERE length(w) >= 2
)
SELECT pair, COUNT(*) AS n
FROM b GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 10
"""

SPARK_QUERIES["bpe_merge_candidates"] = bpe_merge_candidates
ORACLE_SQL["bpe_merge_candidates"] = BPE_MERGE_SQL


_FUNNEL_DUP_MAX = 0.5
_FUNNEL_QUALITY_MIN = 0.5


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation cascade as ONE per-source funnel report — the
    acceptance accounting every corpus build publishes: total docs →
    Gopher hard rules → normalized-fingerprint dedup survivor (among
    rule-passing docs) → corpus-wide duplicated-shingle fraction below
    0.5 → composite quality ≥ 0.5. Each stage is a cumulative
    conjunction, so the columns are monotonically non-increasing.

    Composition cost: the Gopher rules and quality score are scan-side
    projections; dedup survivorship is one fp-keyed window; coverage is
    the inverted-index aggregation — nothing quadratic anywhere."""
    ensure_views(spark, sf_dir)
    from pyspark.sql.window import Window as W

    d = spark.table("documents")
    r = text.gopher_rules("text")
    cov = dedup.duplicate_ngram_coverage(d).select("doc_id", "dup_frac")
    base = d.select(
        "doc_id",
        "source",
        r["keep"].alias("g"),
        text.fingerprint("text").alias("fp"),
        text.quality_score("text").alias("q"),
    )
    flags = base.withColumn(
        "_minkeep", F.min(F.when(F.col("g"), F.col("doc_id"))).over(W.partitionBy("fp"))
    ).join(cov, "doc_id")
    staged = flags.select(
        "source",
        F.col("g"),
        (F.col("g") & (F.col("doc_id") == F.col("_minkeep"))).alias("u"),
        (
            F.col("g")
            & (F.col("doc_id") == F.col("_minkeep"))
            & (F.col("dup_frac") < _FUNNEL_DUP_MAX)
        ).alias("ld"),
        (
            F.col("g")
            & (F.col("doc_id") == F.col("_minkeep"))
            & (F.col("dup_frac") < _FUNNEL_DUP_MAX)
            & (F.col("q") >= _FUNNEL_QUALITY_MIN)
        ).alias("fin"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("g").cast("long")).alias("n_gopher"),
        F.sum(F.col("u").cast("long")).alias("n_unique"),
        F.sum(F.col("ld").cast("long")).alias("n_low_dup"),
        F.sum(F.col("fin").cast("long")).alias("n_final"),
    )


CURATION_FUNNEL_SQL = rf"""
WITH t AS (
  SELECT doc_id, source, text, {SQL_TOKENS} AS w,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
         len(regexp_extract_all(text, '[#…]')) AS n_symbols,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS n_punct
  FROM documents
), g AS (
  SELECT doc_id, source,
         (len(w) BETWEEN 20 AND 80)
         AND ((n_nonspace * 1.0 / greatest(len(w), 1)) BETWEEN 3.0 AND 10.0)
         AND ((len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0 / greatest(len(w), 1)) >= 0.8)
         AND (len(list_intersect(list_distinct(w), {_EN10})) >= 2)
         AND ((n_symbols * 1.0 / greatest(len(w), 1)) < 0.1) AS keep,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]', '', 'g'),
                                 '\s+', ' ', 'g'))) AS fp,
         round(0.4 * least(len(w) / 100.0, 1.0)
             + 0.3 * round(n_alpha * 1.0 / greatest(n_chars, 1), 9)
             + 0.2 * least(len(list_intersect(list_distinct(w), {_EN10})) / 5.0, 1.0)
             + 0.1 * (1 - least(round(n_punct * 1.0 / greatest(n_chars, 1), 9) * 5, 1.0)),
           9) AS q
  FROM t
), sh AS (
  SELECT doc_id, {SQL_SHINGLES} AS shingles FROM t
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), dfq AS (
  SELECT s, COUNT(*) AS dfn FROM inv GROUP BY s
), cov AS (
  SELECT inv.doc_id,
         round(SUM(CASE WHEN dfn >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 9) AS dup_frac
  FROM inv JOIN dfq USING (s)
  GROUP BY inv.doc_id
), flags AS (
  SELECT g.source, g.keep,
         g.keep AND g.doc_id = MIN(CASE WHEN g.keep THEN g.doc_id END)
                              OVER (PARTITION BY g.fp) AS u,
         cov.dup_frac < {_FUNNEL_DUP_MAX} AS ld_ok,
         g.q >= {_FUNNEL_QUALITY_MIN} AS q_ok
  FROM g JOIN cov USING (doc_id)
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
       CAST(SUM(CASE WHEN u THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN u AND ld_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_low_dup,
       CAST(SUM(CASE WHEN u AND ld_ok AND q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_final
FROM flags GROUP BY source
"""

SPARK_QUERIES["corpus_curation_funnel"] = corpus_curation_funnel
ORACLE_SQL["corpus_curation_funnel"] = CURATION_FUNNEL_SQL


_KC_K = 6


def coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embeddings (6 centers, smallest-id
    start) — `llm/similarity.py kcenter_coreset`. The oracle replays the
    driver-loop greedy with chained CTEs, so the iterative argmax probes
    are hash-verified like the recursive graph oracles."""
    ensure_views(spark, sf_dir)
    return similarity.kcenter_coreset(spark.table("embeddings"), k=_KC_K)


def _kcenter_sql(k: int = _KC_K) -> str:
    l2 = (
        "list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    # DuckDB disallows subqueries inside lambdas, so every round's center
    # vector is CROSS JOINed in as a 1-row relation instead
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "c0 AS (SELECT MIN(vec_id) AS id FROM e)",
        "d0 AS (SELECT e.vec_id, e.v, round("
        + l2.format(a="e.v", b="c.cv")
        + ", 9) AS d FROM e CROSS JOIN "
        "(SELECT e2.v AS cv FROM e e2, c0 WHERE e2.vec_id = c0.id) c)",
    ]
    picked_union = ["SELECT 0 AS round, c0.id AS vec_id, 0.0 AS min_dist_sq FROM c0"]
    excl = "SELECT id AS vec_id FROM c0"
    for r in range(1, k):
        prev_d = f"d{r - 1}"
        parts.append(
            f"p{r} AS (SELECT vec_id, d FROM {prev_d} "
            f"WHERE vec_id NOT IN ({excl}) ORDER BY d DESC, vec_id ASC LIMIT 1)"
        )
        picked_union.append(f"SELECT {r}, vec_id, d FROM p{r}")
        excl += f" UNION SELECT vec_id FROM p{r}"
        if r < k - 1:
            parts.append(
                f"d{r} AS (SELECT {prev_d}.vec_id, {prev_d}.v, "
                f"least({prev_d}.d, round({l2.format(a=f'{prev_d}.v', b='c.cv')}, 9)) AS d "
                f"FROM {prev_d} CROSS JOIN "
                f"(SELECT e2.v AS cv FROM e e2 JOIN p{r} ON e2.vec_id = p{r}.vec_id) c)"
            )
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(picked_union)


SPARK_QUERIES["coreset_kcenter"] = coreset_kcenter
ORACLE_SQL["coreset_kcenter"] = _kcenter_sql()


_NOISE_SAMPLE = "vec_id % 10 = 0"
_NOISE_K = 10


def label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label annotation-noise rate from kNN neighborhood disagreement
    over a 10% deterministic sample (`llm/similarity.py
    label_noise_rate`)."""
    ensure_views(spark, sf_dir)
    return similarity.label_noise_rate(
        spark.table("embeddings"), sample_filter=_NOISE_SAMPLE, k=_NOISE_K,
    )


LABEL_NOISE_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv, label AS own
  FROM embeddings WHERE {_NOISE_SAMPLE}
), scored AS (
  SELECT q.qid, q.own, b.vec_id, b.label,
         round({_COS_SQL.replace('a.embedding', 'q.qv').replace('b.embedding', 'b.embedding')}, 9) AS c
  FROM embeddings b CROSS JOIN q
  WHERE b.vec_id <> q.qid
), ranked AS (
  SELECT qid, own, label,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rk
  FROM scored
), votes AS (
  SELECT qid, own, label, COUNT(*) AS votes
  FROM ranked WHERE rk <= {_NOISE_K} GROUP BY qid, own, label
), best AS (
  SELECT qid, own, label,
         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) AS vr
  FROM votes
)
SELECT own AS label, COUNT(*) AS n_checked,
       CAST(SUM(CASE WHEN label <> own THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
       round(SUM(CASE WHEN label <> own THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 9) AS noise_rate
FROM best WHERE vr = 1
GROUP BY own
"""

SPARK_QUERIES["label_noise_screen"] = label_noise_screen
ORACLE_SQL["label_noise_screen"] = LABEL_NOISE_SQL


def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean interpolated-bigram log-probability per document under the
    corpus's own counts (`llm/text.py bigram_logprob_scores`) — the
    KenLM-style perplexity proxy one order up from the unigram signal."""
    ensure_views(spark, sf_dir)
    return text.bigram_logprob_scores(spark.table("documents"))


BIGRAM_LOGPROB_SQL = rf"""
WITH d AS (
  SELECT doc_id AS _id, {SQL_TOKENS} AS w FROM documents
), bgs AS (
  SELECT _id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg FROM d
), tf AS (
  SELECT _id, bg, COUNT(*) AS tf FROM bgs GROUP BY _id, bg
), uni AS (
  SELECT unnest(w) AS u FROM d
), cf AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY u
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM uni
), c12 AS (
  SELECT bg, CAST(SUM(tf) AS BIGINT) AS c12 FROM tf GROUP BY bg
), scored AS (
  SELECT tf._id, tf.tf,
         {sql_round_hu('ln(0.7 * (c12.c12 * 1.0 / cf1.c) + 0.3 * (cf2.c * 1.0 / tot.n_total))')} AS _lp
  FROM tf
  JOIN c12 USING (bg)
  JOIN cf cf1 ON cf1.u = string_split(tf.bg, ' ')[1]
  JOIN cf cf2 ON cf2.u = string_split(tf.bg, ' ')[2]
  CROSS JOIN tot
)
SELECT _id AS doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       {sql_round_hu('CAST(SUM(CAST(_lp AS DECIMAL(20,9)) * CAST(tf AS DECIMAL(10,0))) AS DOUBLE) / SUM(tf)')} AS mean_logprob
FROM scored GROUP BY _id
"""

SPARK_QUERIES["bigram_logprob_quality"] = bigram_logprob_quality
ORACLE_SQL["bigram_logprob_quality"] = BIGRAM_LOGPROB_SQL


def multimodal_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-boundary detection (`llm/multimodal.py scene_change_stats`):
    256-byte frames per payload, per-frame integer aHash, consecutive
    Hamming distance >= 16 marks a cut — one mapInPandas pass, zero
    shuffles (each row carries its whole video)."""
    ensure_views(spark, sf_dir)
    # ASCII-only guard on BOTH engines: the Spark side frames UTF-8 BYTES
    # while the oracle frames characters via ascii() codepoints — they only
    # agree when byte length == char length, so non-ASCII docs are excluded
    # identically rather than silently desynchronizing frame boundaries.
    payloads = multimodal.with_binary_payload(
        spark.table("documents").filter(
            (F.length("text") > 0) & (F.octet_length("text") == F.length("text"))
        )
    )
    return multimodal.scene_change_stats(payloads, frame_size=256, threshold=16)


def _scene_change_sql() -> str:
    from onetl_spark.llm.multimodal import AHASH_CELLS

    terms = " + ".join(
        f"(CASE WHEN coalesce(list_sum(fc[({i} * nf) // {AHASH_CELLS} + 1 : ({i + 1} * nf) // {AHASH_CELLS}]), 0) * nf"
        f" > tot * ((({i + 1} * nf) // {AHASH_CELLS}) - (({i} * nf) // {AHASH_CELLS}))"
        f" THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(AHASH_CELLS)
    )
    return rf"""
WITH codes AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))) AS c,
         length(text) AS n
  FROM documents WHERE length(text) > 0 AND strlen(text) = length(text)
), fr AS (
  SELECT doc_id, f, c[f * 256 + 1 : least((f + 1) * 256, n)] AS fc
  FROM codes, unnest(range(0, (n + 255) // 256)) t(f)
), fh AS (
  SELECT doc_id, f, fc, len(fc) AS nf, list_sum(fc) AS tot FROM fr
), hs AS (
  SELECT doc_id, f, CAST({terms} AS BIGINT) AS h FROM fh
), d AS (
  SELECT doc_id,
         bit_count(xor(h, lag(h) OVER (PARTITION BY doc_id ORDER BY f))) AS dist
  FROM hs
)
SELECT doc_id, COUNT(*) AS n_frames,
       CAST(COALESCE(SUM(CASE WHEN dist >= 16 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_changes,
       CAST(COALESCE(MAX(dist), 0) AS BIGINT) AS max_hamming
FROM d GROUP BY doc_id
"""


SPARK_QUERIES["multimodal_scene_changes"] = multimodal_scene_changes
ORACLE_SQL["multimodal_scene_changes"] = _scene_change_sql()


def bpe_token_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under a trained BPE vocabulary
    (`llm/text.py bpe_train_merges` + `bpe_token_counts`): the vocabulary
    is trained with one merge on a THIRD of the corpus (doc_id % 3 == 0),
    then every document is encoded against it — so the oracle exercises
    both the vocabulary-join path (in-vocab words cost len(symbols)) and
    the OOV fallback (character count). One merge keeps the oracle
    SQL-expressible: post-merge symbol length = chars minus the greedy
    non-overlapping occurrences of the merged pair, which is exactly what
    string replace() computes."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    train = docs.filter(F.col("doc_id") % 3 == 0)
    _merges, vocab = text.bpe_train_merges(train, num_merges=1)
    return text.bpe_token_counts(docs, vocab)


BPE_ENCODE_SQL = rf"""
WITH tw AS (
  SELECT unnest({SQL_TOKENS}) AS w FROM documents WHERE doc_id % 3 = 0
), pr AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
  FROM tw WHERE length(w) >= 2
), top AS (
  SELECT pair FROM pr GROUP BY pair ORDER BY COUNT(*) DESC, pair ASC LIMIT 1
), vocabw AS (
  SELECT DISTINCT w FROM tw
), docw AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS w FROM documents
), cost AS (
  SELECT doc_id,
         CASE WHEN vocabw.w IS NOT NULL
              THEN length(docw.w)
                   - (length(docw.w)
                      - length(replace(docw.w, (SELECT pair FROM top), ''))) / 2
              ELSE length(docw.w) END AS c
  FROM docw LEFT JOIN vocabw ON vocabw.w = docw.w
)
SELECT d.doc_id, CAST(COALESCE(SUM(cost.c), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN cost ON cost.doc_id = d.doc_id
GROUP BY d.doc_id
"""

SPARK_QUERIES["bpe_token_encode"] = bpe_token_encode
ORACLE_SQL["bpe_token_encode"] = BPE_ENCODE_SQL


def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ storage format itself (`llm/similarity.py pq_encode`): every
    corpus vector quantized to (vec_id, m, code_id) — m small ints instead
    of dim floats, the layout a 100-TB vector store persists. Same
    deterministic codebooks as `ann_pq_topk` (seeded + 1 Lloyd round);
    this checks the full assignment, not just the top-k neighborhood."""
    ensure_views(spark, sf_dir)
    return similarity.pq_encode(
        spark.table("embeddings"),
        m=_PQ_M,
        dim=_PQ_M * _PQ_DSUB,
        seed_filter=_PQ_SEED,
        iterations=1,
    ).orderBy("vec_id", "m")


def _pq_encode_sql() -> str:
    d = _PQ_DSUB
    l2 = lambda a, b: (
        f"list_sum(list_transform(range(1, {d} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    return f"""
WITH sub AS (
  SELECT vec_id, t.m AS m,
         list_transform(embedding[t.m*{d}+1 : t.m*{d}+{d}],
                        x -> CAST(x AS DOUBLE)) AS sv
  FROM embeddings, range(0, {_PQ_M}) t(m)
), cb0 AS (
  SELECT m, vec_id AS code_id, sv AS cvec FROM sub WHERE {_PQ_SEED}
), a1 AS (
  SELECT sub.vec_id, sub.m, code_id, sv,
         round({l2('sv', 'cvec')}, 9) AS dd
  FROM sub JOIN cb0 USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                             ORDER BY dd, code_id) = 1
), m1 AS (
  SELECT m, code_id, r.i AS i,
         CAST(SUM(CAST(sv[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM a1, range(1, {d} + 1) r(i)
  GROUP BY m, code_id, r.i
), mv AS (
  SELECT m, code_id, list(mu ORDER BY i) AS mvec FROM m1 GROUP BY m, code_id
), cb1 AS (
  SELECT cb0.m, cb0.code_id, COALESCE(mv.mvec, cb0.cvec) AS cvec
  FROM cb0 LEFT JOIN mv ON mv.m = cb0.m AND mv.code_id = cb0.code_id
), codes AS (
  SELECT sub.vec_id, sub.m, code_id,
         round({l2('sv', 'cvec')}, 9) AS dd
  FROM sub JOIN cb1 USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                             ORDER BY dd, code_id) = 1
)
SELECT vec_id, CAST(m AS INTEGER) AS m, code_id
FROM codes ORDER BY vec_id, m
"""


SPARK_QUERIES["pq_encode_codes"] = pq_encode_codes
ORACLE_SQL["pq_encode_codes"] = _pq_encode_sql()


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives: for the first 8 vectors, the 10
    highest-cosine corpus vectors with a DIFFERENT label
    (`llm/similarity.py hard_negative_topk` — broadcast query set, one
    corpus scan, WindowGroupLimit partial top-k)."""
    ensure_views(spark, sf_dir)
    return similarity.hard_negative_topk(
        spark.table("embeddings"), query_ids=list(range(8)), k=10,
    )


HARD_NEG_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.qid, b.vec_id AS neg_id, b.label AS neg_label,
         round({_COS_SQL.replace('a.embedding', 'q.qv').replace('b.embedding', 'b.embedding')}, 9) AS cos_sim
  FROM embeddings b CROSS JOIN q
  WHERE b.label <> q.qlabel
)
SELECT qid AS query_id, neg_id, neg_label, cos_sim, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, neg_id ASC) AS rk
  FROM scored
)
WHERE rk <= 10
"""

SPARK_QUERIES["hard_negative_mining"] = hard_negative_mining
ORACLE_SQL["hard_negative_mining"] = HARD_NEG_SQL


_MMR_QUERY, _MMR_K, _MMR_C = 23, 5, 12


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (`llm/similarity.py mmr_rerank_topk`):
    top-12 cosine candidates for one query, then 5 greedy rounds of
    lam*relevance - (1-lam)*max-sim-to-selected. The oracle replays the
    greedy rounds as chained CTEs (the kcenter pattern), so the
    driver-side loop is hash-verified against a declarative replay."""
    ensure_views(spark, sf_dir)
    return similarity.mmr_rerank_topk(
        spark.table("embeddings"), query_id=_MMR_QUERY, k=_MMR_K, candidates=_MMR_C,
    )


def _mmr_sql(qid: int = _MMR_QUERY, k: int = _MMR_K, c: int = _MMR_C) -> str:
    cos = (
        "list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i])) / "
        "(sqrt(list_sum(list_transform({a}, x -> x * x))) * "
        "sqrt(list_sum(list_transform({b}, x -> x * x))))"
    )
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {qid})",
        "rel AS (SELECT e.vec_id AS id, e.v AS v, round("
        + cos.format(a="e.v", b="q.qv")
        + f", 9) AS rel FROM e CROSS JOIN q WHERE e.vec_id <> {qid} "
        f"ORDER BY rel DESC, id ASC LIMIT {c})",
        "sim AS (SELECT a.id AS x, b.id AS y, round("
        + cos.format(a="a.v", b="b.v")
        + ", 9) AS s FROM rel a JOIN rel b ON a.id <> b.id)",
        # round 1: no selected set, score = 0.5*rel
        "p1 AS (SELECT id, rel, 0.5 * rel AS score FROM rel "
        "ORDER BY score DESC, id ASC LIMIT 1)",
    ]
    sel_union = "SELECT id FROM p1"
    picked = ["SELECT 1 AS rank, id, rel, score FROM p1"]
    for r in range(2, k + 1):
        parts.append(
            f"p{r} AS (SELECT rel.id, rel.rel, "
            "0.5 * rel.rel - 0.5 * (SELECT MAX(s.s) FROM sim s "
            f"WHERE s.x = rel.id AND s.y IN ({sel_union})) AS score "
            f"FROM rel WHERE rel.id NOT IN ({sel_union}) "
            "ORDER BY score DESC, id ASC LIMIT 1)"
        )
        picked.append(f"SELECT {r}, id, rel, score FROM p{r}")
        sel_union += f" UNION SELECT id FROM p{r}"
    body = "\nUNION ALL ".join(picked)
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(rank AS INTEGER) AS rank, id AS vec_id, rel AS relevance, score AS mmr_score FROM ({body})"
    )


SPARK_QUERIES["mmr_diversified_topk"] = mmr_diversified_topk
ORACLE_SQL["mmr_diversified_topk"] = _mmr_sql()


def label_centroid_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise per-label centroid cosine (`llm/similarity.py
    label_centroid_similarity`) — the embedding-space class-separability
    report. Decimal-exact centroid means, |labels|^2-sized everything."""
    ensure_views(spark, sf_dir)
    return similarity.label_centroid_similarity(spark.table("embeddings"))


CENTROID_SEP_SQL = """
WITH dims AS (
  SELECT label AS lbl, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) r(i)
), cent AS (
  SELECT lbl, i,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu,
         COUNT(*) AS n
  FROM dims GROUP BY lbl, i
), vecs AS (
  SELECT lbl, list(mu ORDER BY i) AS cv, MAX(n) AS cnt FROM cent GROUP BY lbl
)
SELECT a.lbl AS label_a, b.lbl AS label_b, a.cnt AS n_a, b.cnt AS n_b,
       round(list_sum(list_transform(range(1, len(a.cv) + 1), i -> a.cv[i] * b.cv[i]))
             / (sqrt(list_sum(list_transform(a.cv, x -> x * x)))
                * sqrt(list_sum(list_transform(b.cv, x -> x * x)))), 9) AS centroid_cos
FROM vecs a JOIN vecs b ON a.lbl < b.lbl
"""

SPARK_QUERIES["label_centroid_separability"] = label_centroid_separability
ORACLE_SQL["label_centroid_separability"] = CENTROID_SEP_SQL


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document
    (`llm/text.py char_entropy`) — the repetitive-garbage pre-filter.
    Integer counts, 9-rounded terms summed as exact decimals."""
    ensure_views(spark, sf_dir)
    return text.char_entropy(spark.table("documents"))


CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars WHERE ch <> '' GROUP BY doc_id, ch
), totals AS (
  SELECT doc_id, SUM(c) AS n FROM counts GROUP BY doc_id
), terms AS (
  SELECT counts.doc_id,
         CAST(round(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
              AS DECIMAL(25,9)) AS t
  FROM counts JOIN totals ON totals.doc_id = counts.doc_id
), ent AS (
  SELECT doc_id, CAST(SUM(t) AS DOUBLE) AS entropy_nats FROM terms GROUP BY doc_id
)
SELECT d.doc_id, length(d.text) AS n_chars,
       COALESCE(ent.entropy_nats, 0.0) AS entropy_nats
FROM documents d LEFT JOIN ent ON ent.doc_id = d.doc_id
"""

SPARK_QUERIES["doc_char_entropy"] = doc_char_entropy
ORACLE_SQL["doc_char_entropy"] = CHAR_ENTROPY_SQL


def rake_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrases per document (`llm/text.py rake_keywords`):
    stopword-delimited phrase candidates, degree/frequency word scores,
    decimal-exact phrase sums, top-5 per doc."""
    ensure_views(spark, sf_dir)
    return text.rake_keywords(spark.table("documents"), k=5)


RAKE_SQL = rf"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos FROM t
), flagged AS (
  SELECT doc_id, pos, w,
         (w IN ('the', 'of', 'and', 'to', 'in', 'is', 'it', 'you', 'that', 'for') OR NOT regexp_matches(w, '[a-z0-9]')) AS is_delim
  FROM tok
), grp AS (
  SELECT doc_id, pos, w, is_delim,
         SUM(CASE WHEN is_delim THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM flagged
), wip AS (
  SELECT doc_id, g, pos, w FROM grp WHERE NOT is_delim
), phrases AS (
  SELECT doc_id, g, list(w ORDER BY pos) AS words FROM wip GROUP BY doc_id, g
), occ AS (
  SELECT doc_id, g, len(words) AS plen, unnest(words) AS w FROM phrases
), wscore AS (
  SELECT doc_id, w,
         CAST(round(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(20,9)) AS ws
  FROM occ GROUP BY doc_id, w
), pscore AS (
  SELECT occ.doc_id, occ.g, SUM(ws) AS ps
  FROM occ JOIN wscore ON wscore.doc_id = occ.doc_id AND wscore.w = occ.w
  GROUP BY occ.doc_id, occ.g
), cand AS (
  SELECT DISTINCT phrases.doc_id,
         list_aggregate(words, 'string_agg', ' ') AS phrase,
         CAST(ps AS DOUBLE) AS score
  FROM phrases JOIN pscore ON pscore.doc_id = phrases.doc_id AND pscore.g = phrases.g
)
SELECT doc_id, phrase, score, CAST(rk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS rk
  FROM cand
)
WHERE rk <= 5
"""

SPARK_QUERIES["rake_top_keywords"] = rake_top_keywords
ORACLE_SQL["rake_top_keywords"] = RAKE_SQL


def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations over adjacent token pairs
    (`llm/text.py pmi_collocations`, min bigram count 5) — the
    phrase-induction statistic."""
    ensure_views(spark, sf_dir)
    return text.pmi_collocations(spark.table("documents"), k=20, min_count=5)


PMI_SQL = rf"""
WITH t AS (
  SELECT {SQL_TOKENS} AS w FROM documents
), uni AS (
  SELECT u AS w, COUNT(*) AS c FROM (SELECT unnest(w) AS u FROM t) GROUP BY u
), bi AS (
  SELECT p[1] AS a, p[2] AS b, COUNT(*) AS cab FROM (
    SELECT unnest(list_transform(range(1, len(w)),
                  i -> [w[i], w[i + 1]])) AS p
    FROM t WHERE len(w) >= 2
  ) GROUP BY 1, 2 HAVING COUNT(*) >= 5
), nu AS (
  SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni
), nb AS (
  SELECT CAST(SUM(greatest(len(w) - 1, 0)) AS BIGINT) AS nb FROM t
)
SELECT a, b, cab,
       round(ln((CAST(cab AS DOUBLE) / nb)
                / ((CAST(ca AS DOUBLE) / nu) * (CAST(cb AS DOUBLE) / nu))), 9) AS pmi
FROM (
  SELECT bi.a, bi.b, bi.cab, u1.c AS ca, u2.c AS cb
  FROM bi JOIN uni u1 ON u1.w = bi.a JOIN uni u2 ON u2.w = bi.b
) CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, a ASC, b ASC
LIMIT 20
"""

SPARK_QUERIES["bigram_pmi_collocations"] = bigram_pmi_collocations
ORACLE_SQL["bigram_pmi_collocations"] = PMI_SQL


_PC_ITER = 3


def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by matrix-free
    power iteration (`llm/similarity.py top_principal_component`, 3
    iterations) — the spectral direction "all-but-the-top" de-biasing
    removes. The oracle replays the full iteration trajectory as chained
    CTEs, so the distributed matvec + driver probes are hash-verified."""
    ensure_views(spark, sf_dir)
    return similarity.top_principal_component(
        spark.table("embeddings"), iterations=_PC_ITER
    )


def _power_iteration_ctes(
    iters: int = _PC_ITER, d: int = 64, prefix: str = "", src: "str | None" = None
) -> list:
    """CTE chain replaying top_principal_component. With ``prefix``/``src``
    a SECOND trajectory can run over any (vec_id, v) CTE — the deflated
    frame of the second-component query composes two of these."""
    P = prefix
    parts = []
    if src is None:
        parts.append(
            "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE embedding IS NOT NULL)"
        )
        src = "e"
    parts.append(
        f"""{P}md AS (
  SELECT r.i AS i,
         CAST(SUM(CAST(v[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM {src}, range(1, {d} + 1) r(i) GROUP BY r.i)"""
    )
    parts.append(f"{P}m AS (SELECT list(mu ORDER BY i) AS mu FROM {P}md)")
    parts.append(f"{P}nn AS (SELECT COUNT(*) AS n FROM {src})")
    parts.append(
        f"{P}p0 AS (SELECT [1.0] || list_transform(range(1, {d}), x -> 0.0) AS pv)"
    )
    for r in range(1, iters + 1):
        prev = f"{P}p{r - 1}"
        parts.append(
            f"""{P}s{r} AS (
  SELECT {src}.vec_id, {src}.v,
         list_sum(list_transform(range(1, {d} + 1),
                  i -> ({src}.v[i] - {P}m.mu[i]) * {prev}.pv[i])) AS s
  FROM {src} CROSS JOIN {P}m CROSS JOIN {prev})"""
        )
        parts.append(
            f"""{P}t{r} AS (
  SELECT j.i AS j,
         CAST(round({P}s{r}.s * ({P}s{r}.v[j.i] - {P}m.mu[j.i]), 9) AS DECIMAL(30,9)) AS t
  FROM {P}s{r} CROSS JOIN {P}m, range(1, {d} + 1) j(i))"""
        )
        parts.append(
            f"""{P}w{r} AS (
  SELECT list(CAST(w AS DOUBLE) ORDER BY j) AS wl
  FROM (SELECT j, CAST(SUM(t) AS DOUBLE) AS w FROM {P}t{r} GROUP BY j))"""
        )
        parts.append(
            f"""{P}p{r} AS (
  SELECT list_transform(wl,
           x -> round(x / sqrt(list_sum(list_transform(wl, y -> y * y))), 9)) AS pv
  FROM {P}w{r})"""
        )
    # Rayleigh quotient of the FINAL iterate — one extra s-pass with
    # p{iters} so eigenvalue pairs with the returned component
    parts.append(
        f"""{P}sF AS (
  SELECT list_sum(list_transform(range(1, {d} + 1),
                  i -> ({src}.v[i] - {P}m.mu[i]) * {P}p{iters}.pv[i])) AS s
  FROM {src} CROSS JOIN {P}m CROSS JOIN {P}p{iters})"""
    )
    parts.append(
        f"{P}ssF AS (SELECT CAST(SUM(CAST(round(s * s, 9) AS DECIMAL(30,9))) AS DOUBLE) AS ss FROM {P}sF)"
    )
    return parts


def _top_component_sql(iters: int = _PC_ITER, d: int = 64) -> str:
    return (
        ",\n".join(_power_iteration_ctes(iters, d))
        + f"""
SELECT CAST(r.i - 1 AS INTEGER) AS dim,
       p{iters}.pv[r.i] AS component,
       round(ssF.ss / nn.n, 9) AS eigenvalue
FROM p{iters} CROSS JOIN nn CROSS JOIN ssF, range(1, {d} + 1) r(i)
"""
    )


SPARK_QUERIES["embedding_top_component"] = embedding_top_component
ORACLE_SQL["embedding_top_component"] = _top_component_sql()


def embedding_debias_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top de-biasing check (`llm/similarity.py
    remove_top_component`): remove the power-iteration top component,
    then report each of the first 12 vectors' residual projection onto
    that component (≈0 by construction) and residual norm — the numbers
    that prove the common direction is gone. Debias itself is a pure
    per-row projection."""
    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    comp_rows = sorted(
        similarity.top_principal_component(emb, iterations=_PC_ITER).collect(),
        key=lambda r: r["dim"],
    )
    component = [r["component"] for r in comp_rows]
    deb = similarity.remove_top_component(
        emb.filter(F.col("vec_id") < 12), component
    )
    c = F.array(*[F.lit(float(x)) for x in component])
    return deb.select(
        "vec_id",
        (
            F.round(
                F.aggregate(
                    F.zip_with(F.col("debiased"), c, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ),
                6,
            )
            + F.lit(0.0)  # -0.0 + 0.0 == +0.0: kill the negative zero
        ).alias("resid_proj"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("debiased"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            9,
        ).alias("resid_norm"),
    )


def _debias_sql(iters: int = _PC_ITER, d: int = 64) -> str:
    return (
        ",\n".join(_power_iteration_ctes(iters, d))
        + f""",
deb AS (
  SELECT e.vec_id,
         list_transform(range(1, {d} + 1),
           i -> round(e.v[i] - list_sum(list_transform(range(1, {d} + 1),
                        j -> e.v[j] * p{iters}.pv[j])) * p{iters}.pv[i], 9)) AS db,
         p{iters}.pv AS pv
  FROM e CROSS JOIN p{iters}
  WHERE e.vec_id < 12
)
SELECT vec_id,
       round(list_sum(list_transform(range(1, {d} + 1), i -> db[i] * pv[i])), 6) + 0.0 AS resid_proj,
       round(sqrt(list_sum(list_transform(db, x -> x * x))), 9) AS resid_norm
FROM deb
"""
    )


SPARK_QUERIES["embedding_debias_residuals"] = embedding_debias_residuals
ORACLE_SQL["embedding_debias_residuals"] = _debias_sql()


def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope/intercept of the corpus term distribution
    (`llm/text.py zipf_fit`, top 256 terms) — the language-health check
    (natural text ~ -1)."""
    ensure_views(spark, sf_dir)
    return text.zipf_fit(spark.table("documents"), top_k=256)


ZIPF_SQL = rf"""
WITH w AS (
  SELECT unnest({SQL_TOKENS}) AS w FROM documents
), f AS (
  SELECT w, COUNT(*) AS f FROM w GROUP BY w
  ORDER BY f DESC, w ASC LIMIT 256
), xy AS (
  SELECT round(ln(CAST(row_number() OVER (ORDER BY f DESC, w ASC) AS DOUBLE)), 9) AS x,
         round(ln(CAST(f AS DOUBLE)), 9) AS y
  FROM f
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(25,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(25,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxx
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_terms,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / NULLIF(CAST(n AS DOUBLE) * sxx - sx * sx, 0), 9) AS slope,
       round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / NULLIF(CAST(n AS DOUBLE) * sxx - sx * sx, 0) * sx)
             / CAST(n AS DOUBLE), 9) AS intercept
FROM m
"""

SPARK_QUERIES["corpus_zipf_fit"] = corpus_zipf_fit
ORACLE_SQL["corpus_zipf_fit"] = ZIPF_SQL


def embedding_dim_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension health report: mean and variance for every embedding
    dimension (decimal-exact sums), plus a dead-dimension flag —
    collapsed dimensions (variance ~ 0) are the classic sign of a broken
    encoder head or over-aggressive quantization. One exploded scan,
    map-side combined into dim-sized partials."""
    ensure_views(spark, sf_dir)
    dims = spark.table("embeddings").select(
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "_x")
    )
    agg = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast("decimal(38,12)")).alias("_s"),
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,12)")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = (
        F.col("_ss").cast("double") / F.col("_n")
        - (F.col("_s").cast("double") / F.col("_n"))
        * (F.col("_s").cast("double") / F.col("_n"))
    )
    return agg.select(
        "dim",
        F.col("_n").cast("long").alias("n"),
        F.round(mean, 9).alias("mean"),
        F.round(var, 9).alias("variance"),
        (var < 1e-6).alias("dead"),
    )


DIM_HEALTH_SQL = """
WITH dims AS (
  SELECT r.i - 1 AS dim, CAST(embedding[r.i] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) r(i)
), agg AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS DECIMAL(38,12))) AS s,
         SUM(CAST(x * x AS DECIMAL(38,12))) AS ss
  FROM dims GROUP BY dim
)
SELECT CAST(dim AS INTEGER) AS dim, n,
       round(CAST(s AS DOUBLE) / n, 9) AS mean,
       round(CAST(ss AS DOUBLE) / n
             - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 9) AS variance,
       (CAST(ss AS DOUBLE) / n
        - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) < 1e-6 AS dead
FROM agg
"""

SPARK_QUERIES["embedding_dim_health"] = embedding_dim_health
ORACLE_SQL["embedding_dim_health"] = DIM_HEALTH_SQL


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language identifier vs the
    labeled lang column (`llm/text.py lang_id`): per (labeled, predicted)
    cell count plus per-label recall — the eval every lang-ID heuristic
    ships with. Scan-side prediction, one cell-sized aggregate."""
    ensure_views(spark, sf_dir)
    pred = spark.table("documents").select(
        F.coalesce(F.col("lang"), F.lit("<null>")).alias("labeled"),
        text.lang_id(F.col("text")).alias("predicted"),
    )
    cells = pred.groupBy("labeled", "predicted").agg(F.count(F.lit(1)).alias("n"))
    totals = cells.groupBy("labeled").agg(F.sum("n").alias("_t"))
    return (
        cells.join(totals, "labeled")
        .select(
            "labeled",
            "predicted",
            "n",
            F.round(F.col("n") / F.col("_t"), 9).alias("share_of_label"),
        )
    )


def _lang_pred_cte() -> str:
    """Shared DuckDB CTE chain ``t → s → b → pred`` reproducing
    `llm/text.py lang_id` (labeled vs predicted language per doc) — the
    common prefix of the confusion-matrix and kappa oracles."""
    score_cols = []
    for lang, words in text.LANG_STOPWORDS.items():
        arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
        score_cols.append(f"len(list_intersect(dw, {arr})) AS s_{lang}")
    best = "greatest(" + ", ".join(f"s_{l}" for l in text.LANG_PRIORITY) + ")"
    cases = " ".join(
        f"WHEN s_{l} = best AND best > 0 THEN '{l}'" for l in text.LANG_PRIORITY
    )
    return rf"""t AS (
  SELECT COALESCE(lang, '<null>') AS labeled, list_distinct({SQL_TOKENS}) AS dw
  FROM documents
), s AS (
  SELECT labeled, {', '.join(score_cols)} FROM t
), b AS (
  SELECT *, {best} AS best FROM s
), pred AS (
  SELECT labeled, CASE {cases} ELSE 'und' END AS predicted FROM b
)"""


def _lang_confusion_sql() -> str:
    return rf"""
WITH {_lang_pred_cte()}, cells AS (
  SELECT labeled, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
), totals AS (
  SELECT labeled, SUM(n) AS t FROM cells GROUP BY labeled
)
SELECT cells.labeled, cells.predicted, CAST(cells.n AS BIGINT) AS n,
       round(CAST(cells.n AS DOUBLE) / totals.t, 9) AS share_of_label
FROM cells JOIN totals USING (labeled)
"""


SPARK_QUERIES["lang_id_confusion"] = lang_id_confusion
ORACLE_SQL["lang_id_confusion"] = _lang_confusion_sql()


def source_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity per source (distinct-1 and distinct-2: unique
    n-grams / total n-grams) — the standard degenerate-repetition metric
    for generated text (low distinct-2 = the model loops). Two
    map-side-combined aggregates over exploded tokens/bigrams; ratios
    rounded to 9."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = docs.select("source", text.word_tokens("text").alias("_w"))
    uni = toks.select("source", F.explode("_w").alias("_t"))
    n1 = F.greatest(F.size("_w") - 1, F.lit(0))
    bi = toks.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice("_w", 1, n1),
                F.slice("_w", 2, n1),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        ).alias("_b"),
    )
    u = uni.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("_t").alias("d_tokens"),
    )
    b = bi.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("_b").alias("d_bigrams"),
    )
    return (
        u.join(b, "source", "left")
        .select(
            "source",
            "n_tokens",
            "d_tokens",
            F.round(F.col("d_tokens") / F.col("n_tokens"), 9).alias("distinct_1"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("d_bigrams", F.lit(0)).alias("d_bigrams"),
            F.round(
                F.col("d_bigrams") / F.greatest(F.col("n_bigrams"), F.lit(1)), 9
            ).alias("distinct_2"),
        )
        .orderBy("source")
    )


DISTINCT_N_SQL = rf"""
WITH t AS (
  SELECT source, {SQL_TOKENS} AS w FROM documents
), uni AS (
  SELECT source, unnest(w) AS tok FROM t
), bi AS (
  SELECT source, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg
  FROM t WHERE len(w) >= 2
), u AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS d_tokens
  FROM uni GROUP BY source
), b AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT bg) AS BIGINT) AS d_bigrams
  FROM bi GROUP BY source
)
SELECT u.source, u.n_tokens, u.d_tokens,
       round(CAST(u.d_tokens AS DOUBLE) / u.n_tokens, 9) AS distinct_1,
       COALESCE(b.n_bigrams, 0) AS n_bigrams,
       COALESCE(b.d_bigrams, 0) AS d_bigrams,
       round(CAST(COALESCE(b.d_bigrams, 0) AS DOUBLE)
             / greatest(COALESCE(b.n_bigrams, 0), 1), 9) AS distinct_2
FROM u LEFT JOIN b USING (source)
ORDER BY u.source
"""

SPARK_QUERIES["source_distinct_ngrams"] = source_distinct_ngrams
ORACLE_SQL["source_distinct_ngrams"] = DISTINCT_N_SQL


_WIN_K, _WIN_W, _WIN_SHARED, _WIN_BUCKET = 12, 8, 5, 50


def doc_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap pairs via winnowing fingerprints (`llm/text.py
    winnow_fingerprints` / `winnow_overlap_pairs` — the SIGMOD'03 MOSS
    algorithm): every 12-gram hash competes in an 8-wide sliding
    window, each window keeps its rightmost minimum, and documents
    sharing >= 5 selected hashes pair up scored by overlap coefficient.
    Catches a copied paragraph inside otherwise-different documents —
    the case whole-doc hashing and Jaccard shingles both miss. The
    DuckDB oracle replays gram hashing (shared md5-long), the
    struct-min window, the hot-bucket recall cap, and the pair join."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.text import winnow_overlap_pairs

    return winnow_overlap_pairs(
        spark.table("documents"),
        k=_WIN_K,
        window=_WIN_W,
        min_shared=_WIN_SHARED,
        max_bucket=_WIN_BUCKET,
        num_partitions=spark.sparkContext.defaultParallelism,
    )


WINNOW_SQL = rf"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS t
  FROM documents
), g AS (
  SELECT doc_id, generate_subscripts(hs, 1) AS pos, unnest(hs) AS h
  FROM (SELECT doc_id,
               list_transform(range(1, greatest(length(t) - {_WIN_K - 2}, 1)),
                              i -> ('0x' || substr(md5(substr(t, i, {_WIN_K})), 1, 15))::BIGINT) AS hs
        FROM n)
), sel AS (
  SELECT DISTINCT doc_id,
         MIN({{'h': h, 'np': -pos}}) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW) AS s
  FROM g
), fp AS (
  SELECT DISTINCT doc_id, s.h AS fp FROM sel
), fpb AS (
  SELECT doc_id, fp FROM fp
  QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {_WIN_BUCKET}
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
  FROM fpb a JOIN fpb b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_WIN_SHARED}
)
SELECT a_id, b_id, shared,
       round(CAST(shared AS DOUBLE)
             / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 9) AS overlap
FROM pairs
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
"""

SPARK_QUERIES["doc_winnow_overlap"] = doc_winnow_overlap
ORACLE_SQL["doc_winnow_overlap"] = WINNOW_SQL


_TR_MIN_COOCCUR, _TR_ITER, _TR_TOPK = 5, 3, 20


def corpus_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank corpus keywords (`llm/text.py textrank_keywords`,
    EMNLP'04): adjacent-token co-occurrence graph (support >= 5, the
    densification cut) ranked by the deterministic integer PageRank —
    bit-identical across engines, so the DuckDB oracle replays the
    identical fixed-point rounds over the same word graph and the
    top-20 matches exactly (ties -> word order)."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.text import textrank_keywords

    return textrank_keywords(
        spark.table("documents"),
        min_cooccur=_TR_MIN_COOCCUR,
        iterations=_TR_ITER,
        top_k=_TR_TOPK,
    )


def _textrank_sql() -> str:
    from onetl_spark.showcase.graphs import _PR_SCALE, _pr_iter_sql

    rounds = "".join(
        "," + _pr_iter_sql(str(r), str(r + 1)) for r in range(_TR_ITER)
    )
    return rf"""
WITH tok AS (
  SELECT {SQL_TOKENS} AS t FROM documents
), pr_pairs AS (
  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
                i -> {{'u': least(t[i], t[i+1]), 'v': greatest(t[i], t[i+1])}})) AS p
  FROM tok
), pairs AS (
  SELECT p.u AS u, p.v AS v FROM pr_pairs WHERE p.u <> p.v
), ed AS (
  SELECT u, v FROM (SELECT u, v, COUNT(*) AS c FROM pairs GROUP BY u, v)
  WHERE c >= {_TR_MIN_COOCCUR}
), dir AS (
  SELECT u AS src, v AS dst FROM ed UNION ALL SELECT v AS src, u AS dst FROM ed
), nodes AS (SELECT DISTINCT src AS node FROM dir),
nn AS (SELECT COUNT(*) AS n FROM nodes),
od AS (SELECT src, COUNT(*) AS od FROM dir GROUP BY src),
r0 AS (SELECT node, {_PR_SCALE} // nn.n AS r FROM nodes, nn)
{rounds}
SELECT node AS word, CAST(r AS BIGINT) AS rank_fp FROM r{_TR_ITER}
ORDER BY rank_fp DESC, word LIMIT {_TR_TOPK}
"""


SPARK_QUERIES["corpus_textrank_keywords"] = corpus_textrank_keywords
ORACLE_SQL["corpus_textrank_keywords"] = _textrank_sql()


_BM25_TERMS = ("hash", "join", "window", "skew")
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 20


def corpus_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for the query {hash, join, window, skew}
    (`llm/text.py bm25_topk`): the lexical-retrieval baseline —
    saturating tf, length normalization, broadcast inverted-index
    probe. Per-term scores round to 9 decimals and sum as DECIMAL, so
    the ranking is bit-stable and the DuckDB oracle reproduces it
    exactly (ties -> doc id)."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.text import bm25_topk

    return bm25_topk(
        spark.table("documents"),
        list(_BM25_TERMS),
        k1=_BM25_K1,
        b=_BM25_B,
        top_k=_BM25_TOPK,
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1p1, one_b, k1, b = repr(_BM25_K1 + 1.0), repr(1.0 - _BM25_B), repr(_BM25_K1), repr(_BM25_B)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
), lens AS (
  SELECT doc_id, len({SQL_TOKENS}) AS l FROM documents
), stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(l) AS BIGINT) AS tl FROM lens
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY 1, 2
), dfq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         CAST(round(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
                    * tf * {k1p1}
                    / (tf + {k1} * ({one_b} + {b} * l
                       / (CAST(tl AS DOUBLE) / CAST(n AS DOUBLE)))), 9)
              AS DECIMAL(20,9)) AS ts
  FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(ts) AS DOUBLE) AS bm25,
       COUNT(*) AS n_terms_hit
FROM scored GROUP BY doc_id
ORDER BY SUM(ts) DESC, doc_id LIMIT {_BM25_TOPK}
"""


SPARK_QUERIES["corpus_bm25_topk"] = corpus_bm25_topk
ORACLE_SQL["corpus_bm25_topk"] = _bm25_sql()


_BLOCKLIST = [
    "fast table",
    "scan slow fast",
    "batch window spark",
    "no such phrase anywhere",
    "value",
]


def blocklist_phrase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-phrase audit over the corpus (`llm/text.py
    phrase_blocklist_counts`): every occurrence of every banned phrase as
    a contiguous token run, via positional token equi-joins against the
    broadcast phrase table — Aho-Corasick semantics without a per-row
    automaton UDF or an O(corpus×phrases) regex scan. Zero-hit phrases
    are reported explicitly."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.text import phrase_blocklist_counts

    return phrase_blocklist_counts(spark.table("documents"), _BLOCKLIST)


def _blocklist_values_sql() -> str:
    rows = []
    for ph in _BLOCKLIST:
        ws = ph.split()
        rows.extend(
            f"('{ph}', {off}, '{w.lower()}', {len(ws)})" for off, w in enumerate(ws)
        )
    return ", ".join(rows)


BLOCKLIST_SQL = rf"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), tok AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok FROM t
), phr(phrase, off, tok, plen) AS (VALUES {{values}}),
cand AS (
  SELECT k.doc_id, k.pos AS start, p.phrase, p.plen
  FROM tok k JOIN phr p ON p.off = 0 AND k.tok = p.tok
), m AS (
  SELECT c.doc_id, c.start, c.phrase, ANY_VALUE(c.plen) AS plen,
         COUNT(*) AS nm
  FROM cand c
  JOIN phr p ON p.phrase = c.phrase
  JOIN tok k ON k.doc_id = c.doc_id AND k.pos = c.start + p.off AND k.tok = p.tok
  GROUP BY 1, 2, 3
  HAVING COUNT(*) = ANY_VALUE(c.plen)
), agg AS (
  SELECT phrase, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM m GROUP BY phrase
)
SELECT p.phrase, COALESCE(agg.n_docs, 0) AS n_docs, COALESCE(agg.n_hits, 0) AS n_hits
FROM (SELECT DISTINCT phrase FROM phr) p LEFT JOIN agg USING (phrase)
""".replace("{values}", _blocklist_values_sql())

SPARK_QUERIES["blocklist_phrase_hits"] = blocklist_phrase_hits
ORACLE_SQL["blocklist_phrase_hits"] = BLOCKLIST_SQL


_GM_ITER = 3


def embedding_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric median (robust centroid) of the embedding cloud by
    Weiszfeld iteration (`llm/similarity.py geometric_median`, 3
    iterations): inverse-distance-weighted means, re-estimated per scan,
    with the full trajectory replayed as chained CTEs in the oracle —
    the robust anchor for outlier screens where a junk tail drags the
    mean. Returned next to the mean so the robust-vs-moment gap shows."""
    ensure_views(spark, sf_dir)
    return similarity.geometric_median(
        spark.table("embeddings"), iterations=_GM_ITER
    )


def _geo_median_sql(iters: int = _GM_ITER, d: int = 64) -> str:
    parts = [
        "WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE embedding IS NOT NULL)",
        f"""md AS (
  SELECT r.i AS i,
         CAST(SUM(CAST(v[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM e, range(1, {d} + 1) r(i) GROUP BY r.i)""",
        "y0 AS (SELECT list_transform(list(mu ORDER BY i), x -> round(x, 9)) AS y FROM md)",
    ]
    for r in range(1, iters + 1):
        prev = f"y{r - 1}"
        parts.append(
            f"""f{r} AS (
  SELECT v, dist FROM (
    SELECT e.v,
           sqrt(list_sum(list_transform(range(1, {d} + 1),
                i -> (e.v[i] - {prev}.y[i]) * (e.v[i] - {prev}.y[i])))) AS dist
    FROM e CROSS JOIN {prev})
  WHERE dist > 0)"""
        )
        parts.append(
            f"""n{r} AS (
  SELECT j.i AS j,
         CAST(SUM(CAST(round(v[j.i] / dist, 9) AS DECIMAL(30,9))) AS DOUBLE) AS w
  FROM f{r}, range(1, {d} + 1) j(i) GROUP BY j.i)"""
        )
        parts.append(
            f"""d{r} AS (
  SELECT CAST(SUM(CAST(round(1.0 / dist, 9) AS DECIMAL(30,9))) AS DOUBLE) AS den
  FROM f{r})"""
        )
        parts.append(
            f"""y{r} AS (
  SELECT list_transform(wl, x -> round(x / den, 9)) AS y
  FROM (SELECT list(w ORDER BY j) AS wl FROM n{r}) CROSS JOIN d{r})"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT CAST(r.i - 1 AS INTEGER) AS dim,
       y0.y[r.i] AS mean,
       y{iters}.y[r.i] AS geo_median
FROM y0 CROSS JOIN y{iters}, range(1, {d} + 1) r(i)
"""
    )


SPARK_QUERIES["embedding_geometric_median"] = embedding_geometric_median
ORACLE_SQL["embedding_geometric_median"] = _geo_median_sql()


_HEAPS_POINTS = 20


def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) ≈ K·n^β, estimated by
    log-log OLS over vocabulary size at {_HEAPS_POINTS} corpus-prefix
    checkpoints (docs ordered by doc_id). A sublinear β (~0.5) is the
    healthy-corpus signature; β near 1 flags an ID-like / noisy token
    stream the tokenizer should not be fed.

    Scale shape: per-term FIRST document (one term-keyed aggregate) and
    per-doc token counts (one doc-keyed aggregate) — never a global
    running window over documents; checkpoint totals come from a
    broadcast inequality join against the {_HEAPS_POINTS}-row threshold
    table (bounded ×{_HEAPS_POINTS} fan-out of AGGREGATED rows), and the
    OLS epilogue runs on {_HEAPS_POINTS} rows with decimal-rounded term
    sums."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = docs.select("doc_id", F.explode(text.word_tokens("text")).alias("_t"))
    doc_tokens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    term_first = toks.groupBy("_t").agg(F.min("doc_id").alias("_fd"))
    bounds = docs.agg(
        F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi")
    )
    checkpoints = (
        spark.range(1, _HEAPS_POINTS + 1)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col("id").cast("int").alias("ckpt"),
            (
                F.col("_lo")
                + ((F.col("_hi") - F.col("_lo")) * F.col("id")) / _HEAPS_POINTS
            ).cast("long").alias("_thresh"),
        )
    )
    n_at = (
        doc_tokens.join(
            F.broadcast(checkpoints), F.col("doc_id") <= F.col("_thresh")
        )
        .groupBy("ckpt")
        .agg(F.sum("_n").alias("n_tokens"))
    )
    v_at = (
        term_first.join(
            F.broadcast(checkpoints), F.col("_fd") <= F.col("_thresh")
        )
        .groupBy("ckpt")
        .agg(F.count(F.lit(1)).alias("n_vocab"))
    )
    pts = (
        n_at.join(v_at, "ckpt")
        .filter((F.col("n_tokens") > 0) & (F.col("n_vocab") > 0))
        .select(
            F.log(F.col("n_tokens").cast("double")).alias("_x"),
            F.log(F.col("n_vocab").cast("double")).alias("_y"),
        )
    )
    # two-pass CENTERED OLS: the uncentered normal equations subtract
    # near-equal O(mag^2) sums, amplifying the 1e-9 term-rounding noise
    # into the leading digit of a near-zero slope (seen: the two engines
    # disagreed at 7e-9 vs 8e-9); centered products are O(variance) per
    # term, so the decimal-rounded sums are bit-identical by construction
    means = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.round(
            F.sum(F.round(F.col("_x"), 9).cast("decimal(30,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mx"),
        F.round(
            F.sum(F.round(F.col("_y"), 9).cast("decimal(30,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("my"),
    )
    cen = pts.crossJoin(F.broadcast(means))
    agg = cen.groupBy("m", "mx", "my").agg(
        F.sum(
            F.round((F.col("_x") - F.col("mx")) * (F.col("_x") - F.col("mx")), 9)
            .cast("decimal(30,9)")
        ).cast("double").alias("sxx"),
        F.sum(
            F.round((F.col("_x") - F.col("mx")) * (F.col("_y") - F.col("my")), 9)
            .cast("decimal(30,9)")
        ).cast("double").alias("sxy"),
    )
    beta = F.col("sxy") / F.col("sxx")
    return agg.select(
        F.col("m").alias("points"),
        F.when(F.col("sxx") > 0, F.round(beta, 9) + F.lit(0.0)).alias("beta"),
        F.when(
            F.col("sxx") > 0,
            F.round(F.exp(F.col("my") - beta * F.col("mx")), 6),
        ).alias("k"),
    )


HEAPS_SQL = rf"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), tok AS (
  SELECT doc_id, unnest(w) AS tk FROM t
), doc_tokens AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
), term_first AS (
  SELECT tk, MIN(doc_id) AS fd FROM tok GROUP BY tk
), bounds AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
), ck AS (
  SELECT CAST(r.i AS INTEGER) AS ckpt,
         CAST(lo + ((hi - lo) * r.i) / {_HEAPS_POINTS} AS BIGINT) AS thresh
  FROM bounds, range(1, {_HEAPS_POINTS} + 1) r(i)
), n_at AS (
  SELECT ckpt, CAST(SUM(n) AS BIGINT) AS n_tokens
  FROM doc_tokens JOIN ck ON doc_id <= thresh GROUP BY ckpt
), v_at AS (
  SELECT ckpt, CAST(COUNT(*) AS BIGINT) AS n_vocab
  FROM term_first JOIN ck ON fd <= thresh GROUP BY ckpt
), pts AS (
  SELECT ln(CAST(n_tokens AS DOUBLE)) AS x, ln(CAST(n_vocab AS DOUBLE)) AS y
  FROM n_at JOIN v_at USING (ckpt)
  WHERE n_tokens > 0 AND n_vocab > 0
), means AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*), 9) AS mx,
         round(CAST(SUM(CAST(round(y, 9) AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*), 9) AS my
  FROM pts
), agg AS (
  SELECT m, mx, my,
         CAST(SUM(CAST(round((x - mx) * (x - mx), 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round((x - mx) * (y - my), 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxy
  FROM pts CROSS JOIN means
  GROUP BY m, mx, my
)
SELECT m AS points,
       CASE WHEN sxx > 0 THEN round(sxy / sxx, 9) + 0.0 END AS beta,
       CASE WHEN sxx > 0 THEN round(exp(my - (sxy / sxx) * mx), 6) END AS k
FROM agg
"""

SPARK_QUERIES["corpus_heaps_law"] = corpus_heaps_law
ORACLE_SQL["corpus_heaps_law"] = HEAPS_SQL


def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between the unigram
    distributions of every source pair — the symmetric, bounded [0,1]
    "how different are these corpora" number that drives mixture
    reweighting decisions. 0 = identical term distributions, 1 =
    disjoint vocabularies.

    Scale shape: one (source, term) count aggregate over the corpus;
    source pairs are enumerated from the bounded source list (k(k-1)/2
    rows, broadcast); each pair's term union materializes via two
    broadcast equi-joins UNION ALL-ed then a (pair, term) groupBy — the
    full-outer-with-zero-fill semantics without a full outer join. A
    term present in one source only contributes p/2 exactly
    (log2(2p/(p+0)) = 1). Per-term contributions round to 12 and
    accumulate as exact decimals, order-independent in both engines."""
    ensure_views(spark, sf_dir)
    toks = spark.table("documents").select(
        "source", F.explode(text.word_tokens("text")).alias("_t")
    )
    counts = toks.groupBy("source", "_t").agg(F.count(F.lit(1)).alias("_c"))
    totals = counts.groupBy("source").agg(F.sum("_c").alias("_n"))
    probs = counts.join(totals, "source").select(
        "source", "_t", (F.col("_c").cast("double") / F.col("_n")).alias("_p")
    )
    srcs = totals.select("source")
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(srcs.select(F.col("source").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    side_a = probs.join(
        F.broadcast(pairs), probs["source"] == pairs["src_a"]
    ).select("src_a", "src_b", "_t", F.col("_p").alias("_pa"), F.lit(0.0).alias("_pb"))
    side_b = probs.join(
        F.broadcast(pairs), probs["source"] == pairs["src_b"]
    ).select("src_a", "src_b", "_t", F.lit(0.0).alias("_pa"), F.col("_p").alias("_pb"))
    merged = (
        side_a.unionAll(side_b)
        .groupBy("src_a", "src_b", "_t")
        .agg(F.sum("_pa").alias("pa"), F.sum("_pb").alias("pb"))
    )
    contrib = (
        F.when(F.col("pa") > 0, F.col("pa") * F.log2(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))).otherwise(F.lit(0.0))
        + F.when(F.col("pb") > 0, F.col("pb") * F.log2(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb")))).otherwise(F.lit(0.0))
    )
    return (
        merged.select(
            "src_a",
            "src_b",
            F.round(contrib, 12).cast("decimal(30,12)").alias("_w"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.round(F.sum("_w").cast("double") / 2, 9).alias("jsd_bits"))
    )


JSD_SQL = rf"""
WITH t AS (
  SELECT source, {SQL_TOKENS} AS w FROM documents
), tok AS (
  SELECT source, unnest(w) AS tk FROM t
), counts AS (
  SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), totals AS (
  SELECT source, SUM(c) AS n FROM counts GROUP BY source
), probs AS (
  SELECT counts.source, tk, CAST(c AS DOUBLE) / n AS p
  FROM counts JOIN totals USING (source)
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM totals a, totals b WHERE a.source < b.source
), sides AS (
  SELECT src_a, src_b, tk, p AS pa, 0.0 AS pb
  FROM probs JOIN pairs ON probs.source = pairs.src_a
  UNION ALL
  SELECT src_a, src_b, tk, 0.0 AS pa, p AS pb
  FROM probs JOIN pairs ON probs.source = pairs.src_b
), merged AS (
  SELECT src_a, src_b, tk, SUM(pa) AS pa, SUM(pb) AS pb
  FROM sides GROUP BY 1, 2, 3
), terms AS (
  SELECT src_a, src_b,
         CAST(round(
           CASE WHEN pa > 0 THEN pa * log2(2.0 * pa / (pa + pb)) ELSE 0.0 END
           + CASE WHEN pb > 0 THEN pb * log2(2.0 * pb / (pa + pb)) ELSE 0.0 END,
         12) AS DECIMAL(30,12)) AS w
  FROM merged
)
SELECT src_a, src_b, round(CAST(SUM(w) AS DOUBLE) / 2, 9) AS jsd_bits
FROM terms GROUP BY src_a, src_b
"""

SPARK_QUERIES["source_js_divergence"] = source_js_divergence
ORACLE_SQL["source_js_divergence"] = JSD_SQL


_BD_TOP = 50


def source_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every source pair —
    the standard authorship-attribution measure (Burrows, "'Delta': a
    Measure of Stylistic Difference", LLC 2002): z-score each source's
    relative frequency of the corpus's top-{_BD_TOP} terms (function
    words carry style), then average |Δz| over the term panel. Near-0 =
    same register; large = different linguistic style — the signal for
    routing sources to different cleaning pipelines.

    Scale shape: one (source, term) aggregate; the term panel is the
    corpus-wide top-{_BD_TOP} (deterministic tie-break), the z grid is
    panel × sources (bounded, broadcast), and every cross-source moment
    accumulates decimal-rounded terms — order-independent in both
    engines. Terms constant across sources pin z = 0 (no 0/0)."""
    ensure_views(spark, sf_dir)
    toks = spark.table("documents").select(
        "source", F.explode(text.word_tokens("text")).alias("_t")
    )
    counts = toks.groupBy("source", "_t").agg(F.count(F.lit(1)).alias("_c"))
    totals = counts.groupBy("source").agg(F.sum("_c").alias("_n"))
    top = (
        counts.groupBy("_t")
        .agg(F.sum("_c").alias("_tc"))
        .orderBy(F.col("_tc").desc(), F.col("_t").asc())
        .limit(_BD_TOP)
        .select("_t")
    )
    probs = counts.join(totals, "source").select(
        "source", "_t", (F.col("_c").cast("double") / F.col("_n")).alias("_p")
    )
    grid = (
        top.crossJoin(totals.select("source"))
        .join(probs, ["_t", "source"], "left")
        .select("_t", "source", F.coalesce("_p", F.lit(0.0)).alias("_p"))
    )
    stats = grid.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum(F.round(F.col("_p"), 12).cast("decimal(30,12)")).cast("double").alias("_sp"),
        F.sum(F.round(F.col("_p") * F.col("_p"), 12).cast("decimal(30,12)")).cast("double").alias("_spp"),
    )
    z = grid.join(stats, "_t").select(
        "_t",
        "source",
        F.when(
            F.col("_spp") / F.col("_k")
            - (F.col("_sp") / F.col("_k")) * (F.col("_sp") / F.col("_k"))
            > 0,
            F.round(
                (F.col("_p") - F.col("_sp") / F.col("_k"))
                / F.sqrt(
                    F.col("_spp") / F.col("_k")
                    - (F.col("_sp") / F.col("_k")) * (F.col("_sp") / F.col("_k"))
                ),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("_z"),
    )
    a = z.select(F.col("source").alias("src_a"), "_t", F.col("_z").alias("_za"))
    b = z.select(F.col("source").alias("src_b"), "_t", F.col("_z").alias("_zb"))
    return (
        a.join(b, "_t")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.round(
                F.sum(
                    F.round(F.abs(F.col("_za") - F.col("_zb")), 12).cast(
                        "decimal(30,12)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("delta")
        )
    )


BURROWS_SQL = rf"""
WITH t AS (
  SELECT source, {SQL_TOKENS} AS w FROM documents
), tok AS (
  SELECT source, unnest(w) AS tk FROM t
), counts AS (
  SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), totals AS (
  SELECT source, SUM(c) AS n FROM counts GROUP BY source
), topt AS (
  SELECT tk FROM (SELECT tk, SUM(c) AS tc FROM counts GROUP BY tk)
  ORDER BY tc DESC, tk ASC LIMIT {_BD_TOP}
), probs AS (
  SELECT counts.source, tk, CAST(c AS DOUBLE) / n AS p
  FROM counts JOIN totals USING (source)
), grid AS (
  SELECT topt.tk, totals.source, COALESCE(probs.p, 0.0) AS p
  FROM topt CROSS JOIN totals
  LEFT JOIN probs ON probs.tk = topt.tk AND probs.source = totals.source
), stats AS (
  SELECT tk, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(round(p, 12) AS DECIMAL(30,12))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(round(p * p, 12) AS DECIMAL(30,12))) AS DOUBLE) AS spp
  FROM grid GROUP BY tk
), z AS (
  SELECT grid.tk, grid.source,
         CASE WHEN spp / k - (sp / k) * (sp / k) > 0 THEN
           round((p - sp / k) / sqrt(spp / k - (sp / k) * (sp / k)), 9)
         ELSE 0.0 END AS z
  FROM grid JOIN stats ON stats.tk = grid.tk
)
SELECT a.source AS src_a, b.source AS src_b,
       round(CAST(SUM(CAST(round(abs(a.z - b.z), 12) AS DECIMAL(30,12))) AS DOUBLE)
             / COUNT(*), 9) AS delta
FROM z a JOIN z b ON a.tk = b.tk AND a.source < b.source
GROUP BY 1, 2
"""

SPARK_QUERIES["source_burrows_delta"] = source_burrows_delta
ORACLE_SQL["source_burrows_delta"] = BURROWS_SQL


_TB_MIN, _TB_TOP = 50, 20


def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TB_TOP} burstiest terms by variance-to-mean ratio of their
    per-document counts (Church & Gale, "Poisson mixtures", JNLE 1995):
    VMR 1 = Poisson scatter (function-word-like); VMR >> 1 = the term
    clumps in few documents (topical/boilerplate) — the corpus statistic
    that separates content terms from glue without any labels, and flags
    pasted boilerplate when a "function word" suddenly bursts.

    Exactness: with integer per-doc counts, VMR = s2/s1 − s1/N exactly
    (zero-count documents folded in algebraically — no N-times-vocab
    grid is ever materialized), evaluated in one pinned double
    parenthesization. One (term, doc) aggregate then one term aggregate;
    the top-k is a deterministic TakeOrdered (VMR desc, term asc)."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("_nd"))
    td = (
        docs.select("doc_id", F.explode(text.word_tokens("text")).alias("_t"))
        .groupBy("doc_id", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_term = td.groupBy("_t").agg(
        F.sum("_c").alias("_s1"),
        F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
        F.count(F.lit(1)).alias("_df"),
    )
    return (
        per_term.filter(F.col("_s1") >= _TB_MIN)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("_t").alias("term"),
            F.col("_s1").alias("n_occurrences"),
            F.col("_df").alias("n_docs_containing"),
            F.round(
                F.col("_s2").cast("double") / F.col("_s1")
                - F.col("_s1").cast("double") / F.col("_nd"),
                9,
            ).alias("vmr"),
        )
        .orderBy(F.col("vmr").desc(), F.col("term").asc())
        .limit(_TB_TOP)
    )


BURSTINESS_SQL = rf"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), td AS (
  SELECT doc_id, unnest(w) AS tk FROM t
), cnt AS (
  SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c FROM td GROUP BY 1, 2
), per_term AS (
  SELECT tk, CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM cnt GROUP BY tk
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
SELECT tk AS term, s1 AS n_occurrences, df AS n_docs_containing,
       round(CAST(s2 AS DOUBLE) / s1 - CAST(s1 AS DOUBLE) / nd.n, 9) AS vmr
FROM per_term CROSS JOIN nd
WHERE s1 >= {_TB_MIN}
ORDER BY vmr DESC, term ASC
LIMIT {_TB_TOP}
"""

SPARK_QUERIES["term_burstiness"] = term_burstiness
ORACLE_SQL["term_burstiness"] = BURSTINESS_SQL


_RECALL_PANEL = [0, 1, 2, 3, 4, 5, 6, 7]
_RECALL_K = 10


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of single-probe IVF against exact brute force over an
    8-query panel (`llm/similarity.py ivf_recall_eval`) — the FAISS-style
    self-evaluation that tells you whether the ANN scale path can be
    trusted before it feeds dedup/retrieval. Corpus assigned to
    broadcast centroids once; both top-k relations use deterministic
    tie-breaks so recall is engine-exact."""
    ensure_views(spark, sf_dir)
    return similarity.ivf_recall_eval(
        spark.table("embeddings"), _RECALL_PANEL, k=_RECALL_K
    )


def _cos_sql(va: str, vb: str) -> str:
    return (
        f"round(list_sum(list_transform(range(1, len({va})+1), "
        f"i -> CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE))) / "
        f"(sqrt(list_sum(list_transform({va}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
        f"sqrt(list_sum(list_transform({vb}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)"
    )


ANN_RECALL_SQL = f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 64 = 7
), scored AS (
  SELECT v.vec_id, c.centroid_id, {_cos_sql('v.embedding', 'c.cvec')} AS ccos
  FROM embeddings v CROSS JOIN centroids c
), assigned AS (
  SELECT vec_id, centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY ccos DESC, centroid_id ASC) AS rn
        FROM scored)
  WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id IN ({', '.join(map(str, _RECALL_PANEL))})
), qprobe AS (
  SELECT query_id, qvec, centroid_id
  FROM (SELECT q.query_id, q.qvec, c.centroid_id,
               {_cos_sql('q.qvec', 'c.cvec')} AS qcos,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql('q.qvec', 'c.cvec')} DESC,
                                           c.centroid_id ASC) AS rn
        FROM q CROSS JOIN centroids c)
  WHERE rn = 1
), approx AS (
  SELECT query_id, neighbor_id
  FROM (SELECT p.query_id, v.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                                  ORDER BY {_cos_sql('v.embedding', 'p.qvec')} DESC,
                                           v.vec_id ASC) AS rn
        FROM embeddings v
        JOIN assigned a ON a.vec_id = v.vec_id
        JOIN qprobe p ON p.centroid_id = a.centroid_id
        WHERE v.vec_id <> p.query_id)
  WHERE rn <= {_RECALL_K}
), exact AS (
  SELECT query_id, neighbor_id
  FROM (SELECT q.query_id, v.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql('v.embedding', 'q.qvec')} DESC,
                                           v.vec_id ASC) AS rn
        FROM embeddings v CROSS JOIN q
        WHERE v.vec_id <> q.query_id)
  WHERE rn <= {_RECALL_K}
), hits AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM exact JOIN approx USING (query_id, neighbor_id)
  GROUP BY query_id
)
SELECT q.query_id, COALESCE(hits.n, 0) AS n_hits,
       round(COALESCE(hits.n, 0) / {float(_RECALL_K)}, 9) AS recall
FROM q LEFT JOIN hits USING (query_id)
"""

SPARK_QUERIES["ann_ivf_recall"] = ann_ivf_recall
ORACLE_SQL["ann_ivf_recall"] = ANN_RECALL_SQL


def embedding_second_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second principal component by BLOCK (orthogonal) power iteration
    (`top_two_principal_components`): a d×2 basis advances with
    per-iteration Gram-Schmidt, ONE corpus scan per iteration for both
    directions — replacing the r8 design of two sequential deflated
    power-iteration runs (two mean passes + a deflation pass + two
    scans per iteration; judge r8 task: halve it). The `ortho` column
    (v1·v2, ≈0) certifies the orthogonalization. Oracle: the block CTE
    chain replays the same trajectory (means → per-iteration dual
    matvec → Gram-Schmidt → Rayleigh), bit-for-bit."""
    ensure_views(spark, sf_dir)
    from pyspark import StorageLevel

    emb = spark.table("embeddings")
    rows = sorted(
        similarity.top_two_principal_components(
            emb, iterations=_PC_ITER, persist=StorageLevel.MEMORY_AND_DISK
        ).collect(),
        key=lambda r: r["dim"],
    )
    v1 = [r["component1"] for r in rows]
    v2 = [r["component2"] for r in rows]
    eig2 = rows[0]["eigenvalue2"]
    d = len(v2)
    c1 = F.array(*[F.lit(float(x)) for x in v1])
    c2 = F.array(*[F.lit(float(x)) for x in v2])
    ortho = (
        F.round(
            F.aggregate(
                F.zip_with(c1, c2, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            6,
        )
        + F.lit(0.0)
    )
    return spark.range(d).select(
        F.col("id").cast("int").alias("dim"),
        F.element_at(c2, (F.col("id") + 1).cast("int")).alias("component"),
        F.lit(float(eig2)).alias("eigenvalue"),
        ortho.alias("ortho"),
    )


def _second_component_sql(iters: int = _PC_ITER, d: int = 64) -> str:
    """Block power iteration mirror: p{r} carries BOTH basis vectors.
    Per iteration: dual matvec (s1,s2 from one pass over e), decimal
    per-dimension reduce for w1/w2, then Gram-Schmidt — normalize w1
    (round 9), project w2 off it (plain IEEE doubles, the same left
    folds the Spark driver computes), normalize the residual (round 9)."""
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE embedding IS NOT NULL)",
        f"""md AS (
  SELECT r.i AS i,
         CAST(SUM(CAST(v[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM e, range(1, {d} + 1) r(i) GROUP BY r.i)""",
        "m AS (SELECT list(mu ORDER BY i) AS mu FROM md)",
        "nn AS (SELECT COUNT(*) AS n FROM e)",
        f"""p0 AS (SELECT [1.0] || list_transform(range(1, {d}), x -> 0.0) AS pv1,
                   [0.0, 1.0] || list_transform(range(2, {d}), x -> 0.0) AS pv2)""",
    ]
    for r in range(1, iters + 1):
        prev = f"p{r - 1}"
        parts.append(
            f"""s{r} AS (
  SELECT e.v,
         list_sum(list_transform(range(1, {d} + 1), i -> (e.v[i] - m.mu[i]) * {prev}.pv1[i])) AS s1,
         list_sum(list_transform(range(1, {d} + 1), i -> (e.v[i] - m.mu[i]) * {prev}.pv2[i])) AS s2
  FROM e CROSS JOIN m CROSS JOIN {prev})"""
        )
        parts.append(
            f"""t{r} AS (
  SELECT j.i AS j,
         CAST(round(s{r}.s1 * (s{r}.v[j.i] - m.mu[j.i]), 9) AS DECIMAL(30,9)) AS t1,
         CAST(round(s{r}.s2 * (s{r}.v[j.i] - m.mu[j.i]), 9) AS DECIMAL(30,9)) AS t2
  FROM s{r} CROSS JOIN m, range(1, {d} + 1) j(i))"""
        )
        parts.append(
            f"""w{r} AS (
  SELECT list(w1 ORDER BY j) AS w1l, list(w2 ORDER BY j) AS w2l
  FROM (SELECT j, CAST(SUM(t1) AS DOUBLE) AS w1, CAST(SUM(t2) AS DOUBLE) AS w2
        FROM t{r} GROUP BY j))"""
        )
        parts.append(
            f"""a{r} AS (
  SELECT list_transform(w1l, x -> round(x / sqrt(list_sum(list_transform(w1l, y -> y * y))), 9)) AS pv1,
         w2l
  FROM w{r})"""
        )
        parts.append(
            f"""b{r} AS (
  SELECT pv1, w2l,
         list_sum(list_transform(range(1, {d} + 1), i -> w2l[i] * pv1[i])) AS pj
  FROM a{r})"""
        )
        parts.append(
            f"""c{r} AS (
  SELECT pv1, list_transform(range(1, {d} + 1), i -> w2l[i] - pj * pv1[i]) AS r2
  FROM b{r})"""
        )
        parts.append(
            f"""p{r} AS (
  SELECT pv1, list_transform(r2, x -> round(x / sqrt(list_sum(list_transform(r2, y -> y * y))), 9)) AS pv2
  FROM c{r})"""
        )
    parts.append(
        f"""sF AS (
  SELECT list_sum(list_transform(range(1, {d} + 1), i -> (e.v[i] - m.mu[i]) * p{iters}.pv2[i])) AS s2
  FROM e CROSS JOIN m CROSS JOIN p{iters})"""
    )
    parts.append(
        f"ssF AS (SELECT CAST(SUM(CAST(round(s2 * s2, 9) AS DECIMAL(30,9))) AS DOUBLE) AS ss FROM sF)"
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT CAST(r.i - 1 AS INTEGER) AS dim,
       p{iters}.pv2[r.i] AS component,
       round(ssF.ss / nn.n, 9) AS eigenvalue,
       round(list_sum(list_transform(range(1, {d} + 1),
             k -> p{iters}.pv1[k] * p{iters}.pv2[k])), 6) + 0.0 AS ortho
FROM p{iters} CROSS JOIN nn CROSS JOIN ssF, range(1, {d} + 1) r(i)
"""
    )


SPARK_QUERIES["embedding_second_component"] = embedding_second_component
ORACLE_SQL["embedding_second_component"] = _second_component_sql()


def source_lm_transfer_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source unigram LM transfer: train an add-one-smoothed
    unigram model on each source, evaluate average log2 probability per
    token on every source (including itself) — the k×k transfer matrix
    whose diagonal-vs-off-diagonal gap quantifies how much each source's
    token distribution would surprise a model trained elsewhere (the
    cheap proxy for the cross-domain perplexity grids mixture designers
    consult). Smoothing: p(t) = (c_train(t)+1)/(N_train+V) with V the
    GLOBAL vocabulary, so unseen tokens are well-defined.

    Scale shape: one (source, term) aggregate; eval-side counts join
    train-side counts per ordered source pair through the bounded pair
    list (broadcast); per-term contributions c_eval·log2(p) round to 12
    and accumulate as exact decimals."""
    ensure_views(spark, sf_dir)
    toks = spark.table("documents").select(
        "source", F.explode(text.word_tokens("text")).alias("_t")
    )
    counts = toks.groupBy("source", "_t").agg(F.count(F.lit(1)).alias("_c"))
    totals = counts.groupBy("source").agg(F.sum("_c").alias("_n"))
    vocab = counts.select("_t").distinct().agg(F.count(F.lit(1)).alias("_v"))
    pairs = (
        totals.select(F.col("source").alias("train_src"), F.col("_n").alias("_ntr"))
        .crossJoin(
            totals.select(F.col("source").alias("eval_src"), F.col("_n").alias("_nev"))
        )
    )
    ev = counts.select(
        F.col("source").alias("eval_src"),
        F.col("_t").alias("_te"),
        F.col("_c").alias("_ce"),
    )
    tr = counts.select(
        F.col("source").alias("_trs"),
        F.col("_t").alias("_tt"),
        F.col("_c").alias("_ct"),
    )
    joined = (
        pairs.join(ev, "eval_src")
        .join(
            tr,
            (F.col("train_src") == F.col("_trs")) & (F.col("_te") == F.col("_tt")),
            "left",
        )
        .drop("_trs")
        .crossJoin(F.broadcast(vocab))
        .select(
            "train_src",
            "eval_src",
            "_nev",
            "_ce",
            F.round(
                F.col("_ce").cast("double")
                * F.log2(
                    (F.coalesce("_ct", F.lit(0)) + 1).cast("double")
                    / (F.col("_ntr") + F.col("_v")).cast("double")
                ),
                12,
            )
            .cast("decimal(30,12)")
            .alias("_term"),
        )
    )
    return (
        joined.groupBy("train_src", "eval_src", "_nev")
        .agg(
            F.round(F.sum("_term").cast("double") / F.col("_nev"), 9).alias(
                "avg_log2_prob"
            )
        )
        .select("train_src", "eval_src", "avg_log2_prob")
        .orderBy("train_src", "eval_src")
    )


LM_TRANSFER_SQL = rf"""
WITH t AS (
  SELECT source, {SQL_TOKENS} AS w FROM documents
), tok AS (
  SELECT source, unnest(w) AS tk FROM t
), counts AS (
  SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), totals AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source
), vocab AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v FROM counts),
pairs AS (
  SELECT a.source AS train_src, a.n AS ntr, b.source AS eval_src, b.n AS nev
  FROM totals a CROSS JOIN totals b
), terms AS (
  SELECT p.train_src, p.eval_src, p.nev,
         CAST(round(CAST(e.c AS DOUBLE)
                    * log2(CAST(COALESCE(tr.c, 0) + 1 AS DOUBLE)
                           / CAST(p.ntr + vocab.v AS DOUBLE)), 12)
              AS DECIMAL(30,12)) AS term
  FROM pairs p
  JOIN counts e ON e.source = p.eval_src
  LEFT JOIN counts tr ON tr.source = p.train_src AND tr.tk = e.tk
  CROSS JOIN vocab
)
SELECT train_src, eval_src,
       round(CAST(SUM(term) AS DOUBLE) / nev, 9) AS avg_log2_prob
FROM terms GROUP BY train_src, eval_src, nev
ORDER BY train_src, eval_src
"""

SPARK_QUERIES["source_lm_transfer_matrix"] = source_lm_transfer_matrix
ORACLE_SQL["source_lm_transfer_matrix"] = LM_TRANSFER_SQL


_LLR_MIN, _LLR_TOP = 5, 20


def bigram_llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_LLR_TOP} collocations by Dunning's log-likelihood ratio
    (Dunning, "Accurate Methods for the Statistics of Surprise and
    Coincidence", CL 1993) — the collocation test that stays calibrated
    at low counts where PMI (`bigram_pmi_collocations`) over-rewards
    rare pairs: G² = 2·Σ k·ln(k·N/(row·col)) over the 2×2 contingency of
    (first word = w1) × (second word = w2) across all adjacent-token
    positions. One bigram aggregate + two marginal aggregates, joined on
    the aggregated relations; the 4-term G² is a single pinned
    expression per bigram; deterministic top-k (G² desc, bigram asc)."""
    ensure_views(spark, sf_dir)
    toks = spark.table("documents").select(
        "doc_id", text.word_tokens("text").alias("_w")
    )
    n1 = F.greatest(F.size("_w") - 1, F.lit(0))
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice("_w", 1, n1),
                    F.slice("_w", 2, n1),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("_b")
        )
        .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("k11"))
    first = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("r1"))
    second = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("c1"))
    n = bi.agg(F.count(F.lit(1)).alias("nn"))
    g = (
        pair.filter(F.col("k11") >= _LLR_MIN)
        .join(first, "w1")
        .join(second, "w2")
        .crossJoin(F.broadcast(n))
    )
    k11 = F.col("k11").cast("double")
    k12 = (F.col("r1") - F.col("k11")).cast("double")
    k21 = (F.col("c1") - F.col("k11")).cast("double")
    k22 = (F.col("nn") - F.col("r1") - F.col("c1") + F.col("k11")).cast("double")
    nn = F.col("nn").cast("double")
    r1, r2 = F.col("r1").cast("double"), nn - F.col("r1").cast("double")
    c1, c2 = F.col("c1").cast("double"), nn - F.col("c1").cast("double")

    def term(k, row, col):
        return F.when(k > 0, k * F.log(k * nn / (row * col))).otherwise(F.lit(0.0))

    g2 = 2.0 * (
        term(k11, r1, c1) + term(k12, r1, c2) + term(k21, r2, c1) + term(k22, r2, c2)
    )
    return (
        g.select(
            "w1",
            "w2",
            F.col("k11").alias("n_pair"),
            F.round(g2, 6).alias("llr"),
        )
        .orderBy(F.col("llr").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(_LLR_TOP)
    )


LLR_SQL = rf"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
), bi AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
  FROM t WHERE len(w) >= 2
), pair AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11 FROM bi GROUP BY 1, 2
), fst AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS r1 FROM bi GROUP BY w1),
snd AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c1 FROM bi GROUP BY w2),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM bi),
g AS (
  SELECT pair.w1, pair.w2, k11, r1, c1, nn,
         CAST(k11 AS DOUBLE) AS a,
         CAST(r1 - k11 AS DOUBLE) AS b,
         CAST(c1 - k11 AS DOUBLE) AS c,
         CAST(nn - r1 - c1 + k11 AS DOUBLE) AS d
  FROM pair JOIN fst USING (w1) JOIN snd USING (w2) CROSS JOIN nt
  WHERE k11 >= {_LLR_MIN}
)
SELECT w1, w2, k11 AS n_pair,
       round(2.0 * (
         (CASE WHEN a > 0 THEN a * ln(a * nn / (CAST(r1 AS DOUBLE) * c1)) ELSE 0.0 END)
         + (CASE WHEN b > 0 THEN b * ln(b * nn / (CAST(r1 AS DOUBLE) * (nn - c1))) ELSE 0.0 END)
         + (CASE WHEN c > 0 THEN c * ln(c * nn / ((nn - CAST(r1 AS DOUBLE)) * c1)) ELSE 0.0 END)
         + (CASE WHEN d > 0 THEN d * ln(d * nn / ((nn - CAST(r1 AS DOUBLE)) * (nn - c1))) ELSE 0.0 END)
       ), 6) AS llr
FROM g
ORDER BY llr DESC, w1 ASC, w2 ASC
LIMIT {_LLR_TOP}
"""

SPARK_QUERIES["bigram_llr_collocations"] = bigram_llr_collocations
ORACLE_SQL["bigram_llr_collocations"] = LLR_SQL


_NOV_K, _NOV_BUCKETS = 8, 10


def corpus_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty decay across corpus growth: for each doc_id decile, the
    average fraction of a document's character {_NOV_K}-gram hashes
    already introduced by EARLIER documents — the curve that tells a
    crawl pipeline when additional ingestion stops contributing new
    content (it climbs toward 1 as the corpus saturates), and the
    document-order view of what `duplicate_ngram_coverage` measures
    corpus-wide.

    Scale shape: gram hashing rides the lambda-bound array expressions
    (one normalization per doc); each gram's FIRST document is one
    term-keyed aggregate; per-doc repeated/total counts are exact
    integers; deciles come from fixed doc_id-range thresholds (no
    global rank)."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.text import winnow_fingerprints  # noqa: F401  (shared md5 path)

    docs = spark.table("documents")
    norm = text.normalize_text("text")
    grams = F.get(
        F.transform(
            F.array(norm),
            lambda t: F.when(
                F.length(t) >= _NOV_K,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - F.lit(_NOV_K - 1)),
                    lambda i: text.md5_long(F.substr(t, i, F.lit(_NOV_K))),
                ),
            ).otherwise(F.array().cast("array<long>")),
        ),
        F.lit(0),
    )
    # the gram relation feeds BOTH the first-doc aggregate and the
    # per-doc join — checkpoint it so the md5 gram pass runs once; widen
    # the scan first (one small parquet file locally = one core
    # otherwise; no-op at production partition counts)
    from onetl_spark.spark_utils import widen_small_scan

    dg = (
        widen_small_scan(docs)
        .select("doc_id", F.explode(grams).alias("_g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    first = dg.groupBy("_g").agg(F.min("doc_id").alias("_fd"))
    per_doc = (
        dg.join(first, "_g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_total"),
            F.sum((F.col("_fd") < F.col("doc_id")).cast("long")).alias("_rep"),
        )
    )
    bounds = docs.agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
    bucketed = per_doc.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(_NOV_BUCKETS - 1),
            (
                (F.col("doc_id") - F.col("_lo")) * _NOV_BUCKETS
                / (F.col("_hi") - F.col("_lo") + 1)
            ).cast("int"),
        ).alias("decile"),
        "_total",
        "_rep",
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_total").alias("n_grams"),
            F.round(
                F.sum("_rep").cast("double") / F.sum("_total"), 9
            ).alias("repeated_frac"),
        )
        .orderBy("decile")
    )


NOVELTY_SQL = rf"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS t
  FROM documents
), dg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(length(t) - {_NOV_K - 2}, 1)),
                i -> ('0x' || substr(md5(substr(t, i, {_NOV_K})), 1, 15))::BIGINT)) AS g
  FROM n WHERE length(t) >= {_NOV_K}
), fst AS (
  SELECT g, MIN(doc_id) AS fd FROM dg GROUP BY g
), per_doc AS (
  SELECT dg.doc_id, CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN fst.fd < dg.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS rep
  FROM dg JOIN fst USING (g) GROUP BY dg.doc_id
), bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents)
SELECT CAST(LEAST({_NOV_BUCKETS - 1},
            CAST(floor((per_doc.doc_id - lo) * {_NOV_BUCKETS} / (hi - lo + 1)) AS INTEGER))
            AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(total) AS BIGINT) AS n_grams,
       round(CAST(SUM(rep) AS DOUBLE) / SUM(total), 9) AS repeated_frac
FROM per_doc CROSS JOIN bounds
GROUP BY 1 ORDER BY decile
"""

SPARK_QUERIES["corpus_novelty_decay"] = corpus_novelty_decay
ORACLE_SQL["corpus_novelty_decay"] = NOVELTY_SQL


def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the heuristic language identifier against the
    labeled lang column (`operators/stats.py cohens_kappa`):
    chance-corrected agreement — the one-scalar summary of
    lang_id_confusion that raw accuracy flatters on skewed corpora."""
    from onetl_spark.operators.stats import cohens_kappa

    ensure_views(spark, sf_dir)
    pred = spark.table("documents").select(
        F.coalesce(F.col("lang"), F.lit("<null>")).alias("labeled"),
        text.lang_id(F.col("text")).alias("predicted"),
    )
    return cohens_kappa(pred, "labeled", "predicted")


def _lang_kappa_sql() -> str:
    return rf"""
WITH {_lang_pred_cte()}, cells AS (
  SELECT labeled, predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells),
diag AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_agree
  FROM cells WHERE labeled = predicted
), ra AS (SELECT labeled AS c, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY 1),
cb AS (SELECT predicted AS c, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY 1),
x AS (
  SELECT CAST(COALESCE(SUM(ra.t * cb.t), 0) AS BIGINT) AS x
  FROM ra JOIN cb USING (c)
), m AS (
  SELECT tot.n, diag.n_agree,
         round(CAST(diag.n_agree AS DOUBLE) / tot.n, 9) AS po,
         round(CAST(x.x AS DOUBLE)
               / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)), 9) AS pe
  FROM tot CROSS JOIN diag CROSS JOIN x
)
SELECT n, n_agree, po, pe,
       CASE WHEN 1.0 - pe <> 0 THEN round((po - pe) / (1.0 - pe), 9) END AS kappa
FROM m
"""


SPARK_QUERIES["lang_id_kappa"] = lang_id_kappa
ORACLE_SQL["lang_id_kappa"] = _lang_kappa_sql()


def source_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity panel: type-token ratio, hapax share
    (vocabulary occurring once), and Simpson repeat probability
    ``Σc(c−1)/(N(N−1))`` — the corpus-health trio that separates
    template-generated sources (low TTR, high Simpson) from organic
    text, complementing source_distinct_ngrams' bigram view. One
    term-count shuffle keyed by (source, token); ratios from exact
    integer counts."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = docs.select(
        "source", F.explode(text.word_tokens("text")).alias("_w")
    )
    tc = toks.groupBy("source", "_w").agg(F.count(F.lit(1)).alias("_c"))
    g = tc.groupBy("source").agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_v"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("_h"),
        F.sum(
            F.col("_c").cast("decimal(19,0)")
            * (F.col("_c") - 1).cast("decimal(19,0)")
        )
        .cast("double")
        .alias("_s2"),
    )
    n = F.col("_n").cast("double")
    return g.select(
        "source",
        F.col("_n").cast("long").alias("n_tokens"),
        F.col("_v").cast("long").alias("vocab"),
        F.col("_h").cast("long").alias("hapax"),
        F.round(F.col("_v").cast("double") / n, 9).alias("ttr"),
        F.when(
            F.col("_v") > 0,
            F.round(F.col("_h").cast("double") / F.col("_v").cast("double"), 9),
        ).alias("hapax_share"),
        F.when(
            F.col("_n") > 1, F.round(F.col("_s2") / (n * (n - F.lit(1.0))), 9)
        ).alias("simpson"),
    ).orderBy("source")


TOKEN_DIVERSITY_SQL = f"""
WITH toks AS (
  SELECT source, unnest({SQL_TOKENS}) AS w FROM documents
), tc AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY source, w
), g AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h,
         CAST(SUM(c * (c - 1)) AS DOUBLE) AS s2
  FROM tc GROUP BY source
)
SELECT source, n AS n_tokens, v AS vocab, h AS hapax,
       round(CAST(v AS DOUBLE) / CAST(n AS DOUBLE), 9) AS ttr,
       CASE WHEN v > 0 THEN round(CAST(h AS DOUBLE) / CAST(v AS DOUBLE), 9) END
         AS hapax_share,
       CASE WHEN n > 1 THEN
         round(s2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9) END
         AS simpson
FROM g ORDER BY source
"""

SPARK_QUERIES["source_token_diversity"] = source_token_diversity
ORACLE_SQL["source_token_diversity"] = TOKEN_DIVERSITY_SQL


def embedding_centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per embedding label (`llm/similarity.py
    centroid_silhouette`): the O(n·k) label-quality score — own-centroid
    vs nearest-other-centroid Euclidean distances — that grades the
    weak labels before knn_label_vote trusts them."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm import similarity

    return similarity.centroid_silhouette(spark.table("embeddings"))


SILHOUETTE_SQL = """
WITH dims AS (
  SELECT label AS lbl, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) r(i)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), cent AS (
  SELECT lbl, i,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM dims GROUP BY lbl, i
), vecs AS (
  SELECT lbl, list(mu ORDER BY i) AS cv FROM cent GROUP BY lbl
), pts AS (
  SELECT vec_id, label AS lbl,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL
), pairs AS (
  SELECT p.vec_id, p.lbl, c.lbl AS cl,
         sqrt(list_sum(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])))) AS d
  FROM pts p CROSS JOIN vecs c
), per_pt AS (
  SELECT vec_id, lbl,
         MAX(CASE WHEN cl = lbl THEN d END) AS a,
         MIN(CASE WHEN cl <> lbl THEN d END) AS b
  FROM pairs GROUP BY vec_id, lbl
)
SELECT lbl AS label, CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(round(CASE WHEN greatest(a, b) > 0
                                      THEN (b - a) / greatest(a, b) END, 9)
                           AS DECIMAL(38,9))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS mean_silhouette,
       round(CAST(SUM(CAST(round(a, 9) AS DECIMAL(38,9))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS mean_a,
       round(CAST(SUM(CAST(round(b, 9) AS DECIMAL(38,9))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS mean_b
FROM per_pt GROUP BY lbl ORDER BY lbl
"""

SPARK_QUERIES["embedding_centroid_silhouette"] = embedding_centroid_silhouette
ORACLE_SQL["embedding_centroid_silhouette"] = SILHOUETTE_SQL


_QQ_SRC_A, _QQ_SRC_B = "src0", "src1"


def doc_length_qq_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile quantile-quantile comparison of document length (n_chars)
    between two sources: exact type-1 empirical deciles per side
    (smallest value whose cumulative count reaches ceil(p·n) — integer
    rank formula over the bounded distinct-length relation) and their
    INTEGER gaps — the length-distribution mismatch diagnostic behind a
    source-mix decision, fully exact end to end."""
    ensure_views(spark, sf_dir)
    from pyspark.sql.window import Window as W

    docs = spark.table("documents").filter(F.col("n_chars").isNotNull())

    def side(src: str, e_alias: str):
        c = (
            docs.filter(F.col("source") == src)
            .groupBy(F.col("n_chars").alias("_v"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
        cum = c.withColumn("_cum", F.sum("_c").over(w))
        n_row = c.agg(F.sum("_c").alias("_n"))
        g = cum.crossJoin(F.broadcast(n_row))
        aggs = []
        for p10 in range(1, 10):
            # K = ceil(p*n) via exact integer arithmetic: (n*p10 + 9) div 10
            k = F.expr(f"(_n * {p10} + 9) div 10")
            aggs.append(
                F.min(F.when(F.col("_cum") >= k, F.col("_v"))).alias(
                    f"{e_alias}{p10}"
                )
            )
        return g.agg(*aggs)

    a = side(_QQ_SRC_A, "_a")
    b = side(_QQ_SRC_B, "_b")
    # 1-row join of the two decile aggregates, referenced by all 9 output
    # branches below — materialize once so each branch does not replay
    # both sides' cumulative-sum windows (same fix as events_value_qq_normal)
    both = a.crossJoin(b).localCheckpoint(eager=False)
    rows = None
    for p10 in range(1, 10):
        r = both.select(
            F.lit(p10 * 10).alias("pct"),
            F.col(f"_a{p10}").cast("long").alias("q_src_a"),
            F.col(f"_b{p10}").cast("long").alias("q_src_b"),
            (F.col(f"_a{p10}") - F.col(f"_b{p10}")).cast("long").alias("gap"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("pct")


def _qq_sources_sql() -> str:
    def side_cte(src: str, tag: str) -> str:
        return f"""c{tag} AS (
  SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c FROM documents
  WHERE n_chars IS NOT NULL AND source = '{src}' GROUP BY n_chars
), e{tag} AS (
  SELECT p.p10,
         MIN(CASE WHEN q.cum >= (q.n * p.p10 + 9) // 10 THEN q.v END) AS e
  FROM (
    SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS n
    FROM c{tag}
  ) q CROSS JOIN (SELECT unnest(range(1, 10)) AS p10) p
  GROUP BY p.p10
)"""

    return f"""
WITH {side_cte(_QQ_SRC_A, 'a')}, {side_cte(_QQ_SRC_B, 'b')}
SELECT CAST(ea.p10 * 10 AS INTEGER) AS pct,
       CAST(ea.e AS BIGINT) AS q_src_a,
       CAST(eb.e AS BIGINT) AS q_src_b,
       CAST(ea.e - eb.e AS BIGINT) AS gap
FROM ea JOIN eb USING (p10)
ORDER BY pct
"""


SPARK_QUERIES["doc_length_qq_sources"] = doc_length_qq_sources
ORACLE_SQL["doc_length_qq_sources"] = _qq_sources_sql()


_KM_K, _KM_ITERS = 4, 3


def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means (k={_KM_K}, {_KM_ITERS} rounds, seeds
    = the {_KM_K} smallest vec_ids) over the embedding corpus —
    `llm/similarity.py kmeans_lloyd`. Per-cluster size and round-9
    inertia; the oracle unrolls the identical rounds as CTEs."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.similarity import kmeans_lloyd

    return kmeans_lloyd(
        spark.table("embeddings"), k=_KM_K, iters=_KM_ITERS
    )


def _kmeans_cte_prefix(k: int, iters: int) -> str:
    d2 = (
        "list_sum(list_transform(range(1, 65), "
        "i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])))"
    )
    parts = [
        """pts AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
)""",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS j, v AS cv
  FROM (SELECT id, v FROM pts ORDER BY id LIMIT {k})
)""",
    ]
    prev = "c0"
    for r in range(1, iters + 1):
        parts.append(f"""a{r} AS (
  SELECT p.id, p.v,
         MIN(struct_pack(d := {d2}, j := c.j))['j'] AS j
  FROM pts p CROSS JOIN {prev} c GROUP BY p.id, p.v
)""")
        parts.append(f"""m{r} AS (
  SELECT a.j, r.i,
         CAST(SUM(CAST(a.v[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
  FROM a{r} a CROSS JOIN range(1, 65) r(i) GROUP BY a.j, r.i
)""")
        parts.append(
            f"c{r} AS (SELECT j, list(mu ORDER BY i) AS cv FROM m{r} GROUP BY j)"
        )
        prev = f"c{r}"
    parts.append(f"""fin AS (
  SELECT p.id, MIN(struct_pack(d := {d2}, j := c.j)) AS m
  FROM pts p CROSS JOIN {prev} c GROUP BY p.id
)""")
    return "WITH " + ",\n".join(parts)


def _kmeans_sql(k: int, iters: int) -> str:
    return (
        _kmeans_cte_prefix(k, iters)
        + """
SELECT m['j'] AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
       round(CAST(SUM(CAST(round(m['d'], 9) AS DECIMAL(38,9))) AS DOUBLE), 9)
         AS inertia
FROM fin GROUP BY 1 ORDER BY cluster
"""
    )


SPARK_QUERIES["embedding_kmeans_clusters"] = embedding_kmeans_clusters
ORACLE_SQL["embedding_kmeans_clusters"] = _kmeans_sql(_KM_K, _KM_ITERS)


def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation handoff of the deterministic k-means: per (cluster,
    lang) composition of the clustered corpus — assignments from
    `kmeans_assign` broadcast-joined to the documents table on
    vec_id = doc_id, with exact integer length totals. The step that
    turns geometric clusters into actionable data-mix facts (which
    languages concentrate where, what to up/down-sample)."""
    ensure_views(spark, sf_dir)
    from onetl_spark.llm.similarity import kmeans_assign

    a = kmeans_assign(
        spark.table("embeddings"), k=_KM_K, iters=_KM_ITERS
    ).select("vec_id", "cluster")
    d = spark.table("documents").select(
        F.col("doc_id").alias("vec_id"), "lang", "n_chars"
    )
    return (
        a.join(d, "vec_id")
        .groupBy("cluster", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("cluster", "lang")
    )


KMEANS_PROFILE_SQL = (
    _kmeans_cte_prefix(_KM_K, _KM_ITERS)
    + """
SELECT fin.m['j'] AS cluster, d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM fin JOIN documents d ON fin.id = d.doc_id
GROUP BY 1, 2 ORDER BY cluster, lang
"""
)

SPARK_QUERIES["kmeans_cluster_profile"] = kmeans_cluster_profile
ORACLE_SQL["kmeans_cluster_profile"] = KMEANS_PROFILE_SQL


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — tokens/word and tokens/char
    under the SAME trained-on-a-third BPE vocabulary as
    `bpe_token_encode`: the metric that tells a multilingual-corpus
    owner which languages the tokenizer punishes (high fertility =
    more compute per character). Per-doc counts ride the existing
    encode path, then one lang-keyed aggregate with exact integer
    numerators. Fertility is a first-order LLM data-mix cost input."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    train = docs.filter(F.col("doc_id") % 3 == 0)
    _merges, vocab = text.bpe_train_merges(train, num_merges=1)
    per_doc = text.bpe_token_counts(docs, vocab)
    meta = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(text.word_tokens("text")).alias("_n_words"),
    )
    j = per_doc.join(meta, "doc_id")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("long").alias("n_tokens"),
            F.sum("_n_words").cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("n_words").cast("double"),
                9,
            ).alias("tokens_per_word"),
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("total_chars").cast("double"),
                9,
            ).alias("tokens_per_char"),
        )
        .orderBy("lang")
    )


def _bpe_fertility_sql() -> str:
    # reuse the per-doc encode CTE chain, regrouped by language
    body = BPE_ENCODE_SQL.strip().rstrip()
    head, _, _tail = body.rpartition("SELECT d.doc_id")
    return (
        head
        + f""", per_doc AS (
  SELECT d.doc_id, CAST(COALESCE(SUM(cost.c), 0) AS BIGINT) AS n_bpe_tokens
  FROM documents d LEFT JOIN cost ON cost.doc_id = d.doc_id
  GROUP BY d.doc_id
), meta AS (
  SELECT doc_id, lang, n_chars, len({SQL_TOKENS}) AS n_words
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS n_tokens,
       round(CAST(SUM(n_bpe_tokens) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE), 9)
         AS tokens_per_word,
       round(CAST(SUM(n_bpe_tokens) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE), 9)
         AS tokens_per_char
FROM per_doc JOIN meta USING (doc_id)
GROUP BY lang ORDER BY lang
"""
    )


SPARK_QUERIES["bpe_fertility_by_lang"] = bpe_fertility_by_lang
ORACLE_SQL["bpe_fertility_by_lang"] = _bpe_fertility_sql()


def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage/compute savings ledger of the NEAR-duplicate dedup stage —
    the readout that justifies it to a capacity planner: per duplicate-
    cluster size, how many clusters, how many redundant documents a
    survivorship pass drops, and how many characters (∝ bytes ∝
    training tokens) that saves. Clusters are the same MinHash-LSH
    transitive components as `dedup_survivors` (rep = min doc_id); the
    survivor keeps its own chars, everything else in the cluster is
    savings. One join of the rep assignment to the char column + two
    grouped aggregates; the report relation is bounded by the largest
    cluster size."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    surv = dedup.dedup_survivors(docs, pairs, collect_threshold=0)
    j = surv.join(docs.select("doc_id", "n_chars"), "doc_id")
    clusters = j.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("_size"),
        F.sum("n_chars").alias("_chars"),
        F.min_by("n_chars", "doc_id").alias("_surv_chars"),
    )
    return (
        clusters.groupBy(F.col("_size").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.col("_size") - 1).cast("long").alias("n_redundant_docs"),
            F.sum(F.col("_chars") - F.col("_surv_chars"))
            .cast("long")
            .alias("chars_saved"),
        )
        .orderBy("cluster_size")
    )


def _dedup_savings_sql() -> str:
    surv = _survivors_sql().strip()
    # turn the survivors query into a CTE: it already starts WITH RECURSIVE
    head, _, final = surv.rpartition("SELECT d.doc_id")
    return (
        head
        + """, surv AS (
  SELECT d.doc_id, coalesce(MIN(reach.r), d.doc_id) AS rep_id, MIN(d.n_chars) AS n_chars
  FROM documents d LEFT JOIN reach ON reach.node = d.doc_id
  GROUP BY d.doc_id
), clusters AS (
  SELECT rep_id, COUNT(*) AS size, SUM(n_chars) AS chars,
         arg_min(n_chars, doc_id) AS surv_chars
  FROM surv GROUP BY rep_id
)
SELECT size AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(size - 1) AS BIGINT) AS n_redundant_docs,
       CAST(SUM(chars - surv_chars) AS BIGINT) AS chars_saved
FROM clusters GROUP BY size ORDER BY cluster_size
"""
    )


SPARK_QUERIES["dedup_savings_report"] = dedup_savings_report
ORACLE_SQL["dedup_savings_report"] = _dedup_savings_sql()


def source_loo_lm_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation — which sources actually
    improve a language model? For every source s, score a held-out
    split (md5(doc_id) % 5 == 4 — hash split; a modulo split is
    CONFOUNDED with the synthetic source = doc_id %% 20 assignment) under the add-one unigram LM trained on
    ALL-minus-s, and report the per-token log-likelihood delta vs the
    full model (positive value ⇒ removing s hurts ⇒ s is worth its
    tokens). The trick that makes full LOO affordable at corpus scale:
    unigram counts are SUBTRACTABLE aggregates, so one global count
    table and one (source, word) table yield every leave-one-out model
    by arithmetic — |sources| models for the cost of two grouped
    aggregates, never |sources| training passes. Log terms follow the
    repo's round-9-then-decimal convention; smoothing uses the pinned
    full-train vocabulary V for every model."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    split = text.md5_long(F.col("doc_id").cast("string")) % 5
    tr = docs.filter(split != 4)
    ho = docs.filter(split == 4)
    tr_tok = tr.select(
        "source", F.explode(text.word_tokens("text")).alias("w")
    )
    g = tr_tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    sc = tr_tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cs"))
    tot = g.agg(
        F.sum("c").cast("double").alias("bign"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ns = tr_tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("ns")
    )
    hoc = (
        ho.select(F.explode(text.word_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cho"))
    )
    base = hoc.join(g, "w", "left").select(
        "w", "cho", F.coalesce("c", F.lit(0)).alias("c")
    ).localCheckpoint(eager=False)
    full = base.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                F.col("cho")
                * F.round(
                    F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("bign") + F.col("v"))
                    ),
                    9,
                ),
                9,
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("ll_full"),
        F.sum("cho").cast("double").alias("n_ho"),
    )
    expanded = (
        base.crossJoin(F.broadcast(ns))
        .join(sc, ["source", "w"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "ns",
            F.round(
                F.col("cho")
                * F.round(
                    F.log(
                        (F.col("c") - F.coalesce("cs", F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("bign") - F.col("ns") + F.col("v"))
                    ),
                    9,
                ),
                9,
            )
            .cast("decimal(38,9)")
            .alias("_t"),
        )
    )
    loo = expanded.groupBy("source").agg(
        F.max("ns").alias("ns"),
        F.sum("_t").cast("double").alias("ll_loo"),
    )
    return (
        loo.crossJoin(F.broadcast(full))
        .select(
            "source",
            F.col("ns").cast("long").alias("n_tokens_removed"),
            F.round(F.col("ll_full") / F.col("n_ho"), 6).alias(
                "ll_full_per_token"
            ),
            F.round(F.col("ll_loo") / F.col("n_ho"), 6).alias(
                "ll_loo_per_token"
            ),
            (
                F.round(
                    (F.col("ll_full") - F.col("ll_loo")) / F.col("n_ho"), 6
                )
                # -0.0 + 0.0 == +0.0: the delta rounds to zero once the
                # corpus is large enough (first seen at sf1), and the two
                # engines disagree on the zero's sign
                + F.lit(0.0)
            ).alias("value_per_token"),
        )
        .orderBy("source")
    )


LOO_LM_SQL = rf"""
WITH tr AS (
  SELECT source, unnest({SQL_TOKENS}) AS w FROM documents
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 <> 4
), ho AS (
  SELECT unnest({SQL_TOKENS}) AS w FROM documents
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 = 4
), g AS (SELECT w, COUNT(*) AS c FROM tr GROUP BY w),
sc AS (SELECT source, w, COUNT(*) AS cs FROM tr GROUP BY source, w),
tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS bign, CAST(COUNT(*) AS DOUBLE) AS v FROM g
), ns AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS ns FROM tr GROUP BY source
), hoc AS (SELECT w, COUNT(*) AS cho FROM ho GROUP BY w),
base AS (
  SELECT hoc.w, hoc.cho, COALESCE(g.c, 0) AS c
  FROM hoc LEFT JOIN g ON g.w = hoc.w
), fullm AS (
  SELECT CAST(SUM(CAST(round(cho * round(ln(CAST(c + 1 AS DOUBLE)
                                            / (tot.bign + tot.v)), 9), 9)
                       AS DECIMAL(38,9))) AS DOUBLE) AS ll_full,
         CAST(SUM(cho) AS DOUBLE) AS n_ho
  FROM base CROSS JOIN tot
), expanded AS (
  SELECT ns.source, ns.ns,
         CAST(round(base.cho * round(ln(CAST(base.c - COALESCE(sc.cs, 0) + 1
                                             AS DOUBLE)
                                        / (tot.bign - ns.ns + tot.v)), 9), 9)
              AS DECIMAL(38,9)) AS t
  FROM base CROSS JOIN ns
  LEFT JOIN sc ON sc.source = ns.source AND sc.w = base.w
  CROSS JOIN tot
), loo AS (
  SELECT source, MAX(ns) AS ns, CAST(SUM(t) AS DOUBLE) AS ll_loo
  FROM expanded GROUP BY source
)
SELECT source, CAST(ns AS BIGINT) AS n_tokens_removed,
       round(fullm.ll_full / fullm.n_ho, 6) AS ll_full_per_token,
       round(loo.ll_loo / fullm.n_ho, 6) AS ll_loo_per_token,
       round((fullm.ll_full - loo.ll_loo) / fullm.n_ho, 6) + 0.0 AS value_per_token
FROM loo CROSS JOIN fullm ORDER BY source
"""

SPARK_QUERIES["source_loo_lm_value"] = source_loo_lm_value
ORACLE_SQL["source_loo_lm_value"] = LOO_LM_SQL


_FW_SRC_A, _FW_SRC_B = "src0", "src1"
_FW_ALPHA = 0.01


def source_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fightin' Words (Monroe-Colaresi-Quinn 2008): which words
    distinguish source {_FW_SRC_A} from {_FW_SRC_B}? Log-odds-ratio with
    an informative Dirichlet prior (α = {_FW_ALPHA} per word, the
    pooled-corpus smoothing that kills the rare-word noise raw
    log-odds and TF-IDF both suffer) and variance-stabilized z-scores
    ``δ/√(1/(y_a+α) + 1/(y_b+α))``. Pure count arithmetic — two grouped
    aggregates over the two sources' tokens, ln terms round-9 pinned —
    then the top-8 words per side by |z|. The vocabulary relation is
    corpus-vocabulary-sized, never row-sized."""
    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    tok = docs.filter(
        F.col("source").isin(_FW_SRC_A, _FW_SRC_B)
    ).select(
        "source", F.explode(text.word_tokens("text")).alias("w")
    )
    counts = tok.groupBy("w").agg(
        F.sum(F.when(F.col("source") == _FW_SRC_A, 1).otherwise(0)).alias("ya"),
        F.sum(F.when(F.col("source") == _FW_SRC_B, 1).otherwise(0)).alias("yb"),
    )
    tot = counts.agg(
        F.sum("ya").cast("double").alias("na"),
        F.sum("yb").cast("double").alias("nb"),
        (F.count(F.lit(1)).cast("double") * F.lit(_FW_ALPHA)).alias("a0"),
    )
    a = F.lit(_FW_ALPHA)
    j = counts.crossJoin(F.broadcast(tot))
    delta = F.round(
        F.log(
            (F.col("ya") + a)
            / (F.col("na") + F.col("a0") - F.col("ya") - a)
        ),
        9,
    ) - F.round(
        F.log(
            (F.col("yb") + a)
            / (F.col("nb") + F.col("a0") - F.col("yb") - a)
        ),
        9,
    )
    var = 1.0 / (F.col("ya") + a) + 1.0 / (F.col("yb") + a)
    z = F.round(delta / F.sqrt(var), 9)
    scored = j.select(
        "w",
        F.col("ya").cast("long").alias("n_src_a"),
        F.col("yb").cast("long").alias("n_src_b"),
        z.alias("zscore"),
    )
    top_a = scored.orderBy(F.col("zscore").desc(), F.col("w").asc()).limit(8)
    top_b = scored.orderBy(F.col("zscore").asc(), F.col("w").asc()).limit(8)
    return top_a.unionByName(top_b).orderBy(
        F.col("zscore").desc(), F.col("w").asc()
    )


FIGHTIN_WORDS_SQL = rf"""
WITH tok AS (
  SELECT source, unnest({SQL_TOKENS}) AS w FROM documents
  WHERE source IN ('{_FW_SRC_A}', '{_FW_SRC_B}')
), counts AS (
  SELECT w,
         SUM(CASE WHEN source = '{_FW_SRC_A}' THEN 1 ELSE 0 END) AS ya,
         SUM(CASE WHEN source = '{_FW_SRC_B}' THEN 1 ELSE 0 END) AS yb
  FROM tok GROUP BY w
), tot AS (
  SELECT CAST(SUM(ya) AS DOUBLE) AS na, CAST(SUM(yb) AS DOUBLE) AS nb,
         CAST(COUNT(*) AS DOUBLE) * {_FW_ALPHA!r} AS a0
  FROM counts
), scored AS (
  SELECT w, CAST(ya AS BIGINT) AS n_src_a, CAST(yb AS BIGINT) AS n_src_b,
         round((round(ln((ya + {_FW_ALPHA!r})
                         / (na + a0 - ya - {_FW_ALPHA!r})), 9)
                - round(ln((yb + {_FW_ALPHA!r})
                           / (nb + a0 - yb - {_FW_ALPHA!r})), 9))
               / sqrt(1.0 / (ya + {_FW_ALPHA!r})
                      + 1.0 / (yb + {_FW_ALPHA!r})), 9) AS zscore
  FROM counts CROSS JOIN tot
), ta AS (SELECT * FROM scored ORDER BY zscore DESC, w ASC LIMIT 8),
tb AS (SELECT * FROM scored ORDER BY zscore ASC, w ASC LIMIT 8)
SELECT * FROM (SELECT * FROM ta UNION ALL SELECT * FROM tb)
ORDER BY zscore DESC, w ASC
"""

SPARK_QUERIES["source_fightin_words"] = source_fightin_words
ORACLE_SQL["source_fightin_words"] = FIGHTIN_WORDS_SQL
