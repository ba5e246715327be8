"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (JVM-side,
whole-stage-codegen friendly) — no Python UDFs, so they run at full speed
over 100 TB of documents. Each has an exact DuckDB-SQL equivalent used by
the showcase oracles.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# small per-language stopword lists for the n-gram/stopword-overlap heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "it", "you", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "es": ("el", "la", "los", "y", "es", "no", "que", "un", "por", "con"),
    "fr": ("le", "la", "les", "et", "est", "je", "ne", "pas", "vous", "un"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}
# deterministic priority order for arg-max ties
LANG_PRIORITY = ("en", "de", "es", "fr", "zh")


def word_tokens(col: Column | str) -> Column:
    """Lower-cased whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(word_tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token counting with a BPE-ish regex: word pieces + punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio style quality signals."""
    c = F.col(col) if isinstance(col, str) else col
    tokens = word_tokens(c)
    n_tokens = F.size(tokens)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(tokens), en_stop))
    mean_word_len = F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 9),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 9),
        "stopword_hits": n_stop.cast("long"),
        "mean_word_len": F.round(mean_word_len, 9),
    }


def quality_score(col: Column | str) -> Column:
    """Composite 0..1-ish quality score (weights are heuristic but fixed)."""
    f = quality_features(col)
    length_score = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * length_score
        + 0.3 * f["alpha_ratio"]
        + 0.2 * F.least(f["stopword_hits"] / F.lit(5.0), F.lit(1.0))
        + 0.1 * (1 - F.least(f["punct_ratio"] * 5, F.lit(1.0))),
        9,
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-overlap counts (distinct token hits)."""
    tokens = F.array_distinct(word_tokens(col))
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.array_intersect(tokens, arr))
    return out


def lang_id(col: Column | str) -> Column:
    """Arg-max language by stopword overlap; ties resolved by the fixed
    LANG_PRIORITY order; zero overlap everywhere → 'und' (undetermined)."""
    scores = lang_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_PRIORITY])
    result = F.lit("und")
    # build reversed CASE chain so earlier-priority languages win ties
    for lang in reversed(LANG_PRIORITY):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, strip non-alnum (keeping
    unicode letters), collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}\s]", "")
    collapsed = F.regexp_replace(cleaned, r"\s+", " ")
    return F.trim(collapsed)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col).cast("binary"))


def md5_long(col: Column) -> Column:
    """64-bit-ish hash from md5 (first 15 hex chars → bigint): identical in
    DuckDB as ``('0x' || substr(md5(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tfidf_top_terms(df, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """Top-k TF-IDF terms per document.

    Shuffle structure: explode → (doc, term) count agg → term doc-freq agg
    (map-side combined) → shuffle join of tf with (term, df) on the term
    key — no driver collect, no cross join on data. docfreq is NOT
    broadcast: the distinct vocabulary of a web-scale corpus is billions
    of terms, and broadcasting it OOMs the driver/executors; both sides
    are already keyed by term post-aggregation, so the sort-merge join is
    the scale-safe plan (only the 1-row n_docs count is broadcast).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    words = df.select(F.col(id_col).alias("_id"), F.explode(word_tokens(text_col)).alias("_w"))
    tf = words.groupBy("_id", "_w").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("_w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(docfreq, "_w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 9))
    )
    w = W.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("_w"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("term"),
            "tf",
            "tfidf",
            F.col("rank").cast("long").alias("rank"),
        )
    )


#: PII patterns kept to syntax BOTH Java regex (Spark) and RE2 (DuckDB)
#: support — no backreferences, no lookaround — so oracle queries can
#: reproduce the redaction verbatim.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace common PII shapes (emails, international-format phone
    numbers, IPv4 addresses) with typed placeholder tokens.

    A pure per-row projection: zero shuffle, pushes through any plan.
    Regex syntax is restricted to the Java∩RE2 subset (see
    ``PII_PATTERNS``) so external engines can replicate the scrub
    bit-for-bit — a requirement when redaction runs in more than one
    system and outputs must reconcile.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


#: Encoding-health patterns, Java∩RE2 subset (character classes with
#: ``\x{...}`` hex escapes — both engines accept them; no lookaround) so
#: DuckDB oracles reproduce every count bit-for-bit.
#: Mojibake: UTF-8 multibyte sequences mis-decoded as Latin-1 surface as
#: 'Ã'/'Â'/'â' followed by a Latin-1-supplement or typographic character
#: (e.g. 'Ã©' for 'é', 'â€™' for a right single quote).
MOJIBAKE_PATTERN = (
    r"[\x{00C2}\x{00C3}\x{00E2}]"
    r"[\x{0080}-\x{00BF}\x{20AC}\x{2018}\x{2019}\x{201C}\x{201D}\x{2013}\x{2014}\x{2122}]"
)
#: C0 controls except tab (09), LF (0A), CR (0D)
CONTROL_PATTERN = r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]"
REPLACEMENT_CHAR = r"\x{FFFD}"


def encoding_quality(col: Column | str) -> dict[str, Column]:
    """Encoding-health signals per document — the standard corpus-cleaning
    pre-filter (bad decodes poison tokenizers and inflate vocab):

    - ``n_replacement``: count of U+FFFD (the scar a failed decode leaves);
    - ``n_control``: C0 control characters other than tab/newline/CR;
    - ``n_mojibake``: UTF-8-read-as-Latin-1 digraphs ('Ã©', 'â€™', …);
    - ``enc_clean``: true iff all three are zero.

    Pure JVM per-row projections (``regexp_count``) — zero shuffle, the
    filter pushes to the scan like any scalar predicate.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_repl = F.regexp_count(c, F.lit(REPLACEMENT_CHAR))
    n_ctrl = F.regexp_count(c, F.lit(CONTROL_PATTERN))
    n_moji = F.regexp_count(c, F.lit(MOJIBAKE_PATTERN))
    return {
        "n_replacement": n_repl.cast("long"),
        "n_control": n_ctrl.cast("long"),
        "n_mojibake": n_moji.cast("long"),
        "enc_clean": (n_repl + n_ctrl + n_moji) == 0,
    }


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition signals per document: token_count,
    distinct-token ratio, top-token fraction, top-bigram fraction.
    Highly repetitive documents (boilerplate, keyword stuffing, broken
    scrapes) score low distinct ratios / high top fractions and get
    culled before training.

    Shape: explode tokens → two (doc, gram) count aggregations → per-doc
    max/sum — every step partial-aggregates map-side and shuffles only on
    (doc, gram) / doc keys. No windows, no collects; a doc's grams never
    need to be co-resident except per aggregation key.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        word_tokens(text_col).alias("_w"),
    )
    words = toks.select("_id", F.explode("_w").alias("_t"))
    unigram = words.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("_n"))
    uni_stats = unigram.groupBy("_id").agg(
        F.sum("_n").alias("token_count"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.max("_n").alias("_top_n"),
    )
    bigrams = toks.select(
        "_id",
        F.explode(
            F.when(F.size("_w") >= 2, F.expr("transform(slice(_w, 1, size(_w)-1), (x, i) -> concat(x, ' ', _w[i+1]))"))
            .otherwise(F.array()),
        ).alias("_b"),
    )
    bigram_counts = bigrams.groupBy("_id", "_b").agg(F.count(F.lit(1)).alias("_n"))
    bi_stats = bigram_counts.groupBy("_id").agg(
        F.sum("_n").alias("_bi_total"),
        F.max("_n").alias("_bi_top"),
    )
    return (
        uni_stats.join(bi_stats, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "token_count",
            F.round(F.col("distinct_tokens") / F.col("token_count"), 9).alias("distinct_ratio"),
            F.round(F.col("_top_n") / F.col("token_count"), 9).alias("top_token_frac"),
            F.round(
                F.coalesce(F.col("_bi_top") / F.col("_bi_total"), F.lit(0.0)), 9,
            ).alias("top_bigram_frac"),
        )
    )


def corpus_stats(
    df,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang",),
):
    """Per-group corpus report: doc counts, token totals, length quantiles.

    The dashboard query a data-mixture owner runs before reweighting. One
    token-count projection (JVM expressions) and one hash-aggregate keyed
    by the group columns; ``percentile`` is Spark's exact linear-
    interpolation aggregate, which map-side combines its buffer, so even
    the quantiles need only the single group-key shuffle.
    """
    toks = token_count(F.col(text_col))
    staged = df.select(*group_cols, toks.alias("_nt"))
    return (
        staged.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            (F.sum("_nt") / F.count(F.lit(1))).alias("avg_tokens"),
            F.round(F.expr("percentile(_nt, 0.5)"), 9).alias("p50_tokens"),
            F.round(F.expr("percentile(_nt, 0.9)"), 9).alias("p90_tokens"),
            F.min("_nt").alias("min_tokens"),
            F.max("_nt").alias("max_tokens"),
        )
    )


def top_terms(df, text_col: str = "text", group_col: str = "lang", k: int = 10):
    """Top-k most frequent terms per group (vocabulary heavy hitters).

    Two-phase: the term-count aggregate map-side combines before its
    shuffle, and Catalyst executes the per-group rank as
    ``WindowGroupLimit`` — a pre-shuffle partial top-k heap — so a group
    with a billion distinct terms never lands on one task as a full sort.
    Ties break lexicographically for determinism.
    """
    from pyspark.sql.window import Window as W

    words = df.select(F.col(group_col), F.explode(word_tokens(F.col(text_col))).alias("term"))
    counts = words.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = W.partitionBy(group_col).orderBy(F.desc("n_occurrences"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "term", "n_occurrences", "rank")
    )


def gopher_rules(
    col: Column | str,
    min_words: int = 20,
    max_words: int = 80,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    max_symbol_ratio: float = 0.1,
) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1.2):
    hard per-document heuristics that cull machine-generated or broken
    text before any model-based filtering.

    - ``r_word_count``: token count within [min_words, max_words];
    - ``r_mean_word_len``: mean word length within bounds (word salad and
      minified blobs fall outside);
    - ``r_alpha_words``: ≥ ratio of words containing a letter (tables of
      numbers / markup fail);
    - ``r_stopwords``: ≥ N distinct function-word hits (real prose has
      them; keyword lists don't);
    - ``r_symbol_ratio``: '#'/'…' symbols per word below a cap (markup,
      truncated scrapes);
    - ``keep``: conjunction of all rules.

    All pure JVM per-row projections in the Java∩RE2 regex subset — zero
    shuffle, the ``keep`` predicate pushes to the scan; at 100 TB this is
    a map-only pass over the corpus.
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = word_tokens(c)
    n_words = F.size(tokens)
    n_nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    mean_len = n_nonspace / F.greatest(n_words, F.lit(1))
    n_alpha_words = F.size(F.filter(tokens, lambda x: x.rlike("[a-z]")))
    alpha_ratio = n_alpha_words / F.greatest(n_words, F.lit(1))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(tokens), en_stop))
    n_symbols = F.regexp_count(c, F.lit(r"[#\x{2026}]"))
    symbol_ratio = n_symbols / F.greatest(n_words, F.lit(1))
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len),
        "r_alpha_words": alpha_ratio >= min_alpha_word_ratio,
        "r_stopwords": stop_hits >= min_stopword_hits,
        "r_symbol_ratio": symbol_ratio < max_symbol_ratio,
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else keep & r
    rules["keep"] = keep
    return rules


def unigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 9,
) -> "DataFrame":
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the cheap proxy for LM-perplexity filtering
    (CCNet-style): documents made of globally-rare tokens score low
    (noise, mangled encodings), documents of only ultra-common tokens
    score high (boilerplate); both tails get culled.

    Shuffle structure mirrors :func:`tfidf_top_terms`: explode → (doc,
    term) tf aggregate → corpus term-frequency aggregate → term-keyed
    sort-merge join (the vocabulary of a web corpus is too big to
    broadcast) → per-doc weighted mean. The 1-row total-token count is
    the only broadcast. log-probs are summed as fixed-scale decimals so
    the mean is order-independent — bit-stable across engines and
    partitionings.
    """
    from pyspark.sql import functions as F

    words = df.select(F.col(id_col).alias("_id"), F.explode(word_tokens(text_col)).alias("_w"))
    tf = words.groupBy("_id", "_w").agg(F.count(F.lit(1)).alias("tf"))
    corpus_freq = tf.groupBy("_w").agg(F.sum("tf").alias("cf"))
    total = corpus_freq.select(F.sum("cf").alias("n_total"))
    scored = (
        tf.join(corpus_freq, "_w")
        .join(F.broadcast(total))
        .select(
            "_id",
            "tf",
            # round BEFORE summing: both engines then add identical decimals
            F.round(F.log(F.col("cf") / F.col("n_total")), scale).alias("_lp"),
        )
    )
    return scored.groupBy("_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.round(
            (
                # bounded precisions: decimal(20,s) × decimal(10,0) fits in
                # 38 digits, so the product keeps scale s exactly — a
                # decimal(38,s) × bigint product would overflow precision
                # and make Spark silently REDUCE the scale
                F.sum(
                    F.col("_lp").cast(f"decimal(20,{scale})")
                    * F.col("tf").cast("decimal(10,0)")
                ).cast("double")
                / F.sum("tf")
            ),
            scale,
        ).alias("mean_logprob"),
    ).select(F.col("_id").alias(id_col), "n_tokens", "mean_logprob")


def lang_mix(col: Column | str) -> dict[str, Column]:
    """Code-switching signal: primary and secondary language by stopword
    overlap, plus the mix ratio ``second/(best+second)`` (0.5 = perfectly
    bilingual, 0 = monolingual). Ties resolve by LANG_PRIORITY and a
    language never equals its own secondary.

    NOTE: as raw column expressions the five tokenize+intersect scores
    are re-expanded inside every CASE branch (higher-order functions sit
    outside codegen subexpression elimination — measured ~15× the cost
    of one scoring pass). Prefer :func:`lang_mix_stats`, which stages the
    scores through a projection so each is computed once.
    """
    scores = lang_scores(col)
    return _lang_mix_from_scores(scores)


def _lang_mix_from_scores(scores: dict[str, Column]) -> dict[str, Column]:
    best = F.greatest(*[scores[lang] for lang in LANG_PRIORITY])
    primary = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        primary = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(primary)
    # per-language score with the primary slot excluded (-1 sinks it)
    excl = {
        lang: F.when(primary == lang, F.lit(-1)).otherwise(scores[lang])
        for lang in LANG_PRIORITY
    }
    second_best = F.greatest(*[excl[lang] for lang in LANG_PRIORITY])
    secondary = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        secondary = F.when(
            (excl[lang] == second_best) & (second_best > 0), F.lit(lang)
        ).otherwise(secondary)
    mix = F.when(
        second_best > 0,
        F.round(second_best / (best + second_best), 9),
    ).otherwise(F.lit(0.0))
    return {
        "primary_lang": primary,
        "secondary_lang": secondary,
        "mix_ratio": mix,
    }


def lang_mix_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document language-mix report as a DataFrame transform: the five
    stopword-overlap scores materialize ONCE in a staged projection and
    the primary/secondary/ratio CASE logic reads the plain integer
    columns — one tokenize+intersect pass per language instead of one per
    CASE branch."""
    scores = lang_scores(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"_s_{lang}") for lang in LANG_PRIORITY],
    )
    mix = _lang_mix_from_scores({lang: F.col(f"_s_{lang}") for lang in LANG_PRIORITY})
    return staged.select(
        id_col,
        mix["primary_lang"].alias("primary_lang"),
        mix["secondary_lang"].alias("secondary_lang"),
        mix["mix_ratio"].alias("mix_ratio"),
    )


def readability(col: Column | str) -> dict[str, Column]:
    """Flesch-reading-ease-style readability signals: word, sentence, and
    syllable counts (syllables approximated as vowel-group runs — the
    standard dictionary-free proxy) plus the composite score
    ``206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)``.
    Used by quality-filtering recipes to drop telegraphic or run-on text
    that length/punctuation ratios alone miss. Pure JVM regexp counting —
    zero shuffle, pushes down next to the scan."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.size(word_tokens(c))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    syllables = F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[aeiouy]+"), 0))
    flesch = F.when(
        words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words / sentences)
            - F.lit(84.6) * (syllables / words),
            9,
        ),
    ).otherwise(F.lit(0.0))
    return {
        "n_words": words.cast("long"),
        "n_sentences": sentences.cast("long"),
        "n_syllables": syllables.cast("long"),
        "flesch": flesch,
    }


def bpe_merge_candidates(df, text_col: str = "text", k: int = 10):
    """The inner step of BPE tokenizer training: the ``k`` most frequent
    adjacent character pairs across all word occurrences (counts weighted
    by occurrence, the statistic each merge round maximizes). Ties break
    lexicographically, so the ranking is engine-portable.

    Scale shape: token explode → character-bigram explode → one count
    shuffle with map-side combine → TakeOrdered top-k. The bigram explode
    is corpus-character-sized — exactly what tokenizer training costs —
    so at 100 TB this runs on the sampled subcorpus tokenizers are
    actually trained on (hash-sample upstream with
    ``sampling.sample_by_hash``).
    """
    words = df.select(F.explode(word_tokens(F.col(text_col))).alias("_w"))
    bigrams = words.select(
        F.explode(
            F.when(
                F.length("_w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("_w") - 1),
                    lambda i: F.col("_w").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ).alias("pair"),
    )
    return (
        bigrams.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def bigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 9,
) -> "DataFrame":
    """Per-document mean interpolated-bigram log-probability under the
    corpus's own counts — the KenLM-style step up from
    :func:`unigram_logprob_scores`: ``p(w2|w1) = 0.7·c(w1 w2)/c(w1) +
    0.3·c(w2)/N``. Documents whose word PAIRS are globally rare (shuffled
    text, keyword stuffing, mangled merges) score low even when every
    individual word is common — exactly the noise class the unigram proxy
    cannot see.

    Bigrams are built JVM-side (``zip_with`` over two array slices — no
    posexplode self-join), then counted like terms. The bigram and
    unigram vocabularies are web-corpus-sized, so both joins stay
    term-keyed sort-merge (never broadcast); the single broadcast is the
    1-row total-token count. Probabilities are evaluated in a fixed
    parenthesization and rounded before the decimal sum, so the mean is
    bit-stable across engines and partitionings (same discipline as the
    unigram scorer).

    Documents with fewer than two tokens have no bigrams and are absent
    from the output (mirror the oracle accordingly).
    """
    from pyspark.sql import functions as F

    a = word_tokens(text_col)
    n1 = F.greatest(F.size(a) - 1, F.lit(0))
    bg_arr = F.zip_with(
        F.slice(a, 1, n1), F.slice(a, 2, n1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    docs = df.select(F.col(id_col).alias("_id"), a.alias("_w"), bg_arr.alias("_bg"))
    tf = (
        docs.select("_id", F.explode("_bg").alias("bg"))
        .groupBy("_id", "bg")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    uni = docs.select(F.explode("_w").alias("u"))
    cf = uni.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
    # vocab-sized aggregate, not a second corpus tokenize+explode
    total = cf.agg(F.sum("c").alias("n_total"))
    c12 = tf.groupBy("bg").agg(F.sum("tf").alias("c12"))
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    scored = (
        tf.join(c12, "bg")
        .join(cf.select(F.col("u").alias("_u1"), F.col("c").alias("c1")), w1 == F.col("_u1"))
        .join(cf.select(F.col("u").alias("_u2"), F.col("c").alias("c2")), w2 == F.col("_u2"))
        .join(F.broadcast(total))
        .select(
            "_id",
            "tf",
            F.round(
                F.log(
                    F.lit(0.7) * (F.col("c12") * F.lit(1.0) / F.col("c1"))
                    + F.lit(0.3) * (F.col("c2") * F.lit(1.0) / F.col("n_total"))
                ),
                scale,
            ).alias("_lp"),
        )
    )
    return scored.groupBy("_id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.round(
            (
                F.sum(
                    F.col("_lp").cast(f"decimal(20,{scale})")
                    * F.col("tf").cast("decimal(10,0)")
                ).cast("double")
                / F.sum("tf")
            ),
            scale,
        ).alias("mean_logprob"),
    ).select(F.col("_id").alias(id_col), "n_bigrams", "mean_logprob")


def bpe_train_merges(
    df,
    text_col: str = "text",
    num_merges: int = 10,
    mode: str = "distributed",
    vocab_cap: int | None = None,
) -> tuple[list[tuple[str, str, int]], "DataFrame"]:
    """Full BPE tokenizer-training loop (Sennrich et al. 2016), the
    iterative closure of :func:`bpe_merge_candidates`: ``num_merges``
    rounds of (count adjacent symbol pairs weighted by word frequency →
    merge the most frequent pair corpus-wide). Ties break
    lexicographically, merges apply greedily left-to-right inside a JVM
    ``aggregate`` fold — the whole procedure is a pure function of the
    corpus, reproducible across engines and cluster sizes.

    Scale shape: the corpus is read ONCE into a (word, freq) vocabulary;
    every round then runs on the vocabulary — a pair explode + one count
    shuffle (map-side combined) + a 1-row ``TakeOrdered`` + a projection
    applying the merge — never on raw text again. Vocabulary is
    web-corpus-sized but tiny next to the corpus; ``localCheckpoint``
    per round keeps the plan constant-size. Driver traffic: one row per
    round.

    Returns ``(merges, vocab)``: the ordered merge list as
    ``(left, right, weighted_count)`` tuples, and the final vocabulary
    DataFrame ``(word, freq, symbols)`` for downstream encoding.

    Two training modes with BIT-IDENTICAL results (pinned by test):

    - ``mode="distributed"``: every round runs on the distributed
      vocabulary. The per-round plan is constant-size and
      vocabulary-only, but each merge costs one Spark job — fine for
      tens of merges, NOT for a production 32k–64k vocabulary, where
      scheduling overhead alone is hours.
    - ``mode="driver"``: the SentencePiece split and the 100-TB path.
      The corpus is folded ONCE to a (word, freq) vocabulary; the top
      ``vocab_cap`` words by frequency (ties: lexicographic) are
      collected and the merge loop runs locally over the tiny word-freq
      dict — tokenizer training is a function of the vocabulary, which
      is web-scale-bounded (~10^7 words) even when the corpus is 10^11
      documents. Dropped tail mass is logged. The returned vocabulary
      (with fully merged symbols) is created driver-side — it is the
      model artifact, and :func:`bpe_token_counts` broadcasts it for
      the one distributed encode pass.
    """
    from pyspark.sql import functions as F

    if mode not in ("distributed", "driver"):
        raise ValueError(f"bpe_train_merges: unknown mode {mode!r}")

    vocab_counts = (
        df.select(F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    if mode == "driver":
        return _bpe_train_driver(vocab_counts, num_merges, vocab_cap)

    vocab = (
        vocab_counts.withColumn(
            "symbols", F.filter(F.split(F.col("word"), ""), lambda x: x != "")
        )
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        n1 = F.greatest(F.size("symbols") - 1, F.lit(0))
        pairs = vocab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("symbols", 1, n1),
                    F.slice("symbols", 2, n1),
                    lambda x, y: F.struct(x.alias("l"), y.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((a, b, n))
        merged = a + b
        folded = F.aggregate(
            "symbols",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.withColumn("symbols", folded).localCheckpoint(eager=False)
    return merges, vocab


def _bpe_train_driver(vocab_counts, num_merges, vocab_cap):
    """Local merge loop over the collected (word, freq) vocabulary —
    bit-identical to the distributed loop (same freq-weighted pair
    counts, same (count desc, left asc, right asc) tie-break, same
    greedy left-to-right merge application)."""
    from pyspark.sql import functions as F

    spark = vocab_counts.sparkSession
    if vocab_cap is not None:
        total = vocab_counts.agg(
            F.count(F.lit(1)).alias("n"), F.sum("freq").alias("mass")
        ).collect()[0]
        rows = (
            vocab_counts.orderBy(F.desc("freq"), F.asc("word"))
            .limit(vocab_cap)
            .collect()
        )
        kept_mass = sum(r["freq"] for r in rows)
        if total["n"] and total["n"] > len(rows):
            log.warning(
                "bpe_train_merges(mode='driver'): vocabulary capped at "
                "%d of %d words (%.3f%% of token mass kept) — the tail "
                "cannot win merges it isn't counted in",
                len(rows),
                total["n"],
                100.0 * kept_mass / (total["mass"] or 1),
            )
    else:
        rows = vocab_counts.collect()

    words: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["freq"])) for r in rows
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        # max count, ties to the lexicographically smallest (left, right)
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        merged = a + b
        for syms, _freq in words:
            j = 0
            while j < len(syms) - 1:
                if syms[j] == a and syms[j + 1] == b:
                    syms[j : j + 2] = [merged]
                else:
                    j += 1

    vocab = spark.createDataFrame(
        [(r["word"], int(r["freq"]), syms) for r, (syms, _) in zip(rows, words)],
        "word string, freq bigint, symbols array<string>",
    )
    return merges, vocab


def bpe_token_counts(
    df,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Per-document BPE token counts under a trained vocabulary (the
    ``(word, freq, symbols)`` frame :func:`bpe_train_merges` returns):
    each word costs ``len(symbols)`` tokens; out-of-vocabulary words
    fall back to character count (every char its own token — exactly
    what an untrained BPE would emit); documents with no words report
    0 tokens rather than vanishing. The join is vocabulary-keyed —
    the production encode path precomputes word→length instead of
    re-folding merges over the corpus."""
    from pyspark.sql import functions as F

    ids = df.select(F.col(id_col).alias("_id")).distinct()
    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_tokens(text_col)).alias("word"),
    )
    lens = vocab.select("word", F.size("symbols").alias("_bpe_len"))
    counts = (
        words.join(lens, "word", "left")
        .select(
            "_id",
            F.coalesce(F.col("_bpe_len"), F.length("word")).alias("_cost"),
        )
        .groupBy("_id")
        .agg(F.sum("_cost").alias("_n"))
    )
    return (
        ids.join(counts, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_bpe_tokens"),
        )
    )


def char_entropy(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy (nats) of the character distribution
    — the cheap garbage detector: boilerplate/repeated-key-mash text
    scores low, natural language clusters tightly, random bytes score
    high. Pair with :func:`gopher_rules` as a pre-filter.

    Exactness: character counts are integers; each term
    ``-(c/n)·ln(c/n)`` rounds to 9 decimals and accumulates as
    ``decimal(25,9)`` — decimal addition is exact and order-independent,
    so the sum is engine-reproducible without pinning a fold order.
    One explode + two map-side-combined aggregates; empty documents
    report 0.0 entropy (and their true n_chars).
    """
    from pyspark.sql import functions as F

    ids = df.select(F.col(id_col).alias("_id"), F.length(text_col).alias("n_chars"))
    chars = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "")).alias("_ch"),
    ).filter(F.col("_ch") != "")
    counts = chars.groupBy("_id", "_ch").agg(F.count(F.lit(1)).alias("_c"))
    totals = counts.groupBy("_id").agg(F.sum("_c").alias("_n"))
    terms = counts.join(totals, "_id").select(
        "_id",
        F.round(
            -(F.col("_c") / F.col("_n")) * F.log(F.col("_c") / F.col("_n")), 9
        )
        .cast("decimal(25,9)")
        .alias("_t"),
    )
    ent = terms.groupBy("_id").agg(
        F.sum("_t").cast("double").alias("entropy_nats")
    )
    return ids.join(ent, "_id", "left").select(
        F.col("_id").alias(id_col),
        "n_chars",
        F.coalesce(F.col("entropy_nats"), F.lit(0.0)).alias("entropy_nats"),
    )


def rake_keywords(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    stopwords: "tuple[str, ...] | None" = None,
):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores
    ``degree/frequency`` (degree = summed length of phrases it appears
    in); a phrase scores the sum of its word scores. The classic
    no-model keyphrase extractor — ideal at corpus scale because it is
    pure counting.

    One posexplode + one per-doc window (phrase grouping) + two
    map-side-combined aggregates + a (doc, word)-keyed join — no corpus
    pair joins, no UDFs. Word scores round to 9 decimals and phrase
    sums accumulate as exact decimals, so results are
    engine-reproducible. Returns the top-``k`` distinct phrases per
    document by (score desc, phrase asc).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    stops = F.array(*[F.lit(w) for w in (stopwords or LANG_STOPWORDS["en"])])
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(word_tokens(text_col)).alias("_pos", "_w"),
    )
    flagged = toks.withColumn(
        "_delim",
        F.array_contains(stops, F.col("_w")) | ~F.col("_w").rlike("[a-z0-9]"),
    )
    w = W.partitionBy("_id").orderBy("_pos")
    grp = (
        flagged.withColumn("_g", F.sum(F.col("_delim").cast("int")).over(w))
        .filter(~F.col("_delim"))
    )
    phrases = grp.groupBy("_id", "_g").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_w"))), lambda s: s["_w"]
        ).alias("_words")
    )
    occ = phrases.select(
        "_id", "_g", F.size("_words").alias("_plen"), F.explode("_words").alias("_w")
    )
    wscore = occ.groupBy("_id", "_w").agg(
        F.round(F.sum("_plen") / F.count(F.lit(1)), 9)
        .cast("decimal(20,9)")
        .alias("_ws")
    )
    pscore = (
        occ.join(wscore, ["_id", "_w"])
        .groupBy("_id", "_g")
        .agg(F.sum("_ws").alias("_ps"))
    )
    ranked = (
        phrases.join(pscore, ["_id", "_g"])
        .select(
            "_id",
            F.array_join("_words", " ").alias("phrase"),
            F.col("_ps").cast("double").alias("score"),
        )
        .distinct()
    )
    wr = W.partitionBy("_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        ranked.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            "phrase",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pmi_collocations(
    df,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
):
    """Top-``k`` collocations by pointwise mutual information:
    ``PMI(a,b) = ln( p(a,b) / (p(a)p(b)) )`` over adjacent token pairs —
    the classic phrase-discovery statistic (word2vec-phrases, n-gram
    vocabulary induction) and a pure-counting corpus pass.

    ``min_count`` floors the bigram count (rare pairs get inflated PMI —
    the standard correction). One explode for unigrams, one pair-explode
    for bigrams, two term-keyed joins of count relations (vocabulary NOT
    broadcast — web-scale vocabularies are huge; totals ARE broadcast,
    they're 1 row); the log argument evaluates in one pinned
    parenthesization so both engines emit identical doubles.
    """
    from pyspark.sql import functions as F

    toks = df.select(word_tokens(text_col).alias("_w"))
    uni = (
        toks.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n1 = F.greatest(F.size("_w") - 1, F.lit(0))
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice("_w", 1, n1),
                    F.slice("_w", 2, n1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").alias("nu"))
    n_bi = (
        toks.select(n1.alias("_nb")).agg(F.sum("_nb").alias("nb"))
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("cb"))
    scored = (
        bi.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "a",
            "b",
            "cab",
            F.round(
                F.log(
                    (F.col("cab") / F.col("nb"))
                    / ((F.col("ca") / F.col("nu")) * (F.col("cb") / F.col("nu")))
                ),
                9,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b")).limit(k)


def zipf_fit(
    df,
    text_col: str = "text",
    top_k: int = 256,
):
    """Zipf's-law fit of the term frequency distribution: OLS slope of
    ``ln(freq)`` on ``ln(rank)`` over the top-``top_k`` terms — natural
    language sits near −1; a corpus drifting toward 0 (too uniform:
    template/boilerplate floods) or steeply below −1 (a few tokens
    dominating: spam/degenerate generations) fails the health check.

    One corpus term count (map-side combined) + ``TakeOrdered(top_k)``;
    ranking and the regression run on the ``top_k``-row relation, which
    is bounded by construction (the one place a plain window is fine).
    Log terms round to 9, their products round then accumulate as exact
    decimals — the repo's standard cross-engine discipline. Returns one
    row ``(n_terms, slope, intercept)``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    freqs = (
        df.select(F.explode(word_tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_f"))
        .orderBy(F.desc("_f"), F.asc("_w"))
        .limit(top_k)
    )
    w = W.orderBy(F.desc("_f"), F.asc("_w"))
    xy = freqs.withColumn("_rank", F.row_number().over(w)).select(
        F.round(F.log(F.col("_rank").cast("double")), 9).alias("_x"),
        F.round(F.log(F.col("_f").cast("double")), 9).alias("_y"),
    )
    dec = "decimal(25,9)"
    dec2 = "decimal(30,9)"
    m = xy.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast(dec)).cast("double").alias("_sx"),
        F.sum(F.col("_y").cast(dec)).cast("double").alias("_sy"),
        F.sum(F.round(F.col("_x") * F.col("_y"), 9).cast(dec2)).cast("double").alias("_sxy"),
        F.sum(F.round(F.col("_x") * F.col("_x"), 9).cast(dec2)).cast("double").alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    # single-term corpus (or top_k=1): zero rank variance -> NULL, the
    # repo-wide degenerate-case convention (oracles NULLIF)
    den = F.when(den == 0, F.lit(None)).otherwise(den)
    slope = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den
    return m.select(
        F.col("_n").cast("long").alias("n_terms"),
        F.round(slope, 9).alias("slope"),
        F.round((F.col("_sy") - slope * F.col("_sx")) / n, 9).alias("intercept"),
    )


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    window: int = 5,
):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every character ``k``-gram of the
    normalized text, slide a ``window``-wide window over the hash
    sequence, and keep each window's MINIMUM hash (ties broken by the
    rightmost position). The union of selections is the fingerprint
    set, with the paper's guarantee: any shared substring of length
    ``>= window + k - 1`` between two documents yields at least one
    shared fingerprint — the partial-overlap detector that whole-text
    hashing (:func:`fingerprint`) and set-Jaccard shingling both miss.

    Returns ``(id_col, pos, fp)`` — one row per selected position.

    Scale shape: k-gram hashing AND the sliding-window min are pure
    column expressions over per-document arrays (``transform`` over a
    ``sequence``, no UDF) — the argmin-with-rightmost-tiebreak is
    ``array_min`` of ``struct(hash, -pos)`` over each length-``window``
    slice, O(len * window) cheap JVM ops per document with NO shuffle
    and NO sort; only the already-selected (small) fingerprint set is
    exploded. Documents shorter than ``k`` normalized characters
    produce no fingerprints.
    """
    if k < 1 or window < 1:
        raise ValueError("winnow_fingerprints: k and window must be >= 1")
    norm = normalize_text(text_col)
    # The normalized text is bound as a LAMBDA VARIABLE (1-element array +
    # outer transform) so the regexp chain runs once per document; embedding
    # `norm` directly in the gram lambda re-evaluates both regexes per gram
    # element (~doc_len× the work — measured 30 s → 3 s at sf0.1).
    # Inner guard: sequence(1, n) with n < 1 would generate DESCENDING steps.
    grams = F.get(
        F.transform(
            F.array(norm),
            lambda t: F.when(
                F.length(t) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
                    lambda i: md5_long(F.substr(t, i, F.lit(k))),
                ),
            ).otherwise(F.array().cast("array<long>")),
        ),
        F.lit(0),
    )
    # Bind the gram-hash array as a lambda variable too (same once-per-doc
    # reason), then take each window's min(struct(hash, -pos)) in array
    # land: windows ending at j cover [max(1, j-window+1) .. j], matching
    # ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW.
    selected = F.get(
        F.transform(
            F.array(grams),
            lambda hs: F.when(
                F.size(hs) >= 1,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(hs)),
                        lambda j: F.array_min(
                            F.transform(
                                F.sequence(
                                    F.greatest(F.lit(1), j - F.lit(window - 1)), j
                                ),
                                lambda i: F.struct(
                                    F.element_at(hs, i.cast("int")).alias("_h"),
                                    (-i).alias("_np"),
                                ),
                            )
                        ),
                    )
                ),
            ).otherwise(
                F.array().cast("array<struct<_h:long,_np:long>>")
            ),
        ),
        F.lit(0),
    )
    return (
        df.select(F.col(id_col), F.explode(selected).alias("_s"))
        .select(
            id_col,
            (-F.col("_s._np")).cast("long").alias("pos"),
            F.col("_s._h").alias("fp"),
        )
        .distinct()
    )


def winnow_overlap_pairs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    window: int = 5,
    min_shared: int = 3,
    max_bucket: int = 50,
    num_partitions: int | None = None,
):
    """Partial-overlap candidate pairs from shared winnowing
    fingerprints: documents sharing ``>= min_shared`` selected hashes,
    scored by the overlap coefficient ``shared / min(|A|, |B|)``.
    The plagiarism/quotation/boilerplate detector — catches a copied
    PARAGRAPH inside otherwise-different documents, where whole-doc
    and Jaccard dedup both score near zero.

    Scale shape: the pair generator is an equi-join on the fingerprint
    hash — never all-pairs — and hashes shared by more than
    ``max_bucket`` documents are dropped first (logged recall cap, the
    LSH-band posture: a boilerplate fingerprint in a million docs would
    otherwise emit a quadratic bucket). Per-doc fingerprint counts ride
    a broadcast-friendly aggregate re-joined by id. The fingerprint
    relation (one ~16-byte row per selected position, ~2/window of the
    character count — far smaller than the corpus) feeds THREE branches
    (both self-join sides + the size aggregate), so it is materialized
    once via ``localCheckpoint`` instead of re-hashing the corpus per
    branch. ``num_partitions`` spreads the compute-bound gram hashing
    when the input arrives in few partitions (e.g. one small parquet
    file locally); leave ``None`` when the scan already parallelizes.
    """
    import logging as _logging

    if num_partitions:
        df = df.repartition(num_partitions)
    fps = winnow_fingerprints(
        df, text_col=text_col, id_col=id_col, k=k, window=window
    ).select(F.col(id_col).alias("_id"), "fp").distinct()
    fps = fps.localCheckpoint(eager=False)
    from pyspark.sql import Window as W

    bucketed = (
        fps.withColumn("_bn", F.count(F.lit(1)).over(W.partitionBy("fp")))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )
    _logging.getLogger(__name__).info(
        "winnow_overlap_pairs: fingerprint buckets over %d docs are dropped "
        "(recall cap)", max_bucket
    )
    sizes = fps.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = bucketed.select(F.col("_id").alias("a_id"), "fp")
    b = bucketed.select(F.col("_id").alias("b_id"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(sizes.select(F.col("_id").alias("a_id"), F.col("_n").alias("_na")), "a_id")
        .join(sizes.select(F.col("_id").alias("b_id"), F.col("_n").alias("_nb")), "b_id")
        .select(
            "a_id",
            "b_id",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / F.least("_na", "_nb").cast("double"),
                9,
            ).alias("overlap"),
        )
    )


def textrank_keywords(
    df,
    text_col: str = "text",
    min_cooccur: int = 3,
    iterations: int = 3,
    top_k: int = 20,
):
    """Corpus-level TextRank keywords (Mihalcea & Tarau, "TextRank:
    Bringing Order into Texts", EMNLP 2004): build the word
    co-occurrence graph (adjacent-token pairs, both directions, kept
    when the pair co-occurs ``>= min_cooccur`` times corpus-wide) and
    rank words with the deterministic FIXED-POINT PageRank of
    :func:`onetl_spark.operators.graph.pagerank_fixed_point` — graph
    centrality finds the vocabulary that holds the corpus together,
    where raw frequency just finds stopwords' cousins and TF-IDF only
    scores words against single documents. Returns the ``top_k`` words
    as ``(word, rank_fp)``, ties broken by word.

    Scale shape: tokenization and pairing are column expressions (no
    UDF); the pair aggregate is map-side combined and the
    ``min_cooccur`` support cut keeps the graph from densifying with
    corpus growth (the co-occurrence-graph posture of the supplier
    showcase); PageRank is integer and shuffle-order-independent, so
    a 1000-executor run reproduces the laptop ranks bit-for-bit. The
    top-k is a single bounded ``orderBy ... limit``.
    """
    if top_k < 1:
        raise ValueError(f"textrank_keywords: top_k must be >= 1, got {top_k}")
    from onetl_spark.operators.graph import pagerank_fixed_point

    toks = df.select(word_tokens(text_col).alias("_w"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("_w", 1, F.greatest(F.size("_w") - 1, F.lit(0))),
                F.slice("_w", 2, F.greatest(F.size("_w") - 1, F.lit(0))),
                lambda a, b: F.struct(
                    F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
                ),
            )
        ).alias("_p")
    ).select(F.col("_p.u").alias("u"), F.col("_p.v").alias("v"))
    ed = (
        pairs.filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_cooccur)
        .select("u", "v")
    )
    undirected = ed.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        ed.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    ranks = pagerank_fixed_point(undirected, iterations=iterations)
    return (
        ranks.orderBy(F.col("rank_fp").desc(), F.col("node").asc())
        .limit(top_k)
        .select(F.col("node").alias("word"), "rank_fp")
    )


def bm25_topk(
    df,
    query_terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
):
    """Okapi BM25 ranked retrieval: score every document against a bag
    of query terms and return the ``top_k`` — the lexical-search
    baseline every RAG/retrieval stack benchmarks against (TF-IDF
    scores a term IN a document; BM25 adds the saturating tf and
    length normalization that made it the 30-year default).

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))``
    with ``idf = ln(1 + (N−df+0.5)/(df+0.5))``. Per-term scores are
    rounded to 9 decimals and accumulated as DECIMAL, so the sum is
    order-independent — bit-stable across partitionings and engines
    (the repo's standard float-sum discipline). Ties break by doc id.

    Scale shape: one tokenize+explode pass filtered to the BROADCAST
    query-term list (the inverted-index probe — everything not in the
    query drops before any shuffle), per-(doc,term) counts map-side
    combined, document lengths from a second narrow aggregate, and the
    1-row corpus stats (N, avglen) broadcast. The final top-k is a
    bounded ``orderBy ... limit``.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if top_k < 1:
        raise ValueError(f"bm25_topk: top_k must be >= 1, got {top_k}")
    spark = df.sparkSession
    qdf = spark.createDataFrame([(t.lower(),) for t in set(query_terms)], "term string")
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(word_tokens(text_col)).alias("term")
    )
    lens = (
        df.select(F.col(id_col).alias("_id"), F.size(word_tokens(text_col)).alias("_len"))
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_len").alias("_total_len"),
    )
    tf = (
        toks.join(F.broadcast(qdf), "term")
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = F.col("_n_docs").cast("double")
    avglen = F.col("_total_len").cast("double") / n
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("_df").cast("double") + F.lit(0.5))
        / (F.col("_df").cast("double") + F.lit(0.5))
    )
    tfd = F.col("_tf").cast("double")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("_len").cast("double") / avglen
    )
    term_score = F.round(
        idf * tfd * F.lit(float(k1 + 1.0)) / (tfd + norm), 9
    ).cast("decimal(20,9)")
    scored = (
        tf.join(dfreq, "term")
        .join(lens, "_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("_id")
        .agg(F.sum(term_score).alias("_s"), F.count(F.lit(1)).alias("n_terms_hit"))
    )
    return (
        scored.orderBy(F.col("_s").desc(), F.col("_id").asc())
        .limit(top_k)
        .select(
            F.col("_id").alias(id_col),
            F.col("_s").cast("double").alias("bm25"),
            F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        )
    )


def phrase_blocklist_counts(
    df,
    phrases: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Multi-phrase exact matching over the token stream — the blocklist
    filter of a training-data pipeline (banned phrases, license
    boilerplate, eval-set canaries), with Aho-Corasick SEMANTICS (every
    occurrence of every phrase found in one pass) expressed Spark-first:
    positional token equi-joins against a broadcast phrase table instead
    of a per-row automaton UDF.

    How: documents explode once to ``(id, pos, token)``; each phrase
    splits into ``(phrase, offset, token, len)`` parts (driver-side,
    blocklist-sized). Candidates are token rows matching a phrase's FIRST
    token (broadcast hash join — no shuffle of the corpus); each
    candidate start is then verified by joining every phrase part against
    the token at ``start + offset`` and keeping starts where all ``len``
    parts matched. Returns one row per phrase: ``(phrase, n_docs,
    n_hits)`` — zero-hit phrases included (a blocklist audit must show
    silence explicitly).

    Scale shape: the corpus is touched by one explode and one
    (id, pos)-keyed shuffle for the verification join; the phrase table
    (typically 10^3–10^6 rows) broadcasts. Never a regex scan of
    ``text`` per phrase (O(corpus × phrases)), never arrays carried
    through joins. Matching is on normalized whitespace tokens
    (:func:`word_tokens`), consistent with the corpus-stats operators.
    """
    if not phrases:
        raise ValueError("phrase_blocklist_counts: phrases must be non-empty")
    rows = []
    for ph in phrases:
        ws = ph.split()
        if not ws:
            raise ValueError(f"phrase_blocklist_counts: blank phrase {ph!r}")
        rows.extend((ph, off, w.lower(), len(ws)) for off, w in enumerate(ws))
    spark = df.sparkSession
    parts = spark.createDataFrame(
        rows, "phrase string, off int, tok string, plen int"
    )
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(word_tokens(text_col)).alias("pos", "tok"),
    )
    first = parts.filter(F.col("off") == 0).select(
        "phrase", F.col("tok").alias("_ft"), "plen"
    )
    cand = toks.join(
        F.broadcast(first), toks["tok"] == first["_ft"]
    ).select("_id", F.col("pos").alias("start"), "phrase", "plen")
    probe = cand.join(
        F.broadcast(parts.select("phrase", "off", F.col("tok").alias("_pt"))),
        "phrase",
    )
    matched = (
        probe.join(
            toks.select(F.col("_id").alias("_id2"), F.col("pos").alias("_p2"), F.col("tok").alias("_t2")),
            (F.col("_id2") == F.col("_id"))
            & (F.col("_p2") == F.col("start") + F.col("off"))
            & (F.col("_t2") == F.col("_pt")),
        )
        .groupBy("_id", "start", "phrase", "plen")
        .agg(F.count(F.lit(1)).alias("_nm"))
        .filter(F.col("_nm") == F.col("plen"))
    )
    per_phrase = matched.groupBy("phrase").agg(
        F.countDistinct("_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_hits"),
    )
    all_phrases = parts.select("phrase").distinct()
    return all_phrases.join(per_phrase, "phrase", "left").select(
        "phrase",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
    )


def mix31(a: Column, b: Column) -> Column:
    """Nonlinear 31-bit integer mix of two non-negative integer columns —
    the cheap portable hash for RESAMPLING schemes (one value per
    (row, replicate) pair, where md5-of-string costs dominate at B×n
    scale). Two multiply-mod-2^31 rounds separated by xor-shift steps:
    the xor-shifts break affinity in ``b`` (an affine-only scheme makes
    all replicates near-identical — see BENCH_NOTES/PLANS). Inputs are
    pre-reduced mod 2^31, so every intermediate stays < 2^62 and Spark's
    ANSI overflow check never fires AT ANY input magnitude (a bare
    ``a * 1103515245`` would abort for a ≳ 8.4e9 — global row indexes
    at multi-billion-row scale). DuckDB mirror: :func:`mix31_sql`."""
    m = F.lit(2147483648)
    a, b = F.pmod(a.cast("long"), m), F.pmod(b.cast("long"), m)
    x = F.pmod(a * F.lit(1103515245) + b * F.lit(654435761) + F.lit(12345), m)
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = F.pmod(x * F.lit(1103515245) + F.lit(6789), m)
    return x.bitwiseXOR(F.shiftright(x, 7))


def mix31_sql(a: str, b: str) -> str:
    """DuckDB expression identical to :func:`mix31` (same constants,
    same operation order; xor() and >> are exact integer ops on both
    engines). Input pre-reduction is sign-safe (``((x % m) + m) % m``)
    because DuckDB's ``%`` is truncated (sign-following) while the Spark
    side uses ``pmod`` — a bare ``%`` would diverge on negative inputs.
    All later reductions operate on provably non-negative intermediates,
    so plain ``%`` is exact there."""
    ar = f"(((({a}) % 2147483648) + 2147483648) % 2147483648)"
    br = f"(((({b}) % 2147483648) + 2147483648) % 2147483648)"
    x1 = f"({ar} * 1103515245 + {br} * 654435761 + 12345) % 2147483648"
    x2 = f"xor({x1}, ({x1}) >> 13)"
    x3 = f"(({x2}) * 1103515245 + 6789) % 2147483648"
    return f"xor({x3}, ({x3}) >> 7)"
