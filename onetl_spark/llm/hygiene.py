"""Unicode / script hygiene operators — the multilingual-corpus cleaning
step between raw scraped text and tokenization.

Scraped multilingual corpora arrive with mixed scripts inside one
document, zero-width and bidi control characters (both classic
prompt-injection / spoofing vectors), denormalized combining sequences
(NFD "e" + U+0301 where NFC "é" is expected — silently doubling token
counts and breaking exact-dedup), and Cyrillic/Greek confusables inside
Latin words (the homoglyph spoofing trick). Every serious pipeline
audits these before training (cf. Unicode TR#36 "Security
Considerations", TR#15 normalization forms, and the C4/Gopher cleaning
recipes); these operators make the audit first-class Spark relations.

All of them are single-pass ``regexp_count`` / ``regexp_replace``
column expressions — pure JVM whole-stage-codegen, no UDFs, no
shuffles beyond the caller's aggregate — so they cost one corpus scan
at any scale and the DuckDB oracles can mirror them exactly
(``len(regexp_extract_all(...))`` on the RE2 side).

Character-class notes: Spark (Java regex) spells script classes
``\\p{IsHan}``; DuckDB (RE2) spells them ``\\p{Han}``. Both accept
explicit code-point ranges identically, so the control/zero-width/
combining classes use ranges for engine parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "script_profile",
    "control_char_audit",
    "confusable_screen",
    "combining_mark_audit",
    "nfc_normalize_latin1",
    "sanitize_text",
    "NFC_LATIN1_PAIRS",
]

# Character classes (explicit code-point ranges -- identical meaning in
# Java regex and RE2; spelled as \\u escapes so this source stays ASCII)
ZERO_WIDTH = "[\u200b\u200c\u200d\ufeff]"
BIDI_CONTROLS = "[\u202a-\u202e\u2066-\u2069]"
C0_CONTROLS = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"  # keeps tab/LF/CR legal;
# spelled as \x regex escapes (valid in Java regex AND RE2) so the raw NUL
# never appears in a SQL/plan string -- parsers reject embedded NUL bytes
ODD_SPACES = "[\u00a0\u2000-\u200a\u202f\u3000]"
COMBINING_MARKS = "[\u0300-\u036f]"
CYRILLIC = "[\u0400-\u04ff]"
HAN = "[\u4e00-\u9fff]"  # CJK Unified Ideographs (BMP block -- range parity)
LATIN_LETTER = "[A-Za-z\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u024f]"


# (decomposed, composed) pairs for the subset normalizer -- the accents the
# COMPOSABLE class counts, for the bases that occur in western-European text.
NFC_LATIN1_PAIRS = [
    ("a\u0300", "\u00e0"), ("a\u0301", "\u00e1"), ("a\u0302", "\u00e2"),
    ("a\u0303", "\u00e3"), ("a\u0308", "\u00e4"),
    ("e\u0300", "\u00e8"), ("e\u0301", "\u00e9"), ("e\u0302", "\u00ea"),
    ("e\u0308", "\u00eb"),
    ("i\u0301", "\u00ed"), ("i\u0302", "\u00ee"), ("i\u0308", "\u00ef"),
    ("o\u0300", "\u00f2"), ("o\u0301", "\u00f3"), ("o\u0302", "\u00f4"),
    ("o\u0303", "\u00f5"), ("o\u0308", "\u00f6"),
    ("u\u0300", "\u00f9"), ("u\u0301", "\u00fa"), ("u\u0308", "\u00fc"),
    ("n\u0303", "\u00f1"), ("c\u0327", "\u00e7"), ("y\u0301", "\u00fd"),
]

# The composition subset counted by combining_mark_audit: EXACTLY the
# decomposed sequences nfc_normalize_latin1 composes, so nfc_len_delta
# always equals the length change the normalizer applies (each pair is a
# 2-code-point sequence composing to 1).
COMPOSABLE = "(?:" + "|".join(d for d, _ in NFC_LATIN1_PAIRS) + ")"


def _count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern))


def script_profile(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-document script census: counts of Latin / Han / Cyrillic
    letters and combining marks, the dominant script, and a mixed-script
    flag (≥2 scripts present — the signal that a document needs
    language-segmentation or is a spoofing candidate, TR#36 §2.2).

    Adds columns to the input relation (single scan, no shuffle):
    ``n_latin, n_han, n_cyrillic, n_combining, dominant_script,
    is_mixed_script``. Dominant-script ties break Latin > Han >
    Cyrillic (fixed order, engine-exact); all-zero rows get 'none'.
    """
    t = F.col(text_col)
    profiled = docs.withColumns({
        "n_latin": _count(t, LATIN_LETTER),
        "n_han": _count(t, HAN),
        "n_cyrillic": _count(t, CYRILLIC),
        "n_combining": _count(t, COMBINING_MARKS),
    })
    dom = (
        F.when(
            (F.col("n_latin") >= F.col("n_han"))
            & (F.col("n_latin") >= F.col("n_cyrillic"))
            & (F.col("n_latin") > 0),
            F.lit("latin"),
        )
        .when((F.col("n_han") >= F.col("n_cyrillic")) & (F.col("n_han") > 0), F.lit("han"))
        .when(F.col("n_cyrillic") > 0, F.lit("cyrillic"))
        .otherwise(F.lit("none"))
    )
    n_scripts = (
        (F.col("n_latin") > 0).cast("int")
        + (F.col("n_han") > 0).cast("int")
        + (F.col("n_cyrillic") > 0).cast("int")
    )
    return profiled.withColumns({
        "dominant_script": dom,
        "is_mixed_script": n_scripts >= 2,
    })


def control_char_audit(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Invisible-character audit: zero-width characters (ZWSP/ZWNJ/ZWJ/
    BOM), bidi embedding/override/isolate controls, C0 controls other
    than tab/newline/CR, and non-ASCII space variants. Bidi controls and
    zero-widths are the canonical text-spoofing and watermark-smuggling
    channels (TR#36; "Trojan Source", Boucher & Anderson 2021) and break
    naive tokenizers; they should be stripped or the document quarantined.

    Adds ``n_zero_width, n_bidi, n_control, n_odd_space, is_clean``
    (single scan, no shuffle).
    """
    t = F.col(text_col)
    audited = docs.withColumns({
        "n_zero_width": _count(t, ZERO_WIDTH),
        "n_bidi": _count(t, BIDI_CONTROLS),
        "n_control": _count(t, C0_CONTROLS),
        "n_odd_space": _count(t, ODD_SPACES),
    })
    return audited.withColumn(
        "is_clean",
        (F.col("n_zero_width") + F.col("n_bidi") + F.col("n_control")
         + F.col("n_odd_space")) == 0,
    )


def confusable_screen(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Homoglyph screen: adjacent Latin+Cyrillic letter pairs inside what
    reads as one word — the fingerprint of confusable substitution
    ('spаrk' with Cyrillic а), which defeats exact dedup,
    poisons token statistics, and is TR#39's core spoofing case.

    Adds ``n_confusable_seams`` (count of mixed-script adjacencies) and
    ``first_confusable`` (the first offending 2-char seam, empty string
    when none — regexp_extract's no-match value, same in both engines).
    Single scan, no shuffle.
    """
    t = F.col(text_col)
    seam = f"{CYRILLIC}[A-Za-z]|[A-Za-z]{CYRILLIC}"
    return docs.withColumns({
        "n_confusable_seams": _count(t, seam),
        "first_confusable": F.regexp_extract(t, seam, 0),
    })


def combining_mark_audit(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """NFC-normalization delta for the Latin-1 composition subset:
    counts combining sequences whose NFC form is precomposed
    (``COMPOSABLE``: vowel/c/n/y + grave/acute/circumflex/tilde/
    diaeresis) and residual combining marks outside that subset. Each
    composable pair shrinks by exactly one code point under NFC, so
    ``nfc_len_delta`` IS the length change ``nfc_normalize_latin1``
    would apply — denormalized text double-counts tokens and defeats
    exact dedup, which is why C4-style pipelines normalize first.

    Adds ``n_composable, n_marks_residual, nfc_len_delta,
    is_nfc_normalized`` (single scan, no shuffle).
    """
    t = F.col(text_col)
    audited = docs.withColumns({
        "n_composable": _count(t, COMPOSABLE),
        "_n_marks": _count(t, COMBINING_MARKS),
    })
    return audited.select(
        *docs.columns,
        "n_composable",
        (F.col("_n_marks") - F.col("n_composable")).alias("n_marks_residual"),
        F.col("n_composable").alias("nfc_len_delta"),
        (F.col("n_composable") == 0).alias("is_nfc_normalized"),
    )


def nfc_normalize_latin1(col: Column) -> Column:
    """Apply the Latin-1-subset NFC composition as a chained literal
    replace — JVM-side, codegen-friendly, no UDF. This is NOT full NFC
    (no reordering, no non-Latin compositions); it is the deterministic
    subset ``combining_mark_audit`` counts, sufficient for
    western-European scraped text and exactly mirrorable in any engine
    with string replace."""
    out = col
    for decomposed, composed in NFC_LATIN1_PAIRS:
        out = F.replace(out, F.lit(decomposed), F.lit(composed))
    return out


def sanitize_text(col: Column) -> Column:
    """The FIX side of the audits above, composed as one column
    expression (single pass, JVM regexp, no UDF):

    1. drop zero-width characters and bidi controls (the spoofing and
       watermark channels `control_char_audit` counts);
    2. drop C0 controls other than tab/LF/CR;
    3. collapse odd space variants (NBSP, en/em/thin/ideographic) to a
       plain space;
    4. compose the Latin-1 NFC subset (`nfc_normalize_latin1`).

    Residual combining marks and confusables are NOT touched — they
    change meaning, so they are audit-and-quarantine decisions, not
    silent rewrites (TR#36 §3.5's distinction between normalization and
    filtering). Idempotent by construction: every output class is
    disjoint from every pattern's match set.
    """
    out = F.regexp_replace(col, F.lit(ZERO_WIDTH), F.lit(""))
    out = F.regexp_replace(out, F.lit(BIDI_CONTROLS), F.lit(""))
    out = F.regexp_replace(out, F.lit(C0_CONTROLS), F.lit(""))
    out = F.regexp_replace(out, F.lit(ODD_SPACES), F.lit(" "))
    return nfc_normalize_latin1(out)
