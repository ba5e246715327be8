"""Property tests for the hygiene normalizer/audit invariants.

Hypothesis drives a pure-Python REFERENCE of the replace chain (same
pairs, same all-occurrence semantics as F.replace) — fast, no Spark per
example; one batched Spark test then pins the reference to the real
column expressions on a seeded corpus, so the properties transfer.
"""

from __future__ import annotations

import random
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from onetl_spark.llm.hygiene import COMBINING_MARKS, COMPOSABLE, NFC_LATIN1_PAIRS

# alphabet biased toward the interesting plane: ASCII bases, the five
# composable marks, a non-composable mark, composed Latin-1, Cyrillic
ALPHABET = (
    "aceinouyAEN xz"
    "̧̀́̂̃̈"   # composable marks (+cedilla)
    "͙"                                  # non-composable mark
    "éñü"                      # already-composed
    "аб"                            # cyrillic
)


def nfc_ref(s: str) -> str:
    for d, c in NFC_LATIN1_PAIRS:
        s = s.replace(d, c)
    return s


texts = st.text(alphabet=ALPHABET, max_size=60)


@given(texts)
def test_normalizer_idempotent(s):
    once = nfc_ref(s)
    assert nfc_ref(once) == once


@given(texts)
def test_len_delta_equals_composable_count(s):
    # each composable pair is 2 code points composing to 1, counted
    # non-overlapping exactly like regexp_count
    n_comp = len(re.findall(COMPOSABLE, s))
    assert len(s) - len(nfc_ref(s)) == n_comp


@given(texts)
def test_composable_never_exceeds_marks(s):
    n_comp = len(re.findall(COMPOSABLE, s))
    n_marks = len(re.findall(COMBINING_MARKS, s))
    assert 0 <= n_comp <= n_marks


@given(texts)
def test_normalizer_removes_only_composable_marks(s):
    # marks surviving normalization = residual (non-composable) marks
    n_marks_before = len(re.findall(COMBINING_MARKS, s))
    n_comp = len(re.findall(COMPOSABLE, s))
    n_marks_after = len(re.findall(COMBINING_MARKS, nfc_ref(s)))
    assert n_marks_after == n_marks_before - n_comp


def test_spark_columns_match_python_reference(spark):
    """Pin the engine expressions to the reference on a seeded corpus —
    one Spark job for the whole batch."""
    from pyspark.sql import functions as F

    from onetl_spark.llm.hygiene import combining_mark_audit, nfc_normalize_latin1

    rng = random.Random(42)
    corpus = [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    rows = (
        combining_mark_audit(df)
        .withColumn("_norm", nfc_normalize_latin1(F.col("text")))
        .collect()
    )
    for r in rows:
        t = corpus[r["doc_id"]]
        assert r["_norm"] == nfc_ref(t)
        assert r["nfc_len_delta"] == len(t) - len(nfc_ref(t))
        assert r["n_composable"] == len(re.findall(COMPOSABLE, t))
