"""Text-analysis operators for training-data pipelines.

These are first-class engine operators (task brief): token counting,
quality scoring, language ID, document fingerprinting. Everything that
can stay JVM-side (whole-stage codegen) is a Column expression; only
langid/fingerprint/simhash — which need per-token hashing loops — are
Arrow-batched pandas UDFs.

The reference's only string analytics are entity/whitespace transforms
(SURVEY.md §2.4); these operators are the scale-out additions.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

from bisque_spark.hashing import MASK64, xxh64

# Small multilingual stopword profiles for the language-ID heuristic.
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "es": {"el", "la", "de", "y", "los", "las", "un", "una", "es", "que"},
}
_EN_STOP = sorted(STOPWORDS["en"])


def tokens_col(text: str | Column) -> Column:
    """Whitespace tokens (JVM-side). Empty text → empty array."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_col(text: str | Column) -> Column:
    return F.size(tokens_col(text))


def punct_count_col(text: str | Column) -> Column:
    """Count of sentence punctuation — explicit class so the same regex
    means the same thing in Java regex and DuckDB RE2 (oracle parity)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, "[.,;:!?]", ""))


def stopword_count_col(text: str | Column, lang: str = "en") -> Column:
    words = sorted(STOPWORDS[lang])
    return F.size(
        F.filter(
            tokens_col(text),
            lambda w: F.lower(w).isin(*words),
        )
    )


def quality_cols(text: str | Column) -> dict[str, Column]:
    """Quality-scoring bundle: token count, punct ratio, stopword ratio,
    mean token length. All JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count_col(c)
    n_char = F.length(c)
    return {
        "n_tokens": n_tok,
        "punct_ratio": F.when(n_char > 0, punct_count_col(c) / n_char).otherwise(
            F.lit(0.0)
        ),
        "stopword_ratio": F.when(
            n_tok > 0, stopword_count_col(c) / n_tok
        ).otherwise(F.lit(0.0)),
        "mean_token_len": F.when(
            n_tok > 0,
            (F.length(F.regexp_replace(c, r"\s+", ""))) / n_tok,
        ).otherwise(F.lit(0.0)),
    }


# ---- language ID (heuristic, Arrow-batched) ---------------------------------

_WORD_RE = re.compile(r"[a-zA-Zà-ÿÀ-ß]+")


def langid_py(text: str) -> str:
    """Stopword-profile argmax; deterministic tie-break by lang name."""
    if not text:
        return "und"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(STOPWORDS):
        score = sum(1 for w in words if w in STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def _langid_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: langid_py(t) if t is not None else "und")


def langid_udf(col):
    """Arrow-batched language-ID column. (UDF built lazily — a
    module-level pandas_udf object can't be pickled to executors.)"""
    return F.pandas_udf(_langid_series, "string")(col)


# ---- fingerprint / simhash (Arrow-batched) -----------------------------------


def fingerprint_py(text: str, window: int = 8) -> int:
    """Winnowing-style document fingerprint: min rolling-window hash of
    the whitespace-normalized text → signed 64-bit."""
    norm = " ".join(text.split()).lower()
    if len(norm) < window:
        h = xxh64(norm.encode("utf-8"))
    else:
        data = norm.encode("utf-8")
        h = min(
            xxh64(data[i : i + window]) for i in range(0, len(data) - window + 1, 4)
        )
    return h - (1 << 64) if h >= (1 << 63) else h


def _fingerprint_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: fingerprint_py(t) if t is not None else 0)


def fingerprint_udf(col):
    return F.pandas_udf(_fingerprint_series, "long")(col)


def simhash_py(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unit weights)."""
    votes = np.zeros(64, dtype=np.int64)
    for tok in set(text.split()):
        h = xxh64(tok.encode("utf-8"))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def _simhash_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: simhash_py(t) if t else 0)


def simhash_udf(col):
    return F.pandas_udf(_simhash_series, "long")(col)


def hamming64_col(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64 simhashes (JVM bit ops)."""
    return F.bit_count(a.bitwiseXOR(b))
