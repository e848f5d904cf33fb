"""Text analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Everything here is a pure column expression (JVM-side, codegen'd, no
Python) except the winnowing fingerprint, which is an Arrow-batched UDF.
All scores are deterministic rational arithmetic rounded to fixed
precision, so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# marker words per language — mirrors the generator vocabularies
LANG_MARKERS = {
    "en": ["the", "and", "with", "over"],
    "de": ["der", "und", "mit", "über"],
    "es": ["el", "sobre", "con", "muchas"],
    "fr": ["le", "par", "avec", "beaucoup"],
    "zh": ["的", "很", "许多", "关于"],
}

STOPWORDS = ["the", "and", "a", "of", "to", "in", "der", "und", "el", "le", "la", "de"]


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/null."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE proxy: 'don't' -> 3,
    'abc123' -> 2). regexp_count is JVM-side."""
    t = F.coalesce(text, F.lit(""))
    return F.regexp_count(t, F.lit(r"[A-Za-z一-鿿]+|[0-9]+|[^\sA-Za-z0-9一-鿿]"))


def _marker_hits(text: Column, words: list) -> Column:
    # word boundaries for alphabetic scripts; CJK markers match as-is
    # (\b is meaningless between CJK chars)
    alts = "|".join(w if _is_cjk(w) else rf"\b{w}\b" for w in words)
    return F.regexp_count(F.lower(text), F.lit(f"({alts})"))


def _is_cjk(w: str) -> bool:
    return any("一" <= ch <= "鿿" for ch in w)


def lang_id(text: Column) -> Column:
    """n-gram/marker-word language guess over the 5 corpus languages.
    Deterministic argmax with fixed tie order en>de>es>fr>zh."""
    scores = {lang: _marker_hits(text, w) for lang, w in LANG_MARKERS.items()}
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strictly-greater keeps the earlier lang on ties
    for lang in ["en", "de", "es", "fr", "zh"]:
        s = scores[lang]
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return best


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds deterministic quality columns:
      n_chars_q, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
      upper_ratio, quality_score (0..1, rounded to 4 dp).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    n_stop = _marker_hits(t, STOPWORDS)
    avg_tok = F.when(n_tokens > 0, F.round(n_chars / n_tokens, 4)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, F.round(n_punct / n_chars, 4)).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, F.round(n_upper / n_chars, 4)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, F.round(n_stop / n_tokens, 4)).otherwise(F.lit(0.0))
    # quality: long enough, has sentence punctuation, sane token length,
    # some stopwords (prose-ness). Clamped sum of subscores.
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(punct_ratio * F.lit(20.0), F.lit(1.0)) * 0.2
        + F.when((avg_tok >= 3) & (avg_tok <= 12), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2
    )
    return (
        df.withColumn("n_chars_q", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("avg_token_len", avg_tok)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("upper_ratio", upper_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", F.round(score, 4))
    )


def min_kgram_fingerprint(text: Column, k: int = 8, stride: int = 4) -> Column:
    """Document fingerprint: min md5 over char k-grams (stride-sampled).
    A 1-function MinHash — cheap containment/near-dup key, JVM-only,
    and exactly expressible in the DuckDB oracle."""
    n = F.length(text)
    starts = F.when(
        n >= k, F.sequence(F.lit(0), F.floor((n - k) / stride).cast("int"))
    ).otherwise(F.when(n > 0, F.array(F.lit(0))).otherwise(F.array().cast("array<int>")))
    grams = F.transform(starts, lambda i: F.md5(F.substring(text, i * stride + 1, k)))
    return F.array_min(grams)


def winnowing_fingerprint_udf(k: int = 8, window: int = 4):
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003) fingerprint set:
    min hash in each sliding window of k-gram hashes, deduplicated.
    Arrow-batched UDF; returns sorted array of hex8 fingerprints."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        def fp(t):
            t = t or ""
            if len(t) < k:
                return []
            hs = [
                hashlib.blake2b(t[i : i + k].encode(), digest_size=4).hexdigest()
                for i in range(len(t) - k + 1)
            ]
            picked = set()
            for i in range(max(1, len(hs) - window + 1)):
                picked.add(min(hs[i : i + window]))
            return sorted(picked)

        return texts.map(fp)

    return _udf
