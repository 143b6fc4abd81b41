"""Text-analysis column functions (NumPy/pandas, Arrow-batched):
n-gram language ID, quality scoring, BPE-ish token counting, document
fingerprinting. These are the richer siblings of the SQL-parity
queries in plans/textops.py; pytest checks them against pure-Python
oracles (tests/test_text_ops.py)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import rolling_fingerprint

__all__ = [
    "LANG_PROFILES", "langid_score", "langid_udf", "quality_udf",
    "bpe_token_count", "token_count_udf", "fingerprint_udf",
]

# character-trigram marker profiles (tiny, hand-rolled — the heuristic,
# not a model)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", " th", "er ", " a "),
    "fr": ("le ", "la ", " de", "es ", "ent", " et", "une"),
    "de": ("der", "und", "ein", "ich", "sch", " di", "en "),
    "es": ("el ", " de", "os ", " la", "que", "ión", " y "),
}


def langid_score(text: str) -> str:
    t = text.lower()
    best, best_n = "unknown", 0
    for lang, grams in LANG_PROFILES.items():
        n = sum(t.count(g) for g in grams)
        if n > best_n:
            best, best_n = lang, n
    return best


def langid_udf():
    @F.pandas_udf(T.StringType())
    def _lang(text: pd.Series) -> pd.Series:
        return text.map(langid_score)
    return _lang


# BPE-ish tokenizer: words, numbers, punctuation runs — the regex
# family GPT-2-style tokenizers use for pre-tokenization
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def bpe_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text))


def token_count_udf():
    @F.pandas_udf(T.IntegerType())
    def _cnt(text: pd.Series) -> pd.Series:
        return text.map(bpe_token_count).astype("int32")
    return _cnt


def quality_udf():
    """Structural quality features: length, punct ratio, stopword
    ratio, mean word length, all-caps ratio → struct column."""
    schema = T.StructType([
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("punct_ratio", T.DoubleType()),
        T.StructField("stopword_ratio", T.DoubleType()),
        T.StructField("mean_word_len", T.DoubleType()),
    ])
    stop = {"the", "a", "and", "of", "to", "in", "is"}

    @F.pandas_udf(returnType=schema)
    def _q(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            words = t.split()
            n = len(t)
            npunct = sum(1 for c in t if not c.isalnum() and not c.isspace())
            nstop = sum(1 for w in words if w.lower() in stop)
            rows.append((
                n, len(words),
                npunct / n if n else 0.0,
                nstop / len(words) if words else 0.0,
                float(np.mean([len(w) for w in words])) if words else 0.0,
            ))
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return _q


def fingerprint_udf():
    @F.pandas_udf(T.LongType())
    def _fp(text: pd.Series) -> pd.Series:
        return pd.Series([
            int(np.int64(np.uint64(rolling_fingerprint(t)).astype(np.int64)))
            for t in text
        ])
    return _fp
