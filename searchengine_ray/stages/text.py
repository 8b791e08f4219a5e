"""Text-analysis batch kernels for the documents table.

The reference's word pipeline (``getWords``, ``SearchEngine.cpp:282-490``)
tokenizes pages, weights words, and filters stopwords
(``SearchEngine.h:560-611``).  These kernels re-express that per-batch
(pandas/pyarrow vectorized) plus the large-scale training-data
operators the engine adds: language-ID heuristic, quality scoring,
token counting, and rolling-hash document fingerprinting.

Tokenization contract (shared with the DuckDB oracle SQL):
``regexp_extract_all(lower(text), '[a-z0-9]+')`` — keep the two sides
byte-identical.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")

# reference stopword set (SearchEngine.h:560-570) — www/com + articles
STOPWORDS = frozenset({"www", "com", "a", "of", "the", "for"})

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una"},
    "zh": {"de", "shi", "le", "wo", "ni", "ta"},
}


def tokenize_series(text: pd.Series) -> pd.Series:
    return text.str.lower().str.findall(TOKEN_RE)


def token_stats(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-doc token counts — vectorized via pandas str kernels."""
    toks = tokenize_series(batch[text_col])
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": toks.str.len().astype("int64"),
            "n_distinct": toks.map(lambda t: len(set(t))).astype("int64"),
            "n_chars_obs": batch[text_col].str.len().astype("int64"),
        }
    )
    return out


def quality_score(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality heuristics: length, stopword ratio, type-token ratio,
    mean token length (the 'junk detector' of a training-data pipeline)."""
    toks = tokenize_series(batch[text_col])
    n = toks.str.len().clip(lower=1)
    stop = toks.map(lambda t: sum(w in STOPWORDS for w in t))
    distinct = toks.map(lambda t: len(set(t)))
    tok_chars = toks.map(lambda t: sum(len(w) for w in t))
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": toks.str.len().astype("int64"),
            "stopword_ratio": (stop / n).round(6),
            "type_token_ratio": (distinct / n).round(6),
            "mean_token_len": (tok_chars / n).round(6),
        }
    )


def langid(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword-profile language ID: argmax of profile hits
    (tie → lexicographically smallest language code)."""
    toks = tokenize_series(batch[text_col])
    langs = sorted(LANG_PROFILES)
    scores = {
        lang: toks.map(lambda t, p=LANG_PROFILES[lang]: sum(w in p for w in t))
        for lang in langs
    }
    mat = np.stack([scores[lang].to_numpy() for lang in langs], axis=1)
    best = np.argmax(mat, axis=1)  # argmax keeps first (sorted) on ties
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": np.array(langs, dtype=object)[best],
            "lang_score": mat[np.arange(len(batch)), best].astype("int64"),
        }
    )


_FP_BASE = 1000003
_FP_MASK = (1 << 61) - 1


def fingerprint(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Rolling polynomial hash over the token stream (order-sensitive
    document fingerprint; exact-dup docs collide, any reorder doesn't)."""
    toks = tokenize_series(batch[text_col])

    def fp(ts: list[str]) -> int:
        h = 0
        for w in ts:
            h = (h * _FP_BASE + hash_word(w)) & _FP_MASK
        return h

    return pd.DataFrame(
        {"doc_id": batch["doc_id"], "fingerprint": toks.map(fp).astype("int64")}
    )


def hash_word(w: str) -> int:
    h = 14695981039346656037
    for b in w.encode():
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h & _FP_MASK


def word_count_partial(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-batch partial word counts (combiner before the groupby —
    the pre-aggregation pattern that keeps the shuffle small)."""
    toks = tokenize_series(batch[text_col])
    exploded = toks.explode().dropna()
    counts = exploded.value_counts()
    return pd.DataFrame(
        {"word": counts.index.astype(str), "cnt": counts.to_numpy(np.int64)}
    )


def shingle_set(tokens: list[str], k: int) -> set[int]:
    """Hashed k-token shingles (for Jaccard / MinHash)."""
    if len(tokens) < k:
        return {hash_word(" ".join(tokens))} if tokens else set()
    out = set()
    for i in range(len(tokens) - k + 1):
        out.add(hash_word(" ".join(tokens[i : i + k])))
    return out
