"""Vectorized text kernels vs per-doc scalar references.

Round-4 rewrite: every text.py kernel runs on the batch's flat token
stream (dictionary-encode → hash distinct tokens → gather → bincount
per doc).  These tests pin the vectorized outputs byte-identical to a
straightforward per-doc Python implementation across edge cases
(empty, punctuation-only, repeated tokens, sub-k docs)."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.stages import text as tx


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(42)
    words = [
        "the", "and", "of", "to", "a", "in", "is", "it",
        "der", "die", "das", "und", "le", "la", "el", "y",
        "apple", "Banana", "Cherry42", "date", "FIG", "grape!",
        "x", "zz9", "longertokenword", "qqq",
    ]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 40)))
        for _ in range(300)
    ]
    texts += ["", "   ", "!!!", "the the the", "a", "l'élan café"]
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def _scalar_profile(t):
    toks = tx.TOKEN_RE.findall(str(t).lower())
    scores = {
        lang: sum(w in p for w in toks) for lang, p in tx.LANG_PROFILES.items()
    }
    mx = max(scores.values())
    best = [lang for lang in sorted(scores) if scores[lang] == mx][0]
    return (
        len(toks),
        len(set(toks)),
        sum(w in tx.STOPWORDS for w in toks),
        sum(len(w) for w in toks),
        best,
        mx,
    )


def test_text_profile_matches_scalar(docs):
    p = tx.text_profile(docs["text"])
    for i, t in enumerate(docs["text"]):
        n, dist, stop, chars, best, mx = _scalar_profile(t)
        assert p["n_tokens"][i] == n
        assert p["n_distinct"][i] == dist
        assert p["stop_cnt"][i] == stop
        assert p["tok_chars"][i] == chars
        assert p["lang_pred"][i] == best
        assert p["lang_score"][i] == mx


def test_fingerprint_matches_scalar(docs):
    out = tx.fingerprint(docs)
    for i, t in enumerate(docs["text"]):
        h = 0
        for w in tx.TOKEN_RE.findall(str(t).lower()):
            h = (h * tx._FP_BASE + tx.hash_word(w)) & tx._FP_MASK
        assert int(out["fingerprint"][i]) == h


def test_shingle_set_matches_scalar(docs):
    def scalar(tokens, k):
        if not tokens:
            return set()
        if len(tokens) < k:
            return {tx.hash_word(" ".join(tokens))}
        return {
            tx.hash_word(" ".join(tokens[i : i + k]))
            for i in range(len(tokens) - k + 1)
        }

    for t in docs["text"][:60]:
        toks = tx.TOKEN_RE.findall(str(t).lower())
        for k in (2, 3, 8):
            assert tx.shingle_set(toks, k) == scalar(toks, k)


def test_empty_batch():
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    for fn in (tx.token_stats, tx.quality_score, tx.langid, tx.fingerprint):
        out = fn(empty)
        assert len(out) == 0


def test_no_per_token_python_in_hot_kernels():
    """Regression guard for the round-3 verdict: no ``.map(lambda``
    per-doc token loops may reappear in text.py."""
    import inspect

    src = inspect.getsource(tx)
    assert ".map(lambda" not in src
