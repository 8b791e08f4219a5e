"""Reverse index build + multi-term search (reference menu 3/4 tiers).

Build (A1-A4, O1-O2): per-doc word aggregation with positional decay
(``getWords``, ``SearchEngine.cpp:282-490``), weight constants from
A2 (``SearchEngine.cpp:306-309,451-459``), rank normalization to the
page rank (A3, ``:479-488``), bfloat16 rank quantization
(``MicroFloat``, ``SearchEngine.h:78-114`` — truncation, not
round-to-nearest), small-word 8-char rollup (A4, ``:516-528``) — then
one ``ds.sort(word, rank, page_index)`` replaces the external merge
sorter (``ExternalSorter.hpp``).

Search (O3-O8, J4-J6): term postings via binary search on the sorted
dictionary (``PageSearcher.cpp:40-67``), tail-limit keeps the
top-rank suffix (``:425``), hash-join AND across ≤8 terms on doc id
(``joinThread``, ``:229-299``), per-page top-2 positions per term
(``PosRanks``, ``:155-174``), proximity score
``Σ termRank × Π 0.9^(minPosDiff−1)`` floored at 1e-6
(``:273-287,180-190``), top-k by final rank (``:269-298``), host-merge
display — best page per host + suppressed count (``:481-538``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.text import TOKEN_RE, STOPWORDS

WEIGHT_URL = 40.0     # SearchEngine.cpp:306-309
WEIGHT_TITLE = 100.0
WEIGHT_BODY = 1.0
POSITION_DECAY = 0.999
MAX_WORDS_PER_PAGE = 2000  # MAXWORDPERPAGE, SearchEngine.h:26
SMALL_WORD_SIZE = 8        # SMALLWORDSIZE, SearchEngine.h:28
MAX_TERMS = 8              # MaxTerms, PageSearcher.cpp:221


def microfloat(x: np.ndarray) -> np.ndarray:
    """bfloat16 quantization by mantissa truncation (MicroFloat,
    SearchEngine.h:109-112 — truncate, NOT round-to-nearest)."""
    f = np.asarray(x, np.float32)
    return (f.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)


MAIN_WORD_SIZE = 24  # MAINWORDSIZE, SearchEngine.h:29 — phrase entries cap


def word_rows(
    batch: pd.DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    title_col: str | None = None,
    rank_col: str | None = None,
    phrases: bool = False,
) -> pd.DataFrame:
    """Per-doc word aggregation → (word, rank, page_index, position).

    Per word keep the max weighted rank + its position (A1); position
    counter caps at 65535; total words per page cap 2000; ranks
    normalized so Σ = page rank (A3); bf16-quantized.  With
    ``phrases=True`` every n-gram of adjacent tokens whose joined text
    fits 24 chars is also emitted (plus the first 24-char truncation
    once a chain overflows) — the reference's main dict stores words
    AND arbitrary space-containing phrases in its 24-byte rows
    (``DictWord``, ``SearchEngine.h:424-425``), so a quoted 3+-word
    query can prefix-match a stored phrase entry
    (``PageSearcher.cpp:47-66``).
    """
    # ≥1 char + separator per token → at most 12 tokens can contribute
    # distinct prefixes of a 24-char phrase entry
    max_chain = MAIN_WORD_SIZE // 2
    out_w, out_r, out_p, out_pos = [], [], [], []
    for i in range(len(batch)):
        doc_id = int(batch[id_col].iloc[i])
        page_rank = float(batch[rank_col].iloc[i]) if rank_col else 1.0
        best: dict[str, tuple[float, int]] = {}
        pos = 0
        streams = []
        if title_col:
            streams.append((WEIGHT_TITLE, str(batch[title_col].iloc[i])))
        streams.append((WEIGHT_BODY, str(batch[body_col].iloc[i])))
        for weight, text in streams:
            chain: list[tuple[str, int]] = []  # phrases don't span streams
            for tok in TOKEN_RE.findall(text.lower()):
                if tok in STOPWORDS:
                    chain = []  # a stopword breaks the phrase chain
                    continue
                if pos >= 65535:
                    break
                w = weight * (POSITION_DECAY ** pos)
                cur = best.get(tok)
                if cur is None or w > cur[0]:
                    best[tok] = (w, pos)
                if phrases and chain:
                    # extend backwards: emit every n-gram ending at tok,
                    # anchored at the position of its first token; stop
                    # once the joined phrase overflows 24 chars (longer
                    # chains share the same truncated key)
                    ph = tok
                    for ptok, ppos in reversed(chain):
                        ph = ptok + " " + ph
                        key = ph[:MAIN_WORD_SIZE]
                        curp = best.get(key)
                        if curp is None or w > curp[0]:
                            best[key] = (w, ppos)
                        if len(ph) >= MAIN_WORD_SIZE:
                            break
                chain.append((tok, pos))
                if len(chain) > max_chain:
                    chain.pop(0)
                pos += 1
        if not best:
            continue
        items = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))
        items = items[:MAX_WORDS_PER_PAGE]
        total = sum(w for _, (w, _) in items)
        scale = page_rank / total if total > 0 else 0.0
        for word, (w, p) in items:
            out_w.append(word)
            out_r.append(w * scale)
            out_p.append(doc_id)
            out_pos.append(p)
    return pd.DataFrame(
        {
            "word": out_w,
            "rank": microfloat(np.array(out_r, np.float32)),
            "page_index": np.array(out_p, np.int64),
            "position": np.array(out_pos, np.int32),
        }
    )


def small_word_rows(words: pd.DataFrame) -> pd.DataFrame:
    """A4 rollup: truncate to 8 chars, per (page, word8) keep the
    max-rank entry (UTF-8-boundary handling is free on str)."""
    df = words.copy()
    df["word"] = df["word"].str.slice(0, SMALL_WORD_SIZE)
    df = df.sort_values(["page_index", "word", "rank"], ascending=[True, True, False])
    return df.drop_duplicates(subset=["page_index", "word"], keep="first").reset_index(
        drop=True
    )


def build_index(
    docs_ds,
    id_col="doc_id",
    body_col="text",
    title_col=None,
    rank_col=None,
):
    """→ sorted dictionary Dataset (word, rank, page_index, position).

    The ds.sort is the O1/O2 external-merge-sort replacement."""
    rows = docs_ds.map_batches(
        lambda b: word_rows(b, id_col, body_col, title_col, rank_col,
                            phrases=True),
        batch_format="pandas",
    )
    return rows.sort(["word", "rank", "page_index"])


# ------------------------------------------------------------------ search


def split_sentence(query: str, max_terms: int = MAX_TERMS) -> list[str]:
    """splitSentence (PageSearcher.cpp:69-108): whitespace split +
    double-quoted phrases."""
    terms, i, n = [], 0, len(query)
    while i < n and len(terms) < max_terms:
        while i < n and query[i].isspace():
            i += 1
        if i >= n:
            break
        if query[i] == '"':
            j = query.find('"', i + 1)
            if j < 0:
                j = n
            term = query[i + 1 : j].strip()
            i = j + 1
        else:
            j = i
            while j < n and not query[j].isspace():
                j += 1
            term = query[i:j]
            i = j
        if term:
            terms.append(term.lower())
    return terms


class SearchIndex:
    """Driver-side searcher over the sorted dictionary table
    (binary search = O(log N) per keyword, PageSearcher.cpp:40-67)."""

    def __init__(self, dict_table: pa.Table, doc_host: dict[int, str] | None = None,
                 max_search: int = 100_000):
        self.words = np.asarray(dict_table["word"].to_pylist(), dtype=object)
        self.rank = dict_table["rank"].to_numpy(zero_copy_only=False)
        self.page = dict_table["page_index"].to_numpy(zero_copy_only=False)
        self.pos = dict_table["position"].to_numpy(zero_copy_only=False)
        self.doc_host = doc_host or {}
        self.max_search = max_search

    def _range(self, term: str) -> tuple[int, int]:
        phrase = " " in term
        if phrase:
            # stored phrase entries are truncated to 24 chars, so a
            # longer quoted query prefix-matches on its 24-char key
            # (PageSearcher.cpp:47-66; DictWord SearchEngine.h:424-425)
            key = term[:MAIN_WORD_SIZE]
            lo = int(np.searchsorted(self.words, key, side="left"))
            hi = lo
            while hi < len(self.words) and str(self.words[hi]).startswith(key):
                hi += 1
            return int(lo), int(hi)
        lo = np.searchsorted(self.words, term, side="left")
        hi = np.searchsorted(self.words, term, side="right")
        return int(lo), int(hi)

    def _term_postings(self, term: str) -> pd.DataFrame:
        lo, hi = self._range(term)
        if hi - lo > self.max_search:
            lo = hi - self.max_search  # top-rank suffix (O4, :425)
        return pd.DataFrame(
            {
                "page_index": self.page[lo:hi],
                "rank": self.rank[lo:hi],
                "position": self.pos[lo:hi],
            }
        )

    def search(self, query: str, max_show: int = 200) -> pd.DataFrame:
        terms = split_sentence(query)
        if not terms:
            return pd.DataFrame(columns=["page_index", "final_rank"])
        postings = [self._term_postings(t) for t in terms]
        return self._score(postings, max_show)

    def _score(self, postings: list[pd.DataFrame], max_show: int) -> pd.DataFrame:
        # AND-join on page_index, keep top-2 (rank, pos) per page per term
        per_term = []
        for p in postings:
            p = p.sort_values("rank", ascending=False)
            g = p.groupby("page_index").head(2)
            per_term.append(g)
        pages = set(per_term[0]["page_index"])
        for p in per_term[1:]:
            pages &= set(p["page_index"])
        if not pages:
            return pd.DataFrame(columns=["page_index", "final_rank"])
        rows = []
        for pg in pages:
            term_ranks, term_pos = [], []
            for p in per_term:
                sub = p[p["page_index"] == pg]
                term_ranks.append(float(sub["rank"].sum()))
                term_pos.append(sub["position"].to_numpy())
            score = sum(term_ranks)
            prox = 1.0
            for a, b in zip(term_pos[:-1], term_pos[1:]):
                dmin = min(abs(int(x) - int(y)) for x in a for y in b)
                prox *= 0.9 ** max(dmin - 1, 0)
            rows.append((pg, max(score * prox, 1e-6)))
        out = pd.DataFrame(rows, columns=["page_index", "final_rank"])
        out = out.sort_values(["final_rank", "page_index"], ascending=[False, True])
        out = out.head(max_show).reset_index(drop=True)
        if self.doc_host:
            # doc_host may be a dict (small corpora) or a resolver
            # callable ids → {id: host} so the host sidecar is fetched
            # for the ≤max_show RESULT rows only, never materialized
            # corpus-wide on the driver (J6 display merge,
            # PageSearcher.cpp:301-346 keeps its sidecar file-resident)
            mapping = (
                self.doc_host(out["page_index"].tolist())
                if callable(self.doc_host)
                else self.doc_host
            )
            out["host"] = out["page_index"].map(mapping)
            merged = []
            for host, g in out.groupby("host", sort=False):
                top = g.iloc[0]
                merged.append(
                    (int(top["page_index"]), float(top["final_rank"]), host, len(g) - 1)
                )
            out = pd.DataFrame(
                merged, columns=["page_index", "final_rank", "host", "suppressed"]
            ).sort_values(["final_rank", "page_index"], ascending=[False, True]).reset_index(drop=True)
        return out


def _block_bounds(tbl: pa.Table):
    if len(tbl) == 0:
        return None
    w = tbl["word"]
    return str(w[0].as_py()), str(w[-1].as_py())


class PartitionedSearchIndex(SearchIndex):
    """Distributed search over the sorted dictionary Dataset — the
    100-TB path for the reference's disk-resident binary-searched dict
    (``PageSearcher.cpp:40-67``: the file IS the index; only O(log N)
    pages are touched per keyword).

    The sorted Dataset's blocks stay in the object store; the driver
    holds only each block's (first_word, last_word) bounds — a sparse
    index, like the reference's file-page binary search.  A query term
    prunes to the blocks whose word range can contain it, fetches ONLY
    those (zero-copy plasma reads), and binary-searches inside.  RAM
    never bounds the dictionary size: the driver's footprint is
    2 strings per block plus the touched postings ranges.
    """

    def __init__(self, dict_ds, doc_host: dict[int, str] | None = None,
                 max_search: int = 100_000):
        import ray

        refs = dict_ds.to_arrow_refs()
        bounds_fn = ray.remote(num_cpus=0)(_block_bounds)
        bounds = ray.get([bounds_fn.remote(r) for r in refs])
        self._refs = [r for r, b in zip(refs, bounds) if b is not None]
        self._lo = [b[0] for b in bounds if b is not None]
        self._hi = [b[1] for b in bounds if b is not None]
        self.doc_host = doc_host or {}
        self.max_search = max_search
        self.blocks_fetched = 0  # instrumentation (asserted in tests)
        self._ray = ray

    def _term_postings(self, term: str) -> pd.DataFrame:
        phrase = " " in term
        key = term[:MAIN_WORD_SIZE] if phrase else term
        # upper bound of the matching word range: prefix matches for
        # phrases, exact word otherwise
        upper = key + "￿" if phrase else key
        parts = []
        for i, ref in enumerate(self._refs):
            if self._hi[i] < key or self._lo[i] > upper:
                continue  # pruned — block cannot contain the term
            tbl = self._ray.get(ref)  # zero-copy plasma read
            self.blocks_fetched += 1
            words = np.asarray(tbl["word"].to_pylist(), dtype=object)
            lo = int(np.searchsorted(words, key, side="left"))
            if phrase:
                hi = lo
                while hi < len(words) and str(words[hi]).startswith(key):
                    hi += 1
            else:
                hi = int(np.searchsorted(words, key, side="right"))
            if hi > lo:
                parts.append(
                    pd.DataFrame(
                        {
                            "page_index": tbl["page_index"].to_numpy(
                                zero_copy_only=False
                            )[lo:hi],
                            "rank": tbl["rank"].to_numpy(zero_copy_only=False)[
                                lo:hi
                            ],
                            "position": tbl["position"].to_numpy(
                                zero_copy_only=False
                            )[lo:hi],
                        }
                    )
                )
        if not parts:
            return pd.DataFrame(
                {"page_index": [], "rank": [], "position": []}
            )
        out = pd.concat(parts, ignore_index=True)
        if len(out) > self.max_search:
            out = out.tail(self.max_search)  # top-rank suffix (O4)
        return out
