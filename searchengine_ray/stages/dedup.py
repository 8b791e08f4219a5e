"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram
Jaccard, phash, embedding-cosine) — Ray-Data-first.

The reference's only dedup is exact URL identity (J1,
``SearchEngine.h:814-835``); these are the payload/content-level
operators a 100 TB training-data pipeline needs (build charter), each
expressed as map_batches (vectorized sketching) + a keyed shuffle
(groupby on hash/band/bucket) + per-group resolution — the partial/
combiner-first pattern, never a driver-side loop over rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import fnv1a64_batch
from .text import TOKEN_RE, hash_word, shingle_set


def _ncpus() -> int:
    import ray

    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8

# ------------------------------------------------------------- exact dedup


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = fnv1a64_batch(batch[text_col].combine_chunks())
    return batch.append_column("text_hash", pa.array(h, type=pa.uint64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact content dedup, combiner-first: per-batch partial (min-id
    survivor + count per content hash) → hash-partition by content hash
    → per-partition vectorized final.  Never a per-group Python call —
    the shuffle carries one row per distinct hash per batch and the
    final is one pandas pass per partition.

    Returns the survivors dataset with ``dup_count`` per kept row."""
    npart = _ncpus()
    hashed = ds.map_batches(
        lambda t: add_text_hash(t, text_col), batch_format="pyarrow"
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(id_col)
        keep = b.drop_duplicates("text_hash").copy()
        cnt = b.groupby("text_hash").size()
        keep["partial_count"] = keep["text_hash"].map(cnt).astype("int64")
        keep["part"] = (keep["text_hash"].to_numpy(np.uint64) % np.uint64(npart)).astype(
            np.int64
        )
        return keep

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        cnt = g.groupby("text_hash")["partial_count"].sum()
        keep = g.drop_duplicates("text_hash").copy()
        keep["dup_count"] = keep["text_hash"].map(cnt).astype("int64")
        return keep.drop(columns=["partial_count", "part"])

    return (
        hashed.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(finalize, batch_format="pandas")
    )


# --------------------------------------------------------------- minhash LSH

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    batch: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 7,
) -> pd.DataFrame:
    """Per-doc MinHash signature (vectorized over each doc's shingle set)."""
    a, b = _minhash_params(num_perm, seed)
    ids, sigs = [], []
    for doc_id, text in zip(batch[id_col], batch[text_col]):
        toks = TOKEN_RE.findall(str(text).lower())
        sh = shingle_set(toks, shingle_k)
        if not sh:
            sig = np.full(num_perm, np.uint64(_MERSENNE))
        else:
            x = np.fromiter(sh, np.uint64, len(sh))
            with np.errstate(over="ignore"):
                m = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            sig = m.min(axis=0)
        ids.append(doc_id)
        sigs.append(sig)
    return pd.DataFrame({id_col: ids, "sig": [s.tolist() for s in sigs]})


def lsh_bands(
    sig_df: pd.DataFrame, id_col: str = "doc_id", bands: int = 16
) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, id) rows for the
    bucket groupby."""
    rows_id, rows_band, rows_hash = [], [], []
    for doc_id, sig in zip(sig_df[id_col], sig_df["sig"]):
        sig = np.asarray(sig, np.uint64)
        r = len(sig) // bands
        for bnd in range(bands):
            chunk = sig[bnd * r : (bnd + 1) * r]
            h = 14695981039346656037
            for v in chunk:
                h = ((h ^ int(v)) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            rows_id.append(doc_id)
            rows_band.append(bnd)
            rows_hash.append(np.uint64(h))
    return pd.DataFrame(
        {"band_id": rows_band, "band_hash": rows_hash, id_col: rows_id}
    )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 7,
):
    """shingle → minhash → band buckets → candidate pairs → verify
    estimated Jaccard ≥ threshold.  Returns dataset of
    (id_a, id_b, jaccard_est) with id_a < id_b."""
    from ray.data.aggregate import Count

    npart = _ncpus()
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "jaccard_est": pd.Series([], dtype="float64"),
        }
    )

    sigs = ds.map_batches(
        lambda b: minhash_signatures(
            b, text_col, id_col, num_perm, shingle_k, seed
        ),
        batch_format="pandas",
    )
    sig_mat = sigs.materialize()

    def bands_part(b: pd.DataFrame) -> pd.DataFrame:
        out = lsh_bands(b, id_col, bands)
        part = (
            out["band_hash"].to_numpy(np.uint64)
            + (out["band_id"].to_numpy(np.uint64) << np.uint64(56))
        ) % np.uint64(npart)
        out["part"] = part.astype(np.int64)
        return out

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of any (band_id, band_hash) bucket land in this
        # partition; one vectorized self-merge covers every bucket here
        pr = g.merge(g, on=["band_id", "band_hash"], suffixes=("_a", "_b"))
        pr = pr[pr[f"{id_col}_a"] < pr[f"{id_col}_b"]]
        out = pr[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        out.columns = ["id_a", "id_b"]
        if out.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                }
            )
        return out

    cand = (
        sig_mat.map_batches(bands_part, batch_format="pandas")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    if cand.count() == 0:
        return empty

    # hash-partition joins of candidate pairs against the signature
    # table (keyed on doc id) — the 100-TB verify path, no driver
    # materialization of either side.  Signatures travel as packed
    # fixed-width bytes (acero joins don't carry list columns).
    def pack(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "sigb": [np.asarray(s, np.uint64).tobytes() for s in b["sig"]],
            }
        )

    sig_pack = sig_mat.map_batches(pack, batch_format="pandas")
    withe_a = cand.join(
        sig_pack,
        join_type="inner",
        num_partitions=npart,
        on=("id_a",),
        right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename(columns={"sigb": "sig_a"}).drop(
            columns=[id_col], errors="ignore"
        ),
        batch_format="pandas",
    )
    with_both = withe_a.join(
        sig_pack,
        join_type="inner",
        num_partitions=npart,
        on=("id_b",),
        right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename(columns={"sigb": "sig_b"}).drop(
            columns=[id_col], errors="ignore"
        ),
        batch_format="pandas",
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "jaccard_est": pd.Series([], dtype="float64"),
                }
            )
        a = np.stack([np.frombuffer(s, np.uint64) for s in b["sig_a"]])
        bb = np.stack([np.frombuffer(s, np.uint64) for s in b["sig_b"]])
        est = (a == bb).mean(axis=1)
        out = pd.DataFrame(
            {"id_a": b["id_a"], "id_b": b["id_b"], "jaccard_est": est}
        )
        return out[out["jaccard_est"] >= threshold]

    out = with_both.map_batches(verify, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------------------ simhash


def simhash_batch(
    batch: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """64-bit SimHash over token hashes (weight = term frequency).

    Fully vectorized: every token in the batch is hashed in one
    ``fnv1a64_batch`` call (same 61-bit-masked values as ``hash_word``)
    and the per-doc bit-vote sums come from ``np.add.reduceat`` over
    the flat token-bit matrix — no per-token Python hashing."""
    from .text import _FP_MASK

    tok_lists = [TOKEN_RE.findall(str(t).lower()) for t in batch[text_col]]
    counts = np.array([len(t) for t in tok_lists], np.int64)
    n = len(batch)
    out_hash = np.zeros(n, np.uint64)
    flat = [w for ts in tok_lists for w in ts]
    if flat:
        hs = fnv1a64_batch(pa.array(flat, type=pa.string())) & np.uint64(_FP_MASK)
        # bit matrix via unpackbits (little-endian bytes → bit j of h)
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        nz = counts > 0
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
        ones = np.add.reduceat(bits.astype(np.int32), starts, axis=0)
        # majority vote: Σ(2b−1) > 0  ⟺  2·ones > n_tokens
        pos = (2 * ones) > counts[nz, None]
        out_hash[nz] = np.packbits(pos, axis=1, bitorder="little").view(
            np.uint64
        ).ravel()
    return pd.DataFrame(
        {id_col: batch[id_col].to_numpy(), "simhash": out_hash.view(np.int64)}
    )


# ---------------------------------------------------------------- phash dedup


def phash_dedup(ds, phash_col: str = "phash", id_col: str = "image_id"):
    """Exact perceptual-hash dedup: keep min(id) per phash + count
    suppressed (SURVEY.md §2.7 payload-level analog of J1).

    Combiner-first: per-batch partial (one min-id row + count per
    phash per batch) → hash-partition by phash → per-partition
    vectorized final (SURVEY §7.4 partition key)."""
    npart = _ncpus()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(id_col)
        keep = b.drop_duplicates(phash_col).copy()
        cnt = b.groupby(phash_col).size()
        keep["partial_count"] = keep[phash_col].map(cnt).astype("int64")
        keep["part"] = (
            keep[phash_col].to_numpy(np.int64).astype(np.uint64) % np.uint64(npart)
        ).astype(np.int64)
        return keep

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        cnt = g.groupby(phash_col)["partial_count"].sum()
        keep = g.drop_duplicates(phash_col).copy()
        keep["dup_count"] = keep[phash_col].map(cnt).astype("int64")
        return keep.drop(columns=["partial_count", "part"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(finalize, batch_format="pandas")
    )


def phash_near_pairs(
    ds,
    phash_col: str = "phash",
    id_col: str = "image_id",
    max_hamming: int = 6,
):
    """Hamming-near perceptual-hash pairs (SURVEY §2.7 extension).

    Band-bucket candidate generation: a 64-bit phash splits into 4
    16-bit bands.  By pigeonhole, any pair with Hamming distance ≤ 3
    agrees exactly on at least one band (guaranteed recall); pairs
    with 4 ≤ d ≤ max_hamming are found when their differing bits don't
    touch all four bands (high but not guaranteed recall — the
    standard LSH trade; more/narrower bands raise recall at higher
    candidate cost).  Explode to (band, key, id) rows → bucket join →
    verify exact Hamming ≤ max_hamming.
    """
    from ..sources.codec import hamming64

    def bands(b: pd.DataFrame) -> pd.DataFrame:
        ph = b[phash_col].to_numpy(np.int64).astype(np.uint64)
        out = []
        for band in range(4):
            key = ((ph >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            out.append(
                pd.DataFrame(
                    {
                        "band": band,
                        "key": key,
                        id_col: b[id_col].to_numpy(),
                        phash_col: b[phash_col].to_numpy(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    npart = _ncpus()
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        }
    )

    def bands_part(b: pd.DataFrame) -> pd.DataFrame:
        out = bands(b)
        part = (
            out["key"].to_numpy(np.int64) + (out["band"].to_numpy(np.int64) << 16)
        ) % npart
        out["part"] = part
        return out

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # every (band, key) bucket is whole within this partition:
        # vectorized self-merge + exact Hamming verify, per partition
        pr = g.merge(g, on=["band", "key"], suffixes=("_a", "_b"))
        pr = pr[pr[f"{id_col}_a"] < pr[f"{id_col}_b"]]
        if len(pr) == 0:
            return empty
        pr = pr.drop_duplicates([f"{id_col}_a", f"{id_col}_b"])
        d = hamming64(
            pr[f"{phash_col}_a"].to_numpy(np.int64),
            pr[f"{phash_col}_b"].to_numpy(np.int64),
        )
        out = pd.DataFrame(
            {
                "id_a": pr[f"{id_col}_a"].to_numpy(),
                "id_b": pr[f"{id_col}_b"].to_numpy(),
                "hamming": d.astype(np.int64),
            }
        )
        return out[out["hamming"] <= max_hamming]

    # partition merge emits each surviving pair once per matching
    # band-bucket partition; a second hash-partition keyed on the PAIR
    # dedups with one vectorized drop_duplicates per partition (Ray's
    # string-keyed Aggregate operator is ~10x slower here)
    def pair_part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(part2=pd.Series([], dtype="int64"))
        ha = fnv1a64_batch(pa.array(b["id_a"].astype(str)))
        hb = fnv1a64_batch(pa.array(b["id_b"].astype(str)))
        b = b.copy()
        b["part2"] = ((ha ^ hb) % np.uint64(npart)).astype(np.int64)
        return b

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns=["part2"])

    out = (
        ds.map_batches(bands_part, batch_format="pandas")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pandas")
        .map_batches(pair_part, batch_format="pandas")
        .groupby("part2")
        .map_groups(pair_dedup, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return empty
    out["hamming"] = out["hamming"].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ----------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(
    ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 5,
):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets +
    in-bucket exact verify.  Pairs may be missed across buckets (LSH
    recall < 1); the exact variant is a full O(n²) matmul — see
    stages/similarity.py for the brute-force path."""

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch[emb_col].to_numpy())
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((emb.shape[1], n_planes))
        signs = (emb @ planes) > 0
        bucket = np.zeros(len(batch), np.int64)
        for k in range(n_planes):
            bucket = bucket * 2 + signs[:, k]
        return pd.DataFrame(
            {id_col: batch[id_col], "bucket": bucket, emb_col: batch[emb_col]}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1
        sims = (emb / norm) @ (emb / norm).T
        ids = g[id_col].to_numpy()
        ia, ib, s = [], [], []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if sims[i, j] >= threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    ia.append(lo)
                    ib.append(hi)
                    s.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cos_sim": s})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
