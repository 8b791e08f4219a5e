"""Distributed cardinality sketching: HyperLogLog over Ray Data.

The 100-TB shape: each ``map_batches`` task reduces its batch to one
fixed-size register array (2^p bytes); the driver merges the tiny
partials with an elementwise max — the full column never leaves the
workers and nothing is shuffled.  (Flajolet et al., "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm", 2007;
bias correction per the original paper's small/large-range rules.)

The reference engine has no sketches (its distinct counts are exact
hash sets, SearchEngine.h:517-522); HLL is the bounded-memory analog
for 10^10-URL frontiers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import fnv1a64_batch, fnv1a64_fixed


def _hash_values(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind in "iu":
        mat = np.ascontiguousarray(values.astype("<u8")).view(np.uint8)
        return fnv1a64_fixed(mat.reshape(len(values), 8))
    return fnv1a64_batch(values)


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch → one uint8 register array of size 2^p (vectorized)."""
    m = 1 << p
    h = _hash_values(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 when the
    # suffix is (effectively) all zeros.  log2 runs on the top 53 bits
    # so the float64 conversion is exact; suffixes with >=53 leading
    # zeros (prob 2^-53) take the cap.
    rank = np.full(len(h), 64 - p + 1, np.uint8)
    top = (rest >> np.uint64(11)).astype(np.int64)
    good = top > 0
    if good.any():
        lz = 52 - np.floor(np.log2(top[good].astype(np.float64))).astype(np.int64)
        rank[good] = (lz + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = partials[0].copy()
    for r in partials[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    elif est > (1 << 32) / 30:
        est = -(1 << 32) * np.log1p(-est / (1 << 32))
    return float(est)


def approx_distinct(ds, column: str, p: int = 12) -> dict:
    """Approximate COUNT(DISTINCT column) over a Dataset: per-batch
    registers → driver merge (list of 4 KB arrays).  Returns
    ``{"approx": int, "registers": m}``; standard error ≈ 1.04/√m
    (~1.6 % at p=12)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[column].to_numpy()
        if v.dtype.kind not in "iu":
            v = v.astype("U")
        return pd.DataFrame({"regs": [hll_partial(v, p).tobytes()]})

    parts = [
        np.frombuffer(x, np.uint8)
        for x in ds.map_batches(partial, batch_format="pandas")
        .to_pandas()["regs"]
    ]
    regs = hll_merge(parts)
    return {"approx": int(round(hll_estimate(regs))), "registers": len(regs)}
