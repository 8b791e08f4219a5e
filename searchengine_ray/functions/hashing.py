"""Vectorized 64-bit hashing kernels.

The reference identifies URLs/hosts by 128-bit MD5 keys
(``SearchEngine/SearchEngine/SearchEngine.h:213-223``,
``KeyValueDB.hpp:25-56``).  The north rule asks for 64-bit canonical
hashes instead; we use FNV-1a/64 — deterministic across processes and
Python versions (unlike ``hash()``), and vectorizable with numpy so a
whole Arrow batch hashes without a Python-per-row loop.

All kernels take a ``pyarrow`` string array (or a Python list of str)
and return ``np.ndarray`` of ``uint64``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)

_U64_MASK = (1 << 64) - 1


def fnv1a64(s: bytes | str) -> int:
    """Scalar FNV-1a/64 (reference implementation for tests & oracle)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = 14695981039346656037
    for b in s:
        h = ((h ^ b) * 1099511628211) & _U64_MASK
    return h


def _as_string_array(strs) -> pa.Array:
    if isinstance(strs, pa.ChunkedArray):
        strs = strs.combine_chunks()
    if not isinstance(strs, pa.Array):
        strs = pa.array(strs, type=pa.string())
    if pa.types.is_large_string(strs.type):
        return strs
    return strs.cast(pa.string()) if not pa.types.is_string(strs.type) else strs


def _padded_bytes(strs) -> tuple[np.ndarray, np.ndarray]:
    """(n, maxlen) uint8 matrix + per-row byte lengths, zero-copy from Arrow.

    Row-major flattening of the valid-position mask aligns exactly with
    the concatenated UTF-8 data buffer, so one fancy assignment fills
    the matrix.
    """
    arr = _as_string_array(strs)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), np.uint8), np.zeros(0, np.int64)
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(off_buf, dtype=off_dtype, count=n + 1 + arr.offset)[
        arr.offset :
    ].astype(np.int64)
    lens = offsets[1:] - offsets[:-1]
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, max(maxlen, 1)), np.uint8)
    if maxlen:
        data = np.frombuffer(data_buf, dtype=np.uint8)
        mask = np.arange(maxlen) < lens[:, None]
        # gather each row's bytes: build flat source indices
        src = (offsets[:-1, None] + np.arange(maxlen)[None, :])[mask]
        mat[:, :maxlen][mask] = data[src]
    return mat, lens


def fnv1a64_batch(strs) -> np.ndarray:
    """Vectorized FNV-1a/64 over a batch of strings.

    Iterates over byte *positions* (≤ max string length in the batch)
    with numpy masks — O(maxlen) numpy ops for the whole batch instead
    of a Python loop per string.
    """
    mat, lens = _padded_bytes(strs)
    n = len(lens)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            m = lens > j
            if not m.any():
                break
            h[m] = (h[m] ^ mat[m, j].astype(np.uint64)) * FNV_PRIME
    return h


def fnv1a64_fixed(mat: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a/64 over fixed-width byte rows.

    ``mat`` is an (n, w) uint8 matrix; every row hashes its full w
    bytes — w numpy ops total for the batch (the fixed-width analog of
    ``fnv1a64_batch``, used e.g. to band-hash MinHash signature
    chunks viewed as bytes)."""
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    n = mat.shape[0]
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            h = (h ^ mat[:, j].astype(np.uint64)) * FNV_PRIME
    return h


def hash_combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Mix two uint64 hash columns (for (band, value) composite keys)."""
    with np.errstate(over="ignore"):
        return (a ^ (b * FNV_PRIME + np.uint64(0x9E3779B97F4A7C15))).astype(np.uint64)
