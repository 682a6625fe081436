"""Dataset IO: .vecs binary formats + .npy.

Reference equivalent: `tools/core/vecs_reader.h` — fvecs/ivecs/bvecs files
(per-row: [i32 dim][dim elements]) as used by SIFT/GIST/Deep benchmarks.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_vecs", "write_vecs", "load_vectors"]

_DTYPES = {".fvecs": np.float32, ".ivecs": np.int32, ".bvecs": np.uint8}


def read_vecs(path: str, limit: int | None = None) -> np.ndarray:
    """Read an fvecs/ivecs/bvecs file into an (N, D) array."""
    ext = os.path.splitext(path)[1]
    dtype = _DTYPES.get(ext)
    if dtype is None:
        raise ValueError(f"unknown vecs extension '{ext}'")
    raw = np.fromfile(path, dtype=np.uint8)
    dim = int(np.frombuffer(raw[:4], dtype=np.int32)[0])
    itemsize = np.dtype(dtype).itemsize
    row_bytes = 4 + dim * itemsize
    n = len(raw) // row_bytes
    if limit is not None:
        n = min(n, limit)
    rows = raw[: n * row_bytes].reshape(n, row_bytes)
    return np.ascontiguousarray(rows[:, 4:]).view(dtype).reshape(n, dim)


def write_vecs(path: str, data: np.ndarray) -> None:
    ext = os.path.splitext(path)[1]
    dtype = _DTYPES.get(ext)
    if dtype is None:
        raise ValueError(f"unknown vecs extension '{ext}'")
    data = np.ascontiguousarray(data, dtype=dtype)
    n, d = data.shape
    dims = np.full((n, 1), d, dtype=np.int32)
    out = np.concatenate([dims.view(np.uint8).reshape(n, 4),
                          data.view(np.uint8).reshape(n, -1)], axis=1)
    out.tofile(path)


def load_vectors(path: str, limit: int | None = None) -> np.ndarray:
    """Load vectors from .npy or .Xvecs."""
    if path.endswith(".npy"):
        arr = np.load(path, mmap_mode="r")
        return np.asarray(arr[:limit] if limit else arr)
    return read_vecs(path, limit)
