"""Backend/runtime helpers shared by device ops."""

from __future__ import annotations

import functools

import jax
import numpy as np

__all__ = [
    "is_tpu",
    "interpret_mode",
    "round_up",
    "cdiv",
    "NEG_INF",
    "pad_axis0",
    "QUERY_BUCKETS",
    "bucket_queries",
]

# Query batches pad to these row counts so every engine's search program
# compiles once per bucket instead of once per distinct batch size (remote
# compile through the tunnel is 2-60s; the cache does not help).
QUERY_BUCKETS = (1, 8, 32, 128, 512)


def bucket_queries(nq: int) -> int:
    for b in QUERY_BUCKETS:
        if nq <= b:
            return b
    return round_up(nq, QUERY_BUCKETS[-1])

NEG_INF = float(np.finfo(np.float32).min)  # large-negative sentinel, avoids NaN from inf-inf


@functools.cache
def is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU test mesh)."""
    return not is_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis0(arr: np.ndarray, target: int, fill=0) -> np.ndarray:
    """Pad numpy array along axis 0 up to `target` rows."""
    if arr.shape[0] == target:
        return arr
    pad = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)
