"""FLAT engine: exact brute-force scan on the MXU.

Replaces the reference's flat algorithm (`src/core/algorithm/flat/
flat_searcher_context.h:237-314`: K-way query batching over SIMD distance
matrices + bounded heaps) with a single fused device program: pad codes into
HBM once, then every query batch runs `blockwise_topk_search` (matmul tile x
mask fuse x running lax.top_k).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..model.param.param import QueryParam
from ..ops.distance import l2_norms
from ..ops.runtime import round_up
from ..ops.topk import blockwise_topk_search
from ..typing.enum import IndexType, MetricType
from .interface import VectorIndexEngine, register_engine

__all__ = ["FlatEngine"]

# Queries are padded to buckets to bound jit recompilation.
_QUERY_BUCKETS = (1, 8, 32, 128, 512)
# Row padding granularity; block scan kicks in above one block.
_ROW_ALIGN = 512
_BLOCK_SIZE = 131072


def _bucket_queries(nq: int) -> int:
    for b in _QUERY_BUCKETS:
        if nq <= b:
            return b
    return round_up(nq, _QUERY_BUCKETS[-1])


@register_engine(IndexType.FLAT)
class FlatEngine(VectorIndexEngine):
    def __init__(self, metric: MetricType, dimension: int, params=None):
        super().__init__(metric, dimension, params)
        self._codes = None  # (N_pad, D) device f32
        self._norms = None  # (N_pad,) device f32
        self._n = 0
        self._n_pad = 0

    def _rebuild(self, data: np.ndarray) -> None:
        n = data.shape[0]
        self._n = n
        if n == 0:
            self._codes = None
            return
        n_pad = round_up(n, _ROW_ALIGN)
        padded = np.zeros((n_pad, data.shape[1]), dtype=np.float32)
        padded[:n] = data.astype(np.float32, copy=False)
        self._n_pad = n_pad
        self._codes = jnp.asarray(padded)
        self._norms = l2_norms(self._codes)

    def _search_impl(
        self,
        queries: np.ndarray,
        topk: int,
        mask: Optional[np.ndarray],
        param: Optional[QueryParam],
    ) -> Tuple[np.ndarray, np.ndarray]:
        nq = queries.shape[0]
        if self._n == 0:
            sims = np.full((nq, topk), -np.inf, dtype=np.float32)
            return sims, np.full((nq, topk), -1, dtype=np.int64)

        nq_pad = _bucket_queries(nq)
        q = np.zeros((nq_pad, queries.shape[1]), dtype=np.float32)
        q[:nq] = queries

        full_mask = np.zeros(self._n_pad, dtype=bool)
        if mask is not None:
            full_mask[: self._n] = mask
        else:
            full_mask[: self._n] = True

        k = min(topk, self._n)
        sims, idx = blockwise_topk_search(
            q,
            self._codes,
            self.metric,
            k,
            mask=jnp.asarray(full_mask),
            x_sq_norms=self._norms,
            block_size=_BLOCK_SIZE,
        )
        sims = np.asarray(sims[:nq])
        idx = np.asarray(idx[:nq]).astype(np.int64)
        if k < topk:
            sims = np.pad(sims, ((0, 0), (0, topk - k)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, topk - k)), constant_values=-1)
        sims = np.where(idx >= 0, sims, -np.inf)
        return sims, idx
