"""Sparse FLAT engine: exact sparse-IP scan.

Reference equivalent: `src/core/algorithm/flat_sparse/` (brute-force over
sparse postings). Docs live as padded index/value arrays in HBM; every query
densifies on device and the scan is a gather + reduce (`ops/sparse.py`).
Sparse vectors support the IP metric only (`distance_helper.py:148-150`).
"""

from __future__ import annotations

import time

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.runtime import round_up
from ..ops.sparse import pad_sparse_rows, prune_sparse_query, sparse_ip_topk
from ..typing.enum import MetricType
from .interface import VectorIndexEngine
from ..model.param.param import FlatQueryParam

__all__ = ["SparseFlatEngine"]

_ROW_ALIGN = 512
_QUERY_NNZ_PAD = 64


class SparseFlatEngine(VectorIndexEngine):
    """Engine over one segment's sparse vector column."""

    query_param_class = FlatQueryParam

    def __init__(self, metric: MetricType = MetricType.IP, dimension: int = 0, params=None):
        super().__init__(MetricType.IP, dimension, params)
        self._n = 0
        self._doc_idx = None
        self._doc_val = None
        self._vocab = 1
        self._smesh = None  # collection mesh when rows are corpus-sharded

    def _mesh(self):
        from ..parallel.mesh import collection_mesh

        return collection_mesh()

    def _rebuild(self, rows: List[Optional[Dict[int, float]]]) -> None:
        self._n = len(rows)
        if self._n == 0:
            self._doc_idx = None
            return
        idx, val, vocab = pad_sparse_rows(list(rows))
        mesh = self._mesh()
        self._smesh = mesh if (mesh is not None and self._n >= _ROW_ALIGN) else None
        s_count = self._smesh.shape["corpus"] if self._smesh is not None else 1
        n_pad = round_up(self._n, _ROW_ALIGN * s_count)
        pidx = np.full((n_pad, idx.shape[1]), -1, dtype=np.int32)
        pval = np.zeros((n_pad, val.shape[1]), dtype=np.float32)
        pidx[: self._n] = idx
        pval[: self._n] = val
        if self._smesh is not None:
            # corpus-shard the padded CSR rows across the mesh; queries
            # replicate and per-shard top-k merges over ICI
            # (`parallel/mesh.py::sharded_sparse_topk`)
            import jax as _jax

            from ..parallel.mesh import corpus_sharding

            sh2 = corpus_sharding(self._smesh, 2)
            self._doc_idx = _jax.device_put(pidx, sh2)
            self._doc_val = _jax.device_put(pval, sh2)
        else:
            self._doc_idx = jnp.asarray(pidx)
            self._doc_val = jnp.asarray(pval)
        self._vocab = int(round_up(max(vocab, 1), 128))

    def _prep_query_arrays(self, queries, param=None):
        """Prune + pad sparse dict queries to (nq_bucket, pq) int32/f32
        arrays (shared by `search` and the one-program dense+sparse fused
        path, `ops/fused.py`)."""
        budget = getattr(param, "filtering_budget", 0.0) if param else 0.0
        pruned = [prune_sparse_query(q or {}, budget) for q in queries]
        pq = max(max((len(q) for q in pruned), default=1), 1)
        pq = min(round_up(pq, 8), _QUERY_NNZ_PAD * 8)
        from ..ops.runtime import bucket_queries

        nq_pad = bucket_queries(len(queries))  # stable compile shapes
        q_idx = np.full((nq_pad, pq), -1, dtype=np.int32)
        q_val = np.zeros((nq_pad, pq), dtype=np.float32)
        for i, q in enumerate(pruned):
            items = sorted(q.items(), key=lambda kv: -abs(kv[1]))[:pq]
            for j, (k, v) in enumerate(sorted(items)):
                q_idx[i, j] = k
                q_val[i, j] = v
        return q_idx, q_val

    def search(
        self,
        queries,  # list of {dim: value} dicts
        topk: int,
        mask: Optional[np.ndarray] = None,
        param=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        self._ensure_fresh()
        if isinstance(queries, dict):
            queries = [queries]
        nq = len(queries)
        self.stats.search_count += 1
        self.stats.queries_served += nq
        if self._n == 0:
            return (
                np.full((nq, topk), -np.inf, np.float32),
                np.full((nq, topk), -1, np.int64),
            )
        t0 = time.perf_counter()
        q_idx, q_val = self._prep_query_arrays(queries, param)
        n_pad = self._doc_idx.shape[0]
        full_mask = np.zeros(n_pad, dtype=bool)
        full_mask[: self._n] = True if mask is None else mask
        k = min(topk, self._n)
        if self._smesh is not None:
            import jax as _jax

            from ..parallel.mesh import corpus_sharding, sharded_sparse_topk

            sims, idx = sharded_sparse_topk(
                self._smesh,
                jnp.asarray(q_idx),
                jnp.asarray(q_val),
                self._doc_idx,
                self._doc_val,
                _jax.device_put(full_mask, corpus_sharding(self._smesh, 1)),
                topk=k,
                vocab=self._vocab,
            )
        else:
            sims, idx = sparse_ip_topk(
                jnp.asarray(q_idx),
                jnp.asarray(q_val),
                self._doc_idx,
                self._doc_val,
                jnp.asarray(full_mask),
                topk=k,
                vocab=self._vocab,
            )
        sims = np.asarray(sims)[:nq]
        idx = np.asarray(idx).astype(np.int64)[:nq]
        if k < topk:
            pad = topk - k
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = np.where(idx >= 0, sims, -np.inf)
        self.stats.total_search_secs += time.perf_counter() - t0
        return sims, idx
