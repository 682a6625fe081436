"""Sparse HNSW engine: NSW-style graph over sparse vectors.

Reference equivalent: `src/core/algorithm/hnsw_sparse/` (graph ANN over sparse
postings, IP metric). Build inserts in growing chunks with exact sparse-scan
candidates (device `sparse_ip_topk`); neighbors keep the top-M closest
(the reference's prune rule needs candidate-candidate distances, which for
sparse rows cost more than they save — the richer entry probe set compensates);
search runs the batched sparse beam kernel with a probed entry set.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..model.param.param import HnswQueryParam
from ..ops.hnsw_sparse import hnsw_sparse_search
from ..ops.runtime import round_up
from ..ops.sparse import pad_sparse_rows, sparse_ip_topk
from ..typing.enum import MetricType
from .sparse_flat import SparseFlatEngine

__all__ = ["SparseHnswEngine"]

_BRUTE_FORCE_THRESHOLD = 1000
_ENTRY_PROBES = 32
_QUERY_NNZ_PAD = 64


class SparseHnswEngine(SparseFlatEngine):
    """Sparse graph engine; falls back to the exact scan below the brute-force
    threshold (inherited from SparseFlatEngine)."""

    def __init__(self, metric: MetricType = MetricType.IP, dimension: int = 0, params=None):
        super().__init__(metric, dimension, params)
        self.m = getattr(params, "m", 16) if params is not None else 16
        self.ef_construction = (
            getattr(params, "ef_construction", 200) if params is not None else 200
        )
        self._l0 = None
        self._entries = None
        self._loaded_aux = None

    # ------------- build -------------
    def _rebuild(self, rows: List[Optional[Dict[int, float]]]) -> None:
        super()._rebuild(rows)
        if self._n < _BRUTE_FORCE_THRESHOLD:
            self._l0 = None
            return
        if (
            self._loaded_aux is not None
            and int(self._loaded_aux["n"]) == self._n
        ):
            l0 = self._loaded_aux["l0"]
        else:
            l0 = self._build_graph(rows)
        n_pad = self._doc_idx.shape[0]
        m0 = l0.shape[1]
        pl0 = np.full((n_pad, m0), -1, dtype=np.int32)
        pl0[: self._n] = l0
        self._l0 = jnp.asarray(pl0)
        rng = np.random.default_rng(0xBEEF + self._n)
        self._entries = jnp.asarray(
            rng.choice(self._n, min(_ENTRY_PROBES, self._n), replace=False).astype(
                np.int32
            )
        )
        self._aux_l0 = l0

    def _build_graph(self, rows) -> np.ndarray:
        n = self._n
        m0 = 2 * self.m
        l0 = np.full((n, m0), -1, dtype=np.int32)
        fill = np.zeros(n, dtype=np.int32)
        efc = self.ef_construction

        # chunked insertion with exact candidates over current prefix
        pos = 1
        while pos < n:
            chunk = int(min(1024, max(64, pos // 2)))
            chunk = min(chunk, n - pos)
            new_ids = np.arange(pos, pos + chunk)
            # exact top-efc over already-inserted docs (prefix mask keeps
            # shapes static so the scan compiles once)
            q_idx, q_val = self._queries_from_rows([rows[i] for i in new_ids])
            k = min(efc, n)
            prefix_mask = np.zeros(self._doc_idx.shape[0], dtype=bool)
            prefix_mask[:pos] = True
            sims, cand = sparse_ip_topk(
                jnp.asarray(q_idx),
                jnp.asarray(q_val),
                self._doc_idx,
                self._doc_val,
                jnp.asarray(prefix_mask),
                topk=k,
                vocab=self._vocab,
            )
            cand = np.asarray(cand)
            sims = np.asarray(sims)
            bad = (cand < 0) | (cand >= pos)
            cand = np.where(bad, -1, cand)

            for bi, node in enumerate(new_ids):
                sel = cand[bi][cand[bi] >= 0][:m0]
                l0[node, : len(sel)] = sel
                fill[node] = len(sel)
                # reverse links
                for nbr in sel:
                    if fill[nbr] < m0:
                        l0[nbr, fill[nbr]] = node
                        fill[nbr] += 1
                    else:
                        # overflow: keep the m0 best by dot to the base
                        cands = np.append(l0[nbr], node)
                        base = rows[nbr] or {}
                        dots = np.asarray(
                            [
                                _dict_dot(base, rows[c] or {})
                                for c in cands
                            ]
                        )
                        keep = cands[np.argsort(-dots, kind="stable")[:m0]]
                        l0[nbr] = keep
            pos += chunk
        return l0

    def _queries_from_rows(self, rows):
        pq = max(max((len(r or {}) for r in rows), default=1), 1)
        pq = min(round_up(pq, 8), _QUERY_NNZ_PAD * 8)
        q_idx = np.full((len(rows), pq), -1, dtype=np.int32)
        q_val = np.zeros((len(rows), pq), dtype=np.float32)
        for i, r in enumerate(rows):
            items = sorted((r or {}).items(), key=lambda kv: -abs(kv[1]))[:pq]
            for j, (k, v) in enumerate(sorted(items)):
                q_idx[i, j] = k
                q_val[i, j] = v
        return q_idx, q_val

    # ------------- search -------------
    def search(self, queries, topk, mask=None, param=None):
        self._ensure_fresh()
        if isinstance(queries, dict):
            queries = [queries]
        nq = len(queries)
        is_linear = bool(getattr(param, "is_linear", False))
        if self._l0 is None or is_linear or self._n < _BRUTE_FORCE_THRESHOLD:
            return super().search(queries, topk, mask, param)

        ef = getattr(param, "ef", 300) if param is not None else 300
        ef = max(ef, topk)
        q_idx, q_val = self._queries_from_rows(queries)
        n_pad = self._doc_idx.shape[0]
        full_mask = np.zeros(n_pad, dtype=bool)
        full_mask[: self._n] = True if mask is None else mask
        budget = jnp.int32(min(max(10000, int(0.1 * self._n)), self._n))
        k = min(topk, self._n)
        sims, idx = hnsw_sparse_search(
            jnp.asarray(q_idx),
            jnp.asarray(q_val),
            self._doc_idx,
            self._doc_val,
            self._l0,
            self._entries,
            jnp.asarray(full_mask),
            budget,
            ef=ef,
            topk=k,
            max_steps=ef + 64,
            vocab=self._vocab,
            frontier=4,
        )
        sims = np.asarray(sims)
        idx = np.asarray(idx).astype(np.int64)
        if k < topk:
            pad = topk - k
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = np.where(idx >= 0, sims, -np.inf)
        return sims, idx

    # ------------- persistence -------------
    def dump_aux(self, directory, prefix):
        if self._l0 is None:
            self._ensure_fresh()
        if getattr(self, "_aux_l0", None) is None:
            return {}
        fname = f"hnsw_sparse_{prefix}.npz"
        np.savez_compressed(
            os.path.join(directory, fname),
            n=np.int64(self._n),
            l0=self._aux_l0,
        )
        return {"file": fname, "type": "hnsw_sparse", "m": self.m}

    def load_aux(self, directory, descriptor):
        path = os.path.join(directory, descriptor.get("file", ""))
        if os.path.exists(path):
            self._loaded_aux = dict(np.load(path))


def _dict_dot(a: Dict[int, float], b: Dict[int, float]) -> float:
    if len(b) < len(a):
        a, b = b, a
    return sum(v * b.get(k, 0.0) for k, v in a.items())
