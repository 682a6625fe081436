"""Sparse HNSW engine: NSW-style graph over sparse vectors.

Reference equivalent: `src/core/algorithm/hnsw_sparse/` (graph ANN over sparse
postings, IP metric). Build is batched kNN-graph construction, the same
design as the dense engine (`core/hnsw.py::_build_graph_knn`): every node
scores the whole corpus on the MXU for its exact top neighbors (no
sequential insertion), reverse edges are added host-vectorized, and each
node keeps its top-m0 by dot — IP is symmetric so reverse-edge sims come
free from the forward pass. Neighbors keep the top-M closest (the
reference's dominance prune needs candidate-candidate distances, which for
sparse rows cost more than they save — the richer entry probe set
compensates); search runs the batched sparse beam kernel with a probed
entry set.
"""

from __future__ import annotations

import os
import time as _time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..model.param.param import HnswQueryParam
from ..ops.hnsw_sparse import hnsw_sparse_search
from ..ops.runtime import NEG_INF, round_up
from ..ops.sparse import sparse_ip_topk
from ..typing.enum import MetricType
from .sparse_flat import SparseFlatEngine

__all__ = ["SparseHnswEngine"]

_BRUTE_FORCE_THRESHOLD = 1000
_ENTRY_PROBES = 32
_QUERY_NNZ_PAD = 64


def _reverse_merge_l0(
    fwd_i: np.ndarray, fwd_s: np.ndarray, n: int, m0: int
) -> np.ndarray:
    """Reverse edges + merge (host, vectorized): every forward edge
    (u, v, s) also proposes (v, u, s); keep each node's top-m0."""
    k = fwd_i.shape[1]
    src = np.repeat(np.arange(n, dtype=np.int32), k)
    dst = fwd_i.ravel()
    sim = fwd_s.ravel()
    valid = (dst >= 0) & (dst != src)
    nodes = np.concatenate([src[valid], dst[valid]])
    cands = np.concatenate([dst[valid], src[valid]])
    sims = np.concatenate([sim[valid], sim[valid]])
    # sort by (node, cand) to drop duplicate pairs, then by (node, -sim)
    order = np.lexsort((cands, nodes))
    nodes, cands, sims = nodes[order], cands[order], sims[order]
    first = np.ones(nodes.shape[0], dtype=bool)
    first[1:] = (nodes[1:] != nodes[:-1]) | (cands[1:] != cands[:-1])
    nodes, cands, sims = nodes[first], cands[first], sims[first]
    order = np.lexsort((-sims, nodes))
    nodes, cands = nodes[order], cands[order]
    start = np.searchsorted(nodes, np.arange(n, dtype=np.int32))
    rank = np.arange(nodes.shape[0], dtype=np.int64) - start[nodes]
    keep = rank < m0
    l0 = np.full((n, m0), -1, dtype=np.int32)
    l0[nodes[keep], rank[keep]] = cands[keep]
    return l0


class SparseHnswEngine(SparseFlatEngine):
    """Sparse graph engine; falls back to the exact scan below the brute-force
    threshold (inherited from SparseFlatEngine)."""

    query_param_class = HnswQueryParam

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
        if self._smesh is not None:
            self._rebuild_sharded_graph()
            return
        if (
            self._loaded_aux is not None
            and int(self._loaded_aux["n"]) == self._n
            and "shards" not in self._loaded_aux
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

    def _rebuild_sharded_graph(self) -> None:
        """Mesh scale-out: every shard owns an independent NSW subgraph over
        its contiguous global row range (the dense engine's recipe,
        `core/hnsw.py::_rebuild_sharded`); per-shard beams merge over ICI
        (`parallel/mesh.py::sharded_sparse_beam`). Neighbor ids are LOCAL to
        the shard; entry probes are per-shard local rows."""
        import jax as _jax

        from ..parallel.mesh import corpus_sharding

        mesh = self._smesh
        s_count = mesh.shape["corpus"]
        n_pad = self._doc_idx.shape[0]
        R = n_pad // s_count
        m0 = 2 * self.m
        aux = self._loaded_aux
        if (
            aux is not None
            and int(aux["n"]) == self._n
            and int(aux.get("shards", np.int64(0))) == s_count
        ):
            pl0 = aux["l0"]
            entries = aux["entries"]
        else:
            pl0 = np.full((n_pad, m0), -1, dtype=np.int32)
            entries = np.zeros(s_count * _ENTRY_PROBES, dtype=np.int32)
            rng = np.random.default_rng(0xBEEF + self._n)
            for s in range(s_count):
                lo, hi = s * R, min((s + 1) * R, self._n)
                if hi - lo <= 0:
                    continue  # empty shard: pad rows only (mask keeps it out)
                sub = self._build_graph_range(lo, hi, m0)
                pl0[lo:hi] = sub  # local ids within [0, hi-lo)
                cnt = hi - lo
                pick = rng.choice(
                    cnt, min(_ENTRY_PROBES, cnt), replace=False
                ).astype(np.int32)
                ent = np.resize(pick, _ENTRY_PROBES)
                entries[s * _ENTRY_PROBES : (s + 1) * _ENTRY_PROBES] = ent
        self._l0 = _jax.device_put(pl0, corpus_sharding(mesh, 2))
        self._entries = _jax.device_put(
            entries, corpus_sharding(mesh, 1)
        )
        self._aux_l0 = pl0
        self._aux_entries = entries

    def _build_graph_range(self, lo: int, hi: int, m0: int) -> np.ndarray:
        """kNN-graph over global rows [lo, hi): forward exact top-k restricted
        by a range mask, reverse edges host-vectorized; returns (hi-lo, m0)
        LOCAL adjacency."""
        n = hi - lo
        k = min(m0 + 1, n)
        B = 512
        n_pad = self._doc_idx.shape[0]
        range_mask = np.zeros(n_pad, dtype=bool)
        range_mask[lo:hi] = True
        mask_dev = jnp.asarray(range_mask)
        fwd_i = np.full((n, k), -1, np.int32)
        fwd_s = np.full((n, k), NEG_INF, np.float32)
        for blo in range(0, n, B):
            ids = np.minimum(np.arange(lo + blo, lo + blo + B), hi - 1)
            ids_dev = jnp.asarray(ids)
            sims, cand = sparse_ip_topk(
                jnp.take(self._doc_idx, ids_dev, axis=0),
                jnp.take(self._doc_val, ids_dev, axis=0),
                self._doc_idx,
                self._doc_val,
                mask_dev,
                topk=k,
                vocab=self._vocab,
            )
            bhi = min(blo + B, n)
            fwd_i[blo:bhi] = np.asarray(cand)[: bhi - blo]
            fwd_s[blo:bhi] = np.asarray(sims)[: bhi - blo]
        fwd_i = np.where(fwd_i >= 0, fwd_i - lo, -1).astype(np.int32)  # localize
        return _reverse_merge_l0(fwd_i, fwd_s, n, m0)

    def _build_graph(self, rows) -> np.ndarray:
        """Batched kNN-graph build: forward exact top-(m0+1) per node (one
        compiled corpus-scan program, fixed batch shape), then symmetric
        reverse edges + per-node top-m0 merge, all host-vectorized."""
        n = self._n
        m0 = 2 * self.m
        k = min(m0 + 1, n)  # +1: self lands in its own top-k
        B = 512

        # ---- forward pass: docs are their own queries (already padded) ----
        fwd_i = np.full((n, k), -1, np.int32)
        fwd_s = np.full((n, k), NEG_INF, np.float32)
        n_pad = self._doc_idx.shape[0]
        full_mask = np.zeros(n_pad, dtype=bool)
        full_mask[:n] = True
        mask_dev = jnp.asarray(full_mask)
        for lo in range(0, n, B):
            ids = np.minimum(np.arange(lo, lo + B), n - 1)
            ids_dev = jnp.asarray(ids)
            sims, cand = sparse_ip_topk(
                jnp.take(self._doc_idx, ids_dev, axis=0),
                jnp.take(self._doc_val, ids_dev, axis=0),
                self._doc_idx,
                self._doc_val,
                mask_dev,
                topk=k,
                vocab=self._vocab,
            )
            hi = min(lo + B, n)
            fwd_i[lo:hi] = np.asarray(cand)[: hi - lo]
            fwd_s[lo:hi] = np.asarray(sims)[: hi - lo]

        return _reverse_merge_l0(fwd_i, fwd_s, n, m0)

    def _queries_from_rows(self, rows):
        from ..ops.runtime import bucket_queries

        pq = max(max((len(r or {}) for r in rows), default=1), 1)
        pq = min(round_up(pq, 8), _QUERY_NNZ_PAD * 8)
        nq_pad = bucket_queries(len(rows))  # stable compile shapes
        q_idx = np.full((nq_pad, pq), -1, dtype=np.int32)
        q_val = np.zeros((nq_pad, pq), dtype=np.float32)
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

        self.stats.search_count += 1
        self.stats.queries_served += nq
        t0 = _time.perf_counter()
        ef = getattr(param, "ef", 300) if param is not None else 300
        ef = max(ef, topk)
        q_idx, q_val = self._queries_from_rows(queries)
        n_pad = self._doc_idx.shape[0]
        full_mask = np.zeros(n_pad, dtype=bool)
        full_mask[: self._n] = True if mask is None else mask
        k = min(topk, self._n)
        if self._smesh is not None:
            import jax as _jax

            from ..parallel.mesh import (
                corpus_sharding,
                sharded_sparse_beam,
                sharded_sparse_topk,
            )

            s_count = self._smesh.shape["corpus"]
            R = n_pad // s_count
            budget = jnp.int32(min(max(10000, int(0.1 * R)), R))
            dmask = _jax.device_put(full_mask, corpus_sharding(self._smesh, 1))
            sims, idx = sharded_sparse_beam(
                self._smesh,
                jnp.asarray(q_idx),
                jnp.asarray(q_val),
                self._doc_idx,
                self._doc_val,
                self._l0,
                self._entries,
                dmask,
                budget,
                ef=ef,
                topk=k,
                max_steps=ef + 64,
                vocab=self._vocab,
                frontier=4,
            )
            exact_fallback = lambda: sharded_sparse_topk(  # noqa: E731
                self._smesh,
                jnp.asarray(q_idx),
                jnp.asarray(q_val),
                self._doc_idx,
                self._doc_val,
                dmask,
                topk=k,
                vocab=self._vocab,
            )
        else:
            budget = jnp.int32(min(max(10000, int(0.1 * self._n)), self._n))
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
            exact_fallback = lambda: sparse_ip_topk(  # noqa: E731
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
        if mask is not None:
            # same safety net as dense HNSW: the ef-capped beam can strand
            # inside the query's neighborhood when the filter excludes it —
            # deficient queries get an exact masked scan over the SAME
            # (unpruned, stable-shape) query arrays the beam used
            from .interface import rescan_deficient

            sims, idx = rescan_deficient(
                sims, idx, k, full_mask[: self._n], exact_fallback
            )
        if k < topk:
            pad = topk - k
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = np.where(idx >= 0, sims, -np.inf)
        self.stats.total_search_secs += _time.perf_counter() - t0
        return sims, idx

    # ------------- persistence -------------
    def dump_aux(self, directory, prefix):
        if self._l0 is None:
            self._ensure_fresh()
        if getattr(self, "_aux_l0", None) is None:
            return {}
        fname = f"hnsw_sparse_{prefix}.npz"
        payload = {"n": np.int64(self._n), "l0": self._aux_l0}
        if self._smesh is not None:
            # sharded layout: l0 holds per-shard LOCAL ids over the padded
            # row space; a reopen with a different mesh rebuilds instead
            payload["shards"] = np.int64(self._smesh.shape["corpus"])
            payload["entries"] = self._aux_entries
        np.savez_compressed(os.path.join(directory, fname), **payload)
        return {"file": fname, "type": "hnsw_sparse", "m": self.m}

    def load_aux(self, directory, descriptor):
        path = os.path.join(directory, descriptor.get("file", ""))
        if os.path.exists(path):
            self._loaded_aux = dict(np.load(path))
