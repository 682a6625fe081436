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
        hint = getattr(self, "_entry_hint", None)
        if hint is None and self._loaded_aux is not None:
            ent = self._loaded_aux.get("entries")
            if ent is not None and "shards" not in self._loaded_aux:
                hint = np.asarray(ent)
        if hint is not None and len(hint):
            # clustered build: probe per-cluster medoids (coverage of every
            # topic component) instead of random rows
            self._entries = jnp.asarray(hint.astype(np.int32))
        else:
            rng = np.random.default_rng(0xBEEF + self._n)
            self._entries = jnp.asarray(
                rng.choice(
                    self._n, min(_ENTRY_PROBES, self._n), replace=False
                ).astype(np.int32)
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
        reverse edges + per-node top-m0 merge, all host-vectorized.

        Past ~200k docs the full-corpus scan is quadratic with NO MXU path
        (gather-based sparse scoring rides the VPU) — the clustered
        signature build takes over (`_build_graph_clustered`);
        ZVEC_SPARSE_CLUSTERED=1/0 forces/disables."""
        n = self._n
        env = os.environ
        forced = env.get("ZVEC_SPARSE_CLUSTERED")
        if forced == "1" or (
            n >= int(env.get("ZVEC_SPARSE_CLUSTERED_N", "200000"))
            and forced != "0"
        ):
            return self._build_graph_clustered()
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

    def _build_graph_clustered(self) -> np.ndarray:
        """Scalable kNN-graph candidates for 1M+ docs: every doc gets a
        dense MXU-friendly twin via feature-hash signatures
        (`ops/sparse.sparse_signatures`, sig(a).sig(b) ~= a.b), and the
        DENSE engine's clustered machinery is reused verbatim on them —
        k-means buckets + top-2 spilled assignment (`assign_top2_blocked`)
        + per-bucket exact scoring (`bucket_knn_all`). Proposed candidates
        are re-scored with EXACT sparse dots, expanded one
        neighbor-of-neighbor round (NN-descent repair of signature noise
        and bucket-boundary misses), and reverse-merged.

        Replaces the O(N^2) full-corpus scan, which has no MXU path
        (gather-based scoring is VPU-bound: ~10h at 1M docs vs minutes
        here). Reference analog: the hnsw_sparse builder's posting-driven
        candidate generation (`src/core/algorithm/hnsw_sparse/`,
        streamer_entity ~1001)."""
        from ..ops.hnsw import assign_top2_blocked, bucket_knn_all
        from ..ops.kmeans import lloyd
        from ..ops.sparse import sparse_signatures

        n, m0 = self._n, 2 * self.m
        k = min(m0 + 1, n)
        log = os.environ.get("ZVEC_BUILD_LOG") == "1"
        t0 = _time.perf_counter()

        SIG = 256
        sig = sparse_signatures(self._doc_idx, self._doc_val, SIG)[:n]
        sig_dev = jnp.asarray(sig)
        norms_dev = jnp.asarray(np.einsum("ij,ij->i", sig, sig))
        if log:
            print(
                f"[sparse-build] signatures in {_time.perf_counter() - t0:.1f}s",
                flush=True,
            )

        rng = np.random.default_rng(0x5BA5)
        K = int(min(16384, max(64, n // 1250), n // 4))
        sub_n = min(262_144, n)
        sub = sig[rng.choice(n, sub_n, replace=False)]
        seeds = sig[rng.choice(n, K, replace=False)]
        cents, _ = lloyd(
            jnp.asarray(sub), jnp.asarray(seeds), iters=6,
            block=min(16384, sub_n),
        )
        asn = np.asarray(assign_top2_blocked(sig_dev, cents, block=16384))[:n]
        if log:
            print(
                f"[sparse-build] kmeans+assign (K={K}) in "
                f"{_time.perf_counter() - t0:.1f}s",
                flush=True,
            )

        # bucket pack (host): primary + spill members, like the dense path
        sizes = np.bincount(asn[:, 0], minlength=K) + np.bincount(
            asn[:, 1], minlength=K
        )
        mp = int(
            min(8192, max(256, -(-int(np.percentile(sizes, 98)) // 128) * 128))
        )
        rows_bkt = np.full((K, mp), -1, np.int32)
        slot_bkt = np.zeros((K, mp), np.int32)
        fill = np.zeros(K, np.int64)
        for s in (0, 1):
            order = np.argsort(asn[:, s], kind="stable")
            clusters = asn[order, s]
            bounds = np.searchsorted(clusters, np.arange(K + 1))
            for c in range(K):
                lo, hi = bounds[c], bounds[c + 1]
                take = min(hi - lo, mp - fill[c])
                if take <= 0:
                    continue
                rows_bkt[c, fill[c] : fill[c] + take] = order[lo : lo + take]
                slot_bkt[c, fill[c] : fill[c] + take] = s
                fill[c] += take

        kc = max(32, min(64, m0))
        cand = jnp.full((n + 1, 2 * kc), -1, jnp.int32)
        CH = 1024
        for lo in range(0, K, CH):
            cand = bucket_knn_all(
                jnp.asarray(rows_bkt[lo : lo + CH]),
                jnp.asarray(slot_bkt[lo : lo + CH]),
                cand,
                sig_dev,
                norms_dev,
                metric=MetricType.IP,
                kc=kc,
            )
        cand_host = np.asarray(cand)[:n]
        del cand, sig_dev, norms_dev
        if log:
            print(
                f"[sparse-build] bucket candidates in "
                f"{_time.perf_counter() - t0:.1f}s",
                flush=True,
            )

        # exact sparse rescore of the signature-proposed candidates, then
        # one neighbor-of-neighbor expansion round re-scored the same way
        fwd_i, fwd_s = self._rescore_topk_batched(cand_host, k)
        rounds = int(os.environ.get("ZVEC_SPARSE_NND", "1"))
        expand = min(2, fwd_i.shape[1])
        for _ in range(rounds):
            # candidates = own edges U edges of the `expand` best neighbors
            nn2 = [
                np.where(
                    fwd_i[:, e : e + 1] >= 0,
                    fwd_i[np.clip(fwd_i[:, e], 0, None)],
                    -1,
                )
                for e in range(expand)
            ]
            ext = np.concatenate([fwd_i] + nn2, axis=1)
            fwd_i, fwd_s = self._rescore_topk_batched(ext, k)
        if log:
            print(
                f"[sparse-build] exact rescore+expand in "
                f"{_time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        l0 = _reverse_merge_l0(fwd_i, fwd_s, n, m0)

        # Entry coverage: a kNN graph over well-separated topic clusters is
        # DISCONNECTED, and random entry probes miss whole clusters
        # (P(no entry in a 1/T-mass cluster) = (1-1/T)^probes — measured
        # recall 0.4 at T=40 with 32 random entries vs 0.93 graph-edge
        # recall). Stash per-cluster medoids (member with the highest
        # signature dot to its primary centroid) as the entry hint; _rebuild
        # probes these instead of random rows. Teleport edges in the last 2
        # slots give the beam an escape hatch (dense-build recipe).
        cents_h = np.asarray(cents)
        ce = cents_h[asn[:, 0]]
        med_score = np.einsum("ij,ij->i", sig, ce)
        order = np.argsort(asn[:, 0], kind="stable")
        bounds = np.searchsorted(asn[order, 0], np.arange(K + 1))
        medoids = []
        csizes = []
        for c in range(K):
            lo, hi = bounds[c], bounds[c + 1]
            if hi <= lo:
                continue
            members = order[lo:hi]
            medoids.append(members[np.argmax(med_score[members])])
            csizes.append(hi - lo)
        med = np.asarray(medoids, np.int32)
        # biggest clusters first; cap the probe set
        med = med[np.argsort(-np.asarray(csizes))][: max(_ENTRY_PROBES, 128)]
        self._entry_hint = med
        if n > 2048 and m0 >= 8 and l0.shape[1] >= 4:
            rng_t = np.random.default_rng(0x5BA6)
            rand = (
                np.arange(n, dtype=np.int64)[:, None]
                + rng_t.integers(1, n, (n, 2))
            ) % n
            l0[:, -2:] = rand.astype(np.int32)
        return l0

    def _rescore_topk_batched(self, cand_host: np.ndarray, k: int):
        """EXACT sparse top-k over proposed candidates, batched on device:
        (n, C) candidate ids -> (fwd_i (n, k), fwd_s (n, k)), dup/self
        masked. Pads the node-batch tail by repeating the last row (one
        compiled program)."""
        import jax

        from ..ops.hnsw import _dup_mask
        from ..ops.sparse import sparse_ip_rows

        n = cand_host.shape[0]
        B = 1024
        fwd_i = np.full((n, k), -1, np.int32)
        fwd_s = np.full((n, k), NEG_INF, np.float32)
        doc_idx, doc_val, vocab = self._doc_idx, self._doc_val, self._vocab

        @jax.jit
        def rescore(node_ids, cand_ids):
            qi = doc_idx[node_ids]
            qv = doc_val[node_ids]
            safe = jnp.clip(cand_ids, 0, None)
            sims = sparse_ip_rows(
                qi, qv, doc_idx[safe], doc_val[safe], vocab=vocab
            )
            valid = (cand_ids >= 0) & (cand_ids != node_ids[:, None])
            sims = jnp.where(valid, sims, NEG_INF)
            order = jnp.argsort(-sims, axis=1)
            ids_o = jnp.take_along_axis(cand_ids, order, 1)
            sims_o = jnp.take_along_axis(sims, order, 1)
            keep = sims_o > NEG_INF / 2
            keep = keep & ~_dup_mask(ids_o)
            sims_o = jnp.where(keep, sims_o, NEG_INF)
            ids_o = jnp.where(keep, ids_o, -1)
            # kept-first re-compaction: duplicates were voided above, so the
            # top-k slice must skip them, not count them
            rank = jnp.argsort(~keep, axis=1, stable=True)
            ids_c = jnp.take_along_axis(ids_o, rank, 1)[:, :k]
            sims_c = jnp.take_along_axis(sims_o, rank, 1)[:, :k]
            return sims_c, ids_c

        # fetch one batch behind dispatch: the tunnel charges ~1s latency
        # per synchronous round trip — 977 batches at 1M would serialize
        # into ~16 min of pure latency otherwise
        pending = None
        for lo in range(0, n, B):
            rows = np.arange(lo, lo + B, dtype=np.int32)
            rows = np.minimum(rows, n - 1)
            out = rescore(jnp.asarray(rows), jnp.asarray(cand_host[rows]))
            if pending is not None:
                plo, phi, (ps, pi) = pending
                fwd_i[plo:phi] = np.asarray(pi)[: phi - plo]
                fwd_s[plo:phi] = np.asarray(ps)[: phi - plo]
            pending = (lo, min(lo + B, n), out)
        if pending is not None:
            plo, phi, (ps, pi) = pending
            fwd_i[plo:phi] = np.asarray(pi)[: phi - plo]
            fwd_s[plo:phi] = np.asarray(ps)[: phi - plo]
        return fwd_i, fwd_s

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
        hint = getattr(self, "_entry_hint", None)
        if hint is not None and len(hint) and self._smesh is None:
            # clustered-build medoid entries must survive reopen: random
            # re-probes on a topic-clustered graph lose whole components
            payload["entries"] = np.asarray(hint, np.int32)
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
