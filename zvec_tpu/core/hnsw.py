"""HNSW engine: device-accelerated batch build + batched beam search.

Reference behavior being reproduced (`src/core/algorithm/hnsw/`):
  - level sampling: faiss-style geometric probas with mult = 1/ln(scaling_factor),
    scaling_factor = M (`hnsw_algorithm.h:51-80`, `hnsw_streamer.cc:50`)
  - degrees: upper M, level-0 2*M (`hnsw_entity.h:519`)
  - neighbor selection: best-first pairwise pruning + reverse-link updates with
    re-prune on overflow (`hnsw_algorithm.cc:394-510`)
  - search: ef=1 greedy descent, beam at L0 with ef, filter applied at
    result-insert, scan budget = clamp(max_scan_ratio * N, min_scan_limit, ...)
    (`hnsw_algorithm.cc:83-278`, defaults `hnsw_entity.h:500-513`)
  - brute-force below threshold (default 1000 docs, `hnsw_entity.h:511`)

TPU-native build strategy: nodes are inserted in growing chunks; all chunk
nodes' candidate searches run as ONE batched device program over the current
graph (upper-level candidates come from exact brute-force over the level's
few members — cheaper and higher-recall than per-node graph walks), and both
forward neighbor selection and reverse-link re-pruning run as batched pairwise
kernels (`select_neighbors_batch`). The host only scatters adjacency rows.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..model.param.param import HnswQueryParam, QueryParam
from ..ops.hnsw import hnsw_search, select_neighbors_batch, select_neighbors_ids
from ..ops.quantize import (
    QuantParams,
    decode,
    encode,
    mips_augment,
    mips_augment_query,
    train_quantizer,
)
from ..ops.runtime import round_up
from ..ops.topk import blockwise_topk_search
from ..typing.enum import IndexType, MetricType, QuantizeType
from .interface import VectorIndexEngine, register_engine
from .refiner import refine

__all__ = ["HnswEngine"]

_BRUTE_FORCE_THRESHOLD = 1000  # kDefaultBruteForceThreshold
_MAX_SCAN_RATIO = 0.1  # kDefaultScanRatio
_MIN_SCAN_LIMIT = 10000  # kDefaultMinScanLimit
_PRUNE_CAND_CAP = 128  # pairwise-prune candidate cap (device memory bound)
_ROW_ALIGN = 128


class _Graph:
    """Host-side adjacency being built; device copies derived on demand."""

    def __init__(self, n: int, m: int):
        self.m = m
        self.m0 = 2 * m
        self.levels = np.zeros(n, dtype=np.int32)
        self.l0 = np.full((n, self.m0), -1, dtype=np.int32)
        # per upper level: ids (np array), nbrs (rows into same level), row_of (id -> row)
        self.upper_ids: List[np.ndarray] = []
        self.upper_nbrs: List[np.ndarray] = []
        self.row_of: List[Dict[int, int]] = []
        self.entry_point = -1
        self.max_level = -1


@register_engine(IndexType.HNSW)
class HnswEngine(VectorIndexEngine):
    def __init__(self, metric: MetricType, dimension: int, params=None):
        super().__init__(metric, dimension, params)
        self.m = params.m if params is not None else 50
        self.ef_construction = params.ef_construction if params is not None else 500
        self._search_metric = self.metric  # set per-build (MIPS augments IP)
        self._mips = False
        self._mips_max_norm2 = 0.0
        self.quantize = (
            QuantizeType(params.quantize_type)
            if params is not None
            else QuantizeType.UNDEFINED
        )
        # chunked-build schedule: chunk = min(cap, cur/divisor). Larger chunks
        # cut tunnel round trips; smaller ones improve graph quality (nodes in
        # one chunk don't see each other during insertion).
        self.build_chunk_cap = 4096
        self.build_chunk_divisor = 4
        self._graph: Optional[_Graph] = None
        self._n = 0
        # device state
        self._codes = None
        self._norms = None
        self._dequant = None
        self._qparams: Optional[QuantParams] = None
        self._dev = None  # dict of device graph arrays
        self._loaded_aux: Optional[Dict[str, np.ndarray]] = None

    # ------------- build -------------
    def _rebuild(self, data: np.ndarray) -> None:
        data = np.asarray(data, dtype=np.float32)
        self._n = data.shape[0]
        if self._n == 0:
            self._dev = None
            return
        # MIPS -> L2 augmentation: IP is not a metric, so the graph is built
        # and traversed in the augmented L2 space where L2-NN ranking equals
        # IP ranking (reference MipsConverter/MipsSquaredEuclidean,
        # `mips_converter.cc:657`). Similarities convert back at the boundary.
        # Derived from self.metric (not the previous _search_metric) so a
        # second rebuild of the same engine re-augments correctly.
        self._mips = self.metric == MetricType.IP
        self._search_metric = MetricType.L2 if self._mips else self.metric
        if self._mips:
            data, self._mips_max_norm2 = mips_augment(data)
        n_pad = round_up(self._n, _ROW_ALIGN)
        padded = np.zeros((n_pad, data.shape[1]), np.float32)
        padded[: self._n] = data
        self._codes = jnp.asarray(padded)
        self._norms = jnp.sum(self._codes * self._codes, axis=-1)

        if self._loaded_aux is not None and self._loaded_aux["n"] == self._n:
            self._graph = _graph_from_aux(self._loaded_aux, self.m)
        if self._graph is None or self._graph.levels.shape[0] != self._n:
            self._graph = self._build_graph(data)
        self._dev = self._device_graph(self._graph)
        # storage codes: graph is built on fp32; search scores quantized codes
        # with dequant fused (quantized converter/reformer semantics)
        if self.quantize != QuantizeType.UNDEFINED:
            store = data
            if self._search_metric == MetricType.COSINE:
                nrm = np.linalg.norm(store, axis=1, keepdims=True)
                store = np.where(nrm > 0, store / np.where(nrm > 0, nrm, 1.0), store)
            if self.quantize in (QuantizeType.INT8, QuantizeType.INT4):
                self._qparams = train_quantizer(store, self.quantize)
                codes = encode(store, self.quantize, self._qparams)
                self._dequant = (
                    jnp.float32(self._qparams.scale),
                    jnp.float32(self._qparams.bias),
                )
            else:
                codes = store.astype(np.float16)
            padded_c = np.zeros((n_pad, codes.shape[1]), dtype=codes.dtype)
            padded_c[: self._n] = codes
            deq = decode(padded_c, self._qparams)
            self._norms = jnp.asarray((deq.astype(np.float32) ** 2).sum(1))
            if self.quantize == QuantizeType.INT4:
                # nibble-packed HBM residency: halves gather + scan bandwidth
                # vs int8 (`integer_quantizer_converter.cc:596-607`)
                from ..ops.quantize import pack_int4

                padded_c = pack_int4(padded_c)
                self._int4_packed = True
            self._codes = jnp.asarray(padded_c)

    def _device_graph(self, g: _Graph) -> Dict[str, Any]:
        upper_ids, upper_nbrs, upper_down = [], [], []
        for lvl in range(len(g.upper_ids)):
            ids = g.upper_ids[lvl]
            upper_ids.append(jnp.asarray(ids))
            upper_nbrs.append(jnp.asarray(g.upper_nbrs[lvl]))
            if lvl == 0:
                down = ids  # level-1 drops to node ids at L0
            else:
                row_below = g.row_of[lvl - 1]
                down = np.asarray([row_below[int(i)] for i in ids], dtype=np.int32)
            upper_down.append(jnp.asarray(down))
        # entry rows per level: row of entry_point at each level (index L = top)
        entry_rows = np.zeros(len(g.upper_ids) + 1, dtype=np.int32)
        entry_rows[0] = max(g.entry_point, 0)
        for lvl in range(len(g.upper_ids)):
            entry_rows[lvl + 1] = g.row_of[lvl].get(int(g.entry_point), 0)
        return {
            "l0": jnp.asarray(g.l0),
            "upper_ids": tuple(upper_ids),
            "upper_nbrs": tuple(upper_nbrs),
            "upper_down": tuple(upper_down),
            "entry_rows": jnp.asarray(entry_rows),
            "num_levels": len(g.upper_ids),
        }

    def _build_graph(self, data: np.ndarray) -> _Graph:
        n, d = data.shape
        g = _Graph(n, self.m)
        # deterministic level sampling (reference uses a seeded mt19937)
        rng = np.random.default_rng(0x5EED + n)
        mult = 1.0 / np.log(self.m)
        u = rng.random(n)
        g.levels = np.minimum(
            (-np.log(np.maximum(u, 1e-12)) * mult).astype(np.int32), 10
        )
        g.max_level = int(g.levels.max(initial=0))
        for lvl in range(1, g.max_level + 1):
            member_mask = g.levels >= lvl
            ids = np.nonzero(member_mask)[0].astype(np.int32)
            g.upper_ids.append(ids)
            g.upper_nbrs.append(np.full((len(ids), self.m), -1, dtype=np.int32))
            g.row_of.append({int(v): i for i, v in enumerate(ids)})
        g.entry_point = (
            int(g.upper_ids[-1][0]) if g.max_level >= 1 else 0
        )

        norms = (data.astype(np.float32) ** 2).sum(1)
        self._build_dev_cache = None
        self._level_codes_cache = {}
        self._row_of_cache = {}

        # chunked insertion; L0 adjacency stays device-resident with
        # touched-row updates (full re-upload is the 1M-build bottleneck)
        self._l0_dev = None
        pos = 1  # node 0 seeds the graph
        dev_stale = True
        dev = None
        while pos < n:
            cur = pos
            chunk = int(min(self.build_chunk_cap, max(32, cur // self.build_chunk_divisor)))
            chunk = min(chunk, n - pos)
            new_ids = np.arange(pos, pos + chunk, dtype=np.int32)

            # ---- L0 candidates via batched beam search over current graph ----
            qs = data[new_ids]
            efc = self.ef_construction
            if cur <= max(_BRUTE_FORCE_THRESHOLD, efc):
                # full visibility incl. the chunk itself: sequential-insert
                # parity for the early graph (nodes may link within the chunk;
                # the reference inserts one-by-one so node i sees all j<i)
                vis = cur + chunk
                n_bkt = 1 << max(int(np.ceil(np.log2(vis))), 5)
                n_bkt = min(n_bkt, n)
                prefix = np.zeros(n_bkt, dtype=bool)
                prefix[: min(vis, n_bkt)] = True
                q_bkt = 1 << max(int(np.ceil(np.log2(chunk))), 5)
                qs_p = np.zeros((q_bkt, d), np.float32)
                qs_p[:chunk] = qs
                sims, ids = blockwise_topk_search(
                    jnp.asarray(qs_p),
                    jnp.asarray(data[:n_bkt]),
                    self._search_metric,
                    min(efc, n_bkt),
                    mask=jnp.asarray(prefix),
                )
                sims = np.asarray(sims)[:chunk]
                ids = np.asarray(ids)[:chunk]
                self_hit = ids == new_ids[:, None]
                sims = np.where(self_hit, -np.inf, sims)
                ids = np.where(self_hit, -1, ids)
            else:
                if dev_stale or dev is None:
                    self._graph = g
                    dev = self._device_graph_partial(g, cur)
                    dev_stale = False
                budget = jnp.int32(efc * self.m0_out())
                # pad the chunk to a fixed bucket: stable shapes = one compile
                q_bucket = 128 if chunk <= 128 else (1024 if chunk <= 1024 else 4096)
                qs_pad = np.zeros((q_bucket, qs.shape[1]), np.float32)
                qs_pad[:chunk] = qs
                if self._l0_dev is None:
                    self._l0_dev = jnp.asarray(g.l0)
                sims, ids = hnsw_search(
                    jnp.asarray(qs_pad),
                    self._codes_np(data),
                    self._norms_np(norms),
                    self._l0_dev,
                    dev["upper_ids"],
                    dev["upper_nbrs"],
                    dev["upper_down"],
                    dev["entry_rows"],
                    None,
                    budget,
                    metric=self._search_metric,
                    ef=efc,
                    topk=efc,
                    max_steps=efc // 2 + 64,
                    num_levels=dev["num_levels"],
                    frontier=4,
                )
                sims, ids = np.asarray(sims)[:chunk], np.asarray(ids)[:chunk]
                # guard: mask out not-yet-inserted nodes (>= cur)
                bad = (ids >= cur) | (ids < 0)
                sims = np.where(bad, -np.inf, sims)
                ids = np.where(bad, -1, ids)
                # intra-chunk candidates: exact top-k of the chunk vs itself,
                # merged (desc by sim) with the beam candidates before pruning.
                # Sequential insertion lets node i link to earlier chunk-mates;
                # the batched build recovers that with one extra device matmul.
                k_intra = min(self.m0_out(), chunk)
                s_i, i_i = blockwise_topk_search(
                    jnp.asarray(qs_pad),
                    jnp.asarray(qs_pad),
                    self._search_metric,
                    min(k_intra + 1, q_bucket),
                    mask=jnp.asarray(np.arange(q_bucket) < chunk),
                )
                s_i = np.asarray(s_i)[:chunk]
                i_i = np.asarray(i_i)[:chunk]
                ids_i = np.where(i_i >= 0, i_i + pos, -1)
                self_hit = ids_i == new_ids[:, None]
                s_i = np.where(self_hit | (ids_i < 0), -np.inf, s_i)
                ids_i = np.where(self_hit, -1, ids_i)
                sims = np.concatenate([sims, s_i], axis=1)
                ids = np.concatenate([ids, ids_i], axis=1)
                order_m = np.argsort(-sims, axis=1, kind="stable")
                sims = np.take_along_axis(sims, order_m, 1)
                ids = np.take_along_axis(ids, order_m, 1)

            # ---- forward selection at L0 ----
            sel_ids, sel_sims = self._prune_batch(
                data, norms, new_ids, ids, sims, self.m0_out()
            )
            for bi, node in enumerate(new_ids):
                chosen = sel_ids[bi]
                g.l0[node, : len(chosen)] = chosen

            # ---- reverse links at L0 ----
            touched = self._reverse_link_batch(
                data, norms, g, new_ids, sel_ids, sel_sims
            )
            rows = np.asarray(new_ids, dtype=np.int64)
            if touched is not None:
                rows = np.union1d(rows, touched)
            self._l0_dev_update(g, rows)

            # ---- upper levels: exact candidates over level members ----
            for lvl in range(1, g.max_level + 1):
                li = lvl - 1
                in_chunk = new_ids[g.levels[new_ids] >= lvl]
                if len(in_chunk) == 0:
                    continue
                members = g.upper_ids[li]
                # include in-chunk members: candidates are exact over the
                # level, so this matches sequential-insertion visibility
                n_existing = int(np.searchsorted(members, cur + chunk))
                if n_existing <= 1:
                    continue
                # cached full-size member codes + inserted-prefix mask:
                # stable shapes, one compile per level
                if li not in self._level_codes_cache:
                    m_pad = round_up(len(members), 128)
                    mc = np.zeros((m_pad, d), np.float32)
                    mc[: len(members)] = data[members]
                    self._level_codes_cache[li] = jnp.asarray(mc)
                mcodes = self._level_codes_cache[li]
                prefix = np.zeros(mcodes.shape[0], dtype=bool)
                prefix[:n_existing] = True
                qc_bkt = 1 << max(int(np.ceil(np.log2(len(in_chunk)))), 3)
                qc = np.zeros((qc_bkt, d), np.float32)
                qc[: len(in_chunk)] = data[in_chunk]
                k = min(efc, mcodes.shape[0])
                s2, i2 = blockwise_topk_search(
                    jnp.asarray(qc),
                    mcodes,
                    self._search_metric,
                    k,
                    mask=jnp.asarray(prefix),
                )
                s2 = np.asarray(s2)[: len(in_chunk)]
                i2 = np.asarray(i2)[: len(in_chunk)]
                cand_ids = np.where(i2 >= 0, members[np.clip(i2, 0, None)], -1)
                self_hit = cand_ids == in_chunk[:, None]
                s2 = np.where(self_hit, -np.inf, s2)
                cand_ids = np.where(self_hit, -1, cand_ids)
                sel2, ssim2 = self._prune_batch(
                    data, norms, in_chunk, cand_ids, s2, self.m
                )
                row_of = g.row_of[li]
                nbrs_l = g.upper_nbrs[li]
                for bi, node in enumerate(in_chunk):
                    rows = [row_of[int(c)] for c in sel2[bi]]
                    nbrs_l[row_of[int(node)], : len(rows)] = rows
                self._reverse_link_upper(
                    data, norms, g, li, in_chunk, sel2, ssim2
                )
            pos += chunk
            dev_stale = True
        return g

    # small helpers keeping device uploads cached across chunks
    _codes_cache = None

    def _codes_np(self, data):
        if self._codes is not None and self._codes.shape[0] >= data.shape[0]:
            return self._codes
        if self._codes_cache is None:
            n_pad = round_up(data.shape[0], _ROW_ALIGN)
            padded = np.zeros((n_pad, data.shape[1]), np.float32)
            padded[: data.shape[0]] = data
            self._codes_cache = jnp.asarray(padded)
        return self._codes_cache

    _norms_cache = None

    def _norms_np(self, norms):
        if self._norms is not None and self._norms.shape[0] >= norms.shape[0]:
            return self._norms
        if self._norms_cache is None:
            n_pad = round_up(norms.shape[0], _ROW_ALIGN)
            padded = np.zeros(n_pad, np.float32)
            padded[: norms.shape[0]] = norms
            self._norms_cache = jnp.asarray(padded)
        return self._norms_cache

    def m0_out(self) -> int:
        return 2 * self.m

    def _device_graph_partial(self, g: _Graph, cur: int) -> Dict[str, Any]:
        """Device graph view during build: FULL-SIZE per-level arrays (levels
        are pre-assigned, so final shapes are known upfront — constant shapes
        mean the build search compiles once per live top level). Rows of
        not-yet-inserted nodes have no inbound edges and stay unreachable;
        only the entry point must be an already-inserted member."""
        if not hasattr(self, "_build_dev_cache") or self._build_dev_cache is None:
            upper_ids, upper_down, row_of_arr = [], [], []
            prev_row_of = None
            for lvl in range(len(g.upper_ids)):
                ids = g.upper_ids[lvl]
                row_of = np.full(g.levels.shape[0], -1, np.int32)
                row_of[ids] = np.arange(len(ids), dtype=np.int32)
                if lvl == 0:
                    down = ids
                else:
                    down = prev_row_of[ids]
                upper_ids.append(jnp.asarray(ids))
                upper_down.append(jnp.asarray(down))
                row_of_arr.append(row_of)
                prev_row_of = row_of
            self._build_dev_cache = {
                "upper_ids": tuple(upper_ids),
                "upper_down": tuple(upper_down),
                "row_of": row_of_arr,
            }
        cache = self._build_dev_cache

        # live top level = highest level with an inserted member
        top_level = 0
        for lvl in range(len(g.upper_ids)):
            if (g.upper_ids[lvl] < cur).any():
                top_level = lvl + 1
            else:
                break
        upper_nbrs = tuple(
            jnp.asarray(g.upper_nbrs[lvl]) for lvl in range(top_level)
        )
        # entry: first inserted member of the top live level (or node 0)
        if top_level > 0:
            members = g.upper_ids[top_level - 1]
            ep = int(members[members < cur][0])
        else:
            ep = 0
        entry_rows = np.zeros(top_level + 1, dtype=np.int32)
        entry_rows[0] = ep
        for lvl in range(top_level):
            entry_rows[lvl + 1] = cache["row_of"][lvl][ep]
        return {
            "upper_ids": cache["upper_ids"][:top_level],
            "upper_nbrs": upper_nbrs,
            "upper_down": cache["upper_down"][:top_level],
            "entry_rows": jnp.asarray(entry_rows),
            "num_levels": top_level,
        }

    def _prune_batch(
        self, data, norms, base_ids, cand_ids, cand_sims, max_out
    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Batched reference pruning; returns per-base selected ids and sims."""
        b = len(base_ids)
        c = _PRUNE_CAND_CAP
        if cand_ids.shape[1] < c:
            pad = c - cand_ids.shape[1]
            cand_ids = np.pad(cand_ids, ((0, 0), (0, pad)), constant_values=-1)
            cand_sims = np.pad(cand_sims, ((0, 0), (0, pad)), constant_values=-np.inf)
        cand_ids = cand_ids[:, :c]
        cand_sims = cand_sims[:, :c]
        valid = cand_ids >= 0
        safe = np.clip(cand_ids, 0, None)
        keep = np.zeros((b, c), dtype=bool)
        dev_codes, dev_norms = self._build_codes_norms()
        sub = 512
        for s in range(0, b, sub):
            e = min(s + sub, b)
            # pad the tail sub-batch to the full width: one compiled variant;
            # ship ids only -- candidate vectors gather on device
            w = e - s
            sl_sims = np.full((sub, c), -np.inf, np.float32)
            sl_ids = np.zeros((sub, c), np.int32)
            sl_valid = np.zeros((sub, c), bool)
            sl_sims[:w] = cand_sims[s:e]
            sl_ids[:w] = safe[s:e]
            sl_valid[:w] = valid[s:e]
            keep[s:e] = np.asarray(
                select_neighbors_ids(
                    jnp.asarray(sl_sims),
                    jnp.asarray(sl_ids),
                    jnp.asarray(sl_valid),
                    dev_codes,
                    dev_norms,
                    metric=self._search_metric,
                    max_out=max_out,
                )
            )[:w]
        out_ids, out_sims = [], []
        for bi in range(b):
            k = keep[bi] & valid[bi]
            out_ids.append(cand_ids[bi][k])
            out_sims.append(cand_sims[bi][k])
        return out_ids, out_sims

    def _reverse_link_batch(self, data, norms, g, new_ids, sel_ids, sel_sims):
        """Reverse updates at L0, fully vectorized: free slots fill by grouped
        rank; overflowing targets re-prune once per chunk with ALL their new
        links as candidates (reference `reverse_update_neighbors` batched)."""
        return self._reverse_link_any(data, norms, g.l0, new_ids, sel_ids, None)

    def _reverse_link_upper(self, data, norms, g, li, new_ids, sel_ids, sel_sims):
        row_of = self._row_of_arr(g, li)
        self._reverse_link_any(
            data, norms, g.upper_nbrs[li], new_ids, sel_ids, (row_of, g.upper_ids[li])
        )

    def _row_of_arr(self, g, li) -> np.ndarray:
        if not hasattr(self, "_row_of_cache"):
            self._row_of_cache = {}
        if li not in self._row_of_cache:
            arr = np.full(g.levels.shape[0], -1, np.int32)
            arr[g.upper_ids[li]] = np.arange(len(g.upper_ids[li]), dtype=np.int32)
            self._row_of_cache[li] = arr
        return self._row_of_cache[li]

    def _reverse_link_any(self, data, norms, adj, new_ids, sel_ids, upper):
        """adj rows hold node ids (L0) or level rows (upper)."""
        max_out = adj.shape[1]
        # flatten (nbr, node) pairs
        counts = np.asarray([len(x) for x in sel_ids], dtype=np.int64)
        if counts.sum() == 0:
            return
        pair_nbr = np.concatenate([np.asarray(x, dtype=np.int64) for x in sel_ids])
        pair_node = np.repeat(np.asarray(new_ids, dtype=np.int64), counts)
        if upper is not None:
            row_of, ids_l = upper
            pair_row = row_of[pair_nbr]
            pair_val = row_of[pair_node]
        else:
            pair_row = pair_nbr
            pair_val = pair_node

        order = np.argsort(pair_row, kind="stable")
        rows_s = pair_row[order]
        vals_s = pair_val[order]
        nbrs_s = pair_nbr[order]
        uniq_rows, starts, per = np.unique(rows_s, return_index=True, return_counts=True)
        touched = uniq_rows
        rank = np.arange(len(rows_s)) - np.repeat(starts, per)
        fill = (adj[uniq_rows] >= 0).sum(1).astype(np.int64)
        slot = np.repeat(fill, per) + rank
        ok = slot < max_out
        adj[rows_s[ok], slot[ok]] = vals_s[ok]

        # overflow: re-prune each overflowing row once, with all its new links
        over = ~ok
        if not over.any():
            return touched
        ov_rows = rows_s[over]
        ov_nbrs = nbrs_s[over]
        ov_vals = vals_s[over]
        ov_nodes = pair_node[order][over]
        uq, ustart, ucnt = np.unique(ov_rows, return_index=True, return_counts=True)
        extra_cap = int(min(ucnt.max(initial=1), 16))
        b = len(uq)
        c = max_out + extra_cap
        cand_ids = np.full((b, c), -1, dtype=np.int64)  # node ids for scoring
        cand_val = np.full((b, c), -1, dtype=np.int64)  # adj payload (row or id)
        existing = adj[uq]  # (b, max_out)
        if upper is not None:
            ex_ids = np.where(existing >= 0, upper[1][np.clip(existing, 0, None)], -1)
        else:
            ex_ids = existing
        cand_ids[:, :max_out] = ex_ids
        cand_val[:, :max_out] = existing
        urank = np.arange(len(ov_rows)) - np.repeat(ustart, ucnt)
        group = np.repeat(np.arange(b), ucnt)
        keep_extra = urank < extra_cap
        cand_ids[group[keep_extra], max_out + urank[keep_extra]] = ov_nodes[keep_extra]
        cand_val[group[keep_extra], max_out + urank[keep_extra]] = ov_vals[keep_extra]

        base_ids = uq if upper is None else upper[1][uq]
        valid = cand_ids >= 0
        safe = np.clip(cand_ids, 0, None)
        base_vecs = data[base_ids]
        cand_vecs = data[safe]
        dots = np.einsum("bd,bcd->bc", base_vecs, cand_vecs)
        if self._search_metric == MetricType.IP:
            sims = dots
        elif self._search_metric == MetricType.L2:
            sims = -(norms[base_ids][:, None] + norms[safe] - 2.0 * dots)
        else:
            denom = np.sqrt(norms[base_ids])[:, None] * np.sqrt(norms[safe])
            sims = np.where(denom > 0, dots / np.where(denom > 0, denom, 1), 1.0)
        sims = np.where(valid, sims, -np.inf).astype(np.float32)
        order2 = np.argsort(-sims, axis=1, kind="stable")
        ids_sorted = np.take_along_axis(cand_ids, order2, 1)
        val_sorted = np.take_along_axis(cand_val, order2, 1)
        sims_sorted = np.take_along_axis(sims, order2, 1)
        keep = self._prune_keep_mask(data, norms, ids_sorted, sims_sorted, max_out)
        adj[uq] = -1
        for i in range(b):
            chosen = val_sorted[i][keep[i] & (ids_sorted[i] >= 0)][:max_out]
            adj[uq[i], : len(chosen)] = chosen
        return touched

    def _prune_keep_mask(self, data, norms, cand_ids, cand_sims, max_out):
        """Device pairwise-prune keep mask over desc-sorted candidates."""
        b, c0 = cand_ids.shape
        c = _PRUNE_CAND_CAP
        if c0 < c:
            cand_ids = np.pad(cand_ids, ((0, 0), (0, c - c0)), constant_values=-1)
            cand_sims = np.pad(
                cand_sims, ((0, 0), (0, c - c0)), constant_values=-np.inf
            )
        cand_ids = cand_ids[:, :c]
        cand_sims = cand_sims[:, :c]
        valid = cand_ids >= 0
        safe = np.clip(cand_ids, 0, None)
        keep = np.zeros((b, c), dtype=bool)
        dev_codes, dev_norms = self._build_codes_norms()
        sub = 512
        for st in range(0, b, sub):
            e = min(st + sub, b)
            w = e - st
            sl_sims = np.full((sub, c), -np.inf, np.float32)
            sl_ids = np.zeros((sub, c), np.int32)
            sl_valid = np.zeros((sub, c), bool)
            sl_sims[:w] = cand_sims[st:e]
            sl_ids[:w] = safe[st:e]
            sl_valid[:w] = valid[st:e]
            keep[st:e] = np.asarray(
                select_neighbors_ids(
                    jnp.asarray(sl_sims),
                    jnp.asarray(sl_ids),
                    jnp.asarray(sl_valid),
                    dev_codes,
                    dev_norms,
                    metric=self._search_metric,
                    max_out=max_out,
                )
            )[:w]
        return keep[:, :c0]

    def _l0_dev_update(self, g, rows: np.ndarray) -> None:
        # apply touched adjacency rows to the device-resident L0 copy
        if getattr(self, '_l0_dev', None) is None:
            return
        n_bkt = 1 << max(int(np.ceil(np.log2(max(len(rows), 1)))), 5)
        rows_p = np.zeros(n_bkt, dtype=np.int32)
        rows_p[: len(rows)] = rows
        if len(rows):
            rows_p[len(rows):] = rows[0]  # idempotent pad
        vals_p = g.l0[rows_p]
        self._l0_dev = self._l0_dev.at[jnp.asarray(rows_p)].set(
            jnp.asarray(vals_p)
        )

    def _build_codes_norms(self):
        # device-resident fp32 codes + squared norms for build-time pruning
        # (set by _rebuild before _build_graph runs)
        return self._codes, self._norms

    # ------------- search -------------
    def _search_impl(self, queries, topk, mask, param):
        nq = queries.shape[0]
        if self._n == 0:
            return (
                np.full((nq, topk), -np.inf, np.float32),
                np.full((nq, topk), -1, np.int64),
            )
        q_norm2 = None
        if self._mips:
            q_norm2 = (queries.astype(np.float32) ** 2).sum(1)
            queries = mips_augment_query(queries.astype(np.float32))
        ef = param.ef if isinstance(param, HnswQueryParam) else 500
        use_refiner = (
            param is not None
            and getattr(param, "is_using_refiner", False)
            and self.quantize != QuantizeType.UNDEFINED
        )
        out_topk = topk
        if use_refiner:
            topk = min(topk * getattr(param, "refiner_scale_factor", 10), self._n)
        ef = max(ef, topk)
        is_linear = bool(param.is_linear) if isinstance(param, QueryParam) else False

        if is_linear or self._n < _BRUTE_FORCE_THRESHOLD:
            full_mask = np.zeros(self._codes.shape[0], dtype=bool)
            full_mask[: self._n] = True if mask is None else mask
            k = min(topk, self._n)
            sims, idx = blockwise_topk_search(
                queries,
                self._codes,
                self._search_metric,
                k,
                mask=jnp.asarray(full_mask),
                x_sq_norms=self._norms,
                dequant=self._dequant,
                int4_packed=getattr(self, "_int4_packed", False),
            )
            sims, idx = np.asarray(sims), np.asarray(idx).astype(np.int64)
        else:
            budget = jnp.int32(
                min(
                    max(_MIN_SCAN_LIMIT, int(_MAX_SCAN_RATIO * self._n)),
                    self._n,
                )
            )
            dmask = None
            if mask is not None:
                fm = np.zeros(self._codes.shape[0], dtype=bool)
                fm[: self._n] = mask
                dmask = jnp.asarray(fm)
            k = min(topk, self._n)
            sims, idx = hnsw_search(
                jnp.asarray(queries),
                self._codes,
                self._norms,
                self._dev["l0"],
                self._dev["upper_ids"],
                self._dev["upper_nbrs"],
                self._dev["upper_down"],
                self._dev["entry_rows"],
                dmask,
                budget,
                self._dequant,
                metric=self._search_metric,
                ef=ef,
                topk=k,
                max_steps=ef + 64,
                num_levels=self._dev["num_levels"],
                int4_packed=getattr(self, "_int4_packed", False),
                frontier=4,  # 4-way beam: ~4x fewer sequential steps
            )
            sims, idx = np.asarray(sims), np.asarray(idx).astype(np.int64)
        if use_refiner:
            raw_q = queries[:, :-1] if self._mips else queries
            sims, idx = refine(self._data_fn, raw_q, idx, self.metric, out_topk)
            idx = idx.astype(np.int64)
            topk = out_topk
        elif self._mips:
            # augmented-L2 similarity -> true inner product:
            # -l2 = -(||q||^2 + M^2 - 2 ip)  =>  ip = (sim + ||q||^2 + M^2) / 2
            sims = np.where(
                idx >= 0,
                (sims + q_norm2[:, None] + self._mips_max_norm2) / 2.0,
                sims,
            )
        if sims.shape[1] < topk:
            pad = topk - sims.shape[1]
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = np.where(idx >= 0, sims, -np.inf)
        radius = float(getattr(param, "radius", 0.0) or 0.0)
        if radius > 0.0:
            # range search: keep results within `radius` of the query
            # (distance metrics: score <= radius; IP: score >= radius)
            from ..ops.distance import similarity_to_score

            scores = np.asarray(similarity_to_score(sims, self.metric))
            if self.metric == MetricType.IP:
                ok = scores >= radius
            else:
                ok = scores <= radius
            sims = np.where(ok, sims, -np.inf)
            idx = np.where(ok, idx, -1)
        return sims, idx

    # ------------- persistence -------------
    def dump_aux(self, directory: str, prefix: str) -> Dict[str, Any]:
        g = self._graph
        if g is None:
            self._ensure_fresh()
            g = self._graph
        fname = f"hnsw_{prefix}.npz"
        payload = {
            "n": np.int64(self._n),
            "m": np.int64(self.m),
            "levels": g.levels,
            "l0": g.l0,
            "entry_point": np.int64(g.entry_point),
            "max_level": np.int64(g.max_level),
        }
        for lvl in range(len(g.upper_ids)):
            payload[f"upper_ids_{lvl}"] = g.upper_ids[lvl]
            payload[f"upper_nbrs_{lvl}"] = g.upper_nbrs[lvl]
        np.savez_compressed(os.path.join(directory, fname), **payload)
        return {"file": fname, "type": "hnsw", "m": self.m}

    def load_aux(self, directory: str, descriptor: Dict[str, Any]) -> None:
        path = os.path.join(directory, descriptor.get("file", ""))
        if not os.path.exists(path):
            return
        data = dict(np.load(path))
        self._loaded_aux = data


def _graph_from_aux(aux: Dict[str, np.ndarray], m: int) -> _Graph:
    n = int(aux["n"])
    g = _Graph(n, int(aux.get("m", m)))
    g.levels = aux["levels"]
    g.l0 = aux["l0"]
    g.entry_point = int(aux["entry_point"])
    g.max_level = int(aux["max_level"])
    lvl = 0
    while f"upper_ids_{lvl}" in aux:
        ids = aux[f"upper_ids_{lvl}"]
        g.upper_ids.append(ids)
        g.upper_nbrs.append(aux[f"upper_nbrs_{lvl}"])
        g.row_of.append({int(v): i for i, v in enumerate(ids)})
        lvl += 1
    return g
