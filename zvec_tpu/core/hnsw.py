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
from ..ops.hnsw import (
    hnsw_build_select,
    hnsw_search,
    prune_rows,
    select_neighbors_batch,
    select_neighbors_ids,
    upper_forward_select,
)
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
from .interface import VectorIndexEngine, register_engine, rescan_deficient
from .refiner import refine

__all__ = ["HnswEngine"]

_MAX_SCAN_RATIO = 0.1  # kDefaultScanRatio
_MIN_SCAN_LIMIT = 10000  # kDefaultMinScanLimit
_PRUNE_CAND_CAP = 128  # pairwise-prune candidate cap (device memory bound)
_ROW_ALIGN = 128


def _dispatch_chunk(env) -> int:
    """ZVEC_HNSW_DISPATCH_CHUNK, validated at knob-read time: a 0/negative
    or non-numeric value must fail HERE with a clear message, not as a
    range-step ValueError deep inside the build loop."""
    raw = env.get("ZVEC_HNSW_DISPATCH_CHUNK", "32")
    try:
        val = int(raw)
    except ValueError as exc:
        raise ValueError(
            f"ZVEC_HNSW_DISPATCH_CHUNK={raw!r} is not an integer"
        ) from exc
    return max(1, val)


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
    query_param_class = HnswQueryParam

    def __init__(self, metric: MetricType, dimension: int, params=None):
        super().__init__(metric, dimension, params)
        self.m = params.m if params is not None else 50
        self.ef_construction = params.ef_construction if params is not None else 500
        # Typed tuning knobs (reference `hnsw_params.h:22-80` analogs),
        # promoted from ZVEC_HNSW_* env vars in round 3. The env vars remain
        # as DEPRECATED overrides, resolved ONCE here — traced code never
        # reads the environment, so a changed env var can no longer go stale
        # inside a jit cache (the round-2 footgun).
        env = os.environ

        def _envv(name):
            v = env.get(name)
            return v if v not in (None, "") else None

        self.knn_k_cfg = getattr(params, "knn_k", None)
        if _envv("ZVEC_HNSW_KNN_K"):
            self.knn_k_cfg = int(env["ZVEC_HNSW_KNN_K"])
        self.prune_alpha = float(getattr(params, "prune_alpha", 1.0) or 1.0)
        if _envv("ZVEC_HNSW_PRUNE_ALPHA"):
            self.prune_alpha = float(env["ZVEC_HNSW_PRUNE_ALPHA"])
        self.backfill_alpha = float(getattr(params, "backfill_alpha", 0.0) or 0.0)
        if _envv("ZVEC_HNSW_BACKFILL_ALPHA"):
            self.backfill_alpha = float(env["ZVEC_HNSW_BACKFILL_ALPHA"])
        self.clustered_build = getattr(params, "clustered_build", None)
        if _envv("ZVEC_HNSW_CLUSTERED"):
            self.clustered_build = env["ZVEC_HNSW_CLUSTERED"] == "1"
        self.brute_force_threshold = int(
            getattr(params, "brute_force_threshold", 1000) or 1000
        )
        if _envv("ZVEC_HNSW_BRUTE_FORCE_THRESHOLD"):
            self.brute_force_threshold = int(env["ZVEC_HNSW_BRUTE_FORCE_THRESHOLD"])
        self.max_scan_ratio_cfg = float(getattr(params, "max_scan_ratio", 0.0) or 0.0)
        if _envv("ZVEC_HNSW_MAX_SCAN_RATIO"):
            self.max_scan_ratio_cfg = float(env["ZVEC_HNSW_MAX_SCAN_RATIO"])
        self.route_quantize = str(getattr(params, "route_quantize", "auto") or "auto")
        if _envv("ZVEC_HNSW_ROUTE"):
            self.route_quantize = env["ZVEC_HNSW_ROUTE"]
        self._search_metric = self.metric  # set per-build (MIPS augments IP)
        self._mips = False
        self._mips_max_norm2 = 0.0
        self._hamming = self.metric == MetricType.HAMMING  # packed bit codes
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
        self._shard_graphs: Optional[List[Optional[_Graph]]] = None
        self._n = 0
        # device state
        self._codes = None
        self._norms = None
        self._bf16_search = False
        self._dequant = None
        # routed traversal: reduced-precision code tier for the beam's
        # gathers (None = off); (codes, norms, dequant-or-None) on device
        self._route = None
        self._qparams: Optional[QuantParams] = None
        self._dev = None  # dict of device graph arrays
        self._loaded_aux: Optional[Dict[str, np.ndarray]] = None

    # ------------- build -------------
    def _rebuild(self, data: np.ndarray) -> None:
        if self._hamming:
            # packed bit codes -> ±1 vectors: hamming = ||q - x||^2 / 4 on
            # {±1}^D, so the graph builds and traverses in plain L2 space
            # (reference hamming metric `hamming_metric.cc:236`; the MXU
            # matmul replaces its AVX popcount kernels)
            from ..ops.quantize import bits_to_pm1, unpack_bits

            data = bits_to_pm1(unpack_bits(np.ascontiguousarray(data), self.dimension))
        else:
            data = np.asarray(data, dtype=np.float32)
        self._n = data.shape[0]
        self._route = None
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
        self._search_metric = (
            MetricType.L2 if (self._mips or self._hamming) else self.metric
        )
        if self._mips:
            data, self._mips_max_norm2 = mips_augment(data)

        mesh = self._mesh()
        if mesh is not None and self._n >= self.brute_force_threshold:
            self._rebuild_sharded(data, mesh)
            return
        self._shard_graphs = None
        n_pad = round_up(self._n, _ROW_ALIGN)

        # Graph build FIRST: the build stages its own code buffers (bf16 at
        # scale) and candidate tables — at 10M those plus a standing 5GB fp32
        # search-code table exceed one chip's HBM (the r4 10M OOM). Search
        # codes go to HBM only after the build transients are freed.
        if (
            self._loaded_aux is not None
            and self._loaded_aux["n"] == self._n
            and "shards" not in self._loaded_aux
        ):
            self._graph = _graph_from_aux(self._loaded_aux, self.m)
        if self._graph is None or self._graph.levels.shape[0] != self._n:
            self._graph = self._build_graph(data)

        codes_host, norms_host = self._storage_codes_host(data, n_pad)
        if self.quantize == QuantizeType.UNDEFINED:
            self._codes = jnp.asarray(codes_host)
            # norms on HOST: a jnp reduction over a freshly device_put buffer
            # is pathologically slow through the tunnel (CLAUDE.md)
            self._norms = jnp.asarray(norms_host)
        self._dev = self._device_graph(self._graph)
        if self.quantize != QuantizeType.UNDEFINED:
            self._codes = jnp.asarray(codes_host)
            self._norms = jnp.asarray(norms_host)
        self._route = self._build_route(codes_host)

    def _mesh(self):
        from ..parallel.mesh import collection_mesh

        return collection_mesh()

    def _build_route(self, codes_host: np.ndarray):
        """Reduced-precision ROUTING tier for fp32 indexes: the beam's
        per-step neighbor gathers read these codes (int8 = 4x / bf16 = 2x
        less HBM gather traffic than fp32 — the dominant per-hop cost at
        scale), and `_beam_core` re-ranks the final working set against the
        resident fp32 tier on device, so user-facing scores stay fp32-exact.
        The TPU answer to the reference's quantized-index + full-precision
        refine block pairing (`segment.cc:1591-1700`), applied to the
        DEFAULT fp32 index. Returns (codes, norms, dequant-or-None) on
        device, or None when routing is off."""
        mode = self.route_quantize
        if (
            self.quantize != QuantizeType.UNDEFINED
            or self._hamming
            or self._bf16_search
            or codes_host.dtype != np.float32
        ):
            return None
        if mode == "auto":
            # MEASURED NEGATIVE at 10M (2026-08-19, knobs10m A/B on the
            # identical persisted graph): int8 routing 0.9469 recall@10 /
            # 707.7 qps pipelined at ef=96 vs fp32 0.9508 / 733.4 — the
            # beam's neighbor-row gather is per-row LATENCY-bound, not
            # byte-bound (profile_step.py: fp32 and int8 gather+score both
            # 5.3 ms/step at Q=1024), so the 4x byte saving buys nothing
            # and quantized traversal ordering costs recall. auto = off;
            # routing stays available as an explicit opt-in.
            mode = "off"
        if mode == "off":
            return None
        if mode == "bf16":
            import ml_dtypes

            rc = codes_host.astype(ml_dtypes.bfloat16)
            rn = (rc.astype(np.float32) ** 2).sum(1)
            return (jnp.asarray(rc), jnp.asarray(rn), None)
        # train on a bounded subsample (np.quantile sorts a full copy — at
        # 10M x 128 that is a 5GB sort on the single host core) and encode
        # in chunks so no full-size fp32 temporary materializes
        step = max(1, self._n // 1_000_000)
        qp = train_quantizer(codes_host[: self._n : step], QuantizeType.INT8)
        rc = np.empty(codes_host.shape, np.int8)
        rn = np.empty(rc.shape[0], np.float32)
        for lo in range(0, rc.shape[0], 1 << 20):
            hi = lo + (1 << 20)
            rc[lo:hi] = encode(codes_host[lo:hi], QuantizeType.INT8, qp)
            blk = rc[lo:hi].astype(np.float32) * qp.scale + qp.bias
            rn[lo:hi] = np.einsum("ij,ij->i", blk, blk)
        return (
            jnp.asarray(rc),
            jnp.asarray(rn),
            (jnp.float32(qp.scale), jnp.float32(qp.bias)),
        )

    def _storage_codes_host(self, data: np.ndarray, n_pad: int):
        """Host-side (codes (n_pad, Dc) in storage dtype, norms (n_pad,) f32).
        Sets _bf16_search/_qparams/_dequant/_int4_packed as side effects.
        Storage codes: the graph builds on fp32/bf16 (or directly on int8 at
        HBM-bound scale, `_knn_layer` build_int8); search scores quantized
        codes with dequant fused (quantized converter/reformer semantics)."""
        if self.quantize == QuantizeType.UNDEFINED:
            padded = np.zeros((n_pad, data.shape[1]), np.float32)
            padded[: self._n] = data
            norms = np.einsum("ij,ij->i", padded, padded)
            # opt-in bf16 search codes: halves the beam's code-gather HBM
            # bandwidth (the dominant per-hop cost) and the H2D staging
            # payload. Final hits are re-scored exactly on host (refine), so
            # user-facing scores stay fp32-exact; traversal order changes
            # only at bf16 rounding boundaries. ±1 hamming codes are exact
            # in bf16 (no rescore needed).
            self._bf16_search = (
                os.environ.get("ZVEC_HNSW_BF16_SEARCH", "0") == "1"
            )
            if self._bf16_search:
                import ml_dtypes

                padded = padded.astype(ml_dtypes.bfloat16)
            return padded, norms
        # Chunked normalize/train/encode: the old whole-array flow
        # materialized several (n, D) fp32 temporaries (normalized store,
        # codes, full dequant for norms) — 3 x 30GB at 10M x 768d — and
        # np.quantile sorted a full copy. Train on a bounded subsample
        # (statistically identical range fit), then stream 1M-row chunks.
        cosine = self._search_metric == MetricType.COSINE

        def _norm_rows(blk: np.ndarray) -> np.ndarray:
            if not cosine:
                return blk
            nrm = np.linalg.norm(blk, axis=1, keepdims=True)
            return blk / np.where(nrm > 0, nrm, 1.0)

        CH = 1 << 20
        if self.quantize in (QuantizeType.INT8, QuantizeType.INT4):
            step = max(1, self._n // 1_000_000)
            sample = _norm_rows(
                np.ascontiguousarray(data[: self._n : step]).astype(np.float32)
            )
            # cosine+int8 trains SYMMETRIC (bias=0): code-space sims are then
            # rank-equivalent at one uniform scale, which lets the graph
            # build itself run over these codes when fp32/bf16 residency
            # exceeds HBM (see `_knn_layer` build_int8)
            self._qparams = train_quantizer(
                sample, self.quantize,
                symmetric=cosine and self.quantize == QuantizeType.INT8,
            )
            del sample
            self._dequant = (
                jnp.float32(self._qparams.scale),
                jnp.float32(self._qparams.bias),
            )
            padded_c = np.zeros((n_pad, data.shape[1]), np.int8)
            norms = np.zeros(n_pad, np.float32)
            for lo in range(0, self._n, CH):
                hi = min(lo + CH, self._n)
                blk = _norm_rows(data[lo:hi].astype(np.float32))
                padded_c[lo:hi] = encode(blk, self.quantize, self._qparams)
                deq = decode(padded_c[lo:hi], self._qparams)
                norms[lo:hi] = np.einsum("ij,ij->i", deq, deq)
        else:
            padded_c = np.zeros((n_pad, data.shape[1]), np.float16)
            norms = np.zeros(n_pad, np.float32)
            for lo in range(0, self._n, CH):
                hi = min(lo + CH, self._n)
                blk = _norm_rows(data[lo:hi].astype(np.float32))
                padded_c[lo:hi] = blk.astype(np.float16)
                deq = padded_c[lo:hi].astype(np.float32)
                norms[lo:hi] = np.einsum("ij,ij->i", deq, deq)
        if self.quantize == QuantizeType.INT4:
            # nibble-packed HBM residency: halves gather + scan bandwidth
            # vs int8 (`integer_quantizer_converter.cc:596-607`)
            from ..ops.quantize import pack_int4

            padded_c = pack_int4(padded_c)
            self._int4_packed = True
        return padded_c, norms

    def _rebuild_sharded(self, data: np.ndarray, mesh) -> None:
        """Mesh mode: S independent subgraphs over contiguous global row
        ranges [s*R, (s+1)*R), codes/norms/graph arrays corpus-sharded so
        every search fans out over the mesh and merges per-shard top-k over
        ICI (the TPU scale-out of the reference's per-segment fan-out,
        `query_planner.cc:344-448`). `data` is already metric-transformed
        (MIPS-augmented / hamming ±1)."""
        import jax

        from ..parallel.mesh import corpus_sharding

        S = mesh.shape["corpus"]
        R = round_up(-(-self._n // S), _ROW_ALIGN)
        n_pad = R * S
        graphs: List[Optional[_Graph]] = []
        aux = self._loaded_aux
        if (
            aux is not None
            and int(aux.get("n", -1)) == self._n
            and int(aux.get("shards", 0)) == S
        ):
            graphs = _shard_graphs_from_aux(aux, self.m, S)
        if not graphs:
            for s in range(S):
                chunk = data[s * R : min((s + 1) * R, self._n)]
                graphs.append(self._build_graph(chunk) if len(chunk) else None)
        self._shard_graphs = graphs
        self._graph = None
        codes_host, norms_host = self._storage_codes_host(data, n_pad)
        self._codes = jax.device_put(codes_host, corpus_sharding(mesh, 2))
        self._norms = jax.device_put(
            norms_host.astype(np.float32), corpus_sharding(mesh, 1)
        )
        self._dev = self._shard_device_graph(graphs, R, mesh)
        if n_pad > self._n:
            # Resident validity mask: an EMPTY shard (its whole [s*R,(s+1)*R)
            # range is padding) still scores its entry row 0 — a zero code
            # whose similarity is finite (IP: dot=0 beats all-negative real
            # dots) — so unmasked searches must exclude padding rows.
            self._dev["valid"] = jax.device_put(
                np.arange(n_pad) < self._n, corpus_sharding(mesh, 1)
            )

    def _shard_device_graph(self, graphs, R: int, mesh) -> Dict[str, Any]:
        """Stack per-shard graphs into corpus-sharded flat arrays. Shards
        missing an upper level get a 1-node pass-through at their entry so
        every shard descends the same static number of levels."""
        import jax

        from ..parallel.mesh import corpus_sharding

        S = len(graphs)
        m0 = 2 * self.m
        l0 = np.full((S * R, m0), -1, np.int32)
        for s, g in enumerate(graphs):
            if g is not None:
                l0[s * R : s * R + g.l0.shape[0], : g.l0.shape[1]] = g.l0
        L = max((len(g.upper_ids) for g in graphs if g is not None), default=0)
        entries = np.zeros((S, L + 1), np.int32)
        for s, g in enumerate(graphs):
            if g is not None:
                entries[s, 0] = max(g.entry_point, 0)
        upper_ids, upper_nbrs, upper_down = [], [], []
        for lvl in range(L):
            U = max(
                (
                    len(g.upper_ids[lvl])
                    for g in graphs
                    if g is not None and lvl < len(g.upper_ids)
                ),
                default=1,
            )
            ids = np.zeros((S, U), np.int32)
            nbrs = np.full((S, U, self.m), -1, np.int32)
            down = np.zeros((S, U), np.int32)
            for s, g in enumerate(graphs):
                if g is None:
                    continue
                if lvl < len(g.upper_ids):
                    gl = g.upper_ids[lvl]
                    ids[s, : len(gl)] = gl
                    nbrs[s, : len(gl), : g.upper_nbrs[lvl].shape[1]] = (
                        g.upper_nbrs[lvl]
                    )
                    if lvl == 0:
                        down[s, : len(gl)] = gl
                    else:
                        row_below = g.row_of[lvl - 1]
                        down[s, : len(gl)] = np.asarray(
                            [row_below[int(i)] for i in gl], np.int32
                        )
                    entries[s, lvl + 1] = g.row_of[lvl].get(int(g.entry_point), 0)
                else:
                    # pass-through level: one node at the entry, no neighbors;
                    # the greedy descent scores it once and drops straight to
                    # the entry row of the level below
                    ids[s, :] = max(g.entry_point, 0)
                    down[s, :] = entries[s, lvl]
                    entries[s, lvl + 1] = 0
            upper_ids.append(
                jax.device_put(ids.reshape(-1), corpus_sharding(mesh, 1))
            )
            upper_nbrs.append(
                jax.device_put(
                    nbrs.reshape(S * U, self.m), corpus_sharding(mesh, 2)
                )
            )
            upper_down.append(
                jax.device_put(down.reshape(-1), corpus_sharding(mesh, 1))
            )
        return {
            "sharded": True,
            "mesh": mesh,
            "R": R,
            "l0": jax.device_put(l0, corpus_sharding(mesh, 2)),
            "upper_ids": tuple(upper_ids),
            "upper_nbrs": tuple(upper_nbrs),
            "upper_down": tuple(upper_down),
            "entry_rows": jax.device_put(
                entries.reshape(-1), corpus_sharding(mesh, 1)
            ),
            "num_levels": L,
        }

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
        from ..ops.runtime import is_tpu

        l0 = g.l0
        if is_tpu() and l0.shape[1] % 128:
            # XLA materializes a second whole-array copy of the adjacency
            # parameter inside EVERY search program when its minor dim is
            # not a full 128-lane tile (probed: (2M, 100) s32 -> 0.96GiB
            # HLO temp `copy(l0_nbrs)`; (2M, 128) -> 0.00). Whether to pad
            # is a BUDGET decision: padding widens every beam step's
            # scored-lane count ~28% (measured -22% qps at 10M x 128d,
            # where codes 5GB + l0 4.8GB x2 still fit), while NOT padding
            # OOMs when the copy can't coexist with the code table
            # (10M x 768d int8: 7.15 + 2 x 4.77 = 16.7 vs 15.75GB). Pad
            # only when codes + two adjacency copies would exceed HBM.
            lanes_tiled = -(-l0.shape[1] // 128) * 128
            l0_tiled_bytes = l0.shape[0] * lanes_tiled * 4
            itemsize = 1 if self.quantize in (
                QuantizeType.INT8, QuantizeType.INT4
            ) else (2 if self._bf16_search else 4)
            codes_bytes = l0.shape[0] * self.dimension * itemsize
            if codes_bytes + 2 * l0_tiled_bytes > 14_000_000_000:
                pad = 128 - (l0.shape[1] % 128)
                l0 = np.pad(l0, ((0, 0), (0, pad)), constant_values=-1)
        return {
            "l0": jnp.asarray(l0),
            "upper_ids": tuple(upper_ids),
            "upper_nbrs": tuple(upper_nbrs),
            "upper_down": tuple(upper_down),
            "entry_rows": jnp.asarray(entry_rows),
            "num_levels": len(g.upper_ids),
        }

    def _sample_levels(self, n: int) -> _Graph:
        """Level sampling + empty per-level structures (reference seeded
        mt19937 level draw, `hnsw_algorithm.cc` get_random_level)."""
        g = _Graph(n, self.m)
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
        return g

    def _build_graph(self, data: np.ndarray) -> _Graph:
        """Default: batched kNN-graph construction (exact MXU scans + device
        heuristic prune, every node in parallel). ZVEC_HNSW_BUILD=insert
        selects the legacy chunked-insertion build."""
        import os as _os

        if _os.environ.get("ZVEC_HNSW_BUILD") == "insert":
            return self._build_graph_insert(data)
        return self._build_graph_knn(data)

    # ---- batched kNN-graph build (TPU-native) ----

    def _build_graph_knn(self, data: np.ndarray) -> _Graph:
        """Exact-kNN candidates + heuristic prune + reverse links, batched on
        device — no sequential insertion. Same _Graph layout (and search
        path) as the insertion build; reference parity target is the graph
        the sequential `hnsw_streamer.cc:506` add-loop produces."""
        import time as _time

        n, d = data.shape
        _log = __import__("os").environ.get("ZVEC_BUILD_LOG") == "1"
        if _log:
            print(
                f"[knn-build] graph build start n={n} d={d} "
                f"(data materialized)", flush=True,
            )
        g = self._sample_levels(n)
        norms2 = (data.astype(np.float32) ** 2).sum(1)
        m0 = self.m0_out()

        # candidate pool per node: the reference's efc knob (500 default)
        # bounds how many nearest candidates the prune sees. Past ~400k rows
        # the pool caps at 127 so the scan rides the fused Pallas kernel —
        # the k~500 approx_max_k carry costs ~2s/batch at 1M (33 min/build)
        # for ~2pts of recall@10 at high ef (BASELINE.md 30k sweep).
        t0 = _time.perf_counter()
        g.l0 = self._knn_layer(
            data, norms2, np.arange(n, dtype=np.int32), m0,
            knn_k=min(self.ef_construction, 512 if n <= 400_000 else 127, n - 1),
        )
        if _log:
            print(f"[knn-build] L0 done n={n} in {_time.perf_counter() - t0:.1f}s", flush=True)

        for li in range(len(g.upper_ids)):
            members = g.upper_ids[li]
            mlen = len(members)
            if mlen <= 1:
                continue
            t1 = _time.perf_counter()
            rows_adj = self._knn_layer(
                data[members], (norms2[members]).astype(np.float32),
                np.arange(mlen, dtype=np.int32), self.m,
                knn_k=min(self.ef_construction, 512, mlen - 1),
            )
            g.upper_nbrs[li] = rows_adj  # rows within the level
            if _log:
                print(
                    f"[knn-build] level {li + 1} members={mlen} "
                    f"in {_time.perf_counter() - t1:.1f}s",
                    flush=True,
                )
        return g

    def _knn_layer(
        self,
        data: np.ndarray,  # (n, d) layer codes (fp32, already MIPS-augmented)
        norms2: np.ndarray,  # (n,)
        node_rows: np.ndarray,  # (n,) row ids to emit (arange)
        max_out: int,
        *,
        knn_k: int,
    ) -> np.ndarray:
        """One graph layer: forward kNN+prune, reverse links, final re-prune.
        Returns (n, max_out) int32 adjacency (row space of `data`)."""
        import jax

        from ..ops.hnsw import (
            knn_build_all,
            merge_prune_step,
            prune_scored,
        )
        from ..ops.runtime import is_tpu

        n, d = data.shape
        if self.knn_k_cfg:
            # authoritative override (may RAISE the large-n 127 default:
            # k>127 routes off the Pallas kernel onto the blockwise scan,
            # so the Pallas lane cap no longer binds)
            knn_k = min(int(self.knn_k_cfg), self.ef_construction, n - 1)
        _forced = self.clustered_build is True
        # (forced-clustered keeps layers >= 4096 on the device clustered
        # path — its test coverage — but the clustered branch itself
        # requires n >= 4096, so tinier layers always take the host twin)
        if n <= 8192 and not (_forced and n >= 4096):
            # Tiny layers (upper graph levels) build entirely on HOST: each
            # device layer build costs 2-4 fresh remote compiles through the
            # tunnel (minutes each, and the remote compile helper SIGKILLs
            # under pressure — observed twice at the 150k upper levels). A
            # few thousand rows are seconds of host BLAS.
            return self._knn_layer_host(data, norms2, max_out, knn_k=knn_k)
        # Past a few million rows the full exact scan is HBM-infeasible
        # (corpus re-read per query batch); switch to cluster-local exact
        # candidates. ZVEC_HNSW_CLUSTERED=1 forces it (tests).
        clustered = (
            n >= 4096
            and ((is_tpu() and n > 2_000_000) or _forced)
            and self.clustered_build is not False  # typed param can force OFF
        )
        # Pallas kernel caps topk at 128 lanes, and on the EXACT path its
        # k=127 unrolled-extraction program over the full corpus
        # OOM-SIGKILLs the axon remote-compile helper at >=1M-row shapes
        # (reproduced 2026-08-18) — so past 512k rows the exact scan
        # defaults to the blockwise approx_max_k fallback (a much smaller
        # program; measured 400s for the full 1M exact build). The clustered
        # path's scans are bucket-local and keep the fused kernel.
        # ZVEC_HNSW_NO_PALLAS=1 forces the fallback at any size.
        use_pallas = (
            knn_k <= 127
            and not (is_tpu() and n > 524_288 and not clustered)
            and __import__("os").environ.get("ZVEC_HNSW_NO_PALLAS") != "1"
        )
        if not is_tpu():
            # CPU test mesh: cap the candidate pool — the (B, C, C) pairwise
            # prune at C=500 is minutes of host matmul per batch
            knn_k = min(knn_k, 127)
        # blockwise scan wants N divisible by its block; Pallas wants 1024
        n_pad = round_up(n, 1024 if (use_pallas or n <= 131072) else 131072)
        _env = __import__("os").environ
        # int8-RESIDENT build (clustered path only): when the corpus is too
        # big even for bf16 residency (10M x 768d bf16 = 15.4GB vs 16GB
        # HBM), stage SYMMETRIC int8 codes (bias=0) instead — 4x smaller
        # than bf16 and every candidate gather shrinks with it. Code-space
        # sims are rank-equivalent to dequant space at one uniform scale
        # (exactly scale-free for cosine), so all prune/merge consumers run
        # unchanged on the int8 MXU path (`ops/hnsw._exact_dots`). This is
        # the TPU tier for the reference's converter-built indexes (the
        # CosineInt8Converter graph is likewise built over int8 codes,
        # `cosine_converter.cc:383-399` + `tools/core/README.md:95-131`).
        # ZVEC_BUILD_INT8=1 forces it (tests); =0 disables the auto.
        build_int8 = clustered and (
            _env.get("ZVEC_BUILD_INT8") == "1"
            or (
                self.quantize == QuantizeType.INT8
                and is_tpu()
                and n * d * 2 > 6_000_000_000
                and _env.get("ZVEC_BUILD_INT8") != "0"
            )
        )
        # >2M rows: store the build codes as bf16 on device — halves the
        # biggest HBM buffer (5.4GB -> 2.7GB at 10M) and halves candidate-
        # gather traffic in every prune phase. All consumers gather rows and
        # cast to f32 before scoring; bf16 storage precision only perturbs
        # candidate RANKING during construction (search-time scoring never
        # touches these buffers). ZVEC_BUILD_FP32=1 restores fp32;
        # ZVEC_BUILD_BF16=1 forces it at small n (tests).
        build_bf16 = not build_int8 and (
            _env.get("ZVEC_BUILD_BF16") == "1"
            or (is_tpu() and n > 2_000_000 and _env.get("ZVEC_BUILD_FP32") != "1")
        )
        if build_int8:
            from ..ops.quantize import encode as q_encode

            cosine = self._search_metric == MetricType.COSINE
            step = max(1, n // 1_000_000)
            sample = np.ascontiguousarray(data[::step]).astype(np.float32)
            if cosine:
                snrm = np.linalg.norm(sample, axis=1, keepdims=True)
                sample /= np.where(snrm > 0, snrm, 1.0)
            bqp = train_quantizer(sample, QuantizeType.INT8, symmetric=True)
            del sample
            codes_p = np.zeros((n_pad, d), np.int8)
            norms_p = np.zeros(n_pad, np.float32)
            CH = 1 << 20
            for lo in range(0, n, CH):
                hi = min(lo + CH, n)
                blk = data[lo:hi].astype(np.float32)
                if cosine:
                    bn = np.linalg.norm(blk, axis=1, keepdims=True)
                    blk /= np.where(bn > 0, bn, 1.0)
                codes_p[lo:hi] = q_encode(blk, QuantizeType.INT8, bqp)
                c32 = codes_p[lo:hi].astype(np.float32)
                norms_p[lo:hi] = np.einsum("ij,ij->i", c32, c32)
            codes_dev = jnp.asarray(codes_p)
        else:
            codes_p = np.zeros((n_pad, d), np.float32)
            codes_p[:n] = data
            norms_p = np.zeros(n_pad, np.float32)
            norms_p[:n] = norms2
            codes_dev = (
                jnp.asarray(codes_p, dtype=jnp.bfloat16)
                if build_bf16
                else jnp.asarray(codes_p)
            )
        mask_p = np.zeros(n_pad, np.int8)
        mask_p[:n] = 1
        norms_dev = jnp.asarray(norms_p)
        mask_dev = jnp.asarray(mask_p)

        B = 2048 if knn_k <= 255 else 1024  # bound the (B, C, C) prune buffer
        if d >= 512:
            # high-dim gathers: the (B, C, D) candidate buffers grow with D
            # (2048 x 228 x 768 f32 = 1.4GB); halve the batch to keep the
            # prune programs' transients inside HBM next to the code table
            B = min(B, 1024)
        metric = self._search_metric

        nb = (n + B - 1) // B
        rows_mat = np.empty((nb, B), np.int32)
        for bi, lo in enumerate(range(0, n, B)):
            rows = node_rows[lo : lo + B]
            if len(rows) < B:
                rows = np.concatenate(
                    [rows, np.full(B - len(rows), rows[-1], np.int32)]
                )
            rows_mat[bi] = rows

        def batches():
            for bi in range(nb):
                yield jnp.asarray(rows_mat[bi])

        # ---- forward pass: exact kNN + prune ----
        import os as _os
        import time as _time

        _log = _os.environ.get("ZVEC_BUILD_LOG") == "1"
        if _log and is_tpu():
            codes_dev.block_until_ready()
            print(
                f"[knn-build]   codes staged ({codes_dev.dtype}, n_pad={n_pad})",
                flush=True,
            )
        _t0 = _time.perf_counter()
        if clustered:
            # candidates stay DEVICE-RESIDENT (n+1, 2*kc): the old flow
            # fetched them to host (~5GB D2H at 10M) and re-staged windows
            # per dispatch (~5GB H2D); the fused path gathers candidate
            # lanes in-program and only pruned ids cross the tunnel.
            kc_cand = int(_env.get("ZVEC_HNSW_KC", "0")) or max(
                32, min(64, max_out)
            )
            cand_dev = self._clustered_candidates(
                # int8 build: sample/seed k-means from CODE space so the
                # centroids live where assign_top2 scores them
                codes_p[:n] if build_int8 else data,
                codes_dev, norms_dev, n, kc=kc_cand,
            )
            if _log:
                print(
                    f"[knn-build]   clustered candidates in "
                    f"{_time.perf_counter() - _t0:.1f}s",
                    flush=True,
                )
            from ..ops.hnsw import merge_prune_batch_out

            # dispatch-chunk width: each call through the tunnel pays ~1s of
            # dispatch+fetch latency on top of compute, so wider chunks
            # amortize it — but program length scales with the chunk and
            # long programs both compile slower (minutes, remote) and can
            # crash the tunneled worker (CLAUDE.md). 32 was the r2 balance;
            # override to A/B via ZVEC_HNSW_DISPATCH_CHUNK.
            dchunk = _dispatch_chunk(_os.environ)
            fwd = np.full((n, max_out), -1, np.int32)
            pending = None  # (rm, device handle): fetch one behind dispatch
            for lo in range(0, nb, dchunk):
                rm = rows_mat[lo : lo + dchunk]
                if rm.shape[0] < dchunk:  # pad tail: ONE program compile
                    rm = np.concatenate(
                        [rm, np.broadcast_to(rm[-1], (dchunk - rm.shape[0], B))],
                        axis=0,
                    )
                out = merge_prune_batch_out(
                    jnp.asarray(rm), cand_dev, codes_dev, norms_dev,
                    metric=metric, max_out=max_out, alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
                if pending is not None:
                    prm, ph = pending
                    # padded repeats rewrite a row with identical output
                    fwd[prm.reshape(-1)] = np.asarray(ph).reshape(-1, max_out)
                pending = (rm, out)
            if pending is not None:
                prm, ph = pending
                fwd[prm.reshape(-1)] = np.asarray(ph).reshape(-1, max_out)
            del cand_dev
            if _log:
                print(
                    f"[knn-build]   fwd (clustered) in "
                    f"{_time.perf_counter() - _t0:.1f}s",
                    flush=True,
                )
            # NN-descent refinement (Dong et al., WWW'11): cluster-local
            # candidates miss true neighbors across k-means cell boundaries
            # (on weakly-clustered data most of them — gaussian 1M forced-
            # clustered measured recall@10 0.31 @ ef=128 vs 0.65 exact).
            # Neighbor-of-neighbor rounds repair exactly those edges.
            rounds = int(_env.get("ZVEC_HNSW_NNDESCENT", "1"))
            expand = max(1, min(4, 256 // max_out))
            from ..ops.hnsw import nn_descent_round

            dchunk = _dispatch_chunk(_os.environ)
            from ..ops.hnsw import merge_prune_chunk_out

            for rd in range(rounds):
                _t1 = _time.perf_counter()
                if build_int8:
                    # HBM-bound regime: the device-resident (n+1, max_out)
                    # adjacency tile-pads 100 lanes to 128 (~5.1GB at 10M)
                    # and OOMed next to the 7.7GB int8 code table (10M x
                    # 768d measured 16.28G vs 15.75G). Assemble each
                    # chunk's expanded candidate lists (own edges U edges
                    # of the strided `expand` best neighbors) on HOST and
                    # run them through merge_prune_chunk_out — device
                    # footprint stays codes + one chunk.
                    fwd1 = np.concatenate(
                        [fwd, np.full((1, max_out), -1, np.int32)], axis=0
                    )
                    stride = max(1, max_out // expand)
                    new_fwd = np.full_like(fwd, -1)
                    pending = None
                    for lo in range(0, nb, dchunk):
                        rm = rows_mat[lo : lo + dchunk]
                        if rm.shape[0] < dchunk:
                            rm = np.concatenate(
                                [rm, np.broadcast_to(
                                    rm[-1], (dchunk - rm.shape[0], B)
                                )],
                                axis=0,
                            )
                        own = fwd1[rm]  # (dc, B, m0)
                        sel = own[:, :, ::stride][:, :, :expand]
                        sel_safe = np.where(sel >= 0, sel, n)
                        nn2 = fwd1[sel_safe]  # (dc, B, expand, m0)
                        ext = np.concatenate(
                            [own, nn2.reshape(*own.shape[:2], -1)], axis=2
                        )
                        out = merge_prune_chunk_out(
                            jnp.asarray(rm), jnp.asarray(ext), codes_dev,
                            norms_dev, metric=metric, max_out=max_out,
                            alpha=self.prune_alpha,
                            backfill_alpha=self.backfill_alpha,
                        )
                        if pending is not None:
                            prm, ph = pending
                            new_fwd[prm.reshape(-1)] = np.asarray(ph).reshape(
                                -1, max_out
                            )
                        pending = (rm, out)
                    if pending is not None:
                        prm, ph = pending
                        new_fwd[prm.reshape(-1)] = np.asarray(ph).reshape(
                            -1, max_out
                        )
                    fwd = new_fwd
                    if _log:
                        print(
                            f"[knn-build]   nn-descent round {rd + 1}/{rounds} "
                            f"(expand={expand}, host-staged) in "
                            f"{_time.perf_counter() - _t1:.1f}s",
                            flush=True,
                        )
                    continue
                fwd_dev = jnp.asarray(
                    np.concatenate(
                        [fwd, np.full((1, max_out), -1, np.int32)], axis=0
                    )
                )
                new_fwd = np.full_like(fwd, -1)
                pending = None  # fetch one behind dispatch (latency overlap)
                for lo in range(0, nb, dchunk):
                    rm = rows_mat[lo : lo + dchunk]
                    if rm.shape[0] < dchunk:
                        rm = np.concatenate(
                            [rm, np.broadcast_to(rm[-1], (dchunk - rm.shape[0], B))],
                            axis=0,
                        )
                    out = nn_descent_round(
                        jnp.asarray(rm), fwd_dev, codes_dev, norms_dev,
                        metric=metric, max_out=max_out, expand=expand,
                        alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                    )
                    if pending is not None:
                        prm, ph = pending
                        new_fwd[prm.reshape(-1)] = np.asarray(ph).reshape(
                            -1, max_out
                        )
                    pending = (rm, out)
                if pending is not None:
                    prm, ph = pending
                    new_fwd[prm.reshape(-1)] = np.asarray(ph).reshape(-1, max_out)
                fwd = new_fwd
                del fwd_dev
                if _log:
                    print(
                        f"[knn-build]   nn-descent round {rd + 1}/{rounds} "
                        f"(expand={expand}) in "
                        f"{_time.perf_counter() - _t1:.1f}s",
                        flush=True,
                    )
        elif is_tpu():
            # Large layers: ONE lax.scan program (batch-loop dispatch through
            # the remote tunnel costs ~1s/call -> 16 min at 1M). Small layers:
            # per-batch dispatch (the big scan program's compile dominates).
            adj = jnp.full((n, max_out), -1, jnp.int32)
            if nb >= 64:
                # chunk the scan: long device programs crash the tunneled
                # worker (observed at 977 AND 128 scan steps over 1M rows);
                # 32 batches ≈ a few seconds per program
                for lo in range(0, nb, 32):
                    adj = knn_build_all(
                        jnp.asarray(rows_mat[lo : lo + 32]), codes_dev,
                        norms_dev, mask_dev, adj, metric=metric, knn_k=knn_k,
                        max_out=max_out, use_pallas=use_pallas,
                        alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                    )
            else:
                from ..ops.hnsw import knn_build_step

                for bi in range(nb):
                    adj = knn_build_step(
                        jnp.asarray(rows_mat[bi]), codes_dev, norms_dev,
                        mask_dev, adj, metric=metric, knn_k=knn_k,
                        max_out=max_out, use_pallas=use_pallas,
                        alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                    )
            fwd = np.asarray(adj)
            del adj  # free device HBM before the merge-phase adjacency
            if _log:
                print(
                    f"[knn-build]   fwd {nb} batches in "
                    f"{_time.perf_counter() - _t0:.1f}s",
                    flush=True,
                )
        else:
            # CPU test mesh: blockwise scan (interpret-mode Pallas is slow)
            fwd = np.full((n, max_out), -1, np.int32)
            bmask = jnp.asarray(mask_p.astype(bool))
            for rows_dev in batches():
                rows = np.asarray(rows_dev)
                sims, ids = blockwise_topk_search(
                    codes_p[rows], codes_dev, metric, min(knn_k + 1, n),
                    mask=bmask, x_sq_norms=norms_dev,
                )
                if ids.shape[1] < knn_k + 1:
                    pad = knn_k + 1 - ids.shape[1]
                    ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                    sims = jnp.pad(sims, ((0, 0), (0, pad)), constant_values=NEG_INF)
                out = prune_scored(
                    rows_dev, ids.astype(jnp.int32), sims, codes_dev, norms_dev,
                    metric=metric, max_out=max_out, alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
                fwd[rows] = np.asarray(out)

        # ---- reverse candidates (host, vectorized) + final device prune ----
        _t1 = _time.perf_counter()
        rev = _reverse_candidates(fwd, cap=max_out)
        if _log:
            print(
                f"[knn-build]   reverse candidates in "
                f"{_time.perf_counter() - _t1:.1f}s",
                flush=True,
            )
        _t1b = _time.perf_counter()
        cand = np.concatenate([fwd, rev], axis=1).astype(np.int32)
        if _log:
            print(
                f"[knn-build]   cand assembly in "
                f"{_time.perf_counter() - _t1b:.1f}s",
                flush=True,
            )
        if is_tpu() and nb >= 64:
            # host-side adjacency: at 10M a device (n, max_out) int32 target
            # is 4.2GB of HBM on top of the codes table — staging the OOM
            # observed in the r4 10M run. Chunk candidates up, pruned ids
            # down; pad the tail chunk (repeat last batch) so the scan
            # program compiles ONCE (remote compile is minutes).
            from ..ops.hnsw import merge_prune_chunk_out

            c2 = cand.shape[1]
            # half the r4 staging budget per chunk: the pipelined loop keeps
            # TWO chunks' candidate uploads live on device (prev fetching,
            # next computing)
            nb_chunk = max(1, min(32, int(1e9 // (B * c2 * 4))))
            out = np.full((n, max_out), -1, np.int32)
            t_prep = t_disp = t_fetch = 0.0
            pending = None  # (rm, device handle): fetch one behind dispatch
            for lo in range(0, nb, nb_chunk):
                _tp = _time.perf_counter()
                rm = rows_mat[lo : lo + nb_chunk]
                if rm.shape[0] < nb_chunk:
                    pad = np.broadcast_to(
                        rm[-1], (nb_chunk - rm.shape[0], B)
                    )
                    rm = np.concatenate([rm, pad], axis=0)
                cand_rm = cand[rm]
                _td = _time.perf_counter()
                got = merge_prune_chunk_out(
                    jnp.asarray(rm), jnp.asarray(cand_rm), codes_dev,
                    norms_dev, metric=metric, max_out=max_out,
                    alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
                _tf = _time.perf_counter()
                if pending is not None:
                    # overlap D2H of chunk i with device compute of i+1
                    prm, ph = pending
                    # padded repeats rewrite rows with identical output
                    out[prm.reshape(-1)] = np.asarray(ph).reshape(-1, max_out)
                _te = _time.perf_counter()
                pending = (rm, got)
                t_prep += _td - _tp
                t_disp += _tf - _td
                t_fetch += _te - _tf
            if pending is not None:
                prm, ph = pending
                out[prm.reshape(-1)] = np.asarray(ph).reshape(-1, max_out)
            if _log:
                print(
                    f"[knn-build]   merge split: prep {t_prep:.1f}s, "
                    f"upload+dispatch {t_disp:.1f}s, fetch-behind "
                    f"{t_fetch:.1f}s over {(nb + nb_chunk - 1) // nb_chunk} "
                    f"chunks",
                    flush=True,
                )
        else:
            adj2 = jnp.full((n, max_out), -1, jnp.int32)
            for rows_dev in batches():
                rows = np.asarray(rows_dev)
                adj2 = merge_prune_step(
                    rows_dev, jnp.asarray(cand[rows]), codes_dev, norms_dev,
                    adj2, metric=metric, max_out=max_out,
                    alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
            out = np.asarray(adj2)

        # NSW-style long links: a kNN graph over well-separated clusters is
        # DISCONNECTED (every top-efc candidate is in-cluster), which upper-
        # level routing masks for plain queries but strands group-by
        # deepening and hostile filters inside one component. Reserve the
        # last 2 slots for random teleports: they score poorly so the beam
        # only expands them once the local component is exhausted — exactly
        # when an escape hatch is needed.
        if n > 2048 and max_out >= 16:
            if not out.flags.writeable:
                out = out.copy()
            rng_ll = np.random.default_rng(0x10E6)
            rand = (
                np.arange(n, dtype=np.int64)[:, None]
                + rng_ll.integers(1, n, (n, 2))
            ) % n
            out[:, -2:] = rand.astype(np.int32)

        if _log:
            print(
                f"[knn-build]   reverse+merge in "
                f"{_time.perf_counter() - _t1:.1f}s",
                flush=True,
            )
        return out

    def _knn_layer_host(
        self,
        data: np.ndarray,
        norms2: np.ndarray,
        max_out: int,
        *,
        knn_k: int,
    ) -> np.ndarray:
        """Host-numpy twin of `_knn_layer` for tiny layers (n <= 8192):
        exact kNN candidates, dominance prune + backfill, reverse links,
        final merge re-prune — identical semantics to the device pipeline
        (`prune_scored`/`merge_prune_*`), zero device dispatches."""
        n = data.shape[0]
        metric = self._search_metric
        X = np.ascontiguousarray(data, dtype=np.float32)
        nrm = norms2.astype(np.float32)
        dots = X @ X.T
        if metric == MetricType.IP:
            S = dots
        elif metric == MetricType.COSINE:
            nn = np.sqrt(np.maximum(nrm, 0.0))
            denom = np.outer(nn, nn)
            S = np.divide(dots, denom, out=np.ones_like(dots), where=denom > 0)
        else:
            S = -(nrm[:, None] + nrm[None, :] - 2.0 * dots)
        np.fill_diagonal(S, -np.inf)

        k = int(max(1, min(knn_k, n - 1)))
        if k >= n - 1:
            cand = np.argsort(-S, axis=1)[:, : n - 1]
        else:
            part = np.argpartition(-S, k - 1, axis=1)[:, :k]
            s = np.take_along_axis(S, part, 1)
            cand = np.take_along_axis(part, np.argsort(-s, axis=1), 1)
        fwd = _host_prune_compact(
            X, S, cand.astype(np.int64), metric, max_out, self.prune_alpha,
            self.backfill_alpha,
        )
        rev = _reverse_candidates(fwd, cap=max_out)
        comb = np.concatenate([fwd, rev], axis=1).astype(np.int64)
        # merge phase: re-sort desc by sim-to-base, dedup keep-first
        valid = comb >= 0
        safe = np.clip(comb, 0, None)
        s2 = np.where(
            valid, np.take_along_axis(S, safe, 1), -np.inf
        )
        o2 = np.argsort(-s2, axis=1, kind="stable")
        comb = np.where(
            np.take_along_axis(valid, o2, 1), np.take_along_axis(comb, o2, 1), -1
        )
        # duplicate ids (mutual fwd/rev edges): keep first occurrence only
        eq = comb[:, :, None] == comb[:, None, :]
        earlier = np.tril(np.ones((comb.shape[1], comb.shape[1]), bool), -1)
        dup = (eq & earlier[None] & (comb[:, None, :] >= 0)).any(axis=2)
        comb = np.where(dup, -1, comb)
        return _host_prune_compact(
            X, S, comb, metric, max_out, self.prune_alpha, self.backfill_alpha
        )

    def _clustered_candidates(
        self, data: np.ndarray, codes_dev, norms_dev, n: int, kc: int
    ):
        """Cluster-local kNN candidates -> DEVICE (n + 1, 2*kc) int32
        (-1 pad, unsorted; slot s in lanes [s*kc, (s+1)*kc); row n is the
        invalid-scatter dump slot). Flat lanes keep the 10M table scatter
        on dim 0 with a full 128-lane tile (no padded-reshape HLO temp).

        k-means buckets + top-2 spilled assignment; every bucket scores its
        members against each other on the MXU and each member keeps its
        top-kc in-bucket neighbors per assignment slot. The scalable
        candidate generator for 10M+ builds (full exact scans re-read the
        corpus per query batch — petabytes at 10M)."""
        import jax

        from ..ops.hnsw import assign_top2_blocked, bucket_knn_all
        from ..ops.kmeans import lloyd

        import os as _os
        import time as _time

        _log = _os.environ.get("ZVEC_BUILD_LOG") == "1"

        def _t(msg, t0):
            if _log:
                print(
                    f"[knn-build]     {msg} +{_time.perf_counter() - t0:.1f}s",
                    flush=True,
                )
            return _time.perf_counter()

        _tp = _time.perf_counter()
        rng = np.random.default_rng(0xC111)
        target = 1250  # primary members per cluster
        K = int(min(16384, max(64, n // target), n // 4))
        sub_n = min(524_288, n)
        sub = data[rng.choice(n, sub_n, replace=False)].astype(np.float32)
        seeds = data[rng.choice(n, K, replace=False)].astype(np.float32)
        _tp = _t("cand: subsample", _tp)
        cents, _ = lloyd(
            jnp.asarray(sub), jnp.asarray(seeds), iters=6,
            block=min(16384, sub_n),
        )
        cents.block_until_ready()
        _tp = _t("cand: lloyd", _tp)
        asn = np.asarray(assign_top2_blocked(codes_dev, cents, block=16384))[:n]
        _tp = _t("cand: assign_top2", _tp)

        # ---- pack buckets (host, vectorized): members = primary + spill ----
        sizes = np.bincount(asn[:, 0], minlength=K) + np.bincount(
            asn[:, 1], minlength=K
        )
        mp = int(min(8192, max(256, -(-int(np.percentile(sizes, 98)) // 128) * 128)))
        rows_bkt = np.full((K, mp), -1, np.int32)
        slot_bkt = np.zeros((K, mp), np.int32)
        fill = np.zeros(K, np.int64)
        for s in (0, 1):
            order = np.argsort(asn[:, s], kind="stable")
            clusters = asn[order, s]
            bounds = np.searchsorted(clusters, np.arange(K + 1))
            for c in range(K):
                lo, hi = bounds[c], bounds[c + 1]
                room = mp - fill[c]
                take = min(hi - lo, room)
                if take <= 0:
                    continue
                rows_bkt[c, fill[c] : fill[c] + take] = order[lo : lo + take]
                slot_bkt[c, fill[c] : fill[c] + take] = s
                fill[c] += take

        _tp = _t(f"cand: bucket pack (K={K}, mp={mp})", _tp)
        cand = jnp.full((n + 1, 2 * kc), -1, jnp.int32)
        CH = 1024  # buckets per dispatch
        for lo in range(0, K, CH):
            cand = bucket_knn_all(
                jnp.asarray(rows_bkt[lo : lo + CH]),
                jnp.asarray(slot_bkt[lo : lo + CH]),
                cand,
                codes_dev,
                norms_dev,
                metric=self._search_metric,
                kc=kc,
            )
            _tp = _t(f"cand: bucket_knn [{lo}:{lo + CH}]", _tp)
        return cand

    def _build_graph_insert(self, data: np.ndarray) -> _Graph:
        n, d = data.shape
        g = self._sample_levels(n)

        norms = (data.astype(np.float32) ** 2).sum(1)
        self._build_dev_cache = None
        self._level_codes_cache = {}
        self._row_of_cache = {}

        # device-resident adjacency (L0 + per upper level) with touched-row
        # updates folded into the fused per-chunk program
        self._l0_dev = None
        self._upper_dev: Dict[int, Any] = {}
        pending_l0: List[np.ndarray] = []  # rows touched since last sync
        pending_up: Dict[int, List[np.ndarray]] = {}
        n_pad_codes = round_up(n, _ROW_ALIGN)
        vb = 0 if n_pad_codes <= (1 << 21) else 21  # hashed visited at scale

        import os as _os
        import time as _time

        _log = _os.environ.get("ZVEC_BUILD_LOG") == "1"
        _t_chunk = _time.perf_counter()
        pos = 1  # node 0 seeds the graph
        while pos < n:
            cur = pos
            chunk = int(min(self.build_chunk_cap, max(32, cur // self.build_chunk_divisor)))
            chunk = min(chunk, n - pos)
            new_ids = np.arange(pos, pos + chunk, dtype=np.int32)
            qs = data[new_ids]
            efc = self.ef_construction
            jobs: List[Dict[str, Any]] = []  # overflow re-prune jobs (1 RPC)

            if cur <= max(self.brute_force_threshold, efc):
                # ---- early phase: exact candidates incl. the chunk itself
                # (sequential-insert parity for the young graph) ----
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
                sel_ids, _ = self._prune_batch(
                    data, norms, new_ids, ids, sims, self.m0_out()
                )
                sel_mat = np.full((chunk, self.m0_out()), -1, np.int64)
                for bi in range(chunk):
                    sel_mat[bi, : len(sel_ids[bi])] = sel_ids[bi]
            else:
                # ---- fused beam + intra-chunk + prune: ONE device program ----
                self._graph = g
                dev = self._device_graph_partial(g, cur)
                nlv = dev["num_levels"]
                if self._l0_dev is None:
                    self._l0_dev = jnp.asarray(g.l0)
                    pending_l0 = []
                for li in range(nlv):
                    if li not in self._upper_dev:
                        self._upper_dev[li] = jnp.asarray(g.upper_nbrs[li])
                        pending_up[li] = []
                q_bucket = 128 if chunk <= 128 else (1024 if chunk <= 1024 else 4096)
                qs_pad = np.zeros((q_bucket, qs.shape[1]), np.float32)
                qs_pad[:chunk] = qs
                upd_rows, upd_vals = self._drain_pending(
                    pending_l0, g.l0, 4 * q_bucket
                )
                up_r, up_v = [], []
                for li in range(nlv):
                    r, v = self._drain_pending(
                        pending_up.get(li, []), g.upper_nbrs[li], 512
                    )
                    up_r.append(r)
                    up_v.append(v)
                pending_l0 = []
                pending_up = {li: [] for li in pending_up}
                sel_dev, _sims_dev, self._l0_dev, new_upper = hnsw_build_select(
                    jnp.asarray(qs_pad),
                    jnp.int32(pos),
                    jnp.int32(chunk),
                    jnp.int32(cur),
                    self._codes_np(data),
                    self._norms_np(norms),
                    self._l0_dev,
                    dev["upper_ids"],
                    tuple(self._upper_dev[li] for li in range(nlv)),
                    dev["upper_down"],
                    dev["entry_rows"],
                    upd_rows,
                    upd_vals,
                    tuple(up_r),
                    tuple(up_v),
                    jnp.int32(efc * self.m0_out()),
                    metric=self._search_metric,
                    ef=efc,
                    cand_cap=_PRUNE_CAND_CAP,
                    max_steps=efc // 2 + 64,
                    num_levels=nlv,
                    frontier=4,
                    max_out=self.m0_out(),
                    visited_bits=vb,
                    alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
                for li in range(nlv):
                    self._upper_dev[li] = new_upper[li]
                if _log:
                    _t_fused0 = _time.perf_counter()
                sel_mat = np.asarray(sel_dev)[:chunk].astype(np.int64)
                if _log:
                    print(
                        f"[hnsw-build]   fused+fetch={_time.perf_counter() - _t_chunk:.2f}s"
                        f" (fetch={_time.perf_counter() - _t_fused0:.2f}s)",
                        flush=True,
                    )

            # ---- forward writes at L0 ----
            g.l0[new_ids] = sel_mat
            pending_l0.append(new_ids.astype(np.int64))

            # ---- reverse links at L0 (host fill; overflow prunes batched) ----
            if _log:
                _t_rev = _time.perf_counter()
            touched = self._reverse_fill(g.l0, new_ids, sel_mat, None, jobs)
            if touched is not None and len(touched):
                pending_l0.append(touched)
            if _log:
                print(
                    f"[hnsw-build]   reverse_fill={_time.perf_counter() - _t_rev:.2f}s"
                    f" jobs={len(jobs)}",
                    flush=True,
                )

            # ---- upper levels: fused exact-scan + prune per level ----
            for lvl in range(1, g.max_level + 1):
                li = lvl - 1
                in_chunk = new_ids[g.levels[new_ids] >= lvl]
                if len(in_chunk) == 0:
                    continue
                members = g.upper_ids[li]
                # in-chunk members included: sequential-insert visibility
                n_existing = int(np.searchsorted(members, cur + chunk))
                if n_existing <= 1:
                    continue
                if li not in self._level_codes_cache:
                    m_pad = round_up(len(members), 128)
                    mc = np.zeros((m_pad, d), np.float32)
                    mc[: len(members)] = data[members]
                    self._level_codes_cache[li] = (
                        jnp.asarray(mc),
                        jnp.asarray((mc.astype(np.float32) ** 2).sum(1)),
                    )
                mcodes, mnorms = self._level_codes_cache[li]
                row_of = self._row_of_arr(g, li)
                qc_bkt = 1 << max(int(np.ceil(np.log2(len(in_chunk)))), 3)
                qc = np.zeros((qc_bkt, d), np.float32)
                qc[: len(in_chunk)] = data[in_chunk]
                nrows = np.zeros(qc_bkt, np.int32)
                nrows[: len(in_chunk)] = row_of[in_chunk]
                sel_rows, _ss = upper_forward_select(
                    jnp.asarray(qc),
                    jnp.asarray(nrows),
                    mcodes,
                    mnorms,
                    jnp.int32(n_existing),
                    metric=self._search_metric,
                    cand_cap=min(_PRUNE_CAND_CAP, mcodes.shape[0]),
                    max_out=self.m,
                    alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
                sel_rows = np.asarray(sel_rows)[: len(in_chunk)].astype(np.int64)
                nbrs_l = g.upper_nbrs[li]
                my_rows = row_of[in_chunk]
                nbrs_l[my_rows] = sel_rows
                sel_ids_mat = np.where(
                    sel_rows >= 0, members[np.clip(sel_rows, 0, None)], -1
                )
                t_up = self._reverse_fill(
                    nbrs_l, in_chunk, sel_ids_mat, (row_of, members), jobs
                )
                ups = [np.asarray(my_rows, dtype=np.int64)]
                if t_up is not None and len(t_up):
                    ups.append(t_up)
                pending_up.setdefault(li, []).append(np.concatenate(ups))

            # ---- one combined overflow re-prune RPC (L0 + upper rows) ----
            if _log:
                _t_ovf = _time.perf_counter()
            extra_l0, extra_up = self._flush_overflow(jobs, g, data, norms)
            if _log:
                print(
                    f"[hnsw-build]   overflow={_time.perf_counter() - _t_ovf:.2f}s",
                    flush=True,
                )
            if extra_l0 is not None and len(extra_l0):
                pending_l0.append(extra_l0)
            for li, rows_e in extra_up.items():
                pending_up.setdefault(li, []).append(rows_e)

            pos += chunk
            if _log:
                now = _time.perf_counter()
                print(
                    f"[hnsw-build] pos={pos}/{n} chunk={chunk} "
                    f"dt={now - _t_chunk:.2f}s",
                    flush=True,
                )
                _t_chunk = now
        return g

    @staticmethod
    def _drain_pending(chunks: List[np.ndarray], host_adj: np.ndarray, bucket: int):
        """Pack pending touched rows into a fixed-size (rows, vals) update,
        padded idempotently (repeat row 0 of the set, or row 0 of the array)."""
        if chunks:
            rows = np.unique(np.concatenate(chunks))
        else:
            rows = np.zeros(0, dtype=np.int64)
        u = len(rows)
        nbkt = bucket
        while nbkt < u:
            nbkt *= 2
        rows_p = np.zeros(nbkt, dtype=np.int32)
        rows_p[:u] = rows
        # idempotent pad: repeat an arbitrary real row (or row 0 when empty)
        pad_row = rows[0] if u else 0
        rows_p[u:] = pad_row
        vals_p = host_adj[rows_p].astype(np.int32)
        return jnp.asarray(rows_p), jnp.asarray(vals_p)

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
                    alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
                )
            )[:w]
        out_ids, out_sims = [], []
        for bi in range(b):
            k = keep[bi] & valid[bi]
            out_ids.append(cand_ids[bi][k])
            out_sims.append(cand_sims[bi][k])
        return out_ids, out_sims

    def _row_of_arr(self, g, li) -> np.ndarray:
        if not hasattr(self, "_row_of_cache"):
            self._row_of_cache = {}
        if li not in self._row_of_cache:
            arr = np.full(g.levels.shape[0], -1, np.int32)
            arr[g.upper_ids[li]] = np.arange(len(g.upper_ids[li]), dtype=np.int32)
            self._row_of_cache[li] = arr
        return self._row_of_cache[li]

    def _reverse_fill(self, adj, new_ids, sel_mat, upper, jobs):
        """Reverse link fill (host): free slots fill by grouped rank;
        overflowing rows are queued as a re-prune job (flushed once per
        chunk in `_flush_overflow`). sel_mat holds GLOBAL neighbor ids
        (-1 padded). Returns touched adjacency rows. Reference
        `reverse_update_neighbors` (`hnsw_algorithm.cc:437-510`)."""
        max_out = adj.shape[1]
        valid = sel_mat >= 0
        if not valid.any():
            return None
        pair_nbr = sel_mat[valid].astype(np.int64)
        pair_node = np.broadcast_to(
            np.asarray(new_ids, dtype=np.int64)[:, None], sel_mat.shape
        )[valid]
        if upper is not None:
            row_of, ids_l = upper
            pair_row = row_of[pair_nbr].astype(np.int64)
            pair_val = row_of[pair_node].astype(np.int64)
        else:
            pair_row = pair_nbr
            pair_val = pair_node

        order = np.argsort(pair_row, kind="stable")
        rows_s = pair_row[order]
        vals_s = pair_val[order]
        uniq_rows, starts, per = np.unique(rows_s, return_index=True, return_counts=True)
        touched = uniq_rows
        rank = np.arange(len(rows_s)) - np.repeat(starts, per)
        fill = (adj[uniq_rows] >= 0).sum(1).astype(np.int64)
        slot = np.repeat(fill, per) + rank
        ok = slot < max_out
        adj[rows_s[ok], slot[ok]] = vals_s[ok]

        over = ~ok
        if over.any():
            ov_rows = rows_s[over]
            ov_nodes = pair_node[order][over]
            uq, ustart, ucnt = np.unique(ov_rows, return_index=True, return_counts=True)
            extra_cap = int(min(ucnt.max(initial=1), 16))
            b = len(uq)
            c = max_out + extra_cap
            cand_ids = np.full((b, c), -1, dtype=np.int64)
            existing = adj[uq]
            if upper is not None:
                ex_ids = np.where(
                    existing >= 0, upper[1][np.clip(existing, 0, None)], -1
                )
            else:
                ex_ids = existing
            cand_ids[:, :max_out] = ex_ids
            urank = np.arange(len(ov_rows)) - np.repeat(ustart, ucnt)
            group = np.repeat(np.arange(b), ucnt)
            ke = urank < extra_cap
            cand_ids[group[ke], max_out + urank[ke]] = ov_nodes[ke]
            base_ids = uq if upper is None else upper[1][uq]
            jobs.append(
                {
                    "adj": adj,
                    "uq": uq,
                    "base_ids": np.asarray(base_ids, dtype=np.int64),
                    "cand_ids": cand_ids,
                    "max_out": max_out,
                    "upper": upper,
                }
            )
        return touched

    def _flush_overflow(self, jobs, g, data, norms):
        """Run ALL queued overflow re-prunes (L0 + upper levels) as one
        device call; apply results to host adjacency. Returns touched L0
        rows and {level: touched upper rows}."""
        if not jobs:
            return None, {}
        cap = max(j["max_out"] for j in jobs)
        width = max(j["cand_ids"].shape[1] for j in jobs)
        total = sum(len(j["uq"]) for j in jobs)
        bkt = 1 << max(int(np.ceil(np.log2(total))), 5)
        base_p = np.zeros(bkt, np.int32)
        cand_p = np.full((bkt, width), -1, np.int32)
        off = 0
        for j in jobs:
            b = len(j["uq"])
            base_p[off : off + b] = j["base_ids"]
            cand_p[off : off + b, : j["cand_ids"].shape[1]] = j["cand_ids"]
            off += b
        sel = np.asarray(
            prune_rows(
                jnp.asarray(base_p),
                jnp.asarray(cand_p),
                *self._build_codes_norms(),
                metric=self._search_metric,
                max_out=cap,
                alpha=self.prune_alpha,
                        backfill_alpha=self.backfill_alpha,
            )
        ).astype(np.int64)
        touched_l0 = []
        touched_up: Dict[int, List[np.ndarray]] = {}
        off = 0
        for j in jobs:
            b = len(j["uq"])
            rows_sel = sel[off : off + b, : j["max_out"]]
            off += b
            if j["upper"] is not None:
                row_of = j["upper"][0]
                vals = np.where(
                    rows_sel >= 0, row_of[np.clip(rows_sel, 0, None)], -1
                )
                li = self._upper_li_of(g, j["upper"][1])
                touched_up.setdefault(li, []).append(j["uq"].astype(np.int64))
            else:
                vals = rows_sel
                touched_l0.append(j["uq"].astype(np.int64))
            j["adj"][j["uq"]] = vals
        out_up = {
            li: np.unique(np.concatenate(v)) for li, v in touched_up.items()
        }
        out_l0 = (
            np.unique(np.concatenate(touched_l0)) if touched_l0 else None
        )
        return out_l0, out_up

    @staticmethod
    def _upper_li_of(g, ids_l) -> int:
        for li, ids in enumerate(g.upper_ids):
            if ids is ids_l:
                return li
        raise ValueError("unknown upper level")

    def _build_codes_norms(self):
        # device-resident fp32 codes + squared norms for build-time pruning
        # (set by _rebuild before _build_graph runs)
        return self._codes, self._norms

    # ------------- search -------------
    def _search_impl(self, queries, topk, mask, param):
        return self._search_finalize(self._search_dispatch(queries, topk, mask, param))

    def _search_finalize(self, handle):
        return handle()

    def _search_dispatch(self, queries, topk, mask, param):
        """Two-phase search (see VectorIndexEngine.search_async): the device
        program (beam / exact scan) is dispatched here; the returned closure
        fetches the result and runs host post-processing (rescan safety net,
        refine/bf16 rescore, score conversions), letting callers overlap the
        upload+dispatch of the next query batch with device compute."""
        nq = queries.shape[0]
        if self._n == 0:
            out = (
                np.full((nq, topk), -np.inf, np.float32),
                np.full((nq, topk), -1, np.int64),
            )
            return lambda: out
        q_norm2 = None
        if self._mips:
            q_norm2 = (queries.astype(np.float32) ** 2).sum(1)
            queries = mips_augment_query(queries.astype(np.float32))
        elif self._hamming:
            from ..ops.quantize import bits_to_pm1, unpack_bits

            queries = bits_to_pm1(unpack_bits(np.ascontiguousarray(queries), self.dimension))
        ef = param.ef if isinstance(param, HnswQueryParam) else 500
        quantized = self.quantize != QuantizeType.UNDEFINED
        # refine-by-default on quantized indexes (reference full-precision
        # refine block pairing, `segment.cc:1591-1700`); opt out with
        # is_using_refiner=False
        use_refiner = quantized and (
            param.refiner_enabled(True)
            if isinstance(param, QueryParam)
            else True
        )
        out_topk = topk
        if use_refiner:
            topk = min(topk * getattr(param, "refiner_scale_factor", 10), self._n)
        ef = max(ef, topk)
        is_linear = bool(param.is_linear) if isinstance(param, QueryParam) else False

        # pad the batch to a bucket: the search programs compile per query
        # count; remote compile is 2-60s per shape (ops/runtime.py)
        from ..ops.runtime import bucket_queries

        nq_pad = bucket_queries(nq)
        if nq_pad != nq:
            qpad = np.zeros((nq_pad, queries.shape[1]), np.float32)
            qpad[:nq] = queries
        else:
            qpad = np.asarray(queries, dtype=np.float32)

        sharded = self._dev is not None and self._dev.get("sharded")
        if is_linear or self._n < self.brute_force_threshold:
            full_mask = np.zeros(self._codes.shape[0], dtype=bool)
            full_mask[: self._n] = True if mask is None else mask
            k = min(topk, self._n)
            if sharded:
                dev_out = self._sharded_flat(qpad, full_mask, k)
            else:
                dev_out = blockwise_topk_search(
                    qpad,
                    self._codes,
                    self._search_metric,
                    k,
                    mask=jnp.asarray(full_mask),
                    x_sq_norms=self._norms,
                    dequant=self._dequant,
                    int4_packed=getattr(self, "_int4_packed", False),
                )

            def collect():
                return (
                    np.asarray(dev_out[0]),
                    np.asarray(dev_out[1]).astype(np.int64),
                )
        elif sharded:
            k = min(topk, self._n)
            dev_out = self._search_sharded(qpad, k, mask, ef, param)

            def collect():
                sims = np.asarray(dev_out[0])[:nq]
                idx = np.asarray(dev_out[1])[:nq].astype(np.int64)
                if mask is not None:
                    # same filtered-beam safety net as the single-device path
                    fm = np.zeros(self._codes.shape[0], dtype=bool)
                    fm[: self._n] = mask
                    sims, idx = rescan_deficient(
                        sims, idx, k, mask,
                        lambda: self._sharded_flat(qpad, fm, k),
                    )
                return sims, idx
        else:
            knobs = self._query_knobs(param)
            budget = jnp.int32(
                min(
                    max(_MIN_SCAN_LIMIT, int(knobs["scan_ratio"] * self._n)),
                    self._n,
                )
            )
            dmask = None
            if mask is not None:
                fm = np.zeros(self._codes.shape[0], dtype=bool)
                fm[: self._n] = mask
                dmask = jnp.asarray(fm)
            k = min(topk, self._n)
            # routed traversal: navigate on the reduced-precision tier,
            # re-rank the working set against fp32 inside the same program
            if self._route is not None:
                t_codes, t_norms, t_dequant = self._route
                r_codes, r_norms = self._codes, self._norms
            else:
                t_codes, t_norms, t_dequant = (
                    self._codes, self._norms, self._dequant,
                )
                r_codes = r_norms = None
            from ..ops.hnsw import hnsw_search_packed

            dev_out = hnsw_search_packed(
                jnp.asarray(qpad),
                t_codes,
                t_norms,
                self._dev["l0"],
                self._dev["upper_ids"],
                self._dev["upper_nbrs"],
                self._dev["upper_down"],
                self._dev["entry_rows"],
                dmask,
                budget,
                t_dequant,
                r_codes,
                r_norms,
                metric=self._search_metric,
                ef=ef,
                topk=k,
                max_steps=ef + knobs["steps_slack"],
                num_levels=self._dev["num_levels"],
                int4_packed=getattr(self, "_int4_packed", False),
                # 4-way beam default: ~4x fewer sequential steps
                frontier=knobs["frontier"],
                # exact visited bitset is n_pad/8 bytes PER QUERY — 1.28GB
                # for a 1024-query batch at 10M rows (the r2 measure OOM);
                # hash at scale like the build path (reference VisitFilter
                # likewise switches bitmap->bloom, `visit_filter.h:39`)
                visited_bits=knobs["visited_bits"]
                if knobs["visited_bits"]
                else (0 if self._codes.shape[0] <= (1 << 21) else 21),
                visited_bytes=knobs["visited_bytes"],
                approx_merge=knobs["approx_merge"],
                done_frac=knobs["done_frac"],
            )

            def collect():
                from ..ops.topk import unpack_topk

                # one packed D2H fetch; padding rows must not rescan
                sims, idx = unpack_topk(dev_out, nq)
                if mask is not None:
                    # Filtered-beam safety net: the working candidate set is
                    # ef-capped, so on clustered data a filter excluding the
                    # query's cluster can strand the beam with ZERO filtered
                    # hits (the reference's candidate heap is unbounded and
                    # keeps walking under its scan budget,
                    # `hnsw_algorithm.cc:180-278`). The rescan runs the FULL
                    # padded batch (stable compile shape); the helper scatters
                    # only the deficient real rows.
                    sims, idx = rescan_deficient(
                        sims, idx, k, mask,
                        lambda: blockwise_topk_search(
                            qpad,
                            self._codes,
                            self._search_metric,
                            k,
                            mask=dmask,
                            x_sq_norms=self._norms,
                            dequant=self._dequant,
                            int4_packed=getattr(self, "_int4_packed", False),
                        ),
                    )
                return sims, idx

        def finish():
            sims, idx = collect()
            sims, idx = sims[:nq], idx[:nq]  # drop bucket padding (brute)
            out_k = topk
            if use_refiner:
                raw_q = queries[:, :-1] if self._mips else queries
                sims, idx = refine(self._data_fn, raw_q, idx, self.metric, out_topk)
                idx = idx.astype(np.int64)
                out_k = out_topk
            elif getattr(self, "_bf16_search", False) and not self._hamming:
                # bf16 traversal scores -> exact fp32 scores for the returned
                # hits (cheap: topk rows/query); MIPS converts via IP directly
                raw_q = queries[:, :-1] if self._mips else queries
                sims, idx = refine(self._data_fn, raw_q, idx, self.metric, out_k)
                idx = idx.astype(np.int64)
            elif self._mips:
                # augmented-L2 similarity -> true inner product:
                # -l2 = -(||q||^2 + M^2 - 2 ip)  =>  ip = (sim + ||q||^2 + M^2) / 2
                sims = np.where(
                    idx >= 0,
                    (sims + q_norm2[:, None] + self._mips_max_norm2) / 2.0,
                    sims,
                )
            elif self._hamming:
                sims = sims * 0.25  # ±1 L2 similarity -> -hamming
            if sims.shape[1] < out_k:
                pad = out_k - sims.shape[1]
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

        return finish

    # ------------- in-beam group-by search -------------
    def search_grouped(
        self,
        queries: np.ndarray,
        mask: Optional[np.ndarray],
        param,
        group_codes: np.ndarray,  # (n,) int32 dense group code per row
        group_topk: int,
        group_cap: int,
        group_key=None,  # cache key for the device-staged code column
    ):
        """In-beam group-by (reference `expand_neighbors_by_group`,
        `hnsw_algorithm.cc:102-104`; per-group heaps `hnsw_context.h:25-230`).

        Runs the standard beam at the param's ef while harvesting a
        per-group-capped buffer from EVERYTHING the beam scores — traversal
        cost stays independent of the requested group count, unlike
        widening topk to group_count*group_topk. Returns (grp_sims (Q, R)
        desc, grp_rows (Q, R) local indices, grp_codes (Q, R)), -1 padded,
        or None when this engine/config takes a path without the grouped
        beam (tiny corpus, linear, mesh-sharded, routed tier, quantized,
        MIPS/Hamming transform) — callers fall back to iterative-deepening
        group-by."""
        if self._n == 0:
            return None
        self._ensure_fresh()
        queries, mask = self._normalize_query_args(queries, mask)
        if (
            self._mips
            or self._hamming
            or self.quantize != QuantizeType.UNDEFINED
            or self._route is not None
            or (self._dev is not None and self._dev.get("sharded"))
            or self._n < self.brute_force_threshold
            or (isinstance(param, QueryParam) and param.is_linear)
        ):
            return None
        from ..ops.hnsw import hnsw_search_grouped
        from ..ops.runtime import bucket_queries

        nq = queries.shape[0]
        ef = param.ef if isinstance(param, HnswQueryParam) else 500
        knobs = self._query_knobs(param)
        budget = jnp.int32(
            min(
                max(_MIN_SCAN_LIMIT, int(knobs["scan_ratio"] * self._n)),
                self._n,
            )
        )
        dmask = None
        if mask is not None:
            fm = np.zeros(self._codes.shape[0], dtype=bool)
            fm[: self._n] = mask
            dmask = jnp.asarray(fm)
        nq_pad = bucket_queries(nq)
        if nq_pad != nq:
            qpad = np.zeros((nq_pad, queries.shape[1]), np.float32)
            qpad[:nq] = queries
        else:
            qpad = np.asarray(queries, dtype=np.float32)
        out = hnsw_search_grouped(
            jnp.asarray(qpad),
            self._codes,
            self._norms,
            self._dev["l0"],
            self._dev["upper_ids"],
            self._dev["upper_nbrs"],
            self._dev["upper_down"],
            self._dev["entry_rows"],
            dmask,
            budget,
            self._group_codes_dev(group_codes, group_key),
            self._dequant,
            metric=self._search_metric,
            ef=ef,
            topk=1,  # the harvest buffer IS the result; res is unused
            max_steps=ef + knobs["steps_slack"],
            num_levels=self._dev["num_levels"],
            frontier=knobs["frontier"],
            visited_bits=knobs["visited_bits"]
            if knobs["visited_bits"]
            else (0 if self._codes.shape[0] <= (1 << 21) else 21),
            visited_bytes=knobs["visited_bytes"],
            approx_merge=knobs["approx_merge"],
            done_frac=knobs["done_frac"],
            group_cap=group_cap,
            group_topk=group_topk,
        )
        grp_s = np.asarray(out[2])[:nq]
        grp_i = np.asarray(out[3])[:nq].astype(np.int64)
        grp_g = np.asarray(out[4])[:nq]
        return grp_s, grp_i, grp_g

    def fused_sparse_dispatch(
        self,
        queries: np.ndarray,
        mask: Optional[np.ndarray],
        param,
        topk: int,
        sparse_args: tuple,  # (q_idx, q_val, doc_idx, doc_val, smask, vocab)
    ):
        """Dispatch the HNSW beam AND a sparse padded-CSR top-k as ONE
        device program (`ops/fused.py::fused_hnsw_sparse_topk`) — the
        dense+sparse multi-vector fusion shape with an ANN dense index.
        Returns (k, device (scores, indices)) or None when this config
        takes a path without the plain beam (tiny corpus, linear, sharded,
        routed, quantized, MIPS/Hamming)."""
        if self._n == 0:
            return None
        self._ensure_fresh()
        queries, mask = self._normalize_query_args(queries, mask)
        if (
            self._mips
            or self._hamming
            or self.quantize != QuantizeType.UNDEFINED
            or self._route is not None
            or (self._dev is not None and self._dev.get("sharded"))
            or self._n < self.brute_force_threshold
            or (isinstance(param, QueryParam) and param.is_linear)
        ):
            return None
        from ..ops.fused import fused_hnsw_sparse_topk
        from ..ops.runtime import bucket_queries

        nq = queries.shape[0]
        ef = param.ef if isinstance(param, HnswQueryParam) else 500
        k = min(topk, self._n)
        ef = max(ef, k)
        knobs = self._query_knobs(param)
        budget = jnp.int32(
            min(
                max(_MIN_SCAN_LIMIT, int(knobs["scan_ratio"] * self._n)),
                self._n,
            )
        )
        dmask = None
        if mask is not None:
            fm = np.zeros(self._codes.shape[0], dtype=bool)
            fm[: self._n] = mask
            dmask = jnp.asarray(fm)
        nq_pad = bucket_queries(nq)
        if nq_pad != nq:
            qpad = np.zeros((nq_pad, queries.shape[1]), np.float32)
            qpad[:nq] = queries
        else:
            qpad = np.asarray(queries, dtype=np.float32)
        q_idx, q_val, doc_idx, doc_val, smask, vocab = sparse_args
        out = fused_hnsw_sparse_topk(
            jnp.asarray(qpad),
            self._codes,
            self._norms,
            self._dev["l0"],
            self._dev["upper_ids"],
            self._dev["upper_nbrs"],
            self._dev["upper_down"],
            self._dev["entry_rows"],
            dmask,
            budget,
            q_idx,
            q_val,
            doc_idx,
            doc_val,
            smask,
            self._dequant,
            metric=self._search_metric,
            ef=ef,
            topk=k,
            max_steps=ef + knobs["steps_slack"],
            num_levels=self._dev["num_levels"],
            frontier=knobs["frontier"],
            int4_packed=getattr(self, "_int4_packed", False),
            visited_bits=knobs["visited_bits"]
            if knobs["visited_bits"]
            else (0 if self._codes.shape[0] <= (1 << 21) else 21),
            visited_bytes=knobs["visited_bytes"],
            approx_merge=knobs["approx_merge"],
            done_frac=knobs["done_frac"],
            vocab=vocab,
        )
        return k, out

    def _group_codes_dev(self, codes_np: np.ndarray, key):
        """Stage the factorized group-code column on device, padded to the
        engine's row padding; cached by `key` (field, write-version) so
        repeated group-by queries pay the H2D upload once."""
        cache = getattr(self, "_group_dev_cache", None)
        n_pad = self._codes.shape[0]
        if (
            cache is not None
            and key is not None
            and cache[0] == key
            and cache[1].shape[0] == n_pad
        ):
            return cache[1]
        padded = np.full(n_pad, -1, np.int32)
        padded[: len(codes_np)] = codes_np
        dev = jnp.asarray(padded)
        if key is not None:
            self._group_dev_cache = (key, dev)
        return dev

    # ------------- mesh-sharded search -------------
    def _sharded_flat(self, qpad, full_mask: np.ndarray, k: int):
        """Exact corpus-sharded scan over the mesh (brute-force threshold /
        is_linear / filtered-rescan paths in mesh mode)."""
        import jax

        from ..parallel.mesh import corpus_sharding, sharded_flat_search

        mesh = self._dev["mesh"]
        dmask = jax.device_put(full_mask, corpus_sharding(mesh, 1))
        return sharded_flat_search(
            mesh,
            jnp.asarray(np.asarray(qpad, dtype=np.float32)),
            self._codes,
            self._search_metric,
            k,
            mask=dmask,
            x_sq_norms=self._norms,
            dequant=self._dequant,
            int4_packed=getattr(self, "_int4_packed", False),
        )

    def _query_knobs(self, param) -> Dict[str, Any]:
        """Resolve per-query beam knobs: deprecated ZVEC_HNSW_* env override
        > typed HnswQueryParam field > index-param default > engine default.
        Resolved at DISPATCH time (never inside traced code) and passed as
        static jit args, so they always key the compile cache."""
        qp = param if isinstance(param, HnswQueryParam) else None
        env = os.environ
        frontier = int(
            env.get("ZVEC_HNSW_FRONTIER")
            or (qp.frontier if qp is not None and getattr(qp, "frontier", 0) else 0)
            or 4
        )
        steps_slack = int(
            env.get("ZVEC_HNSW_STEPS_SLACK")
            or (getattr(qp, "steps_slack", 64) if qp is not None else 64)
        )
        visited_bits = int(
            env.get("ZVEC_HNSW_VISITED_BITS")
            or (getattr(qp, "visited_bits", 0) if qp is not None else 0)
        )
        visited_bytes = bool(
            env.get("ZVEC_HNSW_VISITED_BYTES") == "1"
            or (getattr(qp, "visited_bytes", False) if qp is not None else False)
        )
        scan_ratio = (
            float(env.get("ZVEC_HNSW_MAX_SCAN_RATIO") or 0.0)
            or (getattr(qp, "max_scan_ratio", 0.0) if qp is not None else 0.0)
            or self.max_scan_ratio_cfg
            or _MAX_SCAN_RATIO
        )
        approx_merge = bool(
            env.get("ZVEC_HNSW_APPROX_MERGE") == "1"
            or (getattr(qp, "approx_merge", False) if qp is not None else False)
        )
        # default 0.97: measured zero tail damage at 10M (worst-decile mean
        # matches exact traversal) for +75% pipelined qps — see
        # benchmarks/knobs10m_r4.json and the HnswQueryParam docstring
        done_frac = float(
            env.get("ZVEC_HNSW_DONE_FRAC")
            or (getattr(qp, "done_frac", 0.97) if qp is not None else 0.97)
        )
        return {
            "frontier": frontier,
            "steps_slack": steps_slack,
            "visited_bits": visited_bits,
            "visited_bytes": visited_bytes,
            "scan_ratio": scan_ratio,
            "approx_merge": approx_merge,
            "done_frac": done_frac,
        }

    def _search_sharded(self, qpad, k: int, mask, ef: int, param=None):
        """Batched beam over every shard's local subgraph + ICI merge."""
        import jax

        from ..parallel.mesh import corpus_sharding, sharded_hnsw_search

        dev = self._dev
        mesh = dev["mesh"]
        R = dev["R"]
        knobs = self._query_knobs(param)
        budget = jnp.int32(
            min(max(_MIN_SCAN_LIMIT, int(knobs["scan_ratio"] * R)), R)
        )
        dmask = dev.get("valid")  # excludes empty-shard padding rows
        if mask is not None:
            fm = np.zeros(self._codes.shape[0], dtype=bool)
            fm[: self._n] = mask
            dmask = jax.device_put(fm, corpus_sharding(mesh, 1))
        return sharded_hnsw_search(
            mesh,
            jnp.asarray(np.asarray(qpad, dtype=np.float32)),
            self._codes,
            self._norms,
            dev["l0"],
            dev["upper_ids"],
            dev["upper_nbrs"],
            dev["upper_down"],
            dev["entry_rows"],
            dmask,
            budget,
            self._dequant,
            metric=self._search_metric,
            ef=ef,
            topk=k,
            max_steps=ef + knobs["steps_slack"],
            num_levels=dev["num_levels"],
            frontier=knobs["frontier"],
            int4_packed=getattr(self, "_int4_packed", False),
            # per-shard row space
            visited_bits=knobs["visited_bits"]
            if knobs["visited_bits"]
            else (0 if R <= (1 << 21) else 21),
        )

    # ------------- persistence -------------
    def dump_aux(self, directory: str, prefix: str) -> Dict[str, Any]:
        g = self._graph
        if g is None and self._shard_graphs is None:
            self._ensure_fresh()
            g = self._graph
        fname = f"hnsw_{prefix}.npz"
        if self._shard_graphs is not None:
            # mesh mode: per-shard subgraphs, keys prefixed s{i}_
            payload = {
                "n": np.int64(self._n),
                "m": np.int64(self.m),
                "shards": np.int64(len(self._shard_graphs)),
            }
            for si, sg in enumerate(self._shard_graphs):
                if sg is None:
                    continue
                p = f"s{si}_"
                payload[p + "levels"] = sg.levels
                payload[p + "l0"] = sg.l0
                payload[p + "entry_point"] = np.int64(sg.entry_point)
                payload[p + "max_level"] = np.int64(sg.max_level)
                for lvl in range(len(sg.upper_ids)):
                    payload[f"{p}upper_ids_{lvl}"] = sg.upper_ids[lvl]
                    payload[f"{p}upper_nbrs_{lvl}"] = sg.upper_nbrs[lvl]
            np.savez_compressed(os.path.join(directory, fname), **payload)
            return {
                "file": fname,
                "type": "hnsw",
                "m": self.m,
                "shards": len(self._shard_graphs),
            }
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


def _shard_graphs_from_aux(
    aux: Dict[str, np.ndarray], m: int, shards: int
) -> List[Optional[_Graph]]:
    """Reconstruct per-shard graphs from a sharded dump (keys s{i}_*)."""
    out: List[Optional[_Graph]] = []
    for si in range(shards):
        p = f"s{si}_"
        if p + "l0" not in aux:
            out.append(None)
            continue
        sub = {
            k[len(p):]: v for k, v in aux.items() if k.startswith(p)
        }
        sub["n"] = sub["l0"].shape[0]
        sub["m"] = aux.get("m", m)
        out.append(_graph_from_aux(sub, m))
    return out


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


def _host_prune_compact(
    X: np.ndarray,
    S: np.ndarray,
    cand: np.ndarray,  # (n, C) DESC-by-sim candidate rows, -1 pad
    metric: MetricType,
    max_out: int,
    alpha: float = 1.0,
    backfill_alpha: float = 0.0,
) -> np.ndarray:
    """Host twin of `prune_scored`'s dominance prune + backfill compact:
    keep candidate i iff no already-kept j has sim(i, j) >= sim(i, base);
    backfill remaining slots with the best dominance-pruned candidates
    (`_compact_keep_backfill`). Pair sims via batched BLAS on gathered
    vectors (fancy-indexing S for (B, C, C) pairs is random-read bound)."""
    n, C = cand.shape
    out = np.full((n, max_out), -1, np.int32)
    CH = max(64, int(2e8 // max(C * C * 4, 1)))  # ~200MB pair chunks
    for lo in range(0, n, CH):
        hi = min(lo + CH, n)
        cb = cand[lo:hi]
        valid = cb >= 0
        safe = np.clip(cb, 0, None)
        base_s = np.where(
            valid, S[np.arange(lo, hi)[:, None], safe], -np.inf
        ).astype(np.float32)
        vecs = X[safe]  # (B, C, D)
        pd = np.matmul(vecs, vecs.transpose(0, 2, 1))
        if metric == MetricType.L2:
            nr = (vecs.astype(np.float64) ** 2).sum(-1).astype(np.float32)
            pair = -(nr[:, :, None] + nr[:, None, :] - 2.0 * pd)
        elif metric == MetricType.COSINE:
            nn = np.sqrt(np.maximum((vecs**2).sum(-1), 0.0))
            den = nn[:, :, None] * nn[:, None, :]
            pair = np.divide(pd, den, out=np.ones_like(pd), where=den > 0)
        else:
            pair = pd
        b = hi - lo
        # alpha-relaxed dominance threshold (host twin of ops.hnsw
        # _prune_thresh — keep the two in lockstep)
        if alpha == 1.0:
            th = base_s
        elif metric == MetricType.L2:
            th = base_s * np.float32(1.0 / (alpha * alpha))
        elif metric == MetricType.COSINE:
            th = (1.0 - (1.0 - base_s) / alpha).astype(np.float32)
        else:
            th = base_s
        keep = np.zeros((b, C), bool)
        count = np.zeros(b, np.int32)
        for i in range(C):
            conflict = (keep & (pair[:, i, :] >= th[:, i, None])).any(axis=1)
            good = valid[:, i] & ~conflict & (count < max_out)
            keep[:, i] = good
            count += good
        if backfill_alpha:
            # host twin of the device second-round backfill prune
            # (ops.hnsw._compact_keep_backfill backfill_alpha tier)
            if backfill_alpha == 1.0:
                th2 = base_s
            elif metric == MetricType.L2:
                th2 = base_s * np.float32(1.0 / (backfill_alpha * backfill_alpha))
            elif metric == MetricType.COSINE:
                th2 = (1.0 - (1.0 - base_s) / backfill_alpha).astype(np.float32)
            else:
                th2 = base_s
            pruned = valid & ~keep
            keep2 = np.zeros((b, C), bool)
            count2 = np.zeros(b, np.int32)
            for i in range(C):
                conflict = (keep2 & (pair[:, i, :] >= th2[:, i, None])).any(axis=1)
                good = pruned[:, i] & ~conflict & (count2 < max_out)
                keep2[:, i] = good
                count2 += good
            tier = np.where(
                keep, 0, np.where(keep2, 1, np.where(valid, 2, 3))
            ).astype(np.int8)
            rank = np.argsort(tier, axis=1, kind="stable")
            tier_c = np.take_along_axis(tier, rank, 1)[:, :max_out]
            ids_c = np.take_along_axis(cb, rank, 1)[:, :max_out]
            ids_c = np.where(tier_c < 3, ids_c, -1)
            out[lo:hi, : ids_c.shape[1]] = ids_c
            continue
        tier = np.where(keep, 0, np.where(valid, 1, 2)).astype(np.int8)
        rank = np.argsort(tier, axis=1, kind="stable")
        tier_c = np.take_along_axis(tier, rank, 1)[:, :max_out]
        ids_c = np.take_along_axis(cb, rank, 1)[:, :max_out]
        ids_c = np.where(tier_c < 2, ids_c, -1)
        out[lo:hi, : ids_c.shape[1]] = ids_c
    return out


def _reverse_candidates(adj: np.ndarray, cap: int) -> np.ndarray:
    """Reverse-edge candidates per node, capped (vectorized host pass).
    For every forward edge u -> v, u becomes a candidate neighbor of v —
    the batched analog of the reference's connect-back loop
    (`hnsw_algorithm.cc` mutually_connect).

    Grouping by destination is a compiled scipy CSR->CSC conversion (a
    two-pass counting sort at memory speed); np.argsort over the edge list
    was the whole phase's hot spot (76.7s of 123.6s at 2.5M x 100 edges —
    numpy has no radix ARGsort), and the (n, cap) gather-matrix tail cost
    another 33.7s. This path measures ~8x faster at the same shapes."""
    n, m = adj.shape
    try:
        from scipy import sparse as _sp
    except ImportError:
        _sp = None
    if _sp is None or n * m == 0:
        return _reverse_candidates_argsort(adj, cap)
    src_all = np.repeat(np.arange(n, dtype=np.int32), m)
    dst = adj.reshape(-1)
    ok = dst >= 0
    dst = dst[ok].astype(np.int32, copy=False)
    src = src_all[ok]
    if len(src) == 0:
        return np.full((n, cap), -1, np.int32)
    row_counts = ok.reshape(n, m).sum(axis=1)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_counts, out=indptr[1:])
    # CSR (row=src, col=dst, data=src) -> CSC groups data by dst, preserving
    # src order within each group (same order the argsort path produced)
    csc = _sp.csr_matrix((src + 1, dst, indptr), shape=(n, n)).tocsc()
    data = csc.data  # src + 1, grouped by dst
    e = len(data)
    idx_t = np.int32 if e < np.iinfo(np.int32).max - cap else np.int64
    starts = csc.indptr[:-1].astype(idx_t, copy=False)
    counts = np.diff(csc.indptr).astype(np.int32, copy=False)
    # first `cap` srcs per group via a near-sequential gather (groups are
    # contiguous in csc.data; fancy SCATTER with bool masks measured ~2x this)
    take = starts[:, None] + np.arange(cap, dtype=idx_t)[None, :]
    np.minimum(take, idx_t(e - 1), out=take)
    gathered = data[take]
    validm = np.arange(cap, dtype=np.int32)[None, :] < counts[:, None]
    return np.where(validm, gathered - 1, -1).astype(np.int32, copy=False)


def _reverse_candidates_argsort(adj: np.ndarray, cap: int) -> np.ndarray:
    """Pure-numpy fallback twin of `_reverse_candidates` (no scipy)."""
    n, m = adj.shape
    dst = adj.reshape(-1)
    src = np.repeat(np.arange(n, dtype=np.int32), m)
    ok = dst >= 0
    dst = dst[ok]
    src = src[ok]
    order = np.argsort(dst, kind="stable")
    dst = dst[order]
    src = src[order]
    bounds = np.searchsorted(dst, np.arange(n + 1, dtype=np.int64))
    starts, ends = bounds[:-1], bounds[1:]
    counts = np.minimum(ends - starts, cap)
    take = starts[:, None] + np.arange(cap)[None, :]
    validm = np.arange(cap)[None, :] < counts[:, None]
    take = np.clip(take, 0, max(len(src) - 1, 0))
    if len(src) == 0:
        return np.full((n, cap), -1, np.int32)
    return np.where(validm, src[take], -1).astype(np.int32)
