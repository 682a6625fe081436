"""IVF engine: clustered-matmul probe.

Reference behavior (`src/core/algorithm/ivf/`): train k-means centroids
(`ivf_builder.cc`), assign vectors to inverted lists, search = centroid
search -> scan nprobe lists -> heap merge (`ivf_searcher.cc:183-250`), with a
brute-force fallback below a small-corpus threshold (`ivf_searcher.cc:185`)
and optional SOAR spilled assignment (`use_soar`, `index_params.h:252-258`).

TPU-native layout: lists are padded to one fixed length L so the probe is a
static-shape program — centroid scoring is a (Q, K) matmul, then the selected
nprobe lists gather as a (Q, nprobe, L, D) block scored in one einsum with
pad/filter masks fused. Quantized codes keep dequant in the epilogue.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model.param.param import IVFQueryParam, QueryParam
from ..ops.distance import similarity_matrix
from ..ops.kmeans import kmeanspp_seed, lloyd
from ..ops.quantize import QuantParams, decode, encode, train_quantizer
from ..ops.runtime import NEG_INF
from ..typing.enum import IndexType, MetricType, QuantizeType
from .interface import VectorIndexEngine, register_engine, rescan_deficient
from .refiner import refine

__all__ = ["IvfEngine"]

_BRUTE_FORCE_THRESHOLD = 1000
_DEFAULT_NPROBE = 10


def ivf_probe_core(
    q: jax.Array,  # (Q, D)
    centroids: jax.Array,  # (K, D)
    lists_codes: jax.Array,  # (K, L, D) storage dtype
    lists_norms: jax.Array,  # (K, L) dequantized sq norms
    lists_ids: jax.Array,  # (K, L) row ids, -1 pad
    mask: Optional[jax.Array],  # (N,) bool or None
    dequant,
    *,
    metric: MetricType,
    nprobe: int,
    topk: int,
    int4_packed: bool = False,
    cent_valid: Optional[jax.Array] = None,  # (K,) bool: dummy-list mask
    max_scan: int = 0,  # cap on scanned rows per query; 0 = unbounded
):
    """Unjitted probe core, reused by the single-device jit wrapper below
    and by the mesh-sharded path (`parallel/mesh.py::sharded_ivf_probe`,
    where K is the per-shard virtual-list count and `cent_valid` masks the
    shard-padding dummy lists out of the centroid top-k)."""
    q = q.astype(jnp.float32)
    nq = q.shape[0]
    lmax = lists_codes.shape[1]
    cent_sims = similarity_matrix(q, centroids, metric)  # (Q, K)
    if cent_valid is not None:
        cent_sims = jnp.where(cent_valid[None, :], cent_sims, NEG_INF)
    _, sel = jax.lax.top_k(cent_sims, nprobe)  # (Q, nprobe)

    q_sq = jnp.sum(q * q, axis=-1)[:, None]  # (Q, 1)
    q_n = jnp.sqrt(q_sq)
    k = min(topk, nprobe * lmax)

    # scan one probed list per step so the gathered block stays (Q, L, D) —
    # HBM-safe at large K x L (the reference scans nprobe lists sequentially
    # per query too, `ivf_searcher.cc:183-250`)
    def step(carry, p):
        cs, ci, scanned = carry
        lst = sel[:, p]  # (Q,)
        codes = lists_codes[lst]  # (Q, L, D) or (Q, L, D/2) packed
        norms = lists_norms[lst]  # (Q, L)
        ids = lists_ids[lst]  # (Q, L)
        if int4_packed:
            lo = (jnp.left_shift(codes, 4) >> 4).astype(jnp.float32)
            hi = (codes >> 4).astype(jnp.float32)
            d2 = codes.shape[-1]
            q_even = q[:, 0 : 2 * d2 : 2]
            q_odd = q[:, 1 : 2 * d2 : 2]
            if q_odd.shape[1] < d2:
                q_odd = jnp.pad(q_odd, ((0, 0), (0, d2 - q_odd.shape[1])))
            dots = jnp.einsum(
                "qd,qld->ql", q_even, lo, precision=jax.lax.Precision.HIGHEST
            ) + jnp.einsum(
                "qd,qld->ql", q_odd, hi, precision=jax.lax.Precision.HIGHEST
            )
            if dequant is not None:
                dots = dequant[0] * dots + dequant[1] * jnp.sum(
                    q, axis=-1, keepdims=True
                )
        else:
            if codes.dtype != jnp.float32:
                codes = codes.astype(jnp.float32)
                if dequant is not None:
                    codes = codes * dequant[0] + dequant[1]
            dots = jnp.einsum(
                "qd,qld->ql", q, codes, precision=jax.lax.Precision.HIGHEST
            )
        if metric == MetricType.IP:
            sims = dots
        elif metric == MetricType.L2:
            sims = -(q_sq + norms - 2.0 * dots)
        else:  # COSINE
            denom = q_n * jnp.sqrt(norms)
            sims = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 1.0)
        valid = ids >= 0
        if max_scan > 0:
            # per-query scan budget across probed lists: the reference stops
            # probing FURTHER centroids once the scanned-row total crosses
            # max_scan_count, but a list that STARTS under budget is scanned
            # in full (`ivf_searcher.cc:222-237` checks at the loop head)
            active = scanned < max_scan  # (Q,)
            scanned = scanned + jnp.where(
                active, jnp.sum(valid, axis=1, dtype=jnp.int32), 0
            )
            valid = valid & active[:, None]
        if mask is not None:
            valid = valid & mask[jnp.clip(ids, 0)]
        sims = jnp.where(valid, sims, NEG_INF)
        all_s = jnp.concatenate([cs, sims], axis=1)
        all_i = jnp.concatenate([ci, ids], axis=1)
        ns, pos = jax.lax.top_k(all_s, k)
        ni = jnp.take_along_axis(all_i, pos, 1)
        return (ns, ni, scanned), None

    init = (
        jnp.full((nq, k), NEG_INF, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
        jnp.zeros((nq,), jnp.int32),
    )
    (out_s, out_i, _), _ = jax.lax.scan(step, init, jnp.arange(nprobe))
    out_i = jnp.where(out_s > NEG_INF / 2, out_i, -1)
    return out_s, out_i


# jitted single-device entry point
_ivf_probe = partial(
    jax.jit,
    static_argnames=("metric", "nprobe", "topk", "int4_packed", "max_scan"),
)(ivf_probe_core)


def _dedupe_topk(sims: np.ndarray, idx: np.ndarray, topk: int):
    """Keep-first dedupe of (desc-sorted) candidate rows, then truncate."""
    nq = sims.shape[0]
    out_s = np.full((nq, topk), -np.inf, dtype=np.float32)
    out_i = np.full((nq, topk), -1, dtype=np.int64)
    for qi in range(nq):
        seen = set()
        w = 0
        for s, i in zip(sims[qi], idx[qi]):
            if i < 0 or i in seen:
                continue
            seen.add(i)
            out_s[qi, w] = s
            out_i[qi, w] = i
            w += 1
            if w == topk:
                break
    return out_s, out_i


@register_engine(IndexType.IVF)
class IvfEngine(VectorIndexEngine):
    query_param_class = IVFQueryParam

    def __init__(self, metric: MetricType, dimension: int, params=None):
        super().__init__(metric, dimension, params)
        self.n_list = params.n_list if params is not None else 0
        self.n_iters = params.n_iters if params is not None else 10
        self.use_soar = bool(params.use_soar) if params is not None else False
        self.quantize = (
            QuantizeType(params.quantize_type)
            if params is not None
            else QuantizeType.UNDEFINED
        )
        self._qparams: Optional[QuantParams] = None
        self._dequant = None
        self._n = 0
        self._centroids = None
        self._lists_codes = None
        self._lists_norms = None
        self._lists_ids = None
        self._loaded_aux = None
        self._trained = None  # host copies for persistence
        self._smesh = None  # collection mesh when list buffers are sharded
        self._cent_valid = None

    def _mesh(self):
        from ..parallel.mesh import collection_mesh

        return collection_mesh()

    # ------------- build -------------
    def _effective_n_list(self, n: int) -> int:
        if self.n_list > 0:
            return min(self.n_list, max(1, n))
        # auto heuristic: ~4*sqrt(N), capped (reference default constant 1024)
        return int(min(1024, max(1, 4 * np.sqrt(n))))

    def _rebuild(self, data: np.ndarray) -> None:
        data = np.asarray(data, dtype=np.float32)
        self._n = data.shape[0]
        if self._n == 0:
            self._centroids = None
            return

        if (
            self._loaded_aux is not None
            and int(self._loaded_aux["n"]) == self._n
        ):
            centroids = self._loaded_aux["centroids"]
            assign_rows = self._loaded_aux["assign_rows"]
            assign_lists = self._loaded_aux["assign_lists"]
            qp = self._loaded_aux.get("qparams")
            if qp is not None and qp.size:
                self._qparams = QuantParams(float(qp[0]), float(qp[1]), int(qp[2]))
        else:
            k = self._effective_n_list(self._n)
            rng = np.random.default_rng(0xC0FFEE + self._n)
            if k >= 256:
                # stratified two-level training at large K (reference
                # StratifiedCluster role)
                from ..ops.kmeans import stratified_train

                seeds = stratified_train(data, k, rng, iters=self.n_iters)
            else:
                seeds = kmeanspp_seed(data, k, rng)
            centroids, assign1 = lloyd(
                jnp.asarray(data), jnp.asarray(seeds), iters=self.n_iters
            )
            centroids = np.asarray(centroids)
            assign1 = np.asarray(assign1)
            if self.use_soar and centroids.shape[0] > 1:
                from ..ops.kmeans import assign_top2

                a2 = np.asarray(assign_top2(jnp.asarray(data), jnp.asarray(centroids)))
                # Spill-ratio gate (the boundary condition real SOAR carries,
                # `index_params.h:252-258` / ScaNN's spilling): only points
                # whose second centroid is within tau of the first spill a
                # secondary copy. Unconditional top-2 degenerates on
                # clustered corpora — a centroid near the global mean is
                # never anyone's FIRST choice but everyone's second: at 10M
                # measured 3.96M secondaries in ONE list (968 virtual
                # sublists, every query's nprobe widened by 967) while 773
                # lists got zero.
                tau2 = 1.44  # (d2/d1)^2 <= 1.44, i.e. d2 <= 1.2*d1
                d1 = np.empty(self._n, np.float32)
                d2 = np.empty(self._n, np.float32)
                CH = 1 << 20
                for lo in range(0, self._n, CH):
                    hi = min(lo + CH, self._n)
                    x = data[lo:hi]
                    for dst, ci in ((d1, a2[lo:hi, 0]), (d2, a2[lo:hi, 1])):
                        c = centroids[ci]
                        dst[lo:hi] = (
                            np.einsum("ij,ij->i", x, x)
                            - 2.0 * np.einsum("ij,ij->i", x, c)
                            + np.einsum("ij,ij->i", c, c)
                        )
                spill = d2 <= tau2 * np.maximum(d1, 1e-12)
                rows = np.arange(self._n)
                assign_rows = np.concatenate([rows, rows[spill]])
                assign_lists = np.concatenate([a2[:, 0], a2[spill, 1]])
            else:
                assign_rows = np.arange(self._n)
                assign_lists = assign1
            if self.quantize in (QuantizeType.INT8, QuantizeType.INT4):
                store = data
                if self.metric == MetricType.COSINE:
                    nrm = np.linalg.norm(store, axis=1, keepdims=True)
                    store = np.where(nrm > 0, store / np.where(nrm > 0, nrm, 1), store)
                self._qparams = train_quantizer(store, self.quantize)

        self._assemble_lists(data, centroids, assign_rows, assign_lists)
        self._trained = {
            "n": np.int64(self._n),
            "centroids": centroids,
            "assign_rows": assign_rows.astype(np.int64),
            "assign_lists": assign_lists.astype(np.int64),
            "qparams": np.asarray(
                [self._qparams.scale, self._qparams.bias, self._qparams.qtype]
            )
            if self._qparams
            else np.zeros(0),
        }

    def _assemble_lists(self, data, centroids, assign_rows, assign_lists) -> None:
        k = centroids.shape[0]
        store = data
        if self.metric == MetricType.COSINE and self.quantize != QuantizeType.UNDEFINED:
            nrm = np.linalg.norm(store, axis=1, keepdims=True)
            store = np.where(nrm > 0, store / np.where(nrm > 0, nrm, 1), store)
        codes = encode(store, self.quantize, self._qparams)
        deq_norms = (decode(codes, self._qparams) ** 2).sum(1)

        # vectorized list assembly: stable-sort entries by list, then each
        # entry's slot is its rank within its list
        assign_rows = np.asarray(assign_rows, dtype=np.int64)
        assign_lists = np.asarray(assign_lists, dtype=np.int64)
        counts = np.bincount(assign_lists, minlength=k)
        n_entries = len(assign_rows)

        # Bucketed padding: a skewed cluster must not inflate every list to
        # its length (a 100k-row list with K=1024 would allocate
        # (1024, 100k, D) — ~51GB at D=128 fp32). Lists longer than a bucket
        # cap split into virtual sublists sharing the (replicated) centroid,
        # so HBM stays O(N*D + K*B*D). The probe's top-k over centroids then
        # naturally spends extra probes on heavy clusters (the reference
        # instead scans variable-length list blocks, `ivf_entity.cc:587-734`).
        # hard bucket cap 4096: the average list at 10M (SOAR: 2N entries /
        # 1024 lists ~ 19.5k rows) would otherwise set bucket ~ 39k, which
        # (a) pads K x bucket ~ 23GB of resident waste and (b) makes the
        # probe's per-step (Q, lmax, D) gather 15GB at Q=1024 — both OOM
        # the 15.75G HBM. 4096 keeps the 1M-scale layout (bucket ~ 3.9k)
        # unchanged while 10M splits heavy lists into ~5 virtual sublists.
        bucket = int(
            np.ceil(
                max(
                    8,
                    min(
                        counts.max(initial=1),
                        2 * n_entries / max(k, 1) + 8,
                        4096,
                    ),
                )
                / 8
            )
            * 8
        )
        n_chunks = np.maximum(1, -(-counts // bucket))  # ceil_div, >=1
        v_of_list = np.zeros(k + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=v_of_list[1:])
        kv = int(v_of_list[-1])
        lmax = int(min(max(counts.max(initial=1), 1), bucket))

        order = np.argsort(assign_lists, kind="stable")
        sorted_lists = assign_lists[order]
        sorted_rows = assign_rows[order]
        starts = np.zeros(k + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        slots = np.arange(len(order)) - starts[sorted_lists]
        v_lists = v_of_list[sorted_lists] + slots // bucket
        v_slots = slots % bucket

        lists_codes = np.zeros((kv, lmax, data.shape[1]), dtype=codes.dtype)
        lists_norms = np.zeros((kv, lmax), dtype=np.float32)
        lists_ids = np.full((kv, lmax), -1, dtype=np.int32)
        lists_codes[v_lists, v_slots] = codes[sorted_rows]
        lists_norms[v_lists, v_slots] = deq_norms[sorted_rows]
        lists_ids[v_lists, v_slots] = sorted_rows
        # host flat view of slot -> global row (-1 padding): the linear-scan
        # path maps fused-kernel positions back to rows without a device trip
        self._flat_ids = lists_ids.reshape(-1).copy()
        self._int4_packed = self.quantize == QuantizeType.INT4
        if self._int4_packed:
            # nibble-pack list codes (2 per byte) — halves HBM + scan traffic
            from ..ops.quantize import pack_int4

            kv2, lmax2, dd = lists_codes.shape
            lists_codes = (
                pack_int4(lists_codes.reshape(kv2 * lmax2, dd))
                .reshape(kv2, lmax2, (dd + 1) // 2)
            )
        v_centroids = np.repeat(centroids, n_chunks, axis=0)
        # nprobe compensation: a real list split into C chunks needs C probes
        # to be scanned fully (all C share the centroid similarity, so they
        # rank adjacently) — widen the probe count by the worst split so
        # "nprobe lists" keeps the reference's full-list-scan semantics.
        self._extra_probes = int(n_chunks.max(initial=1)) - 1
        if self._extra_probes > 8:
            # one pathological 400k-row list widens EVERY query's effective
            # nprobe by ~98 — surface the skew instead of silently paying it
            import logging

            logging.getLogger("zvec_tpu").warning(
                "ivf: worst list splits into %d chunks of %d rows; every "
                "query's effective nprobe widens by %d — consider more "
                "centroids (num_centroids) for this distribution",
                self._extra_probes + 1,
                bucket,
                self._extra_probes,
            )

        v_centroids = v_centroids.astype(np.float32)
        mesh = self._mesh()
        self._smesh = mesh if (mesh is not None and self._n >= _BRUTE_FORCE_THRESHOLD) else None
        if self._smesh is not None:
            # mesh scale-out: virtual lists shard over the 'corpus' axis;
            # every shard probes its local top-nprobe (union ⊇ the global
            # top-nprobe) and merges over ICI (`parallel/mesh.py::
            # sharded_ivf_probe`; the reference's analog is per-segment plan
            # fan-out, `query_planner.cc:344-448`)
            import jax as _jax

            from ..parallel.mesh import corpus_sharding

            s_count = self._smesh.shape["corpus"]
            kv_pad = -(-kv // s_count) * s_count
            if kv_pad != kv:
                padn = kv_pad - kv
                v_centroids = np.pad(v_centroids, ((0, padn), (0, 0)))
                lists_codes = np.pad(lists_codes, ((0, padn), (0, 0), (0, 0)))
                lists_norms = np.pad(lists_norms, ((0, padn), (0, 0)))
                lists_ids = np.pad(lists_ids, ((0, padn), (0, 0)), constant_values=-1)
            cent_valid = np.zeros(kv_pad, dtype=bool)
            cent_valid[:kv] = True
            # re-derive the flat slot->row map over the PADDED list buffer
            # (the linear-scan path reshapes the padded (KV, L) arrays)
            self._flat_ids = lists_ids.reshape(-1).copy()
            sh1 = corpus_sharding(self._smesh, 1)
            sh2 = corpus_sharding(self._smesh, 2)
            sh3 = corpus_sharding(self._smesh, 3)
            self._centroids = _jax.device_put(v_centroids, sh2)
            self._lists_codes = _jax.device_put(lists_codes, sh3)
            self._lists_norms = _jax.device_put(lists_norms, sh2)
            self._lists_ids = _jax.device_put(lists_ids, sh2)
            self._cent_valid = _jax.device_put(cent_valid, sh1)
            if self._qparams is not None:
                self._dequant = (
                    jnp.float32(self._qparams.scale),
                    jnp.float32(self._qparams.bias),
                )
            return

        self._centroids = jnp.asarray(v_centroids)
        self._lists_codes = jnp.asarray(lists_codes)
        self._lists_norms = jnp.asarray(lists_norms)
        self._lists_ids = jnp.asarray(lists_ids)
        if self._qparams is not None:
            self._dequant = (
                jnp.float32(self._qparams.scale),
                jnp.float32(self._qparams.bias),
            )

    def _linear_scan(self, qpad, mask, scan_k):
        """Exact scan as ONE fused flat kernel over the list-concatenated
        code buffer ((KV, lmax, D) viewed flat), padding and filter fused as
        a mask; kernel positions map back to global rows via the host flat-id
        table. Serves brute-force fallback, explicit is_linear queries, and
        the filtered-probe safety net."""
        from ..ops.topk import blockwise_topk_search

        kv, lmax = self._lists_ids.shape
        flat_codes = self._lists_codes.reshape(kv * lmax, -1)
        flat_norms = self._lists_norms.reshape(kv * lmax)
        ids = self._flat_ids
        valid = ids >= 0
        if mask is not None:
            valid = valid & np.asarray(mask, dtype=bool)[np.clip(ids, 0, None)]
        sims, pos = blockwise_topk_search(
            jnp.asarray(qpad),
            flat_codes,
            self.metric,
            min(scan_k, int(valid.sum()) or 1),
            mask=jnp.asarray(valid),
            x_sq_norms=flat_norms,
            dequant=self._dequant,
            int4_packed=getattr(self, "_int4_packed", False),
        )
        sims = np.asarray(sims)
        pos = np.asarray(pos)
        idx = np.where(pos >= 0, ids[np.clip(pos, 0, None)], -1)
        return sims, idx.astype(np.int64)

    # ------------- search -------------
    def _search_impl(self, queries, topk, mask, param):
        nq = queries.shape[0]
        if self._n == 0:
            return (
                np.full((nq, topk), -np.inf, np.float32),
                np.full((nq, topk), -1, np.int64),
            )
        nprobe = (
            param.nprobe if isinstance(param, IVFQueryParam) else _DEFAULT_NPROBE
        )
        # per-query scanned-row budget (`ivf_searcher_context.h:75-77`:
        # max_scan_count = ceil(N * scan_ratio), floored by the brute-force
        # threshold so a bounded probe never returns less than the bf path)
        max_scan = 0
        if isinstance(param, IVFQueryParam):
            max_scan = int(param.max_scan_count)
            if not max_scan and param.max_scan_ratio:
                max_scan = int(np.ceil(self._n * param.max_scan_ratio))
            if max_scan:
                max_scan = max(max_scan, _BRUTE_FORCE_THRESHOLD)
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

        k_lists = self._centroids.shape[0]
        # brute-force fallback: tiny corpus or explicit linear search runs ONE
        # fused flat kernel over the list-concatenated codes instead of
        # probing every list (`ivf_searcher.cc:185` threshold behavior; the
        # per-list probe at nprobe=K is ~100x slower than the flat scan)
        linear = self._n < _BRUTE_FORCE_THRESHOLD or getattr(
            param, "is_linear", False
        )
        nprobe = min(nprobe + getattr(self, "_extra_probes", 0), k_lists)
        dmask = jnp.asarray(mask) if mask is not None else None
        # pad the batch to a bucket: probe programs compile per query count
        from ..ops.runtime import bucket_queries

        nq_pad = bucket_queries(nq)
        if nq_pad != nq:
            qpad = np.zeros((nq_pad, queries.shape[1]), np.float32)
            qpad[:nq] = queries
        else:
            qpad = np.asarray(queries, dtype=np.float32)
        # SOAR spilling duplicates rows across lists: overscan and dedupe
        scan_k = 2 * topk if self.use_soar else topk
        if linear:
            sims, idx = self._linear_scan(qpad, mask, scan_k)
        elif self._smesh is not None:
            from ..parallel.mesh import sharded_ivf_probe

            sims, idx = sharded_ivf_probe(
                self._smesh,
                jnp.asarray(qpad),
                self._centroids,
                self._lists_codes,
                self._lists_norms,
                self._lists_ids,
                self._cent_valid,
                dmask,
                self._dequant,
                metric=self.metric,
                nprobe=nprobe,
                topk=scan_k,
                int4_packed=getattr(self, "_int4_packed", False),
                max_scan=max_scan,
            )
        else:
            # Query-block cap at 10M-scale lists: each probe step gathers a
            # (Q, lmax, D) block — at Q=1024, lmax=4096, D=128 that is two
            # live 2.1GB buffers next to the 5.3GB resident lists (measured
            # OOM: 18.14G of 15.75G). 512-query blocks keep the probe
            # program under ~8GB; blocks dispatch async and fetch in order.
            lists_bytes = (
                self._lists_codes.size * self._lists_codes.dtype.itemsize
            )
            qb = nq_pad if lists_bytes < 3_000_000_000 else min(nq_pad, 512)
            handles = []
            for lo in range(0, nq_pad, qb):
                handles.append(
                    _ivf_probe(
                        jnp.asarray(qpad[lo : lo + qb]),
                        self._centroids,
                        self._lists_codes,
                        self._lists_norms,
                        self._lists_ids,
                        dmask,
                        self._dequant,
                        metric=self.metric,
                        nprobe=nprobe,
                        topk=scan_k,
                        int4_packed=getattr(self, "_int4_packed", False),
                        max_scan=max_scan,
                    )
                )
            if len(handles) == 1:
                sims, idx = handles[0]
            else:
                sims = np.concatenate([np.asarray(h[0]) for h in handles])
                idx = np.concatenate([np.asarray(h[1]) for h in handles])
        sims, idx = np.asarray(sims), np.asarray(idx).astype(np.int64)
        if self.use_soar:
            sims, idx = _dedupe_topk(sims, idx, topk)
        sims, idx = sims[:nq], idx[:nq]  # drop bucket-padding rows
        if mask is not None and not linear:
            # Filtered-probe safety net (deliberate improvement over the
            # reference, which returns whatever the nprobe lists contain —
            # possibly nothing): queries whose probed lists supplied fewer
            # valid hits than the filter allows fall back to the exact
            # masked flat scan over all lists.
            def _all_lists():
                fs, fi = self._linear_scan(qpad, mask, scan_k)
                fs, fi = np.asarray(fs), np.asarray(fi).astype(np.int64)
                if self.use_soar:
                    fs, fi = _dedupe_topk(fs, fi, topk)
                return fs, fi

            sims, idx = rescan_deficient(sims, idx, topk, mask, _all_lists)
        if use_refiner:
            sims, idx = refine(self._data_fn, queries, idx, self.metric, out_topk)
            idx = idx.astype(np.int64)
            topk = out_topk
        if sims.shape[1] < topk:
            pad = topk - sims.shape[1]
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = sims[:, :topk]
        idx = idx[:, :topk]
        sims = np.where(idx >= 0, sims, -np.inf)
        return sims, idx

    # ------------- persistence -------------
    def dump_aux(self, directory, prefix):
        import os

        if self._trained is None:
            self._ensure_fresh()
        fname = f"ivf_{prefix}.npz"
        np.savez_compressed(os.path.join(directory, fname), **self._trained)
        return {"file": fname, "type": "ivf"}

    def load_aux(self, directory, descriptor):
        import os

        path = os.path.join(directory, descriptor.get("file", ""))
        if os.path.exists(path):
            self._loaded_aux = dict(np.load(path))
