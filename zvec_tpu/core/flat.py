"""FLAT engine: exact brute-force scan on the MXU (+ quantized variants).

Replaces the reference's flat algorithm (`src/core/algorithm/flat/
flat_searcher_context.h:237-314`: K-way query batching over SIMD distance
matrices + bounded heaps) with a single fused device program: pad codes into
HBM once, then every query batch runs `blockwise_topk_search` (matmul tile x
mask fuse x running lax.top_k).

Quantization (reference converter/reformer pairs, `src/core/quantizer/`):
`quantize_type` on the index params stores fp16 or int8/int4 codes in HBM and
scores asymmetrically with dequant fused into the matmul epilogue; COSINE
codes are L2-normalized before quantization (`cosine_converter.cc:383-399`);
`is_using_refiner` overscans and re-ranks against fp32 (`basic_refiner.cc`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..model.param.param import FlatQueryParam, QueryParam
from ..ops.quantize import QuantParams, decode, encode, train_quantizer
from ..ops.runtime import bucket_queries as _bucket_queries
from ..ops.runtime import round_up
from ..ops.topk import blockwise_topk_search
from ..typing.enum import IndexType, MetricType, QuantizeType
from .interface import VectorIndexEngine, register_engine
from .refiner import refine

__all__ = ["FlatEngine"]

# Row padding granularity; block scan kicks in above one block.
_ROW_ALIGN = 1024  # minimum Pallas tile multiple
_ROW_ALIGN_BIG = 8192  # large corpora pad to the max Pallas tile: the fused
# kernel's extraction cost scales ~1/GROUP = LANES/TILE, so an 8192 tile cuts
# the dominant per-tile top-k passes 8x vs 1024 (see ops/flat_pallas.py)
_BIG_N = 100_000  # matches the _use_pallas corpus threshold
_BLOCK_SIZE = 131072




class _State(NamedTuple):
    """One immutable device snapshot; swapped atomically by _rebuild so
    concurrent readers racing a writer always see a consistent
    (codes, norms, n, n_pad) quadruple (query-during-append safety)."""

    codes: Optional[jnp.ndarray]  # (n_pad, D) device, storage dtype
    norms: Optional[jnp.ndarray]  # (n_pad,) device f32 (dequantized norms)
    n: int
    n_pad: int
    dequant: Optional[tuple]
    int4_packed: bool


_EMPTY = _State(None, None, 0, 0, None, False)


@register_engine(IndexType.FLAT)
class FlatEngine(VectorIndexEngine):
    query_param_class = FlatQueryParam

    def __init__(self, metric: MetricType, dimension: int, params=None):
        super().__init__(metric, dimension, params)
        self.quantize = (
            QuantizeType(params.quantize_type)
            if params is not None
            else QuantizeType.UNDEFINED
        )
        # binary modes: HAMMING-metric fields hold packed bit codes;
        # QuantizeType.BINARY binarizes float codes (reference
        # BinaryConverter, `binary_converter.cc`). Both scan as ±1 vectors
        # under L2 — hamming = ||q - x||^2 / 4 on {±1}^D — so every scan
        # path (Pallas / blockwise / mesh-sharded) rides the MXU unchanged.
        self._hamming = self.metric == MetricType.HAMMING
        self._binary_codes = self.quantize == QuantizeType.BINARY
        if self._binary_codes and self.metric != MetricType.L2:
            raise ValueError("QuantizeType.BINARY requires MetricType.L2")
        self._st: _State = _EMPTY
        self._qparams: Optional[QuantParams] = None
        # device-resident mask cache: repeated queries with the same
        # alive/filter mask (the common case: no deletes between queries)
        # reuse one HBM buffer instead of re-uploading N bytes per batch —
        # through the dev tunnel one H2D costs ~0.5s at 1M rows.
        self._mask_cache: dict = {}

    def _device_mask(self, st: _State, full_mask: np.ndarray, as_int8: bool):
        import hashlib

        digest = hashlib.blake2b(full_mask.tobytes(), digest_size=16).digest()
        key = (id(st.codes), digest, as_int8)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        dev = jnp.asarray(full_mask.astype(np.int8) if as_int8 else full_mask)
        if len(self._mask_cache) >= 8:
            self._mask_cache.clear()
        self._mask_cache[key] = dev
        return dev

    # legacy attribute views (tests/tools may poke these)
    @property
    def _n(self) -> int:
        return self._st.n

    @property
    def _codes(self):
        return self._st.codes

    @property
    def _norms(self):
        return self._st.norms

    @property
    def _dequant(self):
        return self._st.dequant

    def _prepare(self, data: np.ndarray) -> tuple:
        """Storage-side transform: cosine-normalize, then quantize.
        Returns (codes, dequant)."""
        if self._hamming:
            from ..ops.quantize import bits_to_pm1, unpack_bits

            bits = unpack_bits(np.ascontiguousarray(data), self.dimension)
            return bits_to_pm1(bits), None
        data = data.astype(np.float32, copy=False)
        if self._binary_codes:
            from ..ops.quantize import binarize, bits_to_pm1

            return bits_to_pm1(binarize(data)), None
        if self.metric == MetricType.COSINE and self.quantize != QuantizeType.UNDEFINED:
            norms = np.linalg.norm(data, axis=1, keepdims=True)
            data = np.where(norms > 0, data / np.where(norms > 0, norms, 1.0), data)
        if self.quantize in (QuantizeType.INT8, QuantizeType.INT4):
            self._qparams = train_quantizer(data, self.quantize)
            codes = encode(data, self.quantize, self._qparams)
            dequant = (
                jnp.float32(self._qparams.scale),
                jnp.float32(self._qparams.bias),
            )
            return codes, dequant
        if self.quantize == QuantizeType.FP16:
            return data.astype(np.float16), None
        return data, None

    def _use_pallas(self, st: _State, k: int) -> bool:
        """Fused Pallas scan: TPU, fp32/bf16 codes or int8 / nibble-packed
        int4 codes with the in-kernel affine-dequant epilogue, large corpus,
        small k (group-max extraction)."""
        from ..ops.runtime import is_tpu

        dtype_ok = st.codes is not None and (
            (st.dequant is None and st.codes.dtype in (jnp.float32, jnp.bfloat16))
            or (st.dequant is not None and st.codes.dtype == jnp.int8)
        )
        return (
            is_tpu()
            and dtype_ok
            and st.n_pad % 1024 == 0
            and st.n >= 100_000
            and k <= 32
        )

    def _mesh(self):
        from ..parallel.mesh import collection_mesh

        return collection_mesh()

    def _rebuild(self, data: np.ndarray) -> None:
        n = data.shape[0]
        if n == 0:
            self._st = _EMPTY
            return
        codes, dequant = self._prepare(np.asarray(data))
        mesh = self._mesh()
        align = _ROW_ALIGN_BIG if n >= _BIG_N else _ROW_ALIGN
        row_mult = align * (mesh.shape["corpus"] if mesh is not None else 1)
        n_pad = round_up(n, row_mult)
        padded = np.zeros((n_pad, codes.shape[1]), dtype=codes.dtype)
        padded[:n] = codes
        deq = decode(padded, self._qparams)
        norms = (deq.astype(np.float32) ** 2).sum(1)
        int4_packed = self.quantize == QuantizeType.INT4
        if int4_packed:
            # nibble-packed HBM residency: halves scan bandwidth vs int8
            # (`integer_quantizer_converter.cc:596-607`)
            from ..ops.quantize import pack_int4

            padded = pack_int4(padded)
        from ..ops.runtime import is_tpu

        if padded.dtype == np.float16 and is_tpu():
            # fp16 codes ride HBM as bf16 on TPU: half bandwidth AND full MXU
            # rate (TPU has no fp16 matmul path; reference FP16Converter role).
            # Off-TPU keeps true fp16 (the extra mantissa bits matter to the
            # CPU-mesh recall oracles).
            dev_codes = jnp.asarray(padded.astype(np.float32), dtype=jnp.bfloat16)
        else:
            dev_codes = None
        if mesh is not None:
            # corpus-sharded residency: each device holds N/devices rows;
            # searches fan out and merge per-shard top-k over ICI
            import jax

            from ..parallel.mesh import corpus_sharding

            dev_codes = jax.device_put(
                padded if dev_codes is None else dev_codes, corpus_sharding(mesh, 2)
            )
            dev_norms = jax.device_put(
                norms.astype(np.float32), corpus_sharding(mesh, 1)
            )
        else:
            dev_codes = jnp.asarray(padded) if dev_codes is None else dev_codes
            dev_norms = jnp.asarray(norms)
        self._st = _State(dev_codes, dev_norms, n, n_pad, dequant, int4_packed)

    def _search_impl(
        self,
        queries: np.ndarray,
        topk: int,
        mask: Optional[np.ndarray],
        param: Optional[QueryParam],
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self._search_finalize(self._search_dispatch(queries, topk, mask, param))

    def _search_dispatch(
        self,
        queries: np.ndarray,
        topk: int,
        mask: Optional[np.ndarray],
        param: Optional[QueryParam],
    ):
        """Enqueue the device scan; host post-processing happens in
        `_search_finalize` so callers can pipeline query batches."""
        st = self._st  # one consistent snapshot for this query
        nq = queries.shape[0]
        if st.n == 0:
            sims = np.full((nq, topk), -np.inf, dtype=np.float32)
            return ("empty", sims, np.full((nq, topk), -1, dtype=np.int64))

        orig_queries = queries
        scan_metric = self.metric
        if self._hamming:
            from ..ops.quantize import bits_to_pm1, unpack_bits

            queries = bits_to_pm1(unpack_bits(np.ascontiguousarray(queries), self.dimension))
            scan_metric = MetricType.L2
        elif self._binary_codes:
            from ..ops.quantize import binarize, bits_to_pm1

            queries = bits_to_pm1(binarize(queries))
            scan_metric = MetricType.L2

        quantized = self.quantize != QuantizeType.UNDEFINED
        # refine-by-default on quantized indexes (reference full-precision
        # refine block pairing, `segment.cc:1591-1700`); opt out with
        # is_using_refiner=False. BINARY is a metric CONVERSION (scores are
        # hamming distances on sign bits), not a compression of the stored
        # metric — fp32 L2 refine would silently change user-visible score
        # semantics, so refine stays opt-in there.
        auto_refine = quantized and not self._binary_codes
        use_refiner = quantized and (
            param.refiner_enabled(auto_refine)
            if isinstance(param, QueryParam)
            else auto_refine
        )
        scan_k = topk
        if use_refiner:
            scan_k = min(
                topk * getattr(param, "refiner_scale_factor", 10), st.n
            )

        nq_pad = _bucket_queries(nq)
        q = np.zeros((nq_pad, queries.shape[1]), dtype=np.float32)
        q[:nq] = queries

        full_mask = np.zeros(st.n_pad, dtype=bool)
        if mask is not None:
            m = np.asarray(mask)[: st.n]
            full_mask[: len(m)] = m
        else:
            full_mask[: st.n] = True

        k = min(scan_k, st.n)
        mesh = self._mesh()
        if mesh is not None:
            import jax

            from ..parallel.mesh import corpus_sharding, sharded_flat_search

            dmask = jax.device_put(full_mask, corpus_sharding(mesh, 1))
            sims, idx = sharded_flat_search(
                mesh,
                jnp.asarray(q),
                st.codes,
                scan_metric,
                k,
                mask=dmask,
                x_sq_norms=st.norms,
                dequant=st.dequant,
                int4_packed=st.int4_packed,
            )
        elif self._use_pallas(st, k):
            # packed single-output variants: sims and ids ride ONE device
            # buffer, so finalize pays one D2H round trip instead of two
            # (the host side of the pipeline is the throughput bound)
            from ..ops.flat_pallas import flat_scan_topk_packed

            norms = st.norms
            if scan_metric == MetricType.COSINE:
                norms = jnp.sqrt(st.norms)  # kernel wants ||x|| for cosine
            sims, idx = (
                flat_scan_topk_packed(
                    jnp.asarray(q),
                    st.codes,
                    norms,
                    self._device_mask(st, full_mask, as_int8=True),
                    metric=scan_metric,
                    topk=k,
                    dequant=(
                        None
                        if st.dequant is None
                        else (float(st.dequant[0]), float(st.dequant[1]))
                    ),
                    int4_dim=q.shape[1] if st.int4_packed else None,
                ),
                None,
            )
        else:
            from ..ops.topk import blockwise_topk_search_packed

            sims, idx = (
                blockwise_topk_search_packed(
                    q,
                    st.codes,
                    scan_metric,
                    k,
                    mask=self._device_mask(st, full_mask, as_int8=False),
                    x_sq_norms=st.norms,
                    block_size=_BLOCK_SIZE,
                    dequant=st.dequant,
                    int4_packed=st.int4_packed,
                ),
                None,
            )
        return (
            "scan",
            st,
            sims,
            idx,
            nq,
            topk,
            use_refiner,
            orig_queries,
        )

    def _search_finalize(self, handle) -> Tuple[np.ndarray, np.ndarray]:
        if handle[0] == "empty":
            return handle[1], handle[2]
        _, st, sims, idx, nq, topk, use_refiner, orig_queries = handle
        if idx is None:  # packed single-buffer fetch (see pack_topk)
            from ..ops.topk import unpack_topk

            sims, idx = unpack_topk(sims, nq)
        else:
            sims = np.asarray(sims[:nq])
            idx = np.asarray(idx[:nq]).astype(np.int64)
        oob = idx >= st.n
        if oob.any():  # padded rows can only surface when fully unmasked
            idx = np.where(oob, -1, idx)
            sims = np.where(oob, -np.inf, sims)

        if use_refiner:
            # exact re-rank against the unquantized store (original queries,
            # original metric — matches the reference BasicRefiner)
            sims, idx = refine(self._data_fn, orig_queries, idx, self.metric, topk)
            idx = idx.astype(np.int64)
        elif self._hamming or self._binary_codes:
            # ±1 L2 scan -> hamming similarity: hamming = l2^2 / 4
            sims = sims * 0.25

        if sims.shape[1] < topk:
            pad = topk - sims.shape[1]
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = sims[:, :topk]
        idx = idx[:, :topk]
        sims = np.where(idx >= 0, sims, -np.inf)
        return sims, idx
