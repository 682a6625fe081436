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

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..model.param.param import QueryParam
from ..ops.quantize import QuantParams, decode, encode, train_quantizer
from ..ops.runtime import round_up
from ..ops.topk import blockwise_topk_search
from ..typing.enum import IndexType, MetricType, QuantizeType
from .interface import VectorIndexEngine, register_engine
from .refiner import refine

__all__ = ["FlatEngine"]

# Queries are padded to buckets to bound jit recompilation.
_QUERY_BUCKETS = (1, 8, 32, 128, 512)
# Row padding granularity; block scan kicks in above one block.
_ROW_ALIGN = 1024  # Pallas tile multiple
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
        self.quantize = (
            QuantizeType(params.quantize_type)
            if params is not None
            else QuantizeType.UNDEFINED
        )
        self._codes = None  # (N_pad, D) device, storage dtype
        self._norms = None  # (N_pad,) device f32 (dequantized norms)
        self._qparams: Optional[QuantParams] = None
        self._dequant = None
        self._n = 0
        self._n_pad = 0

    def _prepare(self, data: np.ndarray) -> np.ndarray:
        """Storage-side transform: cosine-normalize, then quantize."""
        data = data.astype(np.float32, copy=False)
        if self.metric == MetricType.COSINE and self.quantize != QuantizeType.UNDEFINED:
            norms = np.linalg.norm(data, axis=1, keepdims=True)
            data = np.where(norms > 0, data / np.where(norms > 0, norms, 1.0), data)
        if self.quantize in (QuantizeType.INT8, QuantizeType.INT4):
            self._qparams = train_quantizer(data, self.quantize)
            codes = encode(data, self.quantize, self._qparams)
            self._dequant = (
                jnp.float32(self._qparams.scale),
                jnp.float32(self._qparams.bias),
            )
            return codes
        if self.quantize == QuantizeType.FP16:
            return data.astype(np.float16)
        return data

    def _use_pallas(self, k: int) -> bool:
        """Fused Pallas scan: TPU, fp32 codes (no dequant epilogue yet), large
        corpus, small k (K-pass extraction)."""
        from ..ops.runtime import is_tpu

        return (
            is_tpu()
            and self._dequant is None
            and self._codes is not None
            and self._codes.dtype in (jnp.float32, jnp.bfloat16)
            and self._n_pad % 1024 == 0
            and self._n >= 100_000
            and k <= 32
        )

    def _mesh(self):
        from ..parallel.mesh import collection_mesh

        return collection_mesh()

    def _rebuild(self, data: np.ndarray) -> None:
        n = data.shape[0]
        self._n = n
        if n == 0:
            self._codes = None
            return
        codes = self._prepare(np.asarray(data))
        mesh = self._mesh()
        row_mult = _ROW_ALIGN * (mesh.shape["corpus"] if mesh is not None else 1)
        n_pad = round_up(n, row_mult)
        padded = np.zeros((n_pad, codes.shape[1]), dtype=codes.dtype)
        padded[:n] = codes
        self._n_pad = n_pad
        deq = decode(padded, self._qparams)
        norms = (deq.astype(np.float32) ** 2).sum(1)
        self._int4_packed = self.quantize == QuantizeType.INT4
        if self._int4_packed:
            # nibble-packed HBM residency: halves scan bandwidth vs int8
            # (`integer_quantizer_converter.cc:596-607`)
            from ..ops.quantize import pack_int4

            padded = pack_int4(padded)
        if mesh is not None:
            # corpus-sharded residency: each device holds N/devices rows;
            # searches fan out and merge per-shard top-k over ICI
            import jax

            from ..parallel.mesh import corpus_sharding

            self._codes = jax.device_put(padded, corpus_sharding(mesh, 2))
            self._norms = jax.device_put(
                norms.astype(np.float32), corpus_sharding(mesh, 1)
            )
        else:
            self._codes = jnp.asarray(padded)
            self._norms = jnp.asarray(norms)

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

        use_refiner = (
            param is not None
            and getattr(param, "is_using_refiner", False)
            and self.quantize != QuantizeType.UNDEFINED
        )
        scan_k = topk
        if use_refiner:
            scan_k = min(
                topk * getattr(param, "refiner_scale_factor", 10), self._n
            )

        nq_pad = _bucket_queries(nq)
        q = np.zeros((nq_pad, queries.shape[1]), dtype=np.float32)
        q[:nq] = queries

        full_mask = np.zeros(self._n_pad, dtype=bool)
        if mask is not None:
            full_mask[: self._n] = mask
        else:
            full_mask[: self._n] = True

        k = min(scan_k, self._n)
        mesh = self._mesh()
        if mesh is not None:
            import jax

            from ..parallel.mesh import corpus_sharding, sharded_flat_search

            dmask = jax.device_put(full_mask, corpus_sharding(mesh, 1))
            sims, idx = sharded_flat_search(
                mesh,
                jnp.asarray(q),
                self._codes,
                self.metric,
                k,
                mask=dmask,
                x_sq_norms=self._norms,
                dequant=self._dequant,
                int4_packed=getattr(self, "_int4_packed", False),
            )
        elif self._use_pallas(k):
            from ..ops.flat_pallas import flat_scan_topk

            norms = self._norms
            if self.metric == MetricType.COSINE:
                norms = jnp.sqrt(self._norms)  # kernel wants ||x|| for cosine
            sims, idx = flat_scan_topk(
                jnp.asarray(q),
                self._codes,
                norms,
                jnp.asarray(full_mask.astype(np.int8)),
                metric=self.metric,
                topk=k,
            )
        else:
            sims, idx = blockwise_topk_search(
                q,
                self._codes,
                self.metric,
                k,
                mask=jnp.asarray(full_mask),
                x_sq_norms=self._norms,
                block_size=_BLOCK_SIZE,
                dequant=self._dequant,
                int4_packed=getattr(self, "_int4_packed", False),
            )
        sims = np.asarray(sims[:nq])
        idx = np.asarray(idx[:nq]).astype(np.int64)

        if use_refiner:
            sims, idx = refine(self._data_fn, queries, idx, self.metric, topk)
            idx = idx.astype(np.int64)

        if sims.shape[1] < topk:
            pad = topk - sims.shape[1]
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        sims = sims[:, :topk]
        idx = idx[:, :topk]
        sims = np.where(idx >= 0, sims, -np.inf)
        return sims, idx
