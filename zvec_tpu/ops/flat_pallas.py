"""Pallas fused flat-scan kernel: distance tile + mask + group-max top-k.

The speed-of-light path for the reference's hottest loop (SURVEY §2.8 item 1:
SIMD distance matrices -> "Pallas MXU/VPU tile kernels"; reference equivalent
`src/core/algorithm/flat/flat_searcher_context.h:237-314`). Each grid step:

  1. one MXU matmul scores a (TILE_N, D) code tile against all queries,
  2. the VPU applies the metric epilogue + filter mask in VMEM,
  3. a lane-aligned group reduction folds the (Q, TILE) score tile into
     (Q, TILE/G) interleaved group maxima (G=8, group g = cols {g, g+128, ...}
     — pure static 128-lane slices, no relayout), then K cheap passes extract
     the tile's top-k GROUPS (G x less VPU work than elementwise K passes).

Winner groups merge globally with one lax.top_k, then the <= topk*G candidate
rows are gathered from HBM and rescored exactly in fp32-HIGHEST. Exactness:
the true top-k elements always lie inside the k groups with largest group-max
(each element > the k-th is its own group's witness), so the candidate set
provably covers the answer; the rescore produces exact fp32 scores.

Codes may be f32 or bf16 (bf16 halves HBM traffic + runs the MXU at full
rate; the fp32 rescore step restores exact final scores). Falls back to
interpret mode off-TPU (CPU test mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..typing.enum import MetricType
from .runtime import NEG_INF, interpret_mode

__all__ = ["flat_scan_topk"]

_TILE_N = 1024  # code rows per grid step
_GROUP = 8  # rows per group; groups interleave across 128 lanes
_LANES = _TILE_N // _GROUP  # group-max width per tile


def _kernel(metric: MetricType, k: int, dequant):
    def kernel(
        q_ref, qsq_ref, qsum_ref, codes_ref, norms_ref, mask_ref,
        out_s_ref, out_i_ref,
    ):
        t = pl.program_id(0)
        q = q_ref[:]  # (Q, D) f32
        codes = codes_ref[:]  # (TILE, D) f32/bf16/int8
        if codes.dtype == jnp.int8:
            # int8 codes ride HBM at 1/4 f32 bandwidth; bf16 holds all 8
            # code bits exactly, accumulate f32 on the MXU
            codes = codes.astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q,
            codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if codes.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )  # (Q, TILE)
        if dequant is not None:
            # global affine dequant fused into the epilogue:
            # q . (c*scale + bias) = scale*(q . c) + bias*sum(q)
            dots = dequant[0] * dots + dequant[1] * qsum_ref[:]
        if metric == MetricType.IP:
            sims = dots
        elif metric == MetricType.L2:
            sims = -(qsq_ref[:] + norms_ref[:] - 2.0 * dots)
        else:  # COSINE: qsq holds ||q|| (not squared), norms holds ||x||
            denom = qsq_ref[:] * norms_ref[:]
            sims = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 1.0)
        sims = jnp.where(mask_ref[:] != 0, sims, NEG_INF)

        # fold TILE cols into LANES interleaved groups: group g = cols
        # {g, g+LANES, ...}. Static 128-wide slices -> no vreg relayout.
        gmax = sims[:, 0:_LANES]
        for j in range(1, _GROUP):
            gmax = jnp.maximum(gmax, sims[:, j * _LANES : (j + 1) * _LANES])

        colg = jax.lax.broadcasted_iota(jnp.int32, gmax.shape, 1)
        base = t * _LANES
        for j in range(k):
            m = jnp.max(gmax, axis=1)  # (Q,)
            a = jnp.argmax(gmax, axis=1).astype(jnp.int32)  # (Q,)
            # outputs are (tile, k, Q): Q rides the 128-lane minor dim, so
            # each extraction pass stores one contiguous lane row (a (Q, k)
            # layout pads k=10 lanes to 128 — 12.8x HBM write amplification,
            # 10.7GB/scan at 10M)
            out_s_ref[0, j, :] = m
            out_i_ref[0, j, :] = jnp.where(m > NEG_INF / 2, a + base, -1)
            gmax = jnp.where(colg == a[:, None], NEG_INF, gmax)

    return kernel


@partial(jax.jit, static_argnames=("metric", "topk", "dequant"))
def flat_scan_topk(
    q: jax.Array,  # (Q, D) f32
    codes: jax.Array,  # (N, D) f32/bf16/int8, N multiple of _TILE_N
    norms: jax.Array,  # (N,) f32: ||x||^2 (L2) or ||x|| (COSINE); unused for IP
    mask: jax.Array,  # (N,) int8/bool: nonzero = candidate
    *,
    metric: MetricType,
    topk: int,
    dequant=None,  # (scale, bias) floats: codes store x ~= c*scale + bias
):
    """Exact fused scan. Returns (sims (Q, topk) desc, indices, -1 pad).
    With int8 codes + `dequant`, scoring is asymmetric (f32 query vs int8
    codes, reference `quantized_integer_metric.cc:320`): the affine dequant
    folds into the matmul epilogue and the final rescore dequantizes the
    <= topk*G candidate rows exactly in fp32."""
    nq, d = q.shape
    n = codes.shape[0]
    assert n % _TILE_N == 0, f"N={n} must be a multiple of {_TILE_N}"
    assert topk <= _LANES, f"topk={topk} exceeds per-tile group width {_LANES}"
    n_tiles = n // _TILE_N
    q = q.astype(jnp.float32)

    if metric == MetricType.L2:
        qside = jnp.sum(q * q, axis=1, keepdims=True)  # (Q, 1)
    elif metric == MetricType.COSINE:
        qside = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
    else:
        qside = jnp.zeros((nq, 1), jnp.float32)
    qsum = jnp.sum(q, axis=1, keepdims=True)  # (Q, 1) for dequant epilogue

    norms2d = norms.reshape(1, n).astype(jnp.float32)
    mask2d = mask.reshape(1, n).astype(jnp.int8)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, topk, nq), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, topk, nq), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    tile_s, tile_i = pl.pallas_call(
        _kernel(metric, topk, dequant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, topk, nq), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, topk, nq), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d * codes.dtype.itemsize + nq * d * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(q, qside, qsum, codes, norms2d, mask2d)

    # global merge over the per-tile winner GROUPS ((tile, k, Q) -> (Q, tile*k))
    tile_s = tile_s.transpose(2, 0, 1).reshape(nq, n_tiles * topk)
    tile_i = tile_i.transpose(2, 0, 1).reshape(nq, n_tiles * topk)
    top_s, sel = jax.lax.top_k(tile_s, topk)  # (Q, topk) group scores
    gids = jnp.take_along_axis(tile_i, sel, axis=1)  # (Q, topk) global group ids
    valid_g = (gids >= 0) & (top_s > NEG_INF / 2)

    # expand winner groups to element indices: group g of tile t covers rows
    # t*TILE + (g % LANES) + LANES*j for j in range(GROUP)
    safe_g = jnp.where(valid_g, gids, 0)
    tile_of = safe_g // _LANES
    lane_of = safe_g % _LANES
    offs = (jnp.arange(_GROUP, dtype=jnp.int32) * _LANES)[None, None, :]
    cand = tile_of[:, :, None] * _TILE_N + lane_of[:, :, None] + offs
    cand = cand.reshape(nq, topk * _GROUP)  # (Q, C) element row ids
    cand_valid = jnp.repeat(valid_g, _GROUP, axis=1)

    # gather + exact fp32 rescore of the candidate rows
    cand_codes = jnp.take(codes, cand, axis=0).astype(jnp.float32)  # (Q, C, D)
    if dequant is not None:
        cand_codes = cand_codes * dequant[0] + dequant[1]
    cand_norms = jnp.take(norms, cand, axis=0)  # (Q, C)
    cand_mask = jnp.take(mask, cand, axis=0) != 0
    dots = jax.lax.dot_general(
        q,
        cand_codes,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Q, C)
    if metric == MetricType.IP:
        sims = dots
    elif metric == MetricType.L2:
        sims = -(qside + cand_norms - 2.0 * dots)
    else:
        denom = qside * cand_norms
        sims = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 1.0)
    sims = jnp.where(cand_valid & cand_mask, sims, NEG_INF)

    out_s, sel2 = jax.lax.top_k(sims, topk)
    out_i = jnp.take_along_axis(cand, sel2, axis=1).astype(jnp.int32)
    out_i = jnp.where(out_s > NEG_INF / 2, out_i, -1)
    return out_s, out_i
