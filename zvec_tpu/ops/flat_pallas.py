"""Pallas fused flat-scan kernel: distance tile + mask + group-max top-k.

The speed-of-light path for the reference's hottest loop (SURVEY §2.8 item 1:
SIMD distance matrices -> "Pallas MXU/VPU tile kernels"; reference equivalent
`src/core/algorithm/flat/flat_searcher_context.h:237-314`). Each grid step
covers a (TILE_N, D) code tile and runs GROUP sub-steps:

  1. one MXU matmul scores a (LANES, D) code sub-tile against all queries,
  2. the VPU applies a RANK-EQUIVALENT metric epilogue + filter mask and
     immediately max-folds the (Q, LANES) keys into the running group-max —
     the full (Q, TILE_N) score tile is never materialized, so TILE_N (and
     with it GROUP = TILE_N/LANES) can grow far past VMEM's (Q, TILE) limit,
  3. after the fold, K cheap passes extract the tile's top-k GROUPS from the
     (Q, LANES) group-max (GROUP x less VPU work than elementwise K passes;
     the K extraction passes are the measured cost driver — 4.2 ms/pass at
     1M x 128d — so scan time scales ~1/GROUP).

Rank-equivalent keys: per-query positive-affine transforms preserve top-k
(every comparison — in-tile extraction AND the global group merge — is
within one query), so the epilogue drops per-query constants:
  L2       key = 2*dots - ||x||^2          (drops -||q||^2, negation folded)
  IP       key = dots                      (dequant scale > 0 drops out)
  COSINE   key = real_dots / ||x||         (drops 1/||q||; zero-norm rows
                                            take key ||q|| >= cos*||q||,
                                            matching the sims=1.0 edge rule)

Winner groups merge globally with one lax.top_k, then the <= topk*GROUP
candidate rows are gathered from HBM and rescored exactly in fp32-HIGHEST.
Exactness: the true top-k elements always lie inside the k groups with
largest group-max (each element > the k-th is its own group's witness), so
the candidate set provably covers the answer; the rescore produces exact
fp32 scores under the REAL metric formula.

Codes may be f32, bf16, int8, or nibble-packed int4 (narrow codes cut HBM
traffic 2-8x and run the MXU at full rate; the fp32 rescore step restores
exact final scores). Packed int4 (`int4_dim=D` set, codes (N, ceil(D/2))
int8, reference `integer_quantizer_converter.cc:596-607`) is scored without
any in-kernel interleave: the byte splits into two sign-extended nibble
planes [lo | hi] concatenated on the contraction axis, and the query arrives
pre-permuted as [q_even | q_odd] — q.x = q_even.lo + q_odd.hi as ONE
full-width matmul. TILE_N adapts per call: the largest of {8192..1024} that
divides N, keeps the code tile within VMEM budget, and caps topk*GROUP
rescore candidates. Falls back to interpret mode off-TPU (CPU test mesh).
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

_LANES = 128  # group-max width: one vreg lane row per tile
_MAX_CAND = 1024  # cap on topk * GROUP rescore candidates per query
# Code-tile VMEM budget. The scoped-vmem ceiling is 16MB per core and the
# pipeline double-buffers every HBM operand slice; a 4MB code tile (fp32
# 8192x128) compiled to a 17.75MB stack at 10M (measured r2 OOM). 2MB keeps
# the whole pipeline comfortably under the ceiling: fp32 128d tiles at 4096,
# bf16/int8 still reach 8192.
_TILE_VMEM = 2 * 1024 * 1024


def _pick_tile(n: int, d: int, topk: int, itemsize: int) -> int:
    """Largest tile that divides n, fits the VMEM budget, and bounds the
    rescore candidate set. 1024 always qualifies (callers pad to 1024)."""
    for t in (8192, 4096, 2048, 1024):
        if (
            n % t == 0
            and t * d * itemsize <= _TILE_VMEM
            and (t // _LANES) * topk <= _MAX_CAND
        ):
            return t
    raise AssertionError(f"N={n} must be a multiple of 1024 (topk={topk})")


def _unpack_nibble_planes(c32):
    """int8-as-int32 packed bytes -> (lo, hi) sign-extended int4 planes
    (int32 `>>` is arithmetic, so both nibbles sign-extend for free)."""
    lo = (c32 << 28) >> 28
    hi = c32 >> 4
    return lo, hi


def _kernel(metric: MetricType, k: int, dequant, group: int, int4: bool):
    def kernel(
        q_ref, qsq_ref, qsum_ref, codes_ref, norms_ref, mask_ref,
        out_s_ref, out_i_ref,
    ):
        t = pl.program_id(0)
        q = q_ref[:]  # (Q, D) f32

        # interleaved groups: group l of this tile = rows {l + LANES*j};
        # sub-tile j scores rows [j*LANES, (j+1)*LANES) and max-folds into
        # lane l of the running group-max. (Q, TILE) is never materialized.
        gmax = None
        for j in range(group):
            codes = codes_ref[j * _LANES : (j + 1) * _LANES, :]  # (LANES, D)
            if int4:
                # packed nibbles -> [lo | hi] planes on the contraction axis;
                # q arrives pre-permuted as [q_even | q_odd], so one matmul
                # computes q_even.lo + q_odd.hi = q.x (values in [-8, 7] are
                # exact in bf16)
                lo, hi = _unpack_nibble_planes(codes.astype(jnp.int32))
                codes = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)
            elif codes.dtype == jnp.int8:
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
            )  # (Q, LANES)
            nrm = norms_ref[:, j * _LANES : (j + 1) * _LANES]  # (1, LANES)
            if metric == MetricType.IP:
                key = dots  # dequant: scale>0 and bias*qsum are rank-inert
            elif metric == MetricType.L2:
                if dequant is not None:
                    # real_dots = scale*dots + bias*qsum; the qsum term is a
                    # per-query constant -> key = 2*scale*dots - ||x||^2
                    key = (2.0 * dequant[0]) * dots - nrm
                else:
                    key = 2.0 * dots - nrm
            else:  # COSINE: norms_ref holds 1/||x|| (0 for zero-norm rows)
                if dequant is not None:
                    real = dequant[0] * dots + dequant[1] * qsum_ref[:]
                else:
                    real = dots
                # zero-norm rows score sims=1.0 (>= any cosine); in key space
                # (cos * ||q||) that upper bound is ||q|| (qsq_ref)
                key = jnp.where(nrm > 0, real * nrm, qsq_ref[:])
            key = jnp.where(mask_ref[:, j * _LANES : (j + 1) * _LANES] != 0, key, NEG_INF)
            gmax = key if gmax is None else jnp.maximum(gmax, key)

        colg = jax.lax.broadcasted_iota(jnp.int32, gmax.shape, 1)
        base = t * _LANES
        for j in range(k):
            m = jnp.max(gmax, axis=1)  # (Q,)
            a = jnp.argmax(gmax, axis=1).astype(jnp.int32)  # (Q,)
            # outputs are (tile, k, Q): Q rides the 128-lane minor dim, so
            # each extraction pass stores one contiguous lane row (a (Q, k)
            # layout pads k=10 lanes to 128 — 12.8x HBM write amplification)
            out_s_ref[0, j, :] = m
            out_i_ref[0, j, :] = jnp.where(m > NEG_INF / 2, a + base, -1)
            gmax = jnp.where(colg == a[:, None], NEG_INF, gmax)

    return kernel


@partial(jax.jit, static_argnames=("metric", "topk", "dequant", "int4_dim"))
def flat_scan_topk(
    q: jax.Array,  # (Q, D) f32
    codes: jax.Array,  # (N, D) f32/bf16/int8, N multiple of 1024
    norms: jax.Array,  # (N,) f32: ||x||^2 (L2) or ||x|| (COSINE); unused for IP
    mask: jax.Array,  # (N,) int8/bool: nonzero = candidate
    *,
    metric: MetricType,
    topk: int,
    dequant=None,  # (scale, bias) floats: codes store x ~= c*scale + bias
    int4_dim=None,  # set to D when codes are nibble-packed (N, ceil(D/2)) int8
):
    """Exact fused scan. Returns (sims (Q, topk) desc, indices, -1 pad).
    With int8/int4 codes + `dequant`, scoring is asymmetric (f32 query vs
    integer codes, reference `quantized_integer_metric.cc:320`): the affine
    dequant folds into the matmul epilogue and the final rescore dequantizes
    the <= topk*GROUP candidate rows exactly in fp32."""
    nq, d = q.shape
    n = codes.shape[0]
    int4 = int4_dim is not None
    if int4:
        assert d == int4_dim and codes.dtype == jnp.int8 and dequant is not None
        dp = codes.shape[1]  # ceil(D/2) packed bytes per row
        # kernel query = [q_even | q_odd] (odd plane zero-padded when D is
        # odd — the matching phantom high nibble packs as 0)
        qe = jnp.zeros((nq, dp), jnp.float32).at[:, : (d + 1) // 2].set(q[:, 0::2])
        qo = jnp.zeros((nq, dp), jnp.float32).at[:, : d // 2].set(q[:, 1::2])
        q_kern = jnp.concatenate([qe, qo], axis=1)  # (Q, 2*Dp)
        d_tile = dp
    else:
        q_kern = q.astype(jnp.float32)
        d_tile = d
    tile_n = _pick_tile(n, d_tile, topk, codes.dtype.itemsize)
    group = tile_n // _LANES
    assert topk <= _LANES, f"topk={topk} exceeds per-tile group width {_LANES}"
    n_tiles = n // tile_n
    q = q.astype(jnp.float32)

    if metric == MetricType.L2:
        qside = jnp.sum(q * q, axis=1, keepdims=True)  # (Q, 1)
    elif metric == MetricType.COSINE:
        qside = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
    else:
        qside = jnp.zeros((nq, 1), jnp.float32)
    qsum = jnp.sum(q, axis=1, keepdims=True)  # (Q, 1) for dequant epilogue

    norms = norms.astype(jnp.float32)
    if metric == MetricType.COSINE:
        # kernel key = real_dots * (1/||x||): precompute the reciprocal once
        # (division is the expensive VPU op; a multiply rides free)
        knorm = jnp.where(norms > 0, 1.0 / jnp.where(norms > 0, norms, 1.0), 0.0)
    else:
        knorm = norms
    norms2d = knorm.reshape(1, n)
    mask2d = mask.reshape(1, n).astype(jnp.int8)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (nq, q_kern.shape[1]), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_tile), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, topk, nq), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, topk, nq), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    tile_s, tile_i = pl.pallas_call(
        _kernel(metric, topk, dequant, group, int4),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, topk, nq), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, topk, nq), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d_tile * codes.dtype.itemsize + nq * d * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(q_kern, qside, qsum, codes, norms2d, mask2d)

    # global merge over the per-tile winner GROUPS ((tile, k, Q) -> (Q, tile*k)).
    # Group keys are rank-equivalent per query, and top_k compares only within
    # a query row, so the merge picks the same winner groups as real scores.
    tile_s = tile_s.transpose(2, 0, 1).reshape(nq, n_tiles * topk)
    tile_i = tile_i.transpose(2, 0, 1).reshape(nq, n_tiles * topk)
    top_s, sel = jax.lax.top_k(tile_s, topk)  # (Q, topk) group keys
    gids = jnp.take_along_axis(tile_i, sel, axis=1)  # (Q, topk) global group ids
    valid_g = (gids >= 0) & (top_s > NEG_INF / 2)

    # expand winner groups to element indices: group g of tile t covers rows
    # t*TILE + (g % LANES) + LANES*j for j in range(GROUP)
    safe_g = jnp.where(valid_g, gids, 0)
    tile_of = safe_g // _LANES
    lane_of = safe_g % _LANES
    offs = (jnp.arange(group, dtype=jnp.int32) * _LANES)[None, None, :]
    cand = tile_of[:, :, None] * tile_n + lane_of[:, :, None] + offs
    cand = cand.reshape(nq, topk * group)  # (Q, C) element row ids
    cand_valid = jnp.repeat(valid_g, group, axis=1)

    # gather + exact fp32 rescore of the candidate rows (REAL metric formula)
    cand_codes = jnp.take(codes, cand, axis=0)  # (Q, C, D) or (Q, C, Dp) packed
    if int4:
        lo, hi = _unpack_nibble_planes(cand_codes.astype(jnp.int32))
        cand_codes = jnp.stack([lo, hi], axis=-1).reshape(nq, cand.shape[1], 2 * dp)
        cand_codes = cand_codes[:, :, :d]
    cand_codes = cand_codes.astype(jnp.float32)
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


@partial(jax.jit, static_argnames=("metric", "topk", "dequant", "int4_dim"))
def flat_scan_topk_packed(
    q, codes, norms, mask, *, metric, topk, dequant=None, int4_dim=None
):
    """`flat_scan_topk` with the two outputs packed into one transfer
    array (`ops/topk.py::pack_topk` — one D2H round trip at finalize)."""
    from .topk import pack_topk

    return pack_topk(
        *flat_scan_topk(
            q, codes, norms, mask, metric=metric, topk=topk,
            dequant=dequant, int4_dim=int4_dim,
        )
    )
