"""Blockwise fused scan + top-k.

The TPU-native replacement for the reference's flat-scan hot loop
(`src/core/algorithm/flat/flat_searcher_context.h:237-314`: template-unrolled
query batches x SIMD distance matrix x bounded heap): here one `lax.scan` walks
code blocks, each step scores a (Q, BLOCK) tile on the MXU, fuses the filter
mask as a large-negative select, and folds the block into a running per-query
top-k via `lax.top_k` — no heap, no branches, one compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..typing.enum import MetricType
from .distance import similarity_matrix
from .runtime import NEG_INF

__all__ = ["blockwise_topk_search", "merge_topk", "apply_mask"]


def apply_mask(sim: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Fuse a validity mask into similarity scores. mask: (N,) bool (True=keep)."""
    if mask is None:
        return sim
    return jnp.where(mask[None, :], sim, NEG_INF)


def _select_topk(sims: jax.Array, topk: int, mode: str):
    """Top-k selection: 'exact' = lax.top_k (full parity); 'fast' =
    TPU-optimized approx_max_k over a 4k-deep candidate pool + exact re-rank
    (measured recall 0.999+ at 2x+ the throughput of the exact sort)."""
    if mode == "fast" and sims.shape[1] > 4096:
        # pool >= topk always; small-k queries keep the shallow 128 pool,
        # large-k (graph-build candidate) calls widen it to k
        pool = min(max(4 * topk, 64), max(128, topk), sims.shape[1])
        cs, ci = jax.lax.approx_max_k(sims, pool, recall_target=0.99)
        es, sel = jax.lax.top_k(cs, topk)
        return es, jnp.take_along_axis(ci, sel, 1)
    return jax.lax.top_k(sims, topk)


@partial(jax.jit, static_argnames=("metric", "topk", "block_size", "mode", "int4_packed"))
def blockwise_topk_search(
    q: jax.Array,
    codes: jax.Array,
    metric: MetricType,
    topk: int,
    mask: jax.Array | None = None,
    x_sq_norms: jax.Array | None = None,
    block_size: int = 65536,
    dequant: tuple | None = None,
    mode: str = "exact",
    int4_packed: bool = False,
):
    """Exact top-k scan of `codes` for each query.

    Args:
      q: (Q, D) float queries.
      codes: (N, D) codes; N must be a multiple of block_size (pad + mask the tail).
      metric: MetricType (similarity is larger-is-better internally).
      topk: k.
      mask: optional (N,) bool; False rows can never enter the top-k.
      x_sq_norms: optional (N,) precomputed squared norms (L2/COSINE epilogues).
      block_size: rows scored per scan step.

    Returns:
      (sims, indices): (Q, topk) similarity (desc) and global row indices.
      Padded/masked slots come back with similarity ~= NEG_INF and index -1
      only if fewer than topk valid rows exist... callers must treat
      sim <= NEG_INF/2 as invalid.
    """
    n = codes.shape[0]
    block_size = min(block_size, n)
    pad = (-n) % block_size
    if pad:
        # Pad to a block multiple instead of widening the block to N — a
        # single (Q, N) similarity block is an HBM bomb at corpus scale.
        codes = jnp.pad(codes, ((0, pad),) + ((0, 0),) * (codes.ndim - 1))
        mask = (
            jnp.pad(mask, (0, pad))
            if mask is not None
            else jnp.arange(n + pad) < n
        )
        if x_sq_norms is not None:
            x_sq_norms = jnp.pad(x_sq_norms, (0, pad))
        n = n + pad
    num_blocks = n // block_size
    nq = q.shape[0]
    q = q.astype(jnp.float32)

    codes_b = codes.reshape(num_blocks, block_size, *codes.shape[1:])
    norms_b = (
        x_sq_norms.reshape(num_blocks, block_size)
        if x_sq_norms is not None
        else None
    )
    mask_b = mask.reshape(num_blocks, block_size) if mask is not None else None

    init = (
        jnp.full((nq, topk), NEG_INF, dtype=jnp.float32),
        jnp.full((nq, topk), -1, dtype=jnp.int32),
    )

    def step(carry, inputs):
        (cs, ci), (block_idx, block, bnorms, bmask) = carry, inputs
        sim = similarity_matrix(q, block, metric, bnorms, dequant, int4_packed)
        sim = apply_mask(sim, bmask)
        gidx = block_idx * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (nq, block_size), 1
        )
        all_s = jnp.concatenate([cs, sim], axis=1)
        all_i = jnp.concatenate([ci, gidx], axis=1)
        new_s, sel = _select_topk(all_s, topk, mode)
        new_i = jnp.take_along_axis(all_i, sel, axis=1)
        return (new_s, new_i), None

    xs = (
        jnp.arange(num_blocks, dtype=jnp.int32),
        codes_b,
        norms_b if norms_b is not None else jnp.zeros((num_blocks, 0)),
        mask_b if mask_b is not None else jnp.zeros((num_blocks, 0), dtype=bool),
    )

    def step_wrap(carry, inputs):
        block_idx, block, bnorms, bmask = inputs
        bn = bnorms if norms_b is not None else None
        bm = bmask if mask_b is not None else None
        return step(carry, (block_idx, block, bn, bm))

    (sims, idx), _ = jax.lax.scan(step_wrap, init, xs)
    idx = jnp.where(sims > NEG_INF / 2, idx, -1)
    return sims, idx


@partial(jax.jit, static_argnames=("topk",))
def merge_topk(sims_list, idx_list, topk: int):
    """Merge per-shard/per-segment top-k results: lists of (Q, k_i) arrays."""
    all_s = jnp.concatenate(sims_list, axis=1)
    all_i = jnp.concatenate(idx_list, axis=1)
    # Invalid slots (idx == -1) must lose every comparison.
    all_s = jnp.where(all_i < 0, NEG_INF, all_s)
    k = min(topk, all_s.shape[1])
    new_s, sel = jax.lax.top_k(all_s, k)
    new_i = jnp.take_along_axis(all_i, sel, axis=1)
    if k < topk:
        pad = topk - k
        new_s = jnp.pad(new_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        new_i = jnp.pad(new_i, ((0, 0), (0, pad)), constant_values=-1)
    new_i = jnp.where(new_s > NEG_INF / 2, new_i, -1)
    return new_s, new_i


def pack_topk(sims: jax.Array, idx: jax.Array) -> jax.Array:
    """Pack (sims f32, idx int) into ONE int32 array [bitcast(sims) | idx].

    Each D2H fetch through the axon tunnel is its own round trip; fetching
    one packed buffer instead of two halves the finalize latency on the
    host-bound side of the pipeline. Unpack with `unpack_topk`. Must be
    called INSIDE a jitted program (an eager call would itself cost
    dispatches).

    The buffer is INT, not float, and that is load-bearing: the original
    f32 packing bitcast the int32 ids into float lanes, and every id
    < 2**23 is a subnormal f32 bit pattern — the TPU D2H path flushes
    subnormals to zero, so at 10M rows ~84% of returned ids silently
    became 0 (scores exact, ids gone; measured recall@10 collapsed
    0.95 -> 0.47). Integer lanes have no subnormals/NaNs, so no transfer
    canonicalization can touch them; f32 sim bit patterns ride int lanes
    unharmed."""
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(sims, jnp.int32), idx.astype(jnp.int32)],
        axis=1,
    )


def unpack_topk(packed, nq: int | None = None):
    """Host-side inverse of `pack_topk` (one np.asarray = one fetch).
    Returns (sims f32 (Q, k), idx int64 (Q, k))."""
    import numpy as np

    arr = np.asarray(packed)
    if nq is not None:
        arr = arr[:nq]
    k = arr.shape[1] // 2
    sims = np.ascontiguousarray(arr[:, :k]).view(np.float32)
    idx = arr[:, k:].astype(np.int64)
    return sims, idx


@partial(
    jax.jit,
    static_argnames=("metric", "topk", "block_size", "mode", "int4_packed"),
)
def blockwise_topk_search_packed(
    q, codes, metric, topk, mask=None, x_sq_norms=None, block_size=65536,
    dequant=None, mode="exact", int4_packed=False,
):
    """`blockwise_topk_search` with the two outputs packed into one
    transfer array (see `pack_topk`)."""
    return pack_topk(
        *blockwise_topk_search(
            q, codes, metric, topk, mask=mask, x_sq_norms=x_sq_norms,
            block_size=block_size, dequant=dequant, mode=mode,
            int4_packed=int4_packed,
        )
    )
