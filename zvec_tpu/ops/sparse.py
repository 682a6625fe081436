"""Sparse vector kernels: padded-CSR layout + gather-based dot products.

Reference equivalents: sparse IP metrics (`inner_product_metric.cc:527-530`
InnerProductSparse), sparse query pruning (`sparse_utility.h:147-160`: drop
dims with |v| < budget * max|v|), parallel-array representation
(`index.h:47-60`).

TPU-native layout: docs pad to a fixed nnz per row (`doc_idx (N, P) int32`,
`doc_val (N, P) f32`, pad idx = -1); the query densifies into a (V,) vector
on device, and scoring is a gather of query weights at doc indices + row
reduction — fully vectorized, no sorted-list intersection.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .runtime import NEG_INF

__all__ = [
    "pad_sparse_rows",
    "prune_sparse_query",
    "sparse_ip_topk",
    "sparse_ip_rows",
]


def pad_sparse_rows(
    rows: List[Optional[Dict[int, float]]], max_nnz: int = 256
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pad {dim: value} rows to (N, P) index/value arrays. Rows over the nnz
    cap keep their largest-magnitude entries. Returns (idx, val, vocab)."""
    n = len(rows)
    nnz = max((len(r) for r in rows if r), default=1)
    p = min(max(nnz, 1), max_nnz)
    idx = np.full((n, p), -1, dtype=np.int32)
    val = np.zeros((n, p), dtype=np.float32)
    vocab = 1
    for i, r in enumerate(rows):
        if not r:
            continue
        items = sorted(r.items(), key=lambda kv: -abs(kv[1]))[:p]
        items.sort()
        for j, (k, v) in enumerate(items):
            idx[i, j] = k
            val[i, j] = v
        vocab = max(vocab, items[-1][0] + 1 if items else 1)
    return idx, val, vocab


def prune_sparse_query(
    query: Dict[int, float], filtering_budget: float = 0.0
) -> Dict[int, float]:
    """Drop low-magnitude query dims (reference `filter_sparse_query_fp16`):
    keep dims with |v| >= budget * max|v|."""
    if not query or filtering_budget <= 0.0:
        return query
    max_abs = max(abs(v) for v in query.values())
    thresh = filtering_budget * max_abs
    return {k: v for k, v in query.items() if abs(v) >= thresh}


def _densify_queries(
    q_idx: jax.Array, q_val: jax.Array, vocab: int
) -> jax.Array:
    """(Q, Pq) sparse queries -> (Q, V) dense weights (scatter-add)."""
    nq = q_idx.shape[0]
    dense = jnp.zeros((nq, vocab), jnp.float32)
    safe = jnp.clip(q_idx, 0, vocab - 1)
    vals = jnp.where((q_idx >= 0) & (q_idx < vocab), q_val, 0.0)
    rows = jnp.arange(nq)[:, None]
    return dense.at[rows, safe].add(vals)


@partial(jax.jit, static_argnames=("topk", "vocab", "block_size"))
def sparse_ip_topk(
    q_idx: jax.Array,  # (Q, Pq) int32, -1 pad
    q_val: jax.Array,  # (Q, Pq) f32
    doc_idx: jax.Array,  # (N, P) int32, -1 pad
    doc_val: jax.Array,  # (N, P) f32
    mask: Optional[jax.Array],  # (N,) bool or None
    *,
    topk: int,
    vocab: int,
    block_size: int = 8192,
):
    """Sparse IP top-k: returns (sims (Q, topk) desc, indices)."""
    n = doc_idx.shape[0]
    block_size = min(block_size, n)
    pad = (-n) % block_size
    if pad:
        # pad to a block multiple (a whole-N block materializes (Q, N))
        doc_idx = jnp.pad(doc_idx, ((0, pad), (0, 0)), constant_values=-1)
        doc_val = jnp.pad(doc_val, ((0, pad), (0, 0)))
        mask = (
            jnp.pad(mask, (0, pad))
            if mask is not None
            else jnp.arange(n + pad) < n
        )
        n = n + pad
    num_blocks = n // block_size
    nq = q_idx.shape[0]
    q_dense = _densify_queries(q_idx, q_val, vocab)  # (Q, V)

    di = doc_idx.reshape(num_blocks, block_size, -1)
    dv = doc_val.reshape(num_blocks, block_size, -1)
    dm = mask.reshape(num_blocks, block_size) if mask is not None else None

    init = (
        jnp.full((nq, topk), NEG_INF, jnp.float32),
        jnp.full((nq, topk), -1, jnp.int32),
    )

    def step(carry, inp):
        cs, ci = carry
        if dm is not None:
            bidx, bi, bv, bm = inp
        else:
            bidx, bi, bv = inp
            bm = None
        safe = jnp.clip(bi, 0, vocab - 1)  # (B, P)
        weights = q_dense[:, safe]  # (Q, B, P)
        contrib = weights * jnp.where(bi >= 0, bv, 0.0)[None, :, :]
        sims = contrib.sum(-1)  # (Q, B)
        if bm is not None:
            sims = jnp.where(bm[None, :], sims, NEG_INF)
        gidx = bidx * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (nq, block_size), 1
        )
        all_s = jnp.concatenate([cs, sims], axis=1)
        all_i = jnp.concatenate([ci, gidx], axis=1)
        ns, sel = jax.lax.top_k(all_s, topk)
        ni = jnp.take_along_axis(all_i, sel, 1)
        return (ns, ni), None

    xs = (jnp.arange(num_blocks, dtype=jnp.int32), di, dv)
    if dm is not None:
        xs = xs + (dm,)
    (sims, idx), _ = jax.lax.scan(step, init, xs)
    idx = jnp.where(sims > NEG_INF / 2, idx, -1)
    return sims, idx


@partial(jax.jit, static_argnames=("vocab",))
def sparse_ip_rows(
    q_idx: jax.Array,
    q_val: jax.Array,
    doc_idx: jax.Array,  # (Q, M, P) gathered rows per query
    doc_val: jax.Array,
    *,
    vocab: int,
) -> jax.Array:
    """Per-query gathered sparse rows -> (Q, M) IP (HNSW-sparse beam scoring)."""
    q_dense = _densify_queries(q_idx, q_val, vocab)  # (Q, V)
    safe = jnp.clip(doc_idx, 0, vocab - 1)
    w = jnp.take_along_axis(
        q_dense[:, None, :], safe.reshape(*safe.shape[:2], -1), axis=2
    ).reshape(safe.shape)
    contrib = w * jnp.where(doc_idx >= 0, doc_val, 0.0)
    return contrib.sum(-1)


@partial(jax.jit, static_argnames=("sig_dims",))
def _signature_chunk(doc_idx, doc_val, *, sig_dims: int):
    """(B, P) sparse rows -> (B, S) feature-hash signatures (scatter-add of
    sign-hashed values). The hash kernel (Weinberger et al., ICML'09) is an
    unbiased estimator of the sparse dot: sig(a).sig(b) ~= a.b."""
    h = doc_idx.astype(jnp.uint32) * jnp.uint32(2654435761)
    slot = (h >> jnp.uint32(7)) & jnp.uint32(sig_dims - 1)
    sign = jnp.where((h & jnp.uint32(1 << 6)) != 0, 1.0, -1.0).astype(
        jnp.float32
    )
    vals = jnp.where(doc_idx >= 0, doc_val * sign, 0.0)
    b = doc_idx.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    out = jnp.zeros((b, sig_dims), jnp.float32)
    return out.at[rows, slot.astype(jnp.int32)].add(vals)


def sparse_signatures(doc_idx, doc_val, sig_dims: int = 256, chunk: int = 1 << 17):
    """Device (N, P) sparse rows -> HOST (N, S) f32 signature matrix, chunked.

    The dense twin of the sparse corpus: k-means bucketing and per-bucket
    MXU candidate scoring run on signatures (`core/hnsw_sparse.py`
    clustered build), with exact sparse rescoring after — the scalable
    replacement for the O(N^2) full-corpus kNN at 1M+ docs."""
    import numpy as np

    n = doc_idx.shape[0]
    out = np.empty((n, sig_dims), np.float32)
    lo = 0
    while lo < n:
        hi = min(lo + chunk, n)
        # fixed-shape dispatch: slice a full chunk ending at n when possible
        s = max(0, hi - chunk)
        got = _signature_chunk(
            doc_idx[s:hi], doc_val[s:hi], sig_dims=sig_dims
        )
        out[s:hi] = np.asarray(got)
        lo = hi
    return out
