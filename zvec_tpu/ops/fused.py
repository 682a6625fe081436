"""One-program dense+sparse fused scoring.

The reference answers a multi-vector query with in-process per-field
searches (microsecond hops between them,
`/root/reference/python/zvec/executor/query_executor.py:196-211`). Through
the axon tunnel every dispatch costs a round trip, so per-field programs —
even overlapped — pay twice. This module compiles BOTH fields' exact scans
into ONE XLA program per (dense-shape, sparse-shape, topk) combination:
one dispatch, and the four result arrays are packed into a SINGLE
int32 transfer array (sims bitcast into int lanes) — each D2H fetch
through the tunnel is its own round trip, so one packed array halves the
finalize latency vs separate score/index fetches. The packed buffer must
be INT, never float: ids bitcast to f32 are subnormal bit patterns below
2**23 and the TPU D2H path flushes subnormals to zero (see
`ops/topk.py::pack_topk`).

Semantics are identical to running `blockwise_topk_search` (dense) and
`sparse_ip_topk` (sparse) separately — both are traced inline into the
same jit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..typing.enum import MetricType
from .sparse import sparse_ip_topk
from .topk import blockwise_topk_search

__all__ = [
    "fused_dense_sparse_topk",
    "fused_hnsw_sparse_topk",
    "unpack_fused",
]


def _pack(d_s, d_i, s_s, s_i):
    """Pack both fields' (sims, ids) into ONE int32 array:
    [bitcast(d_s) | bitcast(s_s) | d_i | s_i] along axis 1 (int lanes are
    immune to the D2H subnormal flush — see `ops/topk.py::pack_topk`)."""
    sims = jnp.concatenate([d_s, s_s], axis=1)
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(sims, jnp.int32),
            d_i.astype(jnp.int32),
            s_i.astype(jnp.int32),
        ],
        axis=1,
    )


def unpack_fused(packed: "jax.Array", k: int):
    """Host-side unpack of `_pack` output (one D2H fetch): returns
    ((d_s, d_i), (s_s, s_i)) numpy arrays, sims f32, ids int64."""
    import numpy as np

    arr = np.asarray(packed)
    sims = np.ascontiguousarray(arr[:, : 2 * k]).view(np.float32)
    d_s, s_s = sims[:, :k], sims[:, k : 2 * k]
    d_i = arr[:, 2 * k : 3 * k].astype(np.int64)
    s_i = arr[:, 3 * k :].astype(np.int64)
    return (d_s, d_i), (s_s, s_i)


@partial(
    jax.jit,
    static_argnames=(
        "metric", "ef", "topk", "max_steps", "num_levels", "frontier",
        "int4_packed", "visited_bits", "visited_bytes", "approx_merge",
        "done_frac", "vocab",
    ),
)
def fused_hnsw_sparse_topk(
    dq,  # (Q, D) f32 dense queries
    codes, norms, l0_nbrs, upper_ids, upper_nbrs, upper_down, entry_rows,
    dmask,  # (N_pad,) bool or None — dense result filter
    scan_budget,
    q_idx, q_val, doc_idx, doc_val, smask,
    dequant=None,
    *,
    metric: MetricType,
    ef: int,
    topk: int,
    max_steps: int,
    num_levels: int,
    frontier: int = 1,
    int4_packed: bool = False,
    visited_bits: int = 0,
    visited_bytes: bool = False,
    approx_merge: bool = False,
    done_frac: float = 1.0,
    vocab: int,
):
    """HNSW beam (dense field) + padded-CSR sparse top-k in ONE program —
    the common production multi-vector shape (dense ANN index + sparse
    lexical field). Same packing contract as `fused_dense_sparse_topk`."""
    from .hnsw import _beam_core

    d_s, d_i = _beam_core(
        dq, codes, norms, l0_nbrs, upper_ids, upper_nbrs, upper_down,
        entry_rows, dmask, scan_budget, dequant, None, None,
        metric=metric, ef=ef, topk=topk, max_steps=max_steps,
        num_levels=num_levels, frontier=frontier, int4_packed=int4_packed,
        visited_bits=visited_bits, visited_bytes=visited_bytes,
        approx_merge=approx_merge, done_frac=done_frac,
    )
    s_s, s_i = sparse_ip_topk(
        q_idx, q_val, doc_idx, doc_val, smask, topk=topk, vocab=vocab
    )
    return _pack(d_s, d_i, s_s, s_i)


@partial(
    jax.jit,
    static_argnames=("metric", "topk", "vocab", "int4_packed"),
)
def fused_dense_sparse_topk(
    dq: jax.Array,  # (Q, D) f32 dense queries
    codes: jax.Array,  # (N_pad, D) dense codes (storage dtype)
    norms: Optional[jax.Array],  # (N_pad,) squared norms or None
    dmask: jax.Array,  # (N_pad,) bool valid-row mask (dense)
    q_idx: jax.Array,  # (Q, Pq) int32 sparse query indices, -1 pad
    q_val: jax.Array,  # (Q, Pq) f32 sparse query values
    doc_idx: jax.Array,  # (Ns_pad, P) int32 padded-CSR doc indices
    doc_val: jax.Array,  # (Ns_pad, P) f32
    smask: jax.Array,  # (Ns_pad,) bool valid-row mask (sparse)
    dequant: Optional[Tuple[jax.Array, jax.Array]] = None,
    *,
    metric: MetricType,
    topk: int,
    vocab: int,
    int4_packed: bool = False,
):
    """Returns ONE packed (Q, 4*topk) int32 array (see `_pack`/`unpack_fused`):
    bitcast dense sims | bitcast sparse sims | dense ids | sparse ids —
    the host fetches a single array, one tunnel round trip. Int32 lanes, not
    f32: ids bitcast into f32 lanes are subnormal bit patterns the TPU D2H
    path flushes to zero."""
    d_s, d_i = blockwise_topk_search(
        dq,
        codes,
        metric,
        topk,
        mask=dmask,
        x_sq_norms=norms,
        dequant=dequant,
        int4_packed=int4_packed,
    )
    s_s, s_i = sparse_ip_topk(
        q_idx, q_val, doc_idx, doc_val, smask, topk=topk, vocab=vocab
    )
    return _pack(d_s, d_i, s_s, s_i)
