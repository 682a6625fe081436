"""Sparse-vector graph beam search.

Reference equivalent: `src/core/algorithm/hnsw_sparse/` — HNSW traversal with
a sparse dot-product distance calculator (`hnsw_sparse_dist_calculator.h:22`).

TPU-native shape: same batched lockstep beam loop as the dense kernel
(`ops/hnsw.py`), but scoring gathers padded sparse rows and dots them against
the densified query (`ops/sparse.py` layout). The graph is single-level
(NSW-style) with a small probed entry set instead of the upper-level descent:
with sparse lexical data the hierarchy's role (long-range hops) is covered by
scoring a fixed sample of entry candidates — same API and recall target,
simpler device program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .runtime import NEG_INF
from .sparse import _densify_queries

__all__ = ["hnsw_sparse_search", "sparse_beam_core"]


def _sparse_rows_sims(q_dense, doc_idx_rows, doc_val_rows, vocab):
    """q_dense (Q, V); rows (Q, M, P) -> (Q, M) dots."""
    safe = jnp.clip(doc_idx_rows, 0, vocab - 1)
    nq, m, p = safe.shape
    w = jnp.take_along_axis(
        q_dense[:, None, :].repeat(1, axis=1), safe.reshape(nq, 1, m * p), axis=2
    ).reshape(nq, m, p)
    contrib = w * jnp.where(doc_idx_rows >= 0, doc_val_rows, 0.0)
    return contrib.sum(-1)


def sparse_beam_core(
    q_idx: jax.Array,  # (Q, Pq)
    q_val: jax.Array,  # (Q, Pq)
    doc_idx: jax.Array,  # (N_pad, P)
    doc_val: jax.Array,  # (N_pad, P)
    l0_nbrs: jax.Array,  # (N_pad, M0)
    entry_ids: jax.Array,  # (E,) probe entry candidates
    mask: Optional[jax.Array],  # (N_pad,) bool or None
    scan_budget: jax.Array,  # () int32
    *,
    ef: int,
    topk: int,
    max_steps: int,
    vocab: int,
    frontier: int = 1,
):
    nq = q_idx.shape[0]
    n_pad = doc_idx.shape[0]
    words = (n_pad + 31) // 32
    q_dense = _densify_queries(q_idx, q_val, vocab)

    # score the probe entry set, take best entries as initial candidates
    e = entry_ids.shape[0]
    ent_rows_i = doc_idx[entry_ids][None].repeat(nq, axis=0)  # (Q, E, P)
    ent_rows_v = doc_val[entry_ids][None].repeat(nq, axis=0)
    ent_sims = _sparse_rows_sims(q_dense, ent_rows_i, ent_rows_v, vocab)  # (Q, E)

    kw = max(ef, topk)
    k0 = min(ef, e)
    top_es, top_epos = jax.lax.top_k(ent_sims, k0)
    top_ei = entry_ids[top_epos]

    cand_s = jnp.full((nq, ef), NEG_INF, jnp.float32).at[:, :k0].set(top_es)
    cand_i = jnp.full((nq, ef), -1, jnp.int32).at[:, :k0].set(top_ei)
    cand_x = jnp.zeros((nq, ef), bool)

    if mask is not None:
        ent_ok = mask[top_ei]
    else:
        ent_ok = jnp.ones_like(top_ei, dtype=bool)
    res_s = jnp.full((nq, kw), NEG_INF, jnp.float32).at[:, :k0].set(
        jnp.where(ent_ok, top_es, NEG_INF)
    )
    res_i = jnp.full((nq, kw), -1, jnp.int32).at[:, :k0].set(
        jnp.where(ent_ok, top_ei, -1)
    )

    visited = jnp.zeros((nq, words), jnp.uint32)
    qidx = jnp.arange(nq)
    # mark entries visited (bits disjoint per unique id -> add == or)
    ent_word = top_ei // 32
    ent_bit = jnp.uint32(1) << (top_ei % 32).astype(jnp.uint32)
    cur = jnp.take_along_axis(visited, ent_word, axis=1)
    add = jnp.where((cur & ent_bit) == 0, ent_bit, jnp.uint32(0))
    visited = visited.at[qidx[:, None], ent_word].add(add)

    scanned = jnp.full((nq,), e, jnp.int32)
    done = jnp.zeros((nq,), bool)

    def cond(state):
        return jnp.logical_and(state[-1] < max_steps, ~jnp.all(state[-2]))

    def body(state):
        res_s, res_i, cand_s, cand_i, cand_x, visited, scanned, done, step = state
        avail = (~cand_x) & (cand_i >= 0)
        masked = jnp.where(avail, cand_s, NEG_INF)
        f_sims, f_pos = jax.lax.top_k(masked, frontier)
        f_ids = jnp.take_along_axis(cand_i, f_pos, 1)
        f_ok = f_sims > NEG_INF / 2
        best_sim = f_sims[:, 0]
        has_avail = jnp.any(avail, axis=1)

        res_min = res_s[:, -1]
        res_full = res_i[:, -1] >= 0
        newly_done = (
            (~has_avail)
            | (res_full & (best_sim < res_min))
            | (scanned >= scan_budget)
        )
        done = done | newly_done
        active = ~done

        pos_eq = (
            jnp.arange(cand_x.shape[1])[None, :, None] == f_pos[:, None, :]
        ) & f_ok[:, None, :]
        cand_x = jnp.where(pos_eq.any(-1) & active[:, None], True, cand_x)

        nbrs3 = l0_nbrs[jnp.clip(f_ids, 0)]  # (Q, F, M0)
        valid3 = (nbrs3 >= 0) & f_ok[:, :, None]
        nbrs = nbrs3.reshape(nbrs3.shape[0], -1)
        valid = valid3.reshape(nbrs.shape) & active[:, None]
        nbrs_safe = jnp.clip(nbrs, 0)

        if frontier > 1:
            # intra-step dedup keeps the bitset scatter-add sound
            order = jnp.argsort(jnp.where(valid, nbrs_safe, 2**30), axis=1)
            sorted_ids = jnp.take_along_axis(nbrs_safe, order, 1)
            dup_sorted = jnp.concatenate(
                [
                    jnp.zeros((nbrs.shape[0], 1), bool),
                    sorted_ids[:, 1:] == sorted_ids[:, :-1],
                ],
                axis=1,
            )
            inv = jnp.argsort(order, axis=1)
            valid = valid & ~jnp.take_along_axis(dup_sorted, inv, 1)

        word_idx = nbrs_safe // 32
        bit = jnp.uint32(1) << (nbrs_safe % 32).astype(jnp.uint32)
        word_val = jnp.take_along_axis(visited, word_idx, axis=1)
        fresh = valid & ((word_val & bit) == 0)
        visited = visited.at[qidx[:, None], word_idx].add(
            jnp.where(fresh, bit, jnp.uint32(0))
        )

        rows_i = doc_idx[nbrs_safe]  # (Q, M0, P)
        rows_v = doc_val[nbrs_safe]
        sims = _sparse_rows_sims(q_dense, rows_i, rows_v, vocab)
        sims = jnp.where(fresh, sims, NEG_INF)
        scanned = scanned + fresh.sum(axis=1, dtype=jnp.int32)

        all_s = jnp.concatenate([cand_s, sims], axis=1)
        all_i = jnp.concatenate([cand_i, jnp.where(fresh, nbrs_safe, -1)], axis=1)
        all_x = jnp.concatenate([cand_x, jnp.zeros_like(sims, dtype=bool)], axis=1)
        ns, sel = jax.lax.top_k(all_s, ef)
        cand_s = jnp.where(active[:, None], ns, cand_s)
        cand_i = jnp.where(
            active[:, None], jnp.take_along_axis(all_i, sel, 1), cand_i
        )
        cand_x = jnp.where(
            active[:, None], jnp.take_along_axis(all_x, sel, 1), cand_x
        )

        if mask is not None:
            rsims = jnp.where(mask[nbrs_safe] & fresh, sims, NEG_INF)
        else:
            rsims = sims
        rids = jnp.where(rsims > NEG_INF / 2, nbrs_safe, -1)
        r_all_s = jnp.concatenate([res_s, rsims], axis=1)
        r_all_i = jnp.concatenate([res_i, rids], axis=1)
        nr_s, rsel = jax.lax.top_k(r_all_s, res_s.shape[1])
        res_s = jnp.where(active[:, None], nr_s, res_s)
        res_i = jnp.where(
            active[:, None], jnp.take_along_axis(r_all_i, rsel, 1), res_i
        )

        return (res_s, res_i, cand_s, cand_i, cand_x, visited, scanned, done, step + 1)

    state = (res_s, res_i, cand_s, cand_i, cand_x, visited, scanned, done, jnp.int32(0))
    res_s, res_i, *_ = jax.lax.while_loop(cond, body, state)
    res_s, res_i = res_s[:, :topk], res_i[:, :topk]
    res_i = jnp.where(res_s > NEG_INF / 2, res_i, -1)
    return res_s, res_i


# jitted entry point; `sparse_beam_core` stays callable unjitted so the
# mesh-sharded path can run it inside shard_map (parallel/mesh.py)
hnsw_sparse_search = partial(
    jax.jit, static_argnames=("ef", "topk", "max_steps", "vocab", "frontier")
)(sparse_beam_core)
