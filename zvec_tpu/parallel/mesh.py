"""Multi-chip scale-out: corpus sharding over a device mesh.

The reference's only parallelism is intra-process threads + per-segment Acero
plans (SURVEY §2.9); the TPU-native scale-out axis is corpus scale: segments
shard across mesh devices ('corpus' axis), query batches shard across the
'batch' axis, per-shard top-k results merge with one all_gather over ICI
(SURVEY §5.8). Index training (k-means) runs as psum all-reduce steps.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import similarity_matrix
from ..ops.runtime import NEG_INF
from ..typing.enum import MetricType

__all__ = [
    "make_mesh",
    "collection_mesh",
    "corpus_sharding",
    "sharded_flat_search",
    "sharded_hnsw_search",
    "sharded_ivf_probe",
    "sharded_sparse_topk",
    "sharded_sparse_beam",
    "sharded_kmeans_step",
]


def make_mesh(
    n_devices: int | None = None, batch_axis: int = 1
) -> Mesh:
    """2D mesh: ('batch', 'corpus'). Queries shard over 'batch', corpus rows
    over 'corpus'."""
    devices = jax.devices()
    n = n_devices or len(devices)
    corpus_axis = n // batch_axis
    grid = np.array(devices[:n]).reshape(batch_axis, corpus_axis)
    return Mesh(grid, ("batch", "corpus"))


_collection_mesh_cache: dict = {}


def collection_mesh() -> Mesh | None:
    """Collection-level mesh, governed by `GlobalConfig.mesh_devices`
    (`zvec_tpu.init(mesh_devices=N)`). Returns None when disabled or when
    fewer than N jax devices exist. Engines consult this to place sealed
    segment codes with a corpus sharding so every query fans out over the
    mesh and merges per-shard top-k over ICI — the TPU-native analog of the
    reference's per-segment Acero plan union
    (`query_planner.cc:344-448`, SURVEY §2.9)."""
    from ..utils.config import GlobalConfig

    n = int(getattr(GlobalConfig.instance(), "mesh_devices", 0) or 0)
    if n <= 1:
        return None
    if len(jax.devices()) < n:
        return None
    if n not in _collection_mesh_cache:
        _collection_mesh_cache[n] = make_mesh(n, batch_axis=1)
    return _collection_mesh_cache[n]


def corpus_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    spec = P("corpus", *(None,) * (ndim - 1)) if ndim > 1 else P("corpus")
    return NamedSharding(mesh, spec)


def sharded_flat_search(
    mesh: Mesh,
    queries: jax.Array,  # (Q, D) — Q divisible by batch axis
    codes: jax.Array,  # (N, D) — N divisible by corpus axis
    metric: MetricType,
    topk: int,
    mask: Optional[jax.Array] = None,  # (N,) bool, corpus-sharded
    x_sq_norms: Optional[jax.Array] = None,  # (N,) f32, corpus-sharded
    dequant: Optional[Tuple[jax.Array, jax.Array]] = None,
    int4_packed: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact sharded top-k: every corpus shard scores its rows against the
    local query sub-batch (filter mask fused), then per-shard top-k merge via
    all_gather over the 'corpus' axis (ICI). Returns (sims (Q, topk), global
    indices). Supports the full storage matrix (fp32/fp16/int8/packed-int4
    codes with fused dequant epilogue)."""
    n = codes.shape[0]
    n_corpus = mesh.shape["corpus"]
    shard_rows = n // n_corpus
    has_mask = mask is not None
    has_norms = x_sq_norms is not None

    in_specs = [P("batch", None), P("corpus", None)]
    args = [queries, codes]
    if has_mask:
        in_specs.append(P("corpus"))
        args.append(mask)
    if has_norms:
        in_specs.append(P("corpus"))
        args.append(x_sq_norms)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    def search(q_blk, codes_blk, *rest):
        ri = 0
        mask_blk = rest[ri] if has_mask else None
        ri += int(has_mask)
        norms_blk = rest[ri] if has_norms else None
        sims = similarity_matrix(
            q_blk, codes_blk, metric, norms_blk, dequant, int4_packed
        )  # (q, shard_rows)
        if mask_blk is not None:
            sims = jnp.where(mask_blk[None, :], sims, NEG_INF)
        k = min(topk, shard_rows)
        loc_s, loc_i = jax.lax.top_k(sims, k)
        my_shard = jax.lax.axis_index("corpus")
        loc_i = loc_i + my_shard * shard_rows
        # gather each shard's top-k along the k axis -> (q, n_corpus * k)
        all_s = jax.lax.all_gather(loc_s, "corpus", axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, "corpus", axis=1, tiled=True)
        out_k = min(topk, all_s.shape[1])
        m_s, sel = jax.lax.top_k(all_s, out_k)
        m_i = jnp.take_along_axis(all_i, sel, axis=1)
        if out_k < topk:
            m_s = jnp.pad(m_s, ((0, 0), (0, topk - out_k)), constant_values=NEG_INF)
            m_i = jnp.pad(m_i, ((0, 0), (0, topk - out_k)), constant_values=-1)
        m_i = jnp.where(m_s > NEG_INF / 2, m_i, -1)
        return m_s, m_i

    return search(*args)


def sharded_hnsw_search(
    mesh: Mesh,
    queries: jax.Array,  # (Q, D) f32
    codes: jax.Array,  # (S*R, Dc) corpus-sharded, contiguous global rows
    norms: jax.Array,  # (S*R,) corpus-sharded
    l0_nbrs: jax.Array,  # (S*R, M0) per-shard LOCAL rows, corpus-sharded
    upper_ids,  # tuple, per level: (S*U_l,) local L0 ids
    upper_nbrs,  # tuple, per level: (S*U_l, Mu) local level rows
    upper_down,  # tuple, per level: (S*U_l,) local rows one level down
    entry_rows: jax.Array,  # (S*(L+1),) per-shard entry row per level
    mask: Optional[jax.Array],  # (S*R,) bool, corpus-sharded
    scan_budget: jax.Array,  # () int32 per-shard budget
    dequant: Optional[Tuple[jax.Array, jax.Array]] = None,
    *,
    metric: MetricType,
    ef: int,
    topk: int,
    max_steps: int,
    num_levels: int,
    frontier: int = 4,
    int4_packed: bool = False,
    visited_bits: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Corpus-sharded HNSW search: every device owns an INDEPENDENT subgraph
    over its contiguous global row range [shard*R, (shard+1)*R); queries
    replicate over the 'corpus' axis, each shard runs the batched beam on its
    local graph, then per-shard top-k merge with one all_gather over ICI —
    the TPU-native scale-out of the reference's per-segment search fan-out
    (`query_planner.cc:344-448`). The union of per-shard graph searches
    dominates a single monolithic graph at equal ef (each shard's beam is
    exhaustive over a smaller corpus). Returns (sims (Q, topk) desc, GLOBAL
    row ids (Q, topk), -1 padded)."""
    from ..ops.hnsw import _beam_core

    n_corpus = mesh.shape["corpus"]
    shard_rows = codes.shape[0] // n_corpus
    has_mask = mask is not None

    lvl_specs_1d = tuple(P("corpus") for _ in upper_ids)
    lvl_specs_2d = tuple(P("corpus", None) for _ in upper_nbrs)
    in_specs = [
        P("batch", None),  # queries replicated along 'corpus'
        P("corpus", None),  # codes
        P("corpus"),  # norms
        P("corpus", None),  # l0
        lvl_specs_1d,  # upper_ids
        lvl_specs_2d,  # upper_nbrs
        lvl_specs_1d,  # upper_down
        P("corpus"),  # entry_rows
    ]
    args = [
        queries, codes, norms, l0_nbrs,
        tuple(upper_ids), tuple(upper_nbrs), tuple(upper_down), entry_rows,
    ]
    if has_mask:
        in_specs.append(P("corpus"))
        args.append(mask)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    def search(q_blk, codes_blk, norms_blk, l0_blk, uids, unbrs, udown,
               entries, *rest):
        mask_blk = rest[0] if has_mask else None
        loc_s, loc_i = _beam_core(
            q_blk, codes_blk, norms_blk, l0_blk, uids, unbrs, udown,
            entries, mask_blk, scan_budget, dequant,
            metric=metric, ef=ef, topk=topk, max_steps=max_steps,
            num_levels=num_levels, frontier=frontier,
            int4_packed=int4_packed, visited_bits=visited_bits,
        )
        my_shard = jax.lax.axis_index("corpus")
        loc_i = jnp.where(loc_i >= 0, loc_i + my_shard * shard_rows, -1)
        all_s = jax.lax.all_gather(loc_s, "corpus", axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, "corpus", axis=1, tiled=True)
        m_s, sel = jax.lax.top_k(all_s, topk)
        m_i = jnp.take_along_axis(all_i, sel, axis=1)
        m_i = jnp.where(m_s > NEG_INF / 2, m_i, -1)
        return m_s, m_i

    return search(*args)


def sharded_ivf_probe(
    mesh: Mesh,
    queries: jax.Array,  # (Q, D) f32, replicated over 'corpus'
    centroids: jax.Array,  # (KV, D) corpus-sharded virtual-list centroids
    lists_codes: jax.Array,  # (KV, L, D) corpus-sharded
    lists_norms: jax.Array,  # (KV, L) corpus-sharded
    lists_ids: jax.Array,  # (KV, L) GLOBAL row ids (-1 pad), corpus-sharded
    cent_valid: jax.Array,  # (KV,) bool, corpus-sharded (shard-pad dummies)
    mask: Optional[jax.Array],  # (N,) bool, REPLICATED (ids are global)
    dequant,
    *,
    metric: MetricType,
    nprobe: int,
    topk: int,
    int4_packed: bool = False,
    max_scan: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Corpus-sharded IVF probe: virtual lists shard over the 'corpus' axis;
    every shard probes its local top-nprobe lists (union over shards ⊇ the
    global top-nprobe, so recall >= the single-device probe), then one
    all_gather top-k merge over ICI — the same merge shape as
    `sharded_flat_search`. List ids are global rows, so no offset math."""
    from ..core.ivf import ivf_probe_core

    has_mask = mask is not None
    in_specs = [
        P("batch", None),
        P("corpus", None),
        P("corpus", None, None),
        P("corpus", None),
        P("corpus", None),
        P("corpus"),
    ]
    args = [queries, centroids, lists_codes, lists_norms, lists_ids, cent_valid]
    if has_mask:
        in_specs.append(P(None))
        args.append(mask)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    def probe(q_blk, cents_blk, codes_blk, norms_blk, ids_blk, valid_blk, *rest):
        mask_blk = rest[0] if has_mask else None
        np_local = min(nprobe, cents_blk.shape[0])
        loc_s, loc_i = ivf_probe_core(
            q_blk, cents_blk, codes_blk, norms_blk, ids_blk, mask_blk, dequant,
            metric=metric, nprobe=np_local, topk=topk,
            int4_packed=int4_packed, cent_valid=valid_blk,
            # per-SHARD budget: each shard scans its local nearest lists
            # under the same cap (union bounded by shards * cap)
            max_scan=max_scan,
        )
        all_s = jax.lax.all_gather(loc_s, "corpus", axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, "corpus", axis=1, tiled=True)
        m_s, sel = jax.lax.top_k(all_s, topk)
        m_i = jnp.take_along_axis(all_i, sel, axis=1)
        m_i = jnp.where(m_s > NEG_INF / 2, m_i, -1)
        return m_s, m_i

    return probe(*args)


def sharded_sparse_topk(
    mesh: Mesh,
    q_idx: jax.Array,  # (Q, Pq) int32, replicated
    q_val: jax.Array,  # (Q, Pq) f32
    doc_idx: jax.Array,  # (N, P) int32, corpus-sharded
    doc_val: jax.Array,  # (N, P) f32, corpus-sharded
    mask: jax.Array,  # (N,) bool, corpus-sharded
    *,
    topk: int,
    vocab: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact sharded sparse-IP top-k: each shard scans its padded-CSR rows
    against the densified queries, per-shard top-k merges with one
    all_gather over ICI (sparse analog of `sharded_flat_search`)."""
    from ..ops.sparse import sparse_ip_topk

    n = doc_idx.shape[0]
    n_corpus = mesh.shape["corpus"]
    shard_rows = n // n_corpus

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("batch", None), P("batch", None),
            P("corpus", None), P("corpus", None), P("corpus"),
        ),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    def scan(qi_blk, qv_blk, di_blk, dv_blk, m_blk):
        k = min(topk, shard_rows)
        loc_s, loc_i = sparse_ip_topk(
            qi_blk, qv_blk, di_blk, dv_blk, m_blk, topk=k, vocab=vocab
        )
        my_shard = jax.lax.axis_index("corpus")
        loc_i = jnp.where(loc_i >= 0, loc_i + my_shard * shard_rows, -1)
        all_s = jax.lax.all_gather(loc_s, "corpus", axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, "corpus", axis=1, tiled=True)
        out_k = min(topk, all_s.shape[1])
        m_s, sel = jax.lax.top_k(all_s, out_k)
        m_i = jnp.take_along_axis(all_i, sel, axis=1)
        if out_k < topk:
            m_s = jnp.pad(m_s, ((0, 0), (0, topk - out_k)), constant_values=NEG_INF)
            m_i = jnp.pad(m_i, ((0, 0), (0, topk - out_k)), constant_values=-1)
        m_i = jnp.where(m_s > NEG_INF / 2, m_i, -1)
        return m_s, m_i

    return scan(q_idx, q_val, doc_idx, doc_val, mask)


def sharded_sparse_beam(
    mesh: Mesh,
    q_idx: jax.Array,  # (Q, Pq) replicated
    q_val: jax.Array,
    doc_idx: jax.Array,  # (N, P) corpus-sharded
    doc_val: jax.Array,
    l0_nbrs: jax.Array,  # (N, M0) per-shard LOCAL rows, corpus-sharded
    entry_ids: jax.Array,  # (S*E,) per-shard LOCAL entry rows, corpus-sharded
    mask: jax.Array,  # (N,) bool, corpus-sharded
    scan_budget: jax.Array,  # () int32 per-shard budget
    *,
    ef: int,
    topk: int,
    max_steps: int,
    vocab: int,
    frontier: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Corpus-sharded sparse NSW beam: every shard owns an independent
    subgraph over its contiguous global row range (same recipe as
    `sharded_hnsw_search` — the union of per-shard beams dominates one
    monolithic graph at equal ef), merged with one all_gather."""
    from ..ops.hnsw_sparse import sparse_beam_core

    n = doc_idx.shape[0]
    n_corpus = mesh.shape["corpus"]
    shard_rows = n // n_corpus

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("batch", None), P("batch", None),
            P("corpus", None), P("corpus", None), P("corpus", None),
            P("corpus"), P("corpus"),
        ),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    def search(qi_blk, qv_blk, di_blk, dv_blk, l0_blk, entries_blk, m_blk):
        loc_s, loc_i = sparse_beam_core(
            qi_blk, qv_blk, di_blk, dv_blk, l0_blk, entries_blk, m_blk,
            scan_budget, ef=ef, topk=topk, max_steps=max_steps,
            vocab=vocab, frontier=frontier,
        )
        my_shard = jax.lax.axis_index("corpus")
        loc_i = jnp.where(loc_i >= 0, loc_i + my_shard * shard_rows, -1)
        all_s = jax.lax.all_gather(loc_s, "corpus", axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, "corpus", axis=1, tiled=True)
        m_s, sel = jax.lax.top_k(all_s, topk)
        m_i = jnp.take_along_axis(all_i, sel, axis=1)
        m_i = jnp.where(m_s > NEG_INF / 2, m_i, -1)
        return m_s, m_i

    return search(q_idx, q_val, doc_idx, doc_val, l0_nbrs, entry_ids, mask)


def sharded_kmeans_step(
    mesh: Mesh,
    data: jax.Array,  # (N, D) sharded over 'corpus'
    centroids: jax.Array,  # (K, D) replicated
) -> Tuple[jax.Array, jax.Array]:
    """One Lloyd iteration over the mesh: local assignment (matmul on MXU),
    psum of per-centroid sums/counts over BOTH axes, centroid update.
    Returns (new_centroids (K, D), inertia ())."""
    k, d = centroids.shape

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(("batch", "corpus"), None), P(None, None)),
        out_specs=(P(None, None), P(None)),
        check_vma=False,
    )
    def step(x_blk, cents):
        d2 = -similarity_matrix(x_blk, cents, MetricType.L2)  # (n, K) squared dists
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (n, K)
        sums = jnp.einsum(
            "nk,nd->kd", one_hot, x_blk, precision=jax.lax.Precision.HIGHEST
        )
        counts = one_hot.sum(0)
        local_inertia = jnp.min(d2, axis=1).sum()
        sums = jax.lax.psum(sums, ("batch", "corpus"))
        counts = jax.lax.psum(counts, ("batch", "corpus"))
        inertia = jax.lax.psum(local_inertia, ("batch", "corpus"))
        new_cents = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cents
        )
        return new_cents, inertia[None]

    new_cents, inertia = step(data, centroids)
    return new_cents, inertia[0]
