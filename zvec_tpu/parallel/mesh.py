"""Multi-chip scale-out: corpus sharding over a device mesh.

The reference's only parallelism is intra-process threads + per-segment Acero
plans (SURVEY §2.9); the TPU-native scale-out axis is corpus scale: segments
shard across mesh devices ('corpus' axis), query batches shard across the
'batch' axis, per-shard top-k results merge with one all_gather over ICI
(SURVEY §5.8). Index training (k-means) runs as psum all-reduce steps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import similarity_matrix
from ..ops.runtime import NEG_INF
from ..typing.enum import MetricType

__all__ = ["make_mesh", "sharded_flat_search", "sharded_kmeans_step"]


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


def sharded_flat_search(
    mesh: Mesh,
    queries: jax.Array,  # (Q, D) — Q divisible by batch axis
    codes: jax.Array,  # (N, D) — N divisible by corpus axis
    metric: MetricType,
    topk: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact sharded top-k: every corpus shard scores its rows against the
    local query sub-batch, then per-shard top-k merge via all_gather over the
    'corpus' axis (ICI). Returns (sims (Q, topk), global indices)."""
    n = codes.shape[0]
    n_corpus = mesh.shape["corpus"]
    shard_rows = n // n_corpus

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("batch", None), P("corpus", None)),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    def search(q_blk, codes_blk):
        sims = similarity_matrix(q_blk, codes_blk, metric)  # (q, shard_rows)
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
        return m_s, m_i

    return search(queries, codes)


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
