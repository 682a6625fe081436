"""K-means on device: seeding + Lloyd iterations as MXU matmuls.

Reference equivalents: `KmeansCluster` / `OptKmeansCluster` with K-MC²/
kmeans++ seeding (`src/core/algorithm/cluster/kmeans_cluster.cc:29-108`,
`src/ailego/algorithm/kmeans.h:39`). TPU-native shape: assignment is one
(N, D) x (D, K) matmul per iteration; centroid update is a one-hot matmul
(segment-sum on the MXU); seeding runs kmeans++ on a subsample with device
distance evaluations.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distance import squared_l2_matrix

__all__ = ["kmeanspp_seed", "lloyd", "assign"]


def kmeanspp_seed(
    data: np.ndarray, k: int, rng: np.random.Generator, sample: int = 16384
) -> np.ndarray:
    """kmeans++ seeding on a subsample (the role of the reference's K-MC²
    approximate seeding — both avoid full-corpus D² sampling)."""
    n = data.shape[0]
    if n > sample:
        idx = rng.choice(n, sample, replace=False)
        pts = data[idx].astype(np.float32)
    else:
        pts = data.astype(np.float32)
    m = pts.shape[0]
    k = min(k, m)
    centroids = np.empty((k, pts.shape[1]), dtype=np.float32)
    centroids[0] = pts[rng.integers(m)]
    d2 = ((pts - centroids[0]) ** 2).sum(1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centroids[i] = pts[rng.choice(m, p=probs)]
        d2 = np.minimum(d2, ((pts - centroids[i]) ** 2).sum(1))
    return centroids


@partial(jax.jit, static_argnames=("iters",))
def lloyd(
    data: jax.Array, centroids: jax.Array, iters: int = 10
) -> Tuple[jax.Array, jax.Array]:
    """`iters` Lloyd iterations. Returns (centroids (K, D), assignments (N,))."""
    k = centroids.shape[0]

    def step(cents, _):
        d2 = squared_l2_matrix(data, cents)  # (N, K)
        a = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(a, k, dtype=jnp.float32)
        sums = jnp.einsum(
            "nk,nd->kd", one_hot, data, precision=jax.lax.Precision.HIGHEST
        )
        counts = one_hot.sum(0)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cents)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids.astype(jnp.float32), None, length=iters)
    final_assign = jnp.argmin(squared_l2_matrix(data, centroids), axis=1)
    return centroids, final_assign


@jax.jit
def assign(data: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid assignment (N,)."""
    return jnp.argmin(squared_l2_matrix(data, centroids), axis=1)


@jax.jit
def assign_top2(data: jax.Array, centroids: jax.Array) -> jax.Array:
    """Two nearest centroids per point (N, 2) — the spilled assignment behind
    the reference's `use_soar` option (`index_params.h:252-258`)."""
    d2 = squared_l2_matrix(data, centroids)
    _, idx = jax.lax.top_k(-d2, 2)
    return idx
