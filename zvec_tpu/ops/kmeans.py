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

__all__ = ["kmeanspp_seed", "lloyd", "assign", "assign_top2", "stratified_train"]


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


@partial(jax.jit, static_argnames=("iters", "block"))
def lloyd(
    data: jax.Array, centroids: jax.Array, iters: int = 10, block: int = 65536
) -> Tuple[jax.Array, jax.Array]:
    """`iters` Lloyd iterations, blocked over N so the (N, K) distance matrix
    never materializes (HBM-safe at 10M x 4096). Returns (centroids, assigns)."""
    n = data.shape[0]
    k = centroids.shape[0]
    block = min(block, n)
    pad = (-n) % block
    if pad:
        # pad rows carry zero weight (a whole-N block materializes (N, K))
        data = jnp.pad(data, ((0, pad), (0, 0)))
    n_pad = n + pad
    nb = n_pad // block
    data_b = data.reshape(nb, block, -1)
    valid_b = (jnp.arange(n_pad) < n).reshape(nb, block)

    def assign_block(cents, x, valid):
        d2 = squared_l2_matrix(x, cents)  # (block, K)
        a = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(a, k, dtype=jnp.float32)
        one_hot = one_hot * valid[:, None]
        sums = jnp.einsum(
            "nk,nd->kd", one_hot, x, precision=jax.lax.Precision.HIGHEST
        )
        return a, sums, one_hot.sum(0)

    def step(cents, _):
        def scan_body(carry, inp):
            x, valid = inp
            sums, counts = carry
            _, s, c = assign_block(cents, x, valid)
            return (sums + s, counts + c), None

        (sums, counts), _ = jax.lax.scan(
            scan_body,
            (jnp.zeros((k, data.shape[1]), jnp.float32), jnp.zeros((k,), jnp.float32)),
            (data_b, valid_b),
        )
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cents
        )
        return new, None

    centroids, _ = jax.lax.scan(step, centroids.astype(jnp.float32), None, length=iters)

    def final_body(_, inp):
        x, valid = inp
        a, _, _ = assign_block(centroids, x, valid)
        return None, a

    _, assigns = jax.lax.scan(final_body, None, (data_b, valid_b))
    return centroids, assigns.reshape(n_pad)[:n]


def stratified_train(
    data: np.ndarray,
    k: int,
    rng: np.random.Generator,
    iters: int = 10,
) -> np.ndarray:
    """Two-level stratified k-means (reference `StratifiedCluster`,
    `src/core/algorithm/cluster/`): cluster into ~sqrt(k) coarse strata, then
    train centroids within each stratum proportionally to its mass. Cheaper
    than flat k-means at large K and gives better-balanced lists."""
    n = data.shape[0]
    k = min(k, n)
    k1 = max(int(np.sqrt(k)), 1)
    coarse_seeds = kmeanspp_seed(data, k1, rng)
    coarse, assign1 = lloyd(jnp.asarray(data), jnp.asarray(coarse_seeds), iters=max(iters // 2, 2))
    coarse = np.asarray(coarse)
    assign1 = np.asarray(assign1)
    counts = np.bincount(assign1, minlength=k1).astype(np.float64)
    # allocate fine centroids proportionally (>=1 per non-empty stratum)
    alloc = np.maximum((counts / max(counts.sum(), 1) * k).astype(np.int64), 1)
    alloc[counts == 0] = 0
    while alloc.sum() > k:
        alloc[np.argmax(alloc)] -= 1
    while 0 < alloc.sum() < k:
        alloc[np.argmax(counts - alloc)] += 1
    out = []
    for s in range(k1):
        if alloc[s] == 0:
            continue
        pts = data[assign1 == s]
        if len(pts) == 0:
            continue
        if alloc[s] == 1 or len(pts) <= alloc[s]:
            out.append(pts[: max(int(alloc[s]), 1)])
            continue
        seeds = kmeanspp_seed(pts, int(alloc[s]), rng)
        fine, _ = lloyd(jnp.asarray(pts), jnp.asarray(seeds), iters=max(iters // 2, 2))
        out.append(np.asarray(fine))
    cents = np.concatenate(out, axis=0)[:k]
    if len(cents) < k:  # top up from data points
        extra = data[rng.choice(n, k - len(cents), replace=False)]
        cents = np.concatenate([cents, extra], axis=0)
    return cents.astype(np.float32)


@jax.jit
def assign(data: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid assignment (N,)."""
    return jnp.argmin(squared_l2_matrix(data, centroids), axis=1)


def assign_top2(data: jax.Array, centroids: jax.Array):
    """Two nearest centroids per point (N, 2) — the spilled assignment behind
    the reference's `use_soar` option (`index_params.h:252-258`).

    Delegates to the HNSW build's blocked top-2 kernel: the old whole-N
    `squared_l2_matrix` materialized an (N, K) matrix — 41GB at 10M x 1024,
    an AOT-compile OOM through the tunnel. The blocked path never holds more
    than (16384, K) and reuses one compiled chunk program.

    Return residency differs by size: small N stays a device `jax.Array`;
    the large-N chunked path assembles on HOST and returns `np.ndarray`
    (the chunks are fetched anyway to overlap D2H with compute — callers
    wanting device arrays would re-upload through the ~0.5s-latency
    tunnel, so don't chain device ops on this result at scale)."""
    from .hnsw import assign_top2_blocked

    return assign_top2_blocked(data, centroids, block=16384)
