"""Attribute the 10M build's assign_top2 cost (BASELINE.md r4 phase table).

The clustered-candidate phase spends 380s in `assign_top2_blocked` — one
lax.scan over 611 (16384, 128) blocks against (8000, 128) centroids, i.e.
0.62s/step where the matmul alone is ~ms-scale. This microbench times one
S-step scan program per variant on the REAL shapes to find where the time
goes: the double-argmin (current), `lax.approx_max_k` k=2 (hardware pooled
top-k), plain `lax.top_k` k=2 (the rejected baseline), matmul-only, and the
current variant at K=2000 (round-2's shape, where the ~0.05s/step estimate
came from).

Usage: python benchmarks/profile_assign.py          (TPU, ~5 min)
       PROF_S=8 PROF_K=8000 to override steps / centroid count
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = int(os.environ.get("PROF_S", "8"))
K = int(os.environ.get("PROF_K", "8000"))
B = 16384
D = 128


def log(msg):
    print(f"[assign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from zvec_tpu.ops.hnsw import _exact_dots

    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.standard_normal((S * B, D)).astype(np.float32).astype(jnp.bfloat16)
    )
    cents = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
    cnorm2 = jnp.sum(cents * cents, axis=-1)

    def scored(x):
        return cnorm2[None, :] - 2.0 * _exact_dots("nd,kd->nk", x, cents)

    def run_scan(body):
        @jax.jit
        def prog(data):
            data_b = data.reshape(S, B, D)

            def step(_, x):
                return None, body(x)

            _, out = jax.lax.scan(step, None, data_b)
            return out

        out = np.asarray(prog(data))  # compile + sync
        t0 = time.perf_counter()
        out = np.asarray(prog(data))
        return (time.perf_counter() - t0) / S, out

    results = {"steps": S, "K": K, "B": B}

    # A. current production path: double argmin
    def double_argmin(x):
        score = scored(x)
        i1 = jnp.argmin(score, axis=1).astype(jnp.int32)
        s2 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) == i1[:, None],
            jnp.inf, score,
        )
        i2 = jnp.argmin(s2, axis=1).astype(jnp.int32)
        return jnp.stack([i1, i2], axis=1)

    dt, ref = run_scan(double_argmin)
    results["A_double_argmin_s_per_step"] = round(dt, 4)
    log(f"A double argmin: {dt*1e3:.1f} ms/step")

    # B. hardware pooled top-k (approx_max_k on negated score)
    def approx2(x):
        _, idx = jax.lax.approx_max_k(-scored(x), 2)
        return idx.astype(jnp.int32)

    dt, out = run_scan(approx2)
    agree = float((out[..., 0] == ref[..., 0]).mean())
    results["B_approx_max_k_s_per_step"] = round(dt, 4)
    results["B_top1_agreement"] = round(agree, 4)
    log(f"B approx_max_k: {dt*1e3:.1f} ms/step (top1 agree {agree:.4f})")

    # C. exact lax.top_k (the rejected full-lane-sort baseline)
    def topk2(x):
        _, idx = jax.lax.top_k(-scored(x), 2)
        return idx.astype(jnp.int32)

    dt, out = run_scan(topk2)
    results["C_top_k_s_per_step"] = round(dt, 4)
    log(f"C lax.top_k: {dt*1e3:.1f} ms/step")

    # D. matmul only (scores reduced by a cheap sum — isolates the MXU cost)
    def mm_only(x):
        return jnp.sum(scored(x), axis=1)

    dt, _ = run_scan(mm_only)
    results["D_matmul_only_s_per_step"] = round(dt, 4)
    log(f"D matmul only: {dt*1e3:.1f} ms/step")

    # E. single argmin (is the second pass the cost, or the first?)
    def single_argmin(x):
        return jnp.argmin(scored(x), axis=1).astype(jnp.int32)

    dt, _ = run_scan(single_argmin)
    results["E_single_argmin_s_per_step"] = round(dt, 4)
    log(f"E single argmin: {dt*1e3:.1f} ms/step")

    print(json.dumps(results, indent=1), flush=True)
    with open("/tmp/profile_assign.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
