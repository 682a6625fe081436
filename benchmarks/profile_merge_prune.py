"""Attribute the merge-prune chunk cost at the 10M shape (VERDICT r4 weak #3).

The r4 phase table puts reverse+merge at 1,685s (43% of the 10M build),
8.45s per 65,536-row chunk vs ~3s speed-of-light. This stages a synthetic
10M-row code table (bf16 at 128d — the production build dtype) plus random
candidate ids and times ablated variants of `merge_prune_chunk_out`:

  full        the production op (gather + sims + argsort + re-gather + prune)
  sims_only   gather candidates + score + argsort (no pairwise, no prune)
  pair_only   + pairwise sims on sorted vecs (no prune loop)
  no_regather full, but `pair` is computed on UNSORTED vecs and permuted
              with two (B, C, C) take_along_axis instead of re-gathering
              the (B, C, D) candidate matrix in sorted order

Usage:  PM_N=10000000 PM_D=128 python benchmarks/profile_merge_prune.py
Output: /tmp/profile_merge_prune.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zvec_tpu.ops.hnsw import (
    NEG_INF,
    _compact_keep_backfill,
    _dup_mask,
    _exact_dots,
    _pairwise_sims,
    _prune_keep,
    _sim_to_base,
    merge_prune_chunk_out,
)
from zvec_tpu.typing import MetricType

N = int(os.environ.get("PM_N", 10_000_000))
D = int(os.environ.get("PM_D", 128))
DTYPE = os.environ.get("PM_DTYPE", "bf16")
B = int(os.environ.get("PM_B", 2048))
C = int(os.environ.get("PM_C", 200))
NB_CHUNK = int(os.environ.get("PM_NB", 32))
MAX_OUT = 100
METRIC = MetricType.L2


def log(msg):
    print(f"[pm {time.strftime('%H:%M:%S')}] {msg}", flush=True)


@partial(jax.jit, static_argnames=("mode", "max_out"))
def variant(rows_mat, cand_mat, codes, norms2, *, mode: str, max_out: int):
    def body(_, inp):
        rows, cand_ids = inp
        base = codes[rows]
        bnorm2 = norms2[rows]
        valid = (cand_ids >= 0) & (cand_ids != rows[:, None])
        safe = jnp.clip(cand_ids, 0, None)
        vecs = codes[safe]
        nrm2 = norms2[safe]
        sims = _sim_to_base(base, bnorm2, vecs, nrm2, METRIC)
        sims = jnp.where(valid, sims, NEG_INF)
        order = jnp.argsort(-sims, axis=1)
        ids_o = jnp.take_along_axis(cand_ids, order, 1)
        if mode == "sims_only":
            return None, ids_o[:, :max_out]
        sims_o = jnp.take_along_axis(sims, order, 1)
        valid_o = jnp.take_along_axis(valid, order, 1)
        valid_o = valid_o & ~_dup_mask(ids_o)
        sims_o = jnp.where(valid_o, sims_o, NEG_INF)
        if mode == "no_regather":
            nrm_o = jnp.take_along_axis(nrm2, order, 1)
            pair_u = _pairwise_sims(vecs, nrm2, METRIC)
            pair = jnp.take_along_axis(
                jnp.take_along_axis(pair_u, order[:, :, None], 1),
                order[:, None, :],
                2,
            )
        else:
            vecs_o = jnp.take_along_axis(vecs, order[:, :, None], 1)
            nrm_o = jnp.take_along_axis(nrm2, order, 1)
            pair = _pairwise_sims(vecs_o, nrm_o, METRIC)
        if mode == "pair_only":
            return None, ids_o[:, :max_out] + pair[:, 0, :max_out].astype(jnp.int32) * 0
        keep = _prune_keep(pair, sims_o, valid_o, max_out, metric=METRIC)
        ids_c, _ = _compact_keep_backfill(
            keep, valid_o, ids_o, sims_o, max_out, pair=pair, metric=METRIC
        )
        return None, ids_c

    _, out = jax.lax.scan(body, None, (rows_mat, cand_mat))
    return out


def main():
    rng = np.random.default_rng(0)
    n_pad = ((N + 1023) // 1024) * 1024
    log(f"staging {n_pad}x{D} {DTYPE} codes")
    dt = jnp.bfloat16 if DTYPE == "bf16" else (jnp.int8 if DTYPE == "int8" else jnp.float32)
    if DTYPE == "int8":
        host = rng.integers(-127, 128, (n_pad, D), dtype=np.int8)
        codes = jnp.asarray(host)
        norms = jnp.asarray(
            np.einsum("ij,ij->i", host.astype(np.float32), host.astype(np.float32))
        )
    else:
        host = rng.standard_normal((n_pad, D)).astype(np.float32)
        codes = jnp.asarray(host, dtype=dt)
        norms = jnp.asarray(np.einsum("ij,ij->i", host, host))
    del host
    codes.block_until_ready()

    rows_mat = rng.integers(0, N, (NB_CHUNK, B)).astype(np.int32)
    cand_mat = rng.integers(0, N, (NB_CHUNK, B, C)).astype(np.int32)
    rows_d = jnp.asarray(rows_mat)
    cand_d = jnp.asarray(cand_mat)

    results = {"n": N, "d": D, "dtype": DTYPE, "B": B, "C": C, "nb_chunk": NB_CHUNK,
               "variants": {}}
    modes = ["full", "sims_only", "pair_only", "no_regather", "production"]
    for mode in modes:
        def run():
            if mode == "production":
                return merge_prune_chunk_out(
                    rows_d, cand_d, codes, norms, metric=METRIC, max_out=MAX_OUT
                )
            return variant(rows_d, cand_d, codes, norms, mode=mode, max_out=MAX_OUT)

        t0 = time.perf_counter()
        out = run()
        np.asarray(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        row = {
            "compile_s": round(compile_s, 2),
            "chunk_s": round(float(np.median(times)), 3),
            "per_batch_ms": round(float(np.median(times)) / NB_CHUNK * 1e3, 1),
        }
        results["variants"][mode] = row
        log(f"{mode}: {row}")
    with open("/tmp/profile_merge_prune.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
