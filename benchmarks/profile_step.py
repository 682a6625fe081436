"""Per-stage step-cost breakdown of the 10M HNSW beam (VERDICT r3 item #2).

Times jitted S-step lax.scan microprograms on the REAL 10M device graph
arrays (same shapes/dtypes as one beam step), attributing the per-step
cost to: codes row-gather+score, the l0 adjacency gather, the dedup sort,
the candidate top_k merge, and the visited bitset ops. Each program folds
S steps into ONE dispatch (tunnel per-dispatch cost ~1s, CLAUDE.md) and
fetches a dependent scalar. Big arrays are passed as jit ARGUMENTS —
closing over them embeds multi-GB constants in the remote-compile payload
(a >25 min stall through the axon tunnel, measured).

Usage:  python benchmarks/profile_step.py   (H2H10M_DIR=/tmp/h2h10m)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
Q_BATCH = int(os.environ.get("PROF_Q", "1024"))
STEPS = int(os.environ.get("PROF_S", "64"))
EF = 96
F = 4


def log(msg):
    print(f"[prof {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *args):
    out = np.asarray(fn(*args))  # warm (compile) + sync
    t0 = time.perf_counter()
    out = np.asarray(fn(*args))
    dt = time.perf_counter() - t0
    del out
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    zvec_tpu.init()
    t0 = time.time()
    col = zvec_tpu.open(os.path.join(WORK, "col"))
    log(f"open() in {time.time() - t0:.1f}s")
    impl = getattr(col, "_impl", col)
    seg = impl.segments[0] if impl.segments else impl.writing
    eng = seg.engine_for("vec")
    if eng._dev is None:  # device graph builds lazily on first search
        rng0 = np.random.default_rng(1)
        col.batch_query(
            "vec", rng0.standard_normal((8, 128)).astype(np.float32),
            topk=1, output_fields=[], param=HnswQueryParam(ef=16),
        )
    dev = eng._dev
    codes, norms, l0 = eng._codes, eng._norms, dev["l0"]
    route = eng._route
    n_pad, d = codes.shape
    m0 = l0.shape[1]
    log(f"codes {codes.shape} {codes.dtype}, l0 {l0.shape}, "
        f"route {None if route is None else route[0].dtype}, "
        f"Q={Q_BATCH} S={STEPS}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((Q_BATCH, d)).astype(np.float32))
    f0 = jnp.asarray(rng.integers(0, n_pad - 1, (Q_BATCH, F)).astype(np.int32))
    cand0 = jnp.asarray(rng.standard_normal((Q_BATCH, EF)).astype(np.float32))

    W = F * m0
    results = {}

    # ---- A. adjacency gather + codes row gather + score (the data path) ----
    @partial(jax.jit, static_argnames=("deq",))
    def data_path(codes, l0, q, f_ids, deq=False, scale=1.0):
        def body(carry, _):
            f_ids, acc = carry
            nbrs = l0[jnp.clip(f_ids, 0)].reshape(Q_BATCH, W)
            nbrs = jnp.clip(nbrs, 0)
            rows = codes[nbrs]
            if deq:
                rows = rows.astype(jnp.float32) * scale
            sims = jnp.einsum(
                "qd,qwd->qw", q, rows.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
            _, pos = jax.lax.top_k(sims, F)
            f_ids = jnp.take_along_axis(nbrs, pos, 1)
            return (f_ids, acc + sims[:, 0].sum()), None

        (f_ids, acc), _ = jax.lax.scan(
            body, (f_ids, jnp.float32(0)), None, length=STEPS
        )
        return acc

    results["A_gather_score_fp32"] = timed(data_path, codes, l0, q, f0)
    log(f"A fp32 gather+score: {results['A_gather_score_fp32']*1e3:.1f} ms")

    if route is not None:
        results["A2_gather_score_route"] = timed(
            lambda c, l, qq, ff: data_path(c, l, qq, ff, deq=True), route[0],
            l0, q, f0,
        )
        log(f"A2 route gather+score: {results['A2_gather_score_route']*1e3:.1f} ms")

    # ---- B. same control flow, NO codes gather (sims from hashed ids) ----
    @jax.jit
    def no_codes(l0, f_ids):
        def body(carry, _):
            f_ids, acc = carry
            nbrs = l0[jnp.clip(f_ids, 0)].reshape(Q_BATCH, W)
            nbrs = jnp.clip(nbrs, 0)
            sims = (nbrs.astype(jnp.uint32) * jnp.uint32(2654435761)
                    % jnp.uint32(65537)).astype(jnp.float32)
            _, pos = jax.lax.top_k(sims, F)
            f_ids = jnp.take_along_axis(nbrs, pos, 1)
            return (f_ids, acc + sims[:, 0].sum()), None

        (f_ids, acc), _ = jax.lax.scan(
            body, (f_ids, jnp.float32(0)), None, length=STEPS
        )
        return acc

    results["B_no_codes"] = timed(no_codes, l0, f0)
    log(f"B adjacency only: {results['B_no_codes']*1e3:.1f} ms")

    # ---- C. dedup sort (2-operand lane sort, width W) ----
    @jax.jit
    def dedup_sort(l0, f_ids):
        def body(carry, _):
            nbrs, acc = carry
            key_sorted, nbrs_sorted = jax.lax.sort(
                (nbrs, nbrs), dimension=1, num_keys=1
            )
            acc = acc + key_sorted[:, 0].sum().astype(jnp.float32)
            nbrs = jnp.roll(nbrs_sorted, 1, axis=1)
            return (nbrs, acc), None

        nbrs0 = l0[jnp.clip(f_ids, 0)].reshape(Q_BATCH, W)
        (nbrs, acc), _ = jax.lax.scan(
            body, (nbrs0, jnp.float32(0)), None, length=STEPS
        )
        return acc

    results["C_dedup_sort"] = timed(dedup_sort, l0, f0)
    log(f"C dedup sort: {results['C_dedup_sort']*1e3:.1f} ms")

    # ---- D. candidate top_k merge (width ef+W -> ef) ----
    @jax.jit
    def merge_topk(cand):
        def body(carry, _):
            cand, acc = carry
            sims = jnp.roll(cand, 1, axis=1)
            all_s = jnp.concatenate(
                [cand, jnp.tile(sims, (1, W // EF + 1))[:, :W]], axis=1
            )
            new, _ = jax.lax.top_k(all_s, EF)
            return (new, acc + new[:, 0].sum()), None

        (cand, acc), _ = jax.lax.scan(
            body, (cand, jnp.float32(0)), None, length=STEPS
        )
        return acc

    results["D_merge_topk"] = timed(merge_topk, cand0)
    log(f"D merge top_k: {results['D_merge_topk']*1e3:.1f} ms")

    # ---- D2. same merge via approx_max_k (the approx_merge knob) ----
    @jax.jit
    def merge_approx(cand):
        def body(carry, _):
            cand, acc = carry
            sims = jnp.roll(cand, 1, axis=1)
            all_s = jnp.concatenate(
                [cand, jnp.tile(sims, (1, W // EF + 1))[:, :W]], axis=1
            )
            new, _ = jax.lax.approx_max_k(all_s, EF, recall_target=0.98)
            return (new, acc + new[:, 0].sum()), None

        (cand, acc), _ = jax.lax.scan(
            body, (cand, jnp.float32(0)), None, length=STEPS
        )
        return acc

    results["D2_merge_approx"] = timed(merge_approx, cand0)
    log(f"D2 merge approx_max_k: {results['D2_merge_approx']*1e3:.1f} ms")

    # ---- E. visited bitset ops (hashed 2^21, take_along + scatter-add) ----
    words = (1 << 21) // 32

    @jax.jit
    def visited_ops(l0, f_ids):
        qidx = jnp.arange(Q_BATCH)

        def body(carry, _):
            visited, nbrs, acc = carry
            vix = (nbrs.astype(jnp.uint32) * jnp.uint32(2654435761)
                   % jnp.uint32(1 << 21)).astype(jnp.int32)
            word_idx = vix // 32
            bit = jnp.uint32(1) << (vix % 32).astype(jnp.uint32)
            word_val = jnp.take_along_axis(visited, word_idx, axis=1)
            fresh = (word_val & bit) == 0
            visited = visited.at[qidx[:, None], word_idx].add(
                jnp.where(fresh, bit, jnp.uint32(0))
            )
            acc = acc + fresh.sum().astype(jnp.float32)
            nbrs = jnp.roll(nbrs, 7, axis=1)
            return (visited, nbrs, acc), None

        visited = jnp.zeros((Q_BATCH, words), jnp.uint32)
        nbrs0 = l0[jnp.clip(f_ids, 0)].reshape(Q_BATCH, W)
        (visited, nbrs, acc), _ = jax.lax.scan(
            body, (visited, nbrs0, jnp.float32(0)), None, length=STEPS
        )
        return acc

    results["E_visited"] = timed(visited_ops, l0, f0)
    log(f"E visited bitset: {results['E_visited']*1e3:.1f} ms")

    per_step = {k: round(v / STEPS * 1e3, 3) for k, v in results.items()}
    summary = {
        "steps": STEPS,
        "q": Q_BATCH,
        "total_ms": {k: round(v * 1e3, 1) for k, v in results.items()},
        "per_step_ms": per_step,
    }
    print(json.dumps(summary, indent=1), flush=True)
    with open(os.path.join(WORK, "profile_step.json"), "w") as fh:
        json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
