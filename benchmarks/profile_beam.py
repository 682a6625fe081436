"""Beam-core cost-structure profile on the built 10M collection (VERDICT r3 #2).

Bypasses the public API: loads the sealed segment's HnswEngine device arrays
and times `hnsw_search` directly. Two experiments:

  1. Query-width scaling: Q=1024 vs 2048 vs 4096 in ONE device program. The
     r3 sweep showed F=8 (2x per-step width) costs only ~16% — per-step cost
     is mostly width-independent, so folding more queries into one program
     should amortize it. If qps scales, the fix is batch folding, not kernel
     work.
  2. max_steps clamp curve: time + recall at clamped step counts gives the
     per-step cost slope and the convergence step count.

Timing via dependent np.asarray fetch (tunnel: block_until_ready unreliable).

Usage: PROF="width steps" python benchmarks/profile_beam.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
OUT = os.path.join(WORK, "profile_beam.json")
K = 10
EF = int(os.environ.get("PROF_EF", "96"))


def log(msg):
    print(f"[prof {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax.numpy as jnp

    import zvec_tpu
    from zvec_tpu.ops.hnsw import hnsw_search

    zvec_tpu.init()
    t0 = time.time()
    col = zvec_tpu.open(os.path.join(WORK, "col"))
    log(f"open() in {time.time() - t0:.1f}s")
    Q = np.load(os.path.join(WORK, "query.npy")).astype(np.float32)
    gt = np.load(os.path.join(WORK, "gt.npy"))
    gt_q = gt.shape[0]

    impl = col._impl
    seg = [s for s in impl._segments_snapshot() if s.meta.doc_count > 0][0]
    eng = seg.engine_for("vec")
    eng._ensure_device()
    dev = eng._dev
    codes, norms = eng._codes, eng._norms
    n = eng._n
    log(f"engine ready: n={n}, codes {codes.shape} {codes.dtype}")

    rng = np.random.default_rng(7)
    # extra queries for the width experiment: real queries tiled + jitter so
    # convergence behavior matches (pure noise queries converge differently)
    Q4 = np.concatenate([Q, Q + rng.normal(0, 0.05, Q.shape).astype(np.float32),
                         Q + rng.normal(0, 0.1, Q.shape).astype(np.float32),
                         Q + rng.normal(0, 0.15, Q.shape).astype(np.float32)])

    budget = jnp.int32(n)

    def run(q, ef=EF, frontier=4, vb=21, max_steps=None, topk=K):
        out = hnsw_search(
            jnp.asarray(q), codes, norms, dev["l0"], dev["upper_ids"],
            dev["upper_nbrs"], dev["upper_down"], dev["entry_rows"], None,
            budget, eng._dequant, metric=eng._search_metric, ef=ef, topk=topk,
            max_steps=(ef + 64) if max_steps is None else max_steps,
            num_levels=dev["num_levels"], frontier=frontier, visited_bits=vb,
        )
        return np.asarray(out[0]), np.asarray(out[1])

    def recall(ids):
        hits = sum(
            len({int(x) for x in ids[i] if x >= 0} & set(gt[i].tolist()))
            for i in range(gt_q)
        )
        return round(hits / (gt_q * K), 4)

    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))

    def measure(key, q, reps=3, **kw):
        if key in results:
            log(f"{key}: cached {results[key]}")
            return
        t0 = time.time()
        _, ids = run(q, **kw)  # compile + warm
        log(f"{key}: first call (compile) {time.time() - t0:.1f}s")
        run(q, **kw)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, ids2 = run(q, **kw)
            best = min(best, time.perf_counter() - t0)
        row = {
            "secs": round(best, 3),
            "qps": round(q.shape[0] / best, 1),
            "recall_first1024": recall(ids[:gt_q]),
        }
        results[key] = row
        log(f"{key}: {row}")
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=1)

    phases = os.environ.get("PROF", "width steps").split()

    if "width" in phases:
        measure(f"ef{EF}_q1024", Q4[:1024])
        measure(f"ef{EF}_q2048", Q4[:2048])
        measure(f"ef{EF}_q4096", Q4[:4096])

    if "steps" in phases:
        for ms in (8, 16, 32, 64, 96, 128):
            measure(f"ef{EF}_q1024_ms{ms}", Q4[:1024], max_steps=ms)

    log("done")


if __name__ == "__main__":
    main()
