"""int8-codes flat kernel at the 10M shape (VERDICT r4 weak #7 / next #8).

The Pallas flat kernel already scores int8 in-kernel with dequant keys
(`ops/flat_pallas.py`); the fp32 10M figure is 4,985 qps (~39% of the fp32
MXU ceiling). int8 codes cut HBM scan bandwidth 4x — the scan is
bandwidth-bound at 10M, so this should land well above the fp32 figure.
Reference analog: `flat_searcher_context.h:237-314` batched quantized scan.

Measures, on synthetic 10M x 128d:
  - fp32 kernel qps (re-baseline on this host)
  - int8 kernel qps + top-10 overlap vs the fp32 kernel's exact top-10
  - int8 kernel + host fp32 re-rank of top-100 (the refine tier) qps +
    recall@10 vs exact

Output: benchmarks/kernel10m_int8.json + one JSON line.
Usage:  python benchmarks/kernel10m_int8.py   (real TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from zvec_tpu.ops.flat_pallas import flat_scan_topk
from zvec_tpu.ops.quantize import QuantParams, encode, train_quantizer
from zvec_tpu.typing import MetricType, QuantizeType

N, NPAD, D, Q, K = 10_000_000, 10_485_760, 128, 1024, 10


def log(msg):
    print(f"[k10i8 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    rng = np.random.default_rng(0xF00D)
    corpus = rng.standard_normal((NPAD, D), dtype=np.float32)
    queries = [
        rng.standard_normal((Q, D), dtype=np.float32) for _ in range(4)
    ]
    m = np.zeros(NPAD, np.int8)
    m[:N] = 1

    qp = train_quantizer(corpus[:N:10], QuantizeType.INT8)
    codes8_h = np.empty((NPAD, D), np.int8)
    for lo in range(0, NPAD, 1 << 20):
        codes8_h[lo : lo + (1 << 20)] = encode(
            corpus[lo : lo + (1 << 20)], QuantizeType.INT8, qp
        )
    deq_norms = np.empty(NPAD, np.float32)
    for lo in range(0, NPAD, 1 << 20):
        d8 = codes8_h[lo : lo + (1 << 20)].astype(np.float32) * qp.scale + qp.bias
        deq_norms[lo : lo + (1 << 20)] = np.einsum("ij,ij->i", d8, d8)

    results = {"n": N, "d": D, "q": Q}
    dm = jnp.asarray(m)
    dqs = [jnp.asarray(qb) for qb in queries]

    def bench(codes, norms, dequant, tag, topk):
        def run(qd):
            return flat_scan_topk(
                qd, codes, norms, dm, metric=MetricType.L2, topk=topk,
                dequant=dequant,
            )

        outs = [run(qd) for qd in dqs]
        np.asarray(jnp.stack([s[:, :1] for s, _ in outs]))  # warm + sync

        def one_pass(iters):
            t0 = time.perf_counter()
            outs = [run(dqs[i % 4]) for i in range(iters)]
            np.asarray(jnp.stack([s[:, :1] for s, _ in outs]))
            return (time.perf_counter() - t0) / iters

        one_pass(2)
        dt = min(one_pass(4) for _ in range(2))
        qps = Q / dt
        log(f"{tag}: {qps:.0f} qps")
        s, i = run(dqs[0])
        return qps, np.asarray(i)

    # fp32 baseline
    codes32 = jnp.asarray(corpus)
    norms32 = jnp.asarray(np.einsum("nd,nd->n", corpus, corpus))
    qps32, ids32 = bench(codes32, norms32, None, "fp32", K)
    results["fp32_qps"] = round(qps32, 1)
    del codes32, norms32

    # int8 in-kernel (dequant keys)
    codes8 = jnp.asarray(codes8_h)
    norms8 = jnp.asarray(deq_norms)
    dq = (float(qp.scale), float(qp.bias))
    qps8, ids8 = bench(codes8, norms8, dq, "int8", K)
    overlap = np.mean(
        [len(set(ids8[r].tolist()) & set(ids32[r].tolist())) / K for r in range(Q)]
    )
    results["int8_qps"] = round(qps8, 1)
    results["int8_top10_overlap_vs_fp32"] = round(float(overlap), 4)

    # int8 + host fp32 re-rank of top-100 (refine tier). Top-100 via the
    # blockwise approx_max_k+exact-rerank scan — the Pallas kernel's
    # 100-lane unrolled extraction at the 10M shape SIGKILLs the remote
    # compile helper (the known >=1M exact-path limit; the engine routes
    # k>127-ish scans the same way)
    from zvec_tpu.ops.topk import blockwise_topk_search

    def scan100(qd):
        return blockwise_topk_search(
            qd, codes8, MetricType.L2, 100, mask=dm != 0,
            x_sq_norms=norms8, mode="fast", dequant=dq,
        )

    def refine_pass(iters):
        t0 = time.perf_counter()
        for it in range(iters):
            qd = dqs[it % 4]
            s, i = scan100(qd)
            idx = np.asarray(i)
            qh = queries[it % 4]
            cand = corpus[np.clip(idx, 0, None)]
            d2 = (
                (qh**2).sum(1)[:, None]
                + (cand**2).sum(2)
                - 2.0 * np.einsum("qd,qcd->qc", qh, cand)
            )
            d2 = np.where(idx >= 0, d2, np.inf)
            np.take_along_axis(idx, np.argsort(d2, axis=1)[:, :K], 1)
        return (time.perf_counter() - t0) / iters

    refine_pass(1)
    dt = refine_pass(3)
    # recall of refined vs fp32 exact
    s, i = scan100(dqs[0])
    idx = np.asarray(i)
    cand = corpus[np.clip(idx, 0, None)]
    qh = queries[0]
    d2 = (
        (qh**2).sum(1)[:, None]
        + (cand**2).sum(2)
        - 2.0 * np.einsum("qd,qcd->qc", qh, cand)
    )
    d2 = np.where(idx >= 0, d2, np.inf)
    ref10 = np.take_along_axis(idx, np.argsort(d2, axis=1)[:, :K], 1)
    rec = np.mean(
        [len(set(ref10[r].tolist()) & set(ids32[r].tolist())) / K for r in range(Q)]
    )
    results["int8_refined_qps"] = round(Q / dt, 1)
    results["int8_refined_recall_vs_exact"] = round(float(rec), 4)
    results["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "kernel10m_int8.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
