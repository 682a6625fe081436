"""Per-dispatch query-block-size A/B at 10M on the persisted collection.

The step profile (benchmarks/profile_step.py) attributes the beam's per-step
cost to LATENCY-bound gathers/scatters/sorts at Q=1024 — not bandwidth — so
doubling the rows per dispatched program should amortize the fixed per-step
cost across 2x the queries. This sweeps the block size fed to
`batch_query_many` (the program's leading dim; `ops/runtime.py::bucket_queries`
rounds >512 up to multiples of 512) at fixed total query count.

Usage:
  QBLOCKS=1024,2048,4096 QB_KNOBS='{"approx_merge": true}' QB_EF=96 \
    python benchmarks/measure_10m_qblock.py
Output: one JSON line per block size; merged into /tmp/qblock10m.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("H2H10M_CPU") == "1":  # small-N smoke runs off-TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
COL_DIR = os.path.join(WORK, "col")
GT_Q, K = 256, 10
EF = int(os.environ.get("QB_EF", "96"))
KNOBS = json.loads(os.environ.get("QB_KNOBS", "{}"))
BLOCKS = tuple(int(x) for x in os.environ.get("QBLOCKS", "1024,2048,4096").split(","))
TOTAL = int(os.environ.get("QB_TOTAL", "8192"))  # queries per timed run


def log(msg: str) -> None:
    print(f"[qblock {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    zvec_tpu.init()
    t0 = time.time()
    col = zvec_tpu.open(COL_DIR)
    log(f"open() in {time.time() - t0:.1f}s ef={EF} knobs={KNOBS}")
    Q = np.load(os.path.join(WORK, "query.npy"))  # (1024, D)
    gt = np.load(os.path.join(WORK, "gt.npy"))
    p = HnswQueryParam(ef=EF, **KNOBS)

    # rows are keyed by (ef, knobs, qb) so merged files never mix runs
    # measured under different headers (ADVICE r3: the old single-header
    # merge overwrote ef/knobs and mixed CPU smoke rows with TPU rows)
    cfg_key = f"ef={EF} knobs={json.dumps(KNOBS, sort_keys=True)}"
    out = {"blocks": {}}
    if os.path.exists("/tmp/qblock10m.json"):
        prev = json.load(open("/tmp/qblock10m.json"))
        if "ef" not in prev:  # old single-header files are unmergeable
            out = prev
            out.setdefault("blocks", {})
    platform = "cpu" if os.environ.get("H2H10M_CPU") == "1" else "tpu"
    for qb in BLOCKS:
        reps = -(-qb // Q.shape[0])  # ceil: non-multiple blocks must be full
        block = np.concatenate([Q] * reps, axis=0)[:qb]
        nblocks = max(1, TOTAL // qb)
        try:
            # warm with the SAME block shape we time (compile outside timing)
            docs_blocks = col.batch_query_many(
                "vec", [block] * 2, topk=K, output_fields=[], param=p
            )
            t0 = time.perf_counter()
            docs_blocks = col.batch_query_many(
                "vec", [block] * nblocks, topk=K, output_fields=[], param=p
            )
            dt = time.perf_counter() - t0
            hits = sum(
                len({int(h.id) for h in docs_blocks[0][i]} & set(gt[i].tolist()))
                for i in range(GT_Q)
            )
            row = {
                "recall_at_10": round(hits / (GT_Q * K), 4),
                "qps_pipelined": round(qb * nblocks / dt, 1),
                "nblocks": nblocks,
            }
        except Exception as e:  # OOM / compile-helper 500: record, keep going
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
        row["platform"] = platform
        out["blocks"][f"{cfg_key} qb={qb}"] = row
        log(f"qb={qb}: {row}")
        with open("/tmp/qblock10m.json", "w") as fh:
            json.dump(out, fh, indent=1)
    log("done")


if __name__ == "__main__":
    main()
