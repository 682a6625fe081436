"""10M HNSW sustained-throughput + bf16-codes A/B on the built collection.

Reuses the persisted 10M collection from benchmarks/bench_10m_hnsw.py
(/tmp/h2h10m/col). Two measurements per ef:
  1. sequential `batch_query` (the round-2 headline methodology), and
  2. pipelined `batch_query_many` (dispatch/finalize split — upload+dispatch
     of batch i+1 overlaps device compute of batch i through the tunnel).
With ZVEC_HNSW_BF16_SEARCH=1 the engine loads bf16 search codes (half the
per-hop gather bandwidth; exact fp32 host rescore of returned hits), giving
the bf16 A/B when run twice.

Usage:
  python benchmarks/bench_10m_sustained.py                 # fp32 codes
  ZVEC_HNSW_BF16_SEARCH=1 python benchmarks/bench_10m_sustained.py
Output: one JSON line per ef; results merged into
        /tmp/h2h10m/sustained_<codes>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
COL_DIR = os.path.join(WORK, "col")
K = 10
GT_Q = 256
BLOCKS = int(os.environ.get("SUSTAINED_BLOCKS", 6))
EFS = tuple(int(e) for e in os.environ.get("SUSTAINED_EFS", "64,128").split(","))


def log(msg: str) -> None:
    print(f"[sus {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    codes = "bf16" if os.environ.get("ZVEC_HNSW_BF16_SEARCH") == "1" else "fp32"
    zvec_tpu.init()
    t0 = time.time()
    col = zvec_tpu.open(COL_DIR)
    Q = np.load(os.path.join(WORK, "query.npy"))
    gt = np.load(os.path.join(WORK, "gt.npy"))
    nq = Q.shape[0]
    log(f"open() in {time.time() - t0:.1f}s; codes={codes}; {nq} queries x {BLOCKS} blocks")

    results = {"codes": codes, "n": 10_000_000, "block": nq, "ef": {}}
    for ef in EFS:
        p = HnswQueryParam(ef=ef)
        # warm + compile with the SAME batch shape we time
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        hits = 0
        for i in range(GT_Q):
            got = {int(d.id) for d in docs[i]}
            hits += len(got & set(gt[i].tolist()))
        rec = hits / (GT_Q * K)

        t0 = time.perf_counter()
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        seq_qps = nq / (time.perf_counter() - t0)

        col.batch_query_many("vec", [Q, Q], topk=K, output_fields=[], param=p)
        t0 = time.perf_counter()
        col.batch_query_many("vec", [Q] * BLOCKS, topk=K, output_fields=[], param=p)
        pipe_qps = nq * BLOCKS / (time.perf_counter() - t0)

        row = {
            "recall_at_10": round(rec, 4),
            "qps_sequential": round(seq_qps, 1),
            "qps_pipelined": round(pipe_qps, 1),
        }
        results["ef"][ef] = row
        print(json.dumps({"ef": ef, **row}), flush=True)

    out = os.path.join(WORK, f"sustained_{codes}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
