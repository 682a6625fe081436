"""A/B: does the scan budget bind at high ef? (VERDICT r3 item #3)

Reopens the already-built gaussian-200k collection from ab_backfill.py and
sweeps (ef, max_scan_ratio). The default budget is max(10000, 0.1*N) fresh
distance comparisons (reference kDefaultScanRatio / kDefaultMinScanLimit,
`hnsw_entity.h:505-506`); at 200k that is 20k comparisons — the suspected
cause of the recall plateau (0.948 at BOTH ef=256 and ef=500).

Usage: python benchmarks/ab_scan_budget.py   (AB_DIR=/tmp/ab_backfill_gaussian_200000)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("AB_DIR", "/tmp/ab_backfill_gaussian_200000")
TAG = os.environ.get("AB_TAG", "base")
K = 10
COMBOS = [
    (256, 0.0),  # 0.0 -> default (0.1)
    (256, 1.0),
    (500, 0.0),
    (500, 1.0),
    (128, 1.0),
]


def log(m):
    print(f"[scan-ab {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    z = np.load(os.path.join(WORK, "data.npz"))
    Q, gt = z["Q"][:256], z["gt"]
    col = zvec_tpu.open(os.path.join(WORK, TAG))
    gt_q = gt.shape[0]
    out = {}
    for ef, ratio in COMBOS:
        p = HnswQueryParam(ef=ef, max_scan_ratio=ratio)
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        t0 = time.perf_counter()
        docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        dt = time.perf_counter() - t0
        hits = sum(
            len({int(h.id) for h in docs[i]} & set(gt[i, :K].tolist()))
            for i in range(gt_q)
        )
        row = {
            "recall_at_10": round(hits / (gt_q * K), 4),
            "qps": round(len(Q) / dt, 1),
        }
        out[f"ef{ef}_r{ratio or 0.1}"] = row
        log(f"ef={ef} ratio={ratio or 0.1}: {row}")
    print(json.dumps(out), flush=True)
    with open(os.path.join(WORK, "scan_budget_ab.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
