"""Search-knob sweep on the built 10M collection (VERDICT r3 item #2).

Reuses the H2H10M_DIR collection + ground truth; sweeps the now-typed
HnswQueryParam knobs (frontier, visited_bits, ef) and records
recall@10 / qps / qps_pipelined per combo. Each combo costs one remote
compile (~30-60s) + measurement. Usage:

    SWEEP="96:4:0 96:8:0 64:8:0" python benchmarks/sweep_10m.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
K = 10
OUT = os.path.join(WORK, "sweep_results.json")


def log(msg):
    print(f"[sweep {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    combos = []
    for spec in os.environ.get(
        "SWEEP", "96:4:0 96:6:0 96:8:0 64:8:0 80:4:0 96:4:23 64:4:23"
    ).split():
        parts = [int(x) for x in spec.split(":")]
        while len(parts) < 5:  # ef:frontier:visited_bits:slack:bytes
            parts.append(64 if len(parts) == 3 else 0)
        combos.append(tuple(parts))

    zvec_tpu.init()
    t0 = time.time()
    col = zvec_tpu.open(os.path.join(WORK, "col"))
    log(f"open() in {time.time() - t0:.1f}s")
    Q = np.load(os.path.join(WORK, "query.npy"))
    gt = np.load(os.path.join(WORK, "gt.npy"))
    gt_q = gt.shape[0]

    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for ef, fr, vb, slack, vbytes in combos:
        key = (
            f"ef{ef}_f{fr}_vb{vb}"
            + ("" if slack == 64 else f"_s{slack}")
            + ("_bytes" if vbytes else "")
        )
        if key in results:
            log(f"{key}: cached {results[key]}")
            continue
        p = HnswQueryParam(ef=ef, frontier=fr, visited_bits=vb,
                           steps_slack=slack, visited_bytes=bool(vbytes))
        try:
            col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            t0 = time.perf_counter()
            docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            dt = time.perf_counter() - t0
            blocks = 4
            col.batch_query_many("vec", [Q] * 2, topk=K, output_fields=[], param=p)
            t0 = time.perf_counter()
            col.batch_query_many("vec", [Q] * blocks, topk=K, output_fields=[], param=p)
            dt_p = (time.perf_counter() - t0) / blocks
            hits = sum(
                len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
                for i in range(gt_q)
            )
            row = {
                "recall_at_10": round(hits / (gt_q * K), 4),
                "qps": round(len(Q) / dt, 1),
                "qps_pipelined": round(len(Q) / dt_p, 1),
            }
        except Exception as e:  # noqa: BLE001 — OOM combos recorded, not fatal
            row = {"error": repr(e)[:200]}
        results[key] = row
        log(f"{key}: {row}")
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=1)
    log("done")


if __name__ == "__main__":
    main()
