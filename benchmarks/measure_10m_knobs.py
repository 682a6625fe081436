"""Query-knob A/B at 10M on the PERSISTED collection from bench_10m_hnsw.py.

Isolates the search-side levers on identical graph + data (no rebuild):
  - route tier: ZVEC_HNSW_ROUTE in {off, int8, bf16} (process env — the
    routing codes are staged at open; run one process per setting),
  - visited set: hashed bitset scatter-add vs bytemap scatter-max
    (HnswQueryParam.visited_bytes — per-query, swept in-process).

The VERDICT r3 item-2 ablation: push qps_pipelined past 1,000 at
recall@10 >= 0.95, or record a measured negative per lever.

Usage:  ZVEC_HNSW_ROUTE=off python benchmarks/measure_10m_knobs.py
Output: one JSON line per (config, ef); merged into
        /tmp/knobs10m_<route>.json.
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
ROUTE = os.environ.get("ZVEC_HNSW_ROUTE", "auto")
GT_Q, K = 256, 10
EFS = tuple(int(x) for x in os.environ.get("KNOBS_EFS", "64,96,128").split(","))
OUT_PATH = os.environ.get(
    "KNOBS_OUT", f"/tmp/knobs10m_{os.environ.get('ZVEC_HNSW_ROUTE', 'auto')}.json"
)


def log(msg: str) -> None:
    print(f"[knobs {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    zvec_tpu.init()
    t0 = time.time()
    col = zvec_tpu.open(COL_DIR)
    log(f"open() in {time.time() - t0:.1f}s (route={ROUTE})")
    Q = np.load(os.path.join(WORK, "query.npy"))
    gt = np.load(os.path.join(WORK, "gt.npy"))
    NQ = Q.shape[0]

    configs = [
        ("bitset", {}),
        ("bytemap", {"visited_bits": 21, "visited_bytes": True}),
        # frontier 2/3 measured slower than 4 at 10M (r2); 6/8 untested —
        # wider steps mean fewer sequential iterations per query
        ("f6", {"frontier": 6}),
        ("f8", {"frontier": 8}),
        # pooled-top-k merges + straggler cutoff (step sorts dominate the
        # per-step cost — profile_step.py attribution)
        ("approx", {"approx_merge": True}),
        ("approx_bytemap", {"approx_merge": True, "visited_bits": 21,
                            "visited_bytes": True}),
        ("donef97", {"done_frac": 0.97}),
        ("donef99", {"done_frac": 0.99}),
        # donef99 measured +22% at equal batch recall (r3); pair it with the
        # pooled merges for the 1,000-qps crossing (VERDICT r4 item 2)
        ("donef99_approx", {"approx_merge": True, "done_frac": 0.99}),
        ("combo", {"approx_merge": True, "visited_bits": 21,
                   "visited_bytes": True, "done_frac": 0.99}),
        # 23-bit hash quarters false-"already visited" collisions vs the
        # 21-bit default (10M rows into 2M slots) — a recall lever
        ("vb23", {"visited_bits": 23}),
    ]
    if os.environ.get("KNOBS_MINIMAL") == "1":
        configs = configs[:1]
    sel = os.environ.get("KNOBS_CONFIGS")
    if sel:
        names = set(sel.split(","))
        configs = [c for c in configs if c[0] in names]
    import platform as _plat

    import jax

    out = {
        "route": ROUTE,
        "efs": list(EFS),
        "gt_queries": GT_Q,
        "platform": jax.devices()[0].platform,
        "host": _plat.node(),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "configs": {},
    }
    for name, kw in configs:
        rows = {}
        for ef in EFS:
            p = HnswQueryParam(ef=ef, **kw)
            try:
                _measure_one(col, Q, gt, p, name, ef, rows)
            except Exception as e:  # one bad config must not kill the sweep
                # (the axon remote-compile helper 500s on some big programs)
                row = {"error": f"{type(e).__name__}: {e}"[:200]}
                rows[ef] = row
                print(json.dumps({"route": ROUTE, "config": name, "ef": ef,
                                  **row}), flush=True)
        out["configs"][name] = rows
        with open(OUT_PATH, "w") as fh:  # checkpoint after every config —
            json.dump(out, fh, indent=1)  # a crash must not lose measured rows


def _measure_one(col, Q, gt, p, name, ef, rows):
    NQ = Q.shape[0]
    # warm with the SAME batch shape we time
    docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
    col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
    t0 = time.perf_counter()
    docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
    dt = time.perf_counter() - t0
    blocks = 4
    col.batch_query_many("vec", [Q] * 2, topk=K, output_fields=[], param=p)
    t0 = time.perf_counter()
    col.batch_query_many("vec", [Q] * blocks, topk=K, output_fields=[], param=p)
    dt_p = (time.perf_counter() - t0) / blocks
    # per-query recall distribution — done_frac cuts stragglers off at
    # "best found so far", so the batch MEAN can hide unbounded per-query
    # damage (VERDICT r4 item 3: bound the worst decile before promoting)
    per_q = np.empty(GT_Q, dtype=np.float64)
    for i in range(GT_Q):
        got = {int(d.id) for d in docs[i]}
        per_q[i] = len(got & set(gt[i].tolist())) / K
    worst = np.sort(per_q)[: max(1, GT_Q // 10)]
    row = {
        "recall_at_10": round(float(per_q.mean()), 4),
        "recall_p10": round(float(np.percentile(per_q, 10)), 4),
        "recall_worst_decile_mean": round(float(worst.mean()), 4),
        "recall_min": round(float(per_q.min()), 4),
        "qps": round(NQ / dt, 1),
        "qps_pipelined": round(NQ / dt_p, 1),
    }
    rows[ef] = row
    print(json.dumps({"route": ROUTE, "config": name, "ef": ef, **row}),
          flush=True)


if __name__ == "__main__":
    main()
