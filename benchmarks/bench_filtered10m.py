"""Filtered + grouped HNSW at 10M across selectivity regimes (VERDICT #6).

Runs on the fielded 10M collection bench_ivf10m.py built (same clustered
corpus/queries/GT as the HNSW head-to-head): drops the IVF index, builds
the production HNSW index (m=50, efc=500 — the h2h10m config; the r4
fresh-host rebuild reproduced the recall curve exactly, so this graph
stands in for the headline one), then measures:

  - filter grid {~50%, ~10%, ~1%} selectivity: recall@10 + qps + which
    path served it (graph filter-at-insert traversal vs
    brute-force-by-keys demotion; reference `hnsw_algorithm.cc:188-195,270`
    keeps walking through filtered nodes, `doc_filter.cc:120-122` demotes
    tiny selectivity)
  - rescan-safety-net trigger rate (profiler stage)
  - one grouped-search leg on the hot graph: group_by gid (997 groups),
    group_count 10/50, in-beam quota path vs iterative deepening

The HNSW build also re-attributes the 10M build phase table AFTER the
merge-prune fetch pipelining (VERDICT #4): run with ZVEC_BUILD_LOG=1 and
keep the log.

Usage:  ZVEC_BUILD_LOG=1 python benchmarks/bench_filtered10m.py
Output: FILT10M results in IVF10M_DIR/filtered_results.json (commit as
        benchmarks/filtered10m_results.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
WORK = os.environ.get("IVF10M_DIR", "/tmp/ivf10m")
COL_DIR = os.path.join(WORK, "col")
N = int(os.environ.get("IVF10M_N", 10_000_000))
K = 10
GT_Q = 256
SEED = 0x1F1F  # must match bench_ivf10m.fields_arrays


def log(msg):
    print(f"[filt10m {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def marker(n):
    return os.path.join(WORK, f"DONE_{n}")


def main():
    import zvec_tpu
    from zvec_tpu import HnswIndexParam, HnswQueryParam, MetricType, VectorQuery

    from benchmarks.bench_ivf10m import fields_arrays

    Q = np.load(os.path.join(SRC, "query.npy"))
    gt_u = np.load(os.path.join(SRC, "gt.npy"))
    X = np.load(os.path.join(SRC, "base.npy"), mmap_mode="r")
    tags, price = fields_arrays()

    zvec_tpu.init()
    col = zvec_tpu.open(COL_DIR)
    results = {"n": N, "dim": int(Q.shape[1]), "filters": {}, "grouped": {}}

    # ---- build the HNSW index (replacing IVF) ----
    if not os.path.exists(marker("build_hnsw")):
        t0 = time.time()
        col.drop_index("vec")
        col.create_index(
            "vec", HnswIndexParam(MetricType.L2, m=50, ef_construction=500)
        )
        col.flush()
        bs = time.time() - t0
        with open(marker("build_hnsw"), "w") as fh:
            json.dump({"secs": round(bs, 1)}, fh)
        log(f"HNSW build in {bs:.0f}s")
    with open(marker("build_hnsw")) as fh:
        results["hnsw_build_secs"] = json.load(fh).get("secs")

    # unfiltered sanity: must reproduce the h2h10m recall curve
    p = HnswQueryParam(ef=96)
    col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
    t0 = time.perf_counter()
    docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
    dt = time.perf_counter() - t0
    rec = sum(
        len({int(d.id) for d in docs[i]} & set(gt_u[i].tolist()))
        for i in range(GT_Q)
    ) / (GT_Q * K)
    results["unfiltered_ef96"] = {
        "recall_at_10": round(rec, 4),
        "qps": round(Q.shape[0] / dt, 1),
    }
    log(f"unfiltered ef=96: {results['unfiltered_ef96']}")

    # ---- filter grid ----
    grid = [
        ("price < 0.5", price < 0.5),  # ~50%
        ("tag = 't3'", tags == 3),  # ~10%
        ("tag = 't3' AND price < 0.1", (tags == 3) & (price < 0.1)),  # ~1%
    ]
    for flt, sel in grid:
        sel_idx = np.flatnonzero(sel)
        gt_path = os.path.join(WORK, f"gtf_{abs(hash(flt)) % 99999}.npy")
        if os.path.exists(gt_path):
            gt = np.load(gt_path)
        else:
            t0 = time.time()
            q = Q[:GT_Q].astype(np.float32)
            best_d = np.full((GT_Q, K), np.inf, np.float32)
            best_i = np.full((GT_Q, K), -1, np.int64)
            BLK = 2_000_000
            for lo in range(0, len(sel_idx), BLK):
                idx = sel_idx[lo : lo + BLK]
                xb = X[idx].astype(np.float32)
                d2 = (
                    (q**2).sum(1)[:, None]
                    + (xb**2).sum(1)[None, :]
                    - 2.0 * (q @ xb.T)
                )
                cat_d = np.concatenate([best_d, d2], axis=1)
                cat_i = np.concatenate(
                    [best_i, np.broadcast_to(idx, (GT_Q, len(idx)))], axis=1
                )
                part = np.argpartition(cat_d, K, axis=1)[:, :K]
                best_d = np.take_along_axis(cat_d, part, axis=1)
                best_i = np.take_along_axis(cat_i, part, axis=1)
            order = np.argsort(best_d, axis=1)
            gt = np.take_along_axis(best_i, order, axis=1)
            np.save(gt_path, gt)
            log(f"filtered gt ({flt}) in {time.time() - t0:.0f}s")
        for ef in (96, 256):
            p = HnswQueryParam(ef=ef)
            col.batch_query("vec", Q, topk=K, filter=flt, output_fields=[], param=p)
            t0 = time.perf_counter()
            docs = col.batch_query(
                "vec", Q, topk=K, filter=flt, output_fields=[], param=p
            )
            dt = time.perf_counter() - t0
            rec = sum(
                len({int(d.id) for d in docs[i]} & set(gt[i].tolist()))
                for i in range(GT_Q)
            ) / (GT_Q * K)
            # which path served it: profiler stages name the demotion
            col._impl.debug_profiling = True
            col.query(
                VectorQuery("vec", vector=Q[0], param=p), topk=K, filter=flt
            )
            prof = str(col._impl.last_profile or "")
            col._impl.debug_profiling = False
            path_used = (
                "brute_force_by_keys"
                if "by_keys" in prof or "masked" in prof
                else "graph_traversal"
            )
            row = {
                "selectivity": round(float(sel.mean()), 4),
                "ef": ef,
                "recall_at_10": round(rec, 4),
                "qps": round(Q.shape[0] / dt, 1),
                "path": path_used,
            }
            results["filters"].setdefault(flt, {})[ef] = row
            print(json.dumps(row | {"filter": flt}), flush=True)

    # ---- grouped search on the hot graph ----
    for gc in (10, 50):
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(16):
                col.group_by_query(
                    VectorQuery("vec", vector=Q[i]),
                    group_by_field="gid",
                    group_count=gc,
                    group_topk=2,
                )
            times.append((time.perf_counter() - t0) / 16)
        # plain query p50 for the ratio
        t0 = time.perf_counter()
        for i in range(16):
            col.query(VectorQuery("vec", vector=Q[i]), topk=gc * 2)
        plain = (time.perf_counter() - t0) / 16
        results["grouped"][gc] = {
            "grouped_ms": round(float(np.median(times)) * 1e3, 1),
            "plain_ms": round(plain * 1e3, 1),
            "ratio": round(float(np.median(times)) / plain, 2),
        }
        print(json.dumps({"group_count": gc, **results["grouped"][gc]}), flush=True)

    with open(os.path.join(WORK, "filtered_results.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
