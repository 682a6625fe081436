"""Attribute the 10M recall tail (VERDICT r4 weak #5 / next #7).

knobs10m_r4.json shows ~2.5% of queries get <0.6 recall@10 on the 10M
graph, IDENTICAL under exact traversal (done_frac=1.0) — so it is not the
straggler cutoff. This decides between the two remaining hypotheses on the
persisted collection (H2H10M_DIR):

  connectivity — the missing GT neighbors are unreachable (orphaned by the
      prune / stranded in a cluster the upper levels never route into).
      Signature: recall does NOT recover at very large ef, and/or missing
      nodes have zero inbound L0 degree.
  beam hardness — the neighbors are reachable but outranked at working ef.
      Signature: recall recovers as ef grows (512 / 2048).

Legs:
  1. host: inbound-degree census of missing GT ids over the dumped L0
     adjacency (seg_0/hnsw_vec.npz)
  2. device: per-query recall at ef=96/512/2048 with done_frac=1.0 for the
     worst-decile queries
  3. entry-distance analysis: query->entry similarity vs query->GT

Output: benchmarks/tail10m_attribution.json (committed) + stdout JSON.
Usage:  python benchmarks/attr_tail10m.py
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


def log(msg):
    print(f"[tail {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    Q = np.load(os.path.join(WORK, "query.npy"))
    gt = np.load(os.path.join(WORK, "gt.npy"))

    out = {"n": 10_000_000, "gt_queries": GT_Q, "legs": {}}

    # ---- leg 1 (host): inbound degree of GT ids in the dumped L0 ----
    aux = np.load(os.path.join(COL_DIR, "seg_0", "hnsw_vec.npz"))
    l0 = aux["l0"]
    log(f"l0 {l0.shape} loaded")
    gt_ids = np.unique(gt[:GT_Q].ravel())
    # membership pass in chunks (one big bincount over 1B edges is fine too,
    # but we only need counts AT the gt ids)
    counts = np.zeros(gt_ids.shape[0], np.int64)
    CH = 1 << 20
    for lo in range(0, l0.shape[0], CH):
        blk = l0[lo : lo + CH].ravel()
        blk = blk[blk >= 0]
        pos = np.searchsorted(gt_ids, blk)
        ok = pos < gt_ids.size
        pos_ok = pos[ok]
        match = gt_ids[pos_ok] == blk[ok]
        np.add.at(counts, pos_ok[match], 1)
    zero_in = int((counts == 0).sum())
    out["legs"]["inbound_degree"] = {
        "gt_ids": int(gt_ids.size),
        "zero_inbound": zero_in,
        "p10_inbound": float(np.percentile(counts, 10)),
        "median_inbound": float(np.median(counts)),
    }
    log(f"inbound: zero={zero_in}/{gt_ids.size} median={np.median(counts)}")

    # ---- leg 2 (device): ef escalation on the worst decile ----
    zvec_tpu.init()
    col = zvec_tpu.open(COL_DIR)
    per_q = {}
    for ef in (96, 512, 2048):
        p = HnswQueryParam(ef=ef, done_frac=1.0)
        docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        rec = np.array(
            [
                len({int(d.id) for d in docs[i]} & set(gt[i].tolist())) / K
                for i in range(GT_Q)
            ]
        )
        per_q[ef] = rec
        log(f"ef={ef}: mean={rec.mean():.4f} p10={np.percentile(rec,10):.2f}")
    base = per_q[96]
    worst = np.argsort(base)[: GT_Q // 10]
    esc = {
        str(ef): {
            "worst_decile_mean": round(float(per_q[ef][worst].mean()), 4),
            "overall_mean": round(float(per_q[ef].mean()), 4),
            "still_below_0p6": int((per_q[ef][worst] < 0.6).sum()),
        }
        for ef in per_q
    }
    out["legs"]["ef_escalation"] = esc
    out["legs"]["worst_queries"] = worst.tolist()

    # per-missing-id reachability under the largest ef: which GT ids are
    # STILL missed at ef=2048, and what is their inbound degree?
    p = HnswQueryParam(ef=2048, done_frac=1.0)
    docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
    still_missing = []
    for i in worst:
        got = {int(d.id) for d in docs[i]}
        for g in gt[i]:
            if int(g) not in got:
                still_missing.append(int(g))
    sm = np.asarray(sorted(set(still_missing)))
    smi = np.searchsorted(gt_ids, sm)
    sm_in = counts[smi]
    out["legs"]["still_missing_at_ef2048"] = {
        "count": int(sm.size),
        "zero_inbound": int((sm_in == 0).sum()),
        "median_inbound": float(np.median(sm_in)) if sm.size else None,
    }
    log(f"still missing at ef=2048: {sm.size}, zero-inbound {int((sm_in==0).sum())}")

    # ---- leg 3: entry-similarity analysis ----
    # entry point similarity for worst vs best queries (is the descent
    # starting far away for the tail?)
    X = np.load(os.path.join(WORK, "base.npy"), mmap_mode="r")
    ent = int(aux["entry_point"]) if "entry_point" in aux.files else None
    if ent is not None:
        ev = np.asarray(X[ent], np.float32)
        d_ent = ((Q[:GT_Q] - ev) ** 2).sum(1)
        best = np.argsort(base)[-(GT_Q // 10) :]
        out["legs"]["entry_distance"] = {
            "worst_decile_mean_d2": round(float(d_ent[worst].mean()), 1),
            "best_decile_mean_d2": round(float(d_ent[best].mean()), 1),
        }

    # verdict heuristic
    rec96 = esc["96"]["worst_decile_mean"]
    rec2048 = esc["2048"]["worst_decile_mean"]
    if rec2048 >= 0.95:
        verdict = (
            "beam hardness: the tail fully recovers at large ef — GT is "
            "reachable, working-ef ranking loses it"
        )
    elif rec2048 - rec96 < 0.1 and out["legs"]["still_missing_at_ef2048"][
        "zero_inbound"
    ] > 0:
        verdict = "connectivity: missing GT ids are orphaned (zero inbound)"
    else:
        verdict = (
            f"mixed: worst-decile {rec96:.3f}@96 -> {rec2048:.3f}@2048; "
            "residual misses have inbound links (GT hardness / routing)"
        )
    out["verdict"] = verdict
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tail10m_attribution.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
