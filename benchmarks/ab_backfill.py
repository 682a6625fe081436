"""A/B: backfill_alpha on clustered / gaussian data (VERDICT r3 items #2/#3).

Builds the SAME dataset twice through the public API — backfill_alpha=0
(round-2 graph) vs backfill_alpha=A — and sweeps recall@10 over ef. Small-N
validation before spending an hour on a 10M rebuild.

Usage: AB_KIND=clustered AB_N=200000 AB_ALPHA=1.2 python benchmarks/ab_backfill.py
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.h2h import exact_gt, make_data  # noqa: E402

KIND = os.environ.get("AB_KIND", "clustered")
N = int(os.environ.get("AB_N", 200_000))
ALPHA = float(os.environ.get("AB_ALPHA", 1.2))
D, NQ, K = 128, 1024, 10
WORK = os.environ.get("AB_DIR", f"/tmp/ab_backfill_{KIND}_{N}")
EFS = tuple(int(x) for x in os.environ.get("AB_EFS", "32 64 128 256 500").split())


def log(m):
    print(f"[ab {time.strftime('%H:%M:%S')}] {m}", flush=True)


def build_and_measure(tag, X, Q, gt, backfill_alpha):
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        HnswIndexParam,
        HnswQueryParam,
        MetricType,
        VectorSchema,
    )

    path = os.path.join(WORK, tag)
    marker = os.path.join(path, "AB_DONE")
    if os.path.exists(marker):
        col = zvec_tpu.open(path)
        build_s = -1.0
    else:
        shutil.rmtree(path, ignore_errors=True)
        schema = CollectionSchema(
            "ab_" + tag.replace(".", "_"),  # dots violate the name rule
            vectors=[
                VectorSchema(
                    "vec", DataType.VECTOR_FP32, D,
                    HnswIndexParam(
                        MetricType.L2, m=50, ef_construction=500,
                        backfill_alpha=backfill_alpha,
                    ),
                )
            ],
        )
        col = zvec_tpu.create_and_open(path, schema)
        t0 = time.time()
        for lo in range(0, N, 1024):
            col.insert(
                [Doc(id=str(i), vectors={"vec": X[i]}) for i in range(lo, min(lo + 1024, N))]
            )
        col.optimize()
        col.flush()
        build_s = time.time() - t0
        open(marker, "w").write("ok")
    row = {"backfill_alpha": backfill_alpha, "build_secs": round(build_s, 1), "ef": {}}
    gt_q = gt.shape[0]
    for ef in EFS:
        p = HnswQueryParam(ef=ef)
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        t0 = time.perf_counter()
        docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        dt = time.perf_counter() - t0
        hits = sum(
            len({int(h.id) for h in docs[i]} & set(gt[i, :K].tolist()))
            for i in range(gt_q)
        )
        row["ef"][ef] = {
            "recall_at_10": round(hits / (gt_q * K), 4),
            "qps": round(NQ / dt, 1),
        }
        log(f"{tag} ef={ef}: {row['ef'][ef]}")
    col._impl.close()
    return row


def main():
    os.makedirs(WORK, exist_ok=True)
    dpath = os.path.join(WORK, "data.npz")
    if os.path.exists(dpath):
        z = np.load(dpath)
        X, Q, gt = z["X"], z["Q"], z["gt"]
    else:
        log(f"generating {KIND} {N}x{D}")
        X, Q = make_data(KIND, N, D, nq=NQ)
        gt = exact_gt(X, Q[:256], k=K)
        np.savez(dpath, X=X, Q=Q, gt=gt)
    out = {}
    outp = os.path.join(WORK, "results.json")
    if os.path.exists(outp):
        out = json.load(open(outp))
    for tag, a in (("base", 0.0), (f"bf{ALPHA}", ALPHA)):
        if tag in out:
            log(f"{tag}: cached")
            continue
        out[tag] = build_and_measure(tag, X, Q[:256], gt, a)
        with open(outp, "w") as fh:
            json.dump(out, fh, indent=1)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
