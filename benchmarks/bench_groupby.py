"""Group-by latency ratio at 1M (VERDICT r3 item #7 done-criterion:
group-by on 1M docs <= 2x plain query latency, guarantee tests still pass).

Builds (or reuses) a 1M x 128d HNSW collection with a zipf-skewed group
column (the hard case: a few huge groups + a long tail forces deepening
when quotas don't fill), then compares:
  - plain single query latency at topk = group_count * group_topk,
  - group_by_query latency (group_count=10, group_topk=2),
  - a skewed worst case (group_count=50).

Usage: python benchmarks/bench_groupby.py   (TPU; ~6 min build first run)
Output: one JSON line; also merged into GB_DIR/results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GB_DIR = os.environ.get("GB_DIR", "/tmp/zvec_gb1m")
N = int(os.environ.get("GB_N", 1_000_000))
D = 128
N_GROUPS = 1000


def log(msg):
    print(f"[gb {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build():
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        FieldSchema,
        HnswIndexParam,
        MetricType,
        VectorSchema,
    )

    marker = os.path.join(GB_DIR, "READY")
    zvec_tpu.init()
    if os.path.exists(marker):
        return zvec_tpu.open(GB_DIR)
    import shutil

    shutil.rmtree(GB_DIR, ignore_errors=True)
    schema = CollectionSchema(
        "gb1m",
        fields=[FieldSchema("cat", DataType.INT64)],
        vectors=[
            VectorSchema(
                "vec",
                DataType.VECTOR_FP32,
                D,
                HnswIndexParam(MetricType.L2, m=50, ef_construction=500),
            )
        ],
    )
    col = zvec_tpu.create_and_open(GB_DIR, schema)
    rng = np.random.default_rng(11)
    X = rng.standard_normal((N, D)).astype(np.float32)
    # zipf-skewed groups: group 0 holds ~25% of docs, long tail beyond
    w = 1.0 / np.arange(1, N_GROUPS + 1) ** 1.3
    cats = rng.choice(N_GROUPS, N, p=w / w.sum())
    t0 = time.time()
    B = 1024
    for lo in range(0, N, B):
        col.insert(
            [
                Doc(id=str(i), fields={"cat": int(cats[i])}, vectors={"vec": X[i]})
                for i in range(lo, min(lo + B, N))
            ]
        )
        if lo % 262144 == 0:
            log(f"  inserted {lo:,}")
    log(f"insert {time.time() - t0:.0f}s; optimize...")
    t0 = time.time()
    col.optimize()
    col.flush()
    log(f"optimize {time.time() - t0:.0f}s")
    open(marker, "w").write("ok")
    return col


def p50(fn, iters=30):
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(np.array(lat) * 1e3, 50))


def main():
    from zvec_tpu import HnswQueryParam, VectorQuery

    col = build()
    rng = np.random.default_rng(3)
    qs = rng.standard_normal((64, D)).astype(np.float32)
    gc_, gt = 10, 2
    p = HnswQueryParam(ef=96)

    def plain(i=[0]):
        i[0] += 1
        col.query(VectorQuery("vec", vector=qs[i[0] % 64], param=p), topk=gc_ * gt)

    def grouped(i=[0]):
        i[0] += 1
        col.group_by_query(
            VectorQuery("vec", vector=qs[i[0] % 64], param=p),
            group_by_field="cat",
            group_count=gc_,
            group_topk=gt,
        )

    def grouped50(i=[0]):
        i[0] += 1
        col.group_by_query(
            VectorQuery("vec", vector=qs[i[0] % 64], param=p),
            group_by_field="cat",
            group_count=50,
            group_topk=gt,
        )

    # warm/compile each shape outside timing
    plain(); grouped(); grouped50()
    plain_ms = p50(plain)
    grouped_ms = p50(grouped)
    grouped50_ms = p50(grouped50, iters=15)
    row = {
        "n": N,
        "plain_p50_ms": round(plain_ms, 1),
        "groupby_10x2_p50_ms": round(grouped_ms, 1),
        "groupby_50x2_p50_ms": round(grouped50_ms, 1),
        "ratio_10x2": round(grouped_ms / plain_ms, 2),
        "ratio_50x2": round(grouped50_ms / plain_ms, 2),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(row), flush=True)
    with open(os.path.join(GB_DIR, "results.json"), "w") as fh:
        json.dump(row, fh, indent=1)


if __name__ == "__main__":
    main()
