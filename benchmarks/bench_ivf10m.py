"""IVF at 10M through the PUBLIC Collection API (VERDICT r4 missing #2).

The measurement the two r4 OOM fixes (blocked SOAR top-2 `ad49a4c`, 4096
bucket cap `92ede20`) were landed for but never ran. Reuses the persisted
10M x 128d clustered corpus from the HNSW head-to-head (H2H10M_DIR) —
identical data + queries + unfiltered GT — and inserts into a fresh IVF
collection with tag/price fields for the hybrid-filter leg.

Coverage (matching `/root/reference/src/core/algorithm/ivf/
ivf_searcher.cc:183-250`):
  - nprobe sweep (unfiltered recall@10 / qps)
  - SOAR on/off A/B: same corpus, index rebuilt via drop_index +
    create_index + optimize (no re-insert)
  - max_scan_count in effect: budgeted vs unbounded at fixed nprobe
  - hybrid filter at 10M: `tag = 't3' AND price < 0.5` (~5% selectivity,
    the brute-force-by-keys demotion regime) + a 50% filter that stays on
    the probe path

Stages are resumable via DONE_* markers in IVF10M_DIR.
Usage:  ZVEC_BUILD_LOG=1 python benchmarks/bench_ivf10m.py
Output: one JSON line per leg + IVF10M_DIR/results.json (commit as
        benchmarks/ivf10m_results.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

if os.environ.get("IVF10M_CPU") == "1":  # small-N smoke off-TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("H2H10M_DIR", "/tmp/h2h10m")
WORK = os.environ.get("IVF10M_DIR", "/tmp/ivf10m")
COL_DIR = os.path.join(WORK, "col")
N = int(os.environ.get("IVF10M_N", 10_000_000))
K = 10
GT_Q = 256
SEED = 0x1F1F


def log(msg: str) -> None:
    print(f"[ivf10m {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def marker(n: str) -> str:
    return os.path.join(WORK, f"DONE_{n}")


def done(n: str) -> bool:
    return os.path.exists(marker(n))


def mark(n: str, payload=None) -> None:
    with open(marker(n), "w") as fh:
        json.dump(payload or {}, fh)


def read_mark(n: str) -> dict:
    try:
        with open(marker(n)) as fh:
            return json.load(fh)
    except OSError:
        return {}


def load_results() -> dict:
    try:
        with open(os.path.join(WORK, "results.json")) as fh:
            return json.load(fh)
    except OSError:
        return {}


def save_results(r: dict) -> None:
    with open(os.path.join(WORK, "results.json"), "w") as fh:
        json.dump(r, fh, indent=1)


def fields_arrays():
    rng = np.random.default_rng(SEED)
    tags = rng.integers(0, 10, N)
    price = rng.random(N)
    return tags, price


def stage_insert():
    if done("insert"):
        return
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        FieldSchema,
        IVFIndexParam,
        MetricType,
        VectorSchema,
    )
    from zvec_tpu.model.param.param import InvertIndexParam

    X = np.load(os.path.join(SRC, "base.npy"), mmap_mode="r")
    assert X.shape[0] >= N, X.shape
    tags, price = fields_arrays()
    shutil.rmtree(COL_DIR, ignore_errors=True)
    zvec_tpu.init()
    schema = CollectionSchema(
        "ivf10m",
        fields=[
            FieldSchema("tag", DataType.STRING, index_param=InvertIndexParam()),
            FieldSchema("price", DataType.DOUBLE),
            # high-cardinality group key for the 10M grouped-search leg
            # (bench_filtered10m.py builds an HNSW index on this collection)
            FieldSchema("gid", DataType.INT32),
        ],
        vectors=[
            VectorSchema(
                "vec",
                DataType.VECTOR_FP32,
                X.shape[1],
                IVFIndexParam(MetricType.L2, use_soar=True),
            )
        ],
    )
    col = zvec_tpu.create_and_open(COL_DIR, schema)
    t0 = time.time()
    B = 1024
    for lo in range(0, N, B):
        block = np.asarray(X[lo : lo + B])
        col.insert(
            [
                Doc(
                    id=str(lo + i),
                    fields={
                        "tag": f"t{tags[lo + i]}",
                        "price": float(price[lo + i]),
                        "gid": int((lo + i) % 997),
                    },
                    vectors={"vec": block[i]},
                )
                for i in range(len(block))
            ]
        )
        if lo % 2_097_152 == 0:
            log(f"  inserted {lo + len(block):,}/{N:,} ({time.time() - t0:.0f}s)")
    col.flush()
    mark("insert", {"secs": round(time.time() - t0, 1)})
    log(f"insert+flush done in {time.time() - t0:.0f}s")
    return col


def stage_build(col, soar: bool):
    name = "build_soar" if soar else "build_nosoar"
    if done(name):
        return col
    import zvec_tpu
    from zvec_tpu import IVFIndexParam, MetricType

    if col is None:
        zvec_tpu.init()
        col = zvec_tpu.open(COL_DIR)
    t0 = time.time()
    if done("build_soar") or done("build_nosoar"):
        # A/B rebuild: swap index params on the sealed segment, no re-insert
        col.drop_index("vec")
        col.create_index("vec", IVFIndexParam(MetricType.L2, use_soar=soar))
    else:
        col.optimize()
    col.flush()
    mark(name, {"secs": round(time.time() - t0, 1)})
    log(f"{name} done in {time.time() - t0:.0f}s")
    return col


def measure_nprobe(col, gt, Q, tag: str, results: dict, budgets=False):
    from zvec_tpu import IVFQueryParam

    NQ = Q.shape[0]
    block = results.setdefault(tag, {})
    for nprobe in (8, 16, 32, 64, 128):
        p = IVFQueryParam(nprobe=nprobe)
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            times.append(time.perf_counter() - t0)
        hits = sum(
            len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
            for i in range(GT_Q)
        )
        ta = np.asarray(times) * 1e3
        block[nprobe] = {
            "recall_at_10": round(hits / (GT_Q * K), 4),
            "qps": round(NQ / float(np.median(times)), 1),
            "batch_p99_ms": round(float(np.percentile(ta, 99)), 1),
        }
        print(json.dumps({tag: nprobe, **block[nprobe]}), flush=True)
    if budgets:
        # scan budget in effect: nprobe=64 unbounded vs capped at ~2x the
        # average rows 16 probes would scan (2 * 16 * 2N/K_lists rows)
        bl = results.setdefault(tag + "_scan_budget", {})
        for msc in (0, 600_000, 300_000):
            p = IVFQueryParam(nprobe=64, max_scan_count=msc)
            col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            t0 = time.perf_counter()
            docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            dt = time.perf_counter() - t0
            hits = sum(
                len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
                for i in range(GT_Q)
            )
            bl[str(msc)] = {
                "recall_at_10": round(hits / (GT_Q * K), 4),
                "qps": round(NQ / dt, 1),
            }
            print(json.dumps({"max_scan_count": msc, **bl[str(msc)]}), flush=True)
    save_results(results)


def stage_filtered(col, results: dict):
    if "filtered" in results:
        return
    X = np.load(os.path.join(SRC, "base.npy"), mmap_mode="r")
    Q = np.load(os.path.join(SRC, "query.npy"))
    tags, price = fields_arrays()
    out = {}
    for flt, sel in (
        ("tag = 't3' AND price < 0.5", (tags == 3) & (price < 0.5)),
        ("price < 0.5", price < 0.5),
    ):
        gt_path = os.path.join(
            WORK, f"gt_f{abs(hash(flt)) % 99999}.npy"
        )
        if os.path.exists(gt_path):
            gt = np.load(gt_path)
        else:
            sel_idx = np.flatnonzero(sel)
            t0 = time.time()
            # blocked filtered exact GT (float32 host BLAS over the ~5%/50%
            # selected rows)
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
        from zvec_tpu import IVFQueryParam

        p = IVFQueryParam(nprobe=64)
        col.batch_query("vec", Q, topk=K, filter=flt, output_fields=[], param=p)
        t0 = time.perf_counter()
        docs = col.batch_query(
            "vec", Q, topk=K, filter=flt, output_fields=[], param=p
        )
        dt = time.perf_counter() - t0
        hits = sum(
            len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
            for i in range(GT_Q)
        )
        out[flt] = {
            "selectivity": round(float(sel.mean()), 4),
            "recall_at_10": round(hits / (GT_Q * K), 4),
            "qps": round(Q.shape[0] / dt, 1),
        }
        print(json.dumps({"filter": flt, **out[flt]}), flush=True)
    results["filtered"] = out
    save_results(results)


def main():
    os.makedirs(WORK, exist_ok=True)
    Q = np.load(os.path.join(SRC, "query.npy"))
    gt = np.load(os.path.join(SRC, "gt.npy"))
    results = load_results()
    results.update(
        {
            "n": N,
            "dim": int(Q.shape[1]),
            "kind": "clustered (identical corpus/queries/GT to h2h10m)",
            "insert_secs": read_mark("insert").get("secs"),
        }
    )

    col = stage_insert()
    # SOAR first (the created schema default); filtered leg runs on the SOAR
    # index BEFORE the optional no-SOAR rebuild so a wall-clock cutoff still
    # leaves a complete primary artifact.
    col = stage_build(col, soar=True)
    if "soar" not in results:
        results["build_soar_secs"] = read_mark("build_soar").get("secs")
        measure_nprobe(col, gt, Q, "soar", results, budgets=True)
    results.setdefault("filtered_index", "soar")
    stage_filtered(col, results)
    if os.environ.get("IVF10M_SKIP_NOSOAR") != "1":
        col = stage_build(col, soar=False)
        if "nosoar" not in results:
            results["build_nosoar_secs"] = read_mark("build_nosoar").get("secs")
            measure_nprobe(col, gt, Q, "nosoar", results)
    save_results(results)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
