"""10M x 768d cosine + int8 + refine: the reference's canonical workload
shape, end-to-end through the PUBLIC Collection API.

The reference's in-tree headline bench is Cohere-10M: 768-d embeddings,
Cosine metric, `CosineInt8Converter`, HNSW ef=250, TopK 1/10/50/100, 1000
test queries (`/root/reference/tools/core/README.md:53,95-131`). The real
Cohere dump isn't fetchable here (zero egress), so the corpus is synthetic
clustered UNIT-NORM data at the same shape — 1024 Gaussian centers + noise,
L2-normalized, the clustered-hard regime for graph builds (BASELINE.md).

This is the HBM-tier exercise SURVEY §7 flags as the hard part: the fp32
corpus is ~30GB (host/disk only), the graph builds and searches over
device-resident SYMMETRIC int8 codes (~7.7GB; `core/hnsw.py` build_int8),
and hits are re-ranked at fp32 by the host refiner over the cached forward
store — the reference's quantized-index + full-precision-refine pairing
(`segment.cc:1591-1700`) mapped onto one 16GB chip.

Stages (resumable via DONE_* markers, like bench_10m_hnsw.py): the base
corpus is NEVER written to disk — it regenerates deterministically in
1M-row chunks (seeded) for insert and GT, so the run costs ~42GB of disk
(forward store + index dump), not 100GB+.

GT is exact fp32: corpus chunks stream through the tunnel and a HIGHEST-
precision dot + lax.top_k(100) runs per chunk; per-chunk partials merge on
host. Sims come back as real f32 (no bitcast id lanes — the TPU D2H
subnormal flush only eats ids packed INTO float lanes).

Usage:  ZVEC_BUILD_LOG=1 python benchmarks/bench_cohere10m.py
Env:    C10M_DIR (default /tmp/cohere10m), C10M_N (default 10M),
        C10M_CPU=1 for small-N smoke off-TPU.
Output: one JSON line per measurement + C10M_DIR/results.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

if os.environ.get("C10M_CPU") == "1":  # small-N smoke runs off-TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("C10M_DIR", "/tmp/cohere10m")
COL_DIR = os.path.join(WORK, "col")
N = int(os.environ.get("C10M_N", 10_000_000))
D, NQ, KMAX = 768, 1000, 100
K = 10  # the recall@10 headline
NCENTERS = 1024
SEED = 0xC0EE
GEN_CHUNK = 1 << 20


def log(msg: str) -> None:
    print(f"[c10m {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def marker(name: str) -> str:
    return os.path.join(WORK, f"DONE_{name}")


def done(name: str) -> bool:
    return os.path.exists(marker(name))


def mark(name: str, payload: dict | None = None) -> None:
    with open(marker(name), "w") as fh:
        json.dump(payload or {}, fh)


def read_mark(name: str) -> dict:
    try:
        with open(marker(name)) as fh:
            return json.load(fh)
    except OSError:
        return {}


def _centers() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return (rng.standard_normal((NCENTERS, D)) * 2.0).astype(np.float32)


GEN_BLOCK = 1 << 16


def gen_chunk(centers: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Rows [lo, hi) of the unit-norm corpus. Deterministic per FIXED
    GEN_BLOCK-aligned sub-block (each seeded by its block index and drawn
    whole), so ANY caller window regenerates identical rows — the first
    version seeded by the caller's own window start, and insert (1M-row
    windows) vs GT (256k windows) silently generated two different corpora
    (recall@10 read 0.027 against a GT for data that was never inserted)."""
    out = np.empty((hi - lo, D), np.float32)
    for b in range(lo // GEN_BLOCK, (hi - 1) // GEN_BLOCK + 1):
        rng = np.random.default_rng(SEED + 1 + b)
        blo, bhi = b * GEN_BLOCK, (b + 1) * GEN_BLOCK
        x = centers[rng.integers(0, NCENTERS, GEN_BLOCK)] + rng.standard_normal(
            (GEN_BLOCK, D), dtype=np.float32
        )
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        s, e = max(lo, blo), min(hi, bhi)
        out[s - lo : e - lo] = x[s - blo : e - blo]
    return out


def queries() -> np.ndarray:
    path = os.path.join(WORK, "query.npy")
    if os.path.exists(path):
        return np.load(path)
    centers = _centers()
    rng = np.random.default_rng(SEED + 999_983)
    q = centers[rng.integers(0, NCENTERS, NQ)] + rng.standard_normal(
        (NQ, D), dtype=np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    np.save(path, q)
    return q


def stage_insert():
    if done("insert"):
        return
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        HnswIndexParam,
        MetricType,
        VectorSchema,
    )
    from zvec_tpu.typing import QuantizeType

    shutil.rmtree(COL_DIR, ignore_errors=True)
    zvec_tpu.init()
    schema = CollectionSchema(
        "cohere10m",
        vectors=[
            VectorSchema(
                "vec",
                DataType.VECTOR_FP32,
                D,
                # reference build parity: Cosine + int8 converter, default
                # neighbor budget (m=50 -> 100 L0 edges), efc=500
                HnswIndexParam(
                    MetricType.COSINE,
                    m=50,
                    ef_construction=500,
                    quantize_type=QuantizeType.INT8,
                ),
            )
        ],
    )
    col = zvec_tpu.create_and_open(COL_DIR, schema)
    centers = _centers()
    t0 = time.time()
    B = 1024  # reference write-batch parity (collection.cc:1443-1445)
    for glo in range(0, N, GEN_CHUNK):
        ghi = min(glo + GEN_CHUNK, N)
        X = gen_chunk(centers, glo, ghi)
        for lo in range(0, ghi - glo, B):
            block = X[lo : lo + B]
            col.insert(
                [
                    Doc(id=str(glo + lo + i), vectors={"vec": block[i]})
                    for i in range(len(block))
                ]
            )
        log(f"  inserted {ghi:,}/{N:,} ({time.time() - t0:.0f}s)")
    col.flush()
    insert_s = time.time() - t0
    mark("insert", {"secs": round(insert_s, 1)})
    log(f"insert+flush done in {insert_s:.0f}s")
    return col


def stage_build(col=None):
    if done("build"):
        return
    import zvec_tpu

    if col is None:
        zvec_tpu.init()
        col = zvec_tpu.open(COL_DIR)
    log("optimize(): seal + eager int8-resident HNSW build")
    t0 = time.time()
    col.optimize()
    col.flush()
    build_s = time.time() - t0
    mark("build", {"secs": round(build_s, 1)})
    log(f"optimize/build done in {build_s:.0f}s")
    return col


def stage_gt():
    """Exact fp32 cosine GT for all NQ queries: stream corpus chunks to the
    device, HIGHEST-precision dots + top-100 per chunk, host merge."""
    if done("gt"):
        return
    import jax
    import jax.numpy as jnp

    Q = queries()
    centers = _centers()
    t0 = time.time()
    CH = 1 << 18
    nq_pad = 1024
    qp = np.zeros((nq_pad, D), np.float32)
    qp[:NQ] = Q
    qd = jnp.asarray(qp)

    @jax.jit
    def chunk_topk(qd, xd):
        dots = jnp.einsum(
            "qd,nd->qn", qd, xd, precision=jax.lax.Precision.HIGHEST
        )
        return jax.lax.top_k(dots, KMAX)

    best_s = np.full((nq_pad, KMAX), -np.inf, np.float32)
    best_i = np.full((nq_pad, KMAX), -1, np.int64)
    nch = (N + CH - 1) // CH
    for ci, lo in enumerate(range(0, N, CH)):
        hi = min(lo + CH, N)
        xb = np.zeros((CH, D), np.float32)  # pad tail: one compiled program
        xb[: hi - lo] = gen_chunk(centers, lo, hi)
        s, i = chunk_topk(qd, jnp.asarray(xb))
        s = np.asarray(s)
        i = np.asarray(i).astype(np.int64) + lo
        valid = (i - lo) < (hi - lo)
        s = np.where(valid, s, -np.inf)
        cat_s = np.concatenate([best_s, s], axis=1)
        cat_i = np.concatenate([best_i, i], axis=1)
        part = np.argpartition(-cat_s, KMAX, axis=1)[:, :KMAX]
        best_s = np.take_along_axis(cat_s, part, axis=1)
        best_i = np.take_along_axis(cat_i, part, axis=1)
        if ci % 8 == 0:
            log(f"  gt chunk {ci + 1}/{nch} ({time.time() - t0:.0f}s)")
    order = np.argsort(-best_s, axis=1)
    best_i = np.take_along_axis(best_i, order, axis=1)[:NQ]
    np.save(os.path.join(WORK, "gt.npy"), best_i)
    mark("gt", {"secs": round(time.time() - t0, 1)})
    log(f"gt done in {time.time() - t0:.0f}s")


def _recall(docs, gt, k: int) -> float:
    hits = 0
    for i in range(len(docs)):
        got = {int(d.id) for d in docs[i][:k]}
        hits += len(got & set(gt[i][:k].tolist()))
    return hits / (len(docs) * k)


def _percentiles(samples) -> dict:
    a = np.asarray(samples, np.float64) * 1e3
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 1),
        "p95_ms": round(float(np.percentile(a, 95)), 1),
        "p99_ms": round(float(np.percentile(a, 99)), 1),
    }


def stage_measure(col=None):
    import zvec_tpu
    from zvec_tpu import HnswQueryParam

    if col is None:
        zvec_tpu.init()
        t0 = time.time()
        col = zvec_tpu.open(COL_DIR)
        log(f"open() in {time.time() - t0:.1f}s")
    Q = queries()
    gt = np.load(os.path.join(WORK, "gt.npy"))
    try:
        import jax

        hbm = jax.devices()[0].memory_stats() or {}
        hbm_note = {
            "bytes_in_use_gb": round(hbm.get("bytes_in_use", 0) / 2**30, 2),
            "bytes_limit_gb": round(hbm.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        hbm_note = {}
    results = {
        "n": N,
        "dim": D,
        "metric": "cosine",
        "quantize": "int8(symmetric)",
        "kind": "clustered-unit-norm",
        "insert_secs": read_mark("insert").get("secs"),
        "build_secs": read_mark("build").get("secs"),
        "ef": {},
        "topk_at_ef250": {},
        "refine_ab": {},
    }

    def _flush():
        # incremental flush: the host OOM-killed one measure run mid-leg
        # (RSS crept to 130GB); every completed leg must survive
        with open(os.path.join(WORK, "results.json"), "w") as fh:
            json.dump(results, fh, indent=1)

    REPS = int(os.environ.get("C10M_REPS", "12"))
    for ef in (64, 96, 128, 250):
        p = HnswQueryParam(ef=ef)
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)  # warm
        col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            times.append(time.perf_counter() - t0)
        blocks = 4
        col.batch_query_many("vec", [Q] * 2, topk=K, output_fields=[], param=p)
        t0 = time.perf_counter()
        col.batch_query_many("vec", [Q] * blocks, topk=K, output_fields=[], param=p)
        dt_p = (time.perf_counter() - t0) / blocks
        row = {
            "recall_at_10": round(_recall(docs, gt, K), 4),
            "qps": round(NQ / float(np.median(times)), 1),
            "qps_pipelined": round(NQ / dt_p, 1),
            "batch_latency": _percentiles(times),
        }
        results["ef"][ef] = row
        print(json.dumps({"ef": ef, **row}), flush=True)
        _flush()

    # reference recall table shape: TopK 1/10/50/100 at ef=250
    p250 = HnswQueryParam(ef=250)
    for tk in (1, 10, 50, 100):
        docs = col.batch_query("vec", Q, topk=tk, output_fields=[], param=p250)
        results["topk_at_ef250"][tk] = round(_recall(docs, gt, tk), 4)
    print(json.dumps({"topk_at_ef250": results["topk_at_ef250"]}), flush=True)
    _flush()

    # refine A/B: raw int8 scores vs fp32 host re-rank (the refiner tier)
    for ef in (96, 250):
        row = {}
        for refine_on in (False, True):
            p = HnswQueryParam(ef=ef, is_using_refiner=refine_on)
            col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            t0 = time.perf_counter()
            docs = col.batch_query("vec", Q, topk=K, output_fields=[], param=p)
            dt = time.perf_counter() - t0
            row["refine_on" if refine_on else "refine_off"] = {
                "recall_at_10": round(_recall(docs, gt, K), 4),
                "qps": round(NQ / dt, 1),
            }
        results["refine_ab"][ef] = row
        print(json.dumps({"refine_ab_ef": ef, **row}), flush=True)
        _flush()

    # true interactive latency (single query through the tunnel)
    p = HnswQueryParam(ef=250)
    from zvec_tpu import VectorQuery

    col.query(VectorQuery("vec", vector=Q[0], param=p), topk=K)
    lat = []
    for i in range(32):
        t0 = time.perf_counter()
        col.query(VectorQuery("vec", vector=Q[i % NQ], param=p), topk=K)
        lat.append(time.perf_counter() - t0)
    results["single_query_latency"] = _percentiles(lat)
    results["hbm"] = hbm_note
    with open(os.path.join(WORK, "results.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"summary": results}), flush=True)


def main():
    os.makedirs(WORK, exist_ok=True)
    col = stage_insert()
    col = stage_build(col)
    stage_gt()
    stage_measure(col)


if __name__ == "__main__":
    main()
