"""Sparse engines at production scale: 1M docs, 100k+ vocab, BM25-like nnz
(VERDICT r4 weak #2 / next #5).

The reference's hnsw_sparse is a ~6.5k-LoC production engine
(`/root/reference/src/core/algorithm/hnsw_sparse/`); zvec_tpu's prior
evidence topped out at 100k docs x 30k vocab. This measures, through the
PUBLIC Collection API, on a Zipf-weighted topic-model corpus (the BM25
regime: head terms shared across topics, long tails discriminative):

  - sparse HNSW (clustered signature build, `core/hnsw_sparse.py`)
    build time + recall@10 vs the exact oracle + qps across ef
  - the flat-sparse oracle path itself (is_linear) qps at 1M
  - single-query latency percentiles

GT: exact sparse top-k via the engine's own flat scan is NOT used for GT —
an independent host computation over the (sampled) query set confirms it.

Usage:  ZVEC_BUILD_LOG=1 python benchmarks/bench_sparse1m.py
Env:    SP1M_DIR (default /tmp/sparse1m), SP1M_N, SP1M_VOCAB, SP1M_CPU=1.
Output: one JSON line per leg + SP1M_DIR/results.json (commit as
        benchmarks/sparse1m_results.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

if os.environ.get("SP1M_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SP1M_DIR", "/tmp/sparse1m")
COL_DIR = os.path.join(WORK, "col")
N = int(os.environ.get("SP1M_N", 1_000_000))
VOCAB = int(os.environ.get("SP1M_VOCAB", 131_072))
TOPICS = 256
NNZ_DOC = 96  # BM25-realistic mean document length (terms)
NNZ_Q = 16
NQ = 1024
K = 10
GT_Q = 256
SEED = 0x5A5A


def log(msg: str) -> None:
    print(f"[sp1m {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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


def _topic_model():
    """Per-topic term pools: a Zipf head shared corpus-wide + topic tails."""
    rng = np.random.default_rng(SEED)
    head = np.arange(2000)  # shared high-frequency terms
    pools = []
    for _ in range(TOPICS):
        tail = rng.choice(VOCAB - 2000, 600, replace=False) + 2000
        pools.append(np.concatenate([head, tail]))
    return pools


def _make_rows(pools, count: int, nnz: int, seed: int, head_frac=0.3):
    """Batch-generate `count` sparse rows as (idx (count, nnz) int32,
    val (count, nnz) f32) — head terms get low (idf-like) weights, tail
    terms high ones. Vectorized: python per-row dict loops are build-time
    killers on the 1-core host."""
    rng = np.random.default_rng(seed)
    t = rng.integers(0, TOPICS, count)
    n_head = int(nnz * head_frac)
    n_tail = nnz - n_head
    head_idx = rng.integers(0, 2000, (count, n_head)).astype(np.int32)
    tail_pick = rng.integers(0, 600, (count, n_tail))
    pool_mat = np.stack([p[2000:] for p in pools])  # (T, 600)
    tail_idx = pool_mat[t[:, None], tail_pick].astype(np.int32)
    idx = np.concatenate([head_idx, tail_idx], axis=1)
    val = np.concatenate(
        [
            (rng.random((count, n_head)) * 0.3 + 0.05).astype(np.float32),
            (rng.random((count, n_tail)) + 0.5).astype(np.float32),
        ],
        axis=1,
    )
    # dedup within a row: keep first occurrence (zero the rest)
    order = np.argsort(idx, axis=1, kind="stable")
    si = np.take_along_axis(idx, order, 1)
    sv = np.take_along_axis(val, order, 1)
    dup = np.zeros_like(si, dtype=bool)
    dup[:, 1:] = si[:, 1:] == si[:, :-1]
    sv = np.where(dup, 0.0, sv)
    si = np.where(dup, -1, si)
    return si, sv


def rows_to_dicts(idx: np.ndarray, val: np.ndarray):
    out = []
    for i in range(idx.shape[0]):
        m = idx[i] >= 0
        out.append(
            dict(zip(idx[i][m].tolist(), val[i][m].astype(float).tolist()))
        )
    return out


def queries(pools):
    qi, qv = _make_rows(pools, NQ, NNZ_Q, SEED + 77, head_frac=0.25)
    return qi, qv


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

    pools = _topic_model()
    shutil.rmtree(COL_DIR, ignore_errors=True)
    zvec_tpu.init()
    schema = CollectionSchema(
        "sparse1m",
        vectors=[
            VectorSchema(
                "sv",
                DataType.SPARSE_VECTOR_FP32,
                0,
                HnswIndexParam(MetricType.IP, m=16, ef_construction=200),
            )
        ],
    )
    col = zvec_tpu.create_and_open(COL_DIR, schema)
    t0 = time.time()
    B = 1024
    CH = 1 << 17
    for glo in range(0, N, CH):
        cnt = min(CH, N - glo)
        idx, val = _make_rows(pools, cnt, NNZ_DOC, SEED + 1 + glo)
        dicts = rows_to_dicts(idx, val)
        for lo in range(0, cnt, B):
            col.insert(
                [
                    Doc(id=str(glo + lo + i), vectors={"sv": dicts[lo + i]})
                    for i in range(min(B, cnt - lo))
                ]
            )
        log(f"  inserted {glo + cnt:,}/{N:,} ({time.time() - t0:.0f}s)")
    col.flush()
    mark("insert", {"secs": round(time.time() - t0, 1)})
    log(f"insert+flush done in {time.time() - t0:.0f}s")
    return col


def stage_build(col=None):
    if done("build"):
        return col
    import zvec_tpu

    if col is None:
        zvec_tpu.init()
        col = zvec_tpu.open(COL_DIR)
    t0 = time.time()
    col.optimize()
    col.flush()
    mark("build", {"secs": round(time.time() - t0, 1)})
    log(f"optimize/build done in {time.time() - t0:.0f}s")
    return col


def stage_gt():
    """Exact sparse IP GT for GT_Q queries, blocked on host (CSR matmul via
    scipy — ~GT_Q x N x nnz ops)."""
    if done("gt"):
        return
    from scipy.sparse import csr_matrix

    pools = _topic_model()
    qi, qv = queries(pools)
    t0 = time.time()
    qd = np.zeros((GT_Q, VOCAB), np.float32)
    for i in range(GT_Q):
        m = qi[i] >= 0
        np.add.at(qd[i], qi[i][m], qv[i][m])
    best_s = np.full((GT_Q, K), -np.inf, np.float32)
    best_i = np.full((GT_Q, K), -1, np.int64)
    CH = 1 << 17
    for glo in range(0, N, CH):
        cnt = min(CH, N - glo)
        idx, val = _make_rows(pools, cnt, NNZ_DOC, SEED + 1 + glo)
        m = idx >= 0
        rows = np.repeat(np.arange(cnt), m.sum(1))
        csr = csr_matrix(
            (val[m], (rows, idx[m])), shape=(cnt, VOCAB), dtype=np.float32
        )
        sims = np.asarray((csr @ qd.T).T)  # (GT_Q, cnt)
        cat_s = np.concatenate([best_s, sims], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(glo, glo + cnt), (GT_Q, cnt))],
            axis=1,
        )
        part = np.argpartition(-cat_s, K, axis=1)[:, :K]
        best_s = np.take_along_axis(cat_s, part, axis=1)
        best_i = np.take_along_axis(cat_i, part, axis=1)
        log(f"  gt block at {glo + cnt:,} ({time.time() - t0:.0f}s)")
    order = np.argsort(-best_s, axis=1)
    np.save(
        os.path.join(WORK, "gt.npy"), np.take_along_axis(best_i, order, axis=1)
    )
    mark("gt", {"secs": round(time.time() - t0, 1)})
    log(f"gt done in {time.time() - t0:.0f}s")


def stage_measure(col=None):
    import zvec_tpu
    from zvec_tpu import HnswQueryParam, VectorQuery

    if col is None:
        zvec_tpu.init()
        col = zvec_tpu.open(COL_DIR)
    pools = _topic_model()
    qi, qv = queries(pools)
    qdicts = rows_to_dicts(qi, qv)
    gt = np.load(os.path.join(WORK, "gt.npy"))
    results = {
        "n": N,
        "vocab": VOCAB,
        "nnz_doc": NNZ_DOC,
        "nnz_query": NNZ_Q,
        "insert_secs": read_mark("insert").get("secs"),
        "build_secs": read_mark("build").get("secs"),
        "ef": {},
    }
    for ef in (32, 64, 128):
        p = HnswQueryParam(ef=ef)
        vqs = [VectorQuery("sv", vector=q, param=p) for q in qdicts]
        col.batch_query("sv", qdicts, topk=K, output_fields=[], param=p)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            docs = col.batch_query(
                "sv", qdicts, topk=K, output_fields=[], param=p
            )
            times.append(time.perf_counter() - t0)
        hits = sum(
            len({int(d.id) for d in docs[i]} & set(gt[i].tolist()))
            for i in range(GT_Q)
        )
        ta = np.asarray(times) * 1e3
        row = {
            "recall_at_10": round(hits / (GT_Q * K), 4),
            "qps": round(NQ / float(np.median(times)), 1),
            "batch_p99_ms": round(float(np.percentile(ta, 99)), 1),
        }
        results["ef"][ef] = row
        print(json.dumps({"ef": ef, **row}), flush=True)

    # flat-sparse oracle path (is_linear) at 1M
    p = HnswQueryParam(ef=64, is_linear=True)
    col.batch_query("sv", qdicts[:GT_Q], topk=K, output_fields=[], param=p)
    t0 = time.perf_counter()
    docs = col.batch_query("sv", qdicts[:GT_Q], topk=K, output_fields=[], param=p)
    dt = time.perf_counter() - t0
    hits = sum(
        len({int(d.id) for d in docs[i]} & set(gt[i].tolist()))
        for i in range(GT_Q)
    )
    results["flat_linear"] = {
        "recall_at_10": round(hits / (GT_Q * K), 4),
        "qps": round(GT_Q / dt, 1),
    }
    print(json.dumps({"flat_linear": results["flat_linear"]}), flush=True)

    lat = []
    p = HnswQueryParam(ef=64)
    col.query(VectorQuery("sv", vector=qdicts[0], param=p), topk=K)
    for i in range(24):
        t0 = time.perf_counter()
        col.query(VectorQuery("sv", vector=qdicts[i], param=p), topk=K)
        lat.append(time.perf_counter() - t0)
    la = np.asarray(lat) * 1e3
    results["single_query_latency"] = {
        "p50_ms": round(float(np.percentile(la, 50)), 1),
        "p99_ms": round(float(np.percentile(la, 99)), 1),
    }
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
