"""BASELINE configs #3/#4/#5 through the PUBLIC Collection API.

Covers the three remaining measurement configs from BASELINE.md:
  3. cosine HNSW with INT8-quantized codes (GloVe-100 shape: D=100,
     cosine metric, asymmetric int8 scoring + fp32 refine tier)
  4. IVF + hybrid search (Deep-like shape: D=96, structured filter
     predicates fused as masks into the list scan)
  5. dense+sparse multi-vector fusion in a single query() call
     (RRF merge — reference `multi_vector_reranker.py:26-88`)

Each stage prints one JSON line and merges it into
benchmarks/suite_results.json (committed after a TPU run so the numbers
survive /tmp). Stages are selectable: `python benchmarks/bench_suite.py
[int8_hnsw] [ivf_hybrid] [fusion]` (default: all).

Env: SUITE_CPU=1 forces the CPU backend (smoke runs); SUITE_N_HNSW /
SUITE_N_IVF / SUITE_N_FUSION override corpus sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

if os.environ.get("SUITE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "suite_results.json")
WORK = os.environ.get("SUITE_DIR", "/tmp/zvec_suite")
SEED = 7


def log(msg: str) -> None:
    print(f"[suite {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def merge_results(key: str, payload: dict) -> None:
    data = {}
    if os.path.exists(RESULTS):
        try:
            data = json.load(open(RESULTS))
        except Exception:
            data = {}
    payload["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    data[key] = payload
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps({key: payload}), flush=True)


def batch_insert(col, ids, vec_name, vecs, fields_fn=None, extra_vecs_fn=None):
    from zvec_tpu import Doc

    B = 1024
    t0 = time.time()
    for lo in range(0, len(ids), B):
        docs = []
        for i in range(lo, min(lo + B, len(ids))):
            vectors = {vec_name: vecs[i]}
            if extra_vecs_fn is not None:
                vectors.update(extra_vecs_fn(i))
            docs.append(
                Doc(
                    id=ids[i],
                    vectors=vectors,
                    fields=fields_fn(i) if fields_fn else None,
                )
            )
        col.insert(docs)
    return time.time() - t0


# ---------------------------------------------------------------------------
# Config #3: cosine HNSW int8 (GloVe-100 shape)
# ---------------------------------------------------------------------------


def stage_int8_hnsw():
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        HnswIndexParam,
        HnswQueryParam,
        MetricType,
        QuantizeType,
        VectorSchema,
    )

    n = int(os.environ.get("SUITE_N_HNSW", 200_000))
    d, nq, k = 100, 1024, 10
    rng = np.random.default_rng(SEED)
    # GloVe-like: heavy-tailed coordinates, clustered directions
    kc = max(16, n // 10_000)
    centers = rng.standard_normal((kc, d)).astype(np.float32) * 3.0
    asn = rng.integers(0, kc, n)
    X = (centers[asn] + rng.standard_normal((n, d)).astype(np.float32)).astype(
        np.float32
    )
    Q = (
        centers[rng.integers(0, kc, nq)]
        + rng.standard_normal((nq, d)).astype(np.float32)
    ).astype(np.float32)

    # exact cosine ground truth (host numpy)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    gt_q = 256
    gt = np.argsort(-(Qn[:gt_q] @ Xn.T), axis=1)[:, :k]

    path = os.path.join(WORK, "int8_hnsw")
    shutil.rmtree(path, ignore_errors=True)
    schema = CollectionSchema(
        "glove_like",
        vectors=[
            VectorSchema(
                "vec",
                DataType.VECTOR_FP32,
                d,
                HnswIndexParam(
                    MetricType.COSINE, m=50, ef_construction=500,
                    quantize_type=QuantizeType.INT8,
                ),
            )
        ],
    )
    col = zvec_tpu.create_and_open(path, schema)
    ids = [str(i) for i in range(n)]
    insert_s = batch_insert(col, ids, "vec", X)
    t0 = time.time()
    col.optimize()
    col.flush()
    build_s = time.time() - t0
    log(f"int8 hnsw: insert {insert_s:.0f}s build {build_s:.0f}s")

    row = {"n": n, "dim": d, "metric": "cosine", "quantize": "int8",
           "insert_secs": round(insert_s, 1), "build_secs": round(build_s, 1),
           "ef": {}}
    for ef in (32, 64, 128):
        # raw int8 scores vs refined (r3: refine-by-default on quantized
        # indexes — None param refines; is_using_refiner=False opts out)
        for label, p in (
            ("raw", HnswQueryParam(ef=ef, is_using_refiner=False)),
            ("refined", HnswQueryParam(ef=ef)),
        ):
            col.batch_query("vec", Q, topk=k, output_fields=[], param=p)
            col.batch_query("vec", Q, topk=k, output_fields=[], param=p)
            t0 = time.perf_counter()
            docs = col.batch_query("vec", Q, topk=k, output_fields=[], param=p)
            dt = time.perf_counter() - t0
            hits = sum(
                len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
                for i in range(gt_q)
            )
            cell = {
                "recall_at_10": round(hits / (gt_q * k), 4),
                "qps": round(nq / dt, 1),
            }
            if label == "raw":
                row["ef"][ef] = dict(cell)
            else:
                row["ef"][ef]["refined"] = cell
            log(f"  ef={ef} {label}: {cell}")
    col._impl.close()
    merge_results("int8_hnsw_cosine", row)


# ---------------------------------------------------------------------------
# Config #4: IVF + hybrid filters (Deep-like shape)
# ---------------------------------------------------------------------------


def stage_ivf_hybrid():
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        FieldSchema,
        IVFIndexParam,
        IVFQueryParam,
        MetricType,
        VectorSchema,
    )
    from zvec_tpu.model.param.param import InvertIndexParam

    n = int(os.environ.get("SUITE_N_IVF", 1_000_000))
    d, nq, k = 96, 1024, 10
    rng = np.random.default_rng(SEED + 1)
    # clustered data (Deep-like): IVF partitions cluster structure; isotropic
    # gaussian noise has none and caps every IVF implementation's recall
    from benchmarks.h2h import make_data

    X, Q = make_data("clustered", n, d, nq=nq)
    tags = rng.integers(0, 10, n)  # 'tag = tN' selects ~10%
    price = rng.random(n)

    path = os.path.join(WORK, "ivf_hybrid")
    shutil.rmtree(path, ignore_errors=True)
    schema = CollectionSchema(
        "deep_like",
        fields=[
            FieldSchema("tag", DataType.STRING, index_param=InvertIndexParam()),
            FieldSchema("price", DataType.DOUBLE),
        ],
        vectors=[
            VectorSchema(
                "vec",
                DataType.VECTOR_FP32,
                d,
                IVFIndexParam(MetricType.L2, use_soar=True),
            )
        ],
    )
    col = zvec_tpu.create_and_open(path, schema)
    ids = [str(i) for i in range(n)]
    insert_s = batch_insert(
        col, ids, "vec", X,
        fields_fn=lambda i: {"tag": f"t{tags[i]}", "price": float(price[i])},
    )
    t0 = time.time()
    col.optimize()
    col.flush()
    build_s = time.time() - t0
    log(f"ivf hybrid: insert {insert_s:.0f}s build/train {build_s:.0f}s")

    # filtered exact ground truth: tag = 't3' AND price < 0.5  (~5% of rows)
    flt = "tag = 't3' AND price < 0.5"
    sel = (tags == 3) & (price < 0.5)
    sel_idx = np.flatnonzero(sel)
    gt_q = 128
    d2 = (
        (Q[:gt_q] ** 2).sum(1)[:, None]
        + (X[sel_idx] ** 2).sum(1)[None, :]
        - 2.0 * (Q[:gt_q] @ X[sel_idx].T)
    )
    gt = sel_idx[np.argsort(d2, axis=1)[:, :k]]

    # unfiltered exact ground truth (measures the IVF probe path itself; the
    # 5%-selectivity filter below demotes to brute-force-by-keys, reference
    # `doc_filter.cc:120-122`)
    d2u = (
        (Q[:gt_q] ** 2).sum(1)[:, None]
        + (X**2).sum(1)[None, :]
        - 2.0 * (Q[:gt_q] @ X.T)
    )
    gtu = np.argsort(d2u, axis=1)[:, :k]

    row = {"n": n, "dim": d, "metric": "l2", "filter": flt,
           "selectivity": round(float(sel.mean()), 4),
           "insert_secs": round(insert_s, 1), "build_secs": round(build_s, 1),
           "nprobe": {}, "filtered": {}}
    for nprobe in (8, 16, 32, 64):
        p = IVFQueryParam(nprobe=nprobe)
        col.batch_query("vec", Q, topk=k, output_fields=[], param=p)
        col.batch_query("vec", Q, topk=k, output_fields=[], param=p)
        t0 = time.perf_counter()
        docs = col.batch_query("vec", Q, topk=k, output_fields=[], param=p)
        dt = time.perf_counter() - t0
        hits = sum(
            len({int(h.id) for h in docs[i]} & set(gtu[i].tolist()))
            for i in range(gt_q)
        )
        row["nprobe"][nprobe] = {
            "recall_at_10": round(hits / (gt_q * k), 4),
            "qps": round(nq / dt, 1),
        }
        log(f"  nprobe={nprobe} (unfiltered): {row['nprobe'][nprobe]}")
    # filtered path: 5% selectivity demotes to the masked exact device scan
    col.batch_query("vec", Q, topk=k, filter=flt, output_fields=[])
    col.batch_query("vec", Q, topk=k, filter=flt, output_fields=[])
    t0 = time.perf_counter()
    docs = col.batch_query("vec", Q, topk=k, filter=flt, output_fields=[])
    dt = time.perf_counter() - t0
    hits = sum(
        len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
        for i in range(gt_q)
    )
    row["filtered"] = {
        "recall_at_10": round(hits / (gt_q * k), 4),
        "qps": round(nq / dt, 1),
        "path": "brute_force_by_keys (masked exact device scan)",
    }
    log(f"  filtered 5%: {row['filtered']}")
    col._impl.close()
    merge_results("ivf_hybrid_filter", row)


# ---------------------------------------------------------------------------
# Config #5: dense + sparse multi-vector fusion (single call, RRF merge)
# ---------------------------------------------------------------------------


def stage_fusion():
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        FlatIndexParam,
        MetricType,
        RrfReRanker,
        VectorQuery,
        VectorSchema,
    )

    n = int(os.environ.get("SUITE_N_FUSION", 100_000))
    d, k, vocab, nnz = 64, 10, 30_000, 24
    rng = np.random.default_rng(SEED + 2)
    X = rng.standard_normal((n, d), dtype=np.float32)

    def rand_sparse(m):
        dims = rng.choice(vocab, nnz, replace=False)
        vals = (rng.random(nnz) + 0.1).astype(np.float32)
        return {int(a): float(b) for a, b in zip(dims, vals)}

    SV = [rand_sparse(i) for i in range(n)]

    path = os.path.join(WORK, "fusion")
    shutil.rmtree(path, ignore_errors=True)
    schema = CollectionSchema(
        "fusion",
        vectors=[
            VectorSchema("dense", DataType.VECTOR_FP32, d, FlatIndexParam(MetricType.COSINE)),
            VectorSchema(
                "sparse", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP)
            ),
        ],
    )
    col = zvec_tpu.create_and_open(path, schema)
    ids = [str(i) for i in range(n)]
    insert_s = batch_insert(
        col, ids, "dense", X, extra_vecs_fn=lambda i: {"sparse": SV[i]}
    )
    t0 = time.time()
    col.optimize()
    col.flush()
    build_s = time.time() - t0
    log(f"fusion: insert {insert_s:.0f}s seal {build_s:.0f}s")

    nq = 64
    qd = rng.standard_normal((nq, d), dtype=np.float32)
    qs = [rand_sparse(0) for _ in range(nq)]
    rr = RrfReRanker()

    def fused(i):
        return col.query(
            [
                VectorQuery("dense", vector=qd[i]),
                VectorQuery("sparse", vector=qs[i]),
            ],
            topk=k,
            reranker=rr,
            output_fields=[],
        )

    fused(0)  # warm both engines
    fused(1)
    lats = []
    t_all = time.perf_counter()
    for i in range(nq):
        t0 = time.perf_counter()
        docs = fused(i)
        lats.append(time.perf_counter() - t0)
        assert len(docs) == k
    total = time.perf_counter() - t_all
    lat_ms = np.array(lats) * 1e3

    # batched fusion: all queries per field in one device dispatch, rerank
    # on host (the throughput shape — Collection.batch_fused_query)
    groups = [
        [VectorQuery("dense", vector=qd[i]), VectorQuery("sparse", vector=qs[i])]
        for i in range(nq)
    ]
    col.batch_fused_query(groups, topk=k, reranker=rr, output_fields=[])  # warm
    t0 = time.perf_counter()
    batched = col.batch_fused_query(groups, topk=k, reranker=rr, output_fields=[])
    batched_total = time.perf_counter() - t0
    assert all(len(b) == k for b in batched)

    # sanity: fused top-k must overlap the dense-only and sparse-only top-k
    dense_only = {h.id for h in col.query(VectorQuery("dense", vector=qd[0]), topk=k)}
    fused_ids = {h.id for h in fused(0)}
    row = {
        "n": n, "dim_dense": d, "vocab": vocab, "nnz": nnz,
        "insert_secs": round(insert_s, 1), "build_secs": round(build_s, 1),
        "fused_qps": round(nq / total, 1),
        "batched_fused_qps": round(nq / batched_total, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "dense_overlap_at_10": len(dense_only & fused_ids),
    }
    log(f"  fusion: {row}")
    col._impl.close()
    merge_results("dense_sparse_fusion", row)


STAGES = {
    "int8_hnsw": stage_int8_hnsw,
    "ivf_hybrid": stage_ivf_hybrid,
    "fusion": stage_fusion,
}
RESULT_KEYS = {
    "int8_hnsw": "int8_hnsw_cosine",
    "ivf_hybrid": "ivf_hybrid_filter",
    "fusion": "dense_sparse_fusion",
}


def _fresh(key: str, max_age_s: float = 12 * 3600) -> bool:
    """True if RESULTS already holds a measurement for `key` younger than
    max_age_s — lets an interrupted/restarted chain skip completed stages
    (set SUITE_FORCE=1 to re-measure)."""
    if os.environ.get("SUITE_FORCE") == "1" or not os.path.exists(RESULTS):
        return False
    try:
        row = json.load(open(RESULTS)).get(key)
        ts = time.mktime(time.strptime(row["measured_at"], "%Y-%m-%d %H:%M:%S"))
        return (time.time() - ts) < max_age_s
    except Exception:
        return False


def main():
    os.makedirs(WORK, exist_ok=True)
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(STAGES)
    for name in names:
        key = RESULT_KEYS.get(name, name)
        if _fresh(key):
            log(f"=== stage {name} === (fresh result in suite_results.json, skip)")
            continue
        log(f"=== stage {name} ===")
        STAGES[name]()


if __name__ == "__main__":
    main()
