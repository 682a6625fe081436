"""Head-to-head harness: zvec_tpu vs the reference zvec core engine.

The reference C++ core tools (txt2vecs / local_builder / recall / bench, from
`/root/reference/tools/core/`) are built out-of-tree by
`benchmarks/refshim/build_ref.sh` with small header shims for the absent
vendored third-parties (gflags / yaml-cpp / magic_enum / sparsehash /
roaring — their submodules are EMPTY in this container; see each shim header).
Both systems run on IDENTICAL data with IDENTICAL graph parameters
(M=50 upper / 100 L0, ef_construction=500 — the shared defaults,
`hnsw_entity.h:500-503`).

Build path: local_builder drives HnswStreamer directly (BuilderCommon YAML);
recall/bench load the dump through the core_interface facade (IndexCommon
YAML + IndexConfig/QueryParam JSON — `tools/core/helper.h:63`).

Usage:
    bash benchmarks/refshim/build_ref.sh
    python benchmarks/h2h.py gen --kind gaussian --n 30000 --dim 128
    python benchmarks/h2h.py ref-build --kind gaussian --n 30000 --dim 128
    python benchmarks/h2h.py ref-recall --kind gaussian --n 30000 --dim 128 --ef 64
    python benchmarks/h2h.py ref-bench --kind gaussian --n 30000 --dim 128 --ef 64
    python benchmarks/h2h.py tpu-recall --kind gaussian --n 30000 --dim 128 --ef 64

Work dir: /tmp/h2h (datasets are regenerated deterministically from seed).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

WORK = os.environ.get("H2H_DIR", "/tmp/h2h")
REF_BIN = os.environ.get("REF_BIN", "/tmp/refbuild/bin")
SEED = 1234


def dataset_name(kind: str, n: int, dim: int) -> str:
    return f"{kind}_{n}_{dim}"


def make_data(kind: str, n: int, dim: int, nq: int = 1000):
    rng = np.random.default_rng(SEED)
    if kind == "gaussian":
        X = rng.standard_normal((n, dim)).astype(np.float32)
        Q = rng.standard_normal((nq, dim)).astype(np.float32)
    elif kind == "clustered":
        # the round-1 recall-guard generator: well-separated centers + noise
        k = max(32, n // 10_000)
        centers = rng.standard_normal((k, dim)).astype(np.float32) * 5.0
        asn = rng.integers(0, k, n)
        X = centers[asn] + rng.standard_normal((n, dim)).astype(np.float32)
        qn = rng.integers(0, k, nq)
        Q = centers[qn] + rng.standard_normal((nq, dim)).astype(np.float32)
    else:
        raise ValueError(kind)
    return X, Q


def exact_gt(X: np.ndarray, Q: np.ndarray, k: int = 100) -> np.ndarray:
    """Blocked exact L2 ground truth (host numpy, fp64 accumulate)."""
    gt = np.zeros((Q.shape[0], k), dtype=np.int64)
    xn = (X.astype(np.float64) ** 2).sum(1)
    for i in range(0, Q.shape[0], 64):
        q = Q[i : i + 64].astype(np.float64)
        d = (q**2).sum(1)[:, None] + xn[None, :] - 2.0 * (q @ X.astype(np.float64).T)
        gt[i : i + 64] = np.argpartition(d, k, axis=1)[:, :k]
        # order the partition
        part = np.take_along_axis(d, gt[i : i + 64], axis=1)
        order = np.argsort(part, axis=1)
        gt[i : i + 64] = np.take_along_axis(gt[i : i + 64], order, axis=1)
    return gt


def write_txt(path: str, mat: np.ndarray) -> None:
    with open(path, "w") as fh:
        for i, row in enumerate(mat):
            fh.write(str(i) + ";" + " ".join(f"{v:.6f}" for v in row) + "\n")


def cmd_gen(args):
    os.makedirs(WORK, exist_ok=True)
    name = dataset_name(args.kind, args.n, args.dim)
    X, Q = make_data(args.kind, args.n, args.dim, args.nq)
    np.save(f"{WORK}/{name}_base.npy", X)
    np.save(f"{WORK}/{name}_query.npy", Q)
    if not args.no_gt:
        gt = exact_gt(X, Q)
        np.save(f"{WORK}/{name}_gt.npy", gt)
        with open(f"{WORK}/{name}_gt.txt", "w") as fh:
            for i in range(gt.shape[0]):
                fh.write(str(i) + ";" + " ".join(str(int(v)) for v in gt[i]) + "\n")
    if args.npy_only:
        # tpu-recall only needs the npy triplet; skip the text dump + the
        # reference txt2vecs conversion (which needs /tmp/refbuild binaries)
        print(f"generated {name} (base/query/gt npy only)")
        return
    write_txt(f"{WORK}/{name}_base.txt", X)
    write_txt(f"{WORK}/{name}_query.txt", Q)
    subprocess.run(
        [
            f"{REF_BIN}/txt2vecs",
            "--input", f"{WORK}/{name}_base.txt",
            "--output", f"{WORK}/{name}.vecs",
            "--type", "float",
            "--method", "L2",
            "--dimension", str(args.dim),
        ],
        check=True,
        stdout=subprocess.DEVNULL,
    )
    print(f"generated {name} (base/query/gt npy+txt, .vecs)")


def cmd_ref_build(args):
    name = dataset_name(args.kind, args.n, args.dim)
    if args.index == "flat":
        builder = "FlatStreamer"
        params = f"    proxima.general.builder.thread_count: !!int {args.threads}\n"
        suffix = ".flat"
    else:
        builder = "HnswStreamer"
        params = (
            f"    proxima.hnsw.streamer.max_neighbor_count: !!int {args.m}\n"
            f"    proxima.hnsw.streamer.efconstruction: !!int {args.efc}\n"
            f"    proxima.general.builder.thread_count: !!int {args.threads}\n"
        )
        suffix = ""
    cfg = f"""BuilderCommon:
    BuilderClass: {builder}
    BuildFile: {WORK}/{name}.vecs
    NeedTrain: false
    DumpPath: {WORK}/{name}{suffix}.dump.index
    IndexPath: {WORK}/{name}{suffix}.index
    MetricName: SquaredEuclidean
    ThreadCount: {args.threads}

BuilderParams:
{params}"""
    cfg_path = f"{WORK}/{name}{suffix}_build.yaml"
    with open(cfg_path, "w") as fh:
        fh.write(cfg)
    t0 = time.time()
    subprocess.run([f"{REF_BIN}/local_builder", cfg_path], check=True)
    dt = time.time() - t0
    print(json.dumps({"ref_build_secs": round(dt, 1), "dataset": name}))


INDEX_CONFIG = (
    '{{"use_id_map":false,"data_type":"DT_FP32","dimension":{dim},'
    '"index_type":"{itype}","metric_type":"kL2sq"}}'
)


def _index_bits(args):
    """(IndexConfig json, QueryParam json, index-file suffix) per index."""
    if args.index == "flat":
        return (
            INDEX_CONFIG.format(dim=args.dim, itype="kFlat"),
            '{"index_type":"kFlat"}',
            ".flat",
        )
    return (
        INDEX_CONFIG.format(dim=args.dim, itype="kHNSW"),
        f'{{"ef_search":{args.ef},"index_type":"kHNSW"}}',
        "",
    )


def cmd_ref_recall(args):
    name = dataset_name(args.kind, args.n, args.dim)
    icfg, qparam, suffix = _index_bits(args)
    cfg = f"""IndexCommon:
    IndexPath: {WORK}/{name}{suffix}.index
    IndexConfig: '{icfg}'
    QueryFile: {WORK}/{name}_query.txt
    QueryType: float
    GroundTruthFile: {WORK}/{name}_gt.txt
    CompareById: true
    RecallThreadCount: !!int {args.threads}
    TopK: {args.topk_list}
    RetrievalMode: Dense

QueryConfig:
    QueryParam: '{qparam}'
"""
    cfg_path = f"{WORK}/{name}_recall_ef{args.ef}.yaml"
    with open(cfg_path, "w") as fh:
        fh.write(cfg)
    out = subprocess.run(
        [f"{REF_BIN}/recall", cfg_path], check=True, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("Recall@") or line.startswith("Process query"):
            print(line)


def cmd_ref_bench(args):
    name = dataset_name(args.kind, args.n, args.dim)
    icfg, qparam, suffix = _index_bits(args)
    cfg = f"""IndexCommon:
    IndexPath: {WORK}/{name}{suffix}.index
    IndexConfig: '{icfg}'
    QueryFile: {WORK}/{name}_query.txt
    QueryType: float
    TopK: {args.topk}
    RetrievalMode: Dense
    BenchThreadCount: !!int {args.threads}
    BenchSecs: !!int {args.secs}

QueryConfig:
    QueryParam: '{qparam}'
"""
    cfg_path = f"{WORK}/{name}_bench_ef{args.ef}.yaml"
    with open(cfg_path, "w") as fh:
        fh.write(cfg)
    out = subprocess.run(
        [f"{REF_BIN}/bench", cfg_path], check=True, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if "qps" in line or "Percentile" in line or "Process query" in line:
            print(line)


def cmd_tpu_recall(args):
    name = dataset_name(args.kind, args.n, args.dim)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType

    X = np.load(f"{WORK}/{name}_base.npy")
    Q = np.load(f"{WORK}/{name}_query.npy")
    gt = np.load(f"{WORK}/{name}_gt.npy")
    engine = HnswEngine(
        MetricType.L2,
        X.shape[1],
        HnswIndexParam(
            MetricType.L2,
            m=args.m,
            ef_construction=args.efc,
            knn_k=args.knn_k,
            prune_alpha=args.prune_alpha,
            backfill_alpha=args.backfill_alpha,
        ),
    )
    engine.bind_data(lambda: X, lambda: 1)
    t0 = time.time()
    engine.search(Q[:1], 1, param=HnswQueryParam(ef=args.ef))  # force build
    build_secs = time.time() - t0
    efs = [int(e) for e in args.ef_sweep.split(",")] if args.ef_sweep else [args.ef]
    for ef in efs:
        t0 = time.time()
        sims, idx = engine.search(Q, 10, param=HnswQueryParam(ef=ef))
        search_secs = time.time() - t0
        hits = sum(
            len(set(idx[i][idx[i] >= 0]) & set(gt[i, :10])) for i in range(len(Q))
        )
        print(
            json.dumps(
                {
                    "dataset": name,
                    "ef": ef,
                    "recall_at_10": round(hits / (len(Q) * 10), 4),
                    "build_secs": round(build_secs, 1),
                    "batch_search_secs": round(search_secs, 2),
                    "qps_batch": round(len(Q) / search_secs, 1),
                }
            ),
            flush=True,
        )


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for c in ("gen", "ref-build", "ref-recall", "ref-bench", "tpu-recall"):
        sp = sub.add_parser(c)
        sp.add_argument("--kind", default="gaussian")
        sp.add_argument("--n", type=int, default=30000)
        sp.add_argument("--dim", type=int, default=128)
        sp.add_argument("--nq", type=int, default=1000)
        sp.add_argument("--m", type=int, default=50)
        sp.add_argument("--efc", type=int, default=500)
        sp.add_argument("--ef", type=int, default=64)
        sp.add_argument("--topk", type=int, default=10)
        sp.add_argument("--topk_list", default="1,10")
        sp.add_argument("--ef-sweep", default="", dest="ef_sweep")
        sp.add_argument("--knn-k", type=int, default=None, dest="knn_k")
        sp.add_argument("--prune-alpha", type=float, default=1.0, dest="prune_alpha")
        sp.add_argument(
            "--backfill-alpha", type=float, default=0.0, dest="backfill_alpha"
        )
        sp.add_argument("--threads", type=int, default=1)
        sp.add_argument("--secs", type=int, default=20)
        sp.add_argument("--cpu", action="store_true")
        sp.add_argument("--index", default="hnsw", choices=("hnsw", "flat"))
        sp.add_argument("--no-gt", action="store_true", dest="no_gt")
        sp.add_argument("--npy-only", action="store_true", dest="npy_only")
    args = p.parse_args()
    {
        "gen": cmd_gen,
        "ref-build": cmd_ref_build,
        "ref-recall": cmd_ref_recall,
        "ref-bench": cmd_ref_bench,
        "tpu-recall": cmd_tpu_recall,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
