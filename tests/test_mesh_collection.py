"""Collection-level mesh sharding through the PUBLIC API on the 8-device
virtual CPU mesh: sealed FLAT segment codes are corpus-sharded and every
query fans out over the mesh with a per-shard top-k all_gather merge.

TPU-native analog of the reference's per-segment plan union
(`/root/reference/src/db/sqlengine/planner/query_planner.cc:344-448`).
"""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.model.param.param import FlatIndexParam
from zvec_tpu.typing import MetricType
from zvec_tpu.utils.config import GlobalConfig


@pytest.fixture
def mesh8(monkeypatch):
    monkeypatch.setattr(GlobalConfig.instance(), "mesh_devices", 8)
    yield
    # engine-level mesh cache keys on device count; nothing to clear


def _mk_collection(tmp_path, metric, n, d, rng):
    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        name="meshcol",
        fields=[FieldSchema("tag", DataType.INT64)],
        vectors=[
            VectorSchema("emb", DataType.VECTOR_FP32, d, FlatIndexParam(metric))
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshcol"), schema)
    docs = [
        Doc(id=f"pk{i}", fields={"tag": int(i % 7)}, vectors={"emb": X[i]})
        for i in range(n)
    ]
    for i in range(0, n, 1000):
        col.insert(docs[i : i + 1000])
    col.flush()
    col.optimize()  # seal -> FLAT engine binds corpus-sharded codes
    return col, X


def test_sharded_flat_collection_matches_oracle(tmp_path, rng, mesh8):
    n, d = 5000, 24
    col, X = _mk_collection(tmp_path, MetricType.L2, n, d, rng)
    seg_codes = None
    Q = rng.standard_normal((4, d)).astype(np.float32)
    for qi in range(4):
        res = col.query(VectorQuery("emb", vector=Q[qi]), topk=10)
        got = [int(doc.id[2:]) for doc in res]
        d2 = ((X - Q[qi]) ** 2).sum(1)
        oracle = np.argsort(d2, kind="stable")[:10]
        assert set(got) == set(int(v) for v in oracle)
        # L2 score convention: squared distance ascending
        scores = [doc.score for doc in res]
        assert scores == sorted(scores)
        np.testing.assert_allclose(scores[0], d2[oracle[0]], rtol=1e-4)
    del seg_codes


def test_sharded_flat_engine_is_actually_sharded(tmp_path, rng, mesh8):
    import jax

    n, d = 3000, 16
    col, X = _mk_collection(tmp_path, MetricType.IP, n, d, rng)
    impl = col._impl
    seg = impl.segments[0]
    eng = seg.engine_for("emb")
    eng._ensure_fresh()
    sharding = eng._codes.sharding
    assert len(sharding.device_set) == 8, sharding
    q = rng.standard_normal((1, d)).astype(np.float32)
    res = col.query(VectorQuery("emb", vector=q[0]), topk=5)
    dots = X @ q[0]
    oracle = np.argsort(-dots, kind="stable")[:5]
    assert {int(doc.id[2:]) for doc in res} == {int(v) for v in oracle}


def test_sharded_filtered_query(tmp_path, rng, mesh8):
    n, d = 4000, 16
    col, X = _mk_collection(tmp_path, MetricType.L2, n, d, rng)
    q = rng.standard_normal(d).astype(np.float32)
    res = col.query(VectorQuery("emb", vector=q), topk=10, filter="tag = 3")
    assert len(res) == 10
    assert all(int(doc.id[2:]) % 7 == 3 for doc in res)
    d2 = ((X - q) ** 2).sum(1)
    eligible = np.arange(n)[np.arange(n) % 7 == 3]
    oracle = eligible[np.argsort(d2[eligible], kind="stable")[:10]]
    assert {int(doc.id[2:]) for doc in res} == {int(v) for v in oracle}


def test_sharded_delete_and_requery(tmp_path, rng, mesh8):
    n, d = 2000, 16
    col, X = _mk_collection(tmp_path, MetricType.L2, n, d, rng)
    q = rng.standard_normal(d).astype(np.float32)
    first = col.query(VectorQuery("emb", vector=q), topk=3)
    col.delete([doc.id for doc in first])
    second = col.query(VectorQuery("emb", vector=q), topk=3)
    assert not ({doc.id for doc in first} & {doc.id for doc in second})


@pytest.mark.parametrize("qt_name", ["INT8", "INT4"])
def test_sharded_quantized_flat(tmp_path, rng, mesh8, qt_name):
    """Quantized codes (int8 / nibble-packed int4) corpus-shard across the
    mesh and score with the dequant epilogue inside each shard."""
    from zvec_tpu.typing import QuantizeType

    qt = QuantizeType[qt_name]
    n, d = 4096, 16
    X = rng.standard_normal((n, d)).astype(np.float32) * 1.5
    schema = CollectionSchema(
        name="meshq",
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, d,
                FlatIndexParam(MetricType.L2, quantize_type=qt),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshq"), schema)
    for i in range(0, n, 1000):
        col.insert(
            [Doc(id=f"pk{j}", vectors={"emb": X[j]}) for j in range(i, min(i + 1000, n))]
        )
    col.flush()
    col.optimize()

    # oracle over the engine's own dequantized codes
    seg = col._impl.segments[0]
    eng = seg.engine_for("emb")
    eng._ensure_fresh()
    st = eng._st
    codes = np.asarray(st.codes)
    if st.int4_packed:
        from zvec_tpu.ops.quantize import unpack_int4

        codes = unpack_int4(codes, d)
    deq = codes[:n].astype(np.float32) * float(st.dequant[0]) + float(st.dequant[1])

    q = rng.standard_normal(d).astype(np.float32)

    # default path: quantized indexes refine against exact fp32 by default
    # (reference full-precision refine block pairing, `segment.cc:1591-1700`)
    docs = col.query(VectorQuery("emb", vector=q), topk=10)
    exact = np.argsort(((X - q) ** 2).sum(1))[:10]
    got = [d_.id for d_ in docs]
    assert len(set(got) & {f"pk{i}" for i in exact}) >= 9, (got, exact)

    # opt-out path: raw quantized scores must match the dequant oracle
    from zvec_tpu.model.param.param import FlatQueryParam

    docs = col.query(
        VectorQuery(
            "emb", vector=q, param=FlatQueryParam(is_using_refiner=False)
        ),
        topk=10,
    )
    d2 = ((deq - q) ** 2).sum(1)
    exp = np.argsort(d2)[:10]
    got = [d_.id for d_ in docs]
    assert len(set(got) & {f"pk{i}" for i in exp}) >= 9, (got, exp)


# ---------------- mesh-sharded HNSW ----------------


def _mk_hnsw_collection(tmp_path, metric, n, d, rng, m=16, efc=100):
    from zvec_tpu.model.param.param import HnswIndexParam

    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        name="meshhnsw",
        fields=[FieldSchema("tag", DataType.INT64)],
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, d,
                HnswIndexParam(metric, m=m, ef_construction=efc),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshhnsw"), schema)
    docs = [
        Doc(id=f"pk{i}", fields={"tag": int(i % 7)}, vectors={"emb": X[i]})
        for i in range(n)
    ]
    for i in range(0, n, 1000):
        col.insert(docs[i : i + 1000])
    col.flush()
    col.optimize()  # seal -> per-shard subgraphs over the corpus mesh
    return col, X


def test_sharded_hnsw_collection_recall(tmp_path, rng, mesh8):
    from zvec_tpu.model.param.param import HnswQueryParam

    n, d = 4096, 24
    col, X = _mk_hnsw_collection(tmp_path, MetricType.L2, n, d, rng)
    eng = col._impl.segments[0].engine_for("emb")
    eng._ensure_fresh()
    assert eng._dev.get("sharded"), "expected a mesh-sharded HNSW graph"
    assert len(eng._codes.sharding.device_set) == 8
    Q = rng.standard_normal((8, d)).astype(np.float32)
    d2 = ((Q[:, None, :] - X[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    docs = col.batch_query(
        "emb", Q, topk=10, output_fields=[], param=HnswQueryParam(ef=128)
    )
    hits = 0
    for i in range(len(Q)):
        got = {int(doc.id[2:]) for doc in docs[i]}
        hits += len(got & set(gt[i].tolist()))
    assert hits / (len(Q) * 10) >= 0.95
    # score convention: L2 squared ascending
    top = docs[0][0]
    assert abs(top.score - d2[0][int(top.id[2:])]) < 1e-2


def test_sharded_hnsw_filtered_and_reopen(tmp_path, rng, mesh8):
    from zvec_tpu.model.param.param import HnswQueryParam

    n, d = 2048, 16
    col, X = _mk_hnsw_collection(tmp_path, MetricType.L2, n, d, rng)
    q = X[33] + 0.01
    # hostile filter: tag excludes most rows; safety net must fill topk
    res = col.query(
        VectorQuery("emb", vector=q, param=HnswQueryParam(ef=32)),
        topk=5,
        filter="tag = 3",
    )
    assert len(res) == 5
    assert all(int(r.id[2:]) % 7 == 3 for r in res)
    d2 = ((X - q) ** 2).sum(1)
    cand = np.flatnonzero(np.arange(n) % 7 == 3)
    expect = {int(i) for i in cand[np.argsort(d2[cand])[:5]]}
    assert {int(r.id[2:]) for r in res} == expect
    # reopen: sharded graphs reload from the aux dump (no rebuild)
    path = col.path
    col._impl.close()
    col2 = zvec_tpu.open(path)
    eng = col2._impl.segments[0].engine_for("emb")
    eng._ensure_fresh()
    assert eng._dev.get("sharded")
    assert eng._shard_graphs is not None
    res2 = col2.query(VectorQuery("emb", vector=q), topk=3)
    assert res2[0].id == "pk33"
    col2._impl.close()


def test_sharded_hnsw_ip_metric(tmp_path, rng, mesh8):
    from zvec_tpu.model.param.param import HnswQueryParam

    n, d = 2048, 16
    col, X = _mk_hnsw_collection(tmp_path, MetricType.IP, n, d, rng)
    Q = rng.standard_normal((4, d)).astype(np.float32)
    dots = Q @ X.T
    gt = np.argsort(-dots, axis=1)[:, :10]
    docs = col.batch_query(
        "emb", Q, topk=10, output_fields=[], param=HnswQueryParam(ef=128)
    )
    hits = 0
    for i in range(len(Q)):
        got = {int(doc.id[2:]) for doc in docs[i]}
        hits += len(got & set(gt[i].tolist()))
    assert hits / (len(Q) * 10) >= 0.9
    # IP score convention: dot product descending
    top = docs[0][0]
    assert abs(top.score - dots[0, int(top.id[2:])]) < 1e-2


def test_sharded_hnsw_cosine_metric(tmp_path, rng, mesh8):
    from zvec_tpu.model.param.param import HnswQueryParam

    n, d = 2048, 16
    col, X = _mk_hnsw_collection(tmp_path, MetricType.COSINE, n, d, rng)
    Q = rng.standard_normal((4, d)).astype(np.float32)
    cos = (Q @ X.T) / (
        np.linalg.norm(Q, axis=1)[:, None] * np.linalg.norm(X, axis=1)[None]
    )
    gt = np.argsort(-cos, axis=1)[:, :10]
    docs = col.batch_query(
        "emb", Q, topk=10, output_fields=[], param=HnswQueryParam(ef=128)
    )
    hits = 0
    for i in range(len(Q)):
        got = {int(doc.id[2:]) for doc in docs[i]}
        hits += len(got & set(gt[i].tolist()))
    assert hits / (len(Q) * 10) >= 0.9
    # COSINE score convention: 1 - cos, ascending
    top = docs[0][0]
    assert abs(top.score - (1.0 - cos[0, int(top.id[2:])])) < 1e-3


def test_sharded_hnsw_empty_shards_no_phantom_hits(tmp_path, rng, mesh8):
    """n=1030 over 8 shards (R=256) leaves shards 5-7 EMPTY: their entry row
    is a zero-padding code whose IP score (dot=0) beats all-negative real
    dots — the resident validity mask must keep padding ids out of results."""
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam

    n, d = 1030, 16
    # all-positive data + all-negative query => every real dot is negative,
    # so the padding row's dot=0 would win without the validity mask
    X = (rng.standard_normal((n, d)) + 5.0).astype(np.float32)
    schema = CollectionSchema(
        "phantom",
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, d,
                HnswIndexParam(MetricType.IP, m=8, ef_construction=50),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "phantom"), schema)
    for lo in range(0, n, 1000):
        col.insert(
            [Doc(id=f"pk{i}", vectors={"emb": X[i]}) for i in range(lo, min(lo + 1000, n))]
        )
    col.flush()
    col.optimize()
    eng = col._impl.segments[0].engine_for("emb")
    eng._ensure_fresh()
    assert eng._dev.get("sharded")
    q = -np.ones(d, np.float32)
    dots = X @ q
    assert (dots < 0).all()
    docs = col.query(
        VectorQuery("emb", vector=q, param=HnswQueryParam(ef=64)), topk=10
    )
    assert len(docs) == 10
    for doc in docs:
        i = int(doc.id[2:])
        assert 0 <= i < n, f"phantom padding id {doc.id}"
    assert int(docs[0].id[2:]) == int(np.argmax(dots))


def test_sharded_hnsw_int8(tmp_path, rng, mesh8):
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import QuantizeType

    n, d = 2048, 16
    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        name="meshq",
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, d,
                HnswIndexParam(
                    MetricType.L2, m=16, ef_construction=100,
                    quantize_type=QuantizeType.INT8,
                ),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshq"), schema)
    for lo in range(0, n, 1024):
        col.insert(
            [Doc(id=f"q{i}", vectors={"emb": X[i]}) for i in range(lo, min(lo + 1024, n))]
        )
    col.flush()
    col.optimize()
    eng = col._impl.segments[0].engine_for("emb")
    eng._ensure_fresh()
    assert eng._dev.get("sharded") and eng._dequant is not None
    Q = rng.standard_normal((4, d)).astype(np.float32)
    d2 = ((Q[:, None, :] - X[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    docs = col.batch_query(
        "emb", Q, topk=10, output_fields=[], param=HnswQueryParam(ef=128)
    )
    hits = 0
    for i in range(len(Q)):
        got = {int(doc.id[1:]) for doc in docs[i]}
        hits += len(got & set(gt[i].tolist()))
    # int8 codes: allow quantization slack
    assert hits / (len(Q) * 10) >= 0.8, hits / (len(Q) * 10)


def test_sharded_ivf_collection_recall(tmp_path, rng, mesh8):
    """IVF virtual lists shard over the mesh; per-shard top-nprobe union ⊇
    the global top-nprobe, merged over ICI (`sharded_ivf_probe`)."""
    from zvec_tpu.model.param.param import IVFIndexParam, IVFQueryParam

    n, d = 6000, 24
    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        name="meshivf",
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, d,
                IVFIndexParam(MetricType.L2, n_list=64, n_iters=5),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshivf"), schema)
    for lo in range(0, n, 1000):
        col.insert(
            [Doc(id=f"v{i}", vectors={"emb": X[i]}) for i in range(lo, min(lo + 1000, n))]
        )
    col.flush()
    col.optimize()
    eng = col._impl.segments[0].engine_for("emb")
    eng._ensure_fresh()
    assert eng._smesh is not None, "IVF engine must bind the collection mesh"
    assert eng._lists_codes.shape[0] % 8 == 0  # KV padded to the shard count

    Q = rng.standard_normal((4, d)).astype(np.float32)
    d2 = ((Q[:, None, :] - X[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    docs = col.batch_query(
        "emb", Q, topk=10, output_fields=[], param=IVFQueryParam(nprobe=16)
    )
    hits = 0
    for i in range(len(Q)):
        got = {int(doc.id[1:]) for doc in docs[i]}
        hits += len(got & set(gt[i].tolist()))
    assert hits / (len(Q) * 10) >= 0.9, hits / (len(Q) * 10)


def test_sharded_sparse_flat_matches_oracle(tmp_path, rng, mesh8):
    """Sparse rows corpus-shard across the mesh (`sharded_sparse_topk`)."""
    n, vocab, nnz = 2000, 500, 12
    rows = []
    for i in range(n):
        dims = rng.choice(vocab, nnz, replace=False)
        rows.append({int(t): float(rng.random() + 0.1) for t in dims})
    schema = CollectionSchema(
        name="meshsp",
        vectors=[VectorSchema("sv", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP))],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshsp"), schema)
    for lo in range(0, n, 1000):
        col.insert(
            [Doc(id=f"s{i}", vectors={"sv": rows[i]}) for i in range(lo, min(lo + 1000, n))]
        )
    col.flush()
    col.optimize()
    eng = col._impl.segments[0].engine_for("sv")
    eng._ensure_fresh()
    assert eng._smesh is not None, "sparse flat engine must bind the mesh"

    q = {int(t): float(rng.random() + 0.1) for t in rng.choice(vocab, nnz, replace=False)}
    res = col.query(VectorQuery("sv", vector=q), topk=10)
    # numpy oracle: IP descending
    def dot(r):
        return sum(v * q.get(k, 0.0) for k, v in r.items())

    oracle = sorted(range(n), key=lambda i: -dot(rows[i]))[:10]
    got = [int(doc.id[1:]) for doc in res]
    assert set(got) == set(oracle), (got, oracle)
    scores = [doc.score for doc in res]
    assert scores == sorted(scores, reverse=True)  # IP: dot descending


def test_sharded_sparse_hnsw_recall(tmp_path, rng, mesh8):
    """Per-shard sparse NSW subgraphs + ICI merge (`sharded_sparse_beam`)."""
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam

    n, vocab, nnz = 4096, 400, 10
    rows = []
    for i in range(n):
        dims = rng.choice(vocab, nnz, replace=False)
        rows.append({int(t): float(rng.random() + 0.1) for t in dims})
    schema = CollectionSchema(
        name="meshsh",
        vectors=[
            VectorSchema(
                "sv", DataType.SPARSE_VECTOR_FP32, 0,
                HnswIndexParam(MetricType.IP, m=16, ef_construction=100),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "meshsh"), schema)
    for lo in range(0, n, 1024):
        col.insert(
            [Doc(id=f"h{i}", vectors={"sv": rows[i]}) for i in range(lo, min(lo + 1024, n))]
        )
    col.flush()
    col.optimize()
    eng = col._impl.segments[0].engine_for("sv")
    eng._ensure_fresh()
    assert eng._smesh is not None and eng._l0 is not None

    def dot(r, q):
        return sum(v * q.get(k, 0.0) for k, v in r.items())

    hits = 0
    queries = []
    for _ in range(4):
        queries.append(
            {int(t): float(rng.random() + 0.1) for t in rng.choice(vocab, nnz, replace=False)}
        )
    for q in queries:
        res = col.query(
            VectorQuery("sv", vector=q, param=HnswQueryParam(ef=96)), topk=10
        )
        got = {int(doc.id[1:]) for doc in res}
        oracle = set(sorted(range(n), key=lambda i: -dot(rows[i], q))[:10])
        hits += len(got & oracle)
    assert hits / 40 >= 0.85, hits / 40

    # reopen: sharded aux (local-id layout + per-shard entries) round-trips
    path = col._impl.path
    del col
    col2 = zvec_tpu.open(path)
    res = col2.query(
        VectorQuery("sv", vector=queries[0], param=HnswQueryParam(ef=96)), topk=10
    )
    assert len(res) == 10
