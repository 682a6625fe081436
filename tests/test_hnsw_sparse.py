"""Sparse HNSW tests (reference analog: `tests/core/` hnsw_sparse suites)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    HnswIndexParam,
    HnswQueryParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.core.hnsw_sparse import SparseHnswEngine


def random_sparse(rng, vocab=800, nnz=16):
    dims = rng.choice(vocab, nnz, replace=False)
    return {int(d): float(rng.random() + 0.1) for d in dims}


def sparse_dot(a, b):
    return sum(a[k] * b[k] for k in set(a) & set(b))


def test_sparse_hnsw_recall(rng):
    n, k = 2500, 10
    docs = [random_sparse(rng) for _ in range(n)]
    queries = [random_sparse(rng) for _ in range(10)]
    engine = SparseHnswEngine(
        params=HnswIndexParam(MetricType.IP, m=12, ef_construction=100)
    )
    engine.bind_data(lambda: docs, lambda: 1)
    sims, idx = engine.search(queries, k, param=HnswQueryParam(ef=150))
    hits = 0
    for qi, q in enumerate(queries):
        oracle = np.array([sparse_dot(q, d) for d in docs])
        expect = set(np.argsort(-oracle, kind="stable")[:k].tolist())
        hits += len(set(idx[qi][idx[qi] >= 0].tolist()) & expect)
    recall = hits / (10 * k)
    assert recall >= 0.8, f"sparse hnsw recall {recall}"


def test_sparse_hnsw_small_corpus_exact(rng):
    docs = [random_sparse(rng) for _ in range(200)]
    q = random_sparse(rng)
    engine = SparseHnswEngine(params=HnswIndexParam(MetricType.IP, m=8))
    engine.bind_data(lambda: docs, lambda: 1)
    sims, idx = engine.search([q], 5)
    oracle = np.array([sparse_dot(q, d) for d in docs])
    assert set(idx[0]) == set(np.argsort(-oracle, kind="stable")[:5])


def test_sparse_hnsw_through_collection(tmp_path, rng):
    schema = CollectionSchema("col_sh",
        vectors=[
            VectorSchema(
                "sv",
                DataType.SPARSE_VECTOR_FP32,
                0,
                HnswIndexParam(MetricType.IP, m=8, ef_construction=80),
            )
        ],
        max_doc_count_per_segment=1500,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "sh"), schema)
    docs = [random_sparse(rng) for _ in range(1600)]
    for s in range(0, 1600, 800):
        c.insert(
            [Doc(id=f"s{i}", vectors={"sv": docs[i]}) for i in range(s, s + 800)]
        )
    assert "sv" in c._impl.segments[0].meta.indexes
    hits = 0
    for qi in range(8):
        res = c.query(
            VectorQuery("sv", vector=docs[qi], param=HnswQueryParam(ef=120)), topk=10
        )
        oracle = np.array([sparse_dot(docs[qi], d) for d in docs])
        expect = {f"s{i}" for i in np.argsort(-oracle, kind="stable")[:10]}
        hits += len({r.id for r in res} & expect)
    assert hits / 80 >= 0.75

    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "sh"))
    eng = c2._impl.segments[0]._engines["sv"]
    assert isinstance(eng, SparseHnswEngine)
    res = c2.query(VectorQuery("sv", vector=docs[3]), topk=3)
    assert res[0].id == "s3"
    assert eng._loaded_aux is not None
    c2._impl.close()


def test_sparse_hnsw_filtered_disjoint_region(rng):
    """Filter selects docs sharing no terms with the query's neighborhood:
    the deficient-query rescan must still return the exact filtered top-k."""
    import numpy as np

    from zvec_tpu.core.hnsw_sparse import SparseHnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType

    n = 3000
    # two disjoint vocabularies: docs 0..n/2 use dims 0..99, rest 100..199
    docs = []
    for i in range(n):
        base = 0 if i < n // 2 else 100
        dims = (np.arange(4) * 7 + i) % 100 + base
        docs.append({int(d): float(1.0 + (i % 5) * 0.1) for d in dims})
    engine = SparseHnswEngine(
        MetricType.IP, 0, HnswIndexParam(MetricType.IP, m=8, ef_construction=60)
    )
    engine.bind_data(lambda: docs, lambda: 1)
    q = docs[3]  # query from the FIRST vocabulary
    mask = np.zeros(n, dtype=bool)
    mask[n // 2 :] = True  # only second-vocabulary docs pass
    sims, idx = engine.search([q], 5, mask=mask, param=HnswQueryParam(ef=50))
    got = idx[0][idx[0] >= 0]
    # exact oracle over the masked rows
    def ip(a, b):
        return sum(v * b.get(k, 0.0) for k, v in a.items())
    scores = np.array([ip(q, docs[i]) if mask[i] else -np.inf for i in range(n)])
    exp = np.argsort(-scores)[:5]
    assert len(got) == 5, got
    assert set(got) <= set(np.flatnonzero(mask)), "filter violated"
    assert sims[0][0] == pytest.approx(scores[exp[0]], rel=1e-4)


def test_clustered_signature_build_recall(monkeypatch):
    """ZVEC_SPARSE_CLUSTERED=1 routes the build through feature-hash
    signatures + k-means buckets + exact sparse rescore (the 1M-scale path,
    forced small). On topic-clustered data — the regime that strands random
    entry probes in the wrong graph component — the per-cluster medoid
    entries must hold recall, and they must survive dump/load."""
    import numpy as np

    monkeypatch.setenv("ZVEC_SPARSE_CLUSTERED", "1")
    from zvec_tpu.core.hnsw_sparse import SparseHnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType

    rng = np.random.default_rng(3)
    n, v, topics, nnz = 6000, 20000, 30, 24
    pools = [rng.choice(v, 200, replace=False) for _ in range(topics)]

    def make_row(t):
        terms = rng.choice(pools[t], nnz, replace=False)
        return dict(
            zip(terms.tolist(), (rng.random(nnz) + 0.2).astype(float).tolist())
        )

    rows = [make_row(t) for t in rng.integers(0, topics, n)]
    qrows = [make_row(t) for t in rng.integers(0, topics, 25)]
    eng = SparseHnswEngine(
        MetricType.IP, 0, HnswIndexParam(MetricType.IP, m=16, ef_construction=200)
    )
    eng.bind_data(lambda: rows, lambda: 1)
    sims, idx = eng.search(qrows, 10, param=HnswQueryParam(ef=80))

    dense = np.zeros((n, v), np.float32)
    for i, r in enumerate(rows):
        for kk, vv in r.items():
            dense[i, kk] = vv
    qd = np.zeros((len(qrows), v), np.float32)
    for i, r in enumerate(qrows):
        for kk, vv in r.items():
            qd[i, kk] = vv
    exp = np.argsort(-(qd @ dense.T), axis=1)[:, :10]
    rec = sum(
        len(
            set(np.asarray(idx[i])[np.asarray(idx[i]) >= 0].tolist())
            & set(exp[i].tolist())
        )
        for i in range(len(qrows))
    ) / (10 * len(qrows))
    assert rec >= 0.9, rec

    # dump/load must preserve the medoid entry probes
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        desc = eng.dump_aux(d, "f")
        eng2 = SparseHnswEngine(
            MetricType.IP,
            0,
            HnswIndexParam(MetricType.IP, m=16, ef_construction=200),
        )
        eng2.bind_data(lambda: rows, lambda: 1)
        eng2.load_aux(d, desc)
        _, idx2 = eng2.search(qrows, 10, param=HnswQueryParam(ef=80))
        rec2 = sum(
            len(
                set(np.asarray(idx2[i])[np.asarray(idx2[i]) >= 0].tolist())
                & set(exp[i].tolist())
            )
            for i in range(len(qrows))
        ) / (10 * len(qrows))
        assert rec2 >= 0.9, rec2
