"""Query-executor framework + reranker formula tests.

Reference analogs: `python/tests/test_query_executor.py` (factory selection,
validation), `python/tests/test_reranker.py` (RRF / weighted score oracles,
`multi_vector_reranker.py:26-174`), `python/tests/detail/distance_helper.py:
158-203` (the normalization formulas)."""

import math

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    MetricType,
    RrfReRanker,
    VectorQuery,
    VectorSchema,
    WeightedReRanker,
)
from zvec_tpu.executor.query_executor import (
    MultiVectorQueryExecutor,
    NoVectorQueryExecutor,
    QueryExecutorFactory,
    SingleVectorQueryExecutor,
)

D = 8


def _schema(n_vec_fields: int, name: str) -> CollectionSchema:
    return CollectionSchema(
        # create-time rule: collection names are [a-zA-Z0-9_-]{3,64}
        f"qe_{name}",
        fields=[FieldSchema("tag", DataType.STRING)],
        vectors=[
            VectorSchema(
                f"v{i}", DataType.VECTOR_FP32, D, FlatIndexParam(MetricType.L2)
            )
            for i in range(n_vec_fields)
        ],
    )


def _fill(col, rng, n=40, n_fields=1):
    docs = []
    for i in range(n):
        vecs = {
            f"v{f}": rng.standard_normal(D).astype(np.float32)
            for f in range(n_fields)
        }
        docs.append(Doc(id=f"d{i}", fields={"tag": f"t{i % 4}"}, vectors=vecs))
    col.insert(docs)
    return docs


# ---------------- factory selection ----------------


def test_factory_picks_executor_by_vector_count():
    no_vec = CollectionSchema("col_nv", fields=[FieldSchema("x", DataType.INT64)])
    assert isinstance(
        QueryExecutorFactory.create(no_vec), NoVectorQueryExecutor
    )
    assert isinstance(
        QueryExecutorFactory.create(_schema(1, "s1")), SingleVectorQueryExecutor
    )
    assert isinstance(
        QueryExecutorFactory.create(_schema(2, "s2")), MultiVectorQueryExecutor
    )


# ---------------- validation ----------------


def test_vector_query_id_xor_vector():
    with pytest.raises(ValueError):
        VectorQuery("v0", id="d1", vector=np.ones(D, np.float32))
    with pytest.raises(ValueError):
        VectorQuery("v0")  # neither
    with pytest.raises(ValueError):
        VectorQuery(None, vector=np.ones(D, np.float32))


def test_single_vector_validation(tmp_path, rng):
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(1, "sv"))
    _fill(col, rng)
    q = rng.standard_normal(D).astype(np.float32)
    with pytest.raises(ValueError):
        col.query([VectorQuery("v0", vector=q), VectorQuery("v0", vector=q)])
    # zero queries = filter-only scan, NOT an error (reference
    # `query_executor.py:267-272` builds a query-without-vector)
    assert len(col.query([], topk=1000)) == 40
    with pytest.raises(ValueError):  # unknown field
        col.query(VectorQuery("nope", vector=q))
    with pytest.raises(ValueError):  # wrong dimension
        col.query(VectorQuery("v0", vector=np.ones(D + 1, np.float32)))


def test_multi_vector_requires_reranker(tmp_path, rng):
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(2, "mv"))
    _fill(col, rng, n_fields=2)
    q0 = rng.standard_normal(D).astype(np.float32)
    q1 = rng.standard_normal(D).astype(np.float32)
    with pytest.raises(ValueError):
        col.query([VectorQuery("v0", vector=q0), VectorQuery("v1", vector=q1)])
    with pytest.raises(ValueError):  # duplicate fields
        col.query(
            [VectorQuery("v0", vector=q0), VectorQuery("v0", vector=q1)],
            reranker=RrfReRanker(),
        )
    hits = col.query(
        [VectorQuery("v0", vector=q0), VectorQuery("v1", vector=q1)],
        reranker=RrfReRanker(topn=5),
    )
    assert len(hits) == 5


# ---------------- query-by-id ----------------


def test_query_by_id_self_match(tmp_path, rng):
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(1, "qid"))
    _fill(col, rng)
    hits = col.query(VectorQuery("v0", id="d7"), topk=3)
    assert hits[0].id == "d7"  # own vector is its nearest neighbor
    assert hits[0].score == pytest.approx(0.0, abs=1e-4)  # L2 self-distance


def test_query_by_missing_id(tmp_path, rng):
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(1, "qmi"))
    _fill(col, rng)
    with pytest.raises(ValueError):
        col.query(VectorQuery("v0", id="ghost"))


# ---------------- dtype coercion ----------------


def test_query_vector_dtype_coercion(tmp_path, rng):
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(1, "dt"))
    _fill(col, rng)
    # python list / float64 inputs are coerced to the field dtype (fp32)
    q = [float(x) for x in rng.standard_normal(D)]
    hits_list = col.query(VectorQuery("v0", vector=q), topk=5)
    hits_np = col.query(
        VectorQuery("v0", vector=np.asarray(q, np.float64)), topk=5
    )
    assert [h.id for h in hits_list] == [h.id for h in hits_np]


# ---------------- no-vector scan executor ----------------


def test_no_vector_scan(tmp_path):
    schema = CollectionSchema("col_nv",
        fields=[FieldSchema("n", DataType.INT64), FieldSchema("s", DataType.STRING)],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    col.insert(
        [Doc(id=f"d{i}", fields={"n": i, "s": f"x{i}"}) for i in range(20)]
    )
    docs = col.query(filter="n >= 15", topk=10)
    assert sorted(d.fields["n"] for d in docs) == list(range(15, 20))
    docs = col.query(topk=7)  # unfiltered scan honors topk
    assert len(docs) == 7
    with pytest.raises(ValueError):  # vectors on a vector-less collection
        col.query(VectorQuery("v0", vector=np.ones(4, np.float32)))


# ---------------- reranker score oracles ----------------


def _mkdoc(i, score):
    return Doc(id=f"d{i}", score=score)


def test_rrf_formula_oracle():
    # field A ranks: d0 d1 d2 ; field B ranks: d1 d0 d3
    results = {
        "a": [_mkdoc(0, 0.1), _mkdoc(1, 0.2), _mkdoc(2, 0.3)],
        "b": [_mkdoc(1, 0.05), _mkdoc(0, 0.15), _mkdoc(3, 0.25)],
    }
    k = 60
    expect = {
        "d0": 1 / (k + 1) + 1 / (k + 2),
        "d1": 1 / (k + 2) + 1 / (k + 1),
        "d2": 1 / (k + 3),
        "d3": 1 / (k + 3),
    }
    out = RrfReRanker(topn=4).rerank(results)
    assert len(out) == 4
    for doc in out:
        assert doc.score == pytest.approx(expect[doc.id], rel=1e-12)
    # d0/d1 tie at the top, then d2/d3
    assert {out[0].id, out[1].id} == {"d0", "d1"}
    # custom rank constant
    out = RrfReRanker(topn=1, rank_constant=1).rerank({"a": [_mkdoc(9, 0.0)]})
    assert out[0].score == pytest.approx(1 / 2)


def test_weighted_normalization_formulas():
    norm = WeightedReRanker._normalize_score
    for s in (0.0, 0.3, 2.5, 100.0):
        assert norm(s, MetricType.L2) == pytest.approx(
            1 - 2 * math.atan(s) / math.pi
        )
        assert norm(s, MetricType.IP) == pytest.approx(
            0.5 + math.atan(s) / math.pi
        )
        assert norm(s, MetricType.COSINE) == pytest.approx(1 - s / 2)
    with pytest.raises(ValueError):
        norm(1.0, MetricType.HAMMING)


def test_weighted_rerank_oracle():
    results = {
        "a": [_mkdoc(0, 0.5), _mkdoc(1, 1.5)],
        "b": [_mkdoc(1, 0.2), _mkdoc(2, 0.8)],
    }
    w = {"a": 2.0, "b": 0.5}
    rr = WeightedReRanker(topn=3, metric=MetricType.L2, weights=w)
    n = lambda s: 1 - 2 * math.atan(s) / math.pi
    expect = {
        "d0": 2.0 * n(0.5),
        "d1": 2.0 * n(1.5) + 0.5 * n(0.2),
        "d2": 0.5 * n(0.8),
    }
    out = rr.rerank(results)
    got = {d.id: d.score for d in out}
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-12)
    # ranked descending by fused score
    assert [d.id for d in out] == sorted(expect, key=expect.get, reverse=True)


def test_reranker_topn_validation():
    with pytest.raises(ValueError):
        RrfReRanker(topn=0)


# ---------------- threaded multi-field execution ----------------


def test_query_concurrency_env(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("ZVEC_QUERY_CONCURRENCY", "2")
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(2, "cc"))
    _fill(col, rng, n_fields=2)
    assert col._querier._concurrency == 2
    q0 = rng.standard_normal(D).astype(np.float32)
    q1 = rng.standard_normal(D).astype(np.float32)
    queries = [VectorQuery("v0", vector=q0), VectorQuery("v1", vector=q1)]
    threaded = col.query(queries, reranker=RrfReRanker(topn=10))
    monkeypatch.setenv("ZVEC_QUERY_CONCURRENCY", "1")
    col._refresh()
    serial = col.query(queries, reranker=RrfReRanker(topn=10))
    assert [d.id for d in threaded] == [d.id for d in serial]
    assert [d.score for d in threaded] == [d.score for d in serial]


def test_fusion_output_count_is_reranker_topn(tmp_path, rng):
    """Reference parity: the fused result count is governed by the
    reranker's `topn`, NOT the per-field `topk` (reference
    `query_executor.py:213-225` never truncates after rerank)."""
    from zvec_tpu import RrfReRanker

    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(2, "mv"))
    _fill(col, rng, n_fields=2)
    q = rng.standard_normal(D).astype(np.float32)
    docs = col.query(
        [VectorQuery("v0", vector=q), VectorQuery("v1", vector=q)],
        topk=3,
        reranker=RrfReRanker(topn=4),
    )
    assert len(docs) == 4  # two top-3 lists fuse, topn caps the output
    docs = col.query(
        [VectorQuery("v0", vector=q), VectorQuery("v1", vector=q)],
        topk=3,
        reranker=RrfReRanker(topn=50),
    )
    assert 3 <= len(docs) <= 6  # at most 2*topk uniques


def test_batch_fused_query_matches_per_query(tmp_path, rng):
    """Differential: batch_fused_query == [query(g) for g in groups] on a
    dense+dense multi-vector collection with both rerankers."""
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(2, "bf"))
    _fill(col, rng, n=60, n_fields=2)
    groups = [
        [
            VectorQuery("v0", vector=rng.standard_normal(D).astype(np.float32)),
            VectorQuery("v1", vector=rng.standard_normal(D).astype(np.float32)),
        ]
        for _ in range(5)
    ]
    for rr in (RrfReRanker(topn=7), WeightedReRanker(topn=7, weights={"v0": 2.0})):
        batched = col.batch_fused_query(groups, topk=8, reranker=rr)
        serial = [col.query(g, topk=8, reranker=rr) for g in groups]
        assert len(batched) == len(serial)
        for b, s in zip(batched, serial):
            assert [d.id for d in b] == [d.id for d in s]
            assert [d.score for d in b] == pytest.approx([d.score for d in s])


def test_batch_fused_query_dense_sparse(tmp_path, rng):
    """Differential on the hybrid dense+sparse shape (the fusion bench
    config): batched fusion must return the per-query results exactly."""
    schema = CollectionSchema(
        "fuse",
        vectors=[
            VectorSchema("dense", DataType.VECTOR_FP32, D, FlatIndexParam(MetricType.COSINE)),
            VectorSchema("sparse", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP)),
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)

    def rand_sparse():
        dims = rng.choice(200, 6, replace=False)
        return {int(a): float(rng.random() + 0.1) for a in dims}

    col.insert(
        [
            Doc(
                id=f"d{i}",
                vectors={
                    "dense": rng.standard_normal(D).astype(np.float32),
                    "sparse": rand_sparse(),
                },
            )
            for i in range(80)
        ]
    )
    col.flush()
    groups = [
        [
            VectorQuery("dense", vector=rng.standard_normal(D).astype(np.float32)),
            VectorQuery("sparse", vector=rand_sparse()),
        ]
        for _ in range(4)
    ]
    rr = RrfReRanker(topn=10)
    batched = col.batch_fused_query(groups, topk=10, reranker=rr, output_fields=[])
    serial = [col.query(g, topk=10, reranker=rr, output_fields=[]) for g in groups]
    for b, s in zip(batched, serial):
        assert [d.id for d in b] == [d.id for d in s]
        assert [d.score for d in b] == pytest.approx([d.score for d in s])


def test_batch_fused_query_single_vector_collection(tmp_path, rng):
    """Single-vector collections batch too (each group is one VectorQuery)."""
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(1, "sv"))
    _fill(col, rng, n=50, n_fields=1)
    groups = [
        [VectorQuery("v0", vector=rng.standard_normal(D).astype(np.float32))]
        for _ in range(6)
    ]
    batched = col.batch_fused_query(groups, topk=5)
    serial = [col.query(g, topk=5) for g in groups]
    for b, s in zip(batched, serial):
        assert [d.id for d in b] == [d.id for d in s]


def test_batch_fused_query_with_filter(tmp_path, rng):
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(2, "ff"))
    _fill(col, rng, n=60, n_fields=2)
    groups = [
        [
            VectorQuery("v0", vector=rng.standard_normal(D).astype(np.float32)),
            VectorQuery("v1", vector=rng.standard_normal(D).astype(np.float32)),
        ]
        for _ in range(3)
    ]
    rr = RrfReRanker(topn=6)
    batched = col.batch_fused_query(groups, topk=6, filter="tag = 't1'", reranker=rr)
    serial = [col.query(g, topk=6, filter="tag = 't1'", reranker=rr) for g in groups]
    for b, s in zip(batched, serial):
        assert [d.id for d in b] == [d.id for d in s]
        for d in b:
            assert int(d.id[1:]) % 4 == 1
