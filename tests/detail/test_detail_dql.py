"""DQL behavior matrix: topk edges, filter-op catalog x data types, null
semantics, projections, query-by-id, writing-vs-sealed segments, fetch
(reference analog: `python/tests/detail/test_collection_dql.py`, 1,329 LoC).

Every filtered query is checked against a python-evaluated oracle over the
same docs, on BOTH the writing (unsealed) segment and after optimize+flush
(sealed, index-backed) — the two storage paths must agree."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import DataType, Doc, VectorQuery, ZvecError

from .conftest import DIM, FIELD_NAME, full_width_schema, make_doc

F_I64 = FIELD_NAME[DataType.INT64]
F_I32 = FIELD_NAME[DataType.INT32]
F_U32 = FIELD_NAME[DataType.UINT32]
F_STR = FIELD_NAME[DataType.STRING]
F_BOOL = FIELD_NAME[DataType.BOOL]
F_FLT = FIELD_NAME[DataType.FLOAT]
F_DBL = FIELD_NAME[DataType.DOUBLE]
F_AI64 = FIELD_NAME[DataType.ARRAY_INT64]
F_ASTR = FIELD_NAME[DataType.ARRAY_STRING]


def _mk(tmp_path, n=120, sealed=False, name="dql"):
    col = zvec_tpu.create_and_open(str(tmp_path / name), full_width_schema(name))
    docs = [make_doc(i, np.random.default_rng(7000 + i)) for i in range(n)]
    # a few docs with nulls for IS NULL coverage
    for i in range(0, n, 17):
        docs[i] = Doc(id=f"pk{i}", vectors=docs[i].vectors)
    col.insert(docs)
    if sealed:
        col.optimize()
        col.flush()
    return col, docs


def _oracle_ids(docs, pred):
    out = set()
    for d in docs:
        try:
            if pred(d.fields):
                out.add(d.id)
        except (TypeError, KeyError):
            pass
    return out


def _query_ids(col, q, flt, topk=1000):
    res = col.query(VectorQuery("dense", vector=q), topk=topk, filter=flt)
    return {r.id for r in res}


FILTER_CASES = [
    (f"{F_I32} = 3", lambda f: f.get(F_I32) == 3),
    (f"{F_I32} != 3", lambda f: f.get(F_I32) is not None and f[F_I32] != 3),
    (f"{F_I32} <> 3", lambda f: f.get(F_I32) is not None and f[F_I32] != 3),
    (f"{F_I32} < 10", lambda f: f.get(F_I32) is not None and f[F_I32] < 10),
    (f"{F_I32} <= 10", lambda f: f.get(F_I32) is not None and f[F_I32] <= 10),
    (f"{F_I32} > 40", lambda f: f.get(F_I32) is not None and f[F_I32] > 40),
    (f"{F_I32} >= 40", lambda f: f.get(F_I32) is not None and f[F_I32] >= 40),
    (
        f"{F_FLT} > 25.25",
        lambda f: f.get(F_FLT) is not None and f[F_FLT] > 25.25,
    ),
    (
        f"{F_DBL} <= 7.0",
        lambda f: f.get(F_DBL) is not None and f[F_DBL] <= 7.0,
    ),
    (f"{F_BOOL} = true", lambda f: f.get(F_BOOL) is True),
    (f"{F_BOOL} = false", lambda f: f.get(F_BOOL) is False),
    (f"{F_STR} = 'str_5'", lambda f: f.get(F_STR) == "str_5"),
    (
        f"{F_STR} IN ('str_1', 'str_2', 'str_99')",
        lambda f: f.get(F_STR) in ("str_1", "str_2", "str_99"),
    ),
    (
        f"{F_I32} NOT IN (1, 2, 3)",
        lambda f: f.get(F_I32) is not None and f[F_I32] not in (1, 2, 3),
    ),
    (
        f"{F_STR} LIKE 'str_1%'",
        lambda f: f.get(F_STR) is not None and f[F_STR].startswith("str_1"),
    ),
    (
        f"{F_STR} LIKE '%_77'",
        lambda f: f.get(F_STR) is not None and f[F_STR].endswith("_77"),
    ),
    (
        f"{F_STR} LIKE '%tr_2%'",
        lambda f: f.get(F_STR) is not None and "tr_2" in f[F_STR],
    ),
    (f"{F_STR} IS NULL", lambda f: f.get(F_STR) is None),
    (f"{F_STR} IS NOT NULL", lambda f: f.get(F_STR) is not None),
    (
        f"{F_AI64} CONTAIN_ANY (5, 6)",
        lambda f: f.get(F_AI64) is not None and bool({5, 6} & set(f[F_AI64])),
    ),
    (
        f"{F_AI64} CONTAIN_ALL (5, 6)",
        lambda f: f.get(F_AI64) is not None and {5, 6} <= set(f[F_AI64]),
    ),
    (
        f"{F_ASTR} CONTAIN_ANY ('t1')",
        lambda f: f.get(F_ASTR) is not None and "t1" in f[F_ASTR],
    ),
    (
        f"array_length({F_AI64}) = 0",
        lambda f: f.get(F_AI64) is not None and len(f[F_AI64]) == 0,
    ),
    (
        f"array_length({F_AI64}) >= 2",
        lambda f: f.get(F_AI64) is not None and len(f[F_AI64]) >= 2,
    ),
    (
        f"{F_I32} > 0 AND {F_BOOL} = true",
        lambda f: f.get(F_I32) is not None and f[F_I32] > 0 and f.get(F_BOOL) is True,
    ),
    (
        f"{F_I32} < 0 OR {F_STR} = 'str_8'",
        lambda f: (f.get(F_I32) is not None and f[F_I32] < 0)
        or f.get(F_STR) == "str_8",
    ),
    (
        f"({F_I32} > 5 AND {F_I32} < 20) OR {F_STR} IS NULL",
        lambda f: (
            f.get(F_I32) is not None and 5 < f[F_I32] < 20
        )
        or f.get(F_STR) is None,
    ),
    (
        f"{F_U32} >= 30 AND {F_U32} <= 90",
        lambda f: f.get(F_U32) is not None and 30 <= f[F_U32] <= 90,
    ),
]


@pytest.mark.parametrize("sealed", [False, True], ids=["writing", "sealed"])
@pytest.mark.parametrize("flt,pred", FILTER_CASES, ids=[c[0] for c in FILTER_CASES])
def test_filter_op_matrix(tmp_path, rng, sealed, flt, pred):
    col, docs = _mk(tmp_path, sealed=sealed)
    q = rng.standard_normal(DIM).astype(np.float32)
    assert _query_ids(col, q, flt) == _oracle_ids(docs, pred), flt


class TestTopkAndRanking:
    def test_topk_edges(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=30)
        q = rng.standard_normal(DIM).astype(np.float32)
        assert len(col.query(VectorQuery("dense", vector=q), topk=1)) == 1
        # k > N: only real rows
        assert len(col.query(VectorQuery("dense", vector=q), topk=500)) == 30
        for bad in (0, -3):
            with pytest.raises(ZvecError):
                col.query(VectorQuery("dense", vector=q), topk=bad)

    def test_exact_ranking_l2(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=64, sealed=True)
        q = rng.standard_normal(DIM).astype(np.float32)
        res = col.query(VectorQuery("dense", vector=q), topk=10)
        mat = np.stack([np.asarray(d.vectors["dense"]) for d in docs])
        d2 = ((mat - q) ** 2).sum(1)
        oracle = np.argsort(d2, kind="stable")[:10]
        assert [r.id for r in res] == [f"pk{i}" for i in oracle]
        np.testing.assert_allclose(
            [r.score for r in res], np.sort(d2)[:10], rtol=1e-4
        )

    def test_sparse_ranking_ip(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=50)
        q = {1: 1.0, 2: 0.5, 3: 2.0, 50: 1.0, 100: 0.25, 150: 3.0}
        res = col.query(VectorQuery("sparse", vector=q), topk=5)

        def dot(sv):
            return sum(v * q.get(k, 0.0) for k, v in sv.items())

        oracle = sorted(docs, key=lambda d: -dot(d.vectors["sparse"]))[:5]
        assert [r.id for r in res] == [d.id for d in oracle]
        scores = [r.score for r in res]
        assert scores == sorted(scores, reverse=True)  # IP: descending


class TestProjection:
    def test_output_fields_exact_set(self, tmp_path, rng):
        col, docs = _mk(tmp_path)
        q = rng.standard_normal(DIM).astype(np.float32)
        res = col.query(
            VectorQuery("dense", vector=q), topk=3, output_fields=[F_I64, F_STR]
        )
        for r in res:
            assert set(r.fields) == {F_I64, F_STR}
            assert not r.vectors

    def test_output_fields_star_and_empty(self, tmp_path, rng):
        col, docs = _mk(tmp_path)
        q = rng.standard_normal(DIM).astype(np.float32)
        star = col.query(VectorQuery("dense", vector=q), topk=1, output_fields=["*"])[0]
        assert set(star.fields) == {FIELD_NAME[dt] for dt in FIELD_NAME}
        empty = col.query(VectorQuery("dense", vector=q), topk=1, output_fields=[])[0]
        assert empty.fields in ({}, None) or not empty.fields

    def test_unknown_output_field_rejected(self, tmp_path, rng):
        col, _ = _mk(tmp_path)
        q = rng.standard_normal(DIM).astype(np.float32)
        with pytest.raises(ZvecError):
            col.query(VectorQuery("dense", vector=q), topk=1, output_fields=["ghost"])

    def test_include_vector(self, tmp_path, rng):
        col, docs = _mk(tmp_path)
        q = np.asarray(docs[3].vectors["dense"], np.float32)
        r = col.query(VectorQuery("dense", vector=q), topk=1, include_vector=True)[0]
        assert r.id == "pk3"
        np.testing.assert_allclose(
            np.asarray(r.vector("dense")), docs[3].vectors["dense"], rtol=1e-6
        )
        assert r.vector("sparse") is not None


class TestQueryById:
    def test_query_by_id_equals_query_by_vector(self, tmp_path, rng):
        col, docs = _mk(tmp_path, sealed=True)
        by_id = col.query(VectorQuery("dense", id="pk11"), topk=5)
        by_vec = col.query(
            VectorQuery("dense", vector=np.asarray(docs[11].vectors["dense"])), topk=5
        )
        assert [r.id for r in by_id] == [r.id for r in by_vec]
        assert by_id[0].id == "pk11"  # own vector: distance 0

    def test_query_by_missing_id(self, tmp_path, rng):
        col, _ = _mk(tmp_path)
        with pytest.raises((ZvecError, ValueError)):
            col.query(VectorQuery("dense", id="ghost"), topk=3)

    def test_both_id_and_vector_rejected(self):
        with pytest.raises(ValueError):
            VectorQuery("dense", id="pk1", vector=np.zeros(DIM, np.float32))

    def test_neither_id_nor_vector_rejected(self, tmp_path, rng):
        col, _ = _mk(tmp_path)
        with pytest.raises((ValueError, ZvecError)):
            col.query(VectorQuery("dense"), topk=3)


class TestFilterErrorsAndEdges:
    @pytest.mark.parametrize(
        "flt",
        [
            "no_such_field = 1",
            f"{F_I32} ==",           # syntax
            f"{F_I32} BETWIXT 1 3",  # bogus op
            "(((",
            f"{F_I32} = 'not-an-int-literal' AND",
        ],
    )
    def test_malformed_filters_raise(self, tmp_path, rng, flt):
        col, _ = _mk(tmp_path, n=10)
        q = rng.standard_normal(DIM).astype(np.float32)
        with pytest.raises((ZvecError, ValueError)):
            col.query(VectorQuery("dense", vector=q), topk=3, filter=flt)

    def test_unsatisfiable_filter_returns_empty(self, tmp_path, rng):
        col, _ = _mk(tmp_path, n=10)
        q = rng.standard_normal(DIM).astype(np.float32)
        assert (
            col.query(
                VectorQuery("dense", vector=q), topk=3, filter=f"{F_I32} > 10000000"
            )
            == []
        )

    def test_filter_excludes_deleted(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=40)
        col.delete([d.id for d in docs if d.fields.get(F_I32) == 0])
        q = rng.standard_normal(DIM).astype(np.float32)
        got = _query_ids(col, q, f"{F_I32} <= 0")
        oracle = {
            d.id for d in docs
            if d.fields.get(F_I32) is not None and d.fields[F_I32] < 0
        }
        assert got == oracle

    def test_filter_spanning_sealed_and_writing(self, tmp_path, rng):
        """Half the docs sealed, half in the writing segment: one query must
        merge both paths under the same filter."""
        col, docs = _mk(tmp_path, n=60, sealed=True)
        extra = [make_doc(i, np.random.default_rng(9000 + i)) for i in range(60, 120)]
        col.insert(extra)
        q = rng.standard_normal(DIM).astype(np.float32)
        got = _query_ids(col, q, f"{F_BOOL} = true")
        oracle = _oracle_ids(docs + extra, lambda f: f.get(F_BOOL) is True)
        assert got == oracle


class TestFetchMatrix:
    def test_fetch_shapes(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=20)
        one = col.fetch("pk4")
        assert set(one) == {"pk4"}
        many = col.fetch(["pk1", "pk2", "pk1", "ghost"])
        assert set(many) == {"pk1", "pk2"}
        assert col.fetch([]) == {}

    def test_fetch_full_width_values(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=20, sealed=True)
        d = docs[9]
        got = col.fetch(d.id)[d.id]
        for name, val in d.fields.items():
            g = got.fields[name]
            if isinstance(val, float):
                assert g == pytest.approx(val, rel=1e-6)
            elif isinstance(val, list) and val and isinstance(val[0], float):
                assert list(g) == pytest.approx(val)
            elif isinstance(val, list):
                assert list(g) == val
            else:
                assert g == val


class TestFilterOnlyQuery:
    """query() with NO VectorQuery on a vector-bearing collection: a pure
    filter scan (reference `test_collection_dql.py:283-308` + executor
    `query_executor.py:267-272` builds a query-without-vector)."""

    @pytest.mark.parametrize("sealed", [False, True], ids=["writing", "sealed"])
    def test_no_condition_returns_all(self, tmp_path, sealed):
        col, docs = _mk(tmp_path, n=25, sealed=sealed)
        res = col.query(topk=1000)
        assert {d.id for d in res} == {d.id for d in docs}
        # insertion-ordered (reference consistency test sorts by int id)
        assert [d.id for d in res] == [f"pk{i}" for i in range(25)]

    def test_empty_and_none_filter_equivalent(self, tmp_path):
        col, docs = _mk(tmp_path, n=15)
        r_none = col.query(topk=100)
        r_empty = col.query(filter="", topk=100)
        assert [d.id for d in r_none] == [d.id for d in r_empty]

    @pytest.mark.parametrize("sealed", [False, True], ids=["writing", "sealed"])
    def test_filter_matches_oracle(self, tmp_path, sealed):
        col, docs = _mk(tmp_path, n=80, sealed=sealed)
        res = col.query(filter=f"{F_I32} >= 40", topk=1000)
        oracle = _oracle_ids(docs, lambda f: f.get(F_I32) is not None and f[F_I32] >= 40)
        assert {d.id for d in res} == oracle

    def test_topk_bounds_scan(self, tmp_path):
        col, docs = _mk(tmp_path, n=50)
        assert len(col.query(topk=7)) == 7
        assert len(col.query(topk=50)) == 50
        assert len(col.query(topk=500)) == 50

    def test_excludes_deleted(self, tmp_path):
        col, docs = _mk(tmp_path, n=30)
        col.delete([f"pk{i}" for i in range(0, 30, 3)])
        res = col.query(topk=100)
        assert {d.id for d in res} == {
            f"pk{i}" for i in range(30) if i % 3 != 0
        }

    def test_output_fields_respected(self, tmp_path):
        col, docs = _mk(tmp_path, n=10)
        res = col.query(topk=3, output_fields=[F_I32])
        for d in res:
            assert set(d.fields) <= {F_I32}

    def test_multivector_schema_filter_only(self, tmp_path):
        """The same fallback must work through MultiVectorQueryExecutor."""
        from zvec_tpu import (
            CollectionSchema,
            FieldSchema,
            FlatIndexParam,
            MetricType,
            VectorSchema,
        )

        schema = CollectionSchema(
            "mvq",
            fields=[FieldSchema("k", DataType.INT64)],
            vectors=[
                VectorSchema("a", DataType.VECTOR_FP32, 8,
                             FlatIndexParam(MetricType.L2)),
                VectorSchema("b", DataType.VECTOR_FP32, 8,
                             FlatIndexParam(MetricType.IP)),
            ],
        )
        col = zvec_tpu.create_and_open(str(tmp_path / "mvq"), schema)
        rng = np.random.default_rng(5)
        col.insert(
            [
                Doc(id=str(i), fields={"k": i},
                    vectors={"a": rng.standard_normal(8).astype(np.float32),
                             "b": rng.standard_normal(8).astype(np.float32)})
                for i in range(12)
            ]
        )
        res = col.query(filter="k >= 6", topk=100)
        assert {d.id for d in res} == {str(i) for i in range(6, 12)}


class TestQueryConsistency:
    """Repeated identical queries return identical results (reference
    `test_collection_dql.py:819-846`)."""

    def test_repeated_filter_scan_stable(self, tmp_path):
        col, docs = _mk(tmp_path, n=40, sealed=True)
        runs = [col.query(filter=f"{F_I32} >= 10", topk=100) for _ in range(5)]
        first = [d.id for d in runs[0]]
        for r in runs[1:]:
            assert [d.id for d in r] == first

    def test_repeated_vector_query_stable(self, tmp_path, rng):
        col, docs = _mk(tmp_path, n=60, sealed=True)
        q = rng.standard_normal(DIM).astype(np.float32)
        runs = [
            col.query(VectorQuery("dense", vector=q), topk=10)
            for _ in range(5)
        ]
        first = [(d.id, round(d.score, 5)) for d in runs[0]]
        for r in runs[1:]:
            assert [(d.id, round(d.score, 5)) for d in r] == first
