"""Query-param behavior matrix (reference analog:
`python/tests/detail/test_collection_dql.py:851-1097` — HnswQueryParam /
IVFQueryParam valid+invalid matrices, incompatible-param rejection, and
query consistency; the matrices here are original to this rebuild).

Semantics pinned:
- a QueryParam subclass for a DIFFERENT index type is rejected (the
  reference surfaces INCOMPATIBLE_FUNCTION_ERROR_MSG; silently falling
  back to engine defaults would hide the mistake),
- an IndexParam passed as a query param is rejected,
- the bare QueryParam base (is_linear / is_using_refiner) is accepted by
  every engine,
- typed params matching the schema's index work on BOTH sealed segments
  (real engine) and the still-writing segment (flat-scan fallback),
- repeated identical queries return identical results (reference
  `test_query_consistency`).
"""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FlatIndexParam,
    HnswIndexParam,
    HnswQueryParam,
    IVFIndexParam,
    IVFQueryParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)

# not part of the reference's top-level __all__ (kept off ours for parity);
# the engine-facing base + FLAT param live in the param module
from zvec_tpu.model.param.param import FlatQueryParam, QueryParam

DIM = 16
N = 400


def _make(tmp_path, name, index_param, seal=True, n=N):
    schema = CollectionSchema(
        name,
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, DIM, index_param)],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / name), schema)
    rng = np.random.default_rng(7)
    X = rng.standard_normal((n, DIM)).astype(np.float32)
    col.insert(
        [Doc(id=str(i), vectors={"v": X[i]}) for i in range(n)]
    )
    if seal:
        col.optimize()
    return col, X


@pytest.fixture(scope="module")
def hnsw_col(tmp_path_factory):
    return _make(
        tmp_path_factory.mktemp("qp"),
        "qp_hnsw",
        HnswIndexParam(MetricType.L2, m=8, ef_construction=40,
                       brute_force_threshold=0),
    )


@pytest.fixture(scope="module")
def ivf_col(tmp_path_factory):
    return _make(
        tmp_path_factory.mktemp("qp"),
        "qp_ivf",
        IVFIndexParam(MetricType.L2, n_list=8, n_iters=3),
    )


@pytest.fixture(scope="module")
def flat_col(tmp_path_factory):
    return _make(
        tmp_path_factory.mktemp("qp"), "qp_flat", FlatIndexParam(MetricType.L2)
    )


class TestIncompatibleParamRejected:
    def test_ivf_param_on_hnsw_field(self, hnsw_col):
        col, X = hnsw_col
        with pytest.raises(Exception, match="incompatible query param"):
            col.query(
                VectorQuery("v", vector=X[0], param=IVFQueryParam(nprobe=4)),
                topk=3,
            )

    def test_flat_param_on_hnsw_field(self, hnsw_col):
        col, X = hnsw_col
        with pytest.raises(Exception, match="incompatible query param"):
            col.query(VectorQuery("v", vector=X[0], param=FlatQueryParam()), topk=3)

    def test_hnsw_param_on_ivf_field(self, ivf_col):
        col, X = ivf_col
        with pytest.raises(Exception, match="incompatible query param"):
            col.query(
                VectorQuery("v", vector=X[0], param=HnswQueryParam(ef=32)), topk=3
            )

    def test_hnsw_param_on_flat_field(self, flat_col):
        col, X = flat_col
        with pytest.raises(Exception, match="incompatible query param"):
            col.query(
                VectorQuery("v", vector=X[0], param=HnswQueryParam(ef=32)), topk=3
            )

    @pytest.mark.parametrize(
        "bad",
        [
            HnswIndexParam(MetricType.L2),
            IVFIndexParam(MetricType.L2, n_list=4),
            FlatIndexParam(MetricType.L2),
            "param",
            42,
        ],
        ids=["hnsw-index", "ivf-index", "flat-index", "str", "int"],
    )
    def test_index_param_as_query_param(self, hnsw_col, bad):
        """An IndexParam (or arbitrary object) as a query param is an error,
        never a silent default (`test_collection_dql.py:990-1021`)."""
        col, X = hnsw_col
        with pytest.raises(Exception):
            col.query(VectorQuery("v", vector=X[0], param=bad), topk=3)

    def test_batch_query_validates_too(self, hnsw_col):
        col, X = hnsw_col
        with pytest.raises(Exception, match="incompatible query param"):
            col.batch_query("v", X[:4], topk=3, param=IVFQueryParam(nprobe=2))


class TestBaseParamUniversal:
    """The bare QueryParam (is_linear / is_using_refiner) works on every
    index type and is_linear=True returns the exact flat ranking."""

    @pytest.mark.parametrize("fix", ["hnsw_col", "ivf_col", "flat_col"])
    def test_base_param_accepted(self, request, fix):
        col, X = request.getfixturevalue(fix)
        res = col.query(
            VectorQuery("v", vector=X[3], param=QueryParam(is_linear=True)), topk=5
        )
        assert len(res) == 5
        assert res[0].id == "3"  # exact: the vector finds itself first

    @pytest.mark.parametrize("fix", ["hnsw_col", "ivf_col"])
    def test_is_linear_matches_flat_oracle(self, request, fix):
        col, X = request.getfixturevalue(fix)
        q = X[11]
        d2 = ((X - q) ** 2).sum(1)
        oracle = [str(i) for i in np.argsort(d2, kind="stable")[:10]]
        res = col.query(
            VectorQuery("v", vector=q, param=QueryParam(is_linear=True)), topk=10
        )
        assert [r.id for r in res] == oracle


class TestTypedParamOnWritingSegment:
    """A typed param matching the schema's index type must be accepted while
    the segment is still writing (scans flat internally) — the param keys the
    FIELD, not the serving engine."""

    def test_hnsw_param_before_seal(self, tmp_path):
        col, X = _make(
            tmp_path, "unsealed",
            HnswIndexParam(MetricType.L2, m=8, ef_construction=40),
            seal=False, n=50,
        )
        res = col.query(
            VectorQuery("v", vector=X[5], param=HnswQueryParam(ef=64)), topk=3
        )
        assert res[0].id == "5"

    def test_ivf_param_before_seal(self, tmp_path):
        col, X = _make(
            tmp_path, "unsealed_ivf",
            IVFIndexParam(MetricType.L2, n_list=4, n_iters=2),
            seal=False, n=50,
        )
        res = col.query(
            VectorQuery("v", vector=X[5], param=IVFQueryParam(nprobe=2)), topk=3
        )
        assert res[0].id == "5"


class TestHnswQueryParamMatrix:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(ef=4),
            dict(ef=512),
            dict(ef=64, frontier=2),
            dict(ef=64, frontier=8),
            dict(ef=64, steps_slack=0),
            dict(ef=64, steps_slack=256),
            dict(ef=64, visited_bits=12),
            dict(ef=64, visited_bits=12, visited_bytes=True),
            dict(ef=64, max_scan_ratio=1.0),
            dict(ef=64, is_using_refiner=True),
            dict(is_linear=True),
        ],
    )
    def test_valid_knobs_return_wellformed(self, hnsw_col, kwargs):
        col, X = hnsw_col
        res = col.query(
            VectorQuery("v", vector=X[9], param=HnswQueryParam(**kwargs)), topk=5
        )
        assert len(res) == 5
        scores = [r.score for r in res]
        assert scores == sorted(scores)  # L2 ascending
        assert len({r.id for r in res}) == 5

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(ef=0),
            dict(ef=-1),
            dict(ef=64, frontier=-1),
            dict(ef=64, steps_slack=-1),
            dict(ef=64, visited_bits=-1),
            dict(ef=64, visited_bits=27),
            dict(ef=64, max_scan_ratio=-0.1),
            dict(ef=64, max_scan_ratio=1.5),
        ],
    )
    def test_invalid_knobs_raise_at_construction(self, kwargs):
        with pytest.raises(ValueError):
            HnswQueryParam(**kwargs)

    def test_ef_recall_monotone(self, hnsw_col):
        """Bigger ef never hurts recall on a fixed query set (graph fixed)."""
        col, X = hnsw_col
        rng = np.random.default_rng(3)
        Q = X[rng.choice(N, 32, replace=False)]
        d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        gt = np.argsort(d2, axis=1)[:, :10]
        recalls = []
        for ef in (8, 64, 256):
            docs = col.batch_query(
                "v", Q, topk=10, param=HnswQueryParam(ef=ef)
            )
            hits = sum(
                len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
                for i in range(len(Q))
            )
            recalls.append(hits / (len(Q) * 10))
        assert recalls[0] <= recalls[1] + 1e-9 <= recalls[2] + 2e-2
        assert recalls[-1] > 0.95


class TestIVFQueryParamMatrix:
    @pytest.mark.parametrize("nprobe", [1, 2, 8, 64])
    def test_valid_nprobe(self, ivf_col, nprobe):
        col, X = ivf_col
        res = col.query(
            VectorQuery("v", vector=X[2], param=IVFQueryParam(nprobe=nprobe)),
            topk=5,
        )
        assert len(res) == 5
        scores = [r.score for r in res]
        assert scores == sorted(scores)

    @pytest.mark.parametrize("nprobe", [0, -3])
    def test_invalid_nprobe(self, nprobe):
        with pytest.raises(ValueError):
            IVFQueryParam(nprobe=nprobe)

    def test_nprobe_recall_monotone(self, ivf_col):
        col, X = ivf_col
        rng = np.random.default_rng(5)
        Q = X[rng.choice(N, 32, replace=False)]
        d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        gt = np.argsort(d2, axis=1)[:, :10]
        recalls = []
        for nprobe in (1, 4, 8):
            docs = col.batch_query(
                "v", Q, topk=10, param=IVFQueryParam(nprobe=nprobe)
            )
            hits = sum(
                len({int(h.id) for h in docs[i]} & set(gt[i].tolist()))
                for i in range(len(Q))
            )
            recalls.append(hits / (len(Q) * 10))
        assert recalls[0] <= recalls[1] + 1e-9 <= recalls[2] + 1e-9
        assert recalls[-1] == 1.0  # nprobe = n_list probes everything


class TestQueryConsistency:
    """Identical repeated queries return identical ids AND scores
    (reference `test_query_consistency`, `test_collection_dql.py:819-849`)."""

    @pytest.mark.parametrize("fix", ["hnsw_col", "ivf_col", "flat_col"])
    def test_repeat_determinism(self, request, fix):
        col, X = request.getfixturevalue(fix)
        q = X[21]
        runs = [col.query(VectorQuery("v", vector=q), topk=10) for _ in range(3)]
        ids = [[r.id for r in run] for run in runs]
        scores = [[r.score for r in run] for run in runs]
        assert ids[0] == ids[1] == ids[2]
        assert scores[0] == scores[1] == scores[2]

    def test_batch_matches_single(self, hnsw_col):
        col, X = hnsw_col
        Q = X[:8]
        batch = col.batch_query("v", Q, topk=5)
        for i in range(8):
            single = col.query(VectorQuery("v", vector=Q[i]), topk=5)
            assert [r.id for r in single] == [r.id for r in batch[i]]
