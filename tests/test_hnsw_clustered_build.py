"""Clustered-candidate kNN-graph build (the 10M-scale path, forced small).

ZVEC_HNSW_CLUSTERED=1 routes the forward phase through k-means buckets +
top-2 spilled assignment + per-bucket exact kNN (`bucket_knn_all`) instead
of full exact scans. Recall must hold on clustered data — the regime the
path exists for."""

import numpy as np
import pytest


def test_clustered_build_recall(rng, monkeypatch):
    monkeypatch.setenv("ZVEC_HNSW_CLUSTERED", "1")
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType

    n, d = 6000, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 4
    X = (centers[rng.integers(0, 30, n)] + rng.standard_normal((n, d))).astype(
        np.float32
    )
    Q = (centers[rng.integers(0, 30, 40)] + rng.standard_normal((40, d))).astype(
        np.float32
    )
    eng = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=16, ef_construction=200)
    )
    eng.bind_data(lambda: X, lambda: 1)
    sims, idx = eng.search(Q, 10, param=HnswQueryParam(ef=80))
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    exp = np.argsort(d2, axis=1)[:, :10]
    hits = sum(
        len(set(idx[i][idx[i] >= 0].tolist()) & set(exp[i].tolist()))
        for i in range(40)
    )
    assert hits / 400 >= 0.9, hits / 400


def test_assign_top2_chunked_matches_oracle(rng):
    """The fixed-shape chunked dispatch path (n > 2*block*chunk, overlapped
    tail through ONE compiled program) must assign the same top-2 centroids
    as a brute-force oracle. block=64 forces the chunked path at small n."""
    import jax.numpy as jnp

    from zvec_tpu.ops.hnsw import assign_top2_blocked

    n, k, d = 10_000, 37, 8  # step = 64*64 = 4096; chunked path + overlap
    data = rng.standard_normal((n, d)).astype(np.float32)
    cents = rng.standard_normal((k, d)).astype(np.float32)
    got = np.asarray(assign_top2_blocked(jnp.asarray(data), jnp.asarray(cents), block=64))
    d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :2]
    assert got.shape == (n, 2)
    np.testing.assert_array_equal(got[:, 0], want[:, 0])
    # top-2 may tie-break differently only on exact distance ties (none at
    # float random data): require exact agreement
    np.testing.assert_array_equal(got[:, 1], want[:, 1])


def test_int8_resident_build_recall(rng, monkeypatch):
    """ZVEC_BUILD_INT8=1 routes the clustered build over SYMMETRIC int8
    codes (the HBM tier for 10M x 768d where even bf16 residency exceeds
    device memory). Code-space sims are rank-equivalent at one uniform
    scale, so recall on clustered cosine data must hold vs the exact oracle
    — and the search path (int8 storage codes + refine) stays fp32-exact."""
    monkeypatch.setenv("ZVEC_HNSW_CLUSTERED", "1")
    monkeypatch.setenv("ZVEC_BUILD_INT8", "1")
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType, QuantizeType

    n, d = 6000, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 4
    X = (centers[rng.integers(0, 30, n)] + rng.standard_normal((n, d))).astype(
        np.float32
    )
    Q = (centers[rng.integers(0, 30, 40)] + rng.standard_normal((40, d))).astype(
        np.float32
    )
    eng = HnswEngine(
        MetricType.COSINE,
        d,
        HnswIndexParam(
            MetricType.COSINE,
            m=16,
            ef_construction=200,
            quantize_type=QuantizeType.INT8,
        ),
    )
    eng.bind_data(lambda: X, lambda: 1)
    # symmetric quantizer: bias must be exactly 0 on the storage codes
    sims, idx = eng.search(Q, 10, param=HnswQueryParam(ef=80))
    assert eng._qparams is not None and eng._qparams.bias == 0.0
    xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    exp = np.argsort(-(qn @ xn.T), axis=1)[:, :10]
    hits = sum(
        len(set(idx[i][idx[i] >= 0].tolist()) & set(exp[i].tolist()))
        for i in range(40)
    )
    assert hits / 400 >= 0.9, hits / 400
