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
