"""Distance kernel tests vs pure-numpy oracles.

Mirrors the reference's methodology: every engine distance is checked against an
independent numpy reimplementation (reference `python/tests/detail/distance_helper.py:58-115`
and the SIMD-vs-scalar tests in `tests/ailego/math/*`).
"""

import numpy as np
import pytest

from zvec_tpu.ops import (
    blockwise_topk_search,
    cosine_distance_matrix,
    hamming_distance_matrix,
    ip_matrix,
    merge_topk,
    similarity_matrix,
    similarity_to_score,
    squared_l2_matrix,
)
from zvec_tpu.typing import MetricType


# ---- numpy oracles (independent of the ops implementations) ----
def np_ip(q, x):
    return q @ x.T


def np_sql2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def np_cos_dist(q, x):
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    denom = qn * xn.T
    sim = np.where(denom > 0, (q @ x.T) / np.where(denom > 0, denom, 1), 0.0)
    return 1.0 - sim


@pytest.fixture
def qx(rng):
    q = rng.standard_normal((7, 33)).astype(np.float32)
    x = rng.standard_normal((91, 33)).astype(np.float32)
    return q, x


def test_ip_matrix(qx):
    q, x = qx
    np.testing.assert_allclose(
        np.asarray(ip_matrix(q, x)), np_ip(q, x), rtol=1e-5, atol=1e-6
    )


def test_squared_l2_matrix(qx):
    q, x = qx
    np.testing.assert_allclose(
        np.asarray(squared_l2_matrix(q, x)), np_sql2(q, x), rtol=1e-4, atol=1e-3
    )


def test_cosine_distance_matrix(qx):
    q, x = qx
    np.testing.assert_allclose(
        np.asarray(cosine_distance_matrix(q, x)), np_cos_dist(q, x), rtol=1e-5, atol=1e-5
    )


def test_cosine_zero_vector_convention(rng):
    q = np.zeros((1, 8), dtype=np.float32)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    d = np.asarray(cosine_distance_matrix(q, x))
    # zero-magnitude => distance 0 by reference oracle convention
    np.testing.assert_allclose(d, np.zeros((1, 3)), atol=1e-6)


def test_hamming(rng):
    q = rng.integers(0, 256, (4, 16), dtype=np.uint8)
    x = rng.integers(0, 256, (9, 16), dtype=np.uint8)
    expect = np.zeros((4, 9), dtype=np.int32)
    for i in range(4):
        for j in range(9):
            expect[i, j] = bin(
                int.from_bytes(q[i].tobytes(), "big")
                ^ int.from_bytes(x[j].tobytes(), "big")
            ).count("1")
    np.testing.assert_array_equal(np.asarray(hamming_distance_matrix(q, x)), expect)


@pytest.mark.parametrize("metric", [MetricType.IP, MetricType.L2, MetricType.COSINE])
def test_similarity_ordering_matches_oracle(qx, metric):
    q, x = qx
    sim = np.asarray(similarity_matrix(q, x, metric))
    if metric == MetricType.IP:
        oracle = np_ip(q, x)  # larger better
    elif metric == MetricType.L2:
        oracle = -np_sql2(q, x)
    else:
        oracle = 1.0 - np_cos_dist(q, x)
    # similarity values must match the oracle (ordering follows)
    np.testing.assert_allclose(sim, oracle, rtol=1e-4, atol=1e-4)
    # user score roundtrip
    score = np.asarray(similarity_to_score(sim, metric))
    if metric == MetricType.L2:
        np.testing.assert_allclose(score, np_sql2(q, x), rtol=1e-4, atol=1e-3)
    elif metric == MetricType.COSINE:
        np.testing.assert_allclose(score, np_cos_dist(q, x), rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(score, np_ip(q, x), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("metric", [MetricType.IP, MetricType.L2, MetricType.COSINE])
def test_blockwise_topk_exact(rng, metric):
    q = rng.standard_normal((5, 24)).astype(np.float32)
    x = rng.standard_normal((512, 24)).astype(np.float32)
    sims, idx = blockwise_topk_search(q, x, metric, topk=10, block_size=128)
    sims, idx = np.asarray(sims), np.asarray(idx)

    oracle = np.asarray(similarity_matrix(q, x, metric))
    expect_idx = np.argsort(-oracle, axis=1)[:, :10]
    # compare as sets per row (ties may reorder)
    for r in range(5):
        assert set(idx[r]) == set(expect_idx[r])
    np.testing.assert_allclose(
        np.sort(sims, axis=1),
        np.sort(np.take_along_axis(oracle, expect_idx, 1), axis=1),
        rtol=1e-5,
        atol=1e-5,
    )


def test_blockwise_topk_mask(rng):
    q = rng.standard_normal((3, 16)).astype(np.float32)
    x = rng.standard_normal((256, 16)).astype(np.float32)
    mask = np.zeros(256, dtype=bool)
    keep = rng.choice(256, 20, replace=False)
    mask[keep] = True
    sims, idx = blockwise_topk_search(q, x, MetricType.IP, topk=10, mask=mask, block_size=64)
    idx = np.asarray(idx)
    assert all(i in keep for row in idx for i in row if i >= 0)


def test_blockwise_topk_fewer_than_k(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    mask = np.zeros(16, dtype=bool)
    mask[:3] = True
    sims, idx = blockwise_topk_search(q, x, MetricType.L2, topk=10, mask=mask)
    idx = np.asarray(idx)
    assert (idx >= 0).sum(axis=1).tolist() == [3, 3]
    assert set(idx[0][idx[0] >= 0]) == {0, 1, 2}


def test_merge_topk(rng):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    x = rng.standard_normal((200, 16)).astype(np.float32)
    s1, i1 = blockwise_topk_search(q, x[:100], MetricType.IP, topk=10)
    s2, i2 = blockwise_topk_search(q, x[100:], MetricType.IP, topk=10)
    i2 = np.asarray(i2) + 100
    ms, mi = merge_topk([s1, i2 * 0 + np.asarray(s2)], [np.asarray(i1), i2], 10)
    # oracle
    oracle = np.asarray(similarity_matrix(q, x, MetricType.IP))
    expect = np.argsort(-oracle, axis=1)[:, :10]
    for r in range(4):
        assert set(np.asarray(mi)[r]) == set(expect[r])
