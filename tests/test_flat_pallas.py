"""Oracle parity for the fused Pallas flat-scan kernel (interpret mode on CPU).

Covers the group-max + gather-rescore path: exact top-k sets for every metric,
masked rows, fewer-than-k survivors, and bf16 code tiles (rescore keeps the
ranking stable on well-separated data).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from zvec_tpu.ops.flat_pallas import flat_scan_topk  # noqa: E402
from zvec_tpu.typing import MetricType  # noqa: E402

N, D, Q, K = 4096, 64, 16, 10


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    X = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    mask = (rng.random(N) > 0.3).astype(np.int8)
    return X, q, mask


def _oracle(X, q, mask, metric):
    if metric == MetricType.L2:
        norms = (X**2).sum(1)
        sims = -((q**2).sum(1)[:, None] + norms[None, :] - 2 * q @ X.T)
    elif metric == MetricType.IP:
        norms = np.zeros(N, np.float32)
        sims = q @ X.T
    else:
        norms = np.sqrt((X**2).sum(1))
        den = np.sqrt((q**2).sum(1))[:, None] * norms[None, :]
        sims = np.where(den > 0, (q @ X.T) / np.where(den > 0, den, 1), 1.0)
    return norms.astype(np.float32), np.where(mask[None, :] != 0, sims, -np.inf)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP, MetricType.COSINE])
def test_exact_topk_all_metrics(data, metric):
    X, q, mask = data
    norms, oracle = _oracle(X, q, mask, metric)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(X), jnp.asarray(norms), jnp.asarray(mask),
        metric=metric, topk=K,
    )
    s, i = np.asarray(s), np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :K]
    exp_s = np.take_along_axis(oracle, exp_i, axis=1)
    for r in range(Q):
        assert set(i[r].tolist()) == set(exp_i[r].tolist())
    assert np.allclose(s, exp_s, rtol=1e-4, atol=1e-4)


def test_fewer_than_k_survivors(data):
    X, q, _ = data
    mask = np.zeros(N, np.int8)
    mask[:3] = 1
    norms = (X**2).sum(1).astype(np.float32)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(X), jnp.asarray(norms), jnp.asarray(mask),
        metric=MetricType.L2, topk=K,
    )
    i = np.asarray(i)
    assert (i[:, :3] >= 0).all() and (np.sort(i[:, :3], 1) == np.arange(3)).all()
    assert (i[:, 3:] == -1).all()


def test_bf16_codes_rank_parity(data):
    X, q, mask = data
    norms, oracle = _oracle(X, q, mask, MetricType.L2)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(X, dtype=jnp.bfloat16), jnp.asarray(norms),
        jnp.asarray(mask), metric=MetricType.L2, topk=K,
    )
    i = np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :K]
    # bf16 group selection + bf16-code rescore: allow 1 boundary swap per query
    for r in range(Q):
        assert len(set(i[r].tolist()) & set(exp_i[r].tolist())) >= K - 1


def test_tile_8192_group64(data):
    """N divisible by 8192 engages the max tile (GROUP=64): same exact
    top-k as the oracle through the wider interleaved-group expansion."""
    rng = np.random.default_rng(11)
    X = rng.standard_normal((8192, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    mask = (rng.random(8192) > 0.2).astype(np.int8)
    norms = (X**2).sum(1).astype(np.float32)
    oracle = -(((q**2).sum(1)[:, None]) + norms[None, :] - 2 * q @ X.T)
    oracle = np.where(mask[None, :] != 0, oracle, -np.inf)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(X), jnp.asarray(norms), jnp.asarray(mask),
        metric=MetricType.L2, topk=K,
    )
    i = np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :K]
    for r in range(4):
        assert set(i[r].tolist()) == set(exp_i[r].tolist())


def test_topk_128_build_shape():
    """topk = LANES = 128 (the HNSW-build candidate shape) on a non-8192
    N: tile falls back so topk*GROUP stays within the candidate cap."""
    rng = np.random.default_rng(13)
    X = rng.standard_normal((3072, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    mask = np.ones(3072, np.int8)
    norms = (X**2).sum(1).astype(np.float32)
    oracle = -(((q**2).sum(1)[:, None]) + norms[None, :] - 2 * q @ X.T)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(X), jnp.asarray(norms), jnp.asarray(mask),
        metric=MetricType.L2, topk=128,
    )
    i = np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :128]
    for r in range(2):
        assert set(i[r].tolist()) == set(exp_i[r].tolist())


def test_cosine_zero_norm_rows_rank_top():
    """Zero-norm rows take sims=1.0 (>= any cosine) — the rank-key epilogue
    must keep them inside the winner groups."""
    rng = np.random.default_rng(17)
    X = rng.standard_normal((2048, 16)).astype(np.float32)
    X[5] = 0.0
    X[1500] = 0.0
    q = rng.standard_normal((3, 16)).astype(np.float32)
    mask = np.ones(2048, np.int8)
    norms = np.sqrt((X**2).sum(1)).astype(np.float32)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(X), jnp.asarray(norms), jnp.asarray(mask),
        metric=MetricType.COSINE, topk=K,
    )
    s, i = np.asarray(s), np.asarray(i)
    for r in range(3):
        got = set(i[r].tolist())
        assert {5, 1500} <= got, got
        assert s[r, 0] == pytest.approx(1.0)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP, MetricType.COSINE])
def test_int8_dequant_epilogue(data, metric):
    """int8 codes + in-kernel affine dequant == oracle over dequantized data
    (asymmetric quantized scoring, reference `quantized_integer_metric.cc:320`)."""
    X, q, mask = data
    from zvec_tpu.ops.quantize import QuantParams
    from zvec_tpu.typing import QuantizeType

    lo, hi = float(X.min()), float(X.max())
    scale = (hi - lo) / 254.0
    bias = (hi + lo) / 2.0
    codes = np.clip(np.round((X - bias) / scale), -127, 127).astype(np.int8)
    deq = codes.astype(np.float32) * scale + bias
    norms, oracle = _oracle(deq, q, mask, metric)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(mask),
        metric=metric, topk=K, dequant=(scale, bias),
    )
    s, i = np.asarray(s), np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :K]
    exp_s = np.take_along_axis(oracle, exp_i, axis=1)
    for r in range(Q):
        # tile-stage dots are bf16-rounded; the fp32 dequant rescore restores
        # exact scores — allow 1 boundary swap in group selection
        assert len(set(i[r].tolist()) & set(exp_i[r].tolist())) >= K - 1
    assert np.allclose(s[:, 0], exp_s[:, 0], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP, MetricType.COSINE])
def test_int4_packed_planes(data, metric):
    """Nibble-packed int4 codes scored via the [lo | hi] plane matmul ==
    oracle over dequantized data (reference streaming int4,
    `integer_quantizer_converter.cc:596-607`)."""
    X, q, mask = data
    from zvec_tpu.ops.quantize import pack_int4

    lo, hi = float(X.min()), float(X.max())
    scale = (hi - lo) / 14.0
    bias = (hi + lo) / 2.0
    codes = np.clip(np.round((X - bias) / scale), -7, 7).astype(np.int8)
    deq = codes.astype(np.float32) * scale + bias
    norms, oracle = _oracle(deq, q, mask, metric)
    packed = pack_int4(codes)
    assert packed.shape == (N, D // 2)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(norms), jnp.asarray(mask),
        metric=metric, topk=K, dequant=(scale, bias), int4_dim=D,
    )
    s, i = np.asarray(s), np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :K]
    exp_s = np.take_along_axis(oracle, exp_i, axis=1)
    for r in range(Q):
        # plane dots are bf16 (exact on int4 values); rescore is exact fp32 —
        # allow 1 boundary swap from dequant-epilogue float rounding
        assert len(set(i[r].tolist()) & set(exp_i[r].tolist())) >= K - 1
    assert np.allclose(s[:, 0], exp_s[:, 0], rtol=1e-3, atol=1e-3)


def test_int4_packed_odd_dim():
    """Odd D: the phantom high nibble of the last packed byte is 0 and the
    odd query plane zero-pads — scores must match the unpacked oracle."""
    rng = np.random.default_rng(23)
    n, d = 2048, 17
    codes = rng.integers(-7, 8, size=(n, d)).astype(np.int8)
    q = rng.standard_normal((4, d)).astype(np.float32)
    mask = np.ones(n, np.int8)
    scale, bias = 0.31, -0.05
    deq = codes.astype(np.float32) * scale + bias
    norms = (deq**2).sum(1).astype(np.float32)
    oracle = -(((q**2).sum(1)[:, None]) + norms[None, :] - 2 * q @ deq.T)
    from zvec_tpu.ops.quantize import pack_int4

    packed = pack_int4(codes)
    assert packed.shape == (n, (d + 1) // 2)
    s, i = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(norms), jnp.asarray(mask),
        metric=MetricType.L2, topk=K, dequant=(scale, bias), int4_dim=d,
    )
    s, i = np.asarray(s), np.asarray(i)
    exp_i = np.argsort(-oracle, axis=1)[:, :K]
    exp_s = np.take_along_axis(oracle, exp_i, axis=1)
    for r in range(4):
        assert len(set(i[r].tolist()) & set(exp_i[r].tolist())) >= K - 1
    assert np.allclose(s[:, 0], exp_s[:, 0], rtol=1e-3, atol=1e-3)
