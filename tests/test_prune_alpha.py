"""Vamana-style alpha-relaxed dominance prune (HnswIndexParam.prune_alpha).

DiskANN's robust prune: keep candidate i unless a kept j has
d(i, j) <= d(i, base) / alpha. alpha=1.0 must reproduce the reference's
exact rule (`hnsw_algorithm.cc:394-430`); alpha>1 prunes LESS (keeps
longer/more diverse edges — the hubness-data recall fix). Round 3: alpha
is an explicit static argument everywhere (typed param > deprecated
ZVEC_HNSW_PRUNE_ALPHA env override, resolved once at engine init)."""

import numpy as np
import pytest

from zvec_tpu.ops.hnsw import _pairwise_sims, _prune_keep
from zvec_tpu.typing import MetricType


def _mk(rng, b=4, c=48, d=16):
    import jax.numpy as jnp

    vecs = rng.standard_normal((b, c, d)).astype(np.float32)
    base = rng.standard_normal((b, d)).astype(np.float32)
    d2 = ((vecs - base[:, None, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)
    vecs = np.take_along_axis(vecs, order[:, :, None], 1)
    sims = -np.take_along_axis(d2, order, 1)  # DESC similarity (-d^2)
    nrm2 = (vecs**2).sum(-1)
    pair = _pairwise_sims(jnp.asarray(vecs), jnp.asarray(nrm2), MetricType.L2)
    return pair, jnp.asarray(sims), jnp.asarray(np.ones((b, c), bool))


def test_alpha_one_is_exact_rule(rng):
    pair, sims, valid = _mk(rng)
    base = np.asarray(_prune_keep(pair, sims, valid, 16, metric=MetricType.L2))
    same = np.asarray(
        _prune_keep(pair, sims, valid, 16, metric=MetricType.L2, alpha=1.0)
    )
    np.testing.assert_array_equal(base, same)
    # metric=None (callers without the knob) is also the exact rule
    none = np.asarray(_prune_keep(pair, sims, valid, 16))
    np.testing.assert_array_equal(base, none)


def test_alpha_keeps_superset(rng):
    pair, sims, valid = _mk(rng, b=8, c=64)
    k1 = np.asarray(_prune_keep(pair, sims, valid, 64, metric=MetricType.L2))
    k14 = np.asarray(
        _prune_keep(pair, sims, valid, 64, metric=MetricType.L2, alpha=1.4)
    )
    # relaxed rule keeps at least as many edges per row (max_out not binding)
    assert (k14.sum(1) >= k1.sum(1)).all()
    assert k14.sum() > k1.sum()  # and strictly more somewhere on random data


def test_alpha_cosine_transform(rng):
    import jax.numpy as jnp

    b, c, d = 4, 32, 12
    vecs = rng.standard_normal((b, c, d)).astype(np.float32)
    base = rng.standard_normal((b, d)).astype(np.float32)
    vn = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
    bn = base / np.linalg.norm(base, axis=-1, keepdims=True)
    cos = np.einsum("bcd,bd->bc", vn, bn)
    order = np.argsort(-cos, axis=1)
    vecs = np.take_along_axis(vecs, order[:, :, None], 1)
    sims = np.take_along_axis(cos, order, 1)
    nrm2 = (vecs**2).sum(-1)
    pair = _pairwise_sims(jnp.asarray(vecs), jnp.asarray(nrm2), MetricType.COSINE)
    valid = jnp.asarray(np.ones((b, c), bool))
    k1 = np.asarray(_prune_keep(pair, sims, valid, c, metric=MetricType.COSINE))
    k15 = np.asarray(
        _prune_keep(pair, sims, valid, c, metric=MetricType.COSINE, alpha=1.5)
    )
    assert (k15.sum(1) >= k1.sum(1)).all()


def test_host_twin_alpha(rng):
    from zvec_tpu.core.hnsw import _host_prune_compact

    n, d, C = 200, 16, 64
    X = rng.standard_normal((n, d)).astype(np.float32)
    nrm = (X**2).sum(1)
    S = -(nrm[:, None] + nrm[None, :] - 2 * (X @ X.T))
    np.fill_diagonal(S, -np.inf)
    cand = np.argsort(-S, axis=1)[:, :C].astype(np.int64)
    out1 = _host_prune_compact(X, S, cand, MetricType.L2, C)
    out14 = _host_prune_compact(X, S, cand, MetricType.L2, C, alpha=1.4)
    # kept (non-backfilled) prefix is a superset: compare kept counts via
    # how many ids appear in dominance-kept positions — proxy: both compact
    # to C slots with backfill, so assert the relaxed KEEP retains the
    # alpha=1 keeps as a subset per row
    for r in range(0, n, 17):
        s1 = set(out1[r][out1[r] >= 0].tolist())
        s14 = set(out14[r][out14[r] >= 0].tolist())
        assert s1 == s14  # same candidate pool, max_out=C: same id SET
    # with a binding degree cap the relaxed rule admits farther neighbors
    t1 = _host_prune_compact(X, S, cand, MetricType.L2, 8, alpha=1.4)
    t0 = _host_prune_compact(X, S, cand, MetricType.L2, 8)
    assert not np.array_equal(t0, t1)  # alpha changes the chosen edges


def test_engine_recall_with_alpha(rng):
    """End-to-end: alpha=1.3 graph answers queries at least as well as the
    oracle floor on gaussian data (the regime alpha exists for) — alpha now
    flows through the typed HnswIndexParam.prune_alpha field."""
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam

    n, d, k = 3000, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((25, d)).astype(np.float32)
    eng = HnswEngine(
        MetricType.L2, d,
        HnswIndexParam(MetricType.L2, m=12, ef_construction=100, prune_alpha=1.3),
    )
    assert eng.prune_alpha == 1.3
    eng.bind_data(lambda: X, lambda: 1)
    _, idx = eng.search(Q, k, param=HnswQueryParam(ef=120))
    d2 = ((X[None] - Q[:, None]) ** 2).sum(-1)
    expect = np.argsort(d2, axis=1)[:, :k]
    hits = sum(
        len(set(idx[i][idx[i] >= 0].tolist()) & set(expect[i].tolist()))
        for i in range(len(Q))
    )
    assert hits / (len(Q) * k) >= 0.85


def test_backfill_alpha_diversifies_tail(rng):
    """backfill_alpha inserts a second (alpha-relaxed) prune round over the
    pruned pool: kept tier identical to alpha=1.0, backfill tail reordered
    toward diverse (mutually non-dominating) edges."""
    import jax.numpy as jnp

    from zvec_tpu.ops.hnsw import _compact_keep_backfill, _prune_keep

    pair, sims, valid = _mk(rng, b=6, c=64)
    keep = _prune_keep(pair, sims, valid, 64, metric=MetricType.L2)
    ids = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32), (6, 64))
    base_ids, _ = _compact_keep_backfill(keep, valid, ids, sims, 16)
    div_ids, _ = _compact_keep_backfill(
        keep, valid, ids, sims, 16,
        pair=pair, metric=MetricType.L2, backfill_alpha=1.2,
    )
    base_ids, div_ids = np.asarray(base_ids), np.asarray(div_ids)
    kept = np.asarray(keep)
    for r in range(6):
        nk = int(kept[r].sum())
        upto = min(nk, 16)
        # the exact dominance tier is untouched
        np.testing.assert_array_equal(base_ids[r][:upto], div_ids[r][:upto])
    # and somewhere the backfill tail actually changed
    assert not np.array_equal(base_ids, div_ids)


def test_backfill_alpha_host_twin(rng):
    from zvec_tpu.core.hnsw import _host_prune_compact

    n, d, C = 300, 16, 64
    X = rng.standard_normal((n, d)).astype(np.float32)
    nrm = (X**2).sum(1)
    S = -(nrm[:, None] + nrm[None, :] - 2 * (X @ X.T))
    np.fill_diagonal(S, -np.inf)
    cand = np.argsort(-S, axis=1)[:, :C].astype(np.int64)
    plain = _host_prune_compact(X, S, cand, MetricType.L2, 12)
    div = _host_prune_compact(
        X, S, cand, MetricType.L2, 12, backfill_alpha=1.2
    )
    assert not np.array_equal(plain, div)  # tail reordered
    # same id POOL at full width (backfill only reorders, never drops)
    full_p = _host_prune_compact(X, S, cand, MetricType.L2, C)
    full_d = _host_prune_compact(X, S, cand, MetricType.L2, C, backfill_alpha=1.2)
    for r in range(0, n, 37):
        assert set(full_p[r][full_p[r] >= 0]) == set(full_d[r][full_d[r] >= 0])


def test_backfill_alpha_engine_param(rng):
    """backfill_alpha flows through HnswIndexParam and still answers."""
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam

    n, d, k = 3000, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((25, d)).astype(np.float32)
    eng = HnswEngine(
        MetricType.L2, d,
        HnswIndexParam(MetricType.L2, m=12, ef_construction=100,
                       backfill_alpha=1.2),
    )
    assert eng.backfill_alpha == 1.2
    eng.bind_data(lambda: X, lambda: 1)
    _, idx = eng.search(Q, k, param=HnswQueryParam(ef=120))
    d2 = ((X[None] - Q[:, None]) ** 2).sum(-1)
    expect = np.argsort(d2, axis=1)[:, :k]
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(25))
    assert hits / (25 * k) >= 0.85
