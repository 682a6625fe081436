"""HNSW engine tests: recall vs brute force, filters, persistence.

Reference analog: `tests/core/hnsw_streamer_test.cc` / `hnsw_searcher_test.cpp`
pattern — random vectors, build, assert recall against exact scan.
"""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    HnswIndexParam,
    HnswQueryParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.core.hnsw import HnswEngine
from zvec_tpu.typing import IndexType


def brute_topk(qs, xs, metric, k):
    if metric == MetricType.L2:
        d = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
        return np.argsort(d, axis=1)[:, :k]
    sims = qs @ xs.T
    if metric == MetricType.COSINE:
        sims = sims / (
            np.linalg.norm(qs, axis=1, keepdims=True)
            * np.linalg.norm(xs, axis=1).clip(1e-12)[None, :]
        )
    return np.argsort(-sims, axis=1)[:, :k]


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP, MetricType.COSINE])
def test_hnsw_recall(rng, metric):
    n, d, k = 2500, 16, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((20, d)).astype(np.float32)

    engine = HnswEngine(metric, d, HnswIndexParam(metric, m=8, ef_construction=60))
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=HnswQueryParam(ef=100))

    expect = brute_topk(qs, xs, metric, k)
    hits = sum(
        len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs))
    )
    recall = hits / (len(qs) * k)
    assert recall >= 0.85, f"recall@10 = {recall}"


def test_hnsw_linear_param_exact(rng):
    n, d, k = 1500, 16, 5
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((4, d)).astype(np.float32)
    engine = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=8, ef_construction=40)
    )
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=HnswQueryParam(ef=50, is_linear=True))
    expect = brute_topk(qs, xs, MetricType.L2, k)
    for i in range(4):
        assert set(idx[i]) == set(expect[i])


def test_hnsw_filtered_search(rng):
    n, d, k = 2000, 16, 5
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((5, d)).astype(np.float32)
    mask = rng.random(n) < 0.3
    engine = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=8, ef_construction=60)
    )
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, mask=mask, param=HnswQueryParam(ef=120))
    # every returned id must pass the filter
    for row in idx:
        for i in row:
            if i >= 0:
                assert mask[i]
    # decent recall among allowed
    allowed = np.nonzero(mask)[0]
    expect = brute_topk(qs, xs[allowed], MetricType.L2, k)
    expect_ids = allowed[expect]
    hits = sum(
        len(set(idx[i][idx[i] >= 0]) & set(expect_ids[i])) for i in range(5)
    )
    assert hits / (5 * k) >= 0.6


def test_hnsw_through_collection(tmp_path, rng):
    n, d = 1500, 12
    schema = CollectionSchema("col_h",
        fields=[FieldSchema("i", DataType.INT64)],
        vectors=[
            VectorSchema(
                "emb",
                DataType.VECTOR_FP32,
                d,
                HnswIndexParam(MetricType.L2, m=8, ef_construction=50),
            )
        ],
        max_doc_count_per_segment=n,  # force seal+build on rotation
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "h"), schema)
    xs = rng.standard_normal((n + 10, d)).astype(np.float32)
    for s in range(0, n + 10, 500):
        e = min(s + 500, n + 10)
        c.insert(
            [
                Doc(id=f"x{i}", vectors={"emb": xs[i]}, fields={"i": i})
                for i in range(s, e)
            ]
        )
    # rotation happened at n docs: one sealed (indexed) + writing segment
    assert len(c._impl.segments) == 1
    assert "emb" in c._impl.segments[0].meta.indexes
    assert c.stats.index_completeness["emb"] == 1.0

    res = c.query(
        VectorQuery("emb", vector=xs[42], param=HnswQueryParam(ef=100)), topk=5
    )
    assert res[0].id == "x42"

    # persistence: reopen reloads the graph without rebuilding
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "h"))
    res2 = c2.query(
        VectorQuery("emb", vector=xs[7], param=HnswQueryParam(ef=100)), topk=5
    )
    assert res2[0].id == "x7"
    eng = c2._impl.segments[0]._engines["emb"]
    assert eng.index_type == IndexType.HNSW
    assert eng._loaded_aux is not None  # graph came from disk
    c2._impl.close()


def test_hnsw_radius_range_search(rng):
    n, d = 1500, 8
    xs = rng.standard_normal((n, d)).astype(np.float32)
    engine = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=8, ef_construction=40)
    )
    engine.bind_data(lambda: xs, lambda: 1)
    q = xs[3:4]
    sims, idx = engine.search(q, 20, param=HnswQueryParam(ef=50, radius=4.0))
    # every returned doc is within squared-L2 distance 4.0
    for j, i in enumerate(idx[0]):
        if i >= 0:
            d2 = ((q[0] - xs[i]) ** 2).sum()
            assert d2 <= 4.0 + 1e-3
    assert idx[0][0] == 3  # self within radius


def test_hnsw_clustered_high_recall(rng):
    """Clustered data (the realistic regime): near-perfect recall at small ef.
    Guards graph-build quality — measured 1.000 at ef=32 on-chip at 30K/1M."""
    n, d, k = 3000, 32, 10
    centers = rng.standard_normal((60, d)).astype(np.float32)
    xs = (centers[rng.integers(0, 60, n)] + 0.25 * rng.standard_normal((n, d))).astype(
        np.float32
    )
    qs = xs[rng.choice(n, 16, replace=False)] + 0.05 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    engine = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=8, ef_construction=80)
    )
    engine.bind_data(lambda: xs, lambda: 1)
    _, idx = engine.search(qs, k, param=HnswQueryParam(ef=48))
    expect = brute_topk(qs, xs, MetricType.L2, k)
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(16))
    assert hits / (16 * k) >= 0.95


def test_hnsw_quantized_brute_force_path_dequants(rng):
    """The is_linear / small-n brute-force branch must score quantized codes
    asymmetrically (dequant epilogue), matching the fp32 oracle ranking."""
    from zvec_tpu.typing import QuantizeType
    from zvec_tpu.model.param.param import QueryParam

    n, d, k = 400, 16, 10  # below the brute-force threshold
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((8, d)).astype(np.float32)
    engine = HnswEngine(
        MetricType.L2,
        d,
        HnswIndexParam(MetricType.L2, m=8, quantize_type=QuantizeType.INT8),
    )
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=HnswQueryParam(ef=64))
    expect = brute_topk(qs, xs, MetricType.L2, k)
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs)))
    assert hits / (len(qs) * k) >= 0.9  # int8 rounding tolerance
    # scores must be in the fp32 distance range, not raw-int8-code range
    d0 = ((qs[0] - xs[expect[0, 0]]) ** 2).sum()
    assert sims[0, 0] == pytest.approx(-d0, rel=0.1, abs=0.5)


def test_hnsw_ip_second_rebuild_reaugments(rng):
    """A second rebuild of an IP-metric engine must re-apply MIPS augmentation
    (the search metric must not latch to L2)."""
    n, d, k = 1500, 16, 5
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((6, d)).astype(np.float32)
    version = [1]
    engine = HnswEngine(MetricType.IP, d, HnswIndexParam(MetricType.IP, m=8))
    engine.bind_data(lambda: xs, lambda: version[0])
    _sims, idx1 = engine.search(qs, k, param=HnswQueryParam(ef=100))
    version[0] = 2  # force a rebuild on the next search
    sims, idx2 = engine.search(qs, k, param=HnswQueryParam(ef=100))
    expect = brute_topk(qs, xs, MetricType.IP, k)
    hits = sum(len(set(idx2[i][idx2[i] >= 0]) & set(expect[i])) for i in range(len(qs)))
    assert hits / (len(qs) * k) >= 0.85
    # top-1 similarity equals the true inner product
    assert sims[0, 0] == pytest.approx(float(qs[0] @ xs[expect[0, 0]]), rel=1e-3)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP, MetricType.COSINE])
def test_hnsw_bf16_search_codes(rng, metric, monkeypatch):
    """ZVEC_HNSW_BF16_SEARCH=1: traversal runs on bf16 codes (half the
    gather bandwidth) but returned scores are exact fp32 (host rescore)."""
    monkeypatch.setenv("ZVEC_HNSW_BF16_SEARCH", "1")
    n, d, k = 2500, 16, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((12, d)).astype(np.float32)

    engine = HnswEngine(metric, d, HnswIndexParam(metric, m=8, ef_construction=60))
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=HnswQueryParam(ef=100))
    assert engine._codes.dtype == np.dtype("bfloat16")

    expect = brute_topk(qs, xs, metric, k)
    hits = sum(
        len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs))
    )
    recall = hits / (len(qs) * k)
    assert recall >= 0.85, f"recall@10 = {recall}"

    # exact fp32 score parity on the returned hits
    for i in range(len(qs)):
        for j in range(k):
            r = int(idx[i][j])
            if r < 0:
                continue
            if metric == MetricType.L2:
                exp = -((qs[i] - xs[r]) ** 2).sum()
            elif metric == MetricType.IP:
                exp = float(qs[i] @ xs[r])
            else:
                exp = float(
                    qs[i] @ xs[r]
                    / (np.linalg.norm(qs[i]) * max(np.linalg.norm(xs[r]), 1e-12))
                )
            assert sims[i][j] == pytest.approx(exp, rel=2e-4, abs=2e-4)


def test_hnsw_filtered_cross_cluster(rng):
    """Filter excludes the query's own cluster: the ef-capped beam strands
    inside it (zero filtered hits) — the exact-masked rescan safety net must
    return the true filtered top-k (reference walks its unbounded candidate
    heap under the scan budget instead, `hnsw_algorithm.cc:180-278`)."""
    n, d, k = 6000, 32, 5
    kc = 4
    centers = rng.standard_normal((kc, d)).astype(np.float32) * 6.0
    asn = np.arange(n) % kc
    xs = (centers[asn] + rng.standard_normal((n, d)).astype(np.float32)).astype(
        np.float32
    )
    engine = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=12, ef_construction=80)
    )
    engine.bind_data(lambda: xs, lambda: 1)
    qs = (centers[0] + 0.3 * rng.standard_normal((4, d))).astype(np.float32)
    mask = asn == 1  # only the far cluster passes
    sims, idx = engine.search(qs, k, mask=mask, param=HnswQueryParam(ef=64))
    ok = np.flatnonzero(mask)
    d2 = ((qs[:, None, :] - xs[ok][None, :, :]) ** 2).sum(-1)
    exp = ok[np.argsort(d2, axis=1)[:, :k]]
    for i in range(4):
        got = idx[i][idx[i] >= 0]
        assert len(got) == k, f"query {i}: only {len(got)} filtered hits"
        assert set(got) == set(exp[i]), (got, exp[i])


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_hnsw_bf16_build_codes(rng, metric, monkeypatch):
    """ZVEC_BUILD_BF16=1 (the >2M default on TPU): the whole kNN-graph build
    runs on bf16 device codes via the one-pass exact bf16 matmul path
    (_exact_dots). Graph quality must hold vs the brute-force oracle."""
    monkeypatch.setenv("ZVEC_BUILD_BF16", "1")
    monkeypatch.setenv("ZVEC_HNSW_CLUSTERED", "1")  # exercise the 10M path
    n, d, k = 9000, 24, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((12, d)).astype(np.float32)

    engine = HnswEngine(metric, d, HnswIndexParam(metric, m=12, ef_construction=80))
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=HnswQueryParam(ef=128))
    expect = brute_topk(qs, xs, metric, k)
    hits = sum(
        len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs))
    )
    recall = hits / (len(qs) * k)
    assert recall >= 0.8, f"recall@10 = {recall}"


def test_reverse_candidates_scipy_matches_argsort(rng):
    """The compiled CSR->CSC reverse-edge grouping must produce exactly the
    argsort twin's output (same srcs, same order, same cap truncation)."""
    from zvec_tpu.core.hnsw import (
        _reverse_candidates,
        _reverse_candidates_argsort,
    )

    for n, m, cap in ((500, 12, 8), (200, 6, 16), (64, 4, 4)):
        adj = rng.integers(0, n, (n, m)).astype(np.int32)
        adj[rng.random((n, m)) < 0.15] = -1  # padding holes
        a = _reverse_candidates(adj, cap)
        b = _reverse_candidates_argsort(adj, cap)
        np.testing.assert_array_equal(a, b)
    # empty graph
    empty = np.full((32, 5), -1, np.int32)
    np.testing.assert_array_equal(
        _reverse_candidates(empty, 4), np.full((32, 4), -1, np.int32)
    )


@pytest.mark.parametrize("c,max_out,chunk", [(37, 8, 16), (16, 4, 16), (5, 3, 16), (200, 50, 16), (48, 8, 7)])
def test_prune_keep_matches_naive(rng, c, max_out, chunk):
    """The block-sequential dominance prune must keep exactly the same
    candidates as the naive best-first walk it replaced (reference
    `update_neighbors`, `hnsw_algorithm.cc:394-430`)."""
    import jax.numpy as jnp

    from zvec_tpu.ops.hnsw import NEG_INF, _prune_keep

    b = 9
    pair = rng.normal(size=(b, c, c)).astype(np.float32)
    pair = (pair + pair.transpose(0, 2, 1)) / 2  # symmetric like real sims
    sims = -np.sort(-rng.normal(size=(b, c)).astype(np.float32), axis=1)
    valid = rng.random((b, c)) > 0.2
    sims[~valid] = NEG_INF
    # inject exact ties pair[i,j] == sims[i] to pin the >= reject rule
    pair[0, 3, 1] = pair[0, 1, 3] = sims[0, 3]

    got = np.asarray(
        _prune_keep(jnp.asarray(pair), jnp.asarray(sims), jnp.asarray(valid),
                    max_out, chunk=chunk)
    )

    want = np.zeros((b, c), bool)
    for bi in range(b):
        kept = []
        for i in range(c):
            if not valid[bi, i] or len(kept) >= max_out:
                continue
            if all(pair[bi, i, j] < sims[bi, i] for j in kept):
                want[bi, i] = True
                kept.append(i)
    np.testing.assert_array_equal(got, want)


def test_visited_bytes_mode_matches_bitset(rng):
    """Bytemap visited (VisitByteMap analog, `visit_filter.h:360`): same
    hashed slot count as the bitset -> recall within noise of it, and well
    above the oracle floor."""
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType

    n, d, k = 4000, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((32, d)).astype(np.float32)
    eng = HnswEngine(
        MetricType.L2, d, HnswIndexParam(MetricType.L2, m=12, ef_construction=100)
    )
    eng.bind_data(lambda: X, lambda: 1)
    d2 = ((Q[:, None] - X[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(param):
        _, idx = eng.search(Q, k, param=param)
        return sum(
            len(set(idx[i][idx[i] >= 0]) & set(gt[i])) for i in range(len(Q))
        ) / (len(Q) * k)

    r_bits = recall(HnswQueryParam(ef=96, visited_bits=14))
    r_bytes = recall(HnswQueryParam(ef=96, visited_bits=14, visited_bytes=True))
    assert r_bytes >= r_bits - 0.02, (r_bytes, r_bits)
    assert r_bytes >= 0.9

    # filtered path (track_res merge): no duplicate ids may survive
    mask = np.zeros(n, bool)
    mask[::3] = True
    _, idxf = eng.search(
        Q, k, mask=mask,
        param=HnswQueryParam(ef=96, visited_bits=14, visited_bytes=True),
    )
    for r in range(len(Q)):
        got = idxf[r][idxf[r] >= 0]
        assert len(got) == len(set(got.tolist())), "duplicate hits"
        assert all(mask[g] for g in got)


@pytest.mark.parametrize("mode", ["int8", "bf16"])
def test_hnsw_routed_traversal(rng, mode):
    """route_quantize: the beam navigates reduced-precision codes, the final
    working set re-ranks against fp32 ON DEVICE — returned scores must be
    fp32-exact and recall must match the unrouted beam (reference
    quantize + full-precision refine pairing, `segment.cc:1591-1700`)."""
    n, d, k = 3000, 24, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((16, d)).astype(np.float32)
    gt = brute_topk(Q, xs, MetricType.L2, k)

    eng = HnswEngine(
        MetricType.L2, d,
        HnswIndexParam(MetricType.L2, m=12, ef_construction=80,
                       route_quantize=mode),
    )
    eng.bind_data(lambda: xs, lambda: 1)
    sims, idx = eng.search(Q, k, param=HnswQueryParam(ef=100))
    import jax.numpy as jnp

    assert eng._route is not None and (
        eng._route[0].dtype == (jnp.int8 if mode == "int8" else jnp.bfloat16)
    )
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(gt[i])) for i in range(len(Q)))
    assert hits / (len(Q) * k) >= 0.85

    # scores are fp32-exact (squared L2 similarity = -(d2))
    for i in range(len(Q)):
        for j in range(k):
            if idx[i, j] < 0:
                continue
            exact = -((xs[idx[i, j]] - Q[i]) ** 2).sum()
            assert abs(sims[i, j] - exact) < 1e-3, (i, j, sims[i, j], exact)

    # MIPS route: augmented-space quantization still converts back exactly
    eng2 = HnswEngine(
        MetricType.IP, d,
        HnswIndexParam(MetricType.IP, m=12, ef_construction=80,
                       route_quantize=mode),
    )
    eng2.bind_data(lambda: xs, lambda: 1)
    sims2, idx2 = eng2.search(Q, k, param=HnswQueryParam(ef=100))
    gt_ip = brute_topk(Q, xs, MetricType.IP, k)
    hits2 = sum(
        len(set(idx2[i][idx2[i] >= 0]) & set(gt_ip[i])) for i in range(len(Q))
    )
    assert hits2 / (len(Q) * k) >= 0.85
    for i in range(0, len(Q), 4):
        for j in range(k):
            if idx2[i, j] < 0:
                continue
            assert abs(sims2[i, j] - float(xs[idx2[i, j]] @ Q[i])) < 1e-2


def test_hnsw_route_param_roundtrip(tmp_path, rng):
    """route_quantize survives schema dump/load and the filtered routed
    path returns only mask-true rows with exact scores."""
    from zvec_tpu import (
        CollectionSchema, DataType, Doc, FieldSchema, VectorSchema, VectorQuery,
    )

    n, d = 2000, 16
    xs = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        "routed",
        fields=[FieldSchema("num", DataType.INT32)],
        vectors=[VectorSchema(
            "vec", DataType.VECTOR_FP32, d,
            HnswIndexParam(MetricType.L2, m=8, ef_construction=60,
                           route_quantize="int8"),
        )],
    )
    path = str(tmp_path / "routed")
    col = zvec_tpu.create_and_open(path, schema)
    for lo in range(0, n, 1000):
        col.insert([Doc(id=str(i), fields={"num": i}, vectors={"vec": xs[i]})
                    for i in range(lo, min(lo + 1000, n))])
    col.optimize()
    col.flush()
    col._impl.close()

    col = zvec_tpu.open(path)
    vp = col.schema.vectors[0].index_param
    assert vp.route_quantize == "int8"
    q = rng.standard_normal(d).astype(np.float32)
    docs = col.query(
        VectorQuery("vec", vector=q), topk=5, filter="num >= 1000",
        output_fields=["num"],
    )
    assert docs and all(doc.field("num") >= 1000 for doc in docs)
    col._impl.close()


def test_approx_merge_and_done_frac_knobs(tmp_path):
    """approx_merge swaps per-step merges to lax.approx_max_k (exact on the
    CPU backend, so results match the default path bit-for-bit here);
    done_frac < 1 stops the batch loop early but every returned row must
    still be a valid scored doc. TPU recall/qps impact measured separately
    (benchmarks/measure_10m_knobs.py)."""
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        HnswIndexParam,
        HnswQueryParam,
        MetricType,
        VectorSchema,
    )

    rng = np.random.default_rng(42)
    n, d = 3000, 32
    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        "approxmerge",
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, d,
                              HnswIndexParam(MetricType.L2, m=16,
                                             ef_construction=100))],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    for lo in range(0, n, 1024):
        col.insert([Doc(id=str(i), vectors={"v": X[i]})
                    for i in range(lo, min(lo + 1024, n))])
    col.optimize()
    Q = rng.standard_normal((16, d)).astype(np.float32)

    base = col.batch_query("v", Q, topk=10, output_fields=[],
                           param=HnswQueryParam(ef=64))
    apx = col.batch_query("v", Q, topk=10, output_fields=[],
                          param=HnswQueryParam(ef=64, approx_merge=True))
    overlap = np.mean([
        len({d.id for d in a} & {d.id for d in b}) / 10
        for a, b in zip(base, apx)
    ])
    assert overlap >= 0.95  # exact fallback on CPU -> expected 1.0

    cut = col.batch_query("v", Q, topk=10, output_fields=[],
                          param=HnswQueryParam(ef=64, done_frac=0.9))
    for row in cut:
        assert 0 < len(row) <= 10
        for doc in row:
            assert 0 <= int(doc.id) < n

    with pytest.raises(ValueError):
        HnswQueryParam(ef=64, done_frac=0.3)
    with pytest.raises(ValueError):
        HnswQueryParam(ef=64, done_frac=1.5)
