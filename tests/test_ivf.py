"""IVF engine tests (reference analog: `tests/core/ivf_searcher_test.cc`,
`opt_kmeans_cluster_test.cc`)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    IVFIndexParam,
    IVFQueryParam,
    MetricType,
    QuantizeType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.core.ivf import IvfEngine
from zvec_tpu.ops.kmeans import kmeanspp_seed, lloyd

import jax.numpy as jnp


def test_kmeans_converges(rng):
    # three well-separated blobs
    centers = np.array([[0, 0], [10, 0], [0, 10]], dtype=np.float32)
    pts = np.concatenate(
        [c + rng.standard_normal((100, 2)).astype(np.float32) * 0.5 for c in centers]
    )
    seeds = kmeanspp_seed(pts, 3, rng)
    cents, assign = lloyd(jnp.asarray(pts), jnp.asarray(seeds), iters=10)
    cents = np.asarray(cents)
    # every true center has a learned centroid within 0.5
    for c in centers:
        assert np.min(np.linalg.norm(cents - c, axis=1)) < 0.5
    # assignments form 3 groups of ~100
    counts = np.bincount(np.asarray(assign), minlength=3)
    assert (np.abs(counts - 100) <= 5).all()


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_ivf_recall(rng, metric):
    n, d, k = 4000, 16, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((10, d)).astype(np.float32)
    engine = IvfEngine(metric, d, IVFIndexParam(metric, n_list=64, n_iters=8))
    engine.bind_data(lambda: xs, lambda: 1)
    _, idx = engine.search(qs, k, param=IVFQueryParam(nprobe=16))
    if metric == MetricType.L2:
        dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
        expect = np.argsort(dmat, axis=1)[:, :k]
    else:
        expect = np.argsort(-(qs @ xs.T), axis=1)[:, :k]
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(10))
    assert hits / (10 * k) >= 0.7


def test_ivf_nprobe_monotone(rng):
    n, d, k = 4000, 16, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((10, d)).astype(np.float32)
    engine = IvfEngine(MetricType.L2, d, IVFIndexParam(MetricType.L2, n_list=64))
    engine.bind_data(lambda: xs, lambda: 1)
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :k]

    def recall(nprobe):
        _, idx = engine.search(qs, k, param=IVFQueryParam(nprobe=nprobe))
        return sum(
            len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(10)
        ) / (10 * k)

    r2, r16, r64 = recall(2), recall(16), recall(64)
    assert r2 <= r16 + 0.05 and r16 <= r64 + 0.02
    assert r64 >= 0.99  # nprobe = n_list == exact


def test_ivf_soar_spill(rng):
    n, d = 3000, 12
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((8, d)).astype(np.float32)
    plain = IvfEngine(MetricType.L2, d, IVFIndexParam(MetricType.L2, n_list=48))
    plain.bind_data(lambda: xs, lambda: 1)
    soar = IvfEngine(
        MetricType.L2, d, IVFIndexParam(MetricType.L2, n_list=48, use_soar=True)
    )
    soar.bind_data(lambda: xs, lambda: 1)
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :10]

    def recall(e):
        _, idx = e.search(qs, 10, param=IVFQueryParam(nprobe=4))
        return sum(
            len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(8)
        ) / 80

    assert recall(soar) >= recall(plain) - 0.05  # spill never much worse


def test_ivf_small_corpus_exact(rng):
    xs = rng.standard_normal((200, 8)).astype(np.float32)
    qs = rng.standard_normal((3, 8)).astype(np.float32)
    engine = IvfEngine(MetricType.L2, 8, IVFIndexParam(MetricType.L2, n_list=16))
    engine.bind_data(lambda: xs, lambda: 1)
    _, idx = engine.search(qs, 5, param=IVFQueryParam(nprobe=1))
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :5]
    for i in range(3):  # below brute-force threshold => exact despite nprobe=1
        assert set(idx[i]) == set(expect[i])


def test_ivf_quantized_with_filter_through_collection(tmp_path, rng):
    """Deep-style config: IVF + hybrid filter (BASELINE config #4 analog)."""
    d = 16
    schema = CollectionSchema(
        "ivf",
        fields=[zvec_tpu.FieldSchema("grp", DataType.INT64)],
        vectors=[
            VectorSchema(
                "e",
                DataType.VECTOR_FP32,
                d,
                IVFIndexParam(
                    MetricType.L2, n_list=32, quantize_type=QuantizeType.INT8
                ),
            )
        ],
        max_doc_count_per_segment=2000,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "ivf"), schema)
    xs = rng.standard_normal((2100, d)).astype(np.float32)
    for s in range(0, 2100, 700):
        c.insert(
            [
                Doc(id=f"v{i}", vectors={"e": xs[i]}, fields={"grp": i % 4})
                for i in range(s, min(s + 700, 2100))
            ]
        )
    assert "e" in c._impl.segments[0].meta.indexes
    hits = 0
    for qi in range(8):
        res = c.query(
            VectorQuery("e", vector=xs[qi], param=IVFQueryParam(nprobe=12)),
            topk=5,
            filter="grp = 1",
        )
        allowed = [i for i in range(2100) if i % 4 == 1]
        dmat = ((xs[qi][None] - xs[allowed]) ** 2).sum(1)
        expect = {f"v{allowed[j]}" for j in np.argsort(dmat)[:5]}
        hits += len({r.id for r in res} & expect)
        assert all(int(r.id[1:]) % 4 == 1 for r in res)
    assert hits / 40 >= 0.5

    # persistence
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "ivf"))
    res = c2.query(
        VectorQuery("e", vector=xs[3], param=IVFQueryParam(nprobe=32)), topk=3
    )
    assert res[0].id == "v3"
    c2._impl.close()


def test_stratified_train(rng):
    from zvec_tpu.ops.kmeans import stratified_train

    xs = rng.standard_normal((5000, 8)).astype(np.float32)
    cents = stratified_train(xs, 300, rng)
    assert cents.shape == (300, 8)
    assert np.isfinite(cents).all()
    # centroids cover the data: average point-to-centroid distance is finite/small
    d = ((xs[:500, None, :] - cents[None, :, :]) ** 2).sum(-1).min(1)
    assert d.mean() < ((xs[:500] ** 2).sum(1)).mean()


def test_ivf_skewed_cluster_no_padding_blowup(rng):
    """One dominant cluster must not pad every list to its length: memory is
    O(N*D), and recall on the dominant cluster stays exact-ish."""
    from zvec_tpu.core.ivf import IvfEngine
    from zvec_tpu.model.param.param import IVFIndexParam, IVFQueryParam
    from zvec_tpu.typing import MetricType

    d = 16
    # 20k rows in one tight cluster + 2k spread over 63 others
    big = rng.standard_normal((20000, d)).astype(np.float32) * 0.05
    rest_centers = rng.standard_normal((63, d)).astype(np.float32) * 10
    rest = (
        rest_centers[rng.integers(0, 63, 2000)]
        + rng.standard_normal((2000, d)).astype(np.float32) * 0.05
    )
    xs = np.concatenate([big, rest]).astype(np.float32)
    engine = IvfEngine(
        MetricType.L2, d, IVFIndexParam(MetricType.L2, n_list=64, n_iters=5)
    )
    engine.bind_data(lambda: xs, lambda: 1)
    engine.search(xs[:1], 1, param=IVFQueryParam(nprobe=4))  # build
    # padded storage must stay near N rows, not K * Lmax
    total_slots = engine._lists_ids.shape[0] * engine._lists_ids.shape[1]
    assert total_slots < 3.5 * len(xs), (  # old global-Lmax padding was ~58x
        f"padding blowup: {total_slots} slots for {len(xs)} rows"
    )
    # a query inside the dominant cluster still finds its true neighbors
    q = big[7][None, :]
    d2 = ((xs - q) ** 2).sum(1)
    expect = set(np.argsort(d2)[:10])
    sims, idx = engine.search(q, 10, param=IVFQueryParam(nprobe=8))
    assert len(set(idx[0][idx[0] >= 0]) & expect) >= 8


def test_ivf_int4_packed(rng):
    from zvec_tpu.core.ivf import IvfEngine
    from zvec_tpu.model.param.param import IVFIndexParam, IVFQueryParam
    from zvec_tpu.typing import MetricType, QuantizeType

    n, d, k = 4000, 32, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((5, d)).astype(np.float32)
    engine = IvfEngine(
        MetricType.L2,
        d,
        IVFIndexParam(MetricType.L2, n_list=32, quantize_type=QuantizeType.INT4),
    )
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=IVFQueryParam(nprobe=8))
    assert engine._lists_codes.shape[-1] == d // 2  # packed bytes per row
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :k]
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs)))
    assert hits / (len(qs) * k) >= 0.5


def test_ivf_filtered_cross_cluster_safety_net(rng):
    """Filter excludes every probed list's cluster: the deficient-query
    re-probe over all lists must return the exact filtered top-k (the
    reference would return whatever the nprobe lists contain — nothing)."""
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        FieldSchema,
        IVFIndexParam,
        IVFQueryParam,
        MetricType,
        VectorQuery,
        VectorSchema,
    )
    import shutil

    n, d, k = 6000, 24, 5
    centers = rng.standard_normal((4, d)).astype(np.float32) * 6
    asn = np.arange(n) % 4
    X = (centers[asn] + rng.standard_normal((n, d))).astype(np.float32)
    import tempfile
    path = tempfile.mkdtemp(prefix="ivf_filter_net_") + "/col"
    shutil.rmtree(path, ignore_errors=True)
    schema = CollectionSchema("col_iv",
        fields=[FieldSchema("g", DataType.INT32)],
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, d, IVFIndexParam(MetricType.L2))],
    )
    col = zvec_tpu.create_and_open(path, schema)
    for lo in range(0, n, 1000):
        col.insert(
            [Doc(id=str(i), fields={"g": int(asn[i])}, vectors={"v": X[i]})
             for i in range(lo, lo + 1000)]
        )
    col.flush()
    col.optimize()
    q = (centers[0] + 0.3 * rng.standard_normal(d)).astype(np.float32)
    hits = col.query(
        VectorQuery("v", vector=q, param=IVFQueryParam(nprobe=8)),
        topk=k, filter="g = 1", output_fields=["g"],
    )
    assert len(hits) == k, hits
    assert all(h.fields["g"] == 1 for h in hits)
    ok = np.flatnonzero(asn == 1)
    d2 = ((X[ok] - q) ** 2).sum(1)
    exp = {str(i) for i in ok[np.argsort(d2)[:k]]}
    assert {h.id for h in hits} == exp
    col._impl.close()


def test_ivf_probe_max_scan_oracle():
    """Scan-budget parity vs a hand-computed oracle (`ivf_searcher.cc:222-237`:
    probe centroids in proximity order WHILE total_scan < max_scan_count; a
    list that starts under budget is scanned in full)."""
    from zvec_tpu.core.ivf import ivf_probe_core

    d, L = 4, 3
    # 4 well-separated centroids on an axis; the query at origin probes them
    # in order 0, 1, 2, 3 unambiguously
    cents = np.array([[1, 0, 0, 0], [2, 0, 0, 0], [3, 0, 0, 0], [4, 0, 0, 0]],
                     dtype=np.float32)
    # rows near their centroid; occupancy 3/2/3/3 (list 1 has one -1 pad)
    codes = np.stack([
        np.array([[1.0, i * 0.01, 0, 0] for i in range(L)], np.float32) * (c + 1)
        for c in range(4)
    ])
    ids = np.arange(12, dtype=np.int32).reshape(4, L)
    ids[1, 2] = -1  # occupancy: [3, 2, 3, 3]
    norms = (codes ** 2).sum(-1)
    norms[1, 2] = 0.0
    q = np.zeros((1, d), np.float32)

    def probe(max_scan):
        s, i = ivf_probe_core(
            jnp.asarray(q), jnp.asarray(cents), jnp.asarray(codes),
            jnp.asarray(norms), jnp.asarray(ids), None, None,
            metric=MetricType.L2, nprobe=4, topk=12, max_scan=max_scan,
        )
        return set(np.asarray(i)[0][np.asarray(i)[0] >= 0].tolist())

    all_ids = {int(v) for v in ids.ravel() if v >= 0}
    assert probe(0) == all_ids  # unbounded
    assert probe(100) == all_ids  # non-binding
    # budget 4: list0 starts at 0 < 4 -> scan 3; list1 starts at 3 < 4 ->
    # scan 2 (finishes over budget, still full); list2 starts at 5 >= 4 ->
    # stop. Oracle set = lists 0 and 1.
    assert probe(4) == {0, 1, 2, 3, 4}
    # budget 3: list0 (0 < 3) fully scanned; list1 starts at 3 >= 3 -> stop
    assert probe(3) == {0, 1, 2}
    # budget 1: the first list is always scanned (loop-head check at total=0)
    assert probe(1) == {0, 1, 2}


def test_ivf_max_scan_count_engine(rng):
    n, d, k = 4000, 16, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((16, d)).astype(np.float32)
    engine = IvfEngine(MetricType.L2, d, IVFIndexParam(MetricType.L2, n_list=64))
    engine.bind_data(lambda: xs, lambda: 1)
    _, full = engine.search(qs, k, param=IVFQueryParam(nprobe=64))
    # a budget of the whole corpus changes nothing
    _, same = engine.search(
        qs, k, param=IVFQueryParam(nprobe=64, max_scan_count=n)
    )
    assert np.array_equal(full, same)
    # a binding budget (clamped floor is 1000 rows = ~25% of corpus) must
    # cut recall vs the unbounded probe, but still return valid rows
    _, cut = engine.search(
        qs, k, param=IVFQueryParam(nprobe=64, max_scan_count=1)
    )
    assert (cut >= 0).any()
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :k]

    def recall(idx):
        return sum(
            len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs))
        ) / (len(qs) * k)

    assert recall(cut) < recall(full) - 0.05
    # ratio form derives the same cap: ceil(4000 * 0.0001) -> clamped to 1000
    _, cut_r = engine.search(
        qs, k, param=IVFQueryParam(nprobe=64, max_scan_ratio=0.0001)
    )
    assert np.array_equal(cut, cut_r)


def test_ivf_max_scan_param_validation():
    with pytest.raises(ValueError):
        IVFQueryParam(max_scan_count=-1)
    with pytest.raises(ValueError):
        IVFQueryParam(max_scan_ratio=1.5)
