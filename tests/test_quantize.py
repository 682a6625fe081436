"""Quantization tests (reference analog: `tests/core/` quantizer/metric tests,
`integer_quantizer_reformer_test.cc`, `quantized_integer_metric_test.cc`)."""

import jax.numpy as jnp
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
    MetricType,
    QuantizeType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.core.flat import FlatEngine
from zvec_tpu.model.param.param import FlatQueryParam
from zvec_tpu.ops.quantize import (
    decode,
    encode,
    mips_augment,
    mips_augment_query,
    train_quantizer,
)


def test_int8_roundtrip(rng):
    x = rng.standard_normal((100, 32)).astype(np.float32)
    p = train_quantizer(x, QuantizeType.INT8)
    codes = encode(x, QuantizeType.INT8, p)
    assert codes.dtype == np.int8
    rec = decode(codes, p)
    # quantization error bounded by ~scale/2 per element
    assert np.abs(rec - np.clip(x, np.quantile(x, 0.001), np.quantile(x, 0.999))).max() < p.scale


def test_fp16_roundtrip(rng):
    x = rng.standard_normal((10, 8)).astype(np.float32)
    codes = encode(x, QuantizeType.FP16, None)
    assert codes.dtype == np.float16
    np.testing.assert_allclose(decode(codes, None), x, rtol=1e-3, atol=1e-3)


def test_mips_augment(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    ax, max_n2 = mips_augment(x)
    aq = mips_augment_query(q)
    # L2 ranking on augmented == IP ranking on original
    d = ((aq[:, None, :] - ax[None, :, :]) ** 2).sum(-1)
    ip = q @ x.T
    for i in range(3):
        assert np.argmin(d[i]) == np.argmax(ip[i])


@pytest.mark.parametrize("qt", [QuantizeType.FP16, QuantizeType.INT8, QuantizeType.INT4])
@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.COSINE])
def test_flat_quantized_recall(rng, qt, metric):
    n, d, k = 800, 24, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((8, d)).astype(np.float32)
    fp32 = FlatEngine(metric, d, FlatIndexParam(metric))
    fp32.bind_data(lambda: xs, lambda: 1)
    quant = FlatEngine(metric, d, FlatIndexParam(metric, quantize_type=qt))
    quant.bind_data(lambda: xs, lambda: 1)
    _, exact = fp32.search(qs, k)
    _, approx = quant.search(qs, k)
    overlap = np.mean(
        [len(set(exact[i]) & set(approx[i])) / k for i in range(len(qs))]
    )
    floor = {QuantizeType.FP16: 0.99, QuantizeType.INT8: 0.8, QuantizeType.INT4: 0.5}[qt]
    assert overlap >= floor, f"{qt.name} overlap {overlap}"


def test_refiner_improves_int4(rng):
    n, d, k = 1000, 24, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((10, d)).astype(np.float32)
    fp32 = FlatEngine(MetricType.L2, d, FlatIndexParam(MetricType.L2))
    fp32.bind_data(lambda: xs, lambda: 1)
    quant = FlatEngine(
        MetricType.L2, d, FlatIndexParam(MetricType.L2, quantize_type=QuantizeType.INT4)
    )
    quant.bind_data(lambda: xs, lambda: 1)
    _, exact = fp32.search(qs, k)
    _, raw = quant.search(qs, k)
    _, refined = quant.search(qs, k, param=FlatQueryParam(is_using_refiner=True))
    ov = lambda got: np.mean(
        [len(set(exact[i]) & set(got[i])) / k for i in range(len(qs))]
    )
    assert ov(refined) >= ov(raw)
    assert ov(refined) >= 0.9


def test_quantized_collection_cosine_int8(tmp_path, rng):
    """GloVe-style config: cosine + int8 codes (BASELINE config #3 analog)."""
    d = 20
    schema = CollectionSchema("col_q",
        vectors=[
            VectorSchema(
                "e",
                DataType.VECTOR_FP32,
                d,
                HnswIndexParam(
                    MetricType.COSINE,
                    m=8,
                    ef_construction=60,
                    quantize_type=QuantizeType.INT8,
                ),
            )
        ],
        max_doc_count_per_segment=1500,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "q"), schema)
    xs = rng.standard_normal((1600, d)).astype(np.float32)
    for s in range(0, 1600, 800):
        c.insert([Doc(id=f"g{i}", vectors={"e": xs[i]}) for i in range(s, s + 800)])
    xn = xs / np.linalg.norm(xs, axis=1, keepdims=True)
    hits = 0
    for qi in range(10):
        res = c.query(
            VectorQuery(
                "e",
                vector=xs[qi],
                param=HnswQueryParam(ef=100, is_using_refiner=True),
            ),
            topk=10,
        )
        got = {int(r.id[1:]) for r in res}
        expect = set(np.argsort(-(xn @ xn[qi]))[:10].tolist())
        hits += len(got & expect)
    assert hits / 100 >= 0.8
    c._impl.close()


def test_int4_nibble_packing_roundtrip(rng):
    from zvec_tpu.ops.quantize import pack_int4, unpack_int4

    for d in (16, 17, 128):
        codes = rng.integers(-7, 8, (40, d)).astype(np.int8)
        packed = pack_int4(codes)
        assert packed.shape == (40, (d + 1) // 2)
        np.testing.assert_array_equal(unpack_int4(packed, d), codes)


def test_int4_flat_engine_packed_storage(rng):
    """INT4 codes live nibble-packed in HBM (half of int8) and still rank
    like the unpacked asymmetric scoring."""
    from zvec_tpu.core.flat import FlatEngine
    from zvec_tpu.model.param.param import FlatIndexParam
    from zvec_tpu.typing import MetricType, QuantizeType

    n, d, k = 3000, 32, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((6, d)).astype(np.float32)
    e4 = FlatEngine(
        MetricType.L2, d, FlatIndexParam(MetricType.L2, QuantizeType.INT4)
    )
    e4.bind_data(lambda: xs, lambda: 1)
    from zvec_tpu.model.param.param import FlatQueryParam

    # raw quantized scores: opt out of the r3 refine-by-default
    sims, idx = e4.search(qs, k, param=FlatQueryParam(is_using_refiner=False))
    # storage really is packed: d/2 bytes per row
    assert e4._codes.shape[1] == d // 2
    assert e4._codes.dtype == jnp.int8
    # int4 ranking ~ fp32 oracle (coarse codes: top-10 overlap)
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :k]
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs)))
    assert hits / (len(qs) * k) >= 0.6
    # DEFAULT (no param) now refines quantized hits against fp32 — recall
    # must beat or match the raw-code ranking (`segment.cc:1591-1700` pairing)
    _, idx_ref = e4.search(qs, k)
    hits_ref = sum(
        len(set(idx_ref[i][idx_ref[i] >= 0]) & set(expect[i])) for i in range(len(qs))
    )
    assert hits_ref >= hits
    # and exactly matches the same engine scoring unpacked codes
    from zvec_tpu.ops.quantize import unpack_int4
    from zvec_tpu.ops.topk import blockwise_topk_search

    unpacked = unpack_int4(np.asarray(e4._codes), d)
    s2, i2 = blockwise_topk_search(
        jnp.asarray(np.pad(qs, ((0, 2), (0, 0)))),  # same query bucket of 8
        jnp.asarray(unpacked),
        MetricType.L2,
        k,
        mask=jnp.asarray(np.arange(unpacked.shape[0]) < n),
        x_sq_norms=e4._norms,
        dequant=e4._dequant,
    )
    np.testing.assert_array_equal(idx, np.asarray(i2)[: len(qs)])
    np.testing.assert_allclose(sims, np.asarray(s2)[: len(qs)], rtol=1e-5, atol=1e-4)


def test_int4_hnsw_engine_packed(rng):
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam, HnswQueryParam
    from zvec_tpu.typing import MetricType, QuantizeType

    n, d, k = 2500, 32, 10
    xs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((8, d)).astype(np.float32)
    engine = HnswEngine(
        MetricType.L2,
        d,
        HnswIndexParam(MetricType.L2, m=8, quantize_type=QuantizeType.INT4),
    )
    engine.bind_data(lambda: xs, lambda: 1)
    sims, idx = engine.search(qs, k, param=HnswQueryParam(ef=100))
    assert engine._codes.shape[1] == d // 2  # packed
    dmat = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(dmat, axis=1)[:, :k]
    hits = sum(len(set(idx[i][idx[i] >= 0]) & set(expect[i])) for i in range(len(qs)))
    assert hits / (len(qs) * k) >= 0.55  # int4 + graph approx
