"""Quantization tests (reference analog: `tests/core/` quantizer/metric tests,
`integer_quantizer_reformer_test.cc`, `quantized_integer_metric_test.cc`)."""

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
    schema = CollectionSchema(
        "q",
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
