"""Binary vectors end-to-end: VECTOR_BINARY32/64 + Hamming + BinaryConverter.

Reference: `type.h:47-48` (VECTOR_BINARY32/64), `hamming_metric.cc:236`,
`binary_converter.cc` / `binary_quantizer.cc:40-52` (threshold-sign bits,
LSB-first packing). TPU-native twist under test: hamming rides the MXU as
||q - x||^2 / 4 over ±1 vectors instead of VPU popcounts.
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
    MetricType,
    QuantizeType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.ops.quantize import pack_bits, unpack_bits

DIM = 96  # bits (not a multiple of 64: exercises padding)


def _hamming_oracle(qbits, xbits):
    return (qbits[:, None, :] != xbits[None, :, :]).sum(axis=2)


def _make(rng, n):
    bits = (rng.random((n, DIM)) > 0.5).astype(np.uint8)
    return bits


@pytest.mark.parametrize("dt,word_bits", [(DataType.VECTOR_BINARY32, 32), (DataType.VECTOR_BINARY64, 64)])
def test_flat_binary_end_to_end(tmp_path, rng, dt, word_bits):
    schema = CollectionSchema(
        "bin",
        vectors=[VectorSchema("code", dt, DIM, FlatIndexParam(MetricType.HAMMING))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    bits = _make(rng, 200)
    packed = pack_bits(bits, word_bits)
    # insert half packed-form, half bit-form (both accepted)
    docs = [Doc(id=f"d{i}", vectors={"code": packed[i]}) for i in range(100)]
    docs += [Doc(id=f"d{i}", vectors={"code": bits[i]}) for i in range(100, 200)]
    sts = c.insert(docs)
    assert all(s.is_ok() for s in sts), [s.message for s in sts if not s]

    qbits = _make(rng, 8)
    dist = _hamming_oracle(qbits, bits)
    # query in packed form
    for r in range(4):
        res = c.query(VectorQuery("code", vector=pack_bits(qbits[r : r + 1], word_bits)[0]), topk=5)
        exp = np.argsort(dist[r], kind="stable")[:5]
        assert [h.id for h in res] == [f"d{i}" for i in exp]
        assert [h.score for h in res] == [float(dist[r][i]) for i in exp]
    # query in bit form
    res = c.query(VectorQuery("code", vector=qbits[4]), topk=3)
    exp = np.argsort(dist[4], kind="stable")[:3]
    assert [h.id for h in res] == [f"d{i}" for i in exp]

    # survive flush + reopen (WAL codec + arrow forward store round-trip)
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "c"))
    res = c2.query(VectorQuery("code", vector=qbits[0]), topk=5)
    exp = np.argsort(dist[0], kind="stable")[:5]
    assert [h.id for h in res] == [f"d{i}" for i in exp]
    got = c2.fetch("d0")["d0"]
    words = np.asarray(got.vectors["code"], dtype=np.uint64 if word_bits == 64 else np.uint32)
    assert (unpack_bits(words[None, :], DIM)[0] == bits[0]).all()
    c2._impl.close()


def test_hnsw_binary_recall(tmp_path, rng):
    schema = CollectionSchema(
        "binh",
        vectors=[
            VectorSchema(
                "code",
                DataType.VECTOR_BINARY32,
                DIM,
                HnswIndexParam(MetricType.HAMMING, m=16),
            )
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    bits = _make(rng, 1500)
    for lo in range(0, 1500, 500):
        c.insert(
            [Doc(id=f"d{i}", vectors={"code": bits[i]}) for i in range(lo, lo + 500)]
        )
    c.flush()
    c.optimize()  # seal -> HNSW build over ±1 codes

    qbits = _make(rng, 16)
    dist = _hamming_oracle(qbits, bits)
    hits = total = 0
    for r in range(16):
        res = c.query(
            VectorQuery("code", vector=qbits[r], param=HnswQueryParam(ef=96)), topk=10
        )
        exp_d = np.sort(dist[r])[:10]
        got_d = np.array([h.score for h in res])
        # hamming has heavy ties: compare by distance multiset, not ids
        hits += (got_d <= exp_d[-1]).sum()
        total += 10
        assert got_d[0] == exp_d[0]
    assert hits / total >= 0.9
    c._impl.close()


def test_binary_converter_flat(tmp_path, rng):
    """QuantizeType.BINARY on an fp32 field: threshold-sign bits, hamming
    scores (reference BinaryConverter semantics)."""
    schema = CollectionSchema(
        "conv",
        vectors=[
            VectorSchema(
                "emb",
                DataType.VECTOR_FP32,
                64,
                FlatIndexParam(MetricType.L2, quantize_type=QuantizeType.BINARY),
            )
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    X = rng.standard_normal((300, 64)).astype(np.float32)
    c.insert([Doc(id=f"d{i}", vectors={"emb": X[i]}) for i in range(300)])
    q = rng.standard_normal((4, 64)).astype(np.float32)
    xb = (X >= 0).astype(np.uint8)
    qb = (q >= 0).astype(np.uint8)
    dist = _hamming_oracle(qb, xb)
    for r in range(4):
        res = c.query(VectorQuery("emb", vector=q[r]), topk=5)
        got_d = np.array([h.score for h in res])
        exp_d = np.sort(dist[r], kind="stable")[:5].astype(float)
        assert (got_d == exp_d).all(), (got_d, exp_d)
    c._impl.close()


def test_binary_schema_validation():
    with pytest.raises(ValueError, match="FLAT/HNSW"):
        VectorSchema("b", DataType.VECTOR_BINARY32, 64, IVFIndexParam(MetricType.HAMMING))
    with pytest.raises(ValueError, match="HAMMING"):
        VectorSchema("b", DataType.VECTOR_BINARY32, 64, FlatIndexParam(MetricType.L2))
    with pytest.raises(ValueError, match="re-quantized"):
        VectorSchema(
            "b",
            DataType.VECTOR_BINARY32,
            64,
            FlatIndexParam(MetricType.HAMMING, quantize_type=QuantizeType.INT8),
        )
    # defaults coerce to hamming
    vs = VectorSchema("b", DataType.VECTOR_BINARY64, 128)
    assert vs.index_param.metric_type == MetricType.HAMMING


def test_binary_bad_inputs(tmp_path, rng):
    schema = CollectionSchema(
        "bad",
        vectors=[VectorSchema("code", DataType.VECTOR_BINARY32, DIM)],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    st = c.insert(Doc(id="x", vectors={"code": np.zeros(7, np.uint32)}))
    assert not st.is_ok() and "matches neither" in st.message
    st = c.insert(Doc(id="x", vectors={"code": np.full(DIM, 2, np.uint8)}))
    assert not st.is_ok() and "0/1" in st.message
    c._impl.close()
