"""End-to-end coverage of every supported vector data type
(reference DataType catalog, `src/include/zvec/db/type.h:34-68`)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FlatIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)


@pytest.mark.parametrize(
    "dtype,np_dtype",
    [
        (DataType.VECTOR_FP16, np.float16),
        (DataType.VECTOR_FP32, np.float32),
        (DataType.VECTOR_FP64, np.float64),
    ],
)
def test_float_vector_dtypes_end_to_end(tmp_path, rng, dtype, np_dtype):
    d = 8
    schema = CollectionSchema("col_vt",
        vectors=[VectorSchema("v", dtype, d, FlatIndexParam(MetricType.L2))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "vt"), schema)
    xs = rng.standard_normal((50, d)).astype(np_dtype)
    c.insert([Doc(id=f"v{i}", vectors={"v": xs[i]}) for i in range(50)])
    res = c.query(VectorQuery("v", vector=xs[7]), topk=3)
    assert res[0].id == "v7"
    fetched = c.fetch("v7")["v7"].vector("v")
    np.testing.assert_allclose(fetched, xs[7].astype(np.float64), rtol=1e-2)
    # persistence roundtrip keeps the dtype's values
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "vt"))
    assert c2.query(VectorQuery("v", vector=xs[3]), topk=1)[0].id == "v3"
    # storage must be full-width for the schema dtype: fp64 roundtrips exactly
    # (no silent fp32 downcast in WAL or forward file)
    refetched = np.asarray(c2.fetch("v7")["v7"].vector("v"))
    if np_dtype == np.float64:
        np.testing.assert_array_equal(refetched, xs[7])
    c2._impl.close()


def test_int8_vector_field(tmp_path, rng):
    d = 8
    schema = CollectionSchema("col_vi",
        vectors=[
            VectorSchema("v", DataType.VECTOR_INT8, d, FlatIndexParam(MetricType.IP))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "vi"), schema)
    xs = rng.integers(-100, 100, (40, d)).astype(np.int8)
    c.insert([Doc(id=f"i{i}", vectors={"v": xs[i]}) for i in range(40)])
    q = xs[5].astype(np.float32)
    res = c.query(VectorQuery("v", vector=xs[5]), topk=3)
    ip = xs.astype(np.float32) @ q
    assert res[0].id == f"i{np.argmax(ip)}"
    assert res[0].score == pytest.approx(float(ip.max()), rel=1e-5)
    got = c.fetch("i5")["i5"].vector("v")
    assert got == xs[5].tolist()
    c._impl.close()


@pytest.mark.parametrize(
    "dtype,np_dtype,lo,hi",
    [
        (DataType.VECTOR_INT16, np.int16, -3000, 3000),
        (DataType.VECTOR_INT8, np.int8, -128, 127),
    ],
)
def test_int_vector_dtypes_end_to_end(tmp_path, rng, dtype, np_dtype, lo, hi):
    d = 8
    schema = CollectionSchema("col_vi",
        vectors=[VectorSchema("v", dtype, d, FlatIndexParam(MetricType.L2))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "vi"), schema)
    xs = rng.integers(lo, hi, size=(40, d)).astype(np_dtype)
    c.insert([Doc(id=f"v{i}", vectors={"v": xs[i]}) for i in range(40)])
    res = c.query(VectorQuery("v", vector=xs[5]), topk=3)
    assert res[0].id == "v5"
    # exact integer roundtrip through fetch + reopen (WAL + forward file)
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "vi"))
    np.testing.assert_array_equal(
        np.asarray(c2.fetch("v5")["v5"].vector("v")), xs[5]
    )
    assert c2.query(VectorQuery("v", vector=xs[9]), topk=1)[0].id == "v9"
    c2._impl.close()


def test_int4_vector_end_to_end(tmp_path, rng):
    """VECTOR_INT4: nibble-packed storage (2 elems/byte,
    reference `type_helper.cc:32` DT_INT4), unpacked scoring + fetch."""
    d = 9  # odd dimension exercises the padded last nibble
    schema = CollectionSchema("col_v4",
        vectors=[VectorSchema("v", DataType.VECTOR_INT4, d, FlatIndexParam(MetricType.L2))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "v4"), schema)
    xs = rng.integers(-8, 8, size=(30, d)).astype(np.int8)
    c.insert([Doc(id=f"v{i}", vectors={"v": xs[i]}) for i in range(30)])
    # packed storage width: ceil(9/2) = 5 bytes per row
    seg = c._impl.writing
    assert seg.store._dense["v"].shape[1] == 5
    # exact L2 oracle over the int values
    q = xs[4]
    res = c.query(VectorQuery("v", vector=q), topk=5)
    d2 = ((xs.astype(np.float64) - q.astype(np.float64)) ** 2).sum(1)
    assert [r.id for r in res] == [f"v{i}" for i in np.argsort(d2, kind="stable")[:5]]
    # fetch returns the unpacked original values; survives reopen
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "v4"))
    np.testing.assert_array_equal(np.asarray(c2.fetch("v4")["v4"].vector("v")), xs[4])
    c2._impl.close()


def test_int4_vector_range_rejected(tmp_path):
    schema = CollectionSchema(
        "v4r",
        vectors=[VectorSchema("v", DataType.VECTOR_INT4, 4, FlatIndexParam(MetricType.L2))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "v4r"), schema)
    st = c.insert(Doc(id="a", vectors={"v": np.array([8, 0, 0, 0])}))
    assert not bool(st)
    st = c.insert(Doc(id="b", vectors={"v": np.array([1.5, 0, 0, 0])}))
    assert not bool(st)
    st = c.insert(Doc(id="c", vectors={"v": np.array([-8, 7, 0, 1])}))
    assert bool(st)
