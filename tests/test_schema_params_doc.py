"""Schema / params / Doc / typing contract tests.

Reference analogs: `python/tests/test_schema.py`, `test_params.py`,
`test_doc.py`, `test_typing.py`; defaults from
`src/include/zvec/core/interface/constants.h:21-24`,
`src/include/zvec/db/index_params.h:252`, `schema.h:24-25`, and
`python/zvec/model/schema/field_schema.py:191-193` (HNSW default index)."""

import numpy as np
import pytest

from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    HnswIndexParam,
    HnswQueryParam,
    IndexType,
    InvertIndexParam,
    IVFIndexParam,
    IVFQueryParam,
    MetricType,
    QuantizeType,
    Status,
    StatusCode,
    VectorSchema,
)
from zvec_tpu.model.param.param import (
    DEFAULT_HNSW_EF_CONSTRUCTION,
    DEFAULT_HNSW_EF_SEARCH,
    DEFAULT_HNSW_M,
    DEFAULT_IVF_NPROBE,
    SegmentOption,
)


# ---------------- param defaults (reference constants.h parity) ----------------


def test_hnsw_param_defaults():
    p = HnswIndexParam()
    assert p.m == DEFAULT_HNSW_M == 50
    assert p.ef_construction == DEFAULT_HNSW_EF_CONSTRUCTION == 500
    # reference python_param.cc:331 — default metric is IP
    assert p.metric_type == MetricType.IP
    assert p.index_type == IndexType.HNSW
    q = HnswQueryParam()
    assert q.ef == DEFAULT_HNSW_EF_SEARCH == 300
    assert not q.is_linear


def test_ivf_param_defaults():
    p = IVFIndexParam()
    assert p.n_iters == 10
    assert not p.use_soar
    assert p.index_type == IndexType.IVF
    q = IVFQueryParam()
    assert q.nprobe == DEFAULT_IVF_NPROBE == 10


def test_segment_defaults():
    o = SegmentOption()
    # reference schema.h:24-25
    assert o.max_doc_count_per_segment == 10_000_000
    assert o.min_doc_count_for_index == 1000


def test_param_eq_repr_hash():
    a = HnswIndexParam(MetricType.COSINE, m=16)
    b = HnswIndexParam(MetricType.COSINE, m=16)
    c = HnswIndexParam(MetricType.COSINE, m=32)
    assert a == b and hash(a) == hash(b) and a != c
    assert "16" in repr(a) and "HnswIndexParam" in repr(a)


# ---------------- schema construction ----------------


def test_vector_schema_defaults_to_hnsw():
    # reference field_schema.py:191-193: vector fields HNSW-indexed by default
    vs = VectorSchema("v", DataType.VECTOR_FP32, 8)
    assert isinstance(vs.index_param, HnswIndexParam)


def test_schema_rejects_duplicates():
    with pytest.raises(Exception):
        CollectionSchema("col_s",
            fields=[
                FieldSchema("x", DataType.INT64),
                FieldSchema("x", DataType.STRING),
            ],
        )
    with pytest.raises(Exception):
        CollectionSchema("col_s",
            vectors=[
                VectorSchema("v", DataType.VECTOR_FP32, 4),
                VectorSchema("v", DataType.VECTOR_FP32, 4),
            ],
        )
    with pytest.raises(Exception):  # field/vector name collision
        CollectionSchema("col_s",
            fields=[FieldSchema("v", DataType.INT64)],
            vectors=[VectorSchema("v", DataType.VECTOR_FP32, 4)],
        )


def test_sparse_vector_schema_has_no_dimension_requirement():
    vs = VectorSchema(
        "sv", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP)
    )
    assert vs.is_sparse


def test_schema_dict_roundtrip():
    s = CollectionSchema("col_rt",
        fields=[
            FieldSchema("tag", DataType.STRING, index_param=InvertIndexParam()),
            FieldSchema("n", DataType.INT64, nullable=True),
            FieldSchema("arr", DataType.ARRAY_FLOAT),
        ],
        vectors=[
            VectorSchema(
                "v",
                DataType.VECTOR_FP32,
                16,
                HnswIndexParam(MetricType.COSINE, m=24, quantize_type=QuantizeType.INT8),
            )
        ],
    )
    s2 = CollectionSchema.from_dict(s.to_dict())
    assert s2 == s
    assert s2.vector("v").index_param.m == 24
    assert s2.vector("v").index_param.quantize_type == QuantizeType.INT8
    assert s2.field("n").nullable
    assert s2.field("tag").index_param is not None


def test_schema_lookup_helpers():
    s = CollectionSchema("col_lk",
        fields=[FieldSchema("a", DataType.INT32)],
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, 4)],
    )
    assert s.field("a").data_type == DataType.INT32
    assert s.field("missing") is None
    assert s.vector("missing") is None
    assert s.field_names() == ["a"] and s.vector_names() == ["v"]


# ---------------- DataType catalog (reference type.h:34-68) ----------------


def test_datatype_catalog_complete():
    scalars = [
        "BINARY", "STRING", "BOOL", "INT32", "INT64", "UINT32", "UINT64",
        "FLOAT", "DOUBLE",
    ]
    dense = [
        "VECTOR_BINARY32", "VECTOR_BINARY64", "VECTOR_FP16", "VECTOR_FP32",
        "VECTOR_FP64", "VECTOR_INT4", "VECTOR_INT8", "VECTOR_INT16",
    ]
    sparse = ["SPARSE_VECTOR_FP16", "SPARSE_VECTOR_FP32"]
    arrays = [
        "ARRAY_BINARY", "ARRAY_STRING", "ARRAY_BOOL", "ARRAY_INT32",
        "ARRAY_INT64", "ARRAY_UINT32", "ARRAY_UINT64", "ARRAY_FLOAT",
        "ARRAY_DOUBLE",
    ]
    for name in scalars + dense + sparse + arrays:
        assert hasattr(DataType, name), f"DataType.{name} missing"
    for name in dense:
        assert DataType[name].is_dense_vector
    for name in sparse:
        assert DataType[name].is_sparse_vector
    for name in arrays:
        assert DataType[name].is_array


# ---------------- Doc ----------------


def test_doc_ndarray_normalization():
    v = np.arange(4, dtype=np.float32)
    d = Doc(id="a", fields={"x": 1}, vectors={"v": v})
    assert np.allclose(d.vector("v"), v)
    assert d.vector("missing") is None


def test_doc_repr_and_fields():
    d = Doc(id="a", score=1.5, fields={"x": 1})
    assert d.fields["x"] == 1
    assert "a" in repr(d)


# ---------------- Status ----------------


def test_status_codes():
    ok = Status.ok_status()
    assert ok and ok.code == StatusCode.OK and ok.ok()
    assert not Status(StatusCode.NOT_FOUND).ok()  # instance truth (ref parity)
    bad = Status(StatusCode.INVALID_ARGUMENT, "nope")
    assert not bad
    assert "nope" in str(bad)
    for name in (
        "OK", "INVALID_ARGUMENT", "NOT_FOUND", "ALREADY_EXISTS",
        "PERMISSION_DENIED", "RESOURCE_EXHAUSTED", "INTERNAL_ERROR",
    ):
        assert hasattr(StatusCode, name)
