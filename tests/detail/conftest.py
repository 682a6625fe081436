"""Shared fixtures for the detail behavior-matrix tier (reference analog:
`python/tests/detail/fixture_helper.py` / `doc_helper.py` — session schemas
covering every DataType plus random doc generation; the matrices themselves
are original to this rebuild)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    HnswIndexParam,
    InvertIndexParam,
    MetricType,
    VectorSchema,
)

DIM = 16
SPARSE_VOCAB = 200

# every scalar DataType with a generator producing a deterministic value
SCALAR_GEN = {
    DataType.STRING: lambda i: f"str_{i}",
    DataType.BOOL: lambda i: bool(i % 2),
    DataType.INT32: lambda i: int(i) - 5,
    DataType.INT64: lambda i: int(i) * 1_000_000_007,
    DataType.UINT32: lambda i: int(i) * 3,
    DataType.UINT64: lambda i: int(i) * 7,
    DataType.FLOAT: lambda i: float(i) * 0.5,
    DataType.DOUBLE: lambda i: float(i) * 0.25 + 1e-9,
    # NOTE: scalar BINARY is not in SUPPORT_SCALAR_DATA_TYPE — parity with
    # the reference python API (`field_schema.py:43-60`)
    DataType.ARRAY_INT64: lambda i: [int(i), int(i) + 1] if i % 3 else [],
    DataType.ARRAY_STRING: lambda i: [f"t{i % 5}", f"t{(i + 1) % 5}"],
    DataType.ARRAY_FLOAT: lambda i: [float(i), -float(i)],
}

FIELD_NAME = {dt: f"f_{dt.name.lower()}" for dt in SCALAR_GEN}


def full_width_schema(name="detail_full", nullable=True, indexed=False, m=8):
    fields = [
        FieldSchema(
            FIELD_NAME[dt],
            dt,
            nullable=nullable,
            index_param=InvertIndexParam(enable_range_optimization=True)
            if (indexed and not dt.is_array)
            else None,
        )
        for dt in SCALAR_GEN
    ]
    vectors = [
        VectorSchema(
            "dense",
            DataType.VECTOR_FP32,
            DIM,
            HnswIndexParam(MetricType.L2, m=m, ef_construction=40)
            if indexed
            else FlatIndexParam(MetricType.L2),
        ),
        VectorSchema(
            "sparse",
            DataType.SPARSE_VECTOR_FP32,
            0,
            FlatIndexParam(MetricType.IP),
        ),
    ]
    return CollectionSchema(name, fields=fields, vectors=vectors)


def make_doc(i: int, rng=None, schema=None, skip_fields=()) -> Doc:
    rng = rng or np.random.default_rng(i)
    fields = {
        FIELD_NAME[dt]: gen(i)
        for dt, gen in SCALAR_GEN.items()
        if FIELD_NAME[dt] not in skip_fields
    }
    dense = rng.standard_normal(DIM).astype(np.float32)
    dims = rng.choice(SPARSE_VOCAB, 6, replace=False)
    sparse = {int(t): float(rng.random() + 0.1) for t in dims}
    return Doc(id=f"pk{i}", fields=fields, vectors={"dense": dense, "sparse": sparse})


@pytest.fixture
def full_col(tmp_path):
    """Empty full-width collection (nullable fields, flat dense index)."""
    col = zvec_tpu.create_and_open(str(tmp_path / "full"), full_width_schema())
    yield col


@pytest.fixture
def loaded_col(tmp_path, rng):
    """Full-width collection preloaded with 200 deterministic docs."""
    col = zvec_tpu.create_and_open(str(tmp_path / "loaded"), full_width_schema())
    docs = [make_doc(i, np.random.default_rng(1000 + i)) for i in range(200)]
    col.insert(docs)
    yield col, docs
