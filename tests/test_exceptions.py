"""Exception / edge-case behavior suite (reference analog:
`python/tests/detail/test_collection_exceptions.py`)."""

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
    IVFIndexParam,
    MetricType,
    StatusCode,
    VectorQuery,
    VectorSchema,
    ZvecError,
)
from zvec_tpu.db.collection_impl import MAX_WRITE_BATCH_SIZE


@pytest.fixture
def coll(tmp_path, rng):
    schema = CollectionSchema("col_ex",
        fields=[FieldSchema("n", DataType.INT64, nullable=True)],
        vectors=[
            VectorSchema("e", DataType.VECTOR_FP32, 4, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "ex"), schema)
    c.insert([Doc(id=f"x{i}", vectors={"e": np.ones(4, np.float32) * i}) for i in range(5)])
    yield c
    c._impl.close()


def test_schema_validation_errors():
    with pytest.raises(ValueError):
        FieldSchema("f", DataType.VECTOR_FP32)  # vector type on scalar field
    with pytest.raises(ValueError):
        VectorSchema("v", DataType.INT64, 8)  # scalar type on vector field
    with pytest.raises(ValueError):
        VectorSchema("v", DataType.VECTOR_FP32, 0)  # dense needs dimension
    with pytest.raises(ValueError):
        CollectionSchema(None)  # type: ignore
    with pytest.raises(TypeError):
        CollectionSchema("col_c", fields=[42])  # type: ignore


def test_param_validation_errors():
    with pytest.raises(ValueError):
        HnswIndexParam(m=0)
    with pytest.raises(ValueError):
        HnswIndexParam(ef_construction=-1)
    with pytest.raises(ValueError):
        IVFIndexParam(n_list=-5)
    from zvec_tpu import HnswQueryParam, IVFQueryParam

    with pytest.raises(ValueError):
        HnswQueryParam(ef=0)
    with pytest.raises(ValueError):
        IVFQueryParam(nprobe=0)


def test_write_batch_limit(coll):
    docs = [
        Doc(id=f"b{i}", vectors={"e": np.zeros(4, np.float32)})
        for i in range(MAX_WRITE_BATCH_SIZE + 1)
    ]
    with pytest.raises(ZvecError) as exc:
        coll.insert(docs)
    assert exc.value.code == StatusCode.INVALID_ARGUMENT


def test_bad_doc_statuses(coll):
    sts = coll.insert(
        [
            Doc(id="", vectors={"e": np.zeros(4, np.float32)}),  # empty pk
            Doc(id="ok1", vectors={"e": np.zeros(3, np.float32)}),  # bad dim
            Doc(id="ok2", vectors={}),  # missing vector
            Doc(id="ok3", fields={"nope": 1}, vectors={"e": np.zeros(4, np.float32)}),
            Doc(id="ok4", fields={"n": "str"}, vectors={"e": np.zeros(4, np.float32)}),
            Doc(id="good", vectors={"e": np.zeros(4, np.float32)}),
        ]
    )
    codes = [s.code for s in sts]
    assert codes[:5] == [StatusCode.INVALID_ARGUMENT] * 5
    assert codes[5] == StatusCode.OK
    # failed docs were not written
    assert coll.fetch("ok1") == {}
    assert coll.fetch("good") != {}


def test_int_range_checks(tmp_path):
    schema = CollectionSchema(
        "rng",
        fields=[
            FieldSchema("i32", DataType.INT32, nullable=True),
            FieldSchema("u32", DataType.UINT32, nullable=True),
        ],
        vectors=[VectorSchema("e", DataType.VECTOR_FP32, 2)],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "rng"), schema)
    v = np.zeros(2, np.float32)
    assert c.insert(Doc(id="a", fields={"i32": 2**31}, vectors={"e": v})).code == StatusCode.INVALID_ARGUMENT
    assert c.insert(Doc(id="b", fields={"u32": -1}, vectors={"e": v})).code == StatusCode.INVALID_ARGUMENT
    assert c.insert(Doc(id="c", fields={"i32": -(2**31)}, vectors={"e": v})).is_ok()
    c._impl.close()


def test_query_empty_collection(tmp_path):
    schema = CollectionSchema(
        "empty", vectors=[VectorSchema("e", DataType.VECTOR_FP32, 4)]
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "empty"), schema)
    res = c.query(VectorQuery("e", vector=np.zeros(4, np.float32)), topk=5)
    assert res == []
    assert c.fetch("any") == {}
    assert c.stats.doc_count == 0
    c._impl.close()


def test_query_requires_vector(coll):
    # no VectorQuery = filter-only scan, NOT an error (reference
    # `query_executor.py:267-272`)
    assert len(coll.query(None, topk=5)) == 5
    with pytest.raises(ValueError):
        coll.query(VectorQuery("e"), topk=5)  # neither id nor vector


def test_query_by_missing_id(coll):
    with pytest.raises(ValueError):
        coll.query(VectorQuery("e", id="missing"), topk=3)


def test_open_missing_path(tmp_path):
    with pytest.raises(ZvecError) as exc:
        zvec_tpu.open(str(tmp_path / "nothing"))
    assert exc.value.code == StatusCode.NOT_FOUND


def test_nullable_enforcement(tmp_path):
    schema = CollectionSchema("col_nn",
        fields=[FieldSchema("req", DataType.INT64, nullable=False)],
        vectors=[VectorSchema("e", DataType.VECTOR_FP32, 2)],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "nn"), schema)
    st = c.insert(Doc(id="a", vectors={"e": np.zeros(2, np.float32)}))
    assert st.code == StatusCode.INVALID_ARGUMENT
    st = c.insert(
        Doc(id="a", fields={"req": 1}, vectors={"e": np.zeros(2, np.float32)})
    )
    assert st.is_ok()
    c._impl.close()


def test_sparse_metric_restriction():
    # sparse vectors support IP only at query time; schema accepts the field
    from zvec_tpu.core.sparse_flat import SparseFlatEngine

    e = SparseFlatEngine()
    assert e.metric == MetricType.IP


def test_memory_limit_soft_cap(tmp_path, rng, monkeypatch):
    from zvec_tpu.utils.config import GlobalConfig

    schema = CollectionSchema(
        "mem", vectors=[VectorSchema("e", DataType.VECTOR_FP32, 256)]
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "mem"), schema)
    xs = rng.standard_normal((200, 256)).astype(np.float32)
    assert all(
        s.is_ok()
        for s in c.insert([Doc(id=f"m{i}", vectors={"e": xs[i]}) for i in range(100)])
    )
    # shrink the cap below current usage: further writes refused, reads fine
    monkeypatch.setattr(GlobalConfig.instance(), "memory_limit_mb", 0.05)
    sts = c.insert([Doc(id="over", vectors={"e": xs[0]})])
    assert sts[0].code == StatusCode.RESOURCE_EXHAUSTED
    assert c.fetch("m5") != {}
    assert len(c.query(VectorQuery("e", vector=xs[1]), topk=3)) == 3
    c._impl.close()


def test_alter_column_name_collision(tmp_path):
    """Renaming a column onto an existing field/vector name must be refused
    (reference AlterColumn validates the target name; a silent rename would
    leave two columns with the same name in the schema)."""
    schema = CollectionSchema(
        "alt",
        fields=[FieldSchema("x", DataType.INT64), FieldSchema("y", DataType.INT64)],
        vectors=[
            VectorSchema("v", DataType.VECTOR_FP32, 4, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "alt"), schema)
    c.insert([Doc(id="1", fields={"x": 1, "y": 2}, vectors={"v": np.ones(4, np.float32)})])
    with pytest.raises(ZvecError) as ei:
        c.alter_column("x", new_name="y")
    assert ei.value.code == StatusCode.INVALID_ARGUMENT
    with pytest.raises(ZvecError):
        c.alter_column("x", new_name="v")  # vector names collide too
    # schema unchanged, data intact
    assert c.schema.field_names() == ["x", "y"]
    assert c.fetch("1")["1"].fields == {"x": 1, "y": 2}
    # renaming onto itself is a no-op, not a collision
    c.alter_column("x", new_name="x")
    c._impl.close()


def test_add_duplicate_column_refused(coll):
    with pytest.raises(ValueError):
        coll.add_column(FieldSchema("n", DataType.INT64))
    with pytest.raises(ValueError):
        coll.add_column(FieldSchema("e", DataType.INT64))  # vector name


def test_drop_unknown_column_refused(coll):
    with pytest.raises(ZvecError) as ei:
        coll.drop_column("nope")
    assert ei.value.code == StatusCode.INVALID_ARGUMENT
    with pytest.raises(ZvecError):
        coll.alter_column("nope", new_name="x")


def test_ops_after_close_raise(tmp_path):
    """Reference analog: resource cleanup — writes on a closed collection
    fail with FAILED_PRECONDITION instead of corrupting files."""
    schema = CollectionSchema("col_cl", vectors=[VectorSchema("e", DataType.VECTOR_FP32, 4)]
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "cl"), schema)
    c.insert([Doc(id="a", vectors={"e": np.ones(4, np.float32)})])
    c._impl.close()
    with pytest.raises(ZvecError) as ei:
        c.insert([Doc(id="b", vectors={"e": np.ones(4, np.float32)})])
    assert ei.value.code == StatusCode.FAILED_PRECONDITION
    with pytest.raises(ZvecError):
        c.delete("a")
    with pytest.raises(ZvecError):
        c.add_column(FieldSchema("z", DataType.INT64))


def test_fetch_missing_and_mixed_ids(coll):
    got = coll.fetch(["x1", "ghost", "x3"])
    assert set(got) == {"x1", "x3"}
    assert coll.fetch("ghost") == {}


def test_delete_missing_pk_status(coll):
    sts = coll.delete(["x1", "ghost"])
    assert sts[0].is_ok()
    assert sts[1].code == StatusCode.NOT_FOUND
    # deleted doc invisible to fetch and query
    assert coll.fetch("x1") == {}


def test_destroy_removes_files(tmp_path):
    import os

    schema = CollectionSchema("col_de", vectors=[VectorSchema("e", DataType.VECTOR_FP32, 4)]
    )
    path = str(tmp_path / "de")
    c = zvec_tpu.create_and_open(path, schema)
    c.insert([Doc(id="a", vectors={"e": np.ones(4, np.float32)})])
    c.flush()
    assert os.path.isdir(path)
    c.destroy()
    assert not os.path.exists(path)
