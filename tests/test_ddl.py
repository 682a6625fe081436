"""Column DDL + optimize/compaction tests (reference analog:
`python/tests/detail/test_collection_ddl.py`)."""

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
    VectorQuery,
    VectorSchema,
    ZvecError,
)


@pytest.fixture
def coll(tmp_path, rng):
    schema = CollectionSchema(
        "ddl",
        fields=[
            FieldSchema("price", DataType.DOUBLE),
            FieldSchema("name", DataType.STRING, nullable=True),
        ],
        vectors=[
            VectorSchema("e", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
        max_doc_count_per_segment=50,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "ddl"), schema)
    xs = rng.standard_normal((120, 8)).astype(np.float32)
    for s in range(0, 120, 40):
        c.insert(
            [
                Doc(
                    id=f"d{i}",
                    vectors={"e": xs[i]},
                    fields={"price": float(i), "name": f"n{i}"},
                )
                for i in range(s, s + 40)
            ]
        )
    c._xs = xs
    yield c
    c._impl.close()


def test_add_column_constant_and_expression(coll):
    # 120 docs: 2 sealed segments (50+50) + writing (20)
    assert len(coll._impl.segments) == 2
    coll.add_column(FieldSchema("flag", DataType.INT64, nullable=True))
    d = coll.fetch("d10")["d10"]
    assert d.field("flag") is None
    # expression-backed column over existing docs
    coll.add_column(FieldSchema("price2", DataType.DOUBLE, nullable=True), "price * 2")
    assert coll.fetch("d10")["d10"].field("price2") == 20.0
    assert coll.fetch("d99")["d99"].field("price2") == 198.0
    # new inserts can set it
    st = coll.insert(
        Doc(
            id="new",
            vectors={"e": np.zeros(8, np.float32)},
            fields={"price": 1.0, "flag": 7, "price2": 2.0},
        )
    )
    assert st.is_ok()
    assert coll.fetch("new")["new"].field("flag") == 7
    # filter on the new column
    res = coll.query(VectorQuery("e", vector=coll._xs[0]), topk=5, filter="price2 = 20")
    assert [r.id for r in res] == ["d10"]


def test_drop_column(coll):
    coll.drop_column("name")
    assert coll.schema.field("name") is None
    assert "name" not in coll.fetch("d3")["d3"].fields
    with pytest.raises(ZvecError):
        coll.drop_column("nope")


def test_alter_column_rename(coll):
    coll.alter_column("price", new_name="cost")
    assert coll.schema.field("cost") is not None
    assert coll.schema.field("price") is None
    assert coll.fetch("d5")["d5"].field("cost") == 5.0
    res = coll.query(VectorQuery("e", vector=coll._xs[0]), topk=3, filter="cost < 3")
    assert sorted(r.id for r in res) == ["d0", "d1", "d2"]


def test_optimize_compacts(coll):
    coll.delete([f"d{i}" for i in range(30)])
    assert coll.stats.doc_count == 90
    coll.optimize()
    # one merged sealed segment; tombstones dropped; idmap remapped
    assert len(coll._impl.segments) == 1
    assert len(coll._impl.deletes) == 0
    assert coll.stats.doc_count == 90
    res = coll.query(VectorQuery("e", vector=coll._xs[77]), topk=1)
    assert res[0].id == "d77"
    assert coll.fetch("d10") == {}  # deleted stays deleted


def test_optimize_then_reopen(tmp_path, coll):
    coll.delete("d0")
    coll.optimize()
    path = coll.path
    coll.flush()
    coll._impl.close()
    c2 = zvec_tpu.open(path)
    assert c2.stats.doc_count == 119
    assert c2.query(VectorQuery("e", vector=coll._xs[50]), topk=1)[0].id == "d50"
    c2._impl.close()


def test_create_index_after_data(coll):
    coll.create_index("e", HnswIndexParam(MetricType.L2, m=8, ef_construction=40))
    for seg in coll._impl.segments:
        assert "e" in seg.meta.indexes
    res = coll.query(VectorQuery("e", vector=coll._xs[42]), topk=1)
    assert res[0].id == "d42"
    coll.drop_index("e")
    for seg in coll._impl.segments:
        assert "e" not in seg.meta.indexes
    # still searchable (flat)
    assert coll.query(VectorQuery("e", vector=coll._xs[42]), topk=1)[0].id == "d42"


def test_create_invert_index_ddl(coll):
    coll.create_index("name", InvertIndexParam())
    seg = coll._impl.segments[0]
    assert seg.inverted_index("name") is not None
    res = coll.query(VectorQuery("e", vector=coll._xs[0]), topk=2, filter="name = 'n7'")
    assert [r.id for r in res] == ["d7"]


def test_vector_index_on_scalar_field_fails(coll):
    with pytest.raises(ValueError):
        coll.create_index("price", HnswIndexParam())


def test_insert_after_optimize_and_reopen(tmp_path, coll):
    """Regression: compaction must restart the empty writing segment's doc_id
    range (stale doc_id_start broke post-optimize inserts)."""
    coll.delete("d1")
    coll.optimize()
    st = coll.insert(
        Doc(id="post1", vectors={"e": np.zeros(8, np.float32)}, fields={"price": 1.0})
    )
    assert st.is_ok()
    path = coll.path
    coll.flush()
    coll._impl.close()
    c2 = zvec_tpu.open(path)
    st = c2.insert(
        Doc(id="post2", vectors={"e": np.ones(8, np.float32)}, fields={"price": 2.0})
    )
    assert st.is_ok()
    assert c2.fetch("post1")["post1"].field("price") == 1.0
    assert c2.fetch("post2")["post2"].field("price") == 2.0
    c2._impl.close()


def test_create_index_concurrent_pool(coll):
    """Per-segment index builds run on the optimize pool when concurrency > 1."""
    from zvec_tpu import IndexOption

    coll.create_index(
        "e",
        HnswIndexParam(MetricType.L2, m=8, ef_construction=40),
        IndexOption(concurrency=2),
    )
    for seg in coll._impl.segments:
        assert "e" in seg.meta.indexes
    assert coll.query(VectorQuery("e", vector=coll._xs[77]), topk=1)[0].id == "d77"


def test_read_only_open(tmp_path, rng):
    """CollectionOption(read_only=True): queries serve, every write/DDL is
    refused, and concurrent read-only opens share the file lock
    (reference `options.h:24`, shared-lock open)."""
    import numpy as np

    import zvec_tpu
    from zvec_tpu import (
        CollectionOption,
        CollectionSchema,
        DataType,
        Doc,
        FieldSchema,
        FlatIndexParam,
        MetricType,
        VectorQuery,
        VectorSchema,
    )

    path = str(tmp_path / "ro")
    schema = CollectionSchema("col_ro",
        fields=[FieldSchema("n", DataType.INT64)],
        vectors=[
            VectorSchema("v", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(path, schema)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    c.insert(
        [Doc(id=f"d{i}", vectors={"v": vecs[i]}, fields={"n": i}) for i in range(20)]
    )
    c.flush()
    c._impl.close()

    ro1 = zvec_tpu.open(path, CollectionOption(read_only=True))
    ro2 = zvec_tpu.open(path, CollectionOption(read_only=True))  # shared lock
    hits = ro1.query(VectorQuery("v", vector=vecs[3]), topk=1)
    assert hits[0].id == "d3"
    assert ro2.fetch("d5")["d5"].field("n") == 5
    # every mutating op refused
    doc = Doc(id="x", vectors={"v": vecs[0]}, fields={"n": 99})
    for op in (
        lambda: ro1.insert(doc),
        lambda: ro1.upsert(doc),
        lambda: ro1.update(doc),
        lambda: ro1.delete("d0"),
        lambda: ro1.delete_by_filter("n < 5"),
        lambda: ro1.flush(),
        lambda: ro1.optimize(),
        lambda: ro1.drop_index("v"),
        lambda: ro1.drop_column("n"),
    ):
        try:
            res = op()
        except Exception:
            continue  # refused via exception: acceptable
        # batched write paths report failure Status instead
        sts = res if isinstance(res, list) else [res]
        assert all(not bool(s) for s in sts if s is not None), op
    # nothing changed
    assert ro2.stats.doc_count == 20
    ro1._impl.close()
    ro2._impl.close()
