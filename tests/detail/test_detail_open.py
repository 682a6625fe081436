"""Detail tier: open / create_and_open behavior matrices.

Mirrors the reference detail suites `python/tests/detail/
test_collection_open.py` (960 LoC) and `test_collection_create_and_open.py`
(792 LoC): name/path validity matrices (reference `constants.h:43-50`
regexes), option matrices, reopen cycles, lock contention, corrupted-file
opens. Documented divergence: zero-vector (scalar-only) collections are
allowed here (`CollectionSchema.validate_for_create`).
"""

import json
import os
import shutil

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionOption,
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    HnswIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.typing.status import ZvecError

from .conftest import full_width_schema, make_doc

# reference params_helper.py lists, minus the reference-only min-3 cases we
# keep (see COLLECTION_NAME_REGEX `constants.h:43`)
COLLECTION_NAME_VALID = [
    "col",
    "C0llECTION",
    "Collection1",
    "collection_2",
    "123collection-",
    "a" * 64,
]
COLLECTION_NAME_INVALID = [
    "l",
    "1C",
    "",
    " ",
    "a" * 65,
    "test/",
    "!@#$%^&*()test",
    "name with spaces",
]
FIELD_NAME_VALID = [
    "1",
    "12",
    "col",
    "ID",
    "name1",
    "Weigt_12-",
    "123age",
    "name_with_underscores",
    "123numeric_start",
    "name-with-dashes",
]
FIELD_NAME_INVALID = [
    "",
    " ",
    "a" * 33,
    "test/",
    "!@#$%^&*()test",
    "name@with#special$chars",
    "name with spaces",
]
INVALID_PATHS = [
    "invalid:path",
    "",
    "test_collection_with_spaces ",
    "test@#$%collection",
]


def _schema(name="detail_open", field="num", vec="emb", dim=8):
    return CollectionSchema(
        name,
        fields=[FieldSchema(field, DataType.INT64)],
        vectors=[VectorSchema(vec, DataType.VECTOR_FP32, dim,
                              FlatIndexParam(MetricType.L2))],
    )


class TestNameMatrix:
    @pytest.mark.parametrize("name", COLLECTION_NAME_VALID)
    def test_valid_collection_name(self, tmp_path, name):
        col = zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(name=name))
        assert col.schema.name == name
        col._impl.close()

    @pytest.mark.parametrize("name", COLLECTION_NAME_INVALID)
    def test_invalid_collection_name(self, tmp_path, name):
        with pytest.raises(ValueError, match="schema validate failed"):
            zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(name=name))
        # nothing half-created on disk
        assert not (tmp_path / "c").exists() or not os.listdir(tmp_path / "c")

    @pytest.mark.parametrize("field", FIELD_NAME_VALID)
    def test_valid_field_name(self, tmp_path, field):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), _schema(field=field)
        )
        assert col.schema.field_names() == [field]
        col._impl.close()

    @pytest.mark.parametrize("field", FIELD_NAME_INVALID)
    def test_invalid_field_name(self, tmp_path, field):
        with pytest.raises(ValueError, match="schema validate failed"):
            zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(field=field))

    @pytest.mark.parametrize("vec", FIELD_NAME_INVALID)
    def test_invalid_vector_name(self, tmp_path, vec):
        with pytest.raises(ValueError, match="schema validate failed"):
            zvec_tpu.create_and_open(str(tmp_path / "c"), _schema(vec=vec))


class TestSizeMatrix:
    def test_dimension_cap(self, tmp_path):
        with pytest.raises(ValueError, match="exceeds 20000"):
            zvec_tpu.create_and_open(
                str(tmp_path / "c"), _schema(dim=20001)
            )

    def test_max_dimension_boundary_schema_ok(self):
        # 20000 exactly is valid (kMaxDenseDimSize) — schema level only,
        # creating a 20000-dim collection is exercised at smaller dims
        _schema(dim=20000).validate_for_create()

    def test_vector_count_cap(self, tmp_path):
        vecs = [
            VectorSchema(f"v{i}", DataType.VECTOR_FP32, 4,
                         FlatIndexParam(MetricType.L2))
            for i in range(6)
        ]
        with pytest.raises(ValueError, match="at most 5 vector"):
            zvec_tpu.create_and_open(
                str(tmp_path / "c"),
                CollectionSchema("too_many_vecs", vectors=vecs),
            )

    def test_five_vectors_ok(self, tmp_path):
        vecs = [
            VectorSchema(f"v{i}", DataType.VECTOR_FP32, 4,
                         FlatIndexParam(MetricType.L2))
            for i in range(5)
        ]
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), CollectionSchema("five_vecs", vectors=vecs)
        )
        assert len(col.schema.vectors) == 5
        col._impl.close()

    def test_field_count_cap(self):
        fields = [FieldSchema(f"f{i}", DataType.INT32) for i in range(1025)]
        with pytest.raises(ValueError, match="at most 1024"):
            CollectionSchema("many_fields", fields=fields).validate_for_create()

    def test_scalar_only_collection_allowed(self, tmp_path):
        """Documented superset vs the reference (`schema.cc:250` rejects
        empty vectors): scalar-only collections insert/fetch/filter fine."""
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"),
            CollectionSchema(
                "scalar_only", fields=[FieldSchema("num", DataType.INT64)]
            ),
        )
        col.insert([Doc(id=f"pk{i}", fields={"num": i}) for i in range(10)])
        assert col.fetch("pk3")["pk3"].field("num") == 3
        col._impl.close()


class TestPathMatrix:
    @pytest.mark.parametrize("path", INVALID_PATHS)
    def test_invalid_path(self, path):
        with pytest.raises(ZvecError, match="invalid collection path"):
            zvec_tpu.create_and_open(path, _schema())

    def test_nested_nonexistent_path_created(self, tmp_path):
        deep = str(tmp_path / "a" / "b" / "c_col")
        col = zvec_tpu.create_and_open(deep, _schema())
        assert os.path.isdir(deep)
        col._impl.close()

    def test_create_on_nonempty_path_rejected(self, tmp_path):
        p = tmp_path / "occupied"
        p.mkdir()
        (p / "junk.txt").write_text("x")
        with pytest.raises(ZvecError, match="not empty"):
            zvec_tpu.create_and_open(str(p), _schema())

    def test_open_nonexistent(self, tmp_path):
        with pytest.raises(ZvecError, match="no collection"):
            zvec_tpu.open(str(tmp_path / "missing"))


class TestOpenCycle:
    def test_create_open_loop(self, tmp_path):
        """Reference test_create_open_loop: repeated open/close cycles keep
        every doc intact."""
        path = str(tmp_path / "loop")
        col = zvec_tpu.create_and_open(path, full_width_schema("loop_col"))
        col.insert([make_doc(i) for i in range(20)])
        col.flush()
        col._impl.close()
        for cycle in range(4):
            col = zvec_tpu.open(path)
            got = col.fetch([f"pk{i}" for i in range(20)])
            assert len(got) == 20
            col.insert([make_doc(100 + cycle)])
            col.flush()
            col._impl.close()
        col = zvec_tpu.open(path)
        assert col.stats.doc_count == 24
        col._impl.close()

    def test_second_open_locked(self, tmp_path):
        path = str(tmp_path / "locked")
        col = zvec_tpu.create_and_open(path, _schema())
        with pytest.raises(ZvecError, match="locked"):
            zvec_tpu.open(path)
        col._impl.close()
        col2 = zvec_tpu.open(path)  # released on close
        col2._impl.close()

    def test_read_only_reopen_matrix(self, tmp_path):
        path = str(tmp_path / "ro")
        col = zvec_tpu.create_and_open(path, _schema())
        col.insert(
            [Doc(id=f"pk{i}",
                 fields={"num": i},
                 vectors={"emb": np.full(8, float(i), np.float32)})
             for i in range(8)]
        )
        col.flush()
        col._impl.close()
        ro = zvec_tpu.open(path, CollectionOption(read_only=True))
        assert ro.option.read_only
        # DQL works
        hits = ro.query(
            VectorQuery("emb", vector=np.full(8, 3.0, np.float32)), topk=1
        )
        assert hits[0].id == "pk3"
        # every DML/DDL verb rejects
        for verb in (
            lambda: ro.insert(Doc(id="pk99", fields={"num": 9},
                                  vectors={"emb": np.zeros(8, np.float32)})),
            lambda: ro.delete("pk0"),
            lambda: ro.optimize(),
        ):
            with pytest.raises(ZvecError):
                verb()
        ro._impl.close()

    @pytest.mark.parametrize("enable_mmap", [True, False])
    def test_enable_mmap_matrix(self, tmp_path, enable_mmap):
        """Reference CollectionOption(enable_mmap=...) matrix: data parity
        on both storage paths."""
        path = str(tmp_path / f"mm{int(enable_mmap)}")
        col = zvec_tpu.create_and_open(
            path, _schema(), CollectionOption(enable_mmap=enable_mmap)
        )
        col.insert(
            [Doc(id=f"pk{i}",
                 fields={"num": i},
                 vectors={"emb": np.full(8, float(i), np.float32)})
             for i in range(32)]
        )
        col.flush()
        col._impl.close()
        col = zvec_tpu.open(path, CollectionOption(enable_mmap=enable_mmap))
        got = col.fetch([f"pk{i}" for i in range(32)])
        assert len(got) == 32
        assert got["pk7"].field("num") == 7
        np.testing.assert_allclose(
            np.asarray(got["pk7"].vector("emb")), np.full(8, 7.0), rtol=0
        )
        col._impl.close()


class TestCorruption:
    def test_open_with_truncated_manifest(self, tmp_path):
        path = str(tmp_path / "corrupt")
        col = zvec_tpu.create_and_open(path, _schema())
        col.insert(
            [Doc(id="pk0", fields={"num": 0},
                 vectors={"emb": np.zeros(8, np.float32)})]
        )
        col.flush()
        col._impl.close()
        # truncate every version json to garbage
        for f in os.listdir(path):
            if f.endswith(".json"):
                with open(os.path.join(path, f), "w") as fh:
                    fh.write("{corrupt")
        with pytest.raises(Exception):
            zvec_tpu.open(path)

    def test_open_with_missing_current(self, tmp_path):
        path = str(tmp_path / "nocur")
        col = zvec_tpu.create_and_open(path, _schema())
        col._impl.close()
        cur = os.path.join(path, "CURRENT")
        if os.path.exists(cur):
            os.remove(cur)
        with pytest.raises(ZvecError, match="no collection"):
            zvec_tpu.open(path)

    def test_schema_persisted_verbatim(self, tmp_path):
        """The reopened schema must equal the created one field-for-field
        (reference test_open: schema equality across reopen)."""
        path = str(tmp_path / "persist")
        schema = full_width_schema("persist_col", indexed=True)
        col = zvec_tpu.create_and_open(path, schema)
        col._impl.close()
        col = zvec_tpu.open(path)
        assert col.schema.name == schema.name
        assert col.schema.field_names() == schema.field_names()
        assert col.schema.vector_names() == schema.vector_names()
        for a, b in zip(col.schema.fields, schema.fields):
            assert a == b, (a, b)
        for a, b in zip(col.schema.vectors, schema.vectors):
            assert a.data_type == b.data_type and a.dimension == b.dimension
        col._impl.close()
