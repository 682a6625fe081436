"""DDL + lifecycle behavior matrix: schema validation, create_and_open /
open option combinations, index DDL, column DDL, optimize, destroy
(reference analogs: `test_collection_ddl.py` 1,557 LoC,
`test_collection_create_and_open.py` 792, `test_collection_open.py` 960)."""

import os

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
    InvertIndexParam,
    IVFIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
    ZvecError,
)

from .conftest import DIM, FIELD_NAME, SCALAR_GEN, full_width_schema, make_doc


# ------------------------------------------------------------- schema ----
class TestSchemaValidation:
    def test_duplicate_names_across_fields_and_vectors(self):
        with pytest.raises(ValueError):
            CollectionSchema(
                "dup",
                fields=[FieldSchema("x", DataType.INT64)],
                vectors=[VectorSchema("x", DataType.VECTOR_FP32, 4, FlatIndexParam())],
            )
        with pytest.raises(ValueError):
            CollectionSchema(
                "dup2",
                fields=[
                    FieldSchema("x", DataType.INT64),
                    FieldSchema("x", DataType.STRING),
                ],
                vectors=[VectorSchema("v", DataType.VECTOR_FP32, 4, FlatIndexParam())],
            )

    @pytest.mark.parametrize("dim", [0, -1])
    def test_dense_vector_needs_positive_dim(self, dim):
        with pytest.raises(ValueError):
            VectorSchema("v", DataType.VECTOR_FP32, dim, FlatIndexParam())

    def test_scalar_index_param_type_enforced(self):
        with pytest.raises(ValueError):
            FieldSchema("x", DataType.INT64, index_param=HnswIndexParam())

    def test_vector_field_defaults_to_hnsw(self):
        """`VectorSchema` defaults index_param=HnswIndexParam()
        (`field_schema.py:191-193`)."""
        vs = VectorSchema("v", DataType.VECTOR_FP32, 8)
        assert isinstance(vs.index_param, HnswIndexParam)

    def test_schema_roundtrip_with_r3_params(self):
        s = full_width_schema("col_rt")
        s2 = CollectionSchema.from_dict(s.to_dict())
        assert s2 == s
        # new typed knobs survive the dict round trip
        p = HnswIndexParam(MetricType.L2, knn_k=33, prune_alpha=1.1)
        s3 = CollectionSchema(
            "rt2", vectors=[VectorSchema("v", DataType.VECTOR_FP32, 8, p)]
        )
        s4 = CollectionSchema.from_dict(s3.to_dict())
        got = s4.vector("v").index_param
        assert got.knn_k == 33 and got.prune_alpha == 1.1

    @pytest.mark.parametrize("bad_name", ["", None, 7])
    def test_bad_collection_names(self, bad_name):
        with pytest.raises((ValueError, TypeError)):
            CollectionSchema(
                bad_name,
                vectors=[VectorSchema("v", DataType.VECTOR_FP32, 4, FlatIndexParam())],
            )


# ----------------------------------------------------- create_and_open ----
class TestCreateAndOpen:
    def test_create_open_cycle_all_options(self, tmp_path):
        for mmap_on in (True, False):
            p = str(tmp_path / f"c_{mmap_on}")
            col = zvec_tpu.create_and_open(
                p, full_width_schema(f"c{mmap_on}"),
                CollectionOption(enable_mmap=mmap_on),
            )
            col.insert([make_doc(i) for i in range(20)])
            col.optimize()
            col.flush()
            del col
            col2 = zvec_tpu.open(p, CollectionOption(enable_mmap=mmap_on))
            assert col2.stats.doc_count == 20
            got = col2.fetch("pk3")["pk3"]
            assert got.fields[FIELD_NAME[DataType.STRING]] == "str_3"
            del col2

    def test_enable_mmap_false_reads_into_heap(self, tmp_path):
        """The sealed forward table must not be backed by the file mapping
        when mmap is off (reference MmapFileReadStorage vs FileReadStorage,
        `options.h:24`)."""
        p = str(tmp_path / "heap")
        col = zvec_tpu.create_and_open(
            p, full_width_schema("heap"), CollectionOption(enable_mmap=False)
        )
        col.insert([make_doc(i) for i in range(10)])
        col.optimize()
        col.flush()
        del col
        col2 = zvec_tpu.open(p, CollectionOption(enable_mmap=False))
        seg = col2._impl.segments[0]
        # heap-read tables answer even after the file is replaced on disk
        assert seg.store._table.num_rows == 10

    def test_create_on_existing_collection_fails(self, tmp_path):
        p = str(tmp_path / "dup")
        zvec_tpu.create_and_open(p, full_width_schema("dup"))._impl.close()
        with pytest.raises(ZvecError):
            zvec_tpu.create_and_open(p, full_width_schema("dup"))

    def test_open_missing_fails(self, tmp_path):
        with pytest.raises(ZvecError):
            zvec_tpu.open(str(tmp_path / "nothing"))

    def test_double_open_locked_then_released(self, tmp_path):
        p = str(tmp_path / "lock")
        col = zvec_tpu.create_and_open(p, full_width_schema("lock"))
        with pytest.raises(ZvecError):
            zvec_tpu.open(p)
        col._impl.close()
        col2 = zvec_tpu.open(p)  # lock released on close
        assert col2.stats.doc_count == 0

    def test_read_only_allows_concurrent_readers(self, tmp_path):
        p = str(tmp_path / "ro2")
        col = zvec_tpu.create_and_open(p, full_width_schema("ro2"))
        col.insert([make_doc(i) for i in range(5)])
        col.flush()
        col._impl.close()
        r1 = zvec_tpu.open(p, CollectionOption(read_only=True))
        r2 = zvec_tpu.open(p, CollectionOption(read_only=True))  # shared lock
        assert r1.stats.doc_count == r2.stats.doc_count == 5

    def test_schema_persisted_matches(self, tmp_path):
        p = str(tmp_path / "sp")
        schema = full_width_schema("col_sp")
        zvec_tpu.create_and_open(p, schema)._impl.close()
        col = zvec_tpu.open(p)
        assert col.schema == schema


# ---------------------------------------------------------------- index ----
class TestIndexDDL:
    @pytest.mark.parametrize(
        "param",
        [
            HnswIndexParam(MetricType.L2, m=8, ef_construction=40),
            IVFIndexParam(MetricType.L2, n_list=8, n_iters=2),
            FlatIndexParam(MetricType.L2),
        ],
        ids=["hnsw", "ivf", "flat"],
    )
    def test_create_index_each_type_then_query(self, tmp_path, rng, param):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "ci"), full_width_schema("col_ci")
        )
        docs = [make_doc(i) for i in range(300)]
        col.insert(docs)
        col.create_index("dense", param)
        col.optimize()
        q = np.asarray(docs[12].vectors["dense"], np.float32)
        res = col.query(VectorQuery("dense", vector=q), topk=3)
        assert res[0].id == "pk12"

    def test_create_index_unknown_field(self, full_col):
        with pytest.raises((ZvecError, ValueError)):
            full_col.create_index("ghost", FlatIndexParam())

    def test_drop_then_recreate_index(self, tmp_path, rng):
        col = zvec_tpu.create_and_open(str(tmp_path / "dr"), full_width_schema("col_dr"))
        docs = [make_doc(i) for i in range(100)]
        col.insert(docs)
        col.optimize()
        col.drop_index("dense")
        # still queryable (brute-force fallback parity: writing-segment scan)
        q = np.asarray(docs[7].vectors["dense"], np.float32)
        assert col.query(VectorQuery("dense", vector=q), topk=1)[0].id == "pk7"
        col.create_index(
            "dense", HnswIndexParam(MetricType.L2, m=8, ef_construction=40)
        )
        assert col.query(VectorQuery("dense", vector=q), topk=1)[0].id == "pk7"

    def test_create_invert_index_enables_fast_path(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "ii"), full_width_schema("col_ii"))
        col.insert([make_doc(i) for i in range(50)])
        col.optimize()
        col.create_index(
            FIELD_NAME[DataType.INT64], InvertIndexParam(enable_range_optimization=True)
        )
        got = col.query(
            VectorQuery("dense", vector=np.zeros(DIM, np.float32)),
            topk=100,
            filter=f"{FIELD_NAME[DataType.INT64]} > 0",
        )
        assert {r.id for r in got} == {f"pk{i}" for i in range(1, 50)}

    def test_index_completeness_stat(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "ic"), full_width_schema("col_ic"))
        col.insert([make_doc(i) for i in range(100)])
        col.optimize()
        stats = col.stats
        assert stats.index_completeness.get("dense", 0) == pytest.approx(1.0)


# --------------------------------------------------------------- column ----
class TestColumnDDL:
    def test_add_column_with_default_then_filter(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "ac"), full_width_schema("col_ac"))
        col.insert([make_doc(i) for i in range(30)])
        col.add_column(FieldSchema("added", DataType.INT64, nullable=True), "7")
        got = col.fetch("pk2")["pk2"]
        assert got.fields["added"] == 7
        # new docs may set it; filter sees both
        d = make_doc(99)
        d.fields["added"] = 1
        col.insert(d)
        hits = col.query(
            VectorQuery("dense", vector=np.zeros(DIM, np.float32)),
            topk=100,
            filter="added = 7",
        )
        assert len(hits) == 30

    def test_add_column_expression(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "ae"), full_width_schema("col_ae"))
        col.insert([make_doc(i) for i in range(10)])
        col.add_column(
            FieldSchema("doubled", DataType.DOUBLE, nullable=True),
            expression=f"{FIELD_NAME[DataType.FLOAT]} * 2",
        )
        got = col.fetch("pk4")["pk4"]
        assert got.fields["doubled"] == pytest.approx(4 * 0.5 * 2)

    def test_drop_column_removes_everywhere(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "dc"), full_width_schema("col_dc"))
        col.insert([make_doc(i) for i in range(10)])
        name = FIELD_NAME[DataType.UINT64]
        col.drop_column(name)
        assert col.schema.field(name) is None
        assert name not in col.fetch("pk1")["pk1"].fields
        with pytest.raises((ZvecError, ValueError)):  # FilterError(ValueError)
            col.query(
                VectorQuery("dense", vector=np.zeros(DIM, np.float32)),
                topk=3,
                filter=f"{name} > 0",
            )

    def test_alter_column_rename_persists(self, tmp_path):
        p = str(tmp_path / "ar")
        col = zvec_tpu.create_and_open(p, full_width_schema("col_ar"))
        col.insert([make_doc(i) for i in range(10)])
        old = FIELD_NAME[DataType.INT32]
        col.alter_column(
            old, field_schema=FieldSchema("renamed_i32", DataType.INT32, nullable=True)
        )
        assert col.fetch("pk3")["pk3"].fields["renamed_i32"] == -2
        col.flush()
        col._impl.close()
        col2 = zvec_tpu.open(p)
        assert col2.schema.field("renamed_i32") is not None
        assert col2.schema.field(old) is None

    def test_column_ddl_on_sealed_segments(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "sc"), full_width_schema("col_sc"))
        col.insert([make_doc(i) for i in range(20)])
        col.optimize()  # seal
        col.add_column(FieldSchema("late", DataType.STRING, nullable=True), "'x'")
        assert col.fetch("pk0")["pk0"].fields["late"] == "x"


# -------------------------------------------------------------- optimize ----
class TestOptimize:
    def test_optimize_compacts_deletes(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "oc"), full_width_schema("col_oc"))
        col.insert([make_doc(i) for i in range(100)])
        col.delete([f"pk{i}" for i in range(0, 100, 2)])
        col.optimize()
        assert col.stats.doc_count == 50
        seg_rows = sum(s.store.count for s in col._impl.segments)
        assert seg_rows == 50  # tombstoned rows physically gone

    def test_optimize_idempotent(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "oi"), full_width_schema("col_oi"))
        col.insert([make_doc(i) for i in range(30)])
        col.optimize()
        v1 = {s.meta.segment_id for s in col._impl.segments}
        col.optimize()
        assert col.stats.doc_count == 30
        q = np.asarray(make_doc(3).vectors["dense"], np.float32)
        assert col.query(VectorQuery("dense", vector=q), topk=1)[0].id == "pk3"

    def test_optimize_empty_collection(self, full_col):
        full_col.optimize()  # must not raise
        assert full_col.stats.doc_count == 0

    def test_destroy_removes_directory(self, tmp_path):
        p = str(tmp_path / "destroy")
        col = zvec_tpu.create_and_open(p, full_width_schema("destroy"))
        col.insert(make_doc(0))
        col.destroy()
        assert not os.path.exists(p)


class TestColumnNameRules:
    """Column-DDL name validation parity: add/alter enforce the same
    [a-zA-Z0-9_-]{1,32} rule as create time (reference
    `test_collection_ddl.py:1256-1273`, `:1442-1462`)."""

    @pytest.mark.parametrize(
        "bad", ["", "has space", "semi;colon", "x" * 33, "dot.name", "unié"]
    )
    def test_add_column_invalid_names(self, tmp_path, bad):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), full_width_schema("addname")
        )
        with pytest.raises((ValueError, ZvecError)):
            col.add_column(FieldSchema(bad, DataType.INT64))

    @pytest.mark.parametrize("good", ["a", "A-1_b", "x" * 32])
    def test_add_column_valid_names(self, tmp_path, good):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), full_width_schema("addok")
        )
        col.add_column(FieldSchema(good, DataType.INT64))
        assert col.schema.field(good) is not None

    # "" is excluded: empty new_name means "keep the old name" (rename no-op)
    @pytest.mark.parametrize("bad", ["has space", "x" * 33, "dot.name"])
    def test_alter_column_invalid_target_names(self, tmp_path, bad):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), full_width_schema("altname")
        )
        src = FIELD_NAME[DataType.INT64]
        with pytest.raises((ValueError, ZvecError)):
            col.alter_column(src, bad)
        # source untouched on failure
        assert col.schema.field(src) is not None


class TestIndexDdlIdempotence:
    def test_duplicate_create_index_is_idempotent(self, tmp_path, rng):
        """Re-creating the same scalar index succeeds and filtered results
        are unchanged (reference `test_collection_ddl.py:195-262`)."""
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), full_width_schema("dupidx")
        )
        f = FIELD_NAME[DataType.INT64]
        docs = [make_doc(i, np.random.default_rng(i)) for i in range(40)]
        col.insert(docs)
        flt = f"{f} >= 20"
        before = {d.id for d in col.query(filter=flt, topk=100)}
        col.create_index(f, InvertIndexParam())
        mid = {d.id for d in col.query(filter=flt, topk=100)}
        col.create_index(f, InvertIndexParam())  # duplicate: must not raise
        after = {d.id for d in col.query(filter=flt, topk=100)}
        assert before == mid == after and before


class TestComplicatedWorkflow:
    def test_interleaved_ddl_dml_dql(self, tmp_path, rng):
        """The reference's end-to-end DDL walk
        (`test_collection_ddl.py:594-781`): create -> insert -> scalar
        index -> query -> add_column -> update -> alter_column -> query ->
        drop_column -> optimize -> query -> drop_index, checking
        consistency at every step."""
        col = zvec_tpu.create_and_open(
            str(tmp_path / "c"), full_width_schema("flow")
        )
        f = FIELD_NAME[DataType.INT64]
        docs = [make_doc(i, np.random.default_rng(100 + i)) for i in range(30)]
        col.insert(docs)
        col.create_index(f, InvertIndexParam())
        q = rng.standard_normal(DIM).astype(np.float32)
        base = col.query(VectorQuery("dense", vector=q), topk=5)
        assert len(base) == 5

        col.add_column(FieldSchema("stage", DataType.INT64), expression="7")
        got = col.fetch(docs[3].id)[docs[3].id]
        assert got.fields["stage"] == 7

        col.upsert(
            Doc(id=docs[3].id, fields={**docs[3].fields, "stage": 99},
                vectors=docs[3].vectors)
        )
        assert col.fetch(docs[3].id)[docs[3].id].fields["stage"] == 99

        col.alter_column("stage", "phase")
        assert col.schema.field("stage") is None
        assert col.fetch(docs[3].id)[docs[3].id].fields["phase"] == 99
        assert {d.id for d in col.query(filter="phase = 99", topk=10)} == {
            docs[3].id
        }

        col.drop_column("phase")
        assert "phase" not in col.fetch(docs[3].id)[docs[3].id].fields

        col.optimize()
        col.flush()
        sealed = col.query(VectorQuery("dense", vector=q), topk=5)
        assert [d.id for d in sealed] == [d.id for d in base]

        col.drop_index(f)
        assert {d.id for d in col.query(filter=f"{f} >= 0", topk=100)} == {
            d.id for d in col.query(filter=f"{f} >= 0", topk=100)
        }


# ------------------------------------------------ column-DDL behavior matrix ----
class TestColumnDdlMatrix:
    """add/alter/drop column edge matrix (reference
    `test_collection_ddl.py:916-1533`: dtype catalog, nullable options,
    expression catalog incl. CASE WHEN, unknown-target errors)."""

    @pytest.mark.parametrize("dt", list(SCALAR_GEN), ids=[d.name for d in SCALAR_GEN])
    def test_add_column_every_scalar_dtype(self, tmp_path, dt):
        name = f"col_ad_{dt.name.lower()}"
        col = zvec_tpu.create_and_open(str(tmp_path / "ad"), full_width_schema(name))
        col.insert([make_doc(i) for i in range(8)])
        fname = f"added_{dt.name.lower()}"
        col.add_column(FieldSchema(fname, dt, nullable=True))
        # existing rows read back NULL for the new column
        assert col.fetch("pk1")["pk1"].fields[fname] is None
        # a new insert round-trips a value of the column's type
        d = make_doc(50)
        val = SCALAR_GEN[dt](3)
        d.fields[fname] = val
        assert col.insert(d).ok()
        got = col.fetch("pk50")["pk50"].fields[fname]
        if dt in (DataType.FLOAT, DataType.DOUBLE):
            assert got == pytest.approx(val)
        elif dt == DataType.ARRAY_FLOAT:
            assert [float(x) for x in got] == pytest.approx([float(x) for x in val])
        elif dt.is_array:
            assert list(got) == list(val)
        else:
            assert got == val

    def test_add_column_duplicate_name_rejected(self, tmp_path):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "dup"), full_width_schema("col_dup")
        )
        with pytest.raises((ZvecError, ValueError)):
            col.add_column(
                FieldSchema(FIELD_NAME[DataType.INT32], DataType.INT32, nullable=True)
            )
        with pytest.raises((ZvecError, ValueError)):  # vector names share the space
            col.add_column(FieldSchema("dense", DataType.INT32, nullable=True))

    def test_add_column_vector_dtype_rejected(self, tmp_path):
        # FieldSchema only accepts SUPPORT_SCALAR_DATA_TYPE (`field_schema.py`)
        for dt in (DataType.VECTOR_FP32, DataType.SPARSE_VECTOR_FP32):
            with pytest.raises((ZvecError, ValueError)):
                FieldSchema("v", dt, nullable=True)

    def test_add_non_nullable_column_then_null_insert_rejected(self, tmp_path):
        # reference `test_collection_ddl.py:1066-1127`: non-nullable add_column
        # with a backfill expression succeeds; later NULL inserts are rejected
        col = zvec_tpu.create_and_open(str(tmp_path / "nn"), full_width_schema("col_nn2"))
        col.insert([make_doc(i) for i in range(5)])
        col.add_column(FieldSchema("req", DataType.INT32, nullable=False), "100")
        assert col.fetch("pk2")["pk2"].fields["req"] == 100
        ok_doc = make_doc(10)
        ok_doc.fields["req"] = 7
        assert col.insert(ok_doc).ok()
        bad = make_doc(11)
        bad.fields["req"] = None
        res_or_exc = None
        try:
            res_or_exc = col.insert(bad)
        except (ZvecError, ValueError):
            return  # raising is also acceptable
        assert not res_or_exc.ok()

    EXPR_CASES = [
        ("1", lambda f: 1),
        ("1.5", lambda f: 1.5),
        ("'test'", lambda f: "test"),
        (FIELD_NAME[DataType.INT32], lambda f: f[FIELD_NAME[DataType.INT32]]),
        (
            f"{FIELD_NAME[DataType.FLOAT]} * 2",
            lambda f: f[FIELD_NAME[DataType.FLOAT]] * 2,
        ),
        (
            f"{FIELD_NAME[DataType.FLOAT]} + {FIELD_NAME[DataType.INT32]}",
            lambda f: f[FIELD_NAME[DataType.FLOAT]] + f[FIELD_NAME[DataType.INT32]],
        ),
        (
            f"CASE WHEN {FIELD_NAME[DataType.FLOAT]} > 2 THEN 1 ELSE 0 END",
            lambda f: 1 if f[FIELD_NAME[DataType.FLOAT]] > 2 else 0,
        ),
        (  # lowercase keywords + AND condition
            f"case when {FIELD_NAME[DataType.FLOAT]} >= 1 and "
            f"{FIELD_NAME[DataType.INT32]} < 2 then 10 else 20 end",
            lambda f: 10
            if f[FIELD_NAME[DataType.FLOAT]] >= 1 and f[FIELD_NAME[DataType.INT32]] < 2
            else 20,
        ),
        (  # first matching WHEN wins; no ELSE -> NULL
            f"CASE WHEN {FIELD_NAME[DataType.FLOAT]} > 1 THEN 'hi' "
            f"WHEN {FIELD_NAME[DataType.FLOAT]} > 0 THEN 'lo' END",
            lambda f: "hi"
            if f[FIELD_NAME[DataType.FLOAT]] > 1
            else ("lo" if f[FIELD_NAME[DataType.FLOAT]] > 0 else None),
        ),
    ]

    @pytest.mark.parametrize("expr,oracle", EXPR_CASES, ids=[c[0] for c in EXPR_CASES])
    def test_add_column_expression_catalog(self, tmp_path, expr, oracle):
        # reference expression matrix `test_collection_ddl.py:1129-1170`
        col = zvec_tpu.create_and_open(str(tmp_path / "ex"), full_width_schema("col_ex"))
        docs = [make_doc(i) for i in range(6)]
        col.insert(docs)
        col.add_column(FieldSchema("derived", DataType.STRING, nullable=True)
                       if "'" in expr or "hi" in expr
                       else FieldSchema("derived", DataType.DOUBLE, nullable=True),
                       expression=expr)
        for d in docs:
            got = col.fetch(d.id)[d.id].fields["derived"]
            want = oracle(d.fields)
            if want is None:
                assert got is None
            elif isinstance(want, str):
                assert got == want
            else:
                assert float(got) == pytest.approx(float(want))

    def test_case_when_null_condition_falls_through(self, tmp_path):
        # NULL fails every WHEN predicate -> ELSE branch (filter semantics)
        col = zvec_tpu.create_and_open(str(tmp_path / "cn"), full_width_schema("col_cn"))
        d = make_doc(0)
        d.fields[FIELD_NAME[DataType.FLOAT]] = None
        col.insert([d, make_doc(1)])
        col.add_column(
            FieldSchema("bucket", DataType.DOUBLE, nullable=True),
            expression=f"CASE WHEN {FIELD_NAME[DataType.FLOAT]} >= 0 THEN 1 ELSE 0 END",
        )
        assert float(col.fetch("pk0")["pk0"].fields["bucket"]) == 0.0
        assert float(col.fetch("pk1")["pk1"].fields["bucket"]) == 1.0

    def test_case_when_null_fails_not_equal_too(self, tmp_path):
        # NULL fails EVERY predicate including != and = (ADVICE r3: the old
        # None->NaN mapping made np.not_equal(NaN, x) True, so NULL rows
        # wrongly took the THEN branch of a != condition)
        col = zvec_tpu.create_and_open(str(tmp_path / "cne"), full_width_schema("col_cne"))
        d = make_doc(0)
        d.fields[FIELD_NAME[DataType.FLOAT]] = None
        col.insert([d, make_doc(1), make_doc(4)])  # f_float: None, 0.5, 2.0
        col.add_column(
            FieldSchema("b_ne", DataType.DOUBLE, nullable=True),
            expression=f"CASE WHEN {FIELD_NAME[DataType.FLOAT]} != 0.5 THEN 1 ELSE 0 END",
        )
        assert float(col.fetch("pk0")["pk0"].fields["b_ne"]) == 0.0  # NULL -> ELSE
        assert float(col.fetch("pk1")["pk1"].fields["b_ne"]) == 0.0  # 0.5 == 0.5
        assert float(col.fetch("pk4")["pk4"].fields["b_ne"]) == 1.0  # 2.0 != 0.5

    def test_case_when_null_string_ordered_compare(self, tmp_path):
        # ordered compares on string columns with NULL holes must treat NULL
        # as non-matching, not crash (ADVICE r3: np.less raised TypeError on
        # the object array, aborting add_column)
        col = zvec_tpu.create_and_open(str(tmp_path / "cns"), full_width_schema("col_cns"))
        d = make_doc(0)
        d.fields[FIELD_NAME[DataType.STRING]] = None
        col.insert([d, make_doc(1)])  # f_string: None, 'str_1'
        for op, null_val, v1 in (("<", 0.0, 1.0), ("!=", 0.0, 1.0), ("=", 0.0, 0.0)):
            name = f"b_s_{'lt' if op == '<' else 'ne' if op == '!=' else 'eq'}"
            col.add_column(
                FieldSchema(name, DataType.DOUBLE, nullable=True),
                expression=(
                    f"CASE WHEN {FIELD_NAME[DataType.STRING]} {op} 'str_9'"
                    " THEN 1 ELSE 0 END"
                ),
            )
            assert float(col.fetch("pk0")["pk0"].fields[name]) == null_val, op
            assert float(col.fetch("pk1")["pk1"].fields[name]) == v1, op

    @pytest.mark.parametrize(
        "expr",
        [
            "CASE WHEN 1 > 0 THEN 1",  # missing END
            "CASE 1 END",  # missing WHEN
            "CASE WHEN ghost_field > 0 THEN 1 END",  # unknown field
            "1 +",  # trailing operator
            f"CASE WHEN {FIELD_NAME[DataType.INT32]} THEN 1 END",  # no comparison
        ],
    )
    def test_invalid_expressions_rejected(self, tmp_path, expr):
        col = zvec_tpu.create_and_open(str(tmp_path / "bad"), full_width_schema("col_bx"))
        col.insert(make_doc(0))
        with pytest.raises((ZvecError, ValueError)):
            col.add_column(
                FieldSchema("nope", DataType.DOUBLE, nullable=True), expression=expr
            )
        # the failed DDL must not leave a phantom field in the schema
        # (add_column validates the expression BEFORE mutating the schema)
        assert col.schema.field("nope") is None
        # and the collection stays fully usable: insert + fetch still work
        col.insert(make_doc(1))
        assert col.fetch("pk1")

    def test_alter_unknown_source_rejected(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "au"), full_width_schema("col_au"))
        with pytest.raises(ZvecError):
            col.alter_column("ghost", "renamed")

    def test_drop_unknown_rejected(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "du"), full_width_schema("col_du"))
        with pytest.raises(ZvecError):
            col.drop_column("ghost")

    def test_alter_to_existing_name_rejected(self, tmp_path):
        col = zvec_tpu.create_and_open(str(tmp_path / "ae2"), full_width_schema("col_ae2"))
        with pytest.raises(ZvecError):
            col.alter_column(
                FIELD_NAME[DataType.INT32], FIELD_NAME[DataType.INT64]
            )
        with pytest.raises(ZvecError):  # vector names are reserved too
            col.alter_column(FIELD_NAME[DataType.INT32], "dense")
