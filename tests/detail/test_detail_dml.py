"""DML behavior matrix: insert / update / upsert / delete edge cases across
every scalar DataType, pk shapes, batch sizes, and nullability modes
(reference analog: `python/tests/detail/test_collection_dml.py`, 1,180 LoC)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import DataType, Doc, StatusCode, ZvecError

from .conftest import DIM, FIELD_NAME, SCALAR_GEN, full_width_schema, make_doc

MAX_BATCH = 1024  # reference kMaxWriteBatchSize (collection.cc:1443-1445)


# ---------------------------------------------------------------- insert ----
class TestInsert:
    def test_single_and_stats(self, full_col):
        st = full_col.insert(make_doc(0))
        assert st.ok()
        assert full_col.stats.doc_count == 1

    @pytest.mark.parametrize("n", [1, 5, 100, MAX_BATCH])
    def test_batch_sizes(self, full_col, n):
        sts = full_col.insert([make_doc(i) for i in range(n)])
        assert all(s.ok() for s in sts)
        assert full_col.stats.doc_count == n

    def test_batch_over_cap_rejected(self, full_col):
        with pytest.raises(ZvecError) as e:
            full_col.insert([make_doc(i) for i in range(MAX_BATCH + 1)])
        assert e.value.code == StatusCode.INVALID_ARGUMENT
        assert full_col.stats.doc_count == 0  # nothing partially applied

    def test_duplicate_pk_rejected_count_unchanged(self, full_col):
        assert full_col.insert(make_doc(1)).ok()
        st = full_col.insert(make_doc(1))
        assert not st.ok() and st.code == StatusCode.ALREADY_EXISTS
        assert full_col.stats.doc_count == 1

    def test_duplicate_within_one_batch(self, full_col):
        d = make_doc(2)
        sts = full_col.insert([d, make_doc(3), Doc(id=d.id, vectors=d.vectors)])
        assert sts[0].ok() and sts[1].ok() and not sts[2].ok()
        assert full_col.stats.doc_count == 2

    @pytest.mark.parametrize(
        "pk",
        ["a", "0", "pk with spaces", "ünïcode-⊕", "x" * 1024, "1" * 128],
    )
    def test_valid_pks(self, full_col, pk):
        st = full_col.insert(
            Doc(id=pk, vectors=make_doc(0).vectors)
        )
        assert st.ok(), (pk, st)
        assert pk in full_col.fetch(pk)

    @pytest.mark.parametrize("pk", ["", None, 123, 1.5, b"bytes"])
    def test_invalid_pks(self, full_col, pk):
        doc = make_doc(0)
        try:
            bad = Doc(id=pk, fields=doc.fields, vectors=doc.vectors)
        except Exception:
            return  # rejected at Doc construction: equally valid
        res = full_col.insert(bad)
        assert not res.ok()
        assert full_col.stats.doc_count == 0

    @pytest.mark.parametrize("dt", list(SCALAR_GEN))
    def test_each_scalar_type_roundtrips(self, full_col, dt):
        name = FIELD_NAME[dt]
        val = SCALAR_GEN[dt](7)
        d = make_doc(7)
        d.fields[name] = val
        assert full_col.insert(d).ok()
        got = full_col.fetch(d.id)[d.id].fields[name]
        if dt in (DataType.FLOAT, DataType.DOUBLE):
            assert got == pytest.approx(val)
        elif dt == DataType.ARRAY_FLOAT:
            assert list(got) == pytest.approx(val)
        elif dt.is_array:
            assert list(got) == list(val)
        else:
            assert got == val

    @pytest.mark.parametrize(
        "dt,bad",
        [
            (DataType.INT32, 2**40),        # overflow
            (DataType.INT32, "not-an-int"),
            (DataType.UINT32, -1),           # sign violation
            (DataType.UINT64, -5),
            (DataType.BOOL, "true"),
            (DataType.STRING, 42),
            (DataType.ARRAY_INT64, [1, "x"]),
        ],
    )
    def test_invalid_field_values_rejected(self, full_col, dt, bad):
        d = make_doc(0)
        d.fields[FIELD_NAME[dt]] = bad
        res = full_col.insert(d)
        assert not res.ok(), (dt, bad)
        assert full_col.stats.doc_count == 0

    def test_unknown_field_rejected(self, full_col):
        d = make_doc(0)
        d.fields["no_such_field"] = 1
        assert not full_col.insert(d).ok()

    def test_nullable_fields_accept_none(self, full_col):
        d = Doc(id="nulls", vectors=make_doc(0).vectors)  # no scalar fields
        assert full_col.insert(d).ok()
        got = full_col.fetch("nulls")["nulls"]
        assert got.fields[FIELD_NAME[DataType.STRING]] is None

    def test_non_nullable_rejects_none(self, tmp_path):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "nn"), full_width_schema("col_nn", nullable=False)
        )
        d = Doc(id="x", vectors=make_doc(0).vectors)
        assert not col.insert(d).ok()

    @pytest.mark.parametrize(
        "vec",
        [
            np.zeros(DIM - 1, np.float32),           # wrong dim
            np.zeros((2, DIM), np.float32),          # wrong rank
            ["a"] * DIM,                              # non-numeric
        ],
    )
    def test_invalid_dense_vectors_rejected(self, full_col, vec):
        d = make_doc(0)
        try:
            d2 = Doc(id="v", fields=d.fields, vectors={"dense": vec, "sparse": {1: 1.0}})
        except Exception:
            return
        assert not full_col.insert(d2).ok()

    def test_dense_vector_dtype_coercion(self, full_col):
        # list and float64 inputs coerce to the storage dtype
        d = make_doc(0)
        for i, v in enumerate(
            [list(range(DIM)), np.arange(DIM, dtype=np.float64)]
        ):
            assert full_col.insert(
                Doc(id=f"c{i}", fields=d.fields, vectors={"dense": v, "sparse": {1: 1.0}})
            ).ok()
        got = full_col.fetch("c0")["c0"].vector("dense")
        np.testing.assert_allclose(np.asarray(got), np.arange(DIM, dtype=np.float32))

    def test_sparse_vector_shapes(self, full_col):
        d = make_doc(0)
        ok = full_col.insert(
            Doc(id="sp", fields=d.fields,
                vectors={"dense": d.vectors["dense"], "sparse": {0: 1.0, 99999: -2.5}})
        )
        assert ok.ok()
        got = full_col.fetch("sp")["sp"].vector("sparse")
        assert got[99999] == pytest.approx(-2.5)


# ---------------------------------------------------------------- update ----
class TestUpdate:
    def test_update_merges_partial_fields(self, loaded_col):
        col, docs = loaded_col
        name_i64 = FIELD_NAME[DataType.INT64]
        name_str = FIELD_NAME[DataType.STRING]
        st = col.update(Doc(id="pk3", fields={name_i64: 999}))
        assert st.ok()
        got = col.fetch("pk3")["pk3"]
        assert got.fields[name_i64] == 999
        # untouched field survives the merge (reference doc->merge semantics)
        assert got.fields[name_str] == docs[3].fields[name_str]
        np.testing.assert_allclose(
            np.asarray(got.vector("dense")), docs[3].vectors["dense"], rtol=1e-6
        )

    def test_update_vector_only(self, loaded_col):
        col, docs = loaded_col
        newv = np.ones(DIM, np.float32)
        assert col.update(Doc(id="pk5", vectors={"dense": newv})).ok()
        got = col.fetch("pk5")["pk5"]
        np.testing.assert_allclose(np.asarray(got.vector("dense")), newv)
        # sparse vector untouched
        assert got.vector("sparse") == {
            int(k): pytest.approx(v) for k, v in docs[5].vectors["sparse"].items()
        }

    def test_update_missing_pk(self, loaded_col):
        col, _ = loaded_col
        st = col.update(Doc(id="nope", fields={FIELD_NAME[DataType.INT64]: 1}))
        assert not st.ok() and st.code == StatusCode.NOT_FOUND

    def test_update_on_empty_collection(self, full_col):
        st = full_col.update(Doc(id="x", fields={FIELD_NAME[DataType.INT64]: 1}))
        assert not st.ok()

    def test_update_batch_mixed(self, loaded_col):
        col, _ = loaded_col
        sts = col.update(
            [
                Doc(id="pk1", fields={FIELD_NAME[DataType.INT64]: 11}),
                Doc(id="missing", fields={FIELD_NAME[DataType.INT64]: 12}),
                Doc(id="pk2", fields={FIELD_NAME[DataType.INT64]: 13}),
            ]
        )
        assert [s.ok() for s in sts] == [True, False, True]
        assert col.stats.doc_count == 200  # updates never change the count

    def test_update_invalid_value_leaves_doc_intact(self, loaded_col):
        col, docs = loaded_col
        st = col.update(Doc(id="pk4", fields={FIELD_NAME[DataType.UINT32]: -9}))
        assert not st.ok()
        got = col.fetch("pk4")["pk4"]
        assert got.fields[FIELD_NAME[DataType.UINT32]] == docs[4].fields[
            FIELD_NAME[DataType.UINT32]
        ]

    def test_updated_doc_found_by_new_vector(self, loaded_col):
        col, _ = loaded_col
        from zvec_tpu import VectorQuery

        target = np.full(DIM, 5.0, np.float32)
        assert col.update(Doc(id="pk9", vectors={"dense": target})).ok()
        res = col.query(VectorQuery("dense", vector=target), topk=1)
        assert res[0].id == "pk9"


# ---------------------------------------------------------------- upsert ----
class TestUpsert:
    def test_upsert_new_and_existing(self, full_col):
        d = make_doc(0)
        assert full_col.upsert(d).ok()
        assert full_col.stats.doc_count == 1
        d2 = make_doc(0)
        d2.fields[FIELD_NAME[DataType.INT64]] = 42
        assert full_col.upsert(d2).ok()
        assert full_col.stats.doc_count == 1
        assert full_col.fetch(d.id)[d.id].fields[FIELD_NAME[DataType.INT64]] == 42

    def test_upsert_replaces_not_merges(self, full_col):
        """Upsert = tombstone + full insert (segment.cc:828-835): fields not
        present in the new doc become null, unlike update's merge."""
        d = make_doc(0)
        assert full_col.insert(d).ok()
        slim = Doc(id=d.id, vectors=d.vectors)  # no scalar fields
        assert full_col.upsert(slim).ok()
        got = full_col.fetch(d.id)[d.id]
        assert got.fields[FIELD_NAME[DataType.STRING]] is None

    @pytest.mark.parametrize("n", [5, 64, MAX_BATCH])
    def test_upsert_batch_mixed_new_existing(self, full_col, n):
        full_col.insert([make_doc(i) for i in range(0, n, 2)])
        sts = full_col.upsert([make_doc(i) for i in range(n)])
        assert all(s.ok() for s in sts)
        assert full_col.stats.doc_count == n

    def test_upsert_invalid_value(self, full_col):
        d = make_doc(0)
        d.fields[FIELD_NAME[DataType.INT32]] = "bad"
        assert not full_col.upsert(d).ok()
        assert full_col.stats.doc_count == 0


# ---------------------------------------------------------------- delete ----
class TestDelete:
    def test_delete_then_fetch_and_query_miss(self, loaded_col):
        col, docs = loaded_col
        from zvec_tpu import VectorQuery

        assert col.delete("pk7").ok()
        assert col.fetch("pk7") == {}
        res = col.query(VectorQuery("dense", vector=docs[7].vectors["dense"]), topk=5)
        assert all(r.id != "pk7" for r in res)

    def test_delete_missing_and_empty(self, loaded_col):
        col, _ = loaded_col
        assert not col.delete("ghost").ok()
        assert col.delete([]) == []

    def test_delete_batch_part_missing(self, loaded_col):
        col, _ = loaded_col
        sts = col.delete(["pk1", "ghost", "pk2"])
        assert [s.ok() for s in sts] == [True, False, True]
        assert col.stats.doc_count == 198

    def test_delete_twice(self, loaded_col):
        col, _ = loaded_col
        assert col.delete("pk0").ok()
        assert not col.delete("pk0").ok()

    def test_reinsert_after_delete(self, loaded_col):
        col, _ = loaded_col
        assert col.delete("pk0").ok()
        nd = make_doc(0)
        nd.fields[FIELD_NAME[DataType.INT64]] = -1
        assert col.insert(nd).ok()
        assert col.fetch("pk0")["pk0"].fields[FIELD_NAME[DataType.INT64]] == -1

    def test_delete_by_filter(self, loaded_col):
        col, docs = loaded_col
        name = FIELD_NAME[DataType.BOOL]
        col.delete_by_filter(f"{name} = true")
        expect_remaining = sum(1 for d in docs if d.fields[name] is False)
        assert col.stats.doc_count == expect_remaining
        # survivors all have the field false
        for pk, doc in col.fetch([d.id for d in docs[:20]]).items():
            assert doc.fields[name] is False

    def test_delete_by_filter_matching_nothing(self, loaded_col):
        col, _ = loaded_col
        col.delete_by_filter(f"{FIELD_NAME[DataType.INT64]} < -999999999999999")
        assert col.stats.doc_count == 200

    def test_delete_survives_flush_reopen(self, tmp_path, rng):
        col = zvec_tpu.create_and_open(
            str(tmp_path / "dsr"), full_width_schema("dsr")
        )
        col.insert([make_doc(i) for i in range(50)])
        col.delete([f"pk{i}" for i in range(0, 50, 5)])
        col.flush()
        path = col._impl.path
        del col
        col2 = zvec_tpu.open(path)
        assert col2.stats.doc_count == 40
        assert col2.fetch("pk5") == {}
        assert "pk6" in col2.fetch("pk6")


# ---------------------------------------------------------- write barrier ----
class TestWriteInvariants:
    def test_interleaved_ops_sequence(self, full_col):
        """A scripted op sequence lands on the exact oracle state."""
        oracle = {}
        for i in range(40):
            d = make_doc(i)
            full_col.insert(d)
            oracle[d.id] = d
        for i in range(0, 40, 4):
            full_col.delete(f"pk{i}")
            del oracle[f"pk{i}"]
        for i in range(1, 40, 4):
            nd = make_doc(i)
            nd.fields[FIELD_NAME[DataType.INT64]] = i * 2
            full_col.upsert(nd)
            oracle[nd.id] = nd
        assert full_col.stats.doc_count == len(oracle)
        got = full_col.fetch(list(oracle))
        assert set(got) == set(oracle)
        for i in range(1, 40, 4):
            assert got[f"pk{i}"].fields[FIELD_NAME[DataType.INT64]] == i * 2

    def test_writes_rejected_on_read_only(self, tmp_path):
        from zvec_tpu import CollectionOption

        col = zvec_tpu.create_and_open(
            str(tmp_path / "ro"), full_width_schema("col_ro")
        )
        col.insert(make_doc(0))
        col.flush()
        path = col._impl.path
        del col
        ro = zvec_tpu.open(path, CollectionOption(read_only=True))
        with pytest.raises(ZvecError):
            ro.insert(make_doc(1))
        with pytest.raises(ZvecError):
            ro.delete("pk0")
