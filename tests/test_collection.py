"""End-to-end Collection tests (reference analog: `python/tests/test_collection.py`
and `python/tests/detail/` DML/DQL/open suites)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    MetricType,
    StatusCode,
    VectorQuery,
    VectorSchema,
    ZvecError,
)


@pytest.fixture
def schema():
    return CollectionSchema(
        "test",
        fields=[
            FieldSchema("title", DataType.STRING, nullable=True),
            FieldSchema("price", DataType.DOUBLE, nullable=True),
            FieldSchema("count", DataType.INT64, nullable=True),
        ],
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, 16, FlatIndexParam(MetricType.L2)
            )
        ],
    )


@pytest.fixture
def coll(tmp_path, schema):
    c = zvec_tpu.create_and_open(str(tmp_path / "col"), schema)
    yield c
    c._impl.close()


def make_docs(rng, n, dim=16, start=0):
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return [
        Doc(
            id=f"doc{start + i}",
            vectors={"emb": vecs[i]},
            fields={"title": f"t{start + i}", "price": float(i), "count": i},
        )
        for i in range(n)
    ], vecs


def test_insert_query_exact(coll, rng):
    docs, vecs = make_docs(rng, 100)
    statuses = coll.insert(docs)
    assert all(s.is_ok() for s in statuses)
    assert coll.stats.doc_count == 100

    q = vecs[7]
    result = coll.query(VectorQuery("emb", vector=q), topk=5)
    assert result[0].id == "doc7"
    # L2 score of self-match ~ 0
    assert result[0].score == pytest.approx(0.0, abs=1e-4)
    # oracle check of full ranking
    d = ((q[None, :] - vecs) ** 2).sum(1)
    expect = [f"doc{i}" for i in np.argsort(d)[:5]]
    assert [r.id for r in result] == expect
    scores = np.sort(d)[:5]
    np.testing.assert_allclose([r.score for r in result], scores, rtol=1e-4, atol=1e-4)


def test_insert_duplicate(coll, rng):
    docs, _ = make_docs(rng, 3)
    coll.insert(docs)
    st = coll.insert(docs[0])
    assert st.code == StatusCode.ALREADY_EXISTS


def test_fetch_and_output_fields(coll, rng):
    docs, vecs = make_docs(rng, 10)
    coll.insert(docs)
    fetched = coll.fetch(["doc3", "missing"])
    assert set(fetched.keys()) == {"doc3"}
    assert fetched["doc3"].field("title") == "t3"
    np.testing.assert_allclose(fetched["doc3"].vector("emb"), vecs[3], rtol=1e-6)

    result = coll.query(
        VectorQuery("emb", vector=vecs[0]), topk=1, output_fields=["price"]
    )
    assert "price" in result[0].fields and "title" not in result[0].fields
    assert result[0].vectors == {}

    result = coll.query(VectorQuery("emb", vector=vecs[0]), topk=1, include_vector=True)
    np.testing.assert_allclose(result[0].vector("emb"), vecs[0], rtol=1e-6)


def test_delete(coll, rng):
    docs, vecs = make_docs(rng, 10)
    coll.insert(docs)
    st = coll.delete("doc0")
    assert st.is_ok()
    assert coll.stats.doc_count == 9
    result = coll.query(VectorQuery("emb", vector=vecs[0]), topk=3)
    assert "doc0" not in [r.id for r in result]
    st = coll.delete("doc0")
    assert st.code == StatusCode.NOT_FOUND
    assert coll.fetch("doc0") == {}


def test_update_merges_fields(coll, rng):
    docs, vecs = make_docs(rng, 5)
    coll.insert(docs)
    st = coll.update(Doc(id="doc2", fields={"price": 99.5}))
    assert st.is_ok()
    d = coll.fetch("doc2")["doc2"]
    assert d.field("price") == 99.5
    assert d.field("title") == "t2"  # merged, not lost
    np.testing.assert_allclose(d.vector("emb"), vecs[2], rtol=1e-6)
    # update nonexistent
    st = coll.update(Doc(id="nope", fields={"price": 1.0}))
    assert st.code == StatusCode.NOT_FOUND


def test_upsert_replaces(coll, rng):
    docs, vecs = make_docs(rng, 5)
    coll.insert(docs)
    newvec = rng.standard_normal(16).astype(np.float32)
    st = coll.upsert(Doc(id="doc1", vectors={"emb": newvec}, fields={"title": "new"}))
    assert st.is_ok()
    d = coll.fetch("doc1")["doc1"]
    assert d.field("title") == "new"
    assert d.field("price") is None  # upsert replaces whole doc, no merge
    np.testing.assert_allclose(d.vector("emb"), newvec, rtol=1e-6)
    assert coll.stats.doc_count == 5


def test_query_by_id(coll, rng):
    docs, vecs = make_docs(rng, 20)
    coll.insert(docs)
    result = coll.query(VectorQuery("emb", id="doc5"), topk=3)
    assert result[0].id == "doc5"


def test_query_validation(coll, rng):
    docs, vecs = make_docs(rng, 5)
    coll.insert(docs)
    with pytest.raises(ValueError):
        coll.query(VectorQuery("emb", id="a", vector=vecs[0]), topk=3)
    with pytest.raises(ValueError):
        coll.query(VectorQuery("nope", vector=vecs[0]), topk=3)
    with pytest.raises(ValueError):
        coll.query(VectorQuery("emb", vector=vecs[0][:4]), topk=3)


def test_dimension_mismatch_insert(coll):
    st = coll.insert(Doc(id="bad", vectors={"emb": np.zeros(8, np.float32)}))
    assert st.code == StatusCode.INVALID_ARGUMENT


def test_flush_and_reopen(tmp_path, schema, rng):
    path = str(tmp_path / "col2")
    c = zvec_tpu.create_and_open(path, schema)
    docs, vecs = make_docs(rng, 50)
    c.insert(docs)
    c.delete("doc0")
    c.flush()
    c._impl.close()

    c2 = zvec_tpu.open(path)
    assert c2.stats.doc_count == 49
    result = c2.query(VectorQuery("emb", vector=vecs[1]), topk=2)
    assert result[0].id == "doc1"
    assert c2.fetch("doc3")["doc3"].field("title") == "t3"
    c2._impl.close()


def test_wal_recovery_without_flush(tmp_path, schema, rng):
    path = str(tmp_path / "col3")
    c = zvec_tpu.create_and_open(path, schema)
    docs, vecs = make_docs(rng, 30)
    c.insert(docs)
    c.update(Doc(id="doc4", fields={"price": 123.0}))
    c.delete("doc5")
    # simulate crash: no flush, just drop the handle
    c._impl.close()

    c2 = zvec_tpu.open(path)
    assert c2.stats.doc_count == 29
    assert c2.fetch("doc4")["doc4"].field("price") == 123.0
    assert c2.fetch("doc5") == {}
    result = c2.query(VectorQuery("emb", vector=vecs[2]), topk=1)
    assert result[0].id == "doc2"
    c2._impl.close()


def test_reopen_locked(tmp_path, schema, rng):
    path = str(tmp_path / "col4")
    c = zvec_tpu.create_and_open(path, schema)
    with pytest.raises(ZvecError):
        zvec_tpu.open(path)
    c._impl.close()


def test_create_on_nonempty_path(tmp_path, schema):
    path = tmp_path / "col5"
    path.mkdir()
    (path / "junk").write_text("x")
    with pytest.raises(ZvecError):
        zvec_tpu.create_and_open(str(path), schema)


def test_destroy(tmp_path, schema, rng):
    import os

    path = str(tmp_path / "col6")
    c = zvec_tpu.create_and_open(path, schema)
    docs, _ = make_docs(rng, 3)
    c.insert(docs)
    c.destroy()
    assert not os.path.exists(path)


def test_parquet_forward_format(tmp_path, schema, rng, monkeypatch):
    """Forward blocks can persist as Parquet (reference FileFormat duality)."""
    from zvec_tpu.utils.config import GlobalConfig

    monkeypatch.setattr(GlobalConfig.instance(), "forward_file_format", "parquet")
    path = str(tmp_path / "pq")
    c = zvec_tpu.create_and_open(path, schema)
    docs, vecs = make_docs(rng, 20)
    c.insert(docs)
    c.flush()
    c._impl.close()
    # sniff: the flush checkpoint really is parquet (flush writes ckpt_{gen})
    fwd = path + "/seg_0/ckpt_1.arrow"
    with open(fwd, "rb") as fh:
        assert fh.read(4) == b"PAR1"
    monkeypatch.setattr(GlobalConfig.instance(), "forward_file_format", "ipc")
    c2 = zvec_tpu.open(path)  # loads parquet transparently
    assert c2.query(VectorQuery("emb", vector=vecs[3]), topk=1)[0].id == "doc3"
    assert c2.fetch("doc5")["doc5"].field("title") == "t5"
    c2._impl.close()


def test_collection_pickle_roundtrip(tmp_path, rng):
    """Pickle = (path, option); unpickle re-opens (reference
    `python_collection.cc:56-70`). The source handle must be closed first
    (single-process file lock)."""
    import pickle

    schema = CollectionSchema("col_pk",
        vectors=[
            VectorSchema("v", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "pk"), schema)
    xs = rng.standard_normal((20, 8)).astype(np.float32)
    c.insert([Doc(id=str(i), vectors={"v": xs[i]}) for i in range(20)])
    c.flush()
    blob = pickle.dumps(c)
    c._impl.close()
    c2 = pickle.loads(blob)
    res = c2.query(VectorQuery("v", vector=xs[3]), topk=1)
    assert res[0].id == "3"


def test_query_output_fields_and_include_vector_combos(coll, rng):
    """DQL projection semantics (reference detail/test_collection_dql.py):
    output_fields=[] -> id+score only; default -> all fields, no vector;
    include_vector=True -> vector present alongside fields."""
    docs, vecs = make_docs(rng, 10)
    coll.insert(docs)
    q = VectorQuery("emb", vector=vecs[0])

    r = coll.query(q, topk=1, output_fields=[])[0]
    assert r.id == "doc0" and r.fields == {} and not r.vectors

    r = coll.query(q, topk=1)[0]
    assert r.field("title") == "t0" and r.field("price") == 0.0
    assert not r.vectors  # include_vector defaults False

    r = coll.query(q, topk=1, output_fields=["price"])[0]
    assert set(r.field_names()) == {"price"}

    r = coll.query(q, topk=1, include_vector=True)[0]
    np.testing.assert_allclose(np.asarray(r.vector("emb")), vecs[0], rtol=1e-6)

    with pytest.raises(ZvecError):
        coll.query(q, topk=1, output_fields=["nope"])


def test_query_null_fields_materialize_as_none(coll, rng):
    vecs = rng.standard_normal((3, 16)).astype(np.float32)
    coll.insert(
        [
            Doc(id="a", vectors={"emb": vecs[0]}, fields={"title": "x"}),
            Doc(id="b", vectors={"emb": vecs[1]}, fields={"price": 2.0}),
            Doc(id="c", vectors={"emb": vecs[2]}),
        ]
    )
    r = coll.query(VectorQuery("emb", vector=vecs[1]), topk=1)[0]
    assert r.id == "b" and r.field("title") is None and r.field("price") == 2.0
    # IS NULL / IS NOT NULL filters see the same nullness
    r = coll.query(
        VectorQuery("emb", vector=vecs[2]), topk=3, filter="title IS NULL"
    )
    assert {d.id for d in r} == {"b", "c"}


def test_fetch_missing_and_duplicate_pks(coll, rng):
    docs, _ = make_docs(rng, 5)
    coll.insert(docs)
    got = coll.fetch(["doc1", "missing", "doc1"])
    assert set(got) == {"doc1"}
    assert got["doc1"].field("count") == 1


def test_topk_zero_and_negative_rejected(coll, rng):
    docs, vecs = make_docs(rng, 5)
    coll.insert(docs)
    for bad in (0, -1):
        with pytest.raises((ZvecError, ValueError)):
            coll.query(VectorQuery("emb", vector=vecs[0]), topk=bad)


def test_batch_query_matches_single_queries(tmp_path, rng):
    """Differential parity: batch_query(Q) returns the same ids (exact) and
    scores (up to batch-shape float reassociation) as per-query query()."""
    from zvec_tpu import HnswIndexParam, HnswQueryParam, MetricType

    n, d = 2500, 16
    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema("col_bp",
        fields=[FieldSchema("g", DataType.INT32)],
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, d,
                              HnswIndexParam(MetricType.L2, m=12, ef_construction=60))],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "bp"), schema)
    for lo in range(0, n, 1000):
        col.insert([Doc(id=str(i), fields={"g": i % 5}, vectors={"v": X[i]})
                    for i in range(lo, min(lo + 1000, n))])
    col.flush()
    col.optimize()
    Q = rng.standard_normal((9, d)).astype(np.float32)
    p = HnswQueryParam(ef=100)
    for flt in (None, "g = 2", "g >= 3"):
        bres = col.batch_query("v", Q, topk=5, filter=flt, output_fields=["g"], param=p)
        for i in range(9):
            single = col.query(VectorQuery("v", vector=Q[i], param=p),
                               topk=5, filter=flt, output_fields=["g"])
            assert [h.id for h in bres[i]] == [h.id for h in single], (flt, i)
            assert np.allclose([h.score for h in bres[i]],
                               [h.score for h in single], rtol=1e-4)
            assert all(bh.fields == sh.fields for bh, sh in zip(bres[i], single))


def test_batch_query_many_matches_batch_query(tmp_path, rng):
    """Pipelined batch_query_many == [batch_query(b) for b in blocks], across
    filters and both doc-materialization paths (id+score-only and fields)."""
    n, d = 3000, 12
    X = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        "bqm",
        fields=[FieldSchema("g", DataType.INT32)],
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, d,
                              FlatIndexParam(MetricType.L2))],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "bqm"), schema)
    for lo in range(0, n, 1000):
        col.insert([Doc(id=str(i), fields={"g": i % 7}, vectors={"v": X[i]})
                    for i in range(lo, min(lo + 1000, n))])
    col.flush()
    col.optimize()
    blocks = [rng.standard_normal((6, d)).astype(np.float32) for _ in range(3)]
    for flt, fields in ((None, []), ("g != 4", ["g"])):
        many = col.batch_query_many("v", blocks, topk=5, filter=flt,
                                    output_fields=fields)
        assert len(many) == len(blocks)
        for bi, block in enumerate(blocks):
            solo = col.batch_query("v", block, topk=5, filter=flt,
                                   output_fields=fields)
            for qi in range(block.shape[0]):
                assert [h.id for h in many[bi][qi]] == [h.id for h in solo[qi]]
                assert np.allclose([h.score for h in many[bi][qi]],
                                   [h.score for h in solo[qi]], rtol=1e-5)


def test_insert_batch_statuses_order_and_intrabatch_dup(coll, rng):
    """The bulk-insert fast path must keep per-doc semantics: statuses in
    input order, duplicate pks INSIDE one batch rejected, invalid docs
    rejected without blocking the rest of the batch."""
    docs, vecs = make_docs(rng, 6)
    bad = Doc(id="badvec", vectors={"emb": vecs[0][:5]})  # wrong dimension
    dup = Doc(id="doc2", vectors={"emb": vecs[2]})  # duplicates docs[2]
    batch = docs[:3] + [bad, dup] + docs[3:]
    statuses = coll.insert(batch)
    assert [s.is_ok() for s in statuses] == [True, True, True, False, False, True, True, True]
    assert statuses[3].code == StatusCode.INVALID_ARGUMENT
    assert statuses[4].code == StatusCode.ALREADY_EXISTS
    assert coll.stats.doc_count == 6
    # accepted docs are all searchable with exact self-match
    for i in range(6):
        r = coll.query(VectorQuery("emb", vector=vecs[i]), topk=1)
        assert r[0].id == f"doc{i}"


def test_insert_batch_rotation_boundary_and_recovery(tmp_path, rng):
    """One insert batch larger than max_doc_count_per_segment must rotate
    mid-batch, keep consecutive doc ids, and recover losslessly from the WAL
    (no flush) across close/reopen."""
    schema = CollectionSchema(
        "rot",
        vectors=[VectorSchema("emb", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))],
        max_doc_count_per_segment=5,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "rot"), schema)
    vecs = rng.standard_normal((13, 8)).astype(np.float32)
    statuses = c.insert([Doc(id=f"r{i}", vectors={"emb": vecs[i]}) for i in range(13)])
    assert all(s.is_ok() for s in statuses)
    assert c.stats.doc_count == 13
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "rot"))
    assert c2.stats.doc_count == 13
    for i in (0, 4, 5, 9, 12):  # spans all three segments
        r = c2.query(VectorQuery("emb", vector=vecs[i]), topk=1)
        assert r[0].id == f"r{i}"
        assert r[0].score == pytest.approx(0.0, abs=1e-4)
    c2._impl.close()


def test_upsert_batch_mixed_new_existing_and_replay(tmp_path, rng):
    """Bulk upsert fast path: new-pk runs batch, existing pks (including pks
    earlier in the same batch) replace in order; state survives WAL replay."""
    schema = CollectionSchema(
        "ups",
        vectors=[VectorSchema("emb", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "ups"), schema)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    c.insert([Doc(id=f"u{i}", vectors={"emb": vecs[i]}) for i in range(5)])
    # batch: new u5..u9, replace u2, re-upsert u7 (pending in this batch),
    # then more new
    batch = (
        [Doc(id=f"u{i}", vectors={"emb": vecs[i]}) for i in range(5, 10)]
        + [Doc(id="u2", vectors={"emb": vecs[20]})]
        + [Doc(id="u7", vectors={"emb": vecs[21]})]
        + [Doc(id=f"u{i}", vectors={"emb": vecs[i]}) for i in range(10, 13)]
    )
    statuses = c.upsert(batch)
    assert all(s.is_ok() for s in statuses)
    assert c.stats.doc_count == 13
    assert c.query(VectorQuery("emb", vector=vecs[20]), topk=1)[0].id == "u2"
    assert c.query(VectorQuery("emb", vector=vecs[21]), topk=1)[0].id == "u7"
    # old u7 vector must no longer resolve to u7
    assert c.query(VectorQuery("emb", vector=vecs[7]), topk=1)[0].id != "u7"
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "ups"))  # pure WAL replay
    assert c2.stats.doc_count == 13
    assert c2.query(VectorQuery("emb", vector=vecs[20]), topk=1)[0].id == "u2"
    assert c2.query(VectorQuery("emb", vector=vecs[21]), topk=1)[0].id == "u7"
    np.testing.assert_allclose(
        np.asarray(c2.fetch("u12")["u12"].vector("emb")), vecs[12], rtol=1e-6
    )
    c2._impl.close()
