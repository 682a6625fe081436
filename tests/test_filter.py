"""Filter expression + hybrid search tests (reference analog:
`python/tests/detail/test_collection_dql.py` filter cases and
`tests/db/sqlengine/` planner tests)."""

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
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.db.filter import FilterError, compile_filter


@pytest.fixture
def schema():
    return CollectionSchema("col_ft",
        fields=[
            FieldSchema("category", DataType.STRING, nullable=True),
            FieldSchema("price", DataType.DOUBLE, nullable=True),
            FieldSchema("stock", DataType.INT64, nullable=True),
            FieldSchema("active", DataType.BOOL, nullable=True),
            FieldSchema("tags", DataType.ARRAY_STRING, nullable=True),
        ],
        vectors=[
            VectorSchema("emb", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.IP))
        ],
    )


@pytest.fixture
def coll(tmp_path, schema, rng):
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    docs = []
    for i in range(20):
        docs.append(
            Doc(
                id=f"d{i}",
                vectors={"emb": vecs[i]},
                fields={
                    "category": ["tech", "news", "sports"][i % 3],
                    "price": float(i),
                    "stock": i * 10,
                    "active": i % 2 == 0,
                    "tags": [f"tag{i}", f"tag{i % 5}"] if i % 4 != 0 else None,
                },
            )
        )
    c.insert(docs)
    c._vecs = vecs
    yield c
    c._impl.close()


def q(coll, filter_str, topk=20):
    res = coll.query(
        VectorQuery("emb", vector=coll._vecs[0]), topk=topk, filter=filter_str
    )
    return sorted(int(d.id[1:]) for d in res)


def test_eq_string(coll):
    assert q(coll, "category = 'tech'") == [0, 3, 6, 9, 12, 15, 18]


def test_double_eq(coll):
    assert q(coll, "category == 'news'") == [1, 4, 7, 10, 13, 16, 19]


def test_numeric_comparisons(coll):
    assert q(coll, "price < 3") == [0, 1, 2]
    assert q(coll, "price <= 3") == [0, 1, 2, 3]
    assert q(coll, "stock > 170") == [18, 19]
    assert q(coll, "stock >= 170") == [17, 18, 19]
    assert q(coll, "price != 0") == list(range(1, 20))


def test_and_or_parens(coll):
    assert q(coll, "category = 'tech' AND price < 7") == [0, 3, 6]
    assert q(coll, "price < 2 OR price > 17") == [0, 1, 18, 19]
    assert q(coll, "(price < 5 OR price > 15) AND category = 'tech'") == [0, 3, 18]


def test_not(coll):
    assert q(coll, "NOT category = 'tech'") == sorted(
        set(range(20)) - {0, 3, 6, 9, 12, 15, 18}
    )


def test_in_not_in(coll):
    assert q(coll, "stock IN (0, 10, 50)") == [0, 1, 5]
    assert q(coll, "category NOT IN ('tech', 'news')") == [2, 5, 8, 11, 14, 17]


def test_bool_eq(coll):
    assert q(coll, "active = TRUE") == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]
    assert q(coll, "active = FALSE") == [1, 3, 5, 7, 9, 11, 13, 15, 17, 19]


def test_like(coll):
    assert q(coll, "category LIKE 'te%'") == [0, 3, 6, 9, 12, 15, 18]
    assert q(coll, "category LIKE '%ws'") == [1, 4, 7, 10, 13, 16, 19]
    assert q(coll, "category LIKE '%or%'") == [2, 5, 8, 11, 14, 17]
    assert q(coll, "category NOT LIKE 'te%'") == sorted(
        set(range(20)) - {0, 3, 6, 9, 12, 15, 18}
    )


def test_is_null(coll):
    assert q(coll, "tags IS NULL") == [0, 4, 8, 12, 16]
    assert q(coll, "tags IS NOT NULL") == sorted(set(range(20)) - {0, 4, 8, 12, 16})


def test_contain(coll):
    # tag1 appears where i%5==1 (and tags non-null, i.e. i%4!=0): {1, 6, 11}
    assert q(coll, "tags CONTAIN_ANY ('tag1')") == [1, 6, 11]
    assert q(coll, "tags CONTAIN_ALL ('tag6', 'tag1')") == [6]
    assert q(coll, "tags NOT CONTAIN_ANY ('tag1')") == sorted(
        set(range(20)) - {0, 4, 8, 12, 16} - {1, 6, 11}
    )


def test_array_length(coll):
    assert q(coll, "array_length(tags) = 2") == sorted(set(range(20)) - {0, 4, 8, 12, 16})


def test_filter_ranking_interaction(coll):
    # filtered search must return the best *among the filtered*, ranked by IP desc
    res = coll.query(
        VectorQuery("emb", vector=coll._vecs[0]), topk=3, filter="category = 'news'"
    )
    sims = coll._vecs[0] @ coll._vecs.T
    allowed = [1, 4, 7, 10, 13, 16, 19]
    expect = sorted(allowed, key=lambda i: -sims[i])[:3]
    assert [d.id for d in res] == [f"d{i}" for i in expect]
    np.testing.assert_allclose(
        [d.score for d in res], sorted(sims[allowed], reverse=True)[:3], rtol=1e-4
    )


def test_delete_by_filter(coll):
    coll.delete_by_filter("price >= 10")
    assert coll.stats.doc_count == 10
    assert q(coll, None) == list(range(10))


def test_filter_errors(coll):
    with pytest.raises(FilterError):
        compile_filter("nonexistent = 1", coll.schema)
    with pytest.raises(FilterError):
        compile_filter("price >", coll.schema)
    with pytest.raises(FilterError):
        compile_filter("price = 1 AND", coll.schema)
    with pytest.raises(FilterError):
        compile_filter("array_length(price) = 1", coll.schema)


def test_unsatisfiable_filter(coll):
    assert q(coll, "price < 0") == []


def test_has_prefix_suffix(coll):
    # categories cycle tech/news/sports over ids 0..19
    tech = [i for i in range(20) if i % 3 == 0]
    news = [i for i in range(20) if i % 3 == 1]
    sports = [i for i in range(20) if i % 3 == 2]
    assert q(coll, "category HAS_PREFIX 'te'") == tech
    assert q(coll, "category HAS_PREFIX 'n'") == news
    assert q(coll, "category HAS_SUFFIX 'ports'") == sports
    assert q(coll, "category HAS_SUFFIX 's'") == sorted(news + sports)
    assert q(coll, "category NOT HAS_PREFIX 'te'") == sorted(news + sports)
    assert q(coll, "category NOT HAS_SUFFIX 's'") == tech
    assert q(coll, "category HAS_PREFIX 'zzz'") == []
    with pytest.raises(FilterError):
        compile_filter("category HAS_PREFIX 5")


def test_sealed_arrow_parity(tmp_path, schema, rng):
    """Every predicate type must produce identical masks on a SEALED segment
    (pyarrow.compute fast paths) and a WRITING segment (numpy paths)."""
    from zvec_tpu.db.filter.expression import compile_filter as cf

    a = zvec_tpu.create_and_open(str(tmp_path / "w"), schema)
    b = zvec_tpu.create_and_open(str(tmp_path / "s"), schema)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    docs = []
    for i in range(40):
        docs.append(
            Doc(
                id=f"d{i}",
                vectors={"emb": vecs[i]},
                fields={
                    "category": ["tech", "news", "sports", None][i % 4],
                    "price": float(i) if i % 5 else None,
                    "stock": i * 10,
                    "active": i % 2 == 0,
                    "tags": [f"tag{i % 7}", f"tag{i % 3}"] if i % 4 != 0 else None,
                },
            )
        )
    a.insert(docs)
    b.insert(docs)
    b.flush()
    b._impl.optimize()  # seal -> arrow-backed store
    seg_w = a._impl.writing
    seg_s = b._impl.segments[0]
    assert seg_s.store._table is not None  # really sealed

    exprs = [
        "category = 'tech'",
        "category != 'news'",
        "category LIKE 't%h'",
        "category LIKE '%or_s'",
        "category HAS_PREFIX 'sp'",
        "category HAS_SUFFIX 's'",
        "category NOT HAS_PREFIX 'te'",
        "category IN ('tech', 'sports')",
        "category NOT IN ('tech')",
        "price > 10",
        "price <= 30 AND stock >= 100",
        "active = true",
        "tags CONTAIN_ANY ('tag1', 'tag2')",
        "tags CONTAIN_ALL ('tag1')",
        "tags NOT CONTAIN_ANY ('tag1')",
        "array_length(tags) = 2",
        "category IS NULL",
        "category IS NOT NULL AND price IS NOT NULL",
    ]
    for e in exprs:
        f = cf(e, schema)
        mw = f.evaluate(seg_w)
        ms = f.evaluate(seg_s)
        assert (mw == ms).all(), (e, np.nonzero(mw != ms)[0])
    a._impl.close()
    b._impl.close()


def test_bf_by_keys_device_demotion(tmp_path, rng, monkeypatch):
    """Selective filters demote to an EXACT scan. Above the host-BLAS cap the
    demotion must run as a masked device linear scan (never the per-row host
    gather), and results must match the filtered oracle exactly."""
    from zvec_tpu import HnswIndexParam
    import zvec_tpu.db.collection_impl as ci

    n, d, nq = 20000, 32, 512
    X = rng.standard_normal((n, d)).astype(np.float32)
    tags = rng.integers(0, 13, n)  # 'tag = 3' selects ~7.7% < ratio 0.1
    schema = CollectionSchema(
        "bfk",
        fields=[FieldSchema("tag", DataType.INT64)],
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, d,
                HnswIndexParam(MetricType.L2, m=8, ef_construction=50),
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "bfk"), schema)
    for lo in range(0, n, 1000):
        col.insert(
            [
                Doc(id=str(i), fields={"tag": int(tags[i])}, vectors={"emb": X[i]})
                for i in range(lo, min(lo + 1000, n))
            ]
        )
    col.flush()
    col.optimize()

    def _boom(*a, **k):  # host gather must not run at this size
        raise AssertionError("expected the device linear-scan demotion")

    monkeypatch.setattr(ci, "_exact_over_rows", _boom)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    docs = col.batch_query("emb", Q, topk=5, filter="tag = 3", output_fields=[])
    sel = np.flatnonzero(tags == 3)
    d2 = (
        (Q[:8] ** 2).sum(1)[:, None]
        + (X[sel] ** 2).sum(1)[None, :]
        - 2.0 * (Q[:8] @ X[sel].T)
    )
    for i in range(8):
        expect = [str(int(j)) for j in sel[np.argsort(d2[i])[:5]]]
        got = [h.id for h in docs[i]]
        assert got == expect, (i, got, expect)
    col._impl.close()
