"""Sparse vector + multi-vector fusion tests (reference analogs:
`tests/core/` flat_sparse suites, `python/tests/test_reranker.py`,
dense+sparse fusion = BASELINE config #5)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    BM25EmbeddingFunction,
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    MetricType,
    RrfReRanker,
    VectorQuery,
    VectorSchema,
    WeightedReRanker,
)
from zvec_tpu.core.sparse_flat import SparseFlatEngine
from zvec_tpu.ops.sparse import pad_sparse_rows, prune_sparse_query


def sparse_dot(a, b):
    return sum(a[k] * b[k] for k in set(a) & set(b))


def random_sparse(rng, vocab=500, nnz=12):
    dims = rng.choice(vocab, nnz, replace=False)
    return {int(d): float(rng.random() + 0.1) for d in dims}


def test_pad_sparse_rows(rng):
    rows = [random_sparse(rng) for _ in range(5)] + [None, {}]
    idx, val, vocab = pad_sparse_rows(rows)
    assert idx.shape == val.shape and idx.shape[0] == 7
    assert (idx[5] == -1).all() and (idx[6] == -1).all()
    # entries preserved (float32 storage precision)
    r0 = {int(i): float(v) for i, v in zip(idx[0], val[0]) if i >= 0}
    assert set(r0) == set(rows[0])
    for k in r0:
        assert r0[k] == pytest.approx(rows[0][k], rel=1e-6)


def test_prune_sparse_query():
    q = {1: 1.0, 2: 0.5, 3: 0.05}
    assert prune_sparse_query(q, 0.1) == {1: 1.0, 2: 0.5}
    assert prune_sparse_query(q, 0.0) == q


def test_sparse_flat_engine_exact(rng):
    docs = [random_sparse(rng) for _ in range(300)]
    queries = [random_sparse(rng) for _ in range(4)]
    engine = SparseFlatEngine()
    engine.bind_data(lambda: docs, lambda: 1)
    sims, idx = engine.search(queries, 10)
    for qi, q in enumerate(queries):
        oracle = np.array([sparse_dot(q, d) for d in docs])
        expect = np.argsort(-oracle, kind="stable")[:10]
        got = idx[qi][idx[qi] >= 0]
        assert set(got) == set(expect)
        np.testing.assert_allclose(
            sims[qi][: len(got)], np.sort(oracle)[::-1][:10], rtol=1e-5, atol=1e-5
        )


def test_sparse_through_collection(tmp_path, rng):
    schema = CollectionSchema("col_sp",
        fields=[FieldSchema("tag", DataType.STRING)],
        vectors=[VectorSchema("sv", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "sp"), schema)
    docs_sparse = [random_sparse(rng) for _ in range(100)]
    c.insert(
        [
            Doc(id=f"s{i}", vectors={"sv": docs_sparse[i]}, fields={"tag": f"t{i%3}"})
            for i in range(100)
        ]
    )
    q = random_sparse(rng)
    res = c.query(VectorQuery("sv", vector=q), topk=5)
    oracle = np.array([sparse_dot(q, d) for d in docs_sparse])
    expect = [f"s{i}" for i in np.argsort(-oracle, kind="stable")[:5]]
    assert [r.id for r in res] == expect
    assert res[0].score == pytest.approx(oracle.max(), rel=1e-5)

    # filtered sparse search
    res = c.query(VectorQuery("sv", vector=q), topk=5, filter="tag = 't1'")
    allowed = [i for i in range(100) if i % 3 == 1]
    expect = [f"s{i}" for i in sorted(allowed, key=lambda i: -oracle[i])[:5]]
    assert [r.id for r in res] == expect

    # fetch returns the sparse vector as a dict
    d = c.fetch("s7")["s7"]
    assert d.vector("sv") == {int(k): pytest.approx(v) for k, v in docs_sparse[7].items()}
    c._impl.close()


def test_dense_sparse_fusion_rrf(tmp_path, rng):
    """BASELINE config #5: dense+sparse multi-vector single-call fusion."""
    dim = 16
    schema = CollectionSchema("col_fu",
        vectors=[
            VectorSchema("dense", DataType.VECTOR_FP32, dim, FlatIndexParam(MetricType.L2)),
            VectorSchema("sparse", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP)),
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "fu"), schema)
    dense = rng.standard_normal((80, dim)).astype(np.float32)
    sparse = [random_sparse(rng) for _ in range(80)]
    c.insert(
        [
            Doc(id=f"f{i}", vectors={"dense": dense[i], "sparse": sparse[i]})
            for i in range(80)
        ]
    )
    qd, qs = dense[5], sparse[5]

    # multi-vector without reranker must fail (`query_executor.py:283`)
    with pytest.raises(ValueError):
        c.query(
            [VectorQuery("dense", vector=qd), VectorQuery("sparse", vector=qs)],
            topk=5,
        )

    res = c.query(
        [VectorQuery("dense", vector=qd), VectorQuery("sparse", vector=qs)],
        topk=10,
        reranker=RrfReRanker(topn=5),
    )
    assert res[0].id == "f5"  # best in both modalities
    # oracle RRF (distance_helper.py:162-174)
    d2 = ((qd[None] - dense) ** 2).sum(1)
    dense_rank = np.argsort(d2, kind="stable")
    ip = np.array([sparse_dot(qs, s) for s in sparse])
    sparse_rank = np.argsort(-ip, kind="stable")
    scores = {}
    for rank, i in enumerate(dense_rank[:10]):
        scores[f"f{i}"] = scores.get(f"f{i}", 0) + 1 / (60 + rank + 1)
    for rank, i in enumerate(sparse_rank[:10]):
        scores[f"f{i}"] = scores.get(f"f{i}", 0) + 1 / (60 + rank + 1)
    expect = sorted(scores.items(), key=lambda kv: -kv[1])[:5]
    assert res[0].score == pytest.approx(expect[0][1], rel=1e-6)
    c._impl.close()


def test_weighted_reranker_normalization():
    docs_a = [Doc(id="a", score=0.5), Doc(id="b", score=1.5)]
    docs_b = [Doc(id="b", score=0.1), Doc(id="c", score=2.0)]
    rr = WeightedReRanker(topn=3, metric=MetricType.L2, weights={"x": 2.0, "y": 1.0})
    out = rr.rerank({"x": docs_a, "y": docs_b})
    import math

    norm = lambda s: 1.0 - 2 * math.atan(s) / math.pi
    expect_b = 2.0 * norm(1.5) + 1.0 * norm(0.1)
    got = {d.id: d.score for d in out}
    assert got["b"] == pytest.approx(expect_b, rel=1e-9)


def test_bm25(rng):
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaped over a sleepy canine",
        "completely unrelated text about databases and indexes",
        "vector databases index embeddings for similarity search",
    ]
    bm25 = BM25EmbeddingFunction().fit(corpus)
    doc_vecs = bm25.embed_documents(corpus)
    q = bm25.embed_query("fox dog")
    scores = [sparse_dot(q, d) for d in doc_vecs]
    assert np.argmax(scores) == 0  # doc 0 has both fox and dog
    assert scores[2] == 0.0  # no overlap


def test_bm25_formula_oracle():
    """query . doc must equal the textbook BM25 score (idf on the query
    side, saturated tf on the doc side) — hand-computed oracle, matching
    the reference test methodology (`test_embedding.py`)."""
    import math

    corpus = [
        "the quick brown fox",
        "the lazy dog",
        "quick quick fox jumps",
        "a dog and a fox",
    ]
    k1, b = 1.5, 0.75
    bm25 = BM25EmbeddingFunction(k1=k1, b=b).fit(corpus)
    docs = bm25.embed_documents(corpus)
    q = bm25.embed_query("quick fox")

    def tok(t):
        import re
        return [w.lower() for w in re.findall(r"[A-Za-z0-9_]+", t)]

    n = len(corpus)
    lens = [len(tok(t)) for t in corpus]
    avgdl = sum(lens) / n

    def idf(term):
        df = sum(term in set(tok(t)) for t in corpus)
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    for di, text in enumerate(corpus):
        toks = tok(text)
        expect = 0.0
        for term in ("quick", "fox"):
            tf = toks.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * len(toks) / avgdl)
            expect += idf(term) * tf * (k1 + 1) / denom
        got = sum(w * docs[di].get(i, 0.0) for i, w in q.items())
        assert abs(got - expect) < 1e-9, (di, got, expect)
    # ranking sanity: doc 2 (two 'quick' + 'fox') outscores doc 1 (neither)
    scores = [sum(w * d.get(i, 0.0) for i, w in q.items()) for d in docs]
    assert scores[2] == max(scores) and scores[1] == min(scores)


def test_bm25_query_indicator_and_doc_idf():
    """Queries carry weight 1.0 per distinct term (idf lives on the doc
    side); rarer terms get larger doc weights via idf."""
    import math

    corpus = ["alpha beta", "beta gamma", "gamma delta"]
    bm25 = BM25EmbeddingFunction().fit(corpus)
    q1 = bm25.embed_query("alpha gamma gamma")
    q2 = bm25.embed_query("alpha gamma")
    assert q1 == q2  # set semantics + deterministic hashing
    assert sorted(q1.values()) == [1.0, 1.0]
    # same tf/dl everywhere here, so doc weight ordering follows idf:
    # 'alpha' (df=1) outweighs 'beta' (df=2) inside doc 0
    d0 = bm25.embed_documents(["alpha beta"])[0]
    w = sorted(d0.values(), reverse=True)
    n, k1, b = 3, 1.5, 0.75
    tf_sat = (k1 + 1) / (1 + k1)  # tf=1, dl == avgdl
    idf_alpha = math.log(1 + (n - 1 + 0.5) / 1.5)
    idf_beta = math.log(1 + (n - 2 + 0.5) / 2.5)
    assert abs(w[0] - idf_alpha * tf_sat) < 1e-9
    assert abs(w[1] - idf_beta * tf_sat) < 1e-9


def test_bm25_term_dictionary_collision_free():
    """Round-2 regression: terms that FNV-hash to the same bucket used to
    alias into one dimension; the term dictionary must keep every distinct
    term on its own id (reference trains a real encoder vocabulary,
    `bm25_embedding_function.py:168-271`)."""
    from zvec_tpu import BM25EmbeddingFunction

    # 'costarring'/'liquid' and 'declinate'/'macallums' are classic FNV-1a
    # 32-bit full collisions; regardless, ANY large vocab must stay 1:1
    corpus = ["costarring liquid declinate macallums", "liquid macallums"]
    bm25 = BM25EmbeddingFunction(corpus=corpus)
    ids = {t: bm25._vocab[t] for t in ("costarring", "liquid", "declinate", "macallums")}
    assert len(set(ids.values())) == 4, ids
    # 50k synthetic terms: ids must be collision-free and dense
    big = BM25EmbeddingFunction().fit([" ".join(f"t{i}" for i in range(50_000))])
    assert big.vocab_size == 50_000
    assert sorted(big.dump_vocab().values()) == list(range(50_000))


def test_bm25_language_and_analyzer_hooks():
    from zvec_tpu import BM25EmbeddingFunction
    from zvec_tpu.extension.bm25_embedding_function import ENGLISH_STOPWORDS

    # stopwords drop function words from both docs and queries
    bm25 = BM25EmbeddingFunction(
        corpus=["the quick fox", "a lazy dog"], stopwords=ENGLISH_STOPWORDS
    )
    assert "the" not in bm25._vocab and "quick" in bm25._vocab
    assert bm25.embed_query("the the the") == {}

    # stemmer hook normalizes surface forms onto one id
    stem = lambda t: t[:-1] if t.endswith("s") else t  # noqa: E731
    bs = BM25EmbeddingFunction(corpus=["dogs dog"], stemmer=stem)
    assert bs.vocab_size == 1

    # zh analyzer: character bigrams, no external deps
    bz = BM25EmbeddingFunction(corpus=["今天天气很好", "天气不错"], language="zh")
    assert "天气" in bz._vocab
    q = bz.embed_query("天气")
    assert len(q) == 1

    # encoding_type call modes (reference __call__ semantics)
    bq = BM25EmbeddingFunction(corpus=["alpha beta"], encoding_type="query")
    assert set(bq("alpha alpha").values()) == {1.0}
    bd = BM25EmbeddingFunction(corpus=["alpha beta"], encoding_type="document")
    assert all(v != 1.0 for v in bd("alpha alpha").values())

    # unknown query terms match nothing -> dropped
    assert bq("zulu") == {}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        BM25EmbeddingFunction(encoding_type="nope")
    with _pytest.raises(ValueError):
        BM25EmbeddingFunction(language="fr")
    with _pytest.raises(ValueError):
        BM25EmbeddingFunction(corpus=[])
