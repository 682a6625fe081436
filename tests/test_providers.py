"""Provider extension shims exercised against faked SDK modules.

Reference analog: `python/tests/test_embedding.py` / `test_reranker.py` mock
the provider SDK responses and assert the adapter logic (batching, dtype,
response unpacking, rerank ordering). No network: `openai`, `dashscope` and
`sentence_transformers` are injected into sys.modules as fakes.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from zvec_tpu.model.doc import Doc


@pytest.fixture()
def fake_openai(monkeypatch):
    mod = types.ModuleType("openai")

    class _Client:
        def __init__(self, api_key=None, base_url=None):
            self.api_key = api_key
            self.base_url = base_url
            emb = types.SimpleNamespace(create=self._create)
            self.embeddings = emb
            self.calls = []
            _Client.last = self

        def _create(self, model, input, dimensions):
            self.calls.append({"model": model, "input": list(input), "dim": dimensions})
            data = [
                types.SimpleNamespace(
                    embedding=[float(len(t)) / dimensions] * dimensions
                )
                for t in input
            ]
            return types.SimpleNamespace(data=data)

    mod.OpenAI = _Client
    monkeypatch.setitem(sys.modules, "openai", mod)
    return mod


@pytest.fixture()
def fake_dashscope(monkeypatch):
    mod = types.ModuleType("dashscope")
    mod.api_key = None

    def _embed_call(model, input, dimension=None, output_type=None):
        if output_type == "sparse":
            embs = [
                {"sparse_embedding": {str(3 * i + 1): 0.5, "7": float(len(t))}}
                for i, t in enumerate(input)
            ]
        else:
            embs = [{"embedding": [float(len(t))] * dimension} for t in input]
        return types.SimpleNamespace(output={"embeddings": embs})

    def _rerank_call(model, query, documents, top_n):
        # score = doc length; return indices sorted by it, truncated to top_n
        order = sorted(
            range(len(documents)), key=lambda i: -len(documents[i])
        )[:top_n]
        return types.SimpleNamespace(
            output={
                "results": [
                    {"index": i, "relevance_score": float(len(documents[i]))}
                    for i in order
                ]
            }
        )

    mod.TextEmbedding = types.SimpleNamespace(call=_embed_call)
    mod.TextReRank = types.SimpleNamespace(call=_rerank_call)
    monkeypatch.setitem(sys.modules, "dashscope", mod)
    return mod


@pytest.fixture()
def fake_sentence_transformers(monkeypatch):
    mod = types.ModuleType("sentence_transformers")

    class _ST:
        def __init__(self, model, device="cpu"):
            self.model = model

        def get_sentence_embedding_dimension(self):
            return 4

        def encode(self, texts, convert_to_numpy=True):
            return np.stack([np.full(4, float(len(t))) for t in texts])

    class _CE:
        def __init__(self, model, device="cpu"):
            self.model = model

        def predict(self, pairs):
            return np.asarray([float(len(d)) for _, d in pairs])

    mod.SentenceTransformer = _ST
    mod.CrossEncoder = _CE
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    return mod


def test_openai_dense_embedding(fake_openai):
    from zvec_tpu.extension.providers import OpenAIDenseEmbedding

    fn = OpenAIDenseEmbedding(dimension=8, api_key="k")
    vecs = fn.embed_documents(["ab", "cdef"])
    assert fn.dimension == 8
    assert len(vecs) == 2 and vecs[0].shape == (8,)
    assert vecs[0].dtype == np.float32
    q = fn.embed_query("xyz")
    assert q.shape == (8,)
    assert fake_openai.OpenAI.last.calls[0]["model"] == "text-embedding-3-small"


def test_qwen_dense_and_sparse_embedding(fake_dashscope):
    from zvec_tpu.extension.providers import QwenDenseEmbedding, QwenSparseEmbedding

    dense = QwenDenseEmbedding(dimension=16, api_key="secret")
    assert fake_dashscope.api_key == "secret"
    vecs = dense.embed_documents(["hi", "there"])
    assert vecs[0].shape == (16,) and vecs[0].dtype == np.float32
    assert float(vecs[1][0]) == 5.0  # len("there")

    sparse = QwenSparseEmbedding()
    rows = sparse.embed_documents(["hi", "there"])
    assert rows[0] == {1: 0.5, 7: 2.0}
    assert all(isinstance(k, int) for k in rows[1])
    q = sparse.embed_query("abc")
    assert q[7] == 3.0


def test_qwen_reranker_orders_by_relevance(fake_dashscope):
    from zvec_tpu.extension.providers import QwenReRanker

    rr = QwenReRanker(topn=2, rerank_field="txt", query="q")
    results = {
        "f1": [
            Doc(id="a", score=0.1, fields={"txt": "sh"}),
            Doc(id="b", score=0.2, fields={"txt": "medium"}),
        ],
        "f2": [
            Doc(id="c", score=0.3, fields={"txt": "the longest text"}),
            Doc(id="b", score=0.2, fields={"txt": "medium"}),  # dedup by id
        ],
    }
    out = rr.rerank(results)
    assert [d.id for d in out] == ["c", "b"]
    assert out[0].score == float(len("the longest text"))


def test_local_dense_embedding_and_reranker(fake_sentence_transformers):
    from zvec_tpu.extension.providers import (
        DefaultLocalDenseEmbedding,
        DefaultLocalReRanker,
    )

    fn = DefaultLocalDenseEmbedding()
    assert fn.dimension == 4
    vecs = fn.embed_documents(["ab", "c"])
    assert np.allclose(vecs[0], 2.0) and vecs[0].dtype == np.float32
    assert fn.embed_query("abc").shape == (4,)

    rr = DefaultLocalReRanker(topn=1, rerank_field="t", query="q")
    docs = {
        "f": [
            Doc(id="x", score=0.0, fields={"t": "tiny"}),
            Doc(id="y", score=0.0, fields={"t": "substantially longer"}),
        ]
    }
    out = rr.rerank(docs)
    assert [d.id for d in out] == ["y"]
    assert out[0].score == float(len("substantially longer"))


def test_local_sparse_embedding_no_network():
    from zvec_tpu.extension.providers import DefaultLocalSparseEmbedding

    corpus = ["the quick brown fox", "jumped over the lazy dog", "the fox"]
    fn = DefaultLocalSparseEmbedding(corpus=corpus)
    rows = fn.embed_documents(corpus)
    assert len(rows) == 3 and all(rows)
    q = fn.embed_query("fox")
    assert isinstance(q, dict) and len(q) >= 1


def test_missing_provider_raises_friendly_importerror(monkeypatch):
    monkeypatch.setitem(sys.modules, "openai", None)
    from zvec_tpu.extension.providers import OpenAIDenseEmbedding

    with pytest.raises(ImportError, match="openai"):
        OpenAIDenseEmbedding()
