"""Dense + sparse multi-vector fusion with BM25 (reference examples analog).

Run: python examples/hybrid_multivector.py
"""

import os

if os.environ.get("ZVEC_EXAMPLE_CPU") == "1":  # run off-TPU: CPU backend
    import jax

    jax.config.update("jax_platforms", "cpu")

import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

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
)

PATH = "/tmp/zvec_tpu_hybrid"

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "vector databases index embeddings for similarity search",
    "TPUs accelerate dense matrix multiplication",
    "a fast auburn fox leaped over a sleepy canine",
    "sparse retrieval scores lexical overlap with BM25",
    "approximate nearest neighbor graphs trade recall for speed",
]


def main():
    shutil.rmtree(PATH, ignore_errors=True)
    rng = np.random.default_rng(0)

    bm25 = BM25EmbeddingFunction().fit(CORPUS)
    sparse_vecs = bm25.embed_documents(CORPUS)
    dense_vecs = rng.standard_normal((len(CORPUS), 32)).astype(np.float32)

    schema = CollectionSchema(
        "docs",
        fields=[FieldSchema("text", DataType.STRING)],
        vectors=[
            VectorSchema("dense", DataType.VECTOR_FP32, 32, FlatIndexParam(MetricType.COSINE)),
            VectorSchema("lexical", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP)),
        ],
    )
    coll = zvec_tpu.create_and_open(PATH, schema)
    coll.insert(
        [
            Doc(
                id=str(i),
                vectors={"dense": dense_vecs[i], "lexical": sparse_vecs[i]},
                fields={"text": CORPUS[i]},
            )
            for i in range(len(CORPUS))
        ]
    )

    query_text = "fox jumping over dogs"
    hits = coll.query(
        [
            VectorQuery("dense", vector=dense_vecs[0]),  # e.g. an embedding of the query
            VectorQuery("lexical", vector=bm25.embed_query(query_text)),
        ],
        topk=6,
        reranker=RrfReRanker(topn=3),
    )
    print(f"query: {query_text!r}")
    for h in hits:
        print(f"  rrf={h.score:.4f}  {h.field('text')}")
    coll.destroy()


if __name__ == "__main__":
    main()
