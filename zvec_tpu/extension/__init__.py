from .bm25_embedding_function import BM25EmbeddingFunction
from .embedding_function import (
    DenseEmbeddingFunction,
    SparseEmbeddingFunction,
)
from .rerank_function import ReRanker, RerankFunction
from .multi_vector_reranker import RrfReRanker, WeightedReRanker

__all__ = [
    "BM25EmbeddingFunction",
    "DenseEmbeddingFunction",
    "SparseEmbeddingFunction",
    "ReRanker",
    "RerankFunction",
    "RrfReRanker",
    "WeightedReRanker",
]
