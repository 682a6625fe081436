"""zvec_tpu — TPU-native in-process vector database.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of zvec (the reference
at sudo-flow/zvec): schema'd collections with dense + sparse vectors and scalar
columns, FLAT/HNSW/IVF indexes with quantization, hybrid search with SQL-like
filters, multi-vector queries with reranking, WAL + versioned manifests +
crash recovery, and segment-based storage with compaction — with every
distance computation running as batched MXU programs and filters fused as
dense masks inside the kernels.

Public surface mirrors `python/zvec/__init__.py` so reference users can switch
imports.
"""

from . import model as model
from .extension import (
    BM25EmbeddingFunction,
    DefaultLocalDenseEmbedding,
    DefaultLocalReRanker,
    DefaultLocalSparseEmbedding,
    DenseEmbeddingFunction,
    OpenAIDenseEmbedding,
    OpenAIFunctionBase,
    QwenDenseEmbedding,
    QwenFunctionBase,
    QwenReRanker,
    QwenSparseEmbedding,
    ReRanker,
    RrfReRanker,
    SentenceTransformerFunctionBase,
    SparseEmbeddingFunction,
    WeightedReRanker,
)
from .tool import require_module
from .model import param as param
from .model.collection import Collection
from .model.doc import Doc
from .model.param import (
    AddColumnOption,
    AlterColumnOption,
    CollectionOption,
    FlatIndexParam,
    HnswIndexParam,
    HnswQueryParam,
    IndexOption,
    InvertIndexParam,
    IVFIndexParam,
    IVFQueryParam,
    OptimizeOption,
)
from .model.param.vector_query import GroupByVectorQuery, VectorQuery
from .model.schema import CollectionSchema, CollectionStats, FieldSchema, VectorSchema
from .typing import (
    DataType,
    IndexType,
    MetricType,
    QuantizeType,
    Status,
    StatusCode,
    ZvecError,
)
from .typing.enum import LogLevel, LogType
from .zvec import create_and_open, init, open

# submodule alias matching the reference's `zvec.schema`
from .model import schema as schema  # noqa: E402  (import order is deliberate)

__version__ = "0.1.0"

__all__ = [
    # lifecycle
    "create_and_open",
    "init",
    "open",
    # core classes
    "Collection",
    "Doc",
    # schema
    "CollectionSchema",
    "FieldSchema",
    "VectorSchema",
    "CollectionStats",
    # parameters
    "VectorQuery",
    "GroupByVectorQuery",
    "InvertIndexParam",
    "HnswIndexParam",
    "FlatIndexParam",
    "IVFIndexParam",
    "CollectionOption",
    "IndexOption",
    "OptimizeOption",
    "AddColumnOption",
    "AlterColumnOption",
    "HnswQueryParam",
    "IVFQueryParam",
    # typing
    "DataType",
    "IndexType",
    "MetricType",
    "QuantizeType",
    "Status",
    "StatusCode",
    "ZvecError",
    "LogLevel",
    "LogType",
    # extensions
    "BM25EmbeddingFunction",
    "DenseEmbeddingFunction",
    "SparseEmbeddingFunction",
    "ReRanker",
    "RrfReRanker",
    "WeightedReRanker",
    "OpenAIFunctionBase",
    "OpenAIDenseEmbedding",
    "QwenFunctionBase",
    "QwenDenseEmbedding",
    "QwenSparseEmbedding",
    "QwenReRanker",
    "SentenceTransformerFunctionBase",
    "DefaultLocalDenseEmbedding",
    "DefaultLocalSparseEmbedding",
    "DefaultLocalReRanker",
    "require_module",
    # submodules
    "model",
    "param",
    "schema",
]
