"""Device compute layer: JAX/XLA + Pallas kernels.

This is the TPU-native replacement for the reference's SIMD math library
(`src/ailego/math/*`) and per-algorithm scan loops: distance scoring runs as
MXU matmul tiles, top-k selection as `lax.top_k` block merges, filters as dense
masks fused into the scan.
"""

from .distance import (
    cosine_distance_matrix,
    hamming_distance_matrix,
    ip_matrix,
    l2_norms,
    similarity_matrix,
    similarity_to_score,
    score_to_similarity,
    squared_l2_matrix,
)
from .topk import blockwise_topk_search, merge_topk

__all__ = [
    "ip_matrix",
    "squared_l2_matrix",
    "cosine_distance_matrix",
    "hamming_distance_matrix",
    "l2_norms",
    "similarity_matrix",
    "similarity_to_score",
    "score_to_similarity",
    "blockwise_topk_search",
    "merge_topk",
]
