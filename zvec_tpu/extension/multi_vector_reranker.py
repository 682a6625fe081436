"""RRF and weighted multi-vector rerankers.

Score formulas are contract-level parity with the reference
(`python/zvec/extension/multi_vector_reranker.py:26-174` and the test oracle
`python/tests/detail/distance_helper.py:158-203`):
  RRF: score(doc) = sum over fields of 1 / (k + rank + 1), k default 60.
  Weighted: sum of weight_f * normalize(score_f) with
    L2 -> 1 - 2*atan(s)/pi; IP -> 0.5 + atan(s)/pi; COSINE -> 1 - s/2.
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict
from typing import Dict, List, Optional

from ..model.doc import Doc
from ..typing.enum import MetricType
from .rerank_function import RerankFunction

__all__ = ["RrfReRanker", "WeightedReRanker"]


class RrfReRanker(RerankFunction):
    def __init__(
        self,
        topn: int = 10,
        rerank_field: Optional[str] = None,
        rank_constant: int = 60,
    ):
        super().__init__(topn=topn, rerank_field=rerank_field)
        self._rank_constant = rank_constant

    @property
    def rank_constant(self) -> int:
        return self._rank_constant

    def _rrf_score(self, rank: int) -> float:
        return 1.0 / (self._rank_constant + rank + 1)

    def rerank(self, query_results: Dict[str, List[Doc]]) -> List[Doc]:
        rrf_scores: Dict[str, float] = defaultdict(float)
        id_to_doc: Dict[str, Doc] = {}
        for _, docs in query_results.items():
            for rank, doc in enumerate(docs):
                rrf_scores[doc.id] += self._rrf_score(rank)
                id_to_doc.setdefault(doc.id, doc)
        top = heapq.nlargest(self.topn, rrf_scores.items(), key=lambda kv: kv[1])
        return [id_to_doc[doc_id]._replace(score=score) for doc_id, score in top]


class WeightedReRanker(RerankFunction):
    def __init__(
        self,
        topn: int = 10,
        rerank_field: Optional[str] = None,
        metric: MetricType = MetricType.L2,
        weights: Optional[Dict[str, float]] = None,
    ):
        super().__init__(topn=topn, rerank_field=rerank_field)
        self._weights = weights or {}
        self._metric = MetricType(metric)

    @property
    def weights(self) -> Dict[str, float]:
        return self._weights

    @property
    def metric(self) -> MetricType:
        return self._metric

    def rerank(self, query_results: Dict[str, List[Doc]]) -> List[Doc]:
        weighted: Dict[str, float] = defaultdict(float)
        id_to_doc: Dict[str, Doc] = {}
        for field, docs in query_results.items():
            weight = self._weights.get(field, 1.0)
            for doc in docs:
                weighted[doc.id] += self._normalize_score(doc.score, self._metric) * weight
                id_to_doc.setdefault(doc.id, doc)
        top = heapq.nlargest(self.topn, weighted.items(), key=lambda kv: kv[1])
        return [id_to_doc[doc_id]._replace(score=score) for doc_id, score in top]

    @staticmethod
    def _normalize_score(score: float, metric: MetricType) -> float:
        if metric == MetricType.L2:
            return 1.0 - 2 * math.atan(score) / math.pi
        if metric == MetricType.IP:
            return 0.5 + math.atan(score) / math.pi
        if metric == MetricType.COSINE:
            return 1.0 - score / 2.0
        raise ValueError("Unsupported metric type")
