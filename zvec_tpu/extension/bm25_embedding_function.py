"""BM25 sparse embedding.

Reference equivalent: `python/zvec/extension/bm25_embedding_function.py` —
local BM25 term weighting producing {term_hash: weight} sparse vectors.
Documents get full BM25 term weights (idf x saturated tf); queries get
weight 1.0 per distinct term, so query . doc = the textbook BM25 score.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Dict, List

from .embedding_function import SparseEmbeddingFunction

__all__ = ["BM25EmbeddingFunction"]

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def _default_tokenize(text: str) -> List[str]:
    return [t.lower() for t in _TOKEN_RE.findall(text)]


def _term_id(term: str, dim: int) -> int:
    # stable hash (FNV-1a) onto the vector space
    h = 0x811C9DC5
    for b in term.encode("utf-8"):
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h % dim


class BM25EmbeddingFunction(SparseEmbeddingFunction):
    def __init__(
        self,
        k1: float = 1.5,
        b: float = 0.75,
        dim: int = 1 << 20,
        tokenizer=None,
    ):
        self.k1 = k1
        self.b = b
        self.dim = dim
        self._tokenize = tokenizer or _default_tokenize
        self._df: Counter = Counter()
        self._n_docs = 0
        self._avgdl = 0.0

    # ---- corpus statistics ----
    def fit(self, corpus: List[str]) -> "BM25EmbeddingFunction":
        total_len = 0
        for text in corpus:
            tokens = self._tokenize(text)
            total_len += len(tokens)
            self._df.update(set(tokens))
            self._n_docs += 1
        self._avgdl = total_len / max(self._n_docs, 1)
        return self

    def _idf(self, term: str) -> float:
        df = self._df.get(term, 0)
        return math.log(1.0 + (self._n_docs - df + 0.5) / (df + 0.5))

    # ---- embedding ----
    def embed_documents(self, texts: List[str]) -> List[Dict[int, float]]:
        return [self._embed_doc(t) for t in texts]

    def _embed_doc(self, text: str) -> Dict[int, float]:
        tokens = self._tokenize(text)
        dl = len(tokens)
        counts = Counter(tokens)
        out: Dict[int, float] = {}
        denom_norm = self.k1 * (1 - self.b + self.b * dl / max(self._avgdl, 1e-9))
        for term, tf in counts.items():
            weight = self._idf(term) * tf * (self.k1 + 1) / (tf + denom_norm)
            out[_term_id(term, self.dim)] = out.get(_term_id(term, self.dim), 0.0) + weight
        return out

    def embed_query(self, text: str) -> Dict[int, float]:
        tokens = set(self._tokenize(text))
        out: Dict[int, float] = {}
        for term in tokens:
            tid = _term_id(term, self.dim)
            out[tid] = out.get(tid, 0.0) + 1.0
        return out
