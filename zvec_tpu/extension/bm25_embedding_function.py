"""BM25 sparse embedding with a real term dictionary.

Reference equivalent: `python/zvec/extension/bm25_embedding_function.py:168-271`
— wraps a DashText SparseVectorEncoder: a trainable encoder with a term
dictionary, `language` ("en"/"zh") built-in analyzers, and
`encoding_type` ("query"/"document") call modes. This rebuild keeps those
surfaces without the external dependency:

- **Term dictionary**: `fit()`/`train()` assign every corpus term a
  COLLISION-FREE sequential id (round-2 hashed-bucket aliasing removed;
  two distinct terms can never share a dimension). Documents embedded
  after fit extend the dictionary; query terms outside it are dropped
  (they can match no document).
- **Analyzers**: "en" = lowercase word tokens, optional stopword set and
  a stemmer hook; "zh" = character bigrams (dependency-free CJK analog).
- **Scoring**: documents carry full BM25 weights (idf x saturated tf),
  queries carry 1.0 per distinct term, so query . doc = the textbook
  BM25 score (Robertson & Zaragoza 2009), matching the round-2 oracle
  tests.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Callable, Dict, List, Optional, Set

from .embedding_function import SparseEmbeddingFunction

__all__ = ["BM25EmbeddingFunction", "ENGLISH_STOPWORDS"]

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")

# Compact English stopword list (analyzer option; the reference's dashtext
# encoder ships language-specific analyzers).
ENGLISH_STOPWORDS: Set[str] = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
}


def _en_tokenize(text: str) -> List[str]:
    return [t.lower() for t in _TOKEN_RE.findall(text)]


def _zh_tokenize(text: str) -> List[str]:
    """Character bigrams over CJK runs + word tokens over latin runs."""
    out: List[str] = []
    run: List[str] = []
    for ch in text:
        if "一" <= ch <= "鿿":
            run.append(ch)
        else:
            if run:
                out.extend(
                    [run[0]] if len(run) == 1
                    else ["".join(run[i : i + 2]) for i in range(len(run) - 1)]
                )
                run = []
    if run:
        out.extend(
            [run[0]] if len(run) == 1
            else ["".join(run[i : i + 2]) for i in range(len(run) - 1)]
        )
    out.extend(_en_tokenize(text))
    return out


class BM25EmbeddingFunction(SparseEmbeddingFunction):
    """Corpus-trained BM25 encoder with a collision-free term dictionary.

    Args mirror the reference wrapper (`bm25_embedding_function.py:168-199`):
    `corpus` trains the dictionary immediately; `encoding_type` selects what
    bare ``__call__`` does; `language` picks the built-in analyzer; k1/b are
    the BM25 constants. `stopwords`/`stemmer`/`tokenizer` are analyzer hooks
    (tokenizer overrides language)."""

    def __init__(
        self,
        corpus: Optional[List[str]] = None,
        encoding_type: str = "query",
        language: str = "en",
        b: float = 0.75,
        k1: float = 1.2,
        tokenizer: Optional[Callable[[str], List[str]]] = None,
        stopwords: Optional[Set[str]] = None,
        stemmer: Optional[Callable[[str], str]] = None,
    ):
        if encoding_type not in ("query", "document"):
            raise ValueError(
                f"encoding_type must be 'query' or 'document', got {encoding_type!r}"
            )
        if language not in ("en", "zh"):
            raise ValueError(f"language must be 'en' or 'zh', got {language!r}")
        if corpus is not None:
            if not corpus or not isinstance(corpus, list):
                raise ValueError("Corpus must be a non-empty list of strings")
            if not all(isinstance(doc, str) for doc in corpus):
                raise ValueError("All corpus documents must be strings")
        self.k1 = float(k1)
        self.b = float(b)
        self.encoding_type = encoding_type
        self.language = language
        self._base_tokenize = tokenizer or (
            _zh_tokenize if language == "zh" else _en_tokenize
        )
        self._stopwords = stopwords
        self._stemmer = stemmer
        self._vocab: Dict[str, int] = {}  # term -> collision-free id
        self._df: Counter = Counter()
        self._n_docs = 0
        self._avgdl = 0.0
        if corpus is not None:
            self.fit(corpus)

    # ---- analyzer ----
    def _tokenize(self, text: str) -> List[str]:
        tokens = self._base_tokenize(text)
        if self._stopwords:
            tokens = [t for t in tokens if t not in self._stopwords]
        if self._stemmer:
            tokens = [self._stemmer(t) for t in tokens]
        return tokens

    # ---- term dictionary ----
    def _term_id(self, term: str, create: bool) -> Optional[int]:
        tid = self._vocab.get(term)
        if tid is None and create:
            tid = self._vocab[term] = len(self._vocab)
        return tid

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    @property
    def corpus_size(self) -> int:
        return self._n_docs

    def dump_vocab(self) -> Dict[str, int]:
        """The trained term dictionary (term -> id), e.g. for persistence."""
        return dict(self._vocab)

    # ---- corpus statistics ----
    def fit(self, corpus: List[str]) -> "BM25EmbeddingFunction":
        total_len = int(self._avgdl * self._n_docs)
        for text in corpus:
            tokens = self._tokenize(text)
            total_len += len(tokens)
            uniq = set(tokens)
            self._df.update(uniq)
            for t in uniq:
                self._term_id(t, create=True)
            self._n_docs += 1
        self._avgdl = total_len / max(self._n_docs, 1)
        return self

    train = fit  # reference naming (`SparseVectorEncoder.train`)

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
            # collision-free: every distinct term owns its dimension; terms
            # first seen here (doc embedded after fit) extend the dictionary
            out[self._term_id(term, create=True)] = weight
        return out

    def embed_query(self, text: str) -> Dict[int, float]:
        out: Dict[int, float] = {}
        for term in set(self._tokenize(text)):
            tid = self._term_id(term, create=False)
            if tid is not None:  # unknown terms can match no document
                out[tid] = 1.0
        return out

    def __call__(self, texts):
        """Reference call semantics: `encoding_type` decides how a bare call
        encodes (`bm25_embedding_function.py` __call__)."""
        if isinstance(texts, str):
            return (
                self.embed_query(texts)
                if self.encoding_type == "query"
                else self._embed_doc(texts)
            )
        if self.encoding_type == "query":
            return [self.embed_query(t) for t in texts]
        return self.embed_documents(texts)
