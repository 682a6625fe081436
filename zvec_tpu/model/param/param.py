"""Index / query parameter classes and collection options.

Constructor signatures and defaults mirror the reference binding
(`src/binding/python/model/param/python_param.cc:172-983`) and the core defaults
(`src/include/zvec/core/interface/constants.h:21-24`: HNSW m=50, ef_construction=500,
ef_search=300; `src/include/zvec/db/index_params.h:252`: IVF n_iters=10;
`src/include/zvec/db/query_params.h:98-126`: nprobe=10, refiner scale_factor=10).
"""

from __future__ import annotations

import json
from typing import Optional

from ...typing.enum import IndexType, MetricType, QuantizeType

__all__ = [
    "IndexParam",
    "VectorIndexParam",
    "InvertIndexParam",
    "HnswIndexParam",
    "FlatIndexParam",
    "IVFIndexParam",
    "QueryParam",
    "HnswQueryParam",
    "IVFQueryParam",
    "FlatQueryParam",
    "CollectionOption",
    "SegmentOption",
    "IndexOption",
    "OptimizeOption",
    "AddColumnOption",
    "AlterColumnOption",
    "DEFAULT_HNSW_M",
    "DEFAULT_HNSW_EF_CONSTRUCTION",
    "DEFAULT_HNSW_EF_SEARCH",
    "DEFAULT_IVF_NPROBE",
    "DEFAULT_REFINER_SCALE_FACTOR",
]

# Reference defaults (`constants.h:21-24`, `query_params.h:98-126`).
DEFAULT_HNSW_M = 50
DEFAULT_HNSW_EF_CONSTRUCTION = 500
DEFAULT_HNSW_EF_SEARCH = 300
DEFAULT_IVF_NPROBE = 10
DEFAULT_REFINER_SCALE_FACTOR = 10


class _ReprMixin:
    def _repr_dict(self) -> dict:
        return {
            k: (v.name if hasattr(v, "name") else v)
            for k, v in self.__dict__.items()
            if not k.startswith("_")
        }

    def __repr__(self) -> str:
        return f"{type(self).__name__}({json.dumps(self._repr_dict())})"

    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self._repr_dict().items()))))


class IndexParam(_ReprMixin):
    """Base of all index parameter classes."""

    index_type: IndexType = IndexType.UNDEFINED

    def clone(self) -> "IndexParam":
        import copy

        return copy.deepcopy(self)

    def to_dict(self) -> dict:
        d = {"index_type": self.index_type.name}
        d.update(self._repr_dict())
        return d


class InvertIndexParam(IndexParam):
    """Inverted (scalar secondary) index parameters.

    `enable_range_optimization` enables order-preserving numeric key encoding for
    range scans; `enable_extended_wildcard` additionally indexes reversed strings
    for suffix matching (reference `src/include/zvec/db/index_params.h:63-104`).
    """

    index_type = IndexType.INVERT

    def __init__(
        self,
        enable_range_optimization: bool = False,
        enable_extended_wildcard: bool = False,
    ):
        self.enable_range_optimization = bool(enable_range_optimization)
        self.enable_extended_wildcard = bool(enable_extended_wildcard)


class VectorIndexParam(IndexParam):
    """Base of the vector index parameter classes."""

    def __init__(
        self,
        metric_type: MetricType = MetricType.IP,
        quantize_type: QuantizeType = QuantizeType.UNDEFINED,
    ):
        self.metric_type = MetricType(metric_type)
        self.quantize_type = QuantizeType(quantize_type)


class HnswIndexParam(VectorIndexParam):
    index_type = IndexType.HNSW

    def __init__(
        self,
        metric_type: MetricType = MetricType.IP,
        m: int = DEFAULT_HNSW_M,
        ef_construction: int = DEFAULT_HNSW_EF_CONSTRUCTION,
        quantize_type: QuantizeType = QuantizeType.UNDEFINED,
    ):
        super().__init__(metric_type, quantize_type)
        if m <= 0:
            raise ValueError(f"HNSW m must be positive, got {m}")
        if ef_construction <= 0:
            raise ValueError(
                f"HNSW ef_construction must be positive, got {ef_construction}"
            )
        self.m = int(m)
        self.ef_construction = int(ef_construction)


class FlatIndexParam(VectorIndexParam):
    index_type = IndexType.FLAT

    def __init__(
        self,
        metric_type: MetricType = MetricType.IP,
        quantize_type: QuantizeType = QuantizeType.UNDEFINED,
    ):
        super().__init__(metric_type, quantize_type)


class IVFIndexParam(VectorIndexParam):
    index_type = IndexType.IVF

    def __init__(
        self,
        metric_type: MetricType = MetricType.IP,
        n_list: int = 0,
        n_iters: int = 10,
        use_soar: bool = False,
        quantize_type: QuantizeType = QuantizeType.UNDEFINED,
    ):
        super().__init__(metric_type, quantize_type)
        if n_list < 0:
            raise ValueError(f"IVF n_list must be >= 0, got {n_list}")
        self.n_list = int(n_list)  # 0 => auto (sqrt heuristic at train time)
        self.n_iters = int(n_iters)
        self.use_soar = bool(use_soar)


class QueryParam(_ReprMixin):
    """Base of per-query vector search parameters."""

    def __init__(self, is_linear: bool = False, is_using_refiner: bool = False):
        self.is_linear = bool(is_linear)
        self.is_using_refiner = bool(is_using_refiner)
        self.refiner_scale_factor = DEFAULT_REFINER_SCALE_FACTOR


class HnswQueryParam(QueryParam):
    def __init__(
        self,
        ef: int = DEFAULT_HNSW_EF_SEARCH,
        radius: float = 0.0,
        is_linear: bool = False,
        is_using_refiner: bool = False,
    ):
        super().__init__(is_linear, is_using_refiner)
        if ef <= 0:
            raise ValueError(f"HNSW ef must be positive, got {ef}")
        self.ef = int(ef)
        self.radius = float(radius)


class IVFQueryParam(QueryParam):
    def __init__(self, nprobe: int = DEFAULT_IVF_NPROBE, is_using_refiner: bool = False):
        super().__init__(is_using_refiner=is_using_refiner)
        if nprobe <= 0:
            raise ValueError(f"IVF nprobe must be positive, got {nprobe}")
        self.nprobe = int(nprobe)


class FlatQueryParam(QueryParam):
    def __init__(self, is_using_refiner: bool = False):
        super().__init__(is_using_refiner=is_using_refiner)


class CollectionOption(_ReprMixin):
    """Collection open options (`python_param.cc:716-747`)."""

    def __init__(self, read_only: bool = False, enable_mmap: bool = True):
        self.read_only = bool(read_only)
        self.enable_mmap = bool(enable_mmap)


class SegmentOption(_ReprMixin):
    """Segment sizing knobs (`schema.h:24-25`: max 10M docs/segment, min 1000)."""

    def __init__(
        self,
        max_doc_count_per_segment: int = 10_000_000,
        min_doc_count_for_index: int = 1000,
    ):
        self.max_doc_count_per_segment = int(max_doc_count_per_segment)
        self.min_doc_count_for_index = int(min_doc_count_for_index)


class _ConcurrencyOption(_ReprMixin):
    def __init__(self, concurrency: int = 0):
        self.concurrency = int(concurrency)


class IndexOption(_ConcurrencyOption):
    pass


class OptimizeOption(_ConcurrencyOption):
    pass


class AddColumnOption(_ConcurrencyOption):
    pass


class AlterColumnOption(_ConcurrencyOption):
    pass
