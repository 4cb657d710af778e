"""Indexing engine (public namespace mirroring ``kikuchipy.indexing``)."""

from kikuchipy_tpu.indexing.di import (
    DictionaryIndexingResult,
    dictionary_index,
    merge_topk,
)
from kikuchipy_tpu.indexing.metrics import SimilarityMetric, get_metric, ncc, ndp

__all__ = [
    "DictionaryIndexingResult",
    "SimilarityMetric",
    "dictionary_index",
    "get_metric",
    "merge_topk",
    "ncc",
    "ndp",
]
