"""Indexing engine (public namespace mirroring ``kikuchipy.indexing``)."""

from kikuchipy_tpu.indexing.di import (
    DictionaryIndexingResult,
    dictionary_index,
    merge_topk,
)
from kikuchipy_tpu.indexing.compat import (
    NormalizedCrossCorrelationMetric,
    NormalizedDotProductMetric,
    compute_refine_orientation_projection_center_results,
    compute_refine_orientation_results,
    compute_refine_projection_center_results,
    xmap_from_hough_indexing_data,
)
from kikuchipy_tpu.indexing.hough import hough_indexing
from kikuchipy_tpu.indexing.merge import merge_crystal_maps
from kikuchipy_tpu.indexing.metrics import SimilarityMetric, get_metric, ncc, ndp
from kikuchipy_tpu.indexing.osm import orientation_similarity_map
from kikuchipy_tpu.indexing.refinement import (
    refine_orientation,
    refine_orientation_projection_center,
    refine_projection_center,
)

__all__ = [
    "NormalizedCrossCorrelationMetric",
    "NormalizedDotProductMetric",
    "compute_refine_orientation_projection_center_results",
    "compute_refine_orientation_results",
    "compute_refine_projection_center_results",
    "hough_indexing",
    "xmap_from_hough_indexing_data",
    "DictionaryIndexingResult",
    "SimilarityMetric",
    "dictionary_index",
    "get_metric",
    "merge_crystal_maps",
    "merge_topk",
    "ncc",
    "ndp",
    "orientation_similarity_map",
    "refine_orientation",
    "refine_orientation_projection_center",
    "refine_projection_center",
]
