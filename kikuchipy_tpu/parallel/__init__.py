"""Device-mesh parallelism (TPU-native; the reference has no
distributed backend, SURVEY.md §2.12)."""

from kikuchipy_tpu.parallel.refine import sharded_refine_orientation
from kikuchipy_tpu.parallel.mesh import (
    make_mesh,
    sharded_dictionary_index,
    sharded_fused_dictionary_index,
    sharded_match_topk,
)

__all__ = [
    "make_mesh",
    "sharded_dictionary_index",
    "sharded_fused_dictionary_index",
    "sharded_match_topk",
    "sharded_refine_orientation",
]
