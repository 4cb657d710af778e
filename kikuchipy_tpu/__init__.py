"""kikuchipy_tpu: a TPU-native EBSD pattern processing and indexing
framework (JAX / XLA / Pallas / pjit).

Re-designed from scratch with the capabilities of kikuchipy (reference
at ``/root/reference``): pattern preprocessing as fused batched kernels,
dictionary indexing as MXU matmuls with on-device top-k, master-pattern
projection as a vectorized gather pipeline, and multi-chip scaling via
``jax.sharding`` meshes.
"""

from kikuchipy_tpu.io._io import load, save
from kikuchipy_tpu.utils.logging import set_log_level
from kikuchipy_tpu import (
    data,
    detectors,
    draw,
    filters,
    imaging,
    indexing,
    io,
    ops,
    pattern,
    signals,
    simulation,
    simulations,
)

__version__ = "0.1.0"

__all__ = [
    "data",
    "detectors",
    "draw",
    "filters",
    "imaging",
    "indexing",
    "io",
    "load",
    "ops",
    "pattern",
    "save",
    "set_log_level",
    "signals",
    "simulation",
    "simulations",
    "__version__",
]
