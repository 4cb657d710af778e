"""Signal utilities (reference ``kikuchipy.signals.util``).

``grid_indices`` matches the reference exactly; ``get_chunking`` is a
dask-free reimplementation of the reference's navigation-chunking
policy (used by the streaming reader), and ``get_dask_array`` is a
compat shim for migrated code (requires the optional dask dependency —
jit + :mod:`kikuchipy_tpu.io.streaming` replace lazy task graphs here).
"""

from kikuchipy_tpu.signals.util._chunking import get_chunking, get_dask_array
from kikuchipy_tpu.utils.grid import grid_indices

__all__ = ["get_chunking", "get_dask_array", "grid_indices"]
