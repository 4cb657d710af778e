"""Signal utilities (reference ``kikuchipy.signals.util``). The Dask
helpers (``get_chunking``, ``get_dask_array``) have no equivalent here
— jit + streaming replace lazy task graphs (see
``kikuchipy_tpu.io.streaming``)."""

from kikuchipy_tpu.utils.grid import grid_indices

__all__ = ["grid_indices"]
