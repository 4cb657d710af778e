"""Compat shim for the reference's ``kikuchipy.pattern.chunk`` module
(``/root/reference/src/kikuchipy/pattern/chunk.py``).

The reference loops per-pattern kernels over numpy chunks for Dask's
``map_blocks``; this framework's ops are natively batched, so these
wrappers simply delegate to the batched kernels in
:mod:`kikuchipy_tpu.ops.pattern` — they exist so ported code calling
``kp.pattern.chunk.*`` keeps working.
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_dynamic_background", "fft_filter"]


def get_dynamic_background(
    patterns: np.ndarray,
    filter_func=None,
    dtype_out=None,
    **kwargs,
) -> np.ndarray:
    """Dynamic backgrounds of a chunk of patterns (reference
    ``pattern/chunk.py:33``). ``filter_func`` is accepted for signature
    compatibility; the frequency-domain (Barnes rFFT) path is used, with
    ``std``/``truncate`` keywords honored.
    """
    from kikuchipy_tpu.ops.pattern import get_dynamic_background as _batched

    patterns = np.asarray(patterns)
    if dtype_out is None:
        dtype_out = patterns.dtype
    out = np.asarray(_batched(patterns, **kwargs))
    return out.astype(dtype_out)


def fft_filter(
    patterns: np.ndarray,
    filter_func=None,
    transfer_function=None,
    dtype_out=None,
    **kwargs,
) -> np.ndarray:
    """FFT-filter a chunk of patterns (reference ``pattern/chunk.py:75``)."""
    from kikuchipy_tpu.ops.pattern import fft_filter as _batched

    patterns = np.asarray(patterns)
    if dtype_out is None:
        dtype_out = patterns.dtype
    if transfer_function is None:
        transfer_function = kwargs.pop("transfer_function")
    out = np.asarray(_batched(patterns, transfer_function, **kwargs))
    return out.astype(dtype_out)
