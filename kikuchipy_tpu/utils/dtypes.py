"""Intensity-range bookkeeping for integer/float image dtypes.

Mirrors the behavior of ``skimage.util.dtype.dtype_range`` as used by the
reference (``/root/reference/src/kikuchipy/pattern/_pattern.py:82-93``):
integer dtypes map to their full representable range, floating dtypes map
to ``(-1, 1)``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dtype_range", "get_dtype_range"]

_FLOAT_RANGE = (-1.0, 1.0)

dtype_range: dict[type, tuple[float, float]] = {
    np.bool_: (False, True),
    np.uint8: (0, 255),
    np.uint16: (0, 65535),
    np.uint32: (0, 2**32 - 1),
    np.uint64: (0, 2**64 - 1),
    np.int8: (-128, 127),
    np.int16: (-32768, 32767),
    np.int32: (-(2**31), 2**31 - 1),
    np.int64: (-(2**63), 2**63 - 1),
    np.float16: _FLOAT_RANGE,
    np.float32: _FLOAT_RANGE,
    np.float64: _FLOAT_RANGE,
}


def get_dtype_range(dtype) -> tuple[float, float]:
    """Return the output intensity range ``(omin, omax)`` for ``dtype``.

    Raises
    ------
    KeyError
        If the dtype is not a recognized image dtype (matching the
        reference's error behavior for e.g. complex dtypes).
    """
    dt = np.dtype(dtype)
    try:
        return dtype_range[dt.type]
    except KeyError:
        raise KeyError(
            f"Could not set output intensity range, since data type '{dt}' is "
            f"not recognised. Use any of '{list(dtype_range)}'."
        )
