"""EDAX TSL binary ``.up1``/``.up2`` pattern file reader.

Format (reference ``/root/reference/src/kikuchipy/io/plugins/
edax_binary/_api.py:98-230``): little-endian header ``(version, sx, sy,
pattern_offset)`` as uint32, with version >= 3 adding ``(nx, ny)``
(after one skipped byte), a hex-grid flag, and float64 step sizes;
patterns are raw uint8 (.up1) or uint16 (.up2).
"""

from __future__ import annotations

import warnings
from pathlib import Path

import numpy as np

from kikuchipy_tpu.signals.ebsd import EBSD

__all__ = ["file_reader"]


def file_reader(filename: str | Path, lazy: bool = False) -> EBSD:
    filename = Path(filename)
    ext = filename.suffix.lower().lstrip(".")
    dtype = {"up1": np.uint8, "up2": np.uint16}[ext]

    with open(filename, "rb") as f:
        version = np.fromfile(f, "uint32", 1)[0]
        if version == 2:
            raise ValueError(
                "Only files with version 1 or >= 3, not 2, can be read"
            )
        sx, sy, pattern_offset = np.fromfile(f, "uint32", 3)
        file_size = filename.stat().st_size
        itemsize = np.dtype(dtype).itemsize
        metadata: dict = {"version": int(version)}
        if version == 1:
            n_patterns = int((file_size - pattern_offset) // (sx * sy * itemsize))
            nav_shape = (n_patterns,)
        else:
            nx, ny = np.fromfile(f, "uint32", 2, offset=1)
            is_hex = bool(np.fromfile(f, "uint8", 1)[0])
            if is_hex:
                warnings.warn(
                    "Returned signal has one navigation dimension since an "
                    "hexagonal grid is not supported"
                )
                n_patterns = int(
                    (file_size - pattern_offset) // (sx * sy * itemsize)
                )
                nav_shape = (n_patterns,)
            else:
                nav_shape = (int(ny), int(nx))
            dx, dy = np.fromfile(f, "float64", 2)
            metadata.update(step_x=float(dx), step_y=float(dy))

        count = int(np.prod(nav_shape)) * int(sx) * int(sy)
        if lazy:
            # Memmap the pattern block: patterns page in on access only
            # (reference memmaps too, edax_binary/_api.py:188), so a
            # lazy load touches no pattern bytes.
            data = np.memmap(
                filename,
                dtype=dtype,
                mode="r",
                offset=int(pattern_offset),
                shape=(count,),
            )
        else:
            f.seek(int(pattern_offset))
            data = np.fromfile(f, dtype, count)

    data = data.reshape(nav_shape + (int(sy), int(sx)))
    signal = EBSD(data=data, metadata=metadata)
    if lazy:
        return signal.as_lazy()
    return signal
