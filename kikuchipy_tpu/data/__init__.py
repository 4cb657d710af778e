"""Example datasets (reference ``/root/reference/src/kikuchipy/data/
_data.py``).

In this zero-egress environment the reference's in-package files (the
same files its ``nickel_ebsd_small`` and
``nickel_ebsd_master_pattern_small`` accessors ship) are available on
disk; the download-backed datasets (``nickel_ebsd_large``, ``ni_gain``,
``si_wafer``, ...) are registered but raise a clear error when their
files are absent. Set ``KP_TPU_DATA_DIR`` to point at a directory
containing cached copies.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = [
    "nickel_ebsd_small",
    "nickel_ebsd_master_pattern_small",
    "nickel_ebsd_large",
    "data_path",
]

_REFERENCE_DATA = Path("/root/reference/src/kikuchipy/data")


def data_path() -> Path:
    """Root directory of the example data files."""
    env = os.environ.get("KP_TPU_DATA_DIR")
    if env:
        return Path(env)
    return _REFERENCE_DATA


def _require(relpath: str) -> Path:
    p = data_path() / relpath
    if not p.exists():
        raise FileNotFoundError(
            f"Dataset file {relpath} not found under {data_path()}. Set "
            "KP_TPU_DATA_DIR to a directory with the kikuchipy example data."
        )
    return p


def nickel_ebsd_small(**kwargs):
    """3x3 nickel scan of 60x60 patterns with PCs, static background and
    orientations (reference ``data/_data.py:97``)."""
    from kikuchipy_tpu.io._io import load

    return load(_require("kikuchipy_h5ebsd/patterns.h5"), **kwargs)


def nickel_ebsd_master_pattern_small(
    projection: str = "stereographic", hemisphere: str = "upper", **kwargs
):
    """Nickel EBSD master pattern at 20 kV, 401x401 px (reference
    ``data/_data.py:455``)."""
    from kikuchipy_tpu.io._io import load

    return load(
        _require(
            "emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5"
        ),
        projection=projection,
        hemisphere=hemisphere,
        **kwargs,
    )


def nickel_ebsd_large(**kwargs):
    """55x75 nickel scan (download-backed in the reference,
    ``data/_data.py:129``); requires a cached copy."""
    from kikuchipy_tpu.io._io import load

    return load(_require("nickel_ebsd_large/patterns.h5"), **kwargs)
