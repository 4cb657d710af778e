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


def ni_gain(number: int = 1, **kwargs):
    """NORDIF (149, 200) nickel scan at one of ten camera gains
    (reference ``data/_data.py:179``; download-backed -- requires a
    cached copy under ``ni_gain/<number>/``)."""
    from kikuchipy_tpu.io._io import load

    if not 1 <= int(number) <= 10:
        raise ValueError("number must be in [1, 10]")
    return load(_require(f"ni_gain/{int(number)}/Pattern.dat"), **kwargs)


def ni_gain_calibration(number: int = 1, **kwargs):
    """NORDIF calibration patterns for the ``ni_gain`` datasets
    (reference ``data/_data.py:249``)."""
    from kikuchipy_tpu.io._io import load

    if not 1 <= int(number) <= 10:
        raise ValueError("number must be in [1, 10]")
    return load(
        _require(f"ni_gain/{int(number)}/Setting.txt"),
        reader="nordif_calibration_patterns",
        **kwargs,
    )


def si_ebsd_moving_screen(distance: int = 0, **kwargs):
    """Single-crystal Si pattern at screen distance 0, 5 or 10 mm
    (reference ``data/_data.py:321``; for moving-screen PC
    calibration)."""
    from kikuchipy_tpu.io._io import load

    names = {0: "si_in.h5", 5: "si_out5mm.h5", 10: "si_out10mm.h5"}
    if distance not in names:
        raise ValueError("distance must be 0, 5 or 10 (mm)")
    return load(
        _require(f"silicon_ebsd_moving_screen/{names[distance]}"), **kwargs
    )


def si_wafer(**kwargs):
    """(50, 50) Si-wafer scan of (480, 480) patterns (reference
    ``data/_data.py:392``; download-backed)."""
    from kikuchipy_tpu.io._io import load

    return load(_require("si_wafer/Pattern.dat"), **kwargs)


_MASTER_PATTERN_PHASES = (
    "al", "ni", "si", "austenite", "ferrite", "steel_chi", "steel_sigma"
)


def ebsd_master_pattern(
    phase: str,
    energy=None,
    projection: str = "stereographic",
    hemisphere: str = "upper",
    **kwargs,
):
    """(1001, 1001) EMsoft master pattern of a named phase (reference
    ``data/_data.py:517``; download-backed)."""
    from kikuchipy_tpu.io._io import load

    if phase not in _MASTER_PATTERN_PHASES:
        raise ValueError(
            f"phase must be one of {_MASTER_PATTERN_PHASES}, got {phase!r}"
        )
    return load(
        _require(f"ebsd_master_pattern/{phase}_mc_mp_20kv.h5"),
        energy=energy,
        projection=projection,
        hemisphere=hemisphere,
        **kwargs,
    )


def clear_cache() -> None:
    """Delete cached dataset files under ``KP_TPU_DATA_DIR`` (reference
    ``data/_data.py:55``). The read-only in-package files are never
    touched."""
    import shutil

    env = os.environ.get("KP_TPU_DATA_DIR")
    if not env:
        return
    p = Path(env)
    if p.exists() and p != _REFERENCE_DATA:
        shutil.rmtree(p)


__all__ += [
    "clear_cache",
    "ebsd_master_pattern",
    "ni_gain",
    "ni_gain_calibration",
    "si_ebsd_moving_screen",
    "si_wafer",
]
