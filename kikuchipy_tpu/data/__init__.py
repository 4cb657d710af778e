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


def _require(
    relpath: str,
    allow_download: bool = False,
    check_hash: bool = False,
) -> Path:
    """Resolve a dataset file: the cache dir (``KP_TPU_DATA_DIR``)
    first, then the in-package/reference data directory; optionally
    download into the cache dir and verify the registered MD5
    (see :mod:`kikuchipy_tpu.data._registry`)."""
    from kikuchipy_tpu.data._registry import fetch, verify

    env = os.environ.get("KP_TPU_DATA_DIR")
    candidates = [Path(env)] if env else []
    if _REFERENCE_DATA.exists():
        candidates.append(_REFERENCE_DATA)
    for root in candidates:
        p = root / relpath
        if p.exists():
            if check_hash and not verify(p, relpath):
                raise ValueError(f"MD5 mismatch for {p}")
            return p
    cache = Path(env) if env else Path.home() / ".cache" / "kikuchipy_tpu"
    return fetch(
        relpath, cache, allow_download=allow_download, check_hash=check_hash
    )


def _fetch_opts(kwargs):
    """Pop fetch-related options from an accessor's kwargs."""
    return dict(
        allow_download=kwargs.pop("allow_download", False),
        check_hash=kwargs.pop("check_hash", False),
    )


def nickel_ebsd_small(**kwargs):
    """3x3 nickel scan of 60x60 patterns with PCs, static background and
    orientations (reference ``data/_data.py:97``)."""
    from kikuchipy_tpu.io._io import load

    opts = _fetch_opts(kwargs)
    return load(_require("kikuchipy_h5ebsd/patterns.h5", **opts), **kwargs)


def nickel_ebsd_master_pattern_small(
    projection: str = "stereographic", hemisphere: str = "upper", **kwargs
):
    """Nickel EBSD master pattern at 20 kV, 401x401 px (reference
    ``data/_data.py:455``)."""
    from kikuchipy_tpu.io._io import load

    opts = _fetch_opts(kwargs)
    return load(
        _require(
            "emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5",
            **opts,
        ),
        projection=projection,
        hemisphere=hemisphere,
        **kwargs,
    )


def nickel_ebsd_large(**kwargs):
    """55x75 nickel scan (download-backed in the reference,
    ``data/_data.py:129``); requires a cached copy."""
    from kikuchipy_tpu.io._io import load

    opts = _fetch_opts(kwargs)
    return load(_require("nickel_ebsd_large/patterns.h5", **opts), **kwargs)


def ni_gain(number: int = 1, **kwargs):
    """NORDIF (149, 200) nickel scan at one of ten camera gains
    (reference ``data/_data.py:179``; download-backed -- requires a
    cached copy under ``ni_gain/<number>/``)."""
    from kikuchipy_tpu.io._io import load

    if not 1 <= int(number) <= 10:
        raise ValueError("number must be in [1, 10]")
    opts = _fetch_opts(kwargs)
    return load(_require(f"ni_gain/{int(number)}/Pattern.dat", **opts), **kwargs)


def ni_gain_calibration(number: int = 1, **kwargs):
    """NORDIF calibration patterns for the ``ni_gain`` datasets
    (reference ``data/_data.py:249``)."""
    from kikuchipy_tpu.io._io import load

    if not 1 <= int(number) <= 10:
        raise ValueError("number must be in [1, 10]")
    opts = _fetch_opts(kwargs)
    return load(
        _require(f"ni_gain/{int(number)}/Setting.txt", **opts),
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
    opts = _fetch_opts(kwargs)
    return load(
        _require(f"silicon_ebsd_moving_screen/{names[distance]}", **opts),
        **kwargs,
    )


def si_wafer(**kwargs):
    """(50, 50) Si-wafer scan of (480, 480) patterns (reference
    ``data/_data.py:392``; download-backed)."""
    from kikuchipy_tpu.io._io import load

    opts = _fetch_opts(kwargs)
    return load(_require("si_wafer/Pattern.dat", **opts), **kwargs)


_MASTER_PATTERN_PHASES = (
    "al", "ni", "si", "austenite", "ferrite", "steel_chi", "steel_sigma",
    "steel_sigma2", "r", "pi", "cr2n", "al6mn", "alpha_almnsi",
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
    opts = _fetch_opts(kwargs)
    return load(
        _require(f"ebsd_master_pattern/{phase}_mc_mp_20kv.h5", **opts),
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
