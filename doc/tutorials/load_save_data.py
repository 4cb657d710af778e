"""Tutorial: loading and saving data.

Mirrors the reference's ``doc/tutorials/load_save_data.ipynb``: the
``kp.load`` entry point with plugin auto-detection (file extension +
HDF5 "footprint" sniffing), the writable formats (kikuchipy h5ebsd,
NORDIF binary), lazy/out-of-core loading, and the in-package datasets.

Run: ``python doc/tutorials/load_save_data.py``.
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import kikuchipy_tpu as kp

# %% In-package datasets (the reference's kp.data module): the nickel
# test scan and the EMsoft nickel master pattern.
s = kp.data.nickel_ebsd_small()
print("scan:", s.navigation_shape, s.signal_shape, s.data.dtype)
mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="lambert", hemisphere="both"
)
print("master pattern:", mp.data.shape, "hemisphere:", mp.hemisphere)

with tempfile.TemporaryDirectory() as tmpdir:
    tmp = Path(tmpdir)

    # %% kikuchipy h5ebsd: the native format — full fidelity
    # round-trip of patterns + detector + crystal map + static
    # background.
    p_h5 = tmp / "scan.h5"
    s.save(p_h5)
    s2 = kp.load(p_h5)
    np.testing.assert_array_equal(np.asarray(s2.data), np.asarray(s.data))
    np.testing.assert_allclose(
        np.asarray(s2.detector.pc), np.asarray(s.detector.pc)
    )
    np.testing.assert_array_equal(
        s2.static_background, s.static_background
    )

    # %% NORDIF binary (.dat): the other writable format. Like the
    # reference, the writer emits only the raw pattern stream — on
    # load, either a NORDIF Setting.txt sits next to the file or the
    # scan/pattern sizes are passed explicitly.
    p_dat = tmp / "Pattern.dat"
    s.save(p_dat)
    s3 = kp.load(p_dat, scan_size=(3, 3), pattern_size=(60, 60))
    np.testing.assert_array_equal(
        np.asarray(s3.data).reshape(s.data.shape), np.asarray(s.data)
    )

    # %% Plugin auto-detection: HDF5 vendor files are recognized by
    # their internal "footprints" (manufacturer datasets / layout),
    # not just extensions — the same .h5 suffix can be any of
    # kikuchipy/Bruker/EDAX/Oxford/EMsoft h5ebsd.
    from kikuchipy_tpu.io._io import _sniff_hdf5_plugin, plugins

    assert _sniff_hdf5_plugin(p_h5) == "kikuchipy_h5ebsd"
    print("registered IO plugins:", sorted(plugins()))

    # %% Lazy loading: ``lazy=True`` memory-maps / chunk-streams the
    # patterns instead of reading them up front — the scan surface
    # works the same, chunk-at-a-time (LazyEBSD; out-of-core analogue
    # of the reference's dask-backed signals).
    sl = kp.load(p_h5, lazy=True)
    assert hasattr(sl, "compute")
    pre = sl.remove_static_background()   # still lazy
    sc = pre.compute()                    # materialize
    ref = s.remove_static_background()
    np.testing.assert_array_equal(np.asarray(sc.data), np.asarray(ref.data))

    # %% Detector geometry saves to the reference's text format.
    p_det = tmp / "detector.txt"
    s.detector.save(p_det)
    det = kp.detectors.EBSDDetector.load(p_det)
    np.testing.assert_allclose(det.pc, s.detector.pc)

print("load_save_data tutorial OK")
