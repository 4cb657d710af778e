"""Tutorial: reference frames and the EBSD detector.

Mirrors the reference's ``doc/tutorials/reference_frames.ipynb``: the
sample/detector geometry, the projection-center (PC) conventions of
the major vendors, gnomonic coordinates, and the sample-to-detector
rotation, all carried by :class:`kikuchipy_tpu.detectors.EBSDDetector`
(a NumPy dataclass the TPU kernels read geometry from).

Run: ``python doc/tutorials/reference_frames.py``.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import kikuchipy_tpu as kp

# %% A detector: shape in pixels, pixel size, tilts, and the PC.
# The PC (x*, y*, z*) is stored in the Bruker convention: x* from the
# detector's left edge, y* from its TOP edge, z* the sample-detector
# distance, all in fractions of detector width/height.
det = kp.detectors.EBSDDetector(
    shape=(60, 60),
    pc=(0.421, 0.221, 0.505),
    px_size=70.0,          # microns
    sample_tilt=70.0,      # degrees
    tilt=0.0,              # detector tilt
)
print(det)

# %% Vendor conventions: EDAX/TSL and Oxford measure y* from the
# BOTTOM edge, EMsoft's xpc/ypc are signed pixel offsets from the
# detector centre. The conversions are exact and invertible.
pc_tsl = det.pc_tsl()
pc_emsoft = det.pc_emsoft()
np.testing.assert_allclose(pc_tsl[..., 1], 1 - det.pc[..., 1])
# Round-trip through another convention is identity:
det2 = kp.detectors.EBSDDetector(
    shape=det.shape, pc=pc_tsl, convention="tsl",
    px_size=det.px_size, sample_tilt=det.sample_tilt,
)
np.testing.assert_allclose(det2.pc, det.pc, atol=1e-12)

# %% The gnomonic projection: band edges and zone axes live in the
# gnomonic (tangent) plane at the PC. Its bounds depend on the PC.
print("gnomonic bounds (x0, x1, y0, y1):", det.gnomonic_bounds.ravel())
assert det.x_range.shape[-1] == 2 and det.y_range.shape[-1] == 2

# Pixel <-> gnomonic coordinate conversion is exact:
px = np.array([[10.0, 20.0], [45.5, 12.25]])  # (n, xy)
gn = det.to_gnomonic_coords(px)
back = det.to_pixel_coords(gn)
np.testing.assert_allclose(np.asarray(back).reshape(-1, 2), px, atol=1e-9)

# %% The sample -> detector rotation composes the sample tilt, the
# detector tilt, the azimuthal angle and the twist into one matrix —
# the rotation every projection kernel applies.
R = det.sample_to_detector
assert R.shape[-2:] == (3, 3)
np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.eye(3), atol=1e-12)

# %% Per-point PCs: a detector can carry one PC per navigation point
# (as the real nickel scan does) — downstream kernels broadcast
# accordingly.
scan = kp.data.nickel_ebsd_small()
print("scan detector PC shape:", scan.detector.pc.shape)
assert scan.detector.pc.shape == (3, 3, 3)
print("average PC:", np.round(scan.detector.pc_average, 4))

# %% Detectors persist to the reference's plain-text format.
import tempfile

with tempfile.TemporaryDirectory() as d:
    p = Path(d) / "detector.txt"
    det.save(p)
    det3 = kp.detectors.EBSDDetector.load(p)
    np.testing.assert_allclose(det3.pc, det.pc)
    assert det3.shape == det.shape

print("reference_frames tutorial OK")
