"""Tutorial: projection-center calibration, fitting and extrapolation.

Covers the reference's PC tutorial trio
(``pc_calibration_moving_screen_technique.ipynb``,
``pc_fit_plane.ipynb``, ``pc_extrapolate_plane.ipynb``): estimate the
PC with the moving-screen technique, fit a smooth PC model over a map
from a handful of calibrated points, and extrapolate a full PC grid
from one average PC + the microscope geometry.

Run: ``python doc/tutorials/pc_calibration.py``.
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
from kikuchipy_tpu.detectors.calibration import PCCalibrationMovingScreen

# %% Moving-screen technique: two patterns of the SAME beam position,
# one at the operating camera distance ("in") and one with the screen
# retracted by a known delta_z ("out"). Moving the screen out magnifies
# the pattern about (PCx, PCy); intersecting the lines through
# corresponding feature points gives the PC.
# Here: synthetic feature points from a known true PC = (0.4, 0.3, 0.5).
true_pc = (0.4, 0.3, 0.5)
nrows = ncols = 100
px_size, delta_z = 0.05, 2.0
pxy = np.array([true_pc[0] * ncols, (1 - true_pc[1]) * nrows])  # TSL y-up
z_um = true_pc[2] * nrows * px_size
mag = (z_um + delta_z) / z_um
rng = np.random.default_rng(0)
pts_in = rng.uniform(20, 80, size=(5, 2))
pts_out = pxy + (pts_in - pxy) * mag

cal = PCCalibrationMovingScreen(
    pattern_in=np.zeros((nrows, ncols)),
    pattern_out=np.zeros((nrows, ncols)),
    points_in=pts_in,
    points_out=pts_out,
    delta_z=delta_z,
    px_size=px_size,
    convention="tsl",
)
print("moving-screen PC estimate:", np.round(cal.pc, 4))
np.testing.assert_allclose(cal.pc, true_pc, atol=1e-6)
# The estimate converts straight into a detector:
det_cal = cal.to_detector()
assert det_cal.shape == (nrows, ncols)

# %% Fitting a PC model over a map: PCs calibrated at a few map
# positions vary smoothly (approximately linearly) with beam position;
# fit a projective/affine/plane model and evaluate it everywhere.
nav_shape = (6, 8)
jj, ii = np.meshgrid(np.arange(8), np.arange(6))
pc_true_grid = np.stack(
    [
        0.42 + 0.001 * jj,            # PCx drifts with beam x
        0.21 + 0.0005 * ii,           # PCy with beam y
        0.50 - 0.0003 * jj,
    ],
    axis=-1,
)
# "Calibrate" 5 scattered points (with the grid indices known):
pc_idx = np.array([[0, 0], [5, 7], [0, 7], [5, 0], [3, 4]])
pcs = pc_true_grid[pc_idx[:, 0], pc_idx[:, 1]]

det5 = kp.detectors.EBSDDetector(
    shape=(60, 60), pc=pcs, sample_tilt=70, px_size=70
)
det_fit = det5.fit_pc(
    pc_indices=pc_idx.T, map_indices=np.stack([ii, jj]),
    transformation="projective",
)
err = np.abs(np.asarray(det_fit.pc) - pc_true_grid).max()
print("fitted PC grid max error:", float(err))
assert err < 2e-3

# %% Extrapolating from ONE average PC: with the microscope geometry
# (step sizes, pixel size, binning) the PC gradient over the map is
# known analytically; extrapolate a full grid from the mean.
det_ext = det5.extrapolate_pc(
    pc_indices=pc_idx.T,
    navigation_shape=nav_shape,
    step_sizes=(1.5, 1.5),  # microns
)
assert det_ext.navigation_shape == nav_shape
# PCx decreases as the beam moves right (x* measured from the left):
dpcx = np.diff(np.asarray(det_ext.pc)[..., 0], axis=1)
assert (dpcx <= 0).all()

# %% Tilt estimation from a fitted PC plane (reference
# ``estimate_xtilt``): the PC plane's normal encodes the
# detector-sample tilt geometry.
tilt = det_fit.estimate_xtilt(degrees=True)
print("estimated x-tilt (deg):", round(float(tilt), 2))
assert np.isfinite(tilt)

# %% Orientation dependence of the PC error (the reference's
# ``pc_orientation_dependence.ipynb``, in miniature with synthetic
# data): PCs refined by pattern matching carry an orientation-
# dependent bias, so a good average PC must pool patterns from many
# DIFFERENT grains. Here: project patterns at several orientations
# with a known true PC, refine the PC from a deliberately shifted
# start, and watch the per-orientation estimates scatter around truth.
import dataclasses

from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
from kikuchipy_tpu.crystallography.sampling import (
    reduce_to_fundamental_zone,
    super_fibonacci,
)

mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="lambert", hemisphere="both"
)
pc_truth = (0.42, 0.22, 0.50)
det_t = kp.detectors.EBSDDetector(
    shape=(48, 48), pc=pc_truth, sample_tilt=70
)
rots = reduce_to_fundamental_zone(super_fibonacci(12), "m-3m")
sim = mp.get_patterns(rots, det_t, dtype_out=np.float32)
# Real detectors add noise; noise is what makes the refined PC err,
# and the error direction depends on the band layout — i.e. the
# orientation.
pats = np.asarray(sim.data)
pats = pats + rng.normal(scale=0.35 * pats.std(), size=pats.shape)
sig = kp.signals.EBSD(data=pats.astype(np.float32), detector=det_t)

det_start = dataclasses.replace(
    det_t, pc=np.asarray(pc_truth) + [0.01, -0.01, 0.008]
)
res = sig.refine_projection_center(
    xmap=CrystalMap(rotations=rots, shape=(len(rots),)),
    detector=det_start, master_pattern=mp, energy=20,
    trust_region=[0.03, 0.03, 0.03], max_iters=40,
)
pcs = np.asarray(res.detector.pc).reshape(-1, 3)
spread = pcs.std(axis=0)
bias = np.abs(pcs.mean(axis=0) - pc_truth)
print("per-orientation PC spread:", np.round(spread, 4))
print("pooled-PC bias:", np.round(bias, 4))
# Individual estimates scatter with orientation, but POOLING across
# orientations recovers the true PC much better than typical single-
# orientation errors — the tutorial's point.
assert bias.max() < np.abs(pcs - pc_truth).max()
assert bias.max() < 0.01

print("pc_calibration tutorial OK")
