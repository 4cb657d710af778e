"""Tutorial: Hough indexing.

Mirrors the reference's ``doc/tutorials/hough_indexing.ipynb`` — but
where the reference wraps the external PyEBSDIndex package (OpenCL),
this framework ships a NATIVE TPU Hough/Radon indexer: the Radon
transform is one dense MXU matmul (sampling weights + band-enhancing
butterfly folded into a single fixed operator), band detection is a
batched peak extraction, and orientations come from triplet voting +
Kabsch polish.

Run: ``python doc/tutorials/hough_indexing.py``.
"""

import dataclasses
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.sampling import disorientation_angle

# %% Data + phase description. Hough indexing needs the candidate
# phase's reflector list (interplanar angles do the voting).
s = kp.data.nickel_ebsd_small()
pre = s.remove_static_background().remove_dynamic_background()
truth = s.xmap.best_rotations

from kikuchipy_tpu.crystallography.crystal_map import Phase

ni = Phase(
    name="ni",
    space_group=225,
    lattice=(0.35236, 0.35236, 0.35236, 90, 90, 90),
    atoms=[("Ni", 0, 0, 0)],
)

# %% Index. The indexer detects bands (n_bands strongest) in Radon
# space per pattern and votes orientations from band triplets.
xmap = pre.hough_indexing(phase_list=ni, n_bands=9)
ang = np.degrees(disorientation_angle(truth, xmap.best_rotations, "m-3m"))
print("hough error vs stored solutions (deg):", np.round(ang, 2))
assert np.median(ang) < 1.5
# Band-fit quality metrics are carried like the reference's xmap props:
assert "fit" in xmap.prop and "nbands" in xmap.prop
print("mean band fit (deg):", round(float(np.mean(xmap.prop["fit"])), 3))

# %% PC optimization from band geometry (the reference's
# ``hough_indexing_optimize_pc``): search (PCx, PCy, PCz) minimizing
# the angular misfit of detected bands to lattice planes.
det0 = dataclasses.replace(s.detector, pc=s.detector.pc_average)
det_opt = pre.hough_indexing_optimize_pc(
    pc0=det0.pc_average, phase_list=ni,
)
print("optimized PC:", np.round(np.asarray(det_opt.pc).ravel(), 4))
assert np.abs(np.asarray(det_opt.pc) - det0.pc).max() < 0.05

print("hough_indexing tutorial OK")
