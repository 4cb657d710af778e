"""Tutorial: pattern matching (dictionary indexing + refinement).

Mirrors the reference's ``doc/tutorials/pattern_matching.ipynb``: build
a dictionary of simulated patterns from a master pattern, match every
experimental pattern against it with normalized cross-correlation
(one MXU matmul + top-k on TPU), then refine orientations — and
optionally the projection center — by numerical optimization of the
NCC through the differentiable projector.

Run: ``python doc/tutorials/pattern_matching.py``.
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
from kikuchipy_tpu.crystallography.sampling import (
    disorientation_angle,
    sample_fundamental_zone,
)

# %% Experimental data: the nickel scan, preprocessed.
s = kp.data.nickel_ebsd_small()
pre = s.remove_static_background().remove_dynamic_background()
truth = s.xmap.best_rotations  # stored reference solutions

# %% The dictionary: sample the m-3m fundamental zone (here coarsely,
# 4 degrees, for speed; production uses 1.5-2.5 degrees) and project a
# pattern per orientation through the detector geometry.
mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="lambert", hemisphere="both"
)
det = dataclasses.replace(s.detector, pc=s.detector.pc_average)
# Resolution override keeps the tutorial fast under the test suite.
RES = float(os.environ.get("KP_TUTORIAL_RESOLUTION_DEG", "4.0"))
rot = sample_fundamental_zone(RES, "m-3m")
dic = mp.get_patterns(rot, det, dtype_out=np.float32)
print(f"dictionary: {rot.shape[0]} patterns at {RES} deg")

# %% Dictionary indexing: NCC against every dictionary entry, keep the
# best keep_n. Returns a CrystalMap carrying scores + entry indices.
xmap = pre.dictionary_indexing(dic, keep_n=20)
scores = np.asarray(xmap.prop["scores"])
sim_idx = np.asarray(xmap.prop["simulation_indices"])
print("top-1 NCC scores:", np.round(scores[:, 0], 3))
# Kinematical-vs-experimental NCC is modest in absolute terms — the
# reference's own DI benchmark pins ~0.1887 mean top score (at a
# coarser test resolution the nearest entry is farther, so lower).
assert (scores[:, 0] > (0.12 if RES <= 5 else 0.06)).all()
# Scores are sorted best-first:
assert (np.diff(scores, axis=1) <= 1e-6).all()

ang_di = np.degrees(
    disorientation_angle(truth, xmap.best_rotations, "m-3m")
)
print("DI error vs stored solutions (deg):", np.round(ang_di, 2))
assert np.median(ang_di) < 1.5 * RES  # bounded by the sampling

# %% Orientation refinement: batched Nelder-Mead (the reference's
# scipy default) over Euler perturbations, objective = 1 - NCC of the
# re-projected pattern. All map points optimize in lockstep on device.
res = pre.refine_orientation(
    xmap=xmap, detector=det, master_pattern=mp, energy=20,
    trust_region=[RES + 1] * 3, max_iters=60,
)
ang_ref = np.degrees(
    disorientation_angle(truth, res.xmap.best_rotations, "m-3m")
)
print("refined error (deg):", np.round(ang_ref, 2))
assert np.median(ang_ref) < np.median(ang_di)
assert res.xmap.prop["scores"].mean() >= scores[:, 0].mean() - 1e-6

# %% Projection-center refinement: optimize (PCx, PCy, PCz) per point
# (or jointly with orientation via
# ``refine_orientation_projection_center``).
res_pc = pre.refine_projection_center(
    xmap=res.xmap, detector=det, master_pattern=mp, energy=20,
    trust_region=[0.02, 0.02, 0.02], max_iters=30,
)
pc_ref = np.asarray(res_pc.detector.pc).reshape(-1, 3)
print("refined PC average:", np.round(pc_ref.mean(axis=0), 4))
assert np.abs(pc_ref.mean(axis=0) - det.pc.ravel()).max() < 0.05

# %% Faster/global solvers: the batched Levenberg-Marquardt through
# the spherical-harmonic projector is the production fast path, and
# the reference's global optimizers all have batched equivalents
# (method="differential_evolution" | "dual_annealing" |
# "basinhopping" | "shgo").
res_lm = pre.refine_orientation(
    xmap=xmap, detector=det, master_pattern=mp, energy=20,
    method="lm", trust_region=[RES + 1] * 3, max_iters=20,
)
ang_lm = np.degrees(
    disorientation_angle(truth, res_lm.xmap.best_rotations, "m-3m")
)
print("LM refined error (deg):", np.round(ang_lm, 2))
assert np.median(ang_lm) < np.median(ang_di)

print("pattern_matching tutorial OK")
