"""Tutorial: kinematical EBSD simulations.

Mirrors the reference's
``doc/tutorials/kinematical_ebsd_simulations.ipynb``: build reciprocal
lattice vectors with structure factors from a crystal description,
accumulate band intensities into a kinematical master pattern, and
project detector patterns from it. (Kinematical intensities are
qualitatively useful; for quantitative work use dynamically simulated
master patterns, e.g. EMsoft's, as the other tutorials do.)

Run: ``python doc/tutorials/kinematical_simulations.py``.
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
from kikuchipy_tpu.crystallography.crystal_map import Phase
from kikuchipy_tpu.crystallography.reciprocal import (
    Lattice,
    ReciprocalLatticeVectors,
)
from kikuchipy_tpu.simulations import KikuchiPatternSimulator

# %% Reflectors for FCC nickel: {hkl} families above a minimum
# d-spacing, kinematical structure factors from the atom basis (the
# space-group expansion applies centering/glide extinctions), and
# Bragg angles at 20 kV.
lat = Lattice(3.52, 3.52, 3.52, 90, 90, 90)
rlv = ReciprocalLatticeVectors.from_min_dspacing(lat, 1.2)
rlv.calculate_structure_factor([("Ni", 0, 0, 0)], space_group=225)
rlv = rlv.allowed()        # drop extinct reflections
rlv.calculate_theta(20.0)  # Bragg angles

hkl = np.abs(np.asarray(rlv.hkl))
fams = {tuple(sorted(r, reverse=True)) for r in hkl.tolist()}
print("reflector families:", sorted(fams, reverse=True))
# FCC: all-even or all-odd indices only.
parity_ok = [(np.all(r % 2 == 0) or np.all(r % 2 == 1)) for r in hkl]
assert all(parity_ok)

# %% The kinematical master pattern: each sphere direction accumulates
# the structure-factor intensity of every band it falls inside
# (within the Bragg angle of a reflector's plane).
sim = KikuchiPatternSimulator(rlv)
mp = sim.calculate_master_pattern(
    half_size=120, hemisphere="both", scaling="linear"
)
print("master pattern:", mp.data.shape, mp.data.dtype)
assert mp.data.shape[-2:] == (241, 241)

# %% Project detector patterns from the kinematical master pattern at
# arbitrary orientations — the same projector the dictionary and
# refinement engines use.
det = kp.detectors.EBSDDetector(
    shape=(60, 60), pc=(0.42, 0.21, 0.50), sample_tilt=70
)
rot = np.array([[1.0, 0, 0, 0], [0.97, 0.15, 0.15, 0.1]], np.float64)
rot /= np.linalg.norm(rot, axis=1, keepdims=True)
mp_lambert = mp.as_lambert()
pats = mp_lambert.get_patterns(rot, det, dtype_out=np.float32)
assert pats.data.shape == (2, 60, 60)
arr = np.asarray(pats.data)
assert np.isfinite(arr).all() and arr.std() > 0

# %% Scaling modes match the reference: linear |F|, square |F|^2, or
# None (binary bands).
mp_sq = sim.calculate_master_pattern(half_size=60, scaling="square")
assert mp_sq.data.shape[-2:] == (121, 121)

print("kinematical_simulations tutorial OK")
