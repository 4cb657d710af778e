"""Hough indexing and geometrical simulation on the nickel dataset.

Demonstrates the dictionary-free path: Radon band detection -> triplet
voting -> orientations, then overlays the geometrical simulation of the
solved orientation on the pattern. Runs on CPU or TPU.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # The axon sitecustomize force-overrides jax_platforms at
    # interpreter start; honor the explicitly requested env value so
    # JAX_PLATFORMS=cpu really runs on CPU.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.reciprocal import (
    Lattice,
    ReciprocalLatticeVectors,
)
from kikuchipy_tpu.simulation.kikuchi_pattern_simulator import (
    KikuchiPatternSimulator,
)

# 1. Load and preprocess the in-package nickel scan.
s = kp.data.nickel_ebsd_small()
s = s.remove_static_background().remove_dynamic_background()

# 2. Hough indexing with a phase built from first principles (the
#    space-group expansion applies extinction rules automatically).
from kikuchipy_tpu.crystallography.crystal_map import Phase

ni = Phase(
    "ni", space_group=225, lattice=(3.52, 3.52, 3.52, 90, 90, 90),
    atoms=[("Ni", 0, 0, 0)],
)
xmap = s.hough_indexing(phase_list=ni, n_bands=9)
print("Hough orientations (quaternions):")
print(np.round(xmap.best_rotations, 4))
print("band fit (deg):", np.round(xmap.prop["fit"], 3))

# 3. Geometrical simulation at the first solved orientation.
lat = Lattice(3.52, 3.52, 3.52, 90, 90, 90)
rlv = ReciprocalLatticeVectors.from_min_dspacing(lat, 1.0)
rlv.calculate_structure_factor([("Ni", 0, 0, 0)], space_group=225)
rlv = rlv.allowed()
rlv.calculate_theta(20.0)
sim = KikuchiPatternSimulator(rlv)
geo = sim.on_detector(s.detector, xmap.best_rotations[:1])
print(f"simulated {geo.lines_coordinates().shape[0]} visible band lines on the detector")

# 4. Optional plot (writes PNG when matplotlib is available).
try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(np.asarray(s.data)[0, 0], cmap="gray")
    geo.plot(index=0, ax=ax)
    fig.savefig("hough_solution.png", dpi=120)
    print("wrote hough_solution.png")
except Exception as exc:  # pragma: no cover
    print("plot skipped:", exc)
