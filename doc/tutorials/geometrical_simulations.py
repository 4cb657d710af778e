"""Tutorial: geometrical EBSD simulations.

Mirrors the reference's
``doc/tutorials/geometrical_ebsd_simulations.ipynb``: project Kikuchi
band centre lines and zone axes onto the detector for known
orientations and draw them over the experimental patterns — the
standard sanity check that geometry, PC, and orientations agree.

Run: ``python doc/tutorials/geometrical_simulations.py``.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.reciprocal import (
    Lattice,
    ReciprocalLatticeVectors,
)
from kikuchipy_tpu.simulations import KikuchiPatternSimulator

# %% Data with stored orientations, and low-index nickel reflectors.
s = kp.data.nickel_ebsd_small().remove_static_background()
rots = s.xmap.best_rotations

lat = Lattice(3.52, 3.52, 3.52, 90, 90, 90)
rlv = ReciprocalLatticeVectors.from_min_dspacing(lat, 1.2)
rlv.calculate_structure_factor([("Ni", 0, 0, 0)], space_group=225)
rlv = rlv.allowed()
rlv.calculate_theta(20.0)

# %% Geometrical simulation for ALL scan points at once (vectorized
# matmuls over orientations): which bands/zone axes fall on the
# detector, and where.
sim = KikuchiPatternSimulator(rlv)
geo = sim.on_detector(s.detector, rots)

lines = geo.lines_coordinates(index=0)    # first scan point
assert lines.shape[-1] >= 4               # (x0, y0, x1, y1) per line
za = geo.zone_axes_coordinates(index=0)
print(f"point 0: {lines.shape[0]} band lines, {za.shape[0]} zone axes")
assert lines.shape[0] > 4                 # several bands per pattern
# A different orientation projects a different line set.
assert not np.array_equal(lines, geo.lines_coordinates(index=4))

# %% Per-point collections for plotting: matplotlib line collections /
# marker lists mirroring the reference's HyperSpy markers.
colls = geo.as_collections(index=0)
assert len(colls) >= 1
markers = geo.as_markers()
assert len(markers) > 0

# %% Overlay on the experimental pattern.
fig, ax = plt.subplots()
ax.imshow(np.asarray(s.data)[0, 0], cmap="gray")
geo.plot(index=0, ax=ax)
out = Path(os.environ.get("KP_TUTORIAL_OUT", ".")) / "geo_sim.png"
fig.savefig(out, dpi=100)
plt.close(fig)
assert out.exists()
print("wrote", out)

print("geometrical_simulations tutorial OK")
