"""Tutorial: visualizing patterns.

Mirrors the reference's ``doc/tutorials/visualizing_patterns.ipynb``:
navigator maps for browsing a scan, RGB navigators, geometrical-
simulation marker overlays, the detector/sample geometry plots, and
the master-pattern sphere (matplotlib stand-in for the reference's
pyvista view — this environment is headless).

Run: ``python doc/tutorials/visualizing_patterns.py``.
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

s = kp.data.nickel_ebsd_small().remove_static_background()

# %% Navigator maps: browse the scan by image quality (default), mean
# intensity, or any custom per-point image.
fig = s.plot(navigator="iq", return_figure=True)
assert fig is not None
plt.close(fig)

# %% RGB navigators: encode e.g. three VBSE channels as one RGB image
# (the reference's kp.draw.get_rgb_navigator).
from kikuchipy_tpu.draw import get_rgb_navigator
from kikuchipy_tpu.imaging import VirtualBSEImager

imager = VirtualBSEImager(s)
imager.grid_shape = (3, 3)
rgb = imager.get_rgb_image(r=(0, 1), g=(1, 1), b=(2, 1))
nav = get_rgb_navigator(rgb)
assert nav.shape == (3, 3, 3)

# %% Marker overlays from a geometrical simulation (band centre lines
# + zone axes over the pattern).
from kikuchipy_tpu.crystallography.reciprocal import (
    Lattice,
    ReciprocalLatticeVectors,
)
from kikuchipy_tpu.simulations import KikuchiPatternSimulator

lat = Lattice(3.52, 3.52, 3.52, 90, 90, 90)
rlv = ReciprocalLatticeVectors.from_min_dspacing(lat, 1.4)
rlv.calculate_structure_factor([("Ni", 0, 0, 0)], space_group=225)
rlv = rlv.allowed()
rlv.calculate_theta(20.0)
geo = KikuchiPatternSimulator(rlv).on_detector(
    s.detector, s.xmap.best_rotations
)
fig, ax = plt.subplots()
ax.imshow(np.asarray(s.data)[0, 0], cmap="gray")
geo.plot(index=0, ax=ax)
plt.close(fig)

# %% Where is a pattern in the map? (reference
# ``kp.draw.plot_pattern_positions_in_map``)
from kikuchipy_tpu.draw import plot_pattern_positions_in_map

fig = plot_pattern_positions_in_map(
    rc=np.array([[0, 0], [2, 1]]), roi_shape=(3, 3), return_figure=True
)
assert fig is not None
plt.close(fig)

# %% Detector-sample geometry: the side/top views showing tilts, PC
# and the pattern footprint.
from kikuchipy_tpu.draw import plot_detector_sample_geometry

fig = plot_detector_sample_geometry(s.detector, return_figure=True)
assert fig is not None
plt.close(fig)

# %% Master-pattern sphere (mpl stand-in for pyvista plot_spherical).
mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="stereographic", hemisphere="both"
)
fig = mp.plot_spherical(return_figure=True)
assert fig is not None
plt.close(fig)

print("visualizing_patterns tutorial OK")
