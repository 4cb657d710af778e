"""Tutorial: virtual backscatter electron (VBSE) imaging.

Mirrors the reference's
``doc/tutorials/virtual_backscatter_electron_imaging.ipynb``: integrate
detector regions of interest across the scan to form images — one per
detector-grid tile, an arbitrary-ROI intensity image, or an RGB image
from three ROIs (each ROI acts as a differently-placed BSE diode).

Run: ``python doc/tutorials/virtual_backscatter_imaging.py``.
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
import numpy as np

import kikuchipy_tpu as kp
from kikuchipy_tpu.imaging import VirtualBSEImager

s = kp.data.nickel_ebsd_small()

# %% Arbitrary-ROI intensity image straight from the signal: integrate
# a detector window (row0, row1, col0, col1) per navigation point.
img = np.asarray(s.get_virtual_bse_intensity((20, 40, 20, 40)))
assert img.shape == (3, 3)
print("ROI VBSE image:\n", np.round(img / img.max(), 3))

# %% The imager grids the detector into tiles (default 5x5).
imager = VirtualBSEImager(s)
imager.grid_shape = (3, 3)
print("grid tile ROI (row 1, col 2):", imager.roi_from_grid((1, 2)))

# One VBSE image per tile:
imgs = imager.get_images_from_grid()
assert imgs.shape[:2] == (3, 3)  # grid
assert imgs.shape[2:] == (3, 3)  # navigation

# %% RGB image: pick one tile per channel; channel intensities are
# percentile-clipped and stretched independently.
rgb = imager.get_rgb_image(r=(0, 0), g=(1, 1), b=(2, 2))
assert rgb.shape == (3, 3, 3) and rgb.dtype == np.uint8

# %% Grid overview plot (matplotlib figure).
fig = imager.plot_grid(rgb_channels=[(0, 0), (1, 1), (2, 2)])
assert fig is not None

print("virtual_backscatter_imaging tutorial OK")
