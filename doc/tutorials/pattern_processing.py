"""Tutorial: pattern processing.

The EBSD signal-to-noise chain, mirroring the reference's
``doc/tutorials/pattern_processing.ipynb``: static background removal,
dynamic (per-pattern) background removal, FFT filtering, adaptive
histogram equalization, neighbour averaging, and intensity rescaling —
all running as batched, jit-compiled TPU kernels under the hood
(``kikuchipy_tpu.ops.pattern``).

Run: ``python doc/tutorials/pattern_processing.py`` (CPU or TPU).
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

# %% Load the nickel test scan (3x3 navigation points, 60x60 pixels).
s = kp.data.nickel_ebsd_small()
print("scan:", s.navigation_shape, s.signal_shape, s.data.dtype)
assert s.data.dtype == np.uint8

# %% Static background: the detector's fixed intensity landscape,
# acquired alongside the scan. Subtracting it (the default) removes
# vignetting; each pattern is then rescaled to the full uint8 range.
s1 = s.remove_static_background()  # operation="subtract"
assert np.asarray(s1.data).min() >= 0 and np.asarray(s1.data).max() == 255

# Division is the other reference-supported mode.
s1_div = s.remove_static_background(operation="divide")
assert s1_div.data.shape == s.data.shape

# %% Dynamic background: the slowly-varying diffuse background UNIQUE
# to each pattern, estimated with a Gaussian low-pass (sigma defaults
# to width/8) and removed per pattern. On TPU the Gaussian blur runs as
# two small dense matmuls (separable plan), not FFTs.
s2 = s1.remove_dynamic_background()
print("after backgrounds: contrast span",
      int(np.asarray(s2.data).max()) - int(np.asarray(s2.data).min()))

# The background itself is also directly accessible:
bg = s1.get_dynamic_background()
assert bg.data.shape == s1.data.shape

# %% FFT filtering with transfer-function windows: e.g. suppress the
# highest frequencies with a Gaussian low-pass.
from kikuchipy_tpu.filters import Window, lowpass_fft_filter

w = Window("gaussian", std=8, shape=(60, 60))
assert w.is_valid
s3 = s2.fft_filter(
    transfer_function=lowpass_fft_filter(
        shape=(60, 60), cutoff=22, cutoff_width=10
    ),
    function_domain="frequency",
    shift=True,
)
assert s3.data.dtype == np.uint8

# %% Adaptive histogram equalization spreads local contrast (CLAHE;
# kernel defaults to a quarter of the pattern).
s4 = s2.adaptive_histogram_equalization()
# Equalization flattens the intensity histogram: the median moves
# toward the middle of the range.
assert 96 <= np.median(np.asarray(s4.data)) <= 160

# %% Neighbour averaging trades navigation resolution for SNR: each
# pattern becomes a window-weighted average of its neighbours.
s5 = s2.average_neighbour_patterns(window="gaussian", std=1)
assert s5.data.shape == s2.data.shape

# %% Downsampling bins detector pixels (and rescales intensity).
s6 = s2.downsample(2)
assert s6.signal_shape == (30, 30)

# %% Intensity rescaling / normalization with percentile clipping.
s7 = s2.rescale_intensity(percentiles=(1, 99))
assert s7.data.dtype == np.uint8
sf = s2.normalize_intensity(dtype_out=np.float32)
arr = np.asarray(sf.data).reshape(9, -1)
np.testing.assert_allclose(arr.mean(axis=1), 0.0, atol=1e-4)

print("pattern_processing tutorial OK")
