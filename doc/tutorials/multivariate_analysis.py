"""Tutorial: multivariate analysis (PCA denoising).

Mirrors the reference's ``doc/tutorials/multivariate_analysis.ipynb``:
decompose the pattern stack into principal components and reconstruct
a denoised model from the leading ones (the reference inherits
HyperSpy's machinery; here the SVD runs as one batched device op).

Run: ``python doc/tutorials/multivariate_analysis.py``.
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

# %% A noisy scan: the nickel patterns + synthetic Gaussian noise.
s0 = kp.data.nickel_ebsd_small().remove_static_background()
rng = np.random.default_rng(1)
noisy = np.clip(
    np.asarray(s0.data).astype(np.float32)
    + rng.normal(scale=24.0, size=s0.data.shape),
    0, 255,
).astype(np.uint8)
s = kp.signals.EBSD(
    data=noisy, detector=s0.detector, static_background=s0.static_background
)

# %% Decompose. Results land on ``learning_results`` (factors,
# loadings, explained variance) like the reference/HyperSpy.
s.decomposition(algorithm="SVD", output_dimension=9)
lr = s.learning_results
assert lr.factors.shape == (9, 60 * 60)  # (components, d)
assert lr.loadings.shape == (9, 9)       # (n_patterns, components)
evr = np.asarray(lr.explained_variance_ratio)
print("explained variance ratio:", np.round(evr[:4], 3))
assert evr[0] > evr[1] > evr[2]

# %% Reconstruct a denoised model from the first few components. The
# 9-point nickel map has ~3 grains, so ~4 components carry the signal.
model = s.get_decomposition_model(components=4)
assert model.data.shape == s.data.shape

# The model must be closer to the CLEAN patterns than the noisy input:
clean = np.asarray(s0.data, dtype=np.float32)


def rms(a):
    return float(np.sqrt(np.mean((np.asarray(a, np.float32) - clean) ** 2)))


rms_noisy, rms_model = rms(noisy), rms(model.data)
print(f"RMS vs clean: noisy {rms_noisy:.1f} -> model {rms_model:.1f}")
assert rms_model < rms_noisy

print("multivariate_analysis tutorial OK")
