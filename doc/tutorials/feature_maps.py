"""Tutorial: feature maps.

Mirrors the reference's ``doc/tutorials/feature_maps.ipynb``: image
quality (IQ), average neighbour dot-product (ADP) maps, neighbour
dot-product matrices, and the orientation similarity map (OSM) from
dictionary-indexing results — the standard grain/boundary contrast
maps computed from patterns alone.

Run: ``python doc/tutorials/feature_maps.py``.
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

s = kp.data.nickel_ebsd_small().remove_static_background()
s = s.remove_dynamic_background()

# %% Image quality (Krieger Lassen): 1 - inertia of the FFT power
# spectrum — sharp Kikuchi bands give higher IQ than diffuse patterns.
iq = np.asarray(s.get_image_quality())
print("IQ map:\n", np.round(iq, 3))
assert iq.shape == (3, 3)
assert 0.10 < iq.mean() < 0.25

# Without the frequency weighting ("normalize=False" analogue in the
# reference is frequency_vectors/inertia_max handling; here the flag):
iq_raw = np.asarray(s.get_image_quality(normalize=False))
assert iq_raw.shape == (3, 3)

# %% Average neighbour dot-product (ADP) map: the mean normalized dot
# product of each pattern with its 4-connected neighbours — low values
# trace grain boundaries.
adp = np.asarray(s.get_average_neighbour_dot_product_map())
print("ADP map:\n", np.round(adp, 3))
assert adp.shape == (3, 3)
assert (adp > 0).all() and (adp <= 1 + 1e-6).all()

# The full per-neighbour matrices (window footprint per point):
mats = np.asarray(s.get_neighbour_dot_product_matrices())
assert mats.shape[:2] == (3, 3)

# %% Orientation similarity map from DI results: how many of the top-n
# best-matching dictionary entries each point SHARES with its
# neighbours — a complementary, orientation-space boundary map.
mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="lambert", hemisphere="both"
)
from kikuchipy_tpu.crystallography.sampling import sample_fundamental_zone
import dataclasses

det = dataclasses.replace(s.detector, pc=s.detector.pc_average)
rot = sample_fundamental_zone(8.0, "m-3m")
dic = mp.get_patterns(rot, det, dtype_out=np.float32)
xmap = s.dictionary_indexing(dic, keep_n=10)

from kikuchipy_tpu.indexing import orientation_similarity_map

osm = orientation_similarity_map(xmap)
print("OSM:\n", np.round(np.asarray(osm), 2))
assert np.asarray(osm).shape == (3, 3)

print("feature_maps tutorial OK")
