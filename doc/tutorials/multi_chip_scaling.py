"""Tutorial: multi-chip scaling (TPU-native; no reference analogue).

The reference is single-host/threads-only; this framework scales over
a ``jax.sharding.Mesh`` with two axes — "scan" (data-parallel over
beam positions) and "dict" (model-parallel over dictionary entries) —
with the per-shard top-k merged by an ``all_gather`` collective over
ICI. The same code runs on real TPU slices and, as here, on a virtual
8-device CPU mesh.

Run: ``JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8
python doc/tutorials/multi_chip_scaling.py``.
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
from kikuchipy_tpu.crystallography.sampling import sample_fundamental_zone
from kikuchipy_tpu.parallel.mesh import (
    make_mesh,
    sharded_dictionary_index,
    sharded_fused_dictionary_index,
)

n_dev = len(jax.devices())
print(f"{n_dev} devices:", jax.devices())

# %% A mesh: scan x dict. With 8 devices, 4-way data parallelism over
# patterns x 2-way sharding of the dictionary.
n_dict = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
mesh = make_mesh(n_scan=n_dev // n_dict, n_dict=n_dict)
print("mesh:", dict(mesh.shape))

# %% Data + dictionary (tiny here; shapes are what matter).
s = kp.data.nickel_ebsd_small()
pre = s.remove_static_background().remove_dynamic_background()
mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="lambert", hemisphere="both"
)
det = dataclasses.replace(s.detector, pc=s.detector.pc_average)
rot = sample_fundamental_zone(8.0, "m-3m")
dic = mp.get_patterns(rot, det, dtype_out=np.float32)
pats = np.asarray(pre.data, np.float32).reshape(-1, 60, 60)

# %% Sharded DI: patterns shard over "scan", dictionary over "dict";
# each device matches its pattern shard against its dictionary shard
# and the running top-k merges across "dict" with one all_gather.
scores, idx = sharded_dictionary_index(
    pats, np.asarray(dic.data, np.float32), keep_n=10, mesh=mesh
)
print("sharded DI top-1 scores:", np.round(np.asarray(scores)[:, 0], 3))

# Identical to the single-device answer (collectives are exact):
xmap = pre.dictionary_indexing(dic, keep_n=10)
np.testing.assert_array_equal(
    np.asarray(idx), np.asarray(xmap.prop["simulation_indices"])
)

# %% Fused virtual-dictionary DI: don't materialize the dictionary at
# all — each device PROJECTS its dictionary shard from the (replicated)
# master pattern on the fly and matches it immediately. HBM footprint
# drops from O(dictionary) to O(tile).
import jax.numpy as jnp

from kikuchipy_tpu.projection.master_pattern import (
    direction_cosines_from_detector,
)

master = jnp.asarray(mp._hemispheres_at_energy(), jnp.float32)
npy, npx = master.shape[-2:]
# The fused path wants shard-divisible operand counts: a multiple of
# (32 * n_dict) rotations, and n divisible by the scan axis (the
# prepared-dictionary path above pads internally; here we trim).
m_v = (len(rot) // (32 * n_dict)) * 32 * n_dict
n_f = (len(pats) // mesh.shape["scan"]) * mesh.shape["scan"]
scores_f, idx_f = sharded_fused_dictionary_index(
    pats[:n_f].reshape(n_f, -1),
    np.asarray(rot)[:m_v],
    master,
    direction_cosines_from_detector(det),
    npx,
    npy,
    (npx - 1) / 2,
    keep_n=10,
    mesh=mesh,
)
# Winners agree with the materialized-dictionary run wherever the
# winning entry survived the multiple-of-32 truncation.
top1 = np.asarray(idx)[:n_f, 0]
keep = top1 < m_v
assert (np.asarray(idx_f)[keep, 0] == top1[keep]).all()

# %% Multi-host: the same mesh axes extend over processes (see
# ``kikuchipy_tpu.parallel.multihost``) — host-major data parallelism
# with zero-DCN dictionary matmuls; tests/_multihost_worker.py runs a
# real 2-process parity check.
print("multi_chip_scaling tutorial OK")
