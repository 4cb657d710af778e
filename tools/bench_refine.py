"""LM-refinement throughput on the real chip (VERDICT r1 item 2: >=5k
pps at the reference benchmark accuracy criterion).

Uses the real 3x3 nickel patterns tiled to one 4096-point chunk with
~3-degree orientation perturbations (dictionary-indexing-quality
starts), method='lm'.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
from kikuchipy_tpu.crystallography.sampling import disorientation_angle
from kikuchipy_tpu.geometry import quaternion as quat

N = 4096

raw = kp.data.nickel_ebsd_small()
s0 = raw.remove_static_background().remove_dynamic_background()
base = np.asarray(s0.data).reshape(9, 60, 60)
stored = np.asarray(raw.xmap.best_rotations)
reps = -(-N // 9)
scan = np.tile(base, (reps, 1, 1))[:N]
truth = np.tile(stored, (reps, 1))[:N]

rng = np.random.default_rng(0)
axes = rng.normal(size=(N, 3))
axes /= np.linalg.norm(axes, axis=1, keepdims=True)
dq = np.asarray(quat.from_axis_angle(jnp.asarray(axes), np.deg2rad(2.0)))
start_rot = np.asarray(quat.multiply(jnp.asarray(dq), jnp.asarray(truth)))

mp = kp.data.nickel_ebsd_master_pattern_small(
    projection="lambert", hemisphere="both"
)
import dataclasses
det = dataclasses.replace(raw.detector, pc=raw.detector.pc_average.reshape(1, 3))
sig = kp.signals.EBSD(data=scan, detector=det)
xmap0 = CrystalMap(rotations=start_rot, shape=(N,))

for method in ("lm", "nm"):
    t0 = time.perf_counter()
    res = sig.refine_orientation(
        xmap=xmap0, detector=det, master_pattern=mp, energy=20,
        method=method, nav_chunk=None, trust_region=[6, 6, 6],
    )
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = sig.refine_orientation(
        xmap=xmap0, detector=det, master_pattern=mp, energy=20,
        method=method, nav_chunk=None, trust_region=[6, 6, 6],
    )
    dt = time.perf_counter() - t0
    ang = np.degrees(disorientation_angle(truth, res.xmap.best_rotations, "m-3m"))
    print(f"{method}: {N/dt:8.0f} pps (first incl compile {N/dt_first:.0f}) "
          f"max {ang.max():.3f} deg mean {ang.mean():.3f} "
          f"iters<= {int(np.max(res.xmap.prop['num_evals']))}", flush=True)
