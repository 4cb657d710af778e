"""End-to-end BASELINE config-4 pipeline bench (BENCH_NOTES.md table).

Synthetic 75k-pattern scan (the real 3x3 nickel scan tiled — the real
nickel_ebsd_large is download-backed and not in-package), ~3-degree m-3m
dictionary, one chip. Stages:

1. preprocess (static + dynamic background removal, uint8 in/out)
2. FUSED dictionary indexing: the dictionary is projected tile-by-tile
   ON DEVICE inside the matching loop (``dictionary_index(project_fn=
   ...)``) — the dictionary never exists on the host, removing round 1's
   942-pps host-readback dictionary-generation stage (VERDICT r1 item 4)
3. orientation refinement with the batched Levenberg-Marquardt solver
   (method="lm"; VERDICT r1 item 2)

Accuracy gate: refined orientations within 0.8 deg of the stored truth
(the reference benchmark criterion,
/root/reference/benchmarks/indexing/test_refinement.py:85).

Run on the TPU (default JAX_PLATFORMS=axon):
    PYTHONPATH=/root/repo python tools/bench_e2e.py [n_patterns]
"""

import sys
import time

import numpy as np

t_start = time.perf_counter()

import jax
import jax.numpy as jnp

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
from kikuchipy_tpu.crystallography.sampling import (
    disorientation_angle,
    sample_fundamental_zone,
)
from kikuchipy_tpu.indexing.di import dictionary_index

N_TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 75_000


def stage(name, t0):
    dt = time.perf_counter() - t0
    print(f"{name:38s} {dt:8.1f} s", flush=True)
    return dt


def main() -> None:
    import dataclasses

    # --- Load + tile the real scan to N_TARGET patterns -------------
    t0 = time.perf_counter()
    raw = kp.data.nickel_ebsd_small()
    base = np.asarray(raw.data).reshape(9, 60, 60)
    stored_rot = np.asarray(raw.xmap.best_rotations)
    reps = -(-N_TARGET // 9)
    scan = np.tile(base, (reps, 1, 1))[:N_TARGET]
    truth = np.tile(stored_rot, (reps, 1))[:N_TARGET]
    n = scan.shape[0]
    print(f"scan: {n} patterns (3x3 nickel tiled)", flush=True)
    t_load = stage("load + tile", t0)

    # --- 1. preprocess ----------------------------------------------
    t0 = time.perf_counter()
    static_bg = jnp.asarray(raw.static_background)
    from kikuchipy_tpu.ops import pattern as ops

    @jax.jit
    def preprocess(x):
        x = ops.remove_static_background(x, static_bg)
        x = ops.remove_dynamic_background(x)
        return x

    chunk = 8192
    pre = np.empty((n, 60, 60), dtype=np.uint8)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        block = scan[s:e]
        if e - s < chunk:  # pad to one compiled shape
            block = np.concatenate(
                [block, np.zeros((chunk - (e - s), 60, 60), block.dtype)]
            )
        pre[s:e] = np.asarray(preprocess(jnp.asarray(block)))[: e - s]
    t_pre = stage("preprocess (static+dynamic bg)", t0)

    # --- 2. fused dictionary indexing --------------------------------
    t0 = time.perf_counter()
    mp = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    det = dataclasses.replace(
        raw.detector, pc=raw.detector.pc_average.reshape(1, 3)
    )
    rotations = sample_fundamental_zone(3.0, "m-3m")
    m = rotations.shape[0]
    project_fn = mp.projector(det, energy=20)
    print(f"dictionary: {m} orientations (virtual, on-device)", flush=True)

    res = dictionary_index(
        pre.reshape(n, -1).astype(np.float32),
        project_fn=project_fn,
        rotations=jnp.asarray(rotations, dtype=jnp.float32),
        keep_n=1,
        n_per_iteration=4096,
    )
    di_rot = np.asarray(rotations)[res.simulation_indices[:, 0]]
    t_di = stage(f"fused DI {n} x {m}", t0)
    print(f"  -> {n / t_di:.0f} pps incl. on-device dict projection")

    # --- 3. LM refinement --------------------------------------------
    t0 = time.perf_counter()
    s_sig = kp.signals.EBSD(data=pre, detector=det)
    xmap0 = CrystalMap(rotations=di_rot, shape=(n,))
    ref = s_sig.refine_orientation(
        xmap=xmap0,
        detector=det,
        master_pattern=mp,
        energy=20,
        method="lm",
        nav_chunk=4096,
    )
    t_ref = stage("LM orientation refinement", t0)
    print(f"  -> {n / t_ref:.0f} pps")

    ang = np.degrees(
        disorientation_angle(truth, ref.xmap.best_rotations, "m-3m")
    )
    total = time.perf_counter() - t_start
    print(f"refined max disorientation: {ang.max():.3f} deg "
          f"(mean {ang.mean():.3f})")
    print(f"{'TOTAL':38s} {total:8.1f} s  ({n / total:.0f} pps end-to-end)")
    assert ang.max() < 0.8, "accuracy gate failed"


if __name__ == "__main__":
    main()
