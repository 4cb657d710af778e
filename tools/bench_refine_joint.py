"""Joint (orientation + PC) refinement: SH fast tier vs the
gather-bound bilinear path on the chip (VERDICT r4 item 4's
throughput leg).

Real nickel patterns tiled to one chunk, 2-degree orientation
perturbations + 0.01 PC offset; both paths run
``refine_orientation_projection_center(method="lm")``; steady state =
the second call of each. Accuracy: disorientation vs stored truth and
final bilinear-NCC scores must match between paths.
"""

import dataclasses
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import numpy as np


def main(n: int = 4096):
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
    dq = np.asarray(quat.from_axis_angle(jnp.asarray(axes), np.deg2rad(2.0)))
    start_rot = np.asarray(quat.multiply(jnp.asarray(dq), jnp.asarray(truth)))

    mp = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    pc_true = raw.detector.pc_average
    det = dataclasses.replace(
        raw.detector, pc=(pc_true + np.array([0.01, -0.01, 0.008])).reshape(1, 3)
    )
    sig = kp.signals.EBSD(data=jnp.asarray(scan), detector=det)
    xmap0 = CrystalMap(rotations=start_rot, shape=(n,))
    kw = dict(
        xmap=xmap0, detector=det, master_pattern=mp, energy=20,
        method="lm", max_iters=30, trust_region=[4, 4, 4, 0.03, 0.03, 0.03],
    )

    for name, extra in (
        ("bilinear", {}),
        ("spherical", dict(projector="spherical", sh_L=80)),
    ):
        t0 = time.perf_counter()
        res = sig.refine_orientation_projection_center(**kw, **extra)
        dt_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = sig.refine_orientation_projection_center(**kw, **extra)
        dt = time.perf_counter() - t0
        ang = np.degrees(
            disorientation_angle(truth, res.xmap.best_rotations, "m-3m")
        )
        pc_avg = np.asarray(res.detector.pc).reshape(-1, 3).mean(axis=0)
        print(
            f"joint {name:9s}: {n / dt:8.0f} pps steady "
            f"(first incl compile {n / dt_first:.0f}) "
            f"ang max {ang.max():.3f} mean {ang.mean():.3f} deg, "
            f"pc_avg {np.round(pc_avg, 4)} (true {np.round(pc_true, 4)}), "
            f"score mean {np.mean(np.asarray(res.xmap.prop['scores'])):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
