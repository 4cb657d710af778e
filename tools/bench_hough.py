"""Hough-indexing throughput on the real chip (VERDICT r2 item 7:
>=10k patterns/s warm at the existing <=1 degree accuracy gate).

Real 3x3 nickel patterns tiled to one large batch; the full pipeline
(fused Radon x butterfly matmul -> NMS + sub-bin refinement -> triplet
voting -> iterated weighted-Kabsch refit) through the public
``hough_indexing``. Accuracy is gated against the scan's stored
(DI + refined) solutions; returns 0.0 on gate failure.
"""

import dataclasses
import time

import numpy as np


def bench_hough(n: int = 8192, verbose: bool = False) -> float:
    import jax.numpy as jnp

    import kikuchipy_tpu as kp
    from kikuchipy_tpu.crystallography.crystal_map import Phase
    from kikuchipy_tpu.crystallography.sampling import disorientation_angle

    ni = Phase(
        "ni",
        space_group=225,
        lattice=(3.5236, 3.5236, 3.5236, 90.0, 90.0, 90.0),
        atoms=[
            ("ni", 0, 0, 0),
            ("ni", 0.5, 0.5, 0),
            ("ni", 0.5, 0, 0.5),
            ("ni", 0, 0.5, 0.5),
        ],
    )
    raw = kp.data.nickel_ebsd_small()
    s0 = raw.remove_static_background().remove_dynamic_background()
    base = np.asarray(s0.data).reshape(9, 60, 60)
    truth = np.tile(np.asarray(raw.xmap.best_rotations), (-(-n // 9), 1))[:n]
    scan = np.tile(base, (-(-n // 9), 1, 1))[:n]
    det = dataclasses.replace(
        raw.detector, pc=raw.detector.pc_average.reshape(1, 3)
    )
    sig = kp.signals.EBSD(data=jnp.asarray(scan), detector=det)

    t0 = time.perf_counter()
    xmap = sig.hough_indexing(phase_list=ni, n_bands=9)
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    xmap = sig.hough_indexing(phase_list=ni, n_bands=9)
    dt = time.perf_counter() - t0

    ang = np.degrees(
        disorientation_angle(truth, xmap.best_rotations, "m-3m")
    )
    ok = float(ang.max()) < 1.0
    if verbose:
        print(
            f"hough: {n / dt:8.0f} pps (first incl compile "
            f"{n / dt_first:.0f}) max {ang.max():.3f} deg "
            f"accuracy_ok={ok}",
            flush=True,
        )
    return n / dt if ok else 0.0


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    bench_hough(n, verbose=True)
