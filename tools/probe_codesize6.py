"""Probe 6 (HISTORICAL): the ragged segment-form zyz pipeline REGRESSED
the refine binary (123 -> 385 MB; measured 113 MB for the rotation
alone — ragged 513-wide arrays scalarize every op). The segment form
was removed in favour of the padded-stack pipeline (probe 7: 9.35 MB
rotation, 41 MB residual+JVPs, 153 ms/call); this probe no longer runs
(the _seg functions are gone) and is kept as the measurement record."""

raise SystemExit(
    "probe_codesize6 is a historical record: the ragged segment form "
    "it measured was removed (see probe_codesize7.py for the shipped "
    "padded-stack pipeline's numbers)."
)

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import numpy as np

_T0 = time.monotonic()


def log(msg):
    print(f"[{time.monotonic() - _T0:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

import bench
from kikuchipy_tpu.geometry import quaternion as quat
from kikuchipy_tpu.indexing.refinement import (
    _residual_orientation_delta_sh,
    _unit_rows,
)
from kikuchipy_tpu.projection.spherical import (
    _rotate_zyz_preselected_seg,
    _synth_seg,
    wigner_tables,
)

N = 16384
SH_L = 80


def report(name, fn, *args):
    t = time.monotonic()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ma = compiled.memory_analysis()
        log(
            f"{name}: code={ma.generated_code_size_in_bytes / 1e6:.2f} MB "
            f"(compile {time.monotonic() - t:.1f}s)"
        )
    except Exception as exc:
        log(f"{name}: FAILED {type(exc).__name__}: {exc}")


def main():
    log(f"devices: {jax.devices()}")
    tables = wigner_tables(SH_L)
    bounds = tables.group_bounds
    nc = (SH_L + 1) ** 2

    def avalf(*s):
        return jax.ShapeDtypeStruct(s, jnp.float32)

    t_avals = tuple(
        jax.ShapeDtypeStruct(g.shape, jnp.float32) for g in tables.t_groups
    )

    # G1: seg rotation pipeline alone
    def g1(q, use_id, coeffs, t_groups, m_onehot, sigma):
        segs = _rotate_zyz_preselected_seg(
            q, use_id, coeffs, t_groups, m_onehot, sigma, SH_L, bounds,
            "default",
        )
        return sum(s.sum() for s in segs)

    report(
        "G1 seg rotation", g1, avalf(N, 4),
        jax.ShapeDtypeStruct((N,), jnp.bool_), avalf(nc), t_avals,
        avalf(SH_L + 1, nc), avalf(nc),
    )

    # G2: seg rotation + seg synthesis
    def g2(q, use_id, coeffs, t_groups, m_onehot, sigma, basis):
        segs = _rotate_zyz_preselected_seg(
            q, use_id, coeffs, t_groups, m_onehot, sigma, SH_L, bounds,
            "default",
        )
        return _synth_seg(segs, basis, bounds, jax.lax.Precision.DEFAULT).sum()

    report(
        "G2 seg rotation+synth", g2, avalf(N, 4),
        jax.ShapeDtypeStruct((N,), jnp.bool_), avalf(nc), t_avals,
        avalf(SH_L + 1, nc), avalf(nc), avalf(3600, nc),
    )

    # G3: one full residual + 3 JVPs (probe-4 C analog)
    def g3(q0, use_id, exp_unit, coeffs, t_groups, m_onehot, sigma, basis):
        def res_fn(x):
            return _residual_orientation_delta_sh(
                x, q0, use_id, exp_unit, coeffs, t_groups, m_onehot,
                sigma, basis, SH_L, bounds, "default",
            )

        x0 = jnp.zeros((N, 3), jnp.float32)
        acc = jnp.float32(0)
        for k in range(3):
            v = jnp.zeros_like(x0).at[:, k].set(1.0)
            _, jv = jax.jvp(res_fn, (x0,), (v,))
            acc = acc + jv.sum()
        return acc

    report(
        "G3 seg residual + 3 JVPs", g3, avalf(N, 4),
        jax.ShapeDtypeStruct((N,), jnp.bool_), avalf(N, 3600), avalf(nc),
        t_avals, avalf(SH_L + 1, nc), avalf(nc), avalf(3600, nc),
    )

    log("probe6 done")


if __name__ == "__main__":
    main()
