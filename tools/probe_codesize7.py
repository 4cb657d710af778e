"""Probe 7: code size of the PADDED-STACK zyz pipeline (the fix for
probe 4/6's 28 MB full-width / 113 MB ragged-segment pipelines)."""

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

from kikuchipy_tpu.indexing.refinement import (
    _residual_orientation_delta_sh,
)
from kikuchipy_tpu.projection.spherical import (
    _rotate_zyz_preselected_stack,
    _synth_stack,
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
        return compiled
    except Exception as exc:
        log(f"{name}: FAILED {type(exc).__name__}: {exc}")


def main():
    log(f"devices: {jax.devices()}")
    tables = wigner_tables(SH_L)
    bounds = tables.group_bounds
    nc = (SH_L + 1) ** 2
    t_stack, onehot_pad, sigma_pad = tables.device_arrays()
    log(f"stack: {t_stack.shape}, onehot {onehot_pad.shape}")

    def avalf(*s):
        return jax.ShapeDtypeStruct(s, jnp.float32)

    def aval_like(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    # H1: stacked rotation pipeline alone
    def h1(q, use_id, coeffs, t_stack, onehot_pad, sigma_pad):
        cst = _rotate_zyz_preselected_stack(
            q, use_id, coeffs, t_stack, onehot_pad, sigma_pad, SH_L,
            bounds, "default",
        )
        return cst.sum()

    report(
        "H1 stack rotation", h1, avalf(N, 4),
        jax.ShapeDtypeStruct((N,), jnp.bool_), avalf(nc),
        aval_like(t_stack), aval_like(onehot_pad), aval_like(sigma_pad),
    )

    # H2: full residual + 3 JVPs (probe-4 C analog: 118 MB full-width,
    # 370 MB segment)
    def h2(q0, use_id, exp_unit, coeffs, t_stack, onehot_pad, sigma_pad,
           basis):
        def res_fn(x):
            return _residual_orientation_delta_sh(
                x, q0, use_id, exp_unit, coeffs, t_stack, onehot_pad,
                sigma_pad, basis, SH_L, bounds, "default",
            )

        x0 = jnp.zeros((N, 3), jnp.float32)
        acc = jnp.float32(0)
        for k in range(3):
            v = jnp.zeros_like(x0).at[:, k].set(1.0)
            _, jv = jax.jvp(res_fn, (x0,), (v,))
            acc = acc + jv.sum()
        return acc

    c = report(
        "H2 stack residual + 3 JVPs", h2, avalf(N, 4),
        jax.ShapeDtypeStruct((N,), jnp.bool_), avalf(N, 3600), avalf(nc),
        aval_like(t_stack), aval_like(onehot_pad), aval_like(sigma_pad),
        avalf(3600, nc),
    )

    # Timing sanity: one residual+JVP pass wall time.
    if c is not None:
        rng = np.random.default_rng(0)
        q = rng.normal(size=(N, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        args = (
            jnp.asarray(q),
            jnp.ones(N, bool),
            jnp.asarray(rng.normal(size=(N, 3600)).astype(np.float32)),
            jnp.asarray(rng.normal(size=nc).astype(np.float32)),
            t_stack, onehot_pad, sigma_pad,
            jnp.asarray(rng.normal(size=(3600, nc)).astype(np.float32)),
        )
        out = c(*args)
        float(np.asarray(out))
        t0 = time.perf_counter()
        outs = [c(*args) for _ in range(3)]
        float(np.asarray(outs[-1]))
        dt = (time.perf_counter() - t0) / 3
        log(f"H2 per-call: {dt * 1e3:.1f} ms "
            f"(~{N / dt / 4:.0f} LM-iteration-equivalents pps)")

    log("probe7 done")


if __name__ == "__main__":
    main()
