"""Probe 5 (HISTORICAL): which op inside the FULL-WIDTH zyz rotation
pipeline accounted for its 28 MB of code (probe 4) — the measured
answer: the grouped-matmul concatenates (14.35 MB) and lane reverses
(4.28 MB), with a static-gather flip at 0.43 MB. The full-width
helpers it measured (_z_apply/_t_apply) were REPLACED by the
padded-stack pipeline (probe 7); this probe no longer runs and is kept
as the measurement record."""

raise SystemExit(
    "probe_codesize5 is a historical record: the full-width _z_apply/"
    "_t_apply it measured were replaced by the padded-stack pipeline "
    "(see probe_codesize7.py for the shipped form's numbers)."
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

from kikuchipy_tpu.projection.spherical import (
    _flip_blocks,
    _t_apply,
    _z_apply,
    wigner_tables,
)

L = 80
NC = (L + 1) * (L + 1)
N = 16384


def f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


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


def flip_index(L):
    idx = np.zeros(NC, np.int32)
    for l in range(L + 1):
        a, b = l * l, (l + 1) * (l + 1)
        idx[a:b] = np.arange(b - 1, a - 1, -1)
    return idx


def main():
    log(f"devices: {jax.devices()}")
    tables = wigner_tables(L)
    bounds = tables.group_bounds

    def f1(c):
        return _flip_blocks(c, L).sum()

    report("F1 _flip_blocks (81 lane reverses)", f1, f32(N, NC))

    idx = jnp.asarray(flip_index(L))

    def f2(c):
        return jnp.take(c, idx, axis=-1).sum()

    report("F2 flip via static gather", f2, f32(N, NC))

    def f3(c):
        return c[:, idx].sum()

    report("F3 flip via fancy index", f3, f32(N, NC))

    t_groups, m_onehot, sigma = tables.device_arrays()

    def f4(c):
        return _t_apply(c, t_groups, bounds, False, jax.lax.Precision.DEFAULT).sum()

    report("F4 _t_apply (grouped matmuls)", f4, f32(N, NC))

    def f5(c, t):
        return _z_apply(c, c, t, m_onehot, sigma).sum()

    report("F5 _z_apply (no flip)", f5, f32(N, NC), f32(N))

    log("probe5 done")


if __name__ == "__main__":
    main()
