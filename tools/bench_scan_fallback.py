"""Measure the lax.scan DI fallback at wafer-class dictionary sizes
(VERDICT r4 item 6: the >_MAX_UNROLL_TILES path had a correctness test
but no hardware number).

Past 32 full tiles ``_index_resident`` switches from the unrolled
static-slice loop to a ``lax.scan`` with a carried top-k (BASELINE
config 5's m~1e6-class dictionaries). Largest resident config on one
16 GB v5e chip: m=500k x 3600 f32 (7.2 GB) + operands; tile=12500
gives 40 tiles -> scan path. Compare against the unrolled path at the
same shapes (tile=15625, 32 tiles).

Run on the TPU: ``python tools/bench_scan_fallback.py``; record the
figures in BENCH_NOTES.md.
"""

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

from kikuchipy_tpu.indexing.di import _index_resident

N = 4096
M = 500_000
D = 3600
K = 20


def main():
    log(f"devices: {jax.devices()}")

    @jax.jit
    def gen(seed):
        def u(base, n):
            x = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(base)
            x = x ^ (jnp.uint32(seed) * jnp.uint32(0x9E3779B9))
            x = x * jnp.uint32(2654435761)
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x7FEB352D)
            x = x ^ (x >> 15)
            return x.astype(jnp.float32) / jnp.float32(2**31) - 1.0

        def prep(v):
            v = v - v.mean(axis=1, keepdims=True)
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        return (
            prep(u(0, N * D).reshape(N, D)),
            prep(u(1 << 29, M * D).reshape(M, D)),
        )

    exp, dic = gen(0)
    float(np.asarray(exp[0, 0]))
    log("operands generated on device (7.9 GB)")

    for name, tile in (("scan-fallback (40 tiles)", 12500),
                       ("unrolled (32 tiles)", 15625)):
        fn = jax.jit(
            lambda e, d, t=tile: _index_resident(e, d, K, t, "f16", True)
        )
        t0 = time.monotonic()
        s, i = fn(exp, dic)
        np.asarray(s[0, 0])
        log(f"{name}: first call (compile) {time.monotonic() - t0:.1f}s")
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(exp, dic) for _ in range(2)]
            np.asarray(outs[-1][0][0, 0])
            best = min(best, (time.perf_counter() - t0) / 2)
        log(f"{name}: {N / best:.0f} patterns/s ({best * 1e3:.1f} ms/pass, "
            f"{2 * N * M * D / best / 1e12:.1f} TF/s effective)")


if __name__ == "__main__":
    main()
