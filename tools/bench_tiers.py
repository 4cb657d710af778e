"""One-off tier experiments for the DI headline on the real chip.

Times _index_resident variants at the bench.py problem size
(N=8192 x M=100k x D=3600, keep_n=20) with pipelined x4 dispatch and a
64-row readback (axon block_until_ready is a no-op; the device queue is
in-order). Run on the TPU (default JAX_PLATFORMS=axon); results feed
BENCH_NOTES.md and the bench.py tier list.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kikuchipy_tpu.indexing.di import PreparedDictionary, _index_resident
from kikuchipy_tpu.indexing.metrics import ncc

N, M, D, KEEP_N, REPS = 8192, 100_000, 3600, 20, 4

rng = np.random.default_rng(0)
exp_prepared = jax.block_until_ready(
    ncc.prepare(jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)), None)
)
prep = PreparedDictionary(
    prepared=jax.block_until_ready(
        ncc.prepare(jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)), None)
    )
)
dict_prepared = prep.prepared
dict_q, dict_scale = (jax.block_until_ready(a) for a in prep.quantized_int8())


def timed(precision, approx, tile):
    kw = (
        {"dict_q": dict_q, "dict_scale": dict_scale}
        if precision == "int8"
        else {}
    )

    def pass_once():
        t0 = time.perf_counter()
        outs = [
            _index_resident(
                exp_prepared, dict_prepared, KEEP_N, tile, precision, approx,
                **kw,
            )
            for _ in range(REPS)
        ]
        np.asarray(outs[-1][0][:64])
        np.asarray(outs[-1][1][:64])
        return time.perf_counter() - t0

    t_compile = pass_once()
    dt = min(pass_once() for _ in range(3))
    return REPS * N / dt, t_compile


configs = [
    ("default", False, 50_000),
    ("f16", False, 50_000),
    ("f16", False, 100_000),
    ("f16", True, 50_000),
    ("f16", False, 25_000),
    ("int8", False, 50_000),
    ("mixed", False, 50_000),
]
if len(sys.argv) > 1:
    want = set(sys.argv[1].split(","))
    configs = [c for c in configs if c[0] in want]

for precision, approx, tile in configs:
    try:
        pps, t_c = timed(precision, approx, tile)
        print(
            f"{precision:8s} approx={approx!s:5s} tile={tile:6d}: "
            f"{pps:9.0f} pps  (compile+first {t_c:.1f}s)",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 - survey run, report and move on
        print(f"{precision} approx={approx} tile={tile}: FAILED {e!r}", flush=True)
