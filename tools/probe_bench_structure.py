"""Probe 8: which measurement structure is fastest for the DI bench
with the streaming selection (round-5)?

Round-4's on-device scan of 16 chained passes captured 81.6k pps while
probe 3's host-pipelined single-pass calls measured 108.7k — with
small binaries the 'one big program' rationale is gone, so measure:

A. combined scan-16 (current bench.py program);
B. gen once + single-pass program, 8 host-pipelined calls/window;
C. combined with a 4-pass scan;
D. single-pass program WITHOUT the per-pass input tweak (pure).

Also times the SH-LM refinement through the library path
(tools/bench_refine_sh.py) to compare against the bench refine
program's captured figure.
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

import bench
from kikuchipy_tpu.indexing.di import _index_resident

N, M, D, K, TILE = bench.N, bench.M, bench.D, bench.KEEP_N, bench.TILE


def main():
    log(f"devices: {jax.devices()}")
    make_operands, gate_exact, main_fn, combined = bench._def_programs()

    # A: current combined (scan 16)
    cA = combined.lower(jax.ShapeDtypeStruct((), np.int32)).compile()
    out = cA(np.int32(0))
    float(np.asarray(out[0]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [cA(np.int32(0)) for _ in range(3)]
        float(np.asarray(outs[-1][0]))
        best = min(best, time.perf_counter() - t0)
    log(f"A scan-16 combined: {3 * 16 * N / best:.0f} pps")

    # B: gen once + host-pipelined single-pass calls
    cGen = make_operands.lower(jax.ShapeDtypeStruct((), np.int32)).compile()
    exp, dic = cGen(np.int32(0))
    f = jax.ShapeDtypeStruct((N, D), jnp.float32)
    g = jax.ShapeDtypeStruct((M, D), jnp.float32)
    cMain = main_fn.lower(f, g).compile()
    s, i = cMain(exp, dic)
    np.asarray(s[0, 0])
    for k_pipe in (4, 8, 16):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [cMain(exp, dic) for _ in range(k_pipe)]
            np.asarray(outs[-1][0][0, 0])
            best = min(best, time.perf_counter() - t0)
        log(f"B host-pipelined x{k_pipe}: {k_pipe * N / best:.0f} pps")

    # C: 4-pass scan variant
    import functools

    @jax.jit
    def combined4(seed):
        exp, dic = make_operands(seed)

        def body(carry, k):
            acc, _, _ = carry
            e = exp.at[0, 0].add(jnp.float32(1e-7) * k)
            s, i = _index_resident(e, dic, K, TILE, "f16", True)
            return (acc + s[0, 0].astype(jnp.float32), s, i), None

        s_shape, i_shape = jax.eval_shape(
            lambda e, d: _index_resident(e, d, K, TILE, "f16", True),
            exp, dic,
        )
        init = (
            jnp.float32(0.0),
            jnp.zeros(s_shape.shape, s_shape.dtype),
            jnp.zeros(i_shape.shape, i_shape.dtype),
        )
        (acc, s, i), _ = jax.lax.scan(
            body, init, jnp.arange(4, dtype=jnp.float32)
        )
        return acc, s, i

    cC = combined4.lower(jax.ShapeDtypeStruct((), np.int32)).compile()
    out = cC(np.int32(0))
    float(np.asarray(out[0]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [cC(np.int32(0)) for _ in range(6)]
        float(np.asarray(outs[-1][0]))
        best = min(best, time.perf_counter() - t0)
    log(f"C scan-4 combined x6: {6 * 4 * N / best:.0f} pps")

    # D: single pass without the tweak copy (is exp.at[0,0].add the cost?)
    @jax.jit
    def scan16_notweak(seed):
        exp, dic = make_operands(seed)

        def body(carry, k):
            acc, _, _ = carry
            s, i = _index_resident(exp, dic, K, TILE, "f16", True)
            return (acc + s[0, 0].astype(jnp.float32) * k, s, i), None

        s_shape, i_shape = jax.eval_shape(
            lambda e, d: _index_resident(e, d, K, TILE, "f16", True),
            exp, dic,
        )
        init = (
            jnp.float32(0.0),
            jnp.zeros(s_shape.shape, s_shape.dtype),
            jnp.zeros(i_shape.shape, i_shape.dtype),
        )
        (acc, s, i), _ = jax.lax.scan(
            body, init, jnp.arange(16, dtype=jnp.float32)
        )
        return acc, s, i

    cD = scan16_notweak.lower(jax.ShapeDtypeStruct((), np.int32)).compile()
    out = cD(np.int32(0))
    float(np.asarray(out[0]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [cD(np.int32(0)) for _ in range(3)]
        float(np.asarray(outs[-1][0]))
        best = min(best, time.perf_counter() - t0)
    log(f"D scan-16 no-tweak: {3 * 16 * N / best:.0f} pps "
        "(if much faster than A, the per-pass 236 MB exp copy is the cost)")

    # Refinement library path for comparison
    from tools.bench_refine_sh import bench_refine_sh

    pps = bench_refine_sh(verbose=True)
    log(f"library SH-LM refinement: {pps:.0f} pps")

    log("probe8 done")


if __name__ == "__main__":
    main()
