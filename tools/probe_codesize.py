"""Probe: which op inside the f16+approx DI pass inflates the TPU
binary to ~161 MB (round-4 combined executable: 165 MB, shipped
server-side at tunnel speed -> 953 s first execution, BENCH_r04)?

Compiles isolated variants on the real chip and prints
``memory_analysis().generated_code_size_in_bytes`` per variant — no
binary download needed. Run under `timeout` in the background; each
remote compile can take minutes.
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
from kikuchipy_tpu.indexing.di import _group_topk_T, _index_resident

D = 3600
M = 100_000
K = 20


def f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def report(name, fn, *avals):
    t = time.monotonic()
    try:
        compiled = jax.jit(fn).lower(*avals).compile()
        ma = compiled.memory_analysis()
        log(
            f"{name}: code={ma.generated_code_size_in_bytes / 1e6:.2f} MB "
            f"temp={ma.temp_size_in_bytes / 1e6:.1f} MB "
            f"peak={ma.peak_memory_in_bytes / 1e6:.1f} MB "
            f"(compile {time.monotonic() - t:.1f}s)"
        )
        return compiled
    except Exception as exc:
        log(f"{name}: FAILED {type(exc).__name__}: {exc} "
            f"({time.monotonic() - t:.1f}s)")
        return None


def main():
    log(f"devices: {jax.devices()}")

    # A: plain matmul, f16-materialized, checksum only
    def matmul_f16(exp, dic):
        simT = jnp.matmul(
            dic, exp.T, preferred_element_type=jnp.float32
        ).astype(jnp.float16)
        return simT.astype(jnp.float32).sum()

    report("A matmul_f16 N=16384", matmul_f16, f32(16384, D), f32(M, D))

    # B: matmul + transposed group-top-k (the f16+approx selection)
    def groupsel(exp, dic):
        simT = jnp.matmul(
            dic, exp.T, preferred_element_type=jnp.float32
        ).astype(jnp.float16)
        s, i = _group_topk_T(simT, K)
        return s.sum() + i.sum()

    report("B groupsel N=16384", groupsel, f32(16384, D), f32(M, D))
    report("C groupsel N=2048", groupsel, f32(2048, D), f32(M, D))

    # D: exact f32 top_k path
    def exact(exp, dic):
        sim = jnp.matmul(exp, dic.T, preferred_element_type=jnp.float32)
        s, i = jax.lax.top_k(sim, K)
        return s.sum() + i.sum()

    report("D exact-topk N=16384", exact, f32(16384, D), f32(M, D))

    # E: operand generation (bench's counter-hash PRNG)
    make_operands, gate_exact, main_fn, combined = bench._def_programs()

    def gen_only(seed):
        e, d = make_operands(seed)
        return e.sum() + d.sum()

    report("E make_operands", gen_only, jax.ShapeDtypeStruct((), jnp.int32))

    # F: production _index_resident f16+approx (the old `main` program)
    def prod(exp, dic):
        s, i = _index_resident(exp, dic, K, M, "f16", True)
        return s.sum() + i.sum()

    report("F _index_resident f16+approx N=16384", prod,
           f32(16384, D), f32(M, D))

    # G: 16-iteration scan of a small matmul (scan code scaling probe)
    def scan16(a, b):
        def body(c, k):
            return c + (a @ b)[0, 0] * k, None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(16, dtype=jnp.float32)
        )
        return out

    report("G scan16 small matmul", scan16, f32(512, 512), f32(512, 512))

    log("probe done")


if __name__ == "__main__":
    main()
