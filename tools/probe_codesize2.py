"""Probe 2: which op inside _group_topk_T scales code size with N
(160 MB at N=16384, 21 MB at N=2048 — probe_codesize.py)?"""

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

from kikuchipy_tpu.indexing.di import _group_topk_T, _index_resident

D = 3600
M = 100_000
K = 20
N = 16384
GROUP = 32
G = M // GROUP


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
            f"(compile {time.monotonic() - t:.1f}s)"
        )
    except Exception as exc:
        log(f"{name}: FAILED {type(exc).__name__}: {exc} "
            f"({time.monotonic() - t:.1f}s)")


def simT_f16(exp, dic):
    return jnp.matmul(
        dic, exp.T, preferred_element_type=jnp.float32
    ).astype(jnp.float16)


def main():
    log(f"devices: {jax.devices()}")

    # H: f32 selection + approx group-top-k (the "default"+approx tier)
    def h(exp, dic):
        s, i = _index_resident(exp, dic, K, M, "default", True)
        return s.sum() + i.sum()

    report("H _index_resident default+approx N=16384", h,
           f32(N, D), f32(M, D))

    # J: interleaved argmax+max only, f16
    def j(exp, dic):
        sim3 = simT_f16(exp, dic)[: G * GROUP].reshape(GROUP, G, N)
        j1 = jnp.argmax(sim3, axis=0)
        m1 = jnp.max(sim3, axis=0)
        return m1.astype(jnp.float32).sum() + j1.sum()

    report("J argmax+max f16", j, f32(N, D), f32(M, D))

    # K: argmax+max with f32 compute (cast at read)
    def k(exp, dic):
        sim3 = (
            simT_f16(exp, dic)[: G * GROUP]
            .reshape(GROUP, G, N)
            .astype(jnp.float32)
        )
        j1 = jnp.argmax(sim3, axis=0)
        m1 = jnp.max(sim3, axis=0)
        return m1.sum() + j1.sum()

    report("K argmax+max f32-read", k, f32(N, D), f32(M, D))

    # L: max only (no argmax), f16
    def l(exp, dic):
        sim3 = simT_f16(exp, dic)[: G * GROUP].reshape(GROUP, G, N)
        m1 = jnp.max(sim3, axis=0)
        return m1.astype(jnp.float32).sum()

    report("L max-only f16", l, f32(N, D), f32(M, D))

    # P: transpose of the compressed block + top_k + take_along_axis
    def p(m1, j1):
        lane = jnp.arange(G, dtype=jnp.int32)[None, :]
        cand_s = m1.T.astype(jnp.float32)
        cand_i = j1.T * G + lane
        s, pos = jax.lax.top_k(cand_s, K)
        col = jnp.take_along_axis(cand_i, pos, axis=1)
        return s.sum() + col.sum()

    report("P transpose+topk+gather", p,
           jax.ShapeDtypeStruct((G, N), jnp.float16),
           jax.ShapeDtypeStruct((G, N), jnp.int32))

    # Q: masked second-argmax alone (the where+argmax round), f16
    def q(exp, dic):
        sim3 = simT_f16(exp, dic)[: G * GROUP].reshape(GROUP, G, N)
        j1 = jnp.argmax(sim3, axis=0).astype(jnp.int32)
        gid = jnp.arange(GROUP, dtype=jnp.int32)[:, None, None]
        masked = jnp.where(
            gid == j1[None], jnp.asarray(-jnp.inf, sim3.dtype), sim3
        )
        j2 = jnp.argmax(masked, axis=0)
        m2 = jnp.max(masked, axis=0)
        return m2.astype(jnp.float32).sum() + j2.sum()

    report("Q masked 2nd argmax f16", q, f32(N, D), f32(M, D))

    log("probe2 done")


if __name__ == "__main__":
    main()
