"""Probe 9: wall-time breakdown of the production f16+approx DI pass
at driver shapes — how much of the ~145 ms/pass is the (precision-
gated, irreducible) f32-class matmul vs the selection machinery?

2*N*M*D = 11.8 TFLOP at the measured 109 TF/s f32-DEFAULT rate is
~108 ms, so the selection budget is the remainder.
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

N, M, D, K = bench.N, bench.M, bench.D, bench.KEEP_N


def timed(name, compiled, *args, k=8):
    out = compiled(*args)
    jax.tree.map(lambda x: None, out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [compiled(*args) for _ in range(k)]
        np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / k)
    log(f"{name}: {best * 1e3:.1f} ms/pass ({N / best:.0f} pps-equiv)")
    return best


def main():
    log(f"devices: {jax.devices()}")
    make_operands, *_ = bench._def_programs()
    exp, dic = jax.jit(make_operands)(np.int32(0))
    np.asarray(exp[:1, :1])
    log("operands ready")

    def f(fun, *avals):
        return jax.jit(fun).lower(*avals).compile()

    fe = jax.ShapeDtypeStruct((N, D), jnp.float32)
    fd = jax.ShapeDtypeStruct((M, D), jnp.float32)

    # 1. matmul only (f32 DEFAULT, f16 materialization, sum-consumed)
    def mm_only(e, d):
        simT = jnp.matmul(
            d, e.T, preferred_element_type=jnp.float32
        ).astype(jnp.float16)
        return simT.astype(jnp.float32).sum()

    t_mm = timed("matmul+f16-write only", f(mm_only, fe, fd), exp, dic)

    # 2. matmul + streaming fold (no tail top_k)
    def mm_fold(e, d):
        simT = jnp.matmul(
            d, e.T, preferred_element_type=jnp.float32
        ).astype(jnp.float16)
        G = M // 32
        neg = jnp.asarray(-jnp.inf, simT.dtype)
        m1 = jnp.full((G, N), neg, simT.dtype)
        m2 = m1
        j1 = jnp.zeros((G, N), jnp.int32)
        j2 = j1
        for g in range(32):
            blk = simT[g * G : (g + 1) * G]
            b1 = blk > m1
            b2 = ~b1 & (blk > m2)
            m2 = jnp.where(b1, m1, jnp.where(b2, blk, m2))
            j2 = jnp.where(b1, j1, jnp.where(b2, g, j2))
            m1 = jnp.where(b1, blk, m1)
            j1 = jnp.where(b1, g, j1)
        return (
            m1.astype(jnp.float32).sum()
            + m2.astype(jnp.float32).sum()
            + j1.sum()
            + j2.sum()
        )

    t_fold = timed("matmul + fold (no tail)", f(mm_fold, fe, fd), exp, dic)

    # 3. full production pass
    def full(e, d):
        return _index_resident(e, d, K, M, "f16", True)

    t_full = timed("full f16+approx pass", f(full, fe, fd), exp, dic)

    log(
        f"breakdown: matmul+write {t_mm * 1e3:.1f} | fold adds "
        f"{(t_fold - t_mm) * 1e3:.1f} | tail adds "
        f"{(t_full - t_fold) * 1e3:.1f} ms"
    )
    log("probe9 done")


if __name__ == "__main__":
    main()
