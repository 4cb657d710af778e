"""Probe 3: code size of reduce-free formulations of the per-group
top-2 (probe 2 pinned the 157 MB bloat on ANY major-axis reduce of the
(32, G, N) view, even a plain max; the transpose+topk tail is 2 MB).

Key identity: with interleaved groups (group b = columns {b, b+G, ...}),
group g's members are the CONTIGUOUS row block simT[g*G:(g+1)*G] of the
transposed score block — so the group top-2 is a streaming elementwise
fold over 32 static slices (maximum/select), no reduce op at all.
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
        return compiled
    except Exception as exc:
        log(f"{name}: FAILED {type(exc).__name__}: {exc} "
            f"({time.monotonic() - t:.1f}s)")
        return None


def simT_f16(exp, dic):
    return jnp.matmul(
        dic, exp.T, preferred_element_type=jnp.float32
    ).astype(jnp.float16)


def stream_top2(simT):
    """Streaming per-group top-2 over the 32 contiguous row blocks."""
    neg = jnp.asarray(-jnp.inf, simT.dtype)
    m1 = jnp.full((G, N), neg, simT.dtype)
    m2 = m1
    j1 = jnp.zeros((G, N), jnp.int32)
    j2 = j1
    for g in range(GROUP):
        blk = simT[g * G : (g + 1) * G]
        b1 = blk > m1
        b2 = ~b1 & (blk > m2)
        m2 = jnp.where(b1, m1, jnp.where(b2, blk, m2))
        j2 = jnp.where(b1, j1, jnp.where(b2, g, j2))
        m1 = jnp.where(b1, blk, m1)
        j1 = jnp.where(b1, g, j1)
    return m1, j1, m2, j2


def main():
    log(f"devices: {jax.devices()}")

    # R: contiguous middle-axis reduce (reshape (G, 32, N), axis 1)
    def r(exp, dic):
        sim3 = simT_f16(exp, dic)[: G * GROUP].reshape(G, GROUP, N)
        m1 = jnp.max(sim3, axis=1)
        return m1.astype(jnp.float32).sum()

    report("R contiguous mid-axis max f16", r, f32(N, D), f32(M, D))

    # T: streaming top-2 fold (values+indices), f16
    def t_fn(exp, dic):
        m1, j1, m2, j2 = stream_top2(simT_f16(exp, dic))
        return (
            m1.astype(jnp.float32).sum()
            + m2.astype(jnp.float32).sum()
            + j1.sum()
            + j2.sum()
        )

    report("T streaming top-2 f16", t_fn, f32(N, D), f32(M, D))

    # U: full selection = streaming top-2 + transpose/concat/top_k tail
    def u_fn(exp, dic):
        m1, j1, m2, j2 = stream_top2(simT_f16(exp, dic))
        lane = jnp.arange(G, dtype=jnp.int32)[None, :]
        cand_s = jnp.concatenate(
            [m1.T.astype(jnp.float32), m2.T.astype(jnp.float32)], axis=1
        )
        cand_i = jnp.concatenate(
            [j1.T * G + lane, j2.T * G + lane], axis=1
        )
        s, pos = jax.lax.top_k(cand_s, K)
        col = jnp.take_along_axis(cand_i, pos, axis=1)
        return s.sum() + col.sum()

    c = report("U full selection streaming f16", u_fn, f32(N, D), f32(M, D))

    # Timing check on U vs the old path: correctness + speed both matter.
    if c is not None:
        rng = np.random.default_rng(0)
        exp = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
        dic = jnp.asarray(rng.standard_normal((M, D), dtype=np.float32))
        out = c(exp, dic)
        float(np.asarray(out))  # warm
        t0 = time.perf_counter()
        outs = [c(exp, dic) for _ in range(4)]
        float(np.asarray(outs[-1]))
        dt = (time.perf_counter() - t0) / 4
        log(f"U per-pass: {dt * 1e3:.1f} ms ({4 * N / (time.perf_counter() - t0):.0f} pps-equivalent)")

    log("probe3 done")


if __name__ == "__main__":
    main()
