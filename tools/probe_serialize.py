"""Probe: can a compiled TPU executable be pickled in one process and
re-loaded in another WITHOUT recompiling (jax.experimental.
serialize_executable)? The axon backend ignores the local persistent
compilation cache (probe_cache.py: identical cache key, 384 s recompile
anyway), so shipping the serialized executable is the only way for
bench.py to avoid the remote compile service entirely.

Run: python tools/probe_serialize.py warm   # compile + serialize
     python tools/probe_serialize.py load   # deserialize + run + time
"""

import sys
import time
from pathlib import Path

import numpy as np

_T0 = time.monotonic()


def log(msg):
    print(f"[{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
from jax.experimental import serialize_executable as se

OUT = Path(__file__).resolve().parent.parent / ".jax_cache" / "probe_exec.pkl"


@jax.jit
def f(a, b):
    return jnp.tanh(a @ b) * 2.0 + 1.0


shapes = (
    jax.ShapeDtypeStruct((512, 512), jnp.float32),
    jax.ShapeDtypeStruct((512, 512), jnp.float32),
)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "warm"
    log(f"devices: {jax.devices()}")
    a = jnp.asarray(np.ones((512, 512), np.float32))
    b = jnp.asarray(np.full((512, 512), 2.0, np.float32))
    import pickle

    if mode == "warm":
        t = time.monotonic()
        lowered = f.lower(*shapes)
        compiled = lowered.compile()
        log(f"compile: {time.monotonic() - t:.1f}s")
        t = time.monotonic()
        payload = se.serialize(compiled)  # (bytes, in_tree, out_tree)
        OUT.write_bytes(pickle.dumps(payload))
        log(
            f"serialized {OUT.stat().st_size / 1e6:.2f} MB "
            f"in {time.monotonic() - t:.1f}s"
        )
        out = np.asarray(compiled(a, b))
        log(f"executed: out[0,0]={out[0, 0]}")
    else:
        t = time.monotonic()
        compiled = se.deserialize_and_load(*pickle.loads(OUT.read_bytes()))
        log(f"deserialize_and_load: {time.monotonic() - t:.1f}s")
        t = time.monotonic()
        out = np.asarray(compiled(a, b))
        log(
            f"execute+readback: {time.monotonic() - t:.1f}s, "
            f"out[0,0]={out[0, 0]} (expect tanh(1024)*2+1=3.0)"
        )


if __name__ == "__main__":
    main()
