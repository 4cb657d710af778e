"""Probe: does the JAX persistent compilation cache work with axon?

Run twice; if the second run's compile time collapses, the cache works
and bench.py can be pre-warmed so the driver's run never compiles.
"""

import sys
import time

_T0 = time.monotonic()


def log(msg):
    print(f"[{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

log(f"devices: {jax.devices()}")


@jax.jit
def f(a, b):
    return jnp.tanh(a @ b) * 2.0 + 1.0


a = jnp.asarray(np.ones((512, 512), np.float32))
b = jnp.asarray(np.ones((512, 512), np.float32))
log("inputs on device")
t = time.monotonic()
out = f(a, b)
host = np.asarray(out)
log(f"compile+run+readback: {time.monotonic() - t:.1f}s, out[0,0]={host[0, 0]}")
t = time.monotonic()
host = np.asarray(f(a, b))
log(f"warm run: {time.monotonic() - t:.2f}s")
