"""Pre-compile bench.py's production DI program and serialize the
executable to ``.jax_cache/bench_di_exec.pkl`` (committed to the repo).

The axon backend ignores the local persistent compilation cache (every
compile goes to a remote service: ~6 min even for trivial programs on
a bad day), so shipping the serialized executable is the only reliable
way for the driver's ``bench.py`` run to measure without waiting on
the compile service. ``bench.py --worker`` validates the stored
metadata (jax version, device kind, benchmark shape) and falls back to
a live AOT compile on mismatch.

Run on the target machine: ``python tools/warm_bench_exec.py``.
"""

import json
import pickle
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
from jax.experimental import serialize_executable as se

import bench
from kikuchipy_tpu.indexing.di import _index_resident


def main() -> None:
    out = bench._EXEC_PKL
    out.parent.mkdir(exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)
    t = time.monotonic()
    lowered = _index_resident.lower(
        jax.ShapeDtypeStruct((bench.N, bench.D), jnp.float32),
        jax.ShapeDtypeStruct((bench.M, bench.D), jnp.float32),
        keep_n=bench.KEEP_N, tile=bench.TILE,
        precision=bench.PRECISION, approx=bench.APPROX,
    )
    compiled = lowered.compile()
    print(f"compile() returned in {time.monotonic() - t:.1f}s", flush=True)
    # compile() can return before the remote service has produced the
    # binary (observed: trivial program "compiled" in 0.5 s but its
    # first execution took 323 s); force one execution so the
    # serialized payload definitely contains the final executable.
    import numpy as np

    t = time.monotonic()
    ze = jax.device_put(np.zeros((bench.N, bench.D), np.float32))
    zd = jax.device_put(np.zeros((bench.M, bench.D), np.float32))
    print(f"zero operands uploaded in {time.monotonic() - t:.1f}s", flush=True)
    t = time.monotonic()
    s, i = compiled(ze, zd)
    np.asarray(s)
    print(f"first execution in {time.monotonic() - t:.1f}s", flush=True)
    payload = se.serialize(compiled)  # (bytes, in_tree, out_tree)
    out.write_bytes(pickle.dumps(payload))
    meta = {
        "jax": jax.__version__,
        "device": jax.devices()[0].device_kind,
        "shape": [
            bench.N, bench.M, bench.D, bench.KEEP_N, bench.TILE,
            bench.PRECISION, bench.APPROX,
        ],
    }
    out.with_suffix(".meta.json").write_text(json.dumps(meta))
    print(
        f"wrote {out} ({out.stat().st_size / 1e6:.2f} MB) + metadata {meta}",
        flush=True,
    )


if __name__ == "__main__":
    main()
