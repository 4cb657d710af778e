"""Instrumented probe: time every stage of the bench's TPU path.

Writes elapsed-stamped lines to stderr so we can see exactly where the
driver-run bench spends (or loses) its wall clock. Run under `timeout`.
"""

import os
import sys
import time

_T0 = time.monotonic()


def log(msg: str) -> None:
    print(f"[{time.monotonic() - _T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


log("python start")
import numpy as np  # noqa: E402

log("numpy imported")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"jax imported; backend about to init")
devs = jax.devices()
log(f"devices: {devs}")

from kikuchipy_tpu.indexing.di import PreparedDictionary, _index_resident  # noqa: E402
from kikuchipy_tpu.indexing.metrics import ncc  # noqa: E402

log("kikuchipy_tpu imported")

N = int(os.environ.get("KP_BENCH_N", 16384))
M = int(os.environ.get("KP_BENCH_M", 100_000))
D = 3600
KEEP_N = 20
TILE = M

rng = np.random.default_rng(0)
exp_np = rng.normal(size=(N, D)).astype(np.float32)
dic_np = rng.normal(size=(M, D)).astype(np.float32)
log("host arrays made")

exp = jnp.asarray(exp_np)
np.asarray(exp[:1, :1])
log("exp transferred")
dic = jnp.asarray(dic_np)
np.asarray(dic[:1, :1])
log("dic transferred (1.44 GB)")

exp_prepared = ncc.prepare(exp, None)
np.asarray(exp_prepared[:1, :1])
log("exp prepared")
prep = PreparedDictionary(prepared=ncc.prepare(dic, None))
dict_prepared = prep.prepared
np.asarray(dict_prepared[:1, :1])
log("dict prepared")

for precision, approx in [("f16", True), ("default", False)]:
    t = time.monotonic()
    s, i = _index_resident(exp_prepared, dict_prepared, KEEP_N, TILE, precision, approx)
    np.asarray(s[:4])
    np.asarray(i[:4])
    log(f"_index_resident({precision}, approx={approx}) compile+run: "
        f"{time.monotonic() - t:.1f}s")
    t = time.monotonic()
    s, i = _index_resident(exp_prepared, dict_prepared, KEEP_N, TILE, precision, approx)
    np.asarray(s[:4])
    np.asarray(i[:4])
    dt = time.monotonic() - t
    log(f"_index_resident({precision}, approx={approx}) warm run: {dt:.2f}s "
        f"=> {N/dt:.0f} pps")

log("probe done")
