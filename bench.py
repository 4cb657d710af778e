"""Benchmark: dictionary-indexing throughput (patterns/sec/chip).

Mirrors BASELINE.json's headline metric: NCC dictionary indexing of
60x60 patterns against a 100k-entry dictionary (plus secondary
preprocess MB/s and refinement patterns/s figures when time allows).
The baseline is the reference's CPU execution model (threaded float32
matmul + top-k, as in ``/root/reference/src/kikuchipy/indexing/
_dictionary_indexing.py:130-139``) measured on a dictionary subsample —
the reference itself is not runnable in this image (hyperspy/numba
absent).

Survival architecture (VERDICT r3 item 1 — the driver captured no
number in rounds 2-3; post-mortem in this round found WHY: the axon
backend ignores the local persistent compilation cache, every compile
goes to a remote service that on a bad day takes ~6 min for even a
trivial program, and a signal-based in-process deadline cannot fire
while the main thread is blocked inside that compile):

- PARENT/CHILD split. The parent (this file, default mode) spawns the
  worker (``--worker``) in its own process group, polls a status file,
  and at the deadline (``KP_BENCH_BUDGET_S``, default 1020 s) SIGKILLs
  the group and prints the latest measured JSON line. The parent never
  touches jax, so nothing can block it; it always exits 0.
- PRECOMPILED EXECUTABLES: the worker loads the committed programs
  (``.jax_cache/bench_{combined,gate}_exec.pkl``, built in-repo by
  ``tools/warm_bench_exec.py`` via
  jax.experimental.serialize_executable, content-hash-validated).
  Fallback on mismatch: live compiles, bounded by the parent deadline.
- ONE program on the critical path: even a deserialized executable
  pays a first-execution cost proportional to its size (the runtime
  ships the binary at tunnel speed; the compile-service cache goes
  cold in ~10 min, so pre-warming cannot span the driver boundary).
  The ``combined`` program is generation + REPS_DEVICE chained DI
  passes in one executable.
- TRANSFER-FREE measurement: operands are GENERATED ON DEVICE (the
  tunnel has been measured as low as ~0.5-2.4 MB/s — the former
  1.7 GB operand upload took 12 minutes on a bad day); completion is
  an 8-byte checksum readback. The figure is validated by a host
  mini-gate on real readbacks (planted-match top-1 + scores vs host
  dot products) before it is written, then by the exact f32-HIGHEST
  on-device gate over all keep_n ranks.
- The primary DI figure is durable from the first timing pass;
  later passes/stages only update it (the parent prints the newest).
- Secondary stages (SH refinement, preprocess MB/s) are always
  attempted after the figure is durable; a slow compile there is cut
  off by the parent deadline, losing only the extras.

Measurement model: production DI indexes a scan as many batches, so
the steady-state number is pipelined batch throughput — 3 pipelined
executions of REPS_DEVICE on-device chained passes each, one
completion readback (device execution is in-order). Generation,
dispatch, and the readback RTT are all inside the measured wall.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "patterns/s", "vs_baseline": N}``
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("KP_BENCH_BUDGET_S", "1020"))
_REPO = Path(__file__).resolve().parent

# Benchmark configuration (shared by tools/warm_bench_exec.py so the
# serialized executable matches exactly).
N = int(os.environ.get("KP_BENCH_N", 16384))    # patterns per batch
M = int(os.environ.get("KP_BENCH_M", 100_000))  # dictionary entries
SY = SX = 60
D = SY * SX
KEEP_N = 20
TILE = M          # single tile: one matmul + one selection
REPS = 4          # pipelined batches per host-dispatched timing pass
REPS_DEVICE = 16  # chained DI passes inside the combined program
N_GATE = min(256, N)
PRECISION, APPROX = "f16", True  # persisted winner (BENCH_NOTES r2)


def _log(msg: str) -> None:
    print(f"[bench {time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------
# Parent: deadline supervisor. No jax imports here.
# --------------------------------------------------------------------

def supervise() -> None:
    status = _REPO / ".bench_status.json"
    try:
        status.unlink()
    except FileNotFoundError:
        pass
    child = subprocess.Popen(
        [sys.executable, str(Path(__file__).resolve()), "--worker", str(status)],
        start_new_session=True,
    )

    last_printed = [None]

    def print_newest() -> None:
        """Print the newest figure the moment it exists (re-printed on
        every update; the driver takes the LAST line) — so the figure
        survives even an external timeout shorter than our deadline."""
        try:
            text = status.read_text()
            line = json.loads(text)
        except (FileNotFoundError, json.JSONDecodeError):
            return
        if text != last_printed[0]:
            last_printed[0] = text
            print(json.dumps(line), flush=True)

    def reap(signum=None, frame=None) -> None:
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()
        print_newest()
        if last_printed[0] is None:
            _log("no figure was measured")
        os._exit(0)

    # An external `timeout` TERMs only this parent; flush the figure
    # and clean up the worker before dying.
    signal.signal(signal.SIGTERM, reap)
    signal.signal(signal.SIGINT, reap)

    deadline = _T0 + _BUDGET_S
    while True:
        done = child.poll() is not None
        print_newest()
        if done:
            break
        if time.monotonic() >= deadline:
            _log("deadline reached; killing worker process group")
            reap()
        time.sleep(2.0)
    print_newest()
    if last_printed[0] is None:
        _log("no figure was measured before the deadline")


# --------------------------------------------------------------------
# Worker: measurement. Written defensively — any exception after the
# first status write still leaves a valid figure for the parent.
# --------------------------------------------------------------------

def _baseline_cpu_pps() -> float:
    """Reference-style CPU DI throughput (patterns/s) via NumPy BLAS on
    a dictionary subsample, scaled to the full dictionary size."""
    rng = np.random.default_rng(0)
    n, m_sub = 256, 8192
    exp = rng.standard_normal((n, D), dtype=np.float32)
    dic = rng.standard_normal((m_sub, D), dtype=np.float32)

    def one_pass():
        t0 = time.perf_counter()
        scores = exp @ dic.T
        part = np.argpartition(-scores, KEEP_N, axis=1)[:, :KEEP_N]
        np.take_along_axis(scores, part, axis=1)
        return time.perf_counter() - t0

    one_pass()
    dts = sorted(one_pass() for _ in range(3))
    return n * m_sub / dts[1] / M


class _Status:
    def __init__(self, path: Path):
        self.path = path
        self.state = {
            "pps": 0.0, "vs_baseline": 0.0, "config": "",
            "pre_mbps": 0.0, "refine_pps": 0.0,
        }

    def write(self) -> None:
        s = self.state
        if s["pps"] <= 0:
            return
        extras = ""
        if s["pre_mbps"]:
            extras += (
                f"; preprocess {s['pre_mbps']:.0f} MB/s/chip uint8 "
                "static+dynamic bg"
            )
        if s["refine_pps"]:
            extras += (
                f"; refinement {s['refine_pps']:.0f} patterns/s/chip "
                "LM spherical-harmonic <0.8deg"
            )
        line = {
            "metric": (
                f"dictionary-indexing patterns/s/chip "
                f"(NCC, {M}-entry 60x60 dict, keep_n={KEEP_N}, "
                f"{s['config']}, 3x{REPS_DEVICE} chained passes incl. "
                f"dispatch{extras})"
            ),
            "value": round(s["pps"], 2),
            "unit": "patterns/s",
            "vs_baseline": round(s["vs_baseline"], 2),
        }
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(line))
        tmp.replace(self.path)

    def clear(self) -> None:
        self.state["pps"] = 0.0
        try:
            self.path.unlink()
        except FileNotFoundError:
            pass


def _program_hash() -> str:
    """Content hash tying the serialized executables to the EXACT
    program sources: this file's program definitions and the
    production DI kernel module. A changed kernel invalidates the
    pickles (live compiles instead), so the bench can never silently
    measure a stale executable of an old production path."""
    import hashlib
    import inspect

    import kikuchipy_tpu.indexing.di as di

    h = hashlib.md5()
    h.update(inspect.getsource(_def_programs).encode())
    h.update(Path(di.__file__).read_bytes())
    return h.hexdigest()


def _expected_meta():
    import jax

    return {
        "jax": jax.__version__,
        "device": jax.devices()[0].device_kind,
        "shape": [N, M, D, KEEP_N, TILE, PRECISION, APPROX, N_GATE],
        "programs": _program_hash(),
    }


def _load_precompiled(name: str):
    """Deserialize a committed executable (``.jax_cache/bench_<name>_
    exec.pkl``); None if absent or incompatible (jax/device/shape
    metadata checked, shared across the three bench programs)."""
    import pickle

    from jax.experimental import serialize_executable as se

    pkl = _REPO / ".jax_cache" / f"bench_{name}_exec.pkl"
    try:
        meta = json.loads(
            (_REPO / ".jax_cache" / "bench_exec.meta.json").read_text()
        )
        expect = _expected_meta()
        if meta != expect:
            _log(f"executable metadata mismatch: {meta} != {expect}")
            return None
        t = time.monotonic()
        compiled = se.deserialize_and_load(*pickle.loads(pkl.read_bytes()))
        _log(f"{name} executable loaded in {time.monotonic() - t:.1f}s")
        return compiled
    except FileNotFoundError:
        return None
    except Exception as exc:
        _log(f"{name} executable load failed: {type(exc).__name__}: {exc}")
        return None


# --------------------------------------------------------------------
# The three device programs (also AOT-compiled + serialized by
# tools/warm_bench_exec.py). Operands are GENERATED ON DEVICE: the
# tunnel in this environment has been measured as low as ~2 MB/s, so
# uploading the 1.7 GB operands could alone exceed the driver's
# budget; generation + an on-device exact gate reference make the
# bench transfer-free (only keep_n results and two 3.7 MB validation
# slices ever cross the link).
# --------------------------------------------------------------------

def _planted_indices() -> np.ndarray:
    """Dictionary rows that receive noisy copies of the first N_GATE
    experimental patterns (stride layout matches the original host
    construction ``dic[:: M // N_GATE][:N_GATE]``)."""
    return np.arange(N_GATE) * (M // N_GATE)


def _def_programs():
    import jax
    import jax.numpy as jnp

    from kikuchipy_tpu.indexing.di import _index_resident

    def _uniform(base: int, seed, shape):
        """Counter-hash uniforms in [-1, 1) (murmur3-style finalizer
        over DISJOINT counter ranges per array — an offset-overlapping
        stream would plant phantom shifted-copy correlations between
        the operands). Chosen over jax.random's threefry NOT for speed
        of execution (threefry runs this size in ~0.1 s) but for
        COMPILE cost: the remote compile service charges by HLO
        complexity, and this is a handful of fused elementwise ops.
        Statistical quality beyond decorrelation is irrelevant to a
        matmul benchmark."""
        n = int(np.prod(shape))
        seed_u = jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        x = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(base)
        x = x ^ seed_u
        x = x * jnp.uint32(2654435761)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return (x.astype(jnp.float32) / jnp.float32(2**31) - 1.0).reshape(
            shape
        )

    @jax.jit
    def make_operands(seed):
        """Generate + NCC-prepare both operand sets on device. Gate
        rows get planted matches: production patterns have a clear
        best match (NCC ~0.8 with a large margin), unlike pure white
        noise where top-1 margins (~1e-4) sit below f16 rounding."""
        exp = _uniform(0, seed, (N, D))
        dic = _uniform(1 << 29, seed, (M, D))
        noise = _uniform(1 << 31, seed, (N_GATE, D))
        idx = jnp.asarray(_planted_indices())
        dic = dic.at[idx].set(exp[:N_GATE] + 0.7 * noise)

        def prep(x):
            x = x - x.mean(axis=1, keepdims=True)
            return x / jnp.linalg.norm(x, axis=1, keepdims=True)

        return prep(exp), prep(dic)

    @jax.jit
    def gate_exact(exp_prepared, dict_prepared):
        """Exact (f32 HIGHEST + exact top-k) reference scores for the
        gate rows — the on-device stand-in for the old host reference
        (itself cross-checked against a host readback, see work())."""
        return _index_resident(
            exp_prepared[:N_GATE], dict_prepared, KEEP_N, TILE,
            "highest", False,
        )

    @jax.jit
    def main(exp_prepared, dict_prepared):
        return _index_resident(
            exp_prepared, dict_prepared, KEEP_N, TILE, PRECISION, APPROX
        )

    @jax.jit
    def combined(seed):
        """The whole primary measurement as ONE program — the remote
        compile service charges a large, size-independent cost PER
        PROGRAM (measured 230-900 s regardless of complexity, even
        for a deserialized executable whose server-side cache entry
        has gone cold), so the critical path to a figure must compile
        exactly once. Generates operands, then runs REPS_DEVICE
        chained DI passes; each pass's input gets an index-dependent
        1e-7 tweak and contributes to a checksum so XLA can neither
        hoist the passes as loop-invariant nor dead-code the
        non-final ones. Returns (checksum, last scores/indices,
        operands) — everything except the scalar checksum stays on
        device; the host times the call end-to-end by reading the
        checksum (8 bytes, tunnel-proof) and divides by
        REPS_DEVICE * N (conservative: the wall includes generation,
        dispatch, and the readback)."""
        exp, dic = make_operands(seed)

        def body(carry, k):
            acc, _, _ = carry
            e = exp.at[0, 0].add(jnp.float32(1e-7) * k)
            s, i = _index_resident(e, dic, KEEP_N, TILE, PRECISION, APPROX)
            return (acc + s[0, 0].astype(jnp.float32), s, i), None

        # Zeros-init with the DI pass's exact output structure
        # (eval_shape: abstract, no second compiled copy of the pass —
        # an unrolled init pass doubled the executable, and the
        # first-execution cost of a DESERIALIZED executable is
        # proportional to its size: the runtime ships the binary to
        # the server at ~tunnel speed).
        s_shape, i_shape = jax.eval_shape(
            lambda e, d: _index_resident(
                e, d, KEEP_N, TILE, PRECISION, APPROX
            ),
            exp, dic,
        )
        init = (
            jnp.float32(0.0),
            jnp.zeros(s_shape.shape, s_shape.dtype),
            jnp.zeros(i_shape.shape, i_shape.dtype),
        )
        (acc, s, i), _ = jax.lax.scan(
            body, init, jnp.arange(REPS_DEVICE, dtype=jnp.float32)
        )
        return acc, s, i, exp, dic

    return make_operands, gate_exact, main, combined


def work(status_path: Path) -> None:
    status = _Status(status_path)

    import jax

    _log(f"devices: {jax.devices()}")

    make_operands, gate_exact, main, combined = _def_programs()
    run_combined = _load_precompiled("combined") or combined
    gate_fn = _load_precompiled("gate") or gate_exact
    if run_combined is combined:
        _log("no committed executables; live remote compiles ahead "
             "(the parent deadline bounds the damage)")

    base_pps = _baseline_cpu_pps()
    _log(f"CPU baseline: {base_pps:.1f} patterns/s")

    # Critical path = ONE program (see combined in _def_programs):
    # even a deserialized executable pays one server-side step at its
    # first execution when the compile service's cache has gone cold
    # (measured: 434 s cold, 0.1 s warm, size-independent), so the
    # first figure depends on exactly one such step. The exact-gate
    # program (keep_n-depth validation) runs AFTER the figure is
    # durable; the figure itself is validated by a host-side top-1
    # gate on real readbacks.
    seed = np.int32(0)

    def combined_call(k_pipelined: int = 1):
        """Enqueue k back-to-back executions (the device queue is
        in-order) and read the LAST checksum: one tunnel round-trip
        amortized over k * REPS_DEVICE passes — the RTT alone is
        0.1-1 s when the tunnel degrades, which would otherwise
        pollute a ~2 s measurement."""
        t0 = time.perf_counter()
        outs = [run_combined(seed) for _ in range(k_pipelined)]
        float(np.asarray(outs[-1][0]))  # 8-byte completion readback
        acc, s, i, exp, dic = outs[-1]
        return time.perf_counter() - t0, (s, i, exp, dic)

    dt, outs = combined_call()
    _log(f"combined program's first execution: {dt:.1f}s")
    best_dt = np.inf
    for _ in range(3):
        dt, outs = combined_call(k_pipelined=3)
        best_dt = min(best_dt, dt)
    s_dev, i_dev, exp_prepared, dict_prepared = outs
    best = 3 * REPS_DEVICE * N / best_dt
    _log(f"steady-state: {best:.0f} patterns/s "
         f"(3x{REPS_DEVICE} on-device passes, incl. generation+dispatch)")

    # Host mini-gate on REAL readbacks: the planted rows must win
    # top-1 and their scores must match host dot products of the
    # actual prepared operands (bounds generation + preparation + the
    # selection matmul; 1e-3 covers the f16 materialization, 2.44e-4).
    planted = _planted_indices()
    s = np.asarray(s_dev[:N_GATE])
    i = np.asarray(i_dev[:N_GATE])
    exp_g = np.asarray(exp_prepared[:N_GATE])
    dic_g = np.asarray(dict_prepared[planted])
    host_planted = np.einsum("ij,ij->i", exp_g, dic_g)
    norms_ok = (
        np.abs(np.linalg.norm(exp_g, axis=1) - 1).max() < 1e-5
        and np.abs(np.linalg.norm(dic_g, axis=1) - 1).max() < 1e-5
    )
    mini_ok = bool(
        norms_ok
        and (i[:, 0] == planted).all()
        and np.abs(s[:, 0] - host_planted).max() < 1e-3
    )
    _log(f"host mini-gate (top-1 + planted scores): {'OK' if mini_ok else 'FAILED'}")

    def timed_pps() -> float:
        """Exact-tier fallback timing: REPS host-pipelined batches,
        completion via the last (small) result readback."""
        t0 = time.perf_counter()
        outs = [run(exp_prepared, dict_prepared) for _ in range(REPS)]
        np.asarray(outs[-1][0])
        np.asarray(outs[-1][1])
        return REPS * N / (time.perf_counter() - t0)

    config = f"precision={PRECISION}, approx_topk={APPROX}"
    if mini_ok:
        status.state["config"] = config
        status.state["pps"] = best
        status.state["vs_baseline"] = best / base_pps
        status.write()  # PRIMARY FIGURE DURABLE
        _log(
            f"primary DI figure: {best:.0f} patterns/s "
            f"({best / base_pps:.0f}x baseline)"
        )

    # Full exact gate (f32-HIGHEST + exact top-k on device, itself
    # cross-checked against the host planted scores): validates all
    # keep_n ranks. One more first-execution; the figure above stays
    # durable even if the parent's deadline lands here.
    ref_scores, ref_idx = (np.asarray(x) for x in
                           gate_fn(exp_prepared, dict_prepared))
    err_ref = np.abs(host_planted - ref_scores[:, 0]).max()
    if not ((ref_idx[:, 0] == planted).all() and err_ref < 1e-4):
        _log("exact gate reference inconsistent with host — "
             "keeping the mini-gated figure, skipping extras")
        return

    def gate_ok(s, i):
        return bool(
            (i[:N_GATE, 0] == ref_idx[:, 0]).all()
            and np.abs(s[:N_GATE] - ref_scores).max() < 1e-3
        )

    gate = gate_ok(s, i)
    _log(f"exact gate ({PRECISION}+approx, all {KEEP_N} ranks): "
         f"{'OK' if gate else 'FAILED'}")
    if gate and not mini_ok:
        # The mini-gate was too strict (e.g. a readback hiccup) but
        # the full exact gate vouches for the run: write the already-
        # measured figure now.
        status.state["config"] = config
        status.state["pps"] = best
        status.state["vs_baseline"] = best / base_pps
        status.write()
        _log(f"primary DI figure (post exact gate): {best:.0f} patterns/s")
    if not gate:
        # Exact-tier fallback: time the production "highest" tier
        # instead and overwrite the figure (correct beats fast).
        _log("falling back to the exact highest tier (one more compile)")
        from kikuchipy_tpu.indexing.di import _index_resident

        def run(e, d):
            return _index_resident(e, d, keep_n=KEEP_N, tile=TILE,
                                   precision="highest", approx=False)

        s, i = (np.asarray(x)[:N_GATE]
                for x in run(exp_prepared, dict_prepared))
        if not gate_ok(s, i):
            _log("exact tier failed the gate too — clearing the figure")
            status.clear()
            return
        status.state["config"] = "precision=highest, approx_topk=False"
        best = 0.0
        for _ in range(3):
            best = max(best, timed_pps())
            status.state["pps"] = best
            status.state["vs_baseline"] = best / base_pps
            status.write()
        _log(f"exact-tier DI figure: {best:.0f} patterns/s")

    # Secondary stages: each costs a fresh remote compile. ALWAYS
    # attempt them — the primary figure is already durable, so a slow
    # compile here is simply cut off by the parent's deadline, losing
    # nothing but the extras.
    if True:
        # Refinement first: the driver-verified SH-refinement figure is
        # the VERDICT-priority secondary (r3 item 2); preprocess last.
        try:
            from tools.bench_refine_sh import bench_refine_sh

            status.state["refine_pps"] = bench_refine_sh()
            status.write()
            _log(f"refinement: {status.state['refine_pps']:.0f} patterns/s")
        except Exception as exc:  # secondary must never kill the bench
            _log(f"refinement stage skipped: {type(exc).__name__}: {exc}")

        try:
            import jax.numpy as jnp

            from kikuchipy_tpu.ops import pattern as _ops

            rng = np.random.default_rng(0)

            raw = jnp.asarray(
                rng.integers(1, 255, size=(N, SY, SX), dtype=np.uint8)
            )
            static_bg = jnp.asarray(
                rng.integers(1, 255, size=(SY, SX), dtype=np.uint8)
            )

            @jax.jit
            def preprocess(x):
                x = _ops.remove_static_background(x, static_bg)
                x = _ops.remove_dynamic_background(x)
                return x, jnp.sum(x.astype(jnp.float32))

            def preprocess_pass():
                t0 = time.perf_counter()
                outs = [preprocess(raw) for _ in range(REPS)]
                np.asarray(outs[-1][1])
                return time.perf_counter() - t0

            preprocess_pass()  # compile
            _log("preprocess compiled")
            pre_dt = min(preprocess_pass() for _ in range(3))
            status.state["pre_mbps"] = REPS * raw.size / pre_dt / 1e6
            status.write()
            _log(f"preprocess: {status.state['pre_mbps']:.0f} MB/s")
        except Exception as exc:
            _log(f"preprocess stage skipped: {type(exc).__name__}: {exc}")

    _log("worker done")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        work(Path(sys.argv[2]))
    else:
        supervise()


if __name__ == "__main__":
    main()
