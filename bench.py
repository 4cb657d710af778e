"""Benchmark: the three BASELINE figures on one chip, driver-capturable.

Mirrors BASELINE.json's metric ("DI patterns/s/chip; preprocess
MB/s/chip") plus the refinement figure the round-3 verdict demanded:

1. dictionary indexing patterns/s/chip — NCC, 16384 x 100k x 3600,
   keep_n=20 (reference reporting: ``/root/reference/src/kikuchipy/
   indexing/_dictionary_indexing.py:130-139``);
2. preprocess MB/s/chip — uint8 static + dynamic background removal
   (reference ``benchmarks/preprocessing``);
3. SH-LM refinement patterns/s/chip at the <0.8 deg criterion
   (reference ``benchmarks/indexing/test_refinement.py:74-85``).

The baseline is the reference's CPU execution model (threaded float32
matmul + top-k) measured on a dictionary subsample — the reference
itself is not runnable in this image (hyperspy/numba absent).

Survival architecture (rounds 2-4 post-mortems, BENCH_NOTES.md):

- PARENT/CHILD split. The parent (this file, default mode) spawns the
  worker (``--worker``) in its own process group, polls a status file,
  and at the deadline (``KP_BENCH_BUDGET_S``, default 1020 s) SIGKILLs
  the group and prints the latest measured JSON line. The parent never
  touches jax, so nothing can block it; it always exits 0.
- PRECOMPILED EXECUTABLES: the worker loads the committed programs
  (``.jax_cache/bench_{combined,gate,refine,preprocess}_exec.pkl``,
  built in-repo by ``tools/warm_bench_exec.py`` via
  jax.experimental.serialize_executable, content-hash-validated).
  Fallback on mismatch: live compiles, bounded by the parent deadline.
- SMALL BINARIES: a deserialized executable's first execution ships the
  binary server-side at tunnel speed (161 MB -> 244-953 s measured).
  Round 4's 165 MB combined program was the group-top-k's major-axis
  reduce scalarizing (~3 KB of code PER OUTPUT TILE); the streaming
  fold in ``indexing/di.py:_group_topk_T`` brings the whole combined
  program to a few MB (tools/probe_codesize{,2,3}.py), so ALL stages
  fit in the budget.
- TRANSFER-FREE DI measurement: operands are GENERATED ON DEVICE (the
  tunnel has been measured as low as ~0.5-2.4 MB/s); completion is an
  8-byte checksum readback. The figure is validated by a host
  mini-gate on real readbacks of the gate-row slices the program
  itself returns (no host-side slicing programs), then by the exact
  f32-HIGHEST on-device gate over all keep_n ranks.
- The primary DI figure is durable from the first timing pass;
  later passes/stages only add to it (the parent prints the newest).
- Secondary stages (SH refinement, preprocess) run AFTER the DI figure
  is durable, from their own committed executables; each validates
  against an independent host/CPU oracle before its figure is added.

Measurement model: production DI indexes a scan as many batches, so
the steady-state number is pipelined batch throughput — 3 pipelined
executions of REPS_DEVICE on-device chained passes each, one
completion readback (device execution is in-order). Generation,
dispatch, and the readback RTT are all inside the measured wall.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "patterns/s", "vs_baseline": N,
"preprocess_mbps": N, "refine_pps": N}`` (the last two appear once
measured).
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
# serialized executables match exactly).
N = int(os.environ.get("KP_BENCH_N", 16384))    # patterns per batch
M = int(os.environ.get("KP_BENCH_M", 100_000))  # dictionary entries
SY = SX = 60
D = SY * SX
KEEP_N = 20
TILE = M          # single tile: one matmul + one selection
REPS = 4          # pipelined batches per host-dispatched timing pass
REPS_DEVICE = 16  # chained DI passes inside the combined program (tests)
REPS_MAIN = 32    # host-pipelined single-pass executions per window
N_GATE = min(256, N)
PRECISION, APPROX = "f16", True  # persisted winner (BENCH_NOTES r2)

# Refinement stage (SH-LM, round-4 sweep winner with accuracy margin).
N_REF = int(os.environ.get("KP_BENCH_N_REF", 16384))
SH_L = 80
REFINE_ITERS = 9
REFINE_TR_DEG = 6.0
PERTURB_DEG = 2.0

# Preprocess stage (uint8 static+dynamic background).
N_PRE = int(os.environ.get("KP_BENCH_N_PRE", 16384))
REPS_PRE = 16


def _config_tuple():
    """EVERY value the device programs close over: a change to any of
    these must invalidate the committed executables (advisor r4: a
    REPS_DEVICE change silently mis-scaled the figure otherwise).
    REPS_MAIN is deliberately NOT here: it only sets how many
    executions the host enqueues per timing window — no program closes
    over it, and the figure normalizes by it explicitly."""
    return [
        N, M, D, KEEP_N, TILE, PRECISION, APPROX, N_GATE, REPS_DEVICE,
        N_REF, SH_L, REFINE_ITERS, REFINE_TR_DEG, PERTURB_DEG,
        N_PRE, REPS_PRE,
    ]


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
                f"{s['config']}, {REPS_MAIN} pipelined passes incl. "
                f"dispatch{extras})"
            ),
            "value": round(s["pps"], 2),
            "unit": "patterns/s",
            "vs_baseline": round(s["vs_baseline"], 2),
        }
        if s["pre_mbps"]:
            line["preprocess_mbps"] = round(s["pre_mbps"], 1)
        if s["refine_pps"]:
            line["refine_pps"] = round(s["refine_pps"], 1)
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
    program sources: this file's program definitions and every
    production module the programs trace through. A changed kernel
    invalidates the pickles (live compiles instead), so the bench can
    never silently measure a stale executable of an old production
    path."""
    import hashlib
    import inspect

    import kikuchipy_tpu.indexing.di as di
    import kikuchipy_tpu.indexing.refinement as refinement
    import kikuchipy_tpu.ops.fft_barnes as fft_barnes
    import kikuchipy_tpu.ops.pattern as ops_pattern
    import kikuchipy_tpu.projection.spherical as spherical
    import kikuchipy_tpu.utils.optimize as optimize

    h = hashlib.md5()
    for fn in (_def_programs, _def_refine_program, _def_preprocess_program):
        h.update(inspect.getsource(fn).encode())
    for mod in (di, refinement, spherical, optimize, ops_pattern, fft_barnes):
        h.update(Path(mod.__file__).read_bytes())
    return h.hexdigest()


def _expected_meta():
    import jax

    return {
        "jax": jax.__version__,
        "device": jax.devices()[0].device_kind,
        "shape": _config_tuple(),
        "programs": _program_hash(),
    }


def _load_precompiled(name: str):
    """Deserialize a committed executable (``.jax_cache/bench_<name>_
    exec.pkl``); None if absent or incompatible (jax/device/config
    metadata checked, shared across the bench programs)."""
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
# Device programs (AOT-compiled + serialized by tools/warm_bench_exec.
# py). Operands are GENERATED ON DEVICE: the tunnel in this environment
# has been measured as low as ~2 MB/s, so uploading the 1.7 GB DI
# operands could alone exceed the driver's budget; generation + an
# on-device exact gate reference make the DI bench transfer-free (only
# keep_n results and the two 3.7 MB gate-row slices cross the link).
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

    def _hash_u32(base: int, seed, n: int):
        """murmur3-style finalizer over DISJOINT counter ranges per
        array — an offset-overlapping stream would plant phantom
        shifted-copy correlations between the operands. Chosen over
        jax.random's threefry NOT for speed of execution but for
        COMPILE cost: the remote compile service charges by HLO
        complexity, and this is a handful of fused elementwise ops."""
        seed_u = jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        x = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(base)
        x = x ^ seed_u
        x = x * jnp.uint32(2654435761)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return x

    def _uniform(base: int, seed, shape):
        """Counter-hash uniforms in [-1, 1). Statistical quality beyond
        stream decorrelation is irrelevant to a matmul benchmark."""
        n = int(np.prod(shape))
        x = _hash_u32(base, seed, n)
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
    def gate_exact(seed):
        """Exact (f32 HIGHEST + exact top-k) reference scores for the
        gate rows. REGENERATES the operands from the seed (bit-identical
        elementwise integer program), so the combined program need not
        return the 1.7 GB operand buffers; the host cross-checks the
        regenerated stream against the combined program's own gate-row
        readbacks (planted scores to 1e-4) before trusting it."""
        exp, dic = make_operands(seed)
        s, i = _index_resident(
            exp[:N_GATE], dic, KEEP_N, TILE, "highest", False,
        )
        planted = jnp.asarray(_planted_indices())
        return s, i, exp[:N_GATE], dic[planted]

    @jax.jit
    def main(exp_prepared, dict_prepared):
        """One production DI pass; gate-row slices are program OUTPUTS
        so the host mini-gate needs no fresh slicing programs (each
        would be a remote compile)."""
        s, i = _index_resident(
            exp_prepared, dict_prepared, KEEP_N, TILE, PRECISION, APPROX
        )
        planted = jnp.asarray(_planted_indices())
        return s, i, exp_prepared[:N_GATE], dict_prepared[planted]

    @jax.jit
    def combined(seed):
        """The whole primary measurement as ONE program: generates
        operands, then runs REPS_DEVICE chained DI passes; each pass's
        input gets an index-dependent 1e-7 tweak and contributes to a
        checksum so XLA can neither hoist the passes as loop-invariant
        nor dead-code the non-final ones. Returns (checksum, last
        scores/indices, exp gate rows, planted dict rows) — the gate
        slices are program OUTPUTS so the host mini-gate needs no
        fresh slicing programs (each would be a remote compile)."""
        exp, dic = make_operands(seed)

        def body(carry, k):
            acc, _, _ = carry
            e = exp.at[0, 0].add(jnp.float32(1e-7) * k)
            s, i = _index_resident(e, dic, KEEP_N, TILE, PRECISION, APPROX)
            return (acc + s[0, 0].astype(jnp.float32), s, i), None

        # Zeros-init with the DI pass's exact output structure
        # (eval_shape: abstract, no second compiled copy of the pass).
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
        planted = jnp.asarray(_planted_indices())
        return acc, s, i, exp[:N_GATE], dic[planted]

    return make_operands, gate_exact, main, combined


def _def_refine_program():
    """SH-LM orientation refinement as one serializable program.

    Matches the production path (``indexing/refinement.py:
    _refine_orientation_spherical``, method="lm"): same residual, same
    solver, same L/iteration budget as the round-4 sweep winner. The
    heavy inputs stay tiny: the 9 real nickel base patterns tile to
    N_REF ON DEVICE; only the SH coefficients, Wigner tables, and the
    synthesis basis (~95 MB, uploaded once per worker run) cross the
    tunnel. Returns (checksum, refined quaternions) — the host gates
    the figure on the reference's <0.8 deg criterion
    (``/root/reference/benchmarks/indexing/test_refinement.py:74-85``)
    against the stored-truth orientations.
    """
    import jax
    import jax.numpy as jnp

    from kikuchipy_tpu.geometry import quaternion as quat
    from kikuchipy_tpu.indexing.refinement import (
        _exp_map,
        _prepare_experimental,
        _residual_orientation_delta_sh,
        _unit_rows,
    )
    from kikuchipy_tpu.projection.spherical import wigner_tables
    from kikuchipy_tpu.utils.optimize import levenberg_marquardt_batched

    tables = wigner_tables(SH_L)
    bounds = tables.group_bounds
    max_norm = float(np.deg2rad(REFINE_TR_DEG))

    @jax.jit
    def refine(base9, truth9, dq, coeffs, t_stack, onehot_pad, p_signed, basis):
        reps = -(-N_REF // base9.shape[0])
        pats = jnp.tile(base9, (reps, 1))[:N_REF]
        truth = jnp.tile(truth9, (reps, 1))[:N_REF]
        exp, _ = _prepare_experimental(pats[:, None, :], None)
        q0 = quat.multiply(dq, truth).astype(jnp.float32)
        mat00 = quat.to_matrix(quat.conjugate(q0))
        use_id = jnp.abs(mat00[..., 2, 2]) <= 0.65
        res = levenberg_marquardt_batched(
            _residual_orientation_delta_sh,
            jnp.zeros((N_REF, 3), dtype=jnp.float32),
            max_iters=REFINE_ITERS,
            ftol=1e-5,
            blocks=((3, max_norm),),
            args=(
                q0, use_id, _unit_rows(exp), coeffs, t_stack, onehot_pad,
                p_signed, basis,
            ),
            static_args=(SH_L, bounds, "default"),
        )
        q_ref = quat.multiply(q0, _exp_map(res.x))
        return jnp.sum(res.x), q_ref

    return refine


def _refine_inputs():
    """Host-side refine-stage inputs (all small except the basis)."""
    import jax.numpy as jnp

    import kikuchipy_tpu as kp
    from kikuchipy_tpu.geometry import quaternion as quat
    from kikuchipy_tpu.projection.spherical import wigner_tables

    raw = kp.data.nickel_ebsd_small()
    s0 = raw.remove_static_background().remove_dynamic_background()
    base9 = np.asarray(s0.data).reshape(9, D).astype(np.float32)
    truth9 = np.asarray(raw.xmap.best_rotations).astype(np.float32)

    rng = np.random.default_rng(0)
    axes = rng.normal(size=(N_REF, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    dq = np.asarray(
        quat.from_axis_angle(jnp.asarray(axes), np.deg2rad(PERTURB_DEG))
    ).astype(np.float32)

    mp = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    proj = mp.spherical_projector(energy=20, L=SH_L)
    det = raw.detector
    import dataclasses

    from kikuchipy_tpu.projection.master_pattern import (
        direction_cosines_from_detector,
    )

    det1 = dataclasses.replace(det, pc=det.pc_average.reshape(1, 3))
    dc = np.asarray(direction_cosines_from_detector(det1))
    basis = np.asarray(proj.synthesis_basis(dc))
    tables = wigner_tables(SH_L)
    t_stack, onehot_pad, p_signed = tables.host_arrays()
    coeffs = np.asarray(proj.coeffs)
    return (
        base9, truth9, dq, coeffs, t_stack, onehot_pad, p_signed, basis,
    )


def _def_preprocess_program():
    """uint8 static+dynamic background removal as one serializable
    program: generates a raw uint8 batch on device, chains REPS_PRE
    passes (input tweaked per pass; every pass feeds the checksum), and
    returns sample rows for an independent CPU-oracle equality gate."""
    import jax
    import jax.numpy as jnp

    from kikuchipy_tpu.ops import pattern as _ops

    @jax.jit
    def preprocess(seed):
        seed_u = jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        x = jnp.arange(N_PRE * D + D, dtype=jnp.uint32) ^ seed_u
        x = x * jnp.uint32(2654435761)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        raw = (x[: N_PRE * D] % 254 + 1).astype(jnp.uint8).reshape(
            N_PRE, SY, SX
        )
        static_bg = (x[N_PRE * D :] % 254 + 1).astype(jnp.uint8).reshape(
            SY, SX
        )

        def one(r):
            y = _ops.remove_static_background(r, static_bg)
            return _ops.remove_dynamic_background(y)

        def body(acc, k):
            r = raw + k.astype(jnp.uint8)
            y = one(r)
            return acc + y[0, 0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(REPS_PRE, dtype=jnp.uint32)
        )
        return acc, raw[:8], one(raw)[:8], static_bg

    return preprocess


def work(status_path: Path) -> None:
    status = _Status(status_path)

    import jax

    _log(f"devices: {jax.devices()}")

    make_operands, gate_exact, main, combined = _def_programs()
    run_gen = _load_precompiled("gen") or make_operands
    run_main = _load_precompiled("main") or main
    gate_fn = _load_precompiled("gate") or gate_exact
    if run_main is main:
        _log("no committed executables; live remote compiles ahead "
             "(the parent deadline bounds the damage)")

    base_pps = _baseline_cpu_pps()
    _log(f"CPU baseline: {base_pps:.1f} patterns/s")

    # Critical path = the gen + main executables (both small — the
    # round-5 streaming selection keeps every binary shippable; the
    # round-4 one-big-program design is gone: a lax.scan of chained
    # passes measured 28% SLOWER than host-pipelined single-pass
    # executions, which overlap dispatch with execution
    # (tools/probe_bench_structure.py: 81.6k vs 113.1k pps).
    seed = np.int32(0)
    t0 = time.perf_counter()
    exp_dev, dic_dev = run_gen(seed)
    out0 = run_main(exp_dev, dic_dev)
    np.asarray(out0[0])  # full (n, keep_n) readback: 1.3 MB, no
    # fresh program (a host-side slice would be a remote compile)
    _log(f"gen + main first execution: {time.perf_counter() - t0:.1f}s")

    def main_window(k_pipelined: int):
        """Enqueue k back-to-back executions (the device queue is
        in-order) and read the LAST result block: one tunnel
        round-trip amortized over k passes."""
        t0 = time.perf_counter()
        outs = [run_main(exp_dev, dic_dev) for _ in range(k_pipelined)]
        np.asarray(outs[-1][0])  # completion: 1.3 MB result readback
        return time.perf_counter() - t0, outs[-1]

    best_dt = np.inf
    for _ in range(6):
        dt, outs = main_window(REPS_MAIN)
        best_dt = min(best_dt, dt)
    s_dev, i_dev, exp_gate_dev, dic_gate_dev = outs
    best = REPS_MAIN * N / best_dt
    _log(f"steady-state: {best:.0f} patterns/s "
         f"({REPS_MAIN} pipelined single-pass executions incl. dispatch)")

    # Host mini-gate on REAL readbacks: the planted rows must win
    # top-1 and their scores must match host dot products of the
    # gate-row slices the program returned (bounds generation +
    # preparation + the selection matmul; 1e-3 covers the f16
    # materialization, 2.44e-4).
    planted = _planted_indices()
    s = np.asarray(s_dev)[:N_GATE]
    i = np.asarray(i_dev)[:N_GATE]
    exp_g = np.asarray(exp_gate_dev)
    dic_g = np.asarray(dic_gate_dev)
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

    # Full exact gate (f32-HIGHEST + exact top-k on device, operands
    # regenerated from the seed and cross-checked against the combined
    # program's own gate-row readbacks): validates all keep_n ranks.
    ref_scores, ref_idx, ref_exp_g, ref_dic_g = (
        np.asarray(x) for x in gate_fn(seed)
    )
    regen_ok = (
        np.abs(ref_exp_g - exp_g).max() < 1e-6
        and np.abs(ref_dic_g - dic_g).max() < 1e-6
    )
    err_ref = np.abs(host_planted - ref_scores[:, 0]).max()
    if not (regen_ok and (ref_idx[:, 0] == planted).all() and err_ref < 1e-4):
        if mini_ok:
            _log("exact gate reference inconsistent with host — keeping "
                 "the mini-gated figure, skipping the exact gate")
        else:
            _log("exact gate reference inconsistent with host and the "
                 "mini-gate FAILED — no figure was written")
            return
        gate = True  # mini-gate stands on its own
    else:
        def gate_ok(s_chk, i_chk):
            return bool(
                (i_chk[:N_GATE, 0] == ref_idx[:, 0]).all()
                and np.abs(s_chk[:N_GATE] - ref_scores).max() < 1e-3
            )

        gate = gate_ok(s, i)
        _log(f"exact gate ({PRECISION}+approx, all {KEEP_N} ranks): "
             f"{'OK' if gate else 'FAILED'}")
        if gate and not mini_ok:
            # The mini-gate was too strict (e.g. a readback hiccup) but
            # the full exact gate vouches for the run.
            status.state["config"] = config
            status.state["pps"] = best
            status.state["vs_baseline"] = best / base_pps
            status.write()
            _log(f"primary DI figure (post exact gate): {best:.0f} patterns/s")

    # Exact-tier measurement (one live compile of a small program,
    # ~1.2 MB / seconds — tools/probe_codesize.py D): on gate FAILURE
    # it replaces the figure (correct beats fast); on success it is
    # logged as the accuracy/speed anchor the f16+approx headline is
    # traded against (VERDICT r4 "exact tier's driver number is
    # unknown").
    try:
        from kikuchipy_tpu.indexing.di import _index_resident

        import jax as _jax

        @_jax.jit
        def run_exact(e, d):
            return _index_resident(e, d, keep_n=KEEP_N, tile=TILE,
                                   precision="highest", approx=False)

        s2_full, i2_full = run_exact(exp_dev, dic_dev)
        s2 = np.asarray(s2_full)[:N_GATE]
        i2 = np.asarray(i2_full)[:N_GATE]
        exact_consistent = bool(
            (i2[:, 0] == planted).all()
            and np.abs(s2[:, 0] - host_planted).max() < 1e-4
        )

        def timed_exact() -> float:
            t0 = time.perf_counter()
            outs = [run_exact(exp_dev, dic_dev) for _ in range(REPS)]
            np.asarray(outs[-1][0])
            return REPS * N / (time.perf_counter() - t0)

        exact_best = max(timed_exact() for _ in range(3))
        _log(f"exact (highest, exact top-k) tier: {exact_best:.0f} "
             f"patterns/s (self-consistent: {exact_consistent})")
        if not gate:
            if not exact_consistent:
                _log("exact tier failed the host gate too — clearing "
                     "the figure")
                status.clear()
                return
            status.state["config"] = "precision=highest, approx_topk=False"
            status.state["pps"] = exact_best
            status.state["vs_baseline"] = exact_best / base_pps
            status.write()
            _log(f"exact-tier DI figure: {exact_best:.0f} patterns/s")
    except Exception as exc:
        if not gate:
            _log(f"exact-tier fallback failed ({type(exc).__name__}: "
                 f"{exc}) — clearing the figure")
            status.clear()
            return
        _log(f"exact-tier anchor skipped: {type(exc).__name__}: {exc}")

    # ---------------- Secondary stages (figure already durable) ------
    try:
        _refine_stage(status)
    except Exception as exc:  # secondary must never kill the bench
        _log(f"refinement stage skipped: {type(exc).__name__}: {exc}")

    try:
        _preprocess_stage(status)
    except Exception as exc:
        _log(f"preprocess stage skipped: {type(exc).__name__}: {exc}")

    _log("worker done")


def _refine_stage(status: _Status) -> None:
    import jax

    refine = _load_precompiled("refine") or _def_refine_program()
    t0 = time.monotonic()
    inputs = _refine_inputs()
    _log(f"refine inputs built in {time.monotonic() - t0:.1f}s "
         f"(basis {inputs[-1].nbytes / 1e6:.0f} MB)")
    # Upload ONCE: numpy operands would re-transfer the ~95 MB basis
    # (+ Wigner stacks) through the tunnel inside EVERY timed window,
    # silently measuring the link instead of the chip on a slow day.
    inputs = tuple(jax.device_put(x) for x in inputs)

    def call(k_pipelined=1):
        t0 = time.perf_counter()
        outs = [refine(*inputs) for _ in range(k_pipelined)]
        float(np.asarray(outs[-1][0]))
        return time.perf_counter() - t0, outs[-1][1]

    dt, q_ref = call()
    _log(f"refine first execution: {dt:.1f}s")
    best_dt = min(call(k_pipelined=2)[0] for _ in range(2))
    pps = 2 * N_REF / best_dt

    # Accuracy gate on the CPU backend (an axon dispatch would be a
    # fresh remote compile): <0.8 deg max disorientation vs truth.
    base9, truth9 = inputs[0], inputs[1]
    reps = -(-N_REF // 9)
    truth = np.tile(truth9, (reps, 1))[:N_REF]
    q_np = np.asarray(q_ref)
    with jax.default_device(jax.devices("cpu")[0]):
        from kikuchipy_tpu.crystallography.sampling import (
            disorientation_angle,
        )

        ang = np.degrees(
            np.asarray(disorientation_angle(truth, q_np, "m-3m"))
        )
    ok = float(ang.max()) < 0.8
    _log(f"refinement: {pps:.0f} patterns/s, max {ang.max():.3f} deg "
         f"(<0.8 criterion {'OK' if ok else 'FAILED'})")
    if ok:
        status.state["refine_pps"] = pps
        status.write()


def _preprocess_stage(status: _Status) -> None:
    import jax
    import jax.numpy as jnp

    pre = _load_precompiled("preprocess") or _def_preprocess_program()
    seed = np.int32(1)

    def call(k_pipelined=1):
        t0 = time.perf_counter()
        outs = [pre(seed) for _ in range(k_pipelined)]
        float(np.asarray(outs[-1][0]))
        return time.perf_counter() - t0, outs[-1][1:]

    dt, outs = call()
    _log(f"preprocess first execution: {dt:.1f}s")
    best_dt = min(call(k_pipelined=3)[0] for _ in range(3))
    mbps = 3 * REPS_PRE * N_PRE * D / best_dt / 1e6

    # CPU-oracle gate: the same ops on the returned raw rows must
    # reproduce the returned processed rows (+-1 gray level at exact
    # integer rounding boundaries, the documented fastmath tolerance).
    raw8, out8, bg = (np.asarray(x) for x in outs)
    with jax.default_device(jax.devices("cpu")[0]):
        from kikuchipy_tpu.ops import pattern as _ops

        expect = np.asarray(
            _ops.remove_dynamic_background(
                _ops.remove_static_background(
                    jnp.asarray(raw8), jnp.asarray(bg)
                )
            )
        )
    diff = np.abs(expect.astype(int) - out8.astype(int))
    # Synthetic hash-noise patterns sit on integer rounding boundaries
    # far more often than real patterns, so CPU-vs-TPU fastmath flips
    # ~11% of pixels by EXACTLY one gray level (measured; real-pattern
    # goldens in tests/test_signal_goldens.py hold <5%). Gate on the
    # error BOUND (<= 1 everywhere) and its mean, not the flip count.
    ok = diff.max() <= 1 and diff.mean() < 0.25
    _log(f"preprocess: {mbps:.0f} MB/s (CPU oracle {'OK' if ok else 'FAILED'}"
         f", max diff {diff.max()}, mean {diff.mean():.4f})")
    if ok:
        status.state["pre_mbps"] = mbps
        status.write()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        work(Path(sys.argv[2]))
    else:
        supervise()


if __name__ == "__main__":
    main()
