"""Benchmark: dictionary-indexing throughput (patterns/sec/chip).

Mirrors BASELINE.json's headline metric: NCC dictionary indexing of
60x60 patterns against a 100k-entry dictionary, with secondary
preprocess (MB/s) and refinement (patterns/s) figures. The baseline is
the reference's CPU execution model (threaded float32 matmul + top-k,
as in ``/root/reference/src/kikuchipy/indexing/_dictionary_indexing.
py``) measured on a dictionary subsample — the reference itself is not
runnable in this image (hyperspy/numba absent).

Survival design (VERDICT r3 item 1 — the driver captured no number in
rounds 2-3 because remote compiles through this environment's tunnel
take ~10 minutes EACH and the bench ran several):

1. The primary DI JSON line is printed+flushed IMMEDIATELY after the
   first successful timing pass; later stages only append to it
   (same schema, the driver takes the last line).
2. A ``signal.alarm`` deadline (``KP_BENCH_BUDGET_S``, default 1500 s)
   prints whatever has been measured and exits 0.
3. The happy path compiles exactly ONE program (``_index_resident`` at
   the persisted-winner configuration: f16 materialization + transposed
   group-top-k). Pattern preparation for both operands runs host-side
   in NumPy, so no auxiliary device programs exist.
4. The JAX persistent compilation cache (``.jax_cache/`` next to this
   file, pre-warmed in-repo) turns every compile into a file load, so a
   driver run on the warmed machine never waits on the remote compiler.
5. The preprocess and refinement stages run only while generous wall
   budget remains, AFTER the primary line is out.

Measurement model: production DI indexes a scan as many batches, so the
steady-state number is *pipelined* throughput — REPS batches enqueued
back-to-back, results read back once (device execution is in-order).
This amortizes the ~26-34 ms per-dispatch cost of the tunneled TPU.

Prints ONE JSON line (re-printed with more fields as stages finish):
``{"metric": ..., "value": N, "unit": "patterns/s", "vs_baseline": N}``
"""

import json
import os
import signal
import sys
import time
from pathlib import Path

import numpy as np

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("KP_BENCH_BUDGET_S", "1500"))

_state = {
    "pps": 0.0,
    "vs_baseline": 0.0,
    "config": "",
    "pre_mbps": 0.0,
    "refine_pps": 0.0,
    "printed": False,
}


def _log(msg: str) -> None:
    print(f"[bench {time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _emit() -> None:
    if _state["pps"] <= 0:
        return
    extras = ""
    if _state["pre_mbps"]:
        extras += f"; preprocess {_state['pre_mbps']:.0f} MB/s/chip uint8 static+dynamic bg"
    if _state["refine_pps"]:
        extras += (
            f"; refinement {_state['refine_pps']:.0f} patterns/s/chip "
            "LM spherical-harmonic <0.8deg"
        )
    print(
        json.dumps(
            {
                "metric": (
                    f"dictionary-indexing patterns/s/chip "
                    f"(NCC, 100000-entry 60x60 dict, keep_n=20, "
                    f"{_state['config']}, pipelined x4{extras})"
                ),
                "value": round(_state["pps"], 2),
                "unit": "patterns/s",
                "vs_baseline": round(_state["vs_baseline"], 2),
            }
        ),
        flush=True,
    )
    _state["printed"] = True


def _on_alarm(signum, frame):
    _log("wall budget reached; emitting best-so-far and exiting")
    _emit()
    os._exit(0)


signal.signal(signal.SIGALRM, _on_alarm)
signal.alarm(max(int(_BUDGET_S), 1))


def _baseline_cpu_pps(d: int, keep_n: int, m_total: int) -> float:
    """Reference-style CPU DI throughput (patterns/s) via NumPy BLAS on
    a dictionary subsample, scaled to the full dictionary size. Median
    of three passes after warmup."""
    rng = np.random.default_rng(0)
    n, m_sub = 256, 8192
    exp = rng.standard_normal((n, d), dtype=np.float32)
    dic = rng.standard_normal((m_sub, d), dtype=np.float32)

    def one_pass():
        t0 = time.perf_counter()
        scores = exp @ dic.T
        part = np.argpartition(-scores, keep_n, axis=1)[:, :keep_n]
        np.take_along_axis(scores, part, axis=1)
        return time.perf_counter() - t0

    one_pass()
    dts = sorted(one_pass() for _ in range(3))
    comparisons_per_s = n * m_sub / dts[1]
    return comparisons_per_s / m_total


def _prep_np(x: np.ndarray) -> np.ndarray:
    """Host NCC preparation (zero-mean, L2-normalized rows), matching
    ``indexing/metrics.py:SimilarityMetric.prepare`` — done in NumPy so
    the bench compiles zero preparation programs."""
    x = x - x.mean(axis=1, keepdims=True)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def main() -> None:
    # Persistent compilation cache: every program compiled on this
    # machine (including by the in-repo warmup) is reused from disk, so
    # the driver's run waits on NO remote compiles.
    cache_dir = str(Path(__file__).resolve().parent / ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from kikuchipy_tpu.indexing.di import _index_resident

    _log(f"devices: {jax.devices()}; cache: {cache_dir}")

    N = int(os.environ.get("KP_BENCH_N", 16384))   # patterns per batch
    M = int(os.environ.get("KP_BENCH_M", 100_000))  # dictionary entries
    SY = SX = 60
    D = SY * SX
    KEEP_N = 20
    TILE = M        # single tile: one matmul + one selection
    REPS = 4        # pipelined batches per timing pass
    N_GATE = min(256, N)

    rng = np.random.default_rng(0)
    exp_np = rng.standard_normal((N, D), dtype=np.float32)
    dic_np = rng.standard_normal((M, D), dtype=np.float32)
    # Embed TRUE matches for the validation subset: production patterns
    # have a clear best match (NCC ~0.5-0.9 with an ~0.01+ margin over
    # the runner-up), unlike pure white noise where top-1 margins
    # (~1e-4) sit below even f16 rounding.
    dic_np[:: M // N_GATE][:N_GATE] = exp_np[
        :N_GATE
    ] + 0.7 * rng.standard_normal((N_GATE, D), dtype=np.float32)
    _log("host arrays made")

    exp_prep_np = _prep_np(exp_np)
    dict_prep_np = _prep_np(dic_np)
    _log("host NCC preparation done")

    # Exact host reference for the gate rows.
    gate_scores = exp_prep_np[:N_GATE] @ dict_prep_np.T
    part = np.argpartition(-gate_scores, KEEP_N, axis=1)[:, :KEEP_N]
    order = np.argsort(-np.take_along_axis(gate_scores, part, axis=1), axis=1)
    ref_idx = np.take_along_axis(part, order, axis=1)
    ref_scores = np.take_along_axis(gate_scores, ref_idx, axis=1)
    _log("host gate reference done")

    exp_prepared = jnp.asarray(exp_prep_np)
    dict_prepared = jnp.asarray(dict_prep_np)
    # Force the transfers now so compile time is measured separately.
    np.asarray(jax.device_get(exp_prepared[:1]))
    _log("operands on device (1.7 GB transferred)")

    def run_once(precision: str, approx: bool):
        s, i = _index_resident(
            exp_prepared, dict_prepared, KEEP_N, TILE, precision, approx
        )
        return np.asarray(s), np.asarray(i)

    def gate_ok(s: np.ndarray, i: np.ndarray) -> bool:
        """Exact top-1 index agreement + keep_n scores within 1e-3 of
        the exact host reference on the gate rows (f16 rounding is
        bounded by 2.44e-4 on NCC scores in [-1, 1])."""
        s, i = s[:N_GATE], i[:N_GATE]
        return bool(
            (i[:, 0] == ref_idx[:, 0]).all()
            and np.abs(s - ref_scores).max() < 1e-3
        )

    base_pps = _baseline_cpu_pps(D, KEEP_N, M)
    _log(f"CPU baseline: {base_pps:.1f} patterns/s")

    # Persisted winner (BENCH_NOTES round 2: f16 + transposed
    # group-top-k); the exact tier compiles only if the gate fails.
    t_c = time.monotonic()
    precision, approx = "f16", True
    s, i = run_once(precision, approx)
    compile_s = time.monotonic() - t_c
    _log(f"gate pass compile+run: {compile_s:.1f}s")
    if not gate_ok(s, i):
        _log("f16 gate FAILED; falling back to exact highest tier")
        precision, approx = "highest", False
        s, i = run_once(precision, approx)
        if not gate_ok(s, i):
            _log("exact tier failed the gate too — aborting")
            return

    def timed_pps() -> float:
        """Steady-state pipelined throughput: enqueue REPS batches,
        read the LAST batch's (small) results back (the device queue is
        in-order, so that readback bounds all batches; full-result
        readback would time the ~28 MB/s tunnel, not the chip)."""
        t0 = time.perf_counter()
        outs = [
            _index_resident(
                exp_prepared, dict_prepared, KEEP_N, TILE, precision, approx
            )
            for _ in range(REPS)
        ]
        np.asarray(outs[-1][0])
        np.asarray(outs[-1][1])
        return REPS * N / (time.perf_counter() - t0)

    pps = max(timed_pps() for _ in range(3))
    _state["pps"] = pps
    _state["vs_baseline"] = pps / base_pps
    _state["config"] = f"precision={precision}, approx_topk={approx}"
    _emit()  # PRIMARY LINE OUT — everything below only improves it
    _log(f"primary DI figure: {pps:.0f} patterns/s ({pps / base_pps:.0f}x baseline)")

    # Secondary: preprocess MB/s (one extra compile; needs either a
    # warm cache or plenty of budget).
    need = 120 if compile_s < 60 else 700
    if _remaining() > need:
        try:
            from kikuchipy_tpu.ops import pattern as _ops

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
            _state["pre_mbps"] = REPS * raw.size / pre_dt / 1e6
            _emit()
            _log(f"preprocess: {_state['pre_mbps']:.0f} MB/s")
        except Exception as exc:  # a secondary figure must never kill the bench
            _log(f"preprocess stage skipped: {type(exc).__name__}: {exc}")

    # Secondary: SH-projector LM refinement patterns/s at the <0.8 deg
    # criterion (VERDICT r3 item 2). Several programs — only with a warm
    # cache or a very generous budget.
    need = 300 if compile_s < 60 else 2500
    if _remaining() > need:
        try:
            from tools.bench_refine_sh import bench_refine_sh

            _state["refine_pps"] = bench_refine_sh()
            _emit()
            _log(f"refinement: {_state['refine_pps']:.0f} patterns/s")
        except Exception as exc:
            _log(f"refinement stage skipped: {type(exc).__name__}: {exc}")

    if not _state["printed"]:
        _emit()
    _log("done")


if __name__ == "__main__":
    main()
