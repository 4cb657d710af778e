"""Probe 4: which op inside the SH-LM refine bench program bloats its
TPU binary to 123 MB (warm_bench_exec round-5 first build)?

HISTORICAL CONTEXT: the 123 MB it diagnosed came from the FULL-WIDTH
zyz pipeline, since replaced by the padded stack (probe 7). The probe
still runs — it now measures the CURRENT pipeline's components through
the same entry points (useful as a regression probe)."""

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
from kikuchipy_tpu.geometry import quaternion as quat
from kikuchipy_tpu.indexing.refinement import (
    _exp_map,
    _prepare_experimental,
    _residual_orientation_delta_sh,
    _unit_rows,
)
from kikuchipy_tpu.projection.spherical import (
    _rotate_zyz_preselected,
    wigner_tables,
)
from kikuchipy_tpu.utils.optimize import levenberg_marquardt_batched

N_REF = bench.N_REF
SH_L = bench.SH_L
D = bench.D


def report(name, fn, *args):
    t = time.monotonic()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ma = compiled.memory_analysis()
        log(
            f"{name}: code={ma.generated_code_size_in_bytes / 1e6:.2f} MB "
            f"temp={ma.temp_size_in_bytes / 1e6:.1f} MB "
            f"(compile {time.monotonic() - t:.1f}s)"
        )
    except Exception as exc:
        log(f"{name}: FAILED {type(exc).__name__}: {exc} "
            f"({time.monotonic() - t:.1f}s)")


def main():
    log(f"devices: {jax.devices()}")
    inputs = bench._refine_inputs()
    base9, truth9, dq, coeffs, t_groups, m_onehot, sigma, basis = inputs
    avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        inputs,
    )
    tables = wigner_tables(SH_L)
    bounds = tables.group_bounds

    # A: input prep (tile + prepare + q0 + use_id) alone
    def prep_only(base9, truth9, dq, coeffs, t_groups, m_onehot, sigma, basis):
        reps = -(-N_REF // base9.shape[0])
        pats = jnp.tile(base9, (reps, 1))[:N_REF]
        truth = jnp.tile(truth9, (reps, 1))[:N_REF]
        exp, _ = _prepare_experimental(pats[:, None, :], None)
        q0 = quat.multiply(dq, truth).astype(jnp.float32)
        mat00 = quat.to_matrix(quat.conjugate(q0))
        use_id = jnp.abs(mat00[..., 2, 2]) <= 0.65
        return exp.sum() + q0.sum() + use_id.sum()

    report("A prep only", prep_only, *avals)

    # B: one residual evaluation (zyz rotation + synthesis matmul)
    def one_residual(base9, truth9, dq, coeffs, t_groups, m_onehot, sigma, basis):
        reps = -(-N_REF // base9.shape[0])
        pats = jnp.tile(base9, (reps, 1))[:N_REF]
        truth = jnp.tile(truth9, (reps, 1))[:N_REF]
        exp, _ = _prepare_experimental(pats[:, None, :], None)
        q0 = quat.multiply(dq, truth).astype(jnp.float32)
        mat00 = quat.to_matrix(quat.conjugate(q0))
        use_id = jnp.abs(mat00[..., 2, 2]) <= 0.65
        r = _residual_orientation_delta_sh(
            jnp.zeros((N_REF, 3), jnp.float32), q0, use_id, _unit_rows(exp),
            coeffs, t_groups, m_onehot, sigma, basis, SH_L, bounds, "default",
        )
        return r.sum()

    report("B one residual", one_residual, *avals)

    # C: one residual + its 3-column JVP (what one LM iteration costs)
    def residual_jvp(base9, truth9, dq, coeffs, t_groups, m_onehot, sigma, basis):
        reps = -(-N_REF // base9.shape[0])
        pats = jnp.tile(base9, (reps, 1))[:N_REF]
        truth = jnp.tile(truth9, (reps, 1))[:N_REF]
        exp, _ = _prepare_experimental(pats[:, None, :], None)
        q0 = quat.multiply(dq, truth).astype(jnp.float32)
        mat00 = quat.to_matrix(quat.conjugate(q0))
        use_id = jnp.abs(mat00[..., 2, 2]) <= 0.65

        def res_fn(x):
            return _residual_orientation_delta_sh(
                x, q0, use_id, _unit_rows(exp), coeffs, t_groups,
                m_onehot, sigma, basis, SH_L, bounds, "default",
            )

        x0 = jnp.zeros((N_REF, 3), jnp.float32)
        acc = jnp.float32(0)
        for k in range(3):
            v = jnp.zeros_like(x0).at[:, k].set(1.0)
            _, jv = jax.jvp(res_fn, (x0,), (v,))
            acc = acc + jv.sum()
        return acc

    report("C residual + 3 JVPs", residual_jvp, *avals)

    # D: the zyz rotation pipeline alone (no synthesis)
    def zyz_only(base9, truth9, dq, coeffs, t_groups, m_onehot, sigma, basis):
        reps = -(-N_REF // truth9.shape[0])
        truth = jnp.tile(truth9, (reps, 1))[:N_REF]
        q0 = quat.multiply(dq, truth).astype(jnp.float32)
        mat00 = quat.to_matrix(quat.conjugate(q0))
        use_id = jnp.abs(mat00[..., 2, 2]) <= 0.65
        c = _rotate_zyz_preselected(
            quat.conjugate(q0), use_id, coeffs, t_groups, m_onehot, sigma,
            SH_L, bounds, "default",
        )
        return c.sum()

    report("D zyz rotation only", zyz_only, *avals)

    log("probe4 done")


if __name__ == "__main__":
    main()
