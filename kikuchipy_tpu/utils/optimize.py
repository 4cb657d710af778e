"""Batched derivative-free optimization under ``jit``.

A data-parallel Nelder-Mead simplex optimizer: one simplex per batch
element, all elements stepped in lockstep with branchless (``where``)
case selection, so thousands of refinement problems (one per map point)
run as a single XLA program. This replaces the reference's per-pattern
SciPy ``minimize(method="Nelder-Mead")`` loop
(``/root/reference/src/kikuchipy/indexing/_refinement/_solvers.py:78``)
with the same algorithm (standard NM coefficients alpha=1, gamma=2,
rho=0.5, sigma=0.5 and SciPy-style initial simplex) vectorized across
the batch.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["nelder_mead_batched", "NelderMeadResult"]


class NelderMeadResult(NamedTuple):
    x: jnp.ndarray          # (n, d) best point per element
    fun: jnp.ndarray        # (n,) best value per element
    n_iter: jnp.ndarray     # (n,) iterations until convergence
    converged: jnp.ndarray  # (n,) convergence mask


def _initial_simplex(x0: jnp.ndarray, step) -> jnp.ndarray:
    """SciPy-style initial simplex: x0 plus a perturbation of each
    coordinate (``nonzdelt=0.05`` relative, ``zdelt=0.00025`` absolute),
    or ``x0[i] + step[i]`` when an explicit step is given."""
    n, d = x0.shape
    if step is None:
        pert = jnp.where(x0 == 0.0, 0.00025, 0.05 * x0)
    else:
        pert = jnp.broadcast_to(jnp.asarray(step, x0.dtype), (n, d))
    eye = jnp.eye(d, dtype=x0.dtype)
    verts = x0[:, None, :] + pert[:, None, :] * eye[None, :, :]
    return jnp.concatenate([x0[:, None, :], verts], axis=1)  # (n, d+1, d)


@partial(jax.jit, static_argnames=("f", "max_iters", "static_args"))
def nelder_mead_batched(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    initial_step=None,
    max_iters: int = 150,
    fatol: float = 1e-5,
    xatol: float = 1e-4,
    lower_bounds: jnp.ndarray | None = None,
    upper_bounds: jnp.ndarray | None = None,
    args: tuple = (),
    static_args: tuple = (),
) -> NelderMeadResult:
    """Minimize ``f`` independently for each batch element.

    Parameters
    ----------
    f
        Batched objective: maps ``(n, d)`` points to ``(n,)`` values.
        Called a fixed number of times per iteration (reflection,
        expansion/contraction, and shrink evaluations are all batched).
    x0
        ``(n, d)`` initial points.
    initial_step
        Scalar or ``(d,)`` initial simplex edge lengths; SciPy's
        relative perturbation if not given.
    max_iters
        Maximum NM iterations (static).
    fatol, xatol
        Convergence: max spread of simplex values / vertices.
    lower_bounds, upper_bounds
        Optional ``(d,)`` or ``(n, d)`` box constraints (trust region);
        all candidate points are clipped into the box.

    Notes
    -----
    Each iteration evaluates ``2 + d`` batched points (the shrink
    vertices are always evaluated and applied by mask), trading ~2x
    extra FLOPs for a completely uniform, compiler-friendly program.
    """
    x0 = jnp.asarray(x0)
    n, d = x0.shape

    if args or static_args:
        # Jit caches on f's identity (a static argname): pass chunk-
        # varying operands through `args` (traced) and ints the
        # objective needs concretely through `static_args` (hashable),
        # so repeated same-shape calls with a module-level f reuse ONE
        # compilation instead of recompiling per closure.
        base_f = f
        f = lambda x: base_f(x, *args, *static_args)

    def clip(x):
        # Bounds are (d,) or (n, d); expand per-element bounds over the
        # simplex-vertex axis when clipping (n, d+1, d) vertex arrays.
        if lower_bounds is not None:
            lb = jnp.asarray(lower_bounds)
            if lb.ndim == 2 and x.ndim == 3:
                lb = lb[:, None, :]
            x = jnp.maximum(x, lb)
        if upper_bounds is not None:
            ub = jnp.asarray(upper_bounds)
            if ub.ndim == 2 and x.ndim == 3:
                ub = ub[:, None, :]
            x = jnp.minimum(x, ub)
        return x

    verts = clip(_initial_simplex(x0, initial_step))
    vals = jnp.stack([f(verts[:, i, :]) for i in range(d + 1)], axis=1)

    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5

    def body(state):
        verts, vals, it, done = state
        order = jnp.argsort(vals, axis=1)
        verts = jnp.take_along_axis(verts, order[:, :, None], axis=1)
        vals = jnp.take_along_axis(vals, order, axis=1)

        best_v, worst_v = vals[:, 0], vals[:, -1]
        second_worst_v = vals[:, -2]
        centroid = jnp.mean(verts[:, :-1, :], axis=1)  # (n, d)
        worst = verts[:, -1, :]

        xr = clip(centroid + alpha * (centroid - worst))
        fr = f(xr)

        # Second candidate: expansion if fr beats best, else outside/
        # inside contraction.
        expand = fr < best_v
        contract_out = (fr >= second_worst_v) & (fr < worst_v)
        x2 = jnp.where(
            expand[:, None],
            centroid + gamma * (xr - centroid),
            jnp.where(
                contract_out[:, None],
                centroid + rho * (xr - centroid),
                centroid - rho * (centroid - worst),
            ),
        )
        x2 = clip(x2)
        f2 = f(x2)

        # Decide replacement for the worst vertex.
        # - expand: min(xr, xe)
        # - fr in [best, second_worst): xr
        # - contraction (out/in): x2 if improved, else shrink
        accept_reflect = (fr >= best_v) & (fr < second_worst_v)
        contract_ok = jnp.where(contract_out, f2 <= fr, f2 < worst_v)

        use_x2 = (expand & (f2 < fr)) | ((~expand) & (~accept_reflect) & contract_ok)
        use_xr = (expand & (f2 >= fr)) | accept_reflect
        shrink = ~(use_x2 | use_xr)

        new_worst = jnp.where(
            use_x2[:, None], x2, jnp.where(use_xr[:, None], xr, worst)
        )
        new_worst_v = jnp.where(use_x2, f2, jnp.where(use_xr, fr, worst_v))
        verts_upd = verts.at[:, -1, :].set(new_worst)
        vals_upd = vals.at[:, -1].set(new_worst_v)

        # Shrink simplex. Shrink steps are rare, but their d extra
        # objective evaluations were 3 of the 5 per iteration; gate
        # them behind a cond so iterations where NO live element
        # shrinks (the common case) skip them entirely.
        def shrink_branch(_):
            shrunk = clip(verts[:, :1, :] + sigma * (verts - verts[:, :1, :]))
            shrunk_vals = jnp.stack(
                [f(shrunk[:, i, :]) for i in range(1, d + 1)], axis=1
            )
            return (
                jnp.concatenate([verts[:, :1, :], shrunk[:, 1:, :]], axis=1),
                jnp.concatenate([vals[:, :1], shrunk_vals], axis=1),
            )

        def no_shrink_branch(_):
            return verts, vals

        verts_shr, vals_shr = jax.lax.cond(
            jnp.any(shrink & ~done), shrink_branch, no_shrink_branch, None
        )

        verts_new = jnp.where(shrink[:, None, None], verts_shr, verts_upd)
        vals_new = jnp.where(shrink[:, None], vals_shr, vals_upd)

        # Freeze converged elements.
        verts_new = jnp.where(done[:, None, None], verts, verts_new)
        vals_new = jnp.where(done[:, None], vals, vals_new)

        f_spread = jnp.max(jnp.abs(vals_new - vals_new[:, :1]), axis=1)
        x_spread = jnp.max(
            jnp.abs(verts_new - verts_new[:, :1, :]), axis=(1, 2)
        )
        done_new = done | ((f_spread <= fatol) & (x_spread <= xatol))
        it_new = it + jnp.where(done, 0, 1)
        return verts_new, vals_new, it_new, done_new

    def cond(state):
        _, _, it, done = state
        return (~jnp.all(done)) & (jnp.max(it) < max_iters)

    init = (
        verts,
        vals,
        jnp.zeros(n, dtype=jnp.int32),
        jnp.zeros(n, dtype=bool),
    )
    verts, vals, it, done = jax.lax.while_loop(cond, body, init)

    best = jnp.argmin(vals, axis=1)
    x_best = jnp.take_along_axis(verts, best[:, None, None], axis=1)[:, 0]
    f_best = jnp.take_along_axis(vals, best[:, None], axis=1)[:, 0]
    return NelderMeadResult(x=x_best, fun=f_best, n_iter=it, converged=done)
