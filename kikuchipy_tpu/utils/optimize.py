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

__all__ = [
    "nelder_mead_batched",
    "NelderMeadResult",
    "levenberg_marquardt_batched",
    "LMResult",
    "differential_evolution_batched",
    "DEResult",
    "dual_annealing_batched",
    "DAResult",
    "basinhopping_batched",
    "BHResult",
    "shgo_batched",
    "SHGOResult",
]


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


class LMResult(NamedTuple):
    x: jnp.ndarray          # (n, d) best point per element
    fun: jnp.ndarray        # (n,) 0.5 * ||r||^2 at the best point
    n_iter: jnp.ndarray     # (n,) LM iterations taken
    converged: jnp.ndarray  # (n,) convergence mask


@partial(
    jax.jit,
    static_argnames=("residual_fn", "max_iters", "static_args", "blocks"),
)
def levenberg_marquardt_batched(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iters: int = 30,
    ftol: float = 1e-7,
    lambda0: float = 1e-3,
    blocks: tuple[tuple[int, float], ...] | None = None,
    args: tuple = (),
    static_args: tuple = (),
) -> LMResult:
    """Batched Levenberg-Marquardt on an elementwise residual.

    Minimizes ``0.5 * ||r_i(x_i)||^2`` independently for every batch
    element ``i``, all elements in lockstep under one ``jit``. This is
    the TPU-fast refinement solver: the projector chain is
    differentiable, so the ``(n_pix, d)`` Jacobian comes from ``d``
    forward-mode JVPs (one batched projection each) and each iteration
    costs ``d`` projections — against ~35 Nelder-Mead iterations of
    ~2.2 evaluations, LM's near-quadratic convergence typically lands
    within 5-8 iterations from dictionary-indexing-quality starts.

    Parameters
    ----------
    residual_fn
        Batched residuals: maps ``(n, d)`` points to ``(n, m)``.
        Pass a module-level function plus ``args``/``static_args`` so
        repeated calls reuse one compilation (same contract as
        :func:`nelder_mead_batched`).
    x0
        ``(n, d)`` initial points.
    max_iters
        Maximum LM iterations (static bound of the while loop).
    ftol
        Converged when an accepted step improves ``0.5 ||r||^2`` by
        less than this.
    lambda0
        Initial Marquardt damping (scaled by ``diag(JtJ)``).
    blocks
        Optional static ``((size, max_norm), ...)`` partition of the
        parameter axis; each block of the step is clipped to its own
        norm ball (trust region), e.g. rotation vector vs PC shift.

    Notes
    -----
    The normal equations are ``d x d`` (3 or 6 here) and are solved for
    all elements at once with a batched Cholesky-free
    ``jnp.linalg.solve``. The residual and Jacobian are carried in the
    loop state: each iteration evaluates one (residual, Jacobian)
    bundle at the trial point, which becomes the cache on accept and is
    discarded on reject — the Jacobian at the current point is never
    recomputed.
    """
    x0 = jnp.asarray(x0)
    n, d = x0.shape

    if args or static_args:
        base = residual_fn
        residual_fn = lambda x: base(x, *args, *static_args)

    eye = jnp.eye(d, dtype=x0.dtype)

    def jac_and_res(x):
        """Residuals (n, m) and Jacobian (n, m, d) via a vmapped JVP
        over the d basis tangents: the primal chain does not depend on
        the batched tangent, so it is computed ONCE (unbatched in the
        jaxpr) while the tangent chain streams with a leading d axis —
        unlike jax.linearize, nothing holds every primal intermediate
        live for later tangent calls (which OOMed HBM on the
        spherical-projector residual at 16k points)."""

        def one(tan):
            return jax.jvp(
                residual_fn, (x,), (jnp.broadcast_to(tan, (n, d)),)
            )

        r, cols = jax.vmap(one, out_axes=(None, 0))(eye)
        return r, jnp.moveaxis(cols, 0, -1)

    def clip_step(step):
        if blocks is None:
            return step
        parts = []
        start = 0
        for size, max_norm in blocks:
            # Python float: numpy scalars are strongly typed and would
            # promote the f32 carry to f64 under x64.
            max_norm = float(max_norm)
            seg = step[:, start : start + size]
            norm = jnp.linalg.norm(seg, axis=-1, keepdims=True)
            parts.append(
                jnp.where(norm > max_norm, seg * (max_norm / norm), seg)
            )
            start += size
        return jnp.concatenate(parts, axis=-1)

    def body(state):
        x, f, r, J, lam, it, done, stalled = state
        jtj = jnp.einsum("nmp,nmq->npq", J, J)
        g = jnp.einsum("nmp,nm->np", J, r)
        diag = jnp.maximum(
            jnp.diagonal(jtj, axis1=1, axis2=2), 1e-12
        )
        A = jtj + lam[:, None, None] * (diag[:, :, None] * eye[None])
        step = clip_step(-jnp.linalg.solve(A, g[..., None])[..., 0])
        x_new = x + step
        # Trial residual + Jacobian at the candidate: on accept both are
        # the NEXT iteration's cache (no recompute); on reject the old
        # (r, J) carry forward, so a rejected step costs one extra
        # evaluation bundle only — never a second Jacobian at x.
        r_new, J_new = jac_and_res(x_new)
        f_new = 0.5 * jnp.sum(jnp.square(r_new), axis=-1)
        accept = (f_new < f) & ~done
        x = jnp.where(accept[:, None], x_new, x)
        r = jnp.where(accept[:, None], r_new, r)
        J = jnp.where(accept[:, None, None], J_new, J)
        lam = jnp.where(
            accept, jnp.maximum(lam / 3.0, 1e-9), jnp.minimum(lam * 4.0, 1e8)
        )
        improved = f - f_new
        done_new = done | (accept & (improved < ftol))
        # A point that rejects 6 consecutive steps is at a (possibly
        # flat) local minimum within numeric resolution — freeze it.
        stalled = jnp.where(accept, 0, stalled + 1)
        done_new = done_new | (stalled >= 6)
        f = jnp.where(accept, f_new, f)
        it = it + jnp.where(done, 0, 1)
        return x, f, r, J, lam, it, done_new, stalled

    def cond(state):
        _, _, _, _, _, it, done, _ = state
        return (~jnp.all(done)) & (jnp.max(it) < max_iters)

    r0, J0 = jac_and_res(x0)
    f0 = 0.5 * jnp.sum(jnp.square(r0), axis=-1)
    init = (
        x0,
        f0,
        r0,
        J0,
        jnp.full((n,), lambda0, dtype=x0.dtype),
        jnp.zeros(n, dtype=jnp.int32),
        jnp.zeros(n, dtype=bool),
        jnp.zeros(n, dtype=jnp.int32),
    )
    x, f, _, _, _, it, done, _ = jax.lax.while_loop(cond, body, init)
    return LMResult(x=x, fun=f, n_iter=it, converged=done)


class DAResult(NamedTuple):
    x: jnp.ndarray          # (n, d) best point per element
    fun: jnp.ndarray        # (n,) best value per element
    n_iter: jnp.ndarray     # (n,) annealing iterations run
    converged: jnp.ndarray  # (n,) whether the temperature floor was hit


@partial(
    jax.jit,
    static_argnames=("f", "max_iters", "static_args"),
)
def dual_annealing_batched(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lower_bounds: jnp.ndarray,
    upper_bounds: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    max_iters: int = 250,
    initial_temp: float = 5230.0,
    restart_temp_ratio: float = 2e-5,
    visit: float = 2.62,
    accept: float = -5.0,
    seed: int = 0,
    args: tuple = (),
    static_args: tuple = (),
) -> DAResult:
    """Batched generalized simulated annealing (dual-annealing family).

    One independent annealing chain per batch element, all in lockstep
    under a single ``jit`` — the TPU equivalent of the reference's
    per-pattern ``scipy.optimize.dual_annealing`` loop
    (``/root/reference/src/kikuchipy/indexing/_refinement/_solvers.py:
    333-380``). Same algorithm family and role (Tsallis/GSA: a
    distorted-Cauchy visiting distribution whose reach shrinks with the
    temperature schedule ``T(t) = T0 (2^(qv-1) - 1) / ((1+t)^(qv-1) -
    1)``, generalized-Metropolis acceptance with parameter ``accept``,
    and temperature restarts), data-parallel across map points. The
    per-sample visiting math is this framework's own batched
    formulation, not a numerical clone of SciPy's; as in the reference
    the annealing output should be polished by a local solver
    (``refine_orientation`` runs the batched Nelder-Mead afterwards,
    mirroring scipy's ``no_local_search=False`` default).

    Parameters
    ----------
    f
        Batched objective ``(n, d) -> (n,)``.
    lower_bounds, upper_bounds
        ``(n, d)`` (or broadcastable) box bounds; candidates are
        wrapped back into the box (GSA convention).
    x0
        Optional ``(n, d)`` starting points (defaults to the box
        centre).
    max_iters
        Annealing iterations (static).
    initial_temp, restart_temp_ratio, visit, accept
        GSA parameters (scipy defaults).
    """
    lb = jnp.asarray(lower_bounds, dtype=jnp.float32)
    ub = jnp.asarray(upper_bounds, dtype=jnp.float32)
    if x0 is not None:
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n, d = x0.shape
    else:
        if lb.ndim != 2:
            raise ValueError("x0 or 2D bounds required to fix the batch size")
        n, d = lb.shape
    lb = jnp.broadcast_to(lb, (n, d))
    ub = jnp.broadcast_to(ub, (n, d))
    span = ub - lb
    if x0 is None:
        x0 = lb + 0.5 * span

    if args or static_args:
        base_f = f
        f = lambda x: base_f(x, *args, *static_args)

    qv = visit
    qa = accept
    t_restart = initial_temp * restart_temp_ratio

    def visit_step(key, temp):
        """Heavy-tailed visiting displacement, scaled to the box: a
        Tsallis-distorted Cauchy — gaussian over a gaussian raised to
        the (qv-1)/(3-qv) power. The spread follows (T/T0)^0.75 so the
        chain still takes ~1e-3-of-span refining steps when the
        schedule has cooled by ~1e-4 (the raw GSA exponent freezes the
        walk orders of magnitude earlier, leaving only the coarse
        warm-phase best — scipy avoids that by running local searches
        during annealing; the batched equivalent is a finer tail plus
        the Nelder-Mead polish the refinement wrapper always runs)."""
        k1, k2 = jax.random.split(key)
        g1 = jax.random.normal(k1, (n, d), dtype=jnp.float32)
        g2 = jax.random.normal(k2, (n, d), dtype=jnp.float32)
        expo = (qv - 1.0) / (3.0 - qv)
        den = jnp.maximum(jnp.abs(g2), 1e-12) ** expo
        scale = (temp / jnp.float32(initial_temp)) ** 0.75
        step = 0.5 * scale * g1 / den
        return jnp.clip(step, -1e8, 1e8)

    def body(state):
        it, key, x_cur, e_cur, x_best, e_best, since_restart = state
        # GSA temperature schedule over the iterations since the last
        # restart.
        tt = since_restart.astype(jnp.float32)
        temp = jnp.float32(
            initial_temp * (2.0 ** (qv - 1.0) - 1.0)
        ) / ((jnp.float32(2.0) + tt) ** jnp.float32(qv - 1.0) - 1.0)
        key, k_visit, k_accept = jax.random.split(key, 3)
        step = visit_step(k_visit, jnp.mean(temp))
        x_new = x_cur + step * span
        # Wrap into the box (annealing convention: periodic wrap keeps
        # the visiting distribution unbiased near the bounds).
        x_new = lb + jnp.mod(x_new - lb, jnp.maximum(span, 1e-12))
        e_new = f(x_new)

        d_e = e_new - e_cur
        # Generalized Metropolis acceptance.
        pqa = 1.0 - (1.0 - qa) * d_e / jnp.maximum(temp, 1e-12)
        p_accept = jnp.where(
            pqa > 0.0,
            jnp.exp(jnp.log(jnp.maximum(pqa, 1e-30)) / (1.0 - qa)),
            0.0,
        )
        u = jax.random.uniform(k_accept, (n,), dtype=jnp.float32)
        take = (d_e < 0.0) | (u < p_accept)
        x_cur = jnp.where(take[:, None], x_new, x_cur)
        e_cur = jnp.where(take, e_new, e_cur)
        better = e_cur < e_best
        x_best = jnp.where(better[:, None], x_cur, x_best)
        e_best = jnp.minimum(e_cur, e_best)

        # Temperature restart (scipy: reanneal once T drops below
        # initial_temp * restart_temp_ratio); the chain resumes from
        # the best point found so far.
        restart = temp < t_restart
        x_cur = jnp.where(restart, x_best, x_cur)
        e_cur = jnp.where(restart, e_best, e_cur)
        since_restart = jnp.where(restart, 0, since_restart + 1)
        return it + 1, key, x_cur, e_cur, x_best, e_best, since_restart

    def cond(state):
        it = state[0]
        return it < max_iters

    e0 = f(x0)
    init = (
        jnp.int32(0),
        jax.random.key(seed),
        x0,
        e0,
        x0,
        e0,
        jnp.int32(0),
    )
    it, _, _, _, x_best, e_best, _ = jax.lax.while_loop(cond, body, init)
    return DAResult(
        x=x_best,
        fun=e_best,
        n_iter=jnp.full((n,), it, dtype=jnp.int32),
        converged=jnp.ones((n,), dtype=bool),
    )


class BHResult(NamedTuple):
    x: jnp.ndarray          # (n, d) best point per element
    fun: jnp.ndarray        # (n,) best value per element
    n_iter: jnp.ndarray     # (n,) total local-minimizer iterations
    converged: jnp.ndarray  # (n,) all hops' local minimizations converged


def basinhopping_batched(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    niter: int = 10,
    temperature: float = 1.0,
    stepsize=0.5,
    local_max_iters: int = 60,
    fatol: float = 1e-5,
    xatol: float = 1e-4,
    lower_bounds: jnp.ndarray | None = None,
    upper_bounds: jnp.ndarray | None = None,
    seed: int = 0,
    args: tuple = (),
    static_args: tuple = (),
) -> BHResult:
    """Batched basin-hopping: one independent hop chain per element.

    The real algorithm (not a DE alias): local minimization from the
    current point, then ``niter`` rounds of (random displacement →
    local minimization → Metropolis accept at ``temperature``), with
    the global best tracked per element — the reference's
    ``scipy.optimize.basinhopping`` per-pattern loop
    (``/root/reference/src/kikuchipy/indexing/_refinement/_solvers.py:
    440-446``; registry ``_refinement/__init__.py:45-49``) vectorized
    across map points. The local minimizer is the batched Nelder-Mead
    (same as ``minimize_kwargs={}``'s derivative-free role here), each
    hop is one batched NM call reusing a single compilation, and the
    displacement/accept state stays on device. SciPy's adaptive
    step-size tuning (interval=50 at 100+ hops) is intentionally not
    reproduced: refinement hops operate inside a degrees-scale trust
    region where a fixed step is the behaviorally relevant contract.

    Parameters
    ----------
    f
        Batched objective ``(n, d) -> (n,)``.
    x0
        ``(n, d)`` initial points.
    niter
        Number of hops after the initial local minimization.
    temperature
        Metropolis acceptance temperature (scipy default 1.0).
    stepsize
        Scalar or ``(d,)`` maximum displacement per coordinate
        (uniform in ``[-stepsize, stepsize]``, scipy's
        ``RandomDisplacement``).
    lower_bounds, upper_bounds
        Optional box constraints applied to hop candidates and inside
        the local minimizer (scipy's basinhopping is unbounded —
        ``supports_bounds: False`` in the reference registry — but the
        refinement wrappers pass the trust region through so hops
        cannot leave it).
    """
    x0 = jnp.asarray(x0, dtype=jnp.float32)
    n, d = x0.shape
    step = jnp.broadcast_to(
        jnp.asarray(stepsize, dtype=jnp.float32), (d,)
    )

    def clip(x):
        if lower_bounds is not None:
            x = jnp.maximum(x, jnp.asarray(lower_bounds, x.dtype))
        if upper_bounds is not None:
            x = jnp.minimum(x, jnp.asarray(upper_bounds, x.dtype))
        return x

    def local_min(x):
        return nelder_mead_batched(
            f,
            x,
            max_iters=local_max_iters,
            fatol=fatol,
            xatol=xatol,
            lower_bounds=lower_bounds,
            upper_bounds=upper_bounds,
            args=args,
            static_args=static_args,
        )

    res0 = local_min(x0)
    x_cur, f_cur = res0.x, res0.fun
    x_best, f_best = x_cur, f_cur
    n_iter = res0.n_iter
    converged = res0.converged

    key = jax.random.key(seed)
    inv_t = 1.0 / max(float(temperature), 1e-12)
    for _ in range(niter):
        key, k_disp, k_acc = jax.random.split(key, 3)
        disp = jax.random.uniform(
            k_disp, (n, d), dtype=jnp.float32, minval=-1.0, maxval=1.0
        ) * step
        res = local_min(clip(x_cur + disp))
        # Metropolis: always take improvements; accept uphill moves
        # with probability exp(-(f_new - f_cur) / T) (scipy Metropolis).
        p = jnp.exp(jnp.minimum(-(res.fun - f_cur) * inv_t, 0.0))
        take = jax.random.uniform(k_acc, (n,), dtype=jnp.float32) < p
        x_cur = jnp.where(take[:, None], res.x, x_cur)
        f_cur = jnp.where(take, res.fun, f_cur)
        better = res.fun < f_best
        x_best = jnp.where(better[:, None], res.x, x_best)
        f_best = jnp.minimum(res.fun, f_best)
        n_iter = n_iter + res.n_iter
        converged = converged & res.converged

    return BHResult(x=x_best, fun=f_best, n_iter=n_iter, converged=converged)


class SHGOResult(NamedTuple):
    x: jnp.ndarray          # (n, d) best point per element
    fun: jnp.ndarray        # (n,) best value per element
    n_iter: jnp.ndarray     # (n,) total local-minimizer iterations
    converged: jnp.ndarray  # (n,) all starts' local minimizations converged


def shgo_batched(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lower_bounds: jnp.ndarray,
    upper_bounds: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    n_samples: int = 64,
    n_starts: int = 4,
    local_max_iters: int = 60,
    fatol: float = 1e-5,
    xatol: float = 1e-4,
    args: tuple = (),
    static_args: tuple = (),
) -> SHGOResult:
    """Batched SHGO-style global search over box bounds.

    The reference exposes ``scipy.optimize.shgo`` (simplicial homology
    global optimization; registry ``_refinement/__init__.py:60-64``):
    sample the box with a space-covering set, identify locally-minimal
    sample points, and polish each with a local minimizer, returning
    the best. This is that sampling variant (scipy's
    ``sampling_method='sobol'`` mode) batched across map points: a
    scrambled-Halton low-discrepancy set of ``n_samples`` points per
    element (plus ``x0`` when given), evaluated with batched objective
    calls; the ``n_starts`` best-scoring candidates each seed a batched
    Nelder-Mead, and the best polished result wins. The simplicial
    triangulation of scipy's default mode is host-combinatorial with no
    data-parallel equivalent — the sobol mode is scipy's own documented
    alternative for exactly this situation (expensive objectives).

    Parameters
    ----------
    f
        Batched objective ``(n, d) -> (n,)``.
    lower_bounds, upper_bounds
        ``(n, d)`` (or broadcastable ``(d,)``) box bounds (shgo
        requires finite bounds, as in scipy).
    x0
        Optional ``(n, d)`` known-good starts included as sampling
        candidates (the dictionary-indexing solution).
    n_samples
        Space-covering sample count per element.
    n_starts
        Number of best candidates polished with the local minimizer.
    """
    lb = jnp.asarray(lower_bounds, dtype=jnp.float32)
    ub = jnp.asarray(upper_bounds, dtype=jnp.float32)
    if x0 is not None:
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n, d = x0.shape
    else:
        if lb.ndim != 2:
            raise ValueError("x0 or 2D bounds required to fix the batch size")
        n, d = lb.shape
    lb = jnp.broadcast_to(lb, (n, d))
    ub = jnp.broadcast_to(ub, (n, d))

    if args or static_args:
        base_f = f
        fx = lambda x: base_f(x, *args, *static_args)
    else:
        fx = f

    # Scrambled-Halton unit-cube samples, shared across elements (the
    # per-element boxes differ, so the scaled points do not): a true
    # low-discrepancy set — deterministic, no Date/seed dependence.
    from scipy.stats import qmc

    unit = jnp.asarray(
        qmc.Halton(d=d, scramble=True, seed=7).random(n_samples),
        dtype=jnp.float32,
    )  # (S, d)

    def eval_at(u):
        # u: (d,) unit-cube point -> (n,) objective at the scaled point
        return fx(lb + u[None, :] * (ub - lb))

    vals = jax.lax.map(eval_at, unit)  # (S, n)
    if x0 is not None:
        x0c = jnp.clip(x0, lb, ub)
        vals = jnp.concatenate([fx(x0c)[None, :], vals], axis=0)

    # n_starts best sample points per element.
    order = jnp.argsort(vals, axis=0)[:n_starts]  # (n_starts, n)

    def candidate(i):
        idx = order[i]  # (n,)
        if x0 is not None:
            scaled = jnp.concatenate(
                [x0c[None], lb[None] + unit[:, None, :] * (ub - lb)[None]],
                axis=0,
            )  # (S+1, n, d)
        else:
            scaled = lb[None] + unit[:, None, :] * (ub - lb)[None]
        return jnp.take_along_axis(
            scaled, idx[None, :, None], axis=0
        )[0]  # (n, d)

    x_best = None
    f_best = None
    n_iter = jnp.zeros(n, dtype=jnp.int32)
    converged = jnp.ones(n, dtype=bool)
    for i in range(n_starts):
        res = nelder_mead_batched(
            f,
            candidate(i),
            max_iters=local_max_iters,
            fatol=fatol,
            xatol=xatol,
            lower_bounds=lb,
            upper_bounds=ub,
            args=args,
            static_args=static_args,
        )
        if x_best is None:
            x_best, f_best = res.x, res.fun
        else:
            better = res.fun < f_best
            x_best = jnp.where(better[:, None], res.x, x_best)
            f_best = jnp.minimum(res.fun, f_best)
        n_iter = n_iter + res.n_iter
        converged = converged & res.converged

    return SHGOResult(x=x_best, fun=f_best, n_iter=n_iter, converged=converged)


class DEResult(NamedTuple):
    x: jnp.ndarray          # (n, d) best member per element
    fun: jnp.ndarray        # (n,) best value per element
    n_iter: jnp.ndarray     # (n,) generations until convergence
    converged: jnp.ndarray  # (n,) convergence mask


@partial(
    jax.jit,
    static_argnames=("f", "popsize", "max_iters", "static_args"),
)
def differential_evolution_batched(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lower_bounds: jnp.ndarray,
    upper_bounds: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    popsize: int = 16,
    max_iters: int = 60,
    tol: float = 1e-3,
    mutation: float = 0.8,
    recombination: float = 0.9,
    seed: int = 0,
    args: tuple = (),
    static_args: tuple = (),
) -> DEResult:
    """Batched differential evolution (rand/1/bin) over box bounds.

    Runs an independent DE population for every batch element in
    lockstep under one ``jit`` — the TPU equivalent of the reference's
    per-map-point ``scipy.optimize.differential_evolution`` loop
    (``/root/reference/src/kikuchipy/indexing/_refinement/_solvers.py:
    216-228``, called once per pattern inside a Dask chunk). Same
    algorithm family and semantics (bounds-constrained global search;
    SciPy-style relative convergence ``std(energies) <= atol +
    tol*|mean(energies)|`` per element), vectorized across map points.

    Parameters
    ----------
    f
        Batched objective: maps ``(n, d)`` points to ``(n,)`` values,
        element ``i`` of the output depending only on row ``i`` (the
        population axis is evaluated by ``lax.map`` over members, so
        device memory stays at the single-population level).
    lower_bounds, upper_bounds
        ``(n, d)`` (or broadcastable ``(d,)``) box bounds; the search
        is confined to the box (trust region in the refinement use).
    x0
        Optional ``(n, d)`` known-good starts seeded as member 0 of
        each population (the dictionary-indexing solution).
    popsize
        Members per population. SciPy's default is ``15*d`` trials via
        latin hypercube; here starts are dictionary-indexing quality,
        so a small population suffices and keeps the per-generation
        cost at ``popsize`` batched projections.
    mutation, recombination
        Differential weight F and crossover probability CR.
    seed
        PRNG seed (fold into :func:`jax.random.key`).

    Notes
    -----
    Each generation evaluates ``popsize`` batched trials sequentially
    via ``lax.map``; converged elements are frozen (their trials still
    evaluate — lockstep uniformity — but results are masked out).
    """
    lb = jnp.asarray(lower_bounds, dtype=jnp.float32)
    ub = jnp.asarray(upper_bounds, dtype=jnp.float32)
    if x0 is not None:
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n, d = x0.shape
    else:
        if lb.ndim != 2:
            raise ValueError("x0 or 2D bounds required to fix the batch size")
        n, d = lb.shape
    lb = jnp.broadcast_to(lb, (n, d))
    ub = jnp.broadcast_to(ub, (n, d))

    if args or static_args:
        base_f = f
        f = lambda x: base_f(x, *args, *static_args)

    def eval_pop(pop):
        # pop: (n, P, d) -> (n, P); sequential over members, batched
        # over elements (each member eval is one full batched kernel).
        return jax.lax.map(f, jnp.swapaxes(pop, 0, 1)).T

    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    pop = lb[:, None, :] + jax.random.uniform(
        k_init, (n, popsize, d), dtype=jnp.float32
    ) * (ub - lb)[:, None, :]
    if x0 is not None:
        pop = pop.at[:, 0, :].set(jnp.clip(x0, lb, ub))
    energies = eval_pop(pop)

    def body(state):
        pop, energies, key, it, done = state
        key, k1, k2, k3 = jax.random.split(key, 4)
        # rand/1: three distinct members r1 != r2 != r3 (!= i is not
        # enforced, matching scipy's default 'randtobest1bin'-family
        # leniency on self-selection; P >= 4 keeps collisions rare and
        # harmless — a collided trial just degenerates to crossover).
        r = jax.random.randint(k1, (3, n, popsize), 0, popsize)
        take = lambda idx: jnp.take_along_axis(pop, idx[..., None], axis=1)
        mutant = take(r[0]) + mutation * (take(r[1]) - take(r[2]))
        cross = jax.random.uniform(k2, (n, popsize, d)) < recombination
        # Guarantee >= 1 mutant coordinate per trial (scipy's fill_point).
        forced = jax.nn.one_hot(
            jax.random.randint(k3, (n, popsize), 0, d), d, dtype=bool
        )
        trial = jnp.clip(jnp.where(cross | forced, mutant, pop), lb[:, None], ub[:, None])
        f_trial = eval_pop(trial)
        accept = (f_trial <= energies) & ~done[:, None]
        pop = jnp.where(accept[..., None], trial, pop)
        energies = jnp.where(accept, f_trial, energies)
        mean_e = jnp.mean(energies, axis=1)
        done_new = done | (
            jnp.std(energies, axis=1) <= 1e-8 + tol * jnp.abs(mean_e)
        )
        it = it + jnp.where(done, 0, 1)
        return pop, energies, key, it, done_new

    def cond(state):
        _, _, _, it, done = state
        return (~jnp.all(done)) & (jnp.max(it) < max_iters)

    init = (pop, energies, key, jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))
    pop, energies, _, it, done = jax.lax.while_loop(cond, body, init)

    best = jnp.argmin(energies, axis=1)
    x_best = jnp.take_along_axis(pop, best[:, None, None], axis=1)[:, 0]
    f_best = jnp.take_along_axis(energies, best[:, None], axis=1)[:, 0]
    return DEResult(x=x_best, fun=f_best, n_iter=it, converged=done)
