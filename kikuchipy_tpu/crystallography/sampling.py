"""Uniform orientation sampling of the fundamental zone.

The reference defers dictionary orientation sampling to
``orix.sampling.get_sample_fundamental`` (cubochoric grid; see SURVEY.md
§7). Here we sample SO(3) with **Super-Fibonacci spirals** (Alexa, CVPR
2022) — a closed-form, arbitrary-N, low-discrepancy sampling of the
rotation group that is at least as uniform as a cubochoric grid and
trivially vectorizable — then keep the samples inside the point group's
fundamental zone (rotations whose angle cannot be reduced by any proper
symmetry operation).

The total sample count is calibrated against the cubochoric grid the
reference's ecosystem uses: ``N = ceil(131.97049 / (res_deg - 0.03732))``
semi-edge steps give a ``(2N+1)^3`` grid over SO(3) (EMsoft's relation),
so we draw the same total and reduce by the group order.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from kikuchipy_tpu.crystallography.symmetry import PointGroup, get_point_group

__all__ = [
    "super_fibonacci",
    "in_fundamental_zone",
    "sample_fundamental_zone",
    "reduce_to_fundamental_zone",
    "disorientation_angle",
]

_PHI = np.sqrt(2.0)
_PSI = 1.533751168755204288118041  # root of psi^4 = psi + 4


def super_fibonacci(n: int, dtype=np.float64) -> np.ndarray:
    """``n`` quaternions covering SO(3) with low discrepancy
    (Super-Fibonacci spirals, Alexa 2022)."""
    s = np.arange(n, dtype=dtype) + 0.5
    t = s / n
    d = 2 * np.pi * s
    r = np.sqrt(t)
    R = np.sqrt(1.0 - t)
    alpha = d / _PHI
    beta = d / _PSI
    q = np.stack(
        [r * np.sin(alpha), r * np.cos(alpha), R * np.sin(beta), R * np.cos(beta)],
        axis=-1,
    )
    # Canonical hemisphere (q ~ -q)
    return np.where(q[:, :1] < 0, -q, q)


def _symmetry_w_abs(quats: jnp.ndarray, sym: jnp.ndarray) -> jnp.ndarray:
    """|scalar part| of ``sym_j * q_i`` for all pairs -> (n, m)."""
    a1, b1, c1, d1 = sym[:, 0], sym[:, 1], sym[:, 2], sym[:, 3]
    a2, b2, c2, d2 = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    w = (
        a1[None, :] * a2[:, None]
        - b1[None, :] * b2[:, None]
        - c1[None, :] * c2[:, None]
        - d1[None, :] * d2[:, None]
    )
    return jnp.abs(w)


def in_fundamental_zone(
    quats: np.ndarray | jnp.ndarray, point_group: PointGroup | str
) -> np.ndarray:
    """Boolean mask: which quaternions lie in the fundamental zone
    (their rotation angle is minimal over all symmetric equivalents)."""
    if isinstance(point_group, str):
        point_group = get_point_group(point_group)
    q = jnp.asarray(quats)
    sym = jnp.asarray(point_group.rotations)
    w = _symmetry_w_abs(q, sym)
    w0 = jnp.abs(q[:, 0])
    # In FZ iff no symmetric variant has a larger scalar part (i.e. a
    # smaller rotation angle). Boundary ties resolve toward membership.
    return np.asarray(w0 + 1e-12 >= jnp.max(w, axis=1))


def reduce_to_fundamental_zone(
    quats: np.ndarray | jnp.ndarray, point_group: PointGroup | str
) -> np.ndarray:
    """Map each quaternion to its fundamental-zone representative
    (the symmetric equivalent with maximal scalar part)."""
    if isinstance(point_group, str):
        point_group = get_point_group(point_group)
    q = jnp.asarray(quats)
    sym = jnp.asarray(point_group.rotations)

    # q_eq[i, j] = sym_j * q_i. Crystal symmetry acts on the LEFT in the
    # projector's convention: rotate_vector(s q, v) projects the same
    # pattern as rotate_vector(q, v) for any proper symmetry s, since
    # the master pattern is invariant under s in the crystal frame.
    a1, b1, c1, d1 = (sym[None, :, k] for k in range(4))
    a2, b2, c2, d2 = (q[:, k:k + 1] for k in range(4))
    eq = jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )  # (n, m, 4)
    eq = jnp.where(eq[..., :1] < 0, -eq, eq)
    best = jnp.argmax(eq[..., 0], axis=1)
    out = jnp.take_along_axis(eq, best[:, None, None], axis=1)[:, 0]
    return np.asarray(out)


def disorientation_angle(
    q1: np.ndarray | jnp.ndarray,
    q2: np.ndarray | jnp.ndarray,
    point_group: PointGroup | str,
) -> np.ndarray:
    """Smallest rotation angle (radians) between orientations ``q1`` and
    ``q2`` modulo the proper crystal symmetry of ``point_group``.

    Crystal symmetry acts on the left (``q ~ s q``, see
    :func:`reduce_to_fundamental_zone`), so the disorientation angle is
    ``min_s angle(q1^-1 s q2) = 2 acos max_s |<q1, s q2>|`` (the real
    part of ``a^-1 b`` for unit quaternions is their 4D dot product).
    """
    if isinstance(point_group, str):
        point_group = get_point_group(point_group)
    q1 = jnp.asarray(q1)
    q2 = jnp.asarray(q2)
    sym = jnp.asarray(point_group.rotations)
    # s * q2 for all s: (..., n_sym, 4)
    a1, b1, c1, d1 = (sym[:, k] for k in range(4))
    a2, b2, c2, d2 = (q2[..., None, k] for k in range(4))
    sq2 = jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )
    w = jnp.sum(q1[..., None, :] * sq2, axis=-1)
    wmax = jnp.max(jnp.abs(w), axis=-1)
    return np.asarray(2.0 * jnp.arccos(jnp.clip(wmax, 0.0, 1.0)))


def sample_fundamental_zone(
    resolution_deg: float,
    point_group: PointGroup | str = "m-3m",
    batch: int = 1 << 19,
) -> np.ndarray:
    """Sample the fundamental zone of ``point_group`` with mean
    orientation spacing ~``resolution_deg``.

    Returns unit quaternions ``(n, 4)`` (float64). For m-3m at 6 deg
    this gives ~4.3k orientations, matching the density of the
    cubochoric grid used in the reference's benchmarks
    (``/root/reference/benchmarks/indexing/test_dictionary_indexing.py``).
    """
    if isinstance(point_group, str):
        point_group = get_point_group(point_group)
    semi_steps = int(np.ceil(131.97049 / (resolution_deg - 0.03732)))
    n_total = (2 * semi_steps + 1) ** 3
    quats = super_fibonacci(n_total)
    keep = np.zeros(n_total, dtype=bool)
    for start in range(0, n_total, batch):
        block = quats[start : start + batch]
        keep[start : start + block.shape[0]] = in_fundamental_zone(
            block, point_group
        )
    return quats[keep]
