"""Quaternion algebra as pure JAX functions.

Unit quaternions ``q = (a, b, c, d)`` with scalar part first, following the
conventions of the reference's small rotation kernel tier
(``/root/reference/src/kikuchipy/_utils/numba.py:26-81``). All functions are
``jit``/``vmap`` friendly: no Python branching on traced values, static
shapes throughout.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "from_euler",
    "from_rodrigues",
    "from_axis_angle",
    "rotate_vector",
    "multiply",
    "conjugate",
    "to_matrix",
    "from_matrix",
    "angle_between",
    "to_euler",
]


def from_euler(euler: jnp.ndarray) -> jnp.ndarray:
    """Convert Bunge (ZXZ) Euler angles (radians) to unit quaternions.

    Parameters
    ----------
    euler
        Array of shape ``(..., 3)`` with angles ``(alpha, beta, gamma)``.

    Returns
    -------
    Quaternions of shape ``(..., 4)`` with non-negative scalar part.

    Notes
    -----
    Matches ``rotation_from_euler`` (reference ``_utils/numba.py:44-56``).
    """
    alpha = euler[..., 0]
    beta = euler[..., 1]
    gamma = euler[..., 2]
    sigma = 0.5 * (alpha + gamma)
    delta = 0.5 * (alpha - gamma)
    c = jnp.cos(0.5 * beta)
    s = jnp.sin(0.5 * beta)
    q = jnp.stack(
        [
            c * jnp.cos(sigma),
            -s * jnp.cos(delta),
            -s * jnp.sin(delta),
            -c * jnp.sin(sigma),
        ],
        axis=-1,
    )
    return jnp.where(q[..., :1] < 0, -q, q)


def to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions to Bunge (ZXZ) Euler angles (radians).

    Inverse of :func:`from_euler`; the gimbal-locked case (``beta`` close
    to 0 or pi) resolves to ``gamma = 0``.
    """
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    q03 = a * a + d * d
    q12 = b * b + c * c
    chi = jnp.sqrt(q03 * q12)

    # General case
    alpha_g = jnp.arctan2(b * d - a * c, -a * b - c * d)
    beta_g = jnp.arctan2(2 * chi, q03 - q12)
    gamma_g = jnp.arctan2(a * c + b * d, c * d - a * b)

    # beta = 0 (q12 ~ 0): rotation purely about Z
    alpha_0 = jnp.arctan2(-2 * a * d, a * a - d * d)
    # beta = pi (q03 ~ 0)
    alpha_pi = jnp.arctan2(2 * b * c, b * b - c * c)

    eps = 1e-12
    alpha = jnp.where(q12 < eps, alpha_0, jnp.where(q03 < eps, alpha_pi, alpha_g))
    beta = jnp.where(q12 < eps, 0.0, jnp.where(q03 < eps, jnp.pi, beta_g))
    gamma = jnp.where(chi < eps, 0.0, gamma_g)
    return jnp.stack([alpha, beta, gamma], axis=-1)


def from_rodrigues(r: jnp.ndarray) -> jnp.ndarray:
    """Convert Rodrigues vectors ``(..., 3)`` to unit quaternions.

    Matches ``rotation_from_rodrigues`` (reference ``_utils/numba.py:27-40``).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(r), axis=-1, keepdims=True))
    half_angle = jnp.arctan(norm)
    s = jnp.sin(half_angle)
    a = jnp.cos(half_angle)
    bcd = jnp.where(norm > 0, s * r / norm, jnp.zeros_like(r))
    q = jnp.concatenate([a, bcd], axis=-1)
    return jnp.where(q[..., :1] < 0, -q, q)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion for a rotation of ``angle`` (radians, scalar or
    broadcastable to the leading axes of ``axis``) about ``axis``."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jnp.asarray(angle, dtype=axis.dtype)
    half = jnp.broadcast_to(0.5 * angle[..., None] if angle.ndim else
                            0.5 * angle, axis.shape[:-1] + (1,))
    return jnp.concatenate(
        [jnp.cos(half), jnp.sin(half) * axis], axis=-1
    )


def rotate_vector(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v (..., 3)`` by quaternions ``q (..., 4)``.

    Broadcasting follows NumPy rules over the leading axes. Matches the
    reference's ``rotate_vector`` formula exactly
    (``_utils/numba.py:62-81``); this is the active rotation by ``q``
    (``to_matrix(q) @ v``), used by the master-pattern projector to move
    detector direction cosines into the crystal frame.
    """
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    ac, ab, ad = a * c, a * b, a * d
    bc, bd, cd = b * c, b * d, c * d
    ox = (aa + bb - cc - dd) * x + 2 * ((ac + bd) * z + (bc - ad) * y)
    oy = (aa - bb + cc - dd) * y + 2 * ((ad + bc) * x + (cd - ab) * z)
    oz = (aa - bb - cc + dd) * z + 2 * ((ab + cd) * y + (bd - ac) * x)
    return jnp.stack([ox, oy, oz], axis=-1)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``q1 * q2`` over broadcastable ``(..., 4)``."""
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate ``(a, -b, -c, -d)``."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions ``(..., 4)`` to rotation matrices ``(..., 3, 3)``.

    The matrix ``M`` satisfies ``M @ v == rotate_vector(q, v)`` (same
    rotation, matrix form; pinned numerically in
    ``tests/test_spherical.py``).
    """
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    ab, ac, ad = a * b, a * c, a * d
    bc, bd, cd = b * c, b * d, c * d
    row0 = jnp.stack([aa + bb - cc - dd, 2 * (bc - ad), 2 * (bd + ac)], axis=-1)
    row1 = jnp.stack([2 * (bc + ad), aa - bb + cc - dd, 2 * (cd - ab)], axis=-1)
    row2 = jnp.stack([2 * (bd - ac), 2 * (cd + ab), aa - bb - cc + dd], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices ``(..., 3, 3)`` to unit quaternions.

    Branchless Shepperd-style extraction; returns the quaternion with
    non-negative scalar part.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate extractions; pick the numerically safest.
    qa = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qb = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qc = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qd = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    case = jnp.argmax(diag, axis=-1)[..., None]
    q = jnp.select(
        [case == 0, case == 1, case == 2, case == 3],
        [qa, qb, qc, qd],
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def angle_between(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (radians) between two unit quaternions."""
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))
