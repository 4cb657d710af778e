"""Square Lambert (equal-area) projection between the unit sphere and a
square grid, as pure JAX functions.

The math follows the modified square Lambert projection of Callahan &
De Graef (2013), matching the reference's Numba kernels
``_vector2lambert`` and ``_lambert2vector``
(``/root/reference/src/kikuchipy/signals/util/_master_pattern.py:531-568,
717-760``) but written branchless with ``jnp.where`` so the projector
vectorizes over all detector pixels and rotations on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["vector_to_lambert", "lambert_to_vector"]

SQRT_PI = float(np.sqrt(np.pi))
SQRT_PI_HALF = float(np.sqrt(np.pi / 2))
SQRT_PI_OVER_2 = SQRT_PI / 2
TWO_OVER_SQRT_PI = 2 / SQRT_PI


def vector_to_lambert(v: jnp.ndarray) -> jnp.ndarray:
    """Project unit vectors to square Lambert coordinates.

    Parameters
    ----------
    v
        Array of shape ``(..., 3)``; normalized internally.

    Returns
    -------
    Square Lambert ``(X, Y)`` of shape ``(..., 2)``, each in
    ``[-sqrt(pi/2), sqrt(pi/2)]``.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True))
    w = v / norm
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    abs_z = jnp.abs(z)
    sqrt_z = jnp.sqrt(jnp.maximum(2.0 * (1.0 - abs_z), 0.0))

    # Branch |y| <= |x| (guard x==0 to avoid nan from 0/0; the guard value
    # is never selected because |y|<=|x| and x==0 implies y==0, handled by
    # the pole case below).
    safe_x = jnp.where(x == 0, 1.0, x)
    sign_x = jnp.sign(x)
    x1 = sign_x * sqrt_z * SQRT_PI_OVER_2
    y1 = sign_x * sqrt_z * TWO_OVER_SQRT_PI * jnp.arctan(y / safe_x)

    # Branch |y| > |x|
    safe_y = jnp.where(y == 0, 1.0, y)
    sign_y = jnp.sign(y)
    x2 = sign_y * sqrt_z * TWO_OVER_SQRT_PI * jnp.arctan(x / safe_y)
    y2 = sign_y * sqrt_z * SQRT_PI_OVER_2

    first = jnp.abs(y) <= jnp.abs(x)
    X = jnp.where(first, x1, x2)
    Y = jnp.where(first, y1, y2)

    pole = abs_z == 1.0
    X = jnp.where(pole, 0.0, X)
    Y = jnp.where(pole, 0.0, Y)
    return jnp.stack([X, Y], axis=-1)


def lambert_to_vector(xy: jnp.ndarray) -> jnp.ndarray:
    """Inverse square Lambert projection: grid coordinates to vectors.

    Parameters
    ----------
    xy
        Array ``(..., 2)`` of square-grid coordinates scaled such that the
        grid edge maps to 1 (i.e. multiplied by ``sqrt(pi/2)`` internally).

    Returns
    -------
    Vectors ``(..., 3)``, *not* normalized (matching the reference's
    ``_lambert2vector``).
    """
    x = xy[..., 0] * SQRT_PI_HALF
    y = xy[..., 1] * SQRT_PI_HALF
    xa, ya = jnp.abs(x), jnp.abs(y)

    # Branch |x| <= |y|
    safe_y = jnp.where(y == 0, 1.0, y)
    q1 = 2.0 * y * jnp.sqrt(jnp.maximum(jnp.pi - y * y, 0.0)) / jnp.pi
    qq1 = x * jnp.pi * 0.25 / safe_y
    v1 = jnp.stack(
        [q1 * jnp.sin(qq1), q1 * jnp.cos(qq1), 1.0 - 2.0 * y * y / jnp.pi], axis=-1
    )

    # Branch |x| > |y|
    safe_x = jnp.where(x == 0, 1.0, x)
    q2 = 2.0 * x * jnp.sqrt(jnp.maximum(jnp.pi - x * x, 0.0)) / jnp.pi
    qq2 = y * jnp.pi * 0.25 / safe_x
    v2 = jnp.stack(
        [q2 * jnp.cos(qq2), q2 * jnp.sin(qq2), 1.0 - 2.0 * x * x / jnp.pi], axis=-1
    )

    v = jnp.where((xa <= ya)[..., None], v1, v2)
    pole = (jnp.maximum(xa, ya) == 0)[..., None]
    north = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(pole, north, v)
