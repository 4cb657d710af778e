"""Spherical-harmonic master-pattern projection (EMSphInx-style).

An ALTERNATIVE projector to the bilinear Lambert gather of
:mod:`kikuchipy_tpu.projection.master_pattern`: the master pattern is
expanded once in real spherical harmonics, a crystal rotation becomes a
block-diagonal rotation of the coefficient vector (real Wigner-D,
built by the Ivanic-Ruedenberg recursion), and pattern synthesis at the
fixed detector directions is ONE dense matmul

    patterns = (D(q) c) @ B.T,        B = Y_lm(d_i)  fixed per detector

— i.e. the whole projector runs on the MXU with zero gathers. On v5e
the bilinear-gather projector tops out at ~140M samples/s (its gathers
cannot be vectorized in Mosaic either); the harmonic projector is
matmul-bound instead. This mirrors the indexing formulation of EMSphInx
(Lenthe, Singh & De Graef, "A spherical harmonic transform approach to
the indexing of electron back-scattered diffraction patterns",
Ultramicroscopy 207 (2019) 112841) re-designed for TPU: batched
coefficient rotation + one synthesis matmul per pattern batch.

Accuracy: a band limit ``L`` resolves features of ~180/L degrees; the
harmonic patterns converge to the bilinear projector's as L grows (NCC
> 0.99 at L = 88 on the 401 px nickel master; see
tests/test_spherical.py). Band-limiting smooths the sharp Kikuchi band
edges slightly — for refinement that SMOOTHS THE OBJECTIVE, it does not
bias band geometry. The bilinear projector remains the conformance
default (bit-compatible with the reference); this one is the speed
option (``EBSDMasterPattern.spherical_projector``).

Conventions: real spherical harmonics with Condon-Shortley-free
normalization, basis order ``idx = l^2 + (m + l)`` (m = -l..l); the
l = 1 block transforms like the coordinates in (y, z, x) order. The
coefficient rotation satisfies ``synth(rotate_coeffs(q, c), d) =
synth(c, R(q)^T d)`` with ``R(q)`` the active rotation matrix of
``geometry.quaternion.rotate_vector`` — exactly the sampling the
gather projector performs (it samples the master at ``R(q) d`` with
the reference's conjugation convention; see
``projection/master_pattern.py:project_patterns``).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "sh_basis",
    "sh_analysis_lambert",
    "rotate_coefficients",
    "SphericalProjector",
]


def sh_basis(dirs: np.ndarray, L: int) -> np.ndarray:
    """Real spherical harmonics ``Y_lm`` at unit vectors (host NumPy).

    Parameters
    ----------
    dirs
        ``(n, 3)`` unit vectors.
    L
        Band limit (inclusive).

    Returns
    -------
    ``(n, (L+1)^2)`` float64, column ``l^2 + m + l`` holding ``Y_lm``.

    Notes
    -----
    Fully normalized (``integral Y^2 = 1``), no Condon-Shortley phase:
    ``Y_l0 = N_l0 P_l0``, ``Y_l,+m = sqrt(2) N_lm P_lm cos(m phi)``,
    ``Y_l,-m = sqrt(2) N_lm P_lm sin(m phi)``. Stable column-wise
    recursion in the fully normalized associated Legendre functions.
    """
    dirs = np.asarray(dirs, dtype=np.float64)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    s = np.sqrt(np.maximum(1.0 - z * z, 0.0))  # sin(theta)
    # cos(m phi), sin(m phi) with r*cos/sin to avoid phi at the poles:
    # use (cos1, sin1) = (x, y)/s where s > 0, else 0 (P_lm has s^m
    # factor so the azimuth is irrelevant at the poles for m > 0).
    safe_s = np.where(s > 0, s, 1.0)
    c1 = np.where(s > 0, x / safe_s, 1.0)
    s1 = np.where(s > 0, y / safe_s, 0.0)

    n = dirs.shape[0]
    out = np.empty((n, (L + 1) * (L + 1)), dtype=np.float64)

    # N_mm recursion (fully normalized, CS-phase-free):
    # N_00 = sqrt(1/(4 pi)); N_mm = sqrt((2m+1)/(2m)) * s * N_(m-1)(m-1)
    pmm = np.full(n, np.sqrt(1.0 / (4.0 * np.pi)))
    cm = np.ones(n)   # cos(m phi)
    sm = np.zeros(n)  # sin(m phi)
    for m in range(L + 1):
        if m > 0:
            pmm = pmm * np.sqrt((2 * m + 1) / (2.0 * m)) * s
            cm, sm = cm * c1 - sm * s1, sm * c1 + cm * s1
        # l = m term
        amp = np.sqrt(2.0) if m > 0 else 1.0
        p_prev = np.zeros(n)  # N_(m-1)m is zero
        p_curr = pmm
        for l in range(m, L + 1):
            base = l * l + l
            out[:, base + m] = amp * p_curr * cm
            if m > 0:
                out[:, base - m] = amp * p_curr * sm
            if l < L:
                a = np.sqrt(
                    (4.0 * (l + 1) ** 2 - 1.0) / ((l + 1) ** 2 - m * m)
                )
                b = np.sqrt(
                    ((2.0 * l + 3.0) * ((l) ** 2 - m * m))
                    / ((2.0 * l - 1.0) * ((l + 1) ** 2 - m * m))
                )
                p_next = a * z * p_curr - b * p_prev
                p_prev, p_curr = p_curr, p_next
    return out


def _r1_from_matrix(mat: np.ndarray) -> np.ndarray:
    """l = 1 real-SH rotation block from 3x3 rotation matrices
    ``(..., 3, 3)``: the (m = -1, 0, 1) basis transforms like
    (y, z, x)."""
    perm = [1, 2, 0]
    return mat[..., perm, :][..., :, perm]


@lru_cache(maxsize=None)
def _uvw_tables(l: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ivanic-Ruedenberg u, v, w coefficient tables ``(2l+1, 2l+1)``
    indexed [m + l, n + l] (J. Phys. Chem. 100 (1996) 6342 + erratum)."""
    mm = np.arange(-l, l + 1, dtype=np.float64)[:, None]
    nn = np.arange(-l, l + 1, dtype=np.float64)[None, :]
    denom = np.where(np.abs(nn) < l, (l + nn) * (l - nn), (2.0 * l) * (2 * l - 1))
    am = np.abs(mm)
    u = np.sqrt((l + mm) * (l - mm) / denom)
    d_m0 = (mm == 0).astype(np.float64)
    v = (
        0.5
        * np.sqrt((1.0 + d_m0) * (l + am - 1.0) * (l + am) / denom)
        * (1.0 - 2.0 * d_m0)
    )
    w = -0.5 * np.sqrt((l - am - 1.0) * (l - am) / denom) * (1.0 - d_m0)
    # w is zero for |m| in {l-1, l}: the sqrt argument is clamped >= 0.
    w = np.nan_to_num(w)
    u = np.nan_to_num(u)
    v = np.nan_to_num(v)
    return u, v, w


def _p_stack(r1, a_prev, l):
    """P(i, a, b) tensors of the recursion, vectorized: for each
    i in {-1, 0, 1}, a (2l-1,) block plus the two |b| = l edge columns;
    returns ``(..., 3, 2l-1, 2l+1)``.

    ``r1``: (..., 3, 3) l=1 block; ``a_prev``: (..., 2l-1, 2l-1)."""
    xp = jnp if isinstance(a_prev, jnp.ndarray) else np
    # central: P(i, a, b) = r1[i, 0-index(m=0)->col 1] * a_prev[a, b]
    central = r1[..., :, 1][..., :, None, None] * a_prev[..., None, :, :]
    hi = (
        r1[..., :, 2][..., :, None] * a_prev[..., None, :, 2 * l - 2]
        - r1[..., :, 0][..., :, None] * a_prev[..., None, :, 0]
    )
    lo = (
        r1[..., :, 2][..., :, None] * a_prev[..., None, :, 0]
        + r1[..., :, 0][..., :, None] * a_prev[..., None, :, 2 * l - 2]
    )
    return xp.concatenate(
        [lo[..., None], central, hi[..., None]], axis=-1
    )


def _next_block(r1, a_prev, l):
    """One Ivanic-Ruedenberg step: the ``(2l+1, 2l+1)`` real-SH
    rotation block from the ``(2l-1, 2l-1)`` one. Works for both NumPy
    (reference/tests) and JAX (batched) inputs."""
    xp = jnp if isinstance(a_prev, jnp.ndarray) else np
    P = _p_stack(r1, a_prev, l)  # (..., 3, 2l-1, 2l+1); a in [-(l-1), l-1]
    zeros_col = xp.zeros_like(P[..., 0, :1, :])
    size = 2 * l + 1

    def pa(i, rows):
        # P(i, a=rows) padded to (..., 2l+1, 2l+1) along the m axis.
        return rows

    Pm1, P0, Pp1 = P[..., 0, :, :], P[..., 1, :, :], P[..., 2, :, :]

    # U(m, n) = P(0, m, n) for |m| <= l-1; u = 0 at |m| = l.
    U = xp.concatenate([zeros_col, P0, zeros_col], axis=-2)

    # V(m, n):
    #  m = 0:  P(1, 1, n) + P(-1, -1, n)
    #  m > 0:  P(1, m-1, n) sqrt(1 + d_{m1}) - P(-1, -m+1, n) (1 - d_{m1})
    #  m < 0:  P(1, m+1, n) (1 - d_{m,-1}) + P(-1, -m-1, n) sqrt(1 + d_{m,-1})
    # Row index in P's a-axis: a + (l-1).
    rows = []
    for m in range(-l, l + 1):
        if m == 0:
            rows.append(Pp1[..., l, :] + Pm1[..., l - 2, :])
        elif m > 0:
            t = Pp1[..., (m - 1) + (l - 1), :] * np.sqrt(1.0 + (m == 1))
            if m != 1:
                t = t - Pm1[..., (-m + 1) + (l - 1), :]
            rows.append(t)
        else:
            t = Pm1[..., (-m - 1) + (l - 1), :] * np.sqrt(1.0 + (m == -1))
            if m != -1:
                t = t + Pp1[..., (m + 1) + (l - 1), :]
            rows.append(t)
    V = xp.stack(rows, axis=-2)

    # W(m, n): m > 0: P(1, m+1, n) + P(-1, -m-1, n)
    #          m < 0: P(1, m-1, n) - P(-1, -m+1, n); w = 0 at m = 0,
    #          |m| >= l-1 (rows referencing a outside the range have
    #          w = 0, fill zeros).
    rows = []
    for m in range(-l, l + 1):
        if m > 0 and (m + 1) <= (l - 1):
            rows.append(
                Pp1[..., (m + 1) + (l - 1), :] + Pm1[..., (-m - 1) + (l - 1), :]
            )
        elif m < 0 and (-m + 1) <= (l - 1):
            rows.append(
                Pp1[..., (m - 1) + (l - 1), :] - Pm1[..., (-m + 1) + (l - 1), :]
            )
        else:
            rows.append(xp.zeros_like(P[..., 0, 0, :]))
    W = xp.stack(rows, axis=-2)

    u, v, w = _uvw_tables(l)
    if xp is jnp:
        u, v, w = jnp.asarray(u), jnp.asarray(v), jnp.asarray(w)
    return u * U + v * V + w * W


def rotation_blocks_numpy(mat: np.ndarray, L: int) -> list[np.ndarray]:
    """All real-SH rotation blocks ``R^0..R^L`` for rotation matrices
    ``(3, 3)`` (host reference implementation; see
    :func:`rotate_coefficients` for the batched JAX version)."""
    blocks = [np.ones(mat.shape[:-2] + (1, 1))]
    if L == 0:
        return blocks
    r1 = _r1_from_matrix(mat)
    blocks.append(r1)
    for l in range(2, L + 1):
        blocks.append(_next_block(r1, blocks[-1], l))
    return blocks


@partial(jax.jit, static_argnames=("L",))
def rotate_coefficients(quats: jnp.ndarray, coeffs: jnp.ndarray, L: int) -> jnp.ndarray:
    """Rotate real-SH coefficient vectors: ``(n, 4)`` unit quaternions
    applied to ``((L+1)^2,)`` coefficients -> ``(n, (L+1)^2)``.

    The returned coefficients satisfy ``synth(out_p, d) =
    synth(coeffs, R_p^T d)`` where ``R_p`` is the active rotation
    matrix of quaternion p (tests pin the convention against the
    gather projector)."""
    from kikuchipy_tpu.geometry.quaternion import to_matrix

    mat = to_matrix(quats)  # (n, 3, 3) active
    r1 = _r1_from_matrix(mat).astype(coeffs.dtype)
    n = quats.shape[0]
    out = [jnp.broadcast_to(coeffs[:1], (n, 1))]
    if L >= 1:
        out.append(
            jnp.einsum("nab,b->na", r1, coeffs[1:4], precision="highest")
        )
    block = r1
    for l in range(2, L + 1):
        block = _next_block(r1, block, l)
        cl = coeffs[l * l : l * l + 2 * l + 1]
        out.append(jnp.einsum("nab,b->na", block, cl, precision="highest"))
    return jnp.concatenate(out, axis=1)
