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
    "cu2ho",
    "cubochoric_sampling",
    "get_sample_fundamental",
    "ho2qu",
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


# ----------------------- Cubochoric sampling ----------------------- #
# The reference's dictionaries come from orix's cubochoric grid
# (``orix.sampling.get_sample_fundamental``, used in
# /root/reference/benchmarks/indexing/test_dictionary_indexing.py:38);
# this is the same Rosca-De Graef equal-volume cube-to-ball mapping
# (Rosca, Morawiec & De Graef, MSMSE 22 (2014) 075013), with the
# homochoric inversion solved exactly by bisection instead of orix/
# EMsoft's 16-coefficient polynomial fit.

_AP = np.pi ** (2.0 / 3.0)  # cubochoric cube edge length
_A_LAM = np.pi ** (5.0 / 6.0) / 6.0 ** (1.0 / 6.0)
_BETA = _A_LAM / 2.0
_SC = _A_LAM / _AP
_R1 = (3.0 * np.pi / 4.0) ** (1.0 / 3.0)  # homochoric ball radius
_PREK = _R1 * 2.0 ** 0.25 / _BETA
_PRED = np.sqrt(6.0 / np.pi)


def cu2ho(cu: np.ndarray) -> np.ndarray:
    """Cubochoric -> homochoric coordinates (vectorized forward map;
    face center (0, 0, ap/2) maps to (0, 0, R1), the 180-degree
    rotation about z)."""
    cu = np.atleast_2d(np.asarray(cu, dtype=np.float64))
    x, y, z = cu[:, 0], cu[:, 1], cu[:, 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    pyr_z = (ax <= az) & (ay <= az)
    pyr_x = ~pyr_z & (az <= ax) & (ay <= ax)
    pyr_y = ~pyr_z & ~pyr_x

    # Permute so the largest-|.| component is the local z.
    X = np.where(pyr_z, x, np.where(pyr_x, y, z))
    Y = np.where(pyr_z, y, np.where(pyr_x, z, x))
    Z = np.where(pyr_z, z, np.where(pyr_x, x, y))

    X, Y, Z = X * _SC, Y * _SC, Z * _SC

    swap = np.abs(Y) > np.abs(X)
    U = np.where(swap, Y, X)
    V = np.where(swap, X, Y)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.pi / 12.0 * np.where(U != 0, V / U, 0.0)
    c, s = np.cos(q), np.sin(q)
    with np.errstate(divide="ignore", invalid="ignore"):
        qq = _PREK * U / np.sqrt(np.sqrt(2.0) - c)
    T1p = (np.sqrt(2.0) * c - 1.0) * qq
    T2p = np.sqrt(2.0) * s * qq
    T1 = np.where(swap, T2p, T1p)
    T2 = np.where(swap, T1p, T2p)

    c2 = T1 * T1 + T2 * T2
    with np.errstate(divide="ignore", invalid="ignore"):
        s2 = np.pi * c2 / (24.0 * Z * Z)
        c3 = np.sqrt(np.pi) * c2 / np.sqrt(24.0) / Z
    qz = np.sqrt(np.maximum(1.0 - s2, 0.0))
    hx = T1 * qz
    hy = T2 * qz
    hz = _PRED * Z - c3
    zero = (ax == 0) & (ay == 0) & (az == 0)
    hx, hy, hz = (np.where(zero, 0.0, v) for v in (hx, hy, hz))

    # Invert the pyramid permutation.
    ox = np.where(pyr_z, hx, np.where(pyr_x, hz, hy))
    oy = np.where(pyr_z, hy, np.where(pyr_x, hx, hz))
    oz = np.where(pyr_z, hz, np.where(pyr_x, hy, hx))
    return np.stack([ox, oy, oz], axis=-1)


def ho2qu(ho: np.ndarray, n_bisect: int = 60) -> np.ndarray:
    """Homochoric -> unit quaternions; the rotation angle solves
    ``|h| = (3/4 (w - sin w))^(1/3)`` exactly (bisection)."""
    ho = np.atleast_2d(np.asarray(ho, dtype=np.float64))
    hm = np.linalg.norm(ho, axis=-1)
    target = np.clip(hm, 0.0, _R1) ** 3
    lo = np.zeros_like(target)
    hi = np.full_like(target, np.pi)
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        f = 0.75 * (mid - np.sin(mid))
        lo = np.where(f < target, mid, lo)
        hi = np.where(f < target, hi, mid)
    omega = 0.5 * (lo + hi)
    with np.errstate(divide="ignore", invalid="ignore"):
        axis = np.where(hm[:, None] > 0, ho / hm[:, None], 0.0)
    q = np.concatenate(
        [np.cos(omega / 2.0)[:, None], axis * np.sin(omega / 2.0)[:, None]],
        axis=-1,
    )
    q[hm == 0] = [1.0, 0.0, 0.0, 0.0]
    return q


def cubochoric_sampling(
    semi_edge_steps: int | None = None, resolution: float | None = None
) -> np.ndarray:
    """All ``(2N+1)^3`` cubochoric grid quaternions (EMsoft/orix grid:
    ``N = ceil(131.97049 / (resolution_deg - 0.03732))``)."""
    if semi_edge_steps is None:
        if resolution is None:
            raise ValueError("Pass semi_edge_steps or resolution")
        # orix's EMsoft-derived relation (number of 100+ degree... the
        # constant maps resolution in degrees to semi-edge steps):
        # ceil(131.97049 / res - 0.03732) -> 22 steps at 6 deg, giving
        # the reference benchmark's "about 3600" m-3m orientations.
        semi_edge_steps = int(np.ceil(131.97049 / resolution - 0.03732))
    n = semi_edge_steps
    step = (_AP / 2.0) / n
    grid = np.arange(-n, n + 1, dtype=np.float64) * step
    cu = np.stack(
        np.meshgrid(grid, grid, grid, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    return ho2qu(cu2ho(cu))


def get_sample_fundamental(
    resolution: float = 2.0,
    point_group: PointGroup | str = "m-3m",
    method: str = "cubochoric",
) -> np.ndarray:
    """Orientations sampling the fundamental zone, orix-compatible
    entry point (``orix.sampling.get_sample_fundamental``): cubochoric
    grid at ``resolution`` degrees reduced to the point group's
    fundamental zone. ``method="super_fibonacci"`` selects this
    framework's spiral sampling instead."""
    if isinstance(point_group, str):
        point_group = get_point_group(point_group)
    if method == "super_fibonacci":
        return sample_fundamental_zone(resolution, point_group)
    if method != "cubochoric":
        raise ValueError(
            f"method must be 'cubochoric' or 'super_fibonacci', got {method!r}"
        )
    quats = cubochoric_sampling(resolution=resolution)
    keep = np.zeros(quats.shape[0], dtype=bool)
    batch = 1 << 19
    for start in range(0, quats.shape[0], batch):
        block = quats[start : start + batch]
        keep[start : start + block.shape[0]] = in_fundamental_zone(
            block, point_group
        )
    return quats[keep]
