"""Master-pattern projection: detector direction cosines and batched
projection of EBSD patterns from square-Lambert master patterns.

This is the core kernel shared by dictionary generation and orientation
refinement. TPU-native design: one fused, ``vmap``-batched pipeline
(quaternion rotate -> Lambert -> bilinear gather) over all (rotation,
pixel) pairs, with both hemispheres packed into a single texture so the
hemisphere select is part of the gather index instead of a branch.

Math matches the reference Numba kernels in
``/root/reference/src/kikuchipy/signals/util/_master_pattern.py``:
``_get_direction_cosines_for_fixed_pc`` (:133), ``_for_varying_pc``
(:216), ``_project_single_pattern_from_master_pattern`` (:449),
``_get_lambert_interpolation_parameters`` (:580) and
``_get_pixel_from_master_pattern`` (:682).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kikuchipy_tpu.geometry.lambert import SQRT_PI_HALF, vector_to_lambert
from kikuchipy_tpu.geometry.quaternion import rotate_vector

__all__ = [
    "direction_cosines",
    "direction_cosines_from_detector",
    "lambert_interpolation_weights",
    "project_patterns",
    "project_single_pattern",
]


def direction_cosines(
    gnomonic_bounds: jnp.ndarray,
    pcz: jnp.ndarray,
    nrows: int,
    ncols: int,
    om_detector_to_sample: jnp.ndarray,
    signal_mask: np.ndarray | None = None,
) -> jnp.ndarray:
    """Unit direction cosines from the beam source to detector pixels, in
    the sample frame.

    Parameters
    ----------
    gnomonic_bounds
        ``(4,)`` or ``(n_pc, 4)`` bounds ``[x0, x1, y0, y1]`` in gnomonic
        coordinates.
    pcz
        Scalar or ``(n_pc,)`` PC z coordinate(s).
    nrows, ncols
        Detector shape (static).
    om_detector_to_sample
        ``(3, 3)`` rotation matrix detector->sample frame.
    signal_mask
        Optional *static* boolean mask of shape ``(nrows * ncols,)``
        selecting pixels (host-side compress; keeps device shapes static).

    Returns
    -------
    ``(n_pixels, 3)`` for a single PC or ``(n_pc, n_pixels, 3)`` for
    multiple PCs.

    Notes
    -----
    Matches ``_get_direction_cosines_for_fixed_pc`` / ``_for_varying_pc``
    (reference ``signals/util/_master_pattern.py:133-295``): pixel centers
    are offset half a pixel from an ``arange`` over the gnomonic bounds,
    with the y axis decreasing from the top bound.
    """
    gnomonic_bounds = jnp.asarray(gnomonic_bounds)
    squeeze = gnomonic_bounds.ndim == 1
    gb = jnp.atleast_2d(gnomonic_bounds)
    pcz_arr = jnp.reshape(jnp.asarray(pcz), (-1, 1))

    idx = np.arange(nrows * ncols)
    if signal_mask is not None:
        idx = idx[np.asarray(signal_mask).ravel()]
    rows = jnp.asarray(idx // ncols)
    cols = jnp.asarray(idx % ncols)

    x_scale = (gb[:, 1:2] - gb[:, 0:1]) / ncols
    y_scale = (gb[:, 3:4] - gb[:, 2:3]) / nrows
    # Pixel centers: arange over the bounds plus a half step.
    x = (gb[:, 0:1] + cols[None, :] * x_scale + x_scale / 2) * pcz_arr
    y = (gb[:, 3:4] - rows[None, :] * y_scale - y_scale / 2) * pcz_arr
    z = jnp.broadcast_to(pcz_arr, x.shape)
    r = jnp.stack([x, y, z], axis=-1)

    r = r @ om_detector_to_sample.T
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    return r[0] if squeeze else r


def direction_cosines_from_detector(
    detector, signal_mask: np.ndarray | None = None, dtype=jnp.float32
) -> jnp.ndarray:
    """Direction cosines for an :class:`~kikuchipy_tpu.geometry.detector.
    EBSDDetector` (host geometry -> device array).

    Single-PC detectors give ``(n_pixels, 3)``; multi-PC detectors give
    ``(nav_size, n_pixels, 3)``. Mirrors
    ``_get_direction_cosines_from_detector`` (reference
    ``signals/util/_master_pattern.py:83-124``).
    """
    import jax as _jax

    f64 = jnp.float64 if _jax.config.jax_enable_x64 else jnp.float32
    om = jnp.asarray(detector.detector_to_sample, dtype=f64)
    if detector.navigation_size == 1:
        gb = jnp.asarray(
            np.asarray(detector.gnomonic_bounds, dtype=np.float64).reshape(4)
        )
        pcz = jnp.asarray(float(np.asarray(detector.pcz).reshape(())))
    else:
        gb = jnp.asarray(
            np.asarray(detector.gnomonic_bounds, dtype=np.float64).reshape(-1, 4)
        )
        pcz = jnp.asarray(np.asarray(detector.pcz, dtype=np.float64).ravel())
    dc = direction_cosines(
        gb, pcz, detector.nrows, detector.ncols, om, signal_mask=signal_mask
    )
    return dc.astype(dtype)


def lambert_interpolation_weights(
    v: jnp.ndarray, npx: int, npy: int, scale: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bilinear interpolation indices and weights on the square-Lambert
    master-pattern grid for unit vectors ``v (..., 3)``.

    Returns ``(nii, nij, niip, nijp, weights)`` where ``weights`` is
    ``(..., 4)`` ordered ``(dim*djm, di*djm, dim*dj, di*dj)`` matching the
    four taps of ``_get_pixel_from_master_pattern`` (reference
    ``signals/util/_master_pattern.py:682-708``).
    """
    xy = scale * vector_to_lambert(v) / SQRT_PI_HALF
    i = xy[..., 1]
    j = xy[..., 0]

    # int32 truncation of (coord + scale); coords are >= 0 so this floors,
    # matching the reference's dtype() cast.
    nii = (i + scale).astype(jnp.int32)
    nij = (j + scale).astype(jnp.int32)
    niip = jnp.minimum(nii + 1, npx - 1)
    nijp = jnp.minimum(nij + 1, npy - 1)
    nii = jnp.where(nii < 0, niip, nii)
    nij = jnp.where(nij < 0, nijp, nij)

    di = i - nii.astype(i.dtype) + scale
    dj = j - nij.astype(j.dtype) + scale
    # Clamp the fractional offsets: for points outside the Lambert
    # square both taps collapse to the clamped index, so the row/col
    # "+1" weight must vanish (keeps the quad-texture gather below
    # exact; the 4-tap sum is unchanged since dim + di == 1 there).
    di = jnp.clip(di, 0.0, 1.0)
    dj = jnp.clip(dj, 0.0, 1.0)
    dim = 1.0 - di
    djm = 1.0 - dj
    weights = jnp.stack([dim * djm, di * djm, dim * dj, di * dj], axis=-1)
    return nii, nij, niip, nijp, weights


def _bilinear_gather(
    master: jnp.ndarray,
    hemi: jnp.ndarray,
    nii: jnp.ndarray,
    nij: jnp.ndarray,
    niip: jnp.ndarray,
    nijp: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Gather the 2x2 bilinear neighborhoods from the packed
    (2, npy, npx) master and blend. ``hemi`` is 0 (upper) or 1 (lower)
    per pixel.

    TPU note: XLA's element gather runs at ~115M elem/s on v5e, so the
    four independent tap gathers dominated projection (2.08 s for
    16384x3600 pixels). Packing each 2x2 neighborhood into a "quad
    texture" (edge rows/cols replicated, matching the clamped indices)
    fetches all four taps in ONE gather with slice size 4 -- measured
    5.0x faster (419 ms -> 39.1k patterns/s) with bit-identical taps.
    ``niip``/``nijp`` are accepted for signature compatibility; the
    replication makes them implicit."""
    del niip, nijp
    npy, npx = master.shape[-2], master.shape[-1]
    m = master
    m_i1 = jnp.concatenate([m[:, 1:], m[:, -1:]], axis=1)
    quad = jnp.stack(
        [
            m,
            m_i1,
            jnp.concatenate([m[:, :, 1:], m[:, :, -1:]], axis=2),
            jnp.concatenate([m_i1[:, :, 1:], m_i1[:, :, -1:]], axis=2),
        ],
        axis=-1,
    )
    flat_quad = quad.reshape(-1, 4)
    idx = hemi * (npy * npx) + nii * npx + nij
    taps = jnp.take(flat_quad, idx, axis=0)
    return jnp.sum(taps * weights, axis=-1)


@partial(jax.jit, static_argnames=("npx", "npy", "rescale"))
def project_patterns(
    rotations: jnp.ndarray,
    dc: jnp.ndarray,
    master: jnp.ndarray,
    npx: int,
    npy: int,
    scale: float,
    rescale: bool = False,
    out_min: float = 0.0,
    out_max: float = 1.0,
) -> jnp.ndarray:
    """Project a batch of EBSD patterns from a master pattern.

    Parameters
    ----------
    rotations
        ``(n, 4)`` unit quaternions.
    dc
        Direction cosines, ``(n_pixels, 3)`` (fixed PC, shared by all
        rotations) or ``(n, n_pixels, 3)`` (one PC per rotation).
    master
        Packed hemispheres ``(2, npy, npx)``: ``master[0]`` upper,
        ``master[1]`` lower.
    npx, npy
        Master pattern shape (static).
    scale
        ``(npx - 1) / 2`` (see reference ``signals/ebsd_master_pattern.py:
        253-255``).
    rescale
        Whether to min/max-rescale each projected pattern to
        ``[out_min, out_max]``.

    Returns
    -------
    Patterns ``(n, n_pixels)`` in the dtype of ``dc``/``master`` promoted.
    """
    if dc.ndim == 2:
        rotated = rotate_vector(rotations[:, None, :], dc[None, :, :])
    else:
        rotated = rotate_vector(rotations[:, None, :], dc)

    nii, nij, niip, nijp, weights = lambert_interpolation_weights(
        rotated, npx, npy, scale
    )
    hemi = (rotated[..., 2] < 0).astype(jnp.int32)
    patterns = _bilinear_gather(master, hemi, nii, nij, niip, nijp, weights)

    if rescale:
        imin = jnp.min(patterns, axis=-1, keepdims=True)
        imax = jnp.max(patterns, axis=-1, keepdims=True)
        patterns = (patterns - imin) / (imax - imin) * (out_max - out_min) + out_min
    return patterns


def project_single_pattern(
    rotation: jnp.ndarray,
    dc: jnp.ndarray,
    master: jnp.ndarray,
    npx: int,
    npy: int,
    scale: float,
    **kwargs,
) -> jnp.ndarray:
    """Project one pattern (convenience wrapper over
    :func:`project_patterns`)."""
    return project_patterns(
        rotation[None], dc, master, npx, npy, scale, **kwargs
    )[0]
