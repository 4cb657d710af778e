"""Navigation-neighborhood kernels: neighbour-pattern averaging and
neighbour dot-product maps.

TPU-native re-design of the reference's ``map_overlap``/
``generic_filter`` machinery (``/root/reference/src/kikuchipy/signals/
ebsd.py:943-1111`` and ``signals/util/_map_helper.py``): instead of halo
exchange + per-point Python callbacks, each window offset becomes one
shifted whole-map elementwise op, so the full map is processed as a few
dozen fused vector operations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kikuchipy_tpu.filters.window import Window
from kikuchipy_tpu.utils.dtypes import get_dtype_range

__all__ = [
    "average_neighbour_patterns",
    "neighbour_dot_product_matrices",
    "average_dot_product_map",
]


def _resolve_window(window, window_shape, **kwargs) -> np.ndarray:
    if isinstance(window, np.ndarray):
        w = np.asarray(window, dtype=np.float64)
    else:
        w = np.asarray(
            Window(window or "circular", shape=window_shape, **kwargs),
            dtype=np.float64,
        )
    if w.ndim == 1:
        w = w[:, None]
    return w


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift the two leading (navigation) axes of ``x`` by (dy, dx) with
    zero fill; also return the validity mask of shape (ny, nx)."""
    ny, nx = x.shape[0], x.shape[1]
    x = jnp.roll(x, (dy, dx), axis=(0, 1))
    row = jnp.arange(ny)
    col = jnp.arange(nx)
    valid_r = (row - dy >= 0) & (row - dy < ny)
    valid_c = (col - dx >= 0) & (col - dx < nx)
    mask = valid_r[:, None] & valid_c[None, :]
    x = jnp.where(mask.reshape((ny, nx) + (1,) * (x.ndim - 2)), x, 0.0)
    return x, mask


@partial(jax.jit, static_argnames=("offsets", "weights", "dtype_out"))
def _average_impl(patterns, offsets, weights, dtype_out):
    # Accumulate in float64 when available (mirrors scipy.ndimage's
    # internal f64 accumulation in the reference's correlate path) and
    # cast to float32 before the divide + rescale.
    acc_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    acc = jnp.zeros(patterns.shape, dtype=acc_dtype)
    norm = jnp.zeros(patterns.shape[:2], dtype=acc_dtype)
    p = patterns.astype(jnp.float32).astype(acc_dtype)
    for (dy, dx), w in zip(offsets, weights):
        shifted, mask = _shift2d(p, dy, dx)
        acc = acc + w * shifted
        norm = norm + w * mask
    out = acc.astype(jnp.float32) / norm.astype(jnp.float32)[:, :, None, None]
    omin, omax = get_dtype_range(np.dtype(dtype_out))
    imin = jnp.min(out, axis=(-2, -1), keepdims=True)
    imax = jnp.max(out, axis=(-2, -1), keepdims=True)
    out = (out - imin) / (imax - imin) * (omax - omin) + omin
    return out.astype(np.dtype(dtype_out))


def average_neighbour_patterns(
    patterns: jnp.ndarray,
    window=None,
    window_shape: tuple[int, ...] = (3, 3),
    dtype_out=None,
    **kwargs,
) -> jnp.ndarray:
    """Average each pattern with its neighbours, weighted by ``window``
    (map borders zero-extended, weight normalization per position), then
    rescale each pattern to the output dtype range.

    Matches the reference's ``EBSD.average_neighbour_patterns``
    (``signals/ebsd.py:943``, correlation + per-position window sums).
    """
    patterns = jnp.asarray(patterns)
    if patterns.ndim != 4:
        raise ValueError(
            f"patterns must be 4D (ny, nx, sy, sx); got shape {patterns.shape}"
        )
    if dtype_out is None:
        dtype_out = np.asarray(patterns).dtype
    w = _resolve_window(window, window_shape, **kwargs)
    if w.shape in ((1,), (1, 1)):
        return patterns
    oy, ox = w.shape[0] // 2, w.shape[1] // 2
    offsets = []
    weights = []
    for iy in range(w.shape[0]):
        for ix in range(w.shape[1]):
            if w[iy, ix] != 0:
                # correlate: out[p] = sum_k w[k] in[p + k - origin]
                # -> shift input by -(k - origin)
                offsets.append((oy - iy, ox - ix))
                weights.append(float(w[iy, ix]))
    return _average_impl(
        patterns, tuple(offsets), tuple(weights), np.dtype(dtype_out).name
    )


def _normalized_maps(patterns, zero_mean: bool, normalize: bool):
    p = jnp.asarray(patterns).astype(jnp.float32)
    if zero_mean:
        p = p - jnp.mean(p, axis=(-2, -1), keepdims=True)
    if normalize:
        p = p / jnp.sqrt(jnp.sum(jnp.square(p), axis=(-2, -1), keepdims=True))
    return p


@partial(jax.jit, static_argnames=("offsets", "zero_mean", "normalize"))
def _dot_products_impl(patterns, offsets, zero_mean, normalize):
    p = _normalized_maps(patterns, zero_mean, normalize)
    ny, nx = p.shape[:2]
    out = []
    for dy, dx in offsets:
        shifted, mask = _shift2d(p, dy, dx)
        dp = jnp.sum(p * shifted, axis=(-2, -1))
        out.append(jnp.where(mask, dp, jnp.nan))
    return jnp.stack(out, axis=-1)  # (ny, nx, n_offsets)


def _window_offsets(w: np.ndarray) -> tuple[list, int]:
    """Nonzero window offsets (neighbor shift per coefficient) and the
    index of the origin among them."""
    oy, ox = w.shape[0] // 2, w.shape[1] // 2
    offsets = []
    center = -1
    for iy in range(w.shape[0]):
        for ix in range(w.shape[1]):
            if w[iy, ix] != 0:
                if (iy, ix) == (oy, ox):
                    center = len(offsets)
                offsets.append((oy - iy, ox - ix))
    return offsets, center


def neighbour_dot_product_matrices(
    patterns: jnp.ndarray,
    window=None,
    window_shape: tuple[int, ...] = (3, 3),
    zero_mean: bool = True,
    normalize: bool = True,
    **kwargs,
) -> np.ndarray:
    """Matrices of dot products between each pattern and its window
    neighbours, shape ``(ny, nx, wy, wx)``; NaN where the window
    coefficient is zero or the neighbour is outside the map.

    Matches ``EBSD.get_neighbour_dot_product_matrices``
    (reference ``signals/ebsd.py:1221`` + ``_map_helper.py:186``).
    """
    patterns = jnp.asarray(patterns)
    if patterns.ndim != 4:
        raise ValueError(
            f"patterns must be 4D (ny, nx, sy, sx); got shape {patterns.shape}"
        )
    w = _resolve_window(window, window_shape, **kwargs)
    offsets, center = _window_offsets(w)
    dps = np.asarray(
        _dot_products_impl(patterns, tuple(offsets), zero_mean, normalize)
    )
    ny, nx = dps.shape[:2]
    out = np.full((ny, nx, w.shape[0], w.shape[1]), np.nan, dtype=np.float32)
    k = 0
    oy, ox = w.shape[0] // 2, w.shape[1] // 2
    for iy in range(w.shape[0]):
        for ix in range(w.shape[1]):
            if w[iy, ix] != 0:
                out[:, :, iy, ix] = dps[:, :, k]
                k += 1
    return out


def average_dot_product_map(
    patterns: jnp.ndarray,
    window=None,
    window_shape: tuple[int, ...] = (3, 3),
    zero_mean: bool = True,
    normalize: bool = True,
    **kwargs,
) -> np.ndarray:
    """Average dot product (ADP) map: mean dot product between each
    pattern and its window neighbours (origin excluded).

    Matches ``EBSD.get_average_neighbour_dot_product_map``
    (reference ``signals/ebsd.py:1377`` + ``_map_helper.py:255``).
    """
    patterns = jnp.asarray(patterns)
    if patterns.ndim != 4:
        raise ValueError(
            f"patterns must be 4D (ny, nx, sy, sx); got shape {patterns.shape}"
        )
    w = _resolve_window(window, window_shape, **kwargs)
    offsets, center = _window_offsets(w)
    neighbor_offsets = tuple(
        off for i, off in enumerate(offsets) if i != center
    )
    dps = np.asarray(
        _dot_products_impl(patterns, neighbor_offsets, zero_mean, normalize)
    )
    return np.nanmean(dps, axis=-1)
