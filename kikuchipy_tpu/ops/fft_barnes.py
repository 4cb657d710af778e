"""Barnes FFT image filtering (frequency-domain convolution with
replicated-edge padding), batched over patterns.

Host-side setup computes the optimal real-FFT shape and the window's
transfer function once per (pattern shape, window); the device kernel then
pads, FFTs, multiplies, inverse-FFTs and crops each pattern under ``vmap``
with static shapes. Behavior matches the reference
(``/root/reference/src/kikuchipy/filters/fft_barnes.py``): window flipped
into the top-left corner (:97-104), the specific replicate-pad layout of
``_pad_image`` (:119-152), and the offset crop (:155-177).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.fft import next_fast_len, rfft2

__all__ = ["fft_filter_setup", "barnes_fft_filter", "FFTFilterPlan"]


class FFTFilterPlan:
    """Precomputed plan for :func:`barnes_fft_filter`."""

    def __init__(
        self,
        image_shape: tuple[int, int],
        window: np.ndarray,
    ) -> None:
        window = np.asarray(window, dtype=np.float64)
        wy, wx = window.shape
        iy, ix = image_shape
        fft_shape = (
            next_fast_len(iy + wy - 1, real=True),
            next_fast_len(ix + wx - 1, real=True),
        )
        window_pad = np.zeros(fft_shape, dtype=np.float32)
        window_pad[:wy, :wx] = np.flipud(np.fliplr(window))
        self.image_shape = (int(iy), int(ix))
        self.window_shape = (int(wy), int(wx))
        self.fft_shape = fft_shape
        self.transfer_function = jnp.asarray(rfft2(window_pad))
        # Offsets: how much of the far end of the padded array replicates
        # the first row/column (before FFT) and where to crop after IFFT.
        self.offset_before = (wy - (wy - 1) // 2 - 1, wx - (wx - 1) // 2 - 1)
        self.offset_after = ((wy - 1) // 2, (wx - 1) // 2)


def fft_filter_setup(
    image_shape: tuple[int, int], window: np.ndarray
) -> FFTFilterPlan:
    """Build an :class:`FFTFilterPlan` for filtering ``image_shape``
    patterns with ``window``."""
    return FFTFilterPlan(image_shape, window)


def _replicate_pad_axis(
    x: jnp.ndarray, axis: int, total: int, n_last: int, n_first: int
) -> jnp.ndarray:
    """Pad ``x`` along ``axis`` to length ``total`` with the layout
    ``[x, last-slice * n_last, zeros, first-slice * n_first]``."""
    n = x.shape[axis]
    n_zero = total - n - n_last - n_first
    parts = [x]
    if n_last > 0:
        last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        parts.append(jnp.repeat(last, n_last, axis=axis))
    if n_zero > 0:
        shape = list(x.shape)
        shape[axis] = n_zero
        parts.append(jnp.zeros(shape, dtype=x.dtype))
    if n_first > 0:
        first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        parts.append(jnp.repeat(first, n_first, axis=axis))
    return jnp.concatenate(parts, axis=axis)


@partial(jax.jit, static_argnames=("fft_shape", "window_shape", "offsets"))
def _barnes_filter_impl(
    patterns: jnp.ndarray,
    transfer_function: jnp.ndarray,
    fft_shape: tuple[int, int],
    window_shape: tuple[int, int],
    offsets: tuple[int, int, int, int],
) -> jnp.ndarray:
    oy_b, ox_b, oy_a, ox_a = offsets
    wy, wx = window_shape
    iy, ix = patterns.shape[-2], patterns.shape[-1]
    x = patterns.astype(jnp.float32)
    # Replicate-pad rows then columns; sequential padding reproduces the
    # corner fills of the reference's _pad_image.
    x = _replicate_pad_axis(x, -2, fft_shape[0], (wy - 1) // 2, oy_b)
    x = _replicate_pad_axis(x, -1, fft_shape[1], (wx - 1) // 2, ox_b)
    x_fft = jnp.fft.rfft2(x, axes=(-2, -1))
    out = jnp.fft.irfft2(x_fft * transfer_function, s=fft_shape, axes=(-2, -1))
    return out[..., oy_a : oy_a + iy, ox_a : ox_a + ix]


def barnes_fft_filter(patterns: jnp.ndarray, plan: FFTFilterPlan) -> jnp.ndarray:
    """Filter a batch of patterns ``(..., sy, sx)`` with a precomputed
    plan. Returns float32 patterns of the same shape."""
    return _barnes_filter_impl(
        patterns,
        plan.transfer_function,
        plan.fft_shape,
        plan.window_shape,
        plan.offset_before + plan.offset_after,
    )
