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
        # Stored as a NumPy array: a jnp array created while tracing a
        # user's jit (plans are built lazily inside ops) would leak a
        # tracer through the plan cache. jit converts it per call.
        self.transfer_function = np.asarray(rfft2(window_pad))
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


class SeparableFilterPlan:
    """Dense-matmul formulation of :class:`FFTFilterPlan` for separable
    (rank-1) windows: ``out = R @ pattern @ C.T``.

    The Barnes pipeline (replicate-pad -> circular FFT convolution ->
    offset crop; reference ``filters/fft_barnes.py:119-177``) is linear
    and, for a window ``outer(ky, kx)``, separable per axis — so each
    axis folds into one small dense operator built on host in float64:
    ``crop . circulant(kernel) . pad``. On TPU this replaces batched
    small FFTs (which XLA lowers poorly) with two MXU matmuls per
    pattern, mathematically identical to the FFT path up to float
    round-off.
    """

    def __init__(self, image_shape: tuple[int, int], window: np.ndarray):
        window = np.asarray(window, dtype=np.float64)
        u, s, vt = np.linalg.svd(window)
        if window.ndim != 2 or (s.size > 1 and s[1] > 1e-12 * s[0]):
            raise ValueError("SeparableFilterPlan requires a rank-1 window")
        ky = u[:, 0] * s[0]
        kx = vt[0]
        self.image_shape = tuple(int(v) for v in image_shape)
        plan = FFTFilterPlan(image_shape, window)
        self.fft_shape = plan.fft_shape

        def axis_operator(n, f, kernel, n_last, n_first, crop0):
            w = kernel.shape[0]
            pad = np.zeros((f, n))
            pad[np.arange(n), np.arange(n)] = 1.0
            pad[n : n + n_last, n - 1] = 1.0
            if n_first:
                pad[f - n_first :, 0] = 1.0
            # Circular convolution with the flipped kernel laid out at
            # the start of the padded axis (what the rfft multiply by
            # the padded window's transfer function computes).
            kern_pad = np.zeros(f)
            kern_pad[:w] = kernel[::-1]
            i = np.arange(f)
            circ = kern_pad[(i[:, None] - i[None, :]) % f]
            return (circ @ pad)[crop0 : crop0 + n]

        (iy, ix), (fy, fx) = self.image_shape, plan.fft_shape
        wy, wx = plan.window_shape
        oy_b, ox_b = plan.offset_before
        oy_a, ox_a = plan.offset_after
        # NumPy-stored for the same tracer-safety reason as
        # FFTFilterPlan.transfer_function.
        self.row_op = np.asarray(
            axis_operator(iy, fy, ky, (wy - 1) // 2, oy_b, oy_a),
            dtype=np.float32,
        )
        self.col_op = np.asarray(
            axis_operator(ix, fx, kx, (wx - 1) // 2, ox_b, ox_a),
            dtype=np.float32,
        )


@jax.jit
def separable_filter(
    patterns: jnp.ndarray, row_op: jnp.ndarray, col_op: jnp.ndarray
) -> jnp.ndarray:
    """Apply a :class:`SeparableFilterPlan`: two dense matmuls per
    pattern at ``Precision.HIGHEST``."""
    x = patterns.astype(jnp.float32)
    return jnp.einsum(
        "ab,...bc,dc->...ad",
        row_op,
        x,
        col_op,
        precision=jax.lax.Precision.HIGHEST,
    )


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
