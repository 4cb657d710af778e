"""Batched EBSD pattern kernels as pure JAX functions.

Every function operates on a batch of patterns ``(..., sy, sx)`` (any
number of leading navigation axes, including none) and is ``jit``- and
``vmap``-friendly: static shapes, no data-dependent control flow, float32
intermediates with integer storage dtypes at the edges. These replace the
per-pattern Numba kernels of the reference
(``/root/reference/src/kikuchipy/pattern/_pattern.py``); op order inside
each kernel matches the reference so integer outputs agree bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kikuchipy_tpu.ops.fft_barnes import FFTFilterPlan, barnes_fft_filter
from kikuchipy_tpu.filters.window import gaussian_window_2d
from kikuchipy_tpu.utils.dtypes import get_dtype_range

__all__ = [
    "rescale_intensity",
    "normalize_intensity",
    "remove_static_background",
    "remove_dynamic_background",
    "get_dynamic_background",
    "fft",
    "ifft",
    "fft_spectrum",
    "fft_filter",
    "fft_frequency_vectors",
    "get_image_quality",
    "bin2d",
    "downsample",
    "dynamic_background_plan",
]

_SIG_AXES = (-2, -1)


def _sig_min(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(p, axis=_SIG_AXES, keepdims=True)


def _sig_max(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(p, axis=_SIG_AXES, keepdims=True)


def _rescale_with_min_max(pattern, imin, imax, omin, omax):
    """``(p - imin) / (imax - imin) * (omax - omin) + omin`` with the
    reference's exact op order (``_pattern.py:96-111``)."""
    rescaled = (pattern - imin) / (imax - imin)
    return rescaled * (omax - omin) + omin


def rescale_intensity(
    patterns: jnp.ndarray,
    in_range: tuple[float, float] | None = None,
    out_range: tuple[float, float] | None = None,
    dtype_out=None,
    percentiles: tuple[float, float] | None = None,
    relative: bool = False,
) -> jnp.ndarray:
    """Rescale pattern intensities (per pattern) to a target range.

    Parameters mirror the reference's ``rescale_intensity``
    (``_pattern.py:31-93``): ``in_range`` clips before rescaling,
    ``percentiles`` computes a per-pattern in-range, and the output range
    defaults to the dtype range of ``dtype_out``. With ``relative``
    (reference ``_kikuchipy_signal.py:205-212``) the in-range is the
    global min/max over ALL patterns, preserving relative intensities
    between map points.
    """
    patterns = jnp.asarray(patterns)
    if in_range is not None and percentiles is not None:
        raise ValueError("'percentiles' must be None if 'in_range' is not None")
    if relative and in_range is not None:
        raise ValueError("'in_range' must be None if 'relative' is True")
    if relative:
        in_range = (
            float(jnp.min(patterns)),
            float(jnp.max(patterns)),
        )
    if dtype_out is None:
        dtype_out = patterns.dtype
    dtype_out = np.dtype(dtype_out)

    if percentiles is not None:
        lo = jnp.percentile(patterns, percentiles[0], axis=_SIG_AXES, keepdims=True)
        hi = jnp.percentile(patterns, percentiles[1], axis=_SIG_AXES, keepdims=True)
        imin, imax = lo, hi
        patterns = jnp.clip(patterns, imin, imax)
    elif in_range is not None:
        imin, imax = in_range
        patterns = jnp.clip(patterns, imin, imax)
    else:
        imin, imax = _sig_min(patterns), _sig_max(patterns)

    if out_range is None:
        omin, omax = get_dtype_range(dtype_out)
    else:
        omin, omax = out_range

    out = _rescale_with_min_max(
        patterns.astype(jnp.float32), imin, imax, float(omin), float(omax)
    )
    return out.astype(dtype_out)


def normalize_intensity(
    patterns: jnp.ndarray,
    num_std: float = 1,
    divide_by_square_root: bool = False,
    dtype_out=None,
) -> jnp.ndarray:
    """Normalize each pattern to zero mean and ``1 / num_std`` standard
    deviation (optionally scaled by ``1 / sqrt(n_pixels)``).

    Matches ``_normalize_intensity`` (reference ``_pattern.py:198-210``).
    """
    patterns = jnp.asarray(patterns)
    mean = jnp.mean(patterns, axis=_SIG_AXES, keepdims=True)
    std = jnp.std(patterns, axis=_SIG_AXES, keepdims=True)
    centered = patterns - mean
    denom = num_std * std
    if divide_by_square_root:
        n = patterns.shape[-1] * patterns.shape[-2]
        denom = denom * jnp.sqrt(float(n))
    out = centered / denom
    # The reference casts back to the input dtype when dtype_out is not
    # given (``_pattern.py:198-210``), truncating toward zero for
    # integer dtypes.
    if dtype_out is None:
        dtype_out = patterns.dtype
    return out.astype(np.dtype(dtype_out))


def _remove_background(
    patterns: jnp.ndarray,
    background: jnp.ndarray,
    operation: str,
    omin: float,
    omax: float,
) -> jnp.ndarray:
    """Subtract or divide out a background, then per-pattern min/max
    rescale to ``[omin, omax]`` (reference ``_pattern.py:484-509``)."""
    if operation == "subtract":
        patterns = patterns - background
    elif operation == "divide":
        patterns = patterns / background
    else:
        raise ValueError(f"operation must be 'subtract' or 'divide', got {operation!r}")
    return _rescale_with_min_max(patterns, _sig_min(patterns), _sig_max(patterns), omin, omax)


def remove_static_background(
    patterns: jnp.ndarray,
    static_bg: jnp.ndarray,
    operation: str = "subtract",
    scale_bg: bool = False,
    dtype_out=None,
    out_range: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Remove a shared static background from each pattern.

    Matches ``_remove_static_background_subtract/_divide``
    (reference ``_pattern.py:392-435``): float32 intermediates, optional
    per-pattern rescaling of the background to the pattern's own range,
    then background removal and per-pattern rescale to the output dtype
    range.
    """
    patterns = jnp.asarray(patterns)
    if dtype_out is None:
        dtype_out = patterns.dtype
    dtype_out = np.dtype(dtype_out)
    if out_range is None:
        omin, omax = get_dtype_range(dtype_out)
    else:
        omin, omax = out_range

    p = patterns.astype(jnp.float32)
    bg = jnp.asarray(static_bg).astype(jnp.float32)
    if scale_bg:
        bg = _rescale_with_min_max(
            bg,
            jnp.min(bg),
            jnp.max(bg),
            _sig_min(p),
            _sig_max(p),
        )
    out = _remove_background(p, bg, operation, float(omin), float(omax))
    return out.astype(dtype_out)


# ------------------------- Dynamic background ------------------------- #

_PLAN_CACHE: dict[tuple, FFTFilterPlan] = {}
_SEP_PLAN_CACHE: dict[tuple, "SeparableFilterPlan"] = {}


def dynamic_background_plan(
    sig_shape: tuple[int, int], std: float, truncate: float = 4.0
) -> FFTFilterPlan:
    """FFT plan for the frequency-domain Gaussian blur used in dynamic
    background estimation (reference ``_pattern.py:604-631``)."""
    key = (tuple(sig_shape), float(std), float(truncate))
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        window = gaussian_window_2d(std, truncate)
        plan = FFTFilterPlan(sig_shape, window)
        _PLAN_CACHE[key] = plan
    return plan


def dynamic_background_separable_plan(
    sig_shape: tuple[int, int], std: float, truncate: float = 4.0
):
    """Separable dense-matmul plan computing the same frequency-domain
    Gaussian blur as :func:`dynamic_background_plan` (the Gaussian
    window is rank-1), as two MXU matmuls per pattern instead of
    batched small FFTs — identical to float round-off (~6e-7 relative),
    much faster on TPU."""
    from kikuchipy_tpu.ops.fft_barnes import SeparableFilterPlan

    key = (tuple(sig_shape), float(std), float(truncate))
    plan = _SEP_PLAN_CACHE.get(key)
    if plan is None:
        window = gaussian_window_2d(std, truncate)
        plan = SeparableFilterPlan(sig_shape, window)
        _SEP_PLAN_CACHE[key] = plan
    return plan


def _gaussian_kernel_1d(sigma: float, truncate: float) -> np.ndarray:
    """scipy.ndimage-compatible 1D Gaussian kernel."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _reflect_indices(n: int, radius: int) -> np.ndarray:
    """Index map implementing scipy.ndimage's 'reflect' boundary
    (symmetric, repeated) for positions ``[-radius, n + radius)``."""
    p = np.arange(-radius, n + radius)
    q = np.mod(p, 2 * n)
    return np.where(q >= n, 2 * n - 1 - q, q)


@partial(jax.jit, static_argnames=("sigma", "truncate", "quantize_dtype"))
def _gaussian_blur_spatial(
    patterns: jnp.ndarray,
    sigma: float,
    truncate: float,
    quantize_dtype=None,
) -> jnp.ndarray:
    """Separable Gaussian blur with ``reflect`` (symmetric, repeated)
    boundary, equivalent to ``scipy.ndimage.gaussian_filter``.

    ``quantize_dtype``: for integer inputs the reference calls scipy on
    the raw integer array, which truncates the intermediate image to
    the integer dtype between the two 1D passes (C cast toward zero);
    passing the storage dtype reproduces that bit-exactly."""
    kernel = jnp.asarray(_gaussian_kernel_1d(sigma, truncate))
    radius = kernel.shape[0] // 2
    x = patterns.astype(jnp.float32)
    lead = x.shape[:-2]
    sy, sx = x.shape[-2:]
    idx_y = jnp.asarray(_reflect_indices(sy, radius))
    idx_x = jnp.asarray(_reflect_indices(sx, radius))
    x = jnp.take(x, idx_y, axis=-2)
    x = jnp.take(x, idx_x, axis=-1)
    x = x.reshape((-1, 1) + x.shape[-2:])
    ky = kernel.reshape(1, 1, -1, 1)
    kx = kernel.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn)
    if quantize_dtype is not None:
        x = x.astype(quantize_dtype).astype(jnp.float32)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn)
    if quantize_dtype is not None:
        x = x.astype(quantize_dtype).astype(jnp.float32)
    return x.reshape(lead + (sy, sx))


def _frequency_blur(p32, std: float, truncate: float):
    """The reference's frequency-domain Gaussian blur, computed as the
    separable dense-matmul formulation (bit-equal to the Barnes rFFT
    path to ~6e-7 relative; see :func:`dynamic_background_separable_plan`)."""
    from kikuchipy_tpu.ops.fft_barnes import separable_filter

    plan = dynamic_background_separable_plan(p32.shape[-2:], std, truncate)
    return separable_filter(p32, plan.row_op, plan.col_op)


def get_dynamic_background(
    patterns: jnp.ndarray,
    filter_domain: str = "frequency",
    std: float | None = None,
    truncate: float = 4.0,
) -> jnp.ndarray:
    """Per-pattern dynamic (low-frequency) background via Gaussian blur
    in the frequency or spatial domain. Preserves dtype.

    Matches ``get_dynamic_background`` (reference ``_pattern.py:634-695``).
    """
    patterns = jnp.asarray(patterns)
    if std is None:
        std = patterns.shape[-1] / 8
    p32 = patterns.astype(jnp.float32)
    if filter_domain == "frequency":
        bg = _frequency_blur(p32, float(std), float(truncate))
    elif filter_domain == "spatial":
        # The reference hands the raw array to scipy's gaussian_filter
        # (``_pattern.py:689``), so integer input is filtered in integer
        # arithmetic with truncation between the two 1D passes.
        qdt = (
            patterns.dtype
            if jnp.issubdtype(patterns.dtype, jnp.integer)
            else None
        )
        bg = _gaussian_blur_spatial(
            p32, float(std), float(truncate), quantize_dtype=qdt
        )
    else:
        raise ValueError(
            f"filter_domain must be 'frequency' or 'spatial', got {filter_domain!r}"
        )
    return bg.astype(patterns.dtype)


def remove_dynamic_background(
    patterns: jnp.ndarray,
    operation: str = "subtract",
    filter_domain: str = "frequency",
    std: float | None = None,
    truncate: float = 4.0,
    dtype_out=None,
    out_range: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Remove each pattern's own blurred version (dynamic background)
    and rescale to the output dtype range.

    Matches ``remove_dynamic_background`` (reference
    ``_pattern.py:512-601``).
    """
    patterns = jnp.asarray(patterns)
    if std is None:
        std = patterns.shape[-1] / 8
    if dtype_out is None:
        dtype_out = patterns.dtype
    dtype_out = np.dtype(dtype_out)
    if out_range is None:
        omin, omax = get_dtype_range(dtype_out)
    else:
        omin, omax = out_range

    p32 = patterns.astype(jnp.float32)
    if filter_domain == "frequency":
        bg = _frequency_blur(p32, float(std), float(truncate))
    elif filter_domain == "spatial":
        bg = _gaussian_blur_spatial(p32, float(std), float(truncate))
    else:
        raise ValueError(
            f"filter_domain must be 'frequency' or 'spatial', got {filter_domain!r}"
        )
    out = _remove_background(p32, bg, operation, float(omin), float(omax))
    return out.astype(dtype_out)


# ----------------------------- FFT tools ------------------------------ #


def fft(
    patterns: jnp.ndarray,
    apodization_window: jnp.ndarray | None = None,
    shift: bool = False,
    real_fft_only: bool = False,
) -> jnp.ndarray:
    """2D FFT of patterns with optional apodization and fftshift
    (reference ``fft``, ``_pattern.py:213-264``)."""
    p = jnp.asarray(patterns).astype(jnp.float32)
    if apodization_window is not None:
        p = p * jnp.asarray(apodization_window, dtype=p.dtype)
    out = (
        jnp.fft.rfft2(p, axes=_SIG_AXES)
        if real_fft_only
        else jnp.fft.fft2(p, axes=_SIG_AXES)
    )
    if shift:
        out = jnp.fft.fftshift(out, axes=_SIG_AXES)
    return out


def ifft(
    fft_patterns: jnp.ndarray,
    shift: bool = False,
    real_fft_only: bool = False,
) -> jnp.ndarray:
    """Real part of the inverse 2D FFT (reference ``ifft``,
    ``_pattern.py:267-309``)."""
    f = jnp.asarray(fft_patterns)
    if shift:
        f = jnp.fft.ifftshift(f, axes=_SIG_AXES)
    out = (
        jnp.fft.irfft2(f, axes=_SIG_AXES)
        if real_fft_only
        else jnp.fft.ifft2(f, axes=_SIG_AXES)
    )
    return jnp.real(out)


def fft_spectrum(fft_patterns: jnp.ndarray) -> jnp.ndarray:
    """Magnitude spectrum ``sqrt(re^2 + im^2)`` (reference
    ``fft_spectrum``, ``_pattern.py:348-362``)."""
    f = jnp.asarray(fft_patterns)
    return jnp.sqrt(jnp.real(f) ** 2 + jnp.imag(f) ** 2)


def fft_filter(
    patterns: jnp.ndarray,
    transfer_function: jnp.ndarray,
    apodization_window: jnp.ndarray | None = None,
    shift: bool = False,
) -> jnp.ndarray:
    """Filter patterns in the frequency domain with a transfer function
    defined on the (optionally fft-shifted) full FFT spectrum.

    Matches ``fft_filter`` (reference ``_pattern.py:312-345``).
    """
    patterns = jnp.asarray(patterns)
    p = patterns.astype(jnp.float64 if patterns.dtype == jnp.float64 else jnp.float32)
    if apodization_window is not None:
        p = p * jnp.asarray(apodization_window, dtype=p.dtype)
    f = jnp.fft.fft2(p, axes=_SIG_AXES)
    if shift:
        f = jnp.fft.fftshift(f, axes=_SIG_AXES)
    f = f * jnp.asarray(transfer_function)
    if shift:
        f = jnp.fft.ifftshift(f, axes=_SIG_AXES)
    return jnp.real(jnp.fft.ifft2(f, axes=_SIG_AXES))


def fft_frequency_vectors(shape: tuple[int, int]) -> np.ndarray:
    """Squared-frequency weights for the image-quality metric
    (reference ``_pattern.py:365-389``); host-side constant."""
    sy, sx = shape
    linex = np.arange(sx) + 1
    linex[sx // 2 :] -= sx + 1
    liney = np.arange(sy) + 1
    liney[sy // 2 :] -= sy + 1
    return liney[:, None] ** 2 + linex[None, :] ** 2 - 1


def get_image_quality(
    patterns: jnp.ndarray,
    normalize: bool = True,
    frequency_vectors: np.ndarray | None = None,
    inertia_max: float | None = None,
) -> jnp.ndarray:
    """Krieger Lassen image quality per pattern:
    ``1 - inertia(spectrum * freq_weights) / inertia_max``.

    Matches ``get_image_quality`` (reference ``_pattern.py:698-773``).
    """
    patterns = jnp.asarray(patterns).astype(jnp.float32)
    if frequency_vectors is None:
        frequency_vectors = fft_frequency_vectors(patterns.shape[-2:])
    if inertia_max is None:
        sy, sx = patterns.shape[-2:]
        inertia_max = np.sum(frequency_vectors) / (sy * sx)
    if normalize:
        patterns = normalize_intensity(patterns)
    f = jnp.fft.fft2(patterns, axes=_SIG_AXES)
    spectrum = jnp.sqrt(jnp.real(f) ** 2 + jnp.imag(f) ** 2)
    fv = jnp.asarray(frequency_vectors, dtype=spectrum.dtype)
    inertia = jnp.sum(spectrum * fv, axis=_SIG_AXES) / jnp.sum(spectrum, axis=_SIG_AXES)
    return 1 - inertia / inertia_max


# ------------------------------ Binning ------------------------------- #


def bin2d(patterns: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Sum-bin each pattern by an integer ``factor``
    (reference ``_bin2d``, ``_pattern.py:776-791``)."""
    patterns = jnp.asarray(patterns)
    sy, sx = patterns.shape[-2:]
    ny, nx = sy // factor, sx // factor
    lead = patterns.shape[:-2]
    p = patterns[..., : ny * factor, : nx * factor]
    p = p.reshape(lead + (ny, factor, nx, factor))
    return jnp.sum(p, axis=(-3, -1))


def downsample(
    patterns: jnp.ndarray,
    factor: int,
    dtype_out=None,
    out_range: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Sum-bin then per-pattern rescale to the output dtype range
    (reference ``_downsample2d``, ``_pattern.py:794-807``)."""
    patterns = jnp.asarray(patterns)
    if dtype_out is None:
        dtype_out = patterns.dtype
    dtype_out = np.dtype(dtype_out)
    if out_range is None:
        omin, omax = get_dtype_range(dtype_out)
    else:
        omin, omax = out_range
    binned = bin2d(patterns.astype(jnp.float32), factor)
    out = _rescale_with_min_max(
        binned, _sig_min(binned), _sig_max(binned), float(omin), float(omax)
    )
    return out.astype(dtype_out)
