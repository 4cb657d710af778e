"""Contrast-limited adaptive histogram equalization (CLAHE), batched.

TPU-native implementation of the reference's
``_adaptive_histogram_equalization`` (``/root/reference/src/kikuchipy/
pattern/_pattern.py:810-840``, which wraps
``skimage.exposure.equalize_adapthist``): per-tile histograms with
optional clip-and-redistribute, per-tile CDF mappings, and bilinear
interpolation of the mappings between tile centers.

TPU formulation: per-pixel LUT lookups are gathers, which lower poorly
(~115 M elem/s measured on v5e — 4 corner lookups made AHE run at
16 MB/s). Instead, each tile's 128-entry CDF mapping is applied to the
whole pattern as ONE one-hot matmul (``onehot(bins) @ mappings.T``,
MXU), and the bilinear blend between tile centers becomes a
shape-static weight tensor built once on host — pixels only ever
multiply-accumulate over the (at most 4) tiles whose centers surround
them.

Functional (not bit-exact) parity with skimage: identical tiling
(the reference passes pattern/4 as the kernel size), 128 bins,
equivalent contrast limiting and bilinear blending. The reference's own
tests only assert hard-coded outputs of the skimage call, which depend
on skimage interpolation internals; here the conformance target is the
transform's defining properties (per-tile histogram flattening,
monotonicity, range).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from kikuchipy_tpu.utils.dtypes import get_dtype_range

__all__ = ["adaptive_histogram_equalization"]


@lru_cache(maxsize=32)
def _blend_weights(sy: int, sx: int, ky: int, kx: int) -> np.ndarray:
    """Static ``(n_tiles, sy, sx)`` bilinear blend weights: pixel
    (y, x)'s output is ``sum_t W[t, y, x] * V_t[y, x]`` where ``V_t``
    is tile t's CDF mapping applied to the pattern."""
    n_ty = -(-sy // ky)
    n_tx = -(-sx // kx)
    yy = np.arange(sy, dtype=np.float64)
    xx = np.arange(sx, dtype=np.float64)
    ty = (yy - (ky - 1) / 2) / ky
    tx = (xx - (kx - 1) / 2) / kx
    ty0 = np.clip(np.floor(ty).astype(int), 0, n_ty - 1)
    tx0 = np.clip(np.floor(tx).astype(int), 0, n_tx - 1)
    ty1 = np.clip(ty0 + 1, 0, n_ty - 1)
    tx1 = np.clip(tx0 + 1, 0, n_tx - 1)
    wy = np.clip(ty - ty0, 0.0, 1.0)
    wx = np.clip(tx - tx0, 0.0, 1.0)

    W = np.zeros((n_ty * n_tx, sy, sx), dtype=np.float32)
    corners = [
        (ty0, tx0, (1 - wy)[:, None] * (1 - wx)[None, :]),
        (ty0, tx1, (1 - wy)[:, None] * wx[None, :]),
        (ty1, tx0, wy[:, None] * (1 - wx)[None, :]),
        (ty1, tx1, wy[:, None] * wx[None, :]),
    ]
    yi = np.arange(sy)[:, None]
    xi = np.arange(sx)[None, :]
    for t_y, t_x, w in corners:
        tid = t_y[:, None] * n_tx + t_x[None, :]
        np.add.at(W, (tid, np.broadcast_to(yi, tid.shape), np.broadcast_to(xi, tid.shape)), w)
    return W


@partial(jax.jit, static_argnames=("ky", "kx", "nbins", "clip_limit"))
def _clahe_batch(imgs, ky: int, kx: int, nbins: int, clip_limit: float):
    """CLAHE of a batch of normalized [0, 1] float32 images
    ``(n, sy, sx)``."""
    n, sy, sx = imgs.shape
    n_ty = -(-sy // ky)
    n_tx = -(-sx // kx)
    n_tiles = n_ty * n_tx
    pad_y = n_ty * ky - sy
    pad_x = n_tx * kx - sx
    padded = jnp.pad(imgs, ((0, 0), (0, pad_y), (0, pad_x)), mode="reflect")

    bins = jnp.clip((padded * nbins).astype(jnp.int32), 0, nbins - 1)
    tiles = bins.reshape(n, n_ty, ky, n_tx, kx).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(n, n_tiles, ky * kx)

    # Per-tile histogram as a broadcast-compare reduction (fuses on the
    # VPU; scatter-add measured 150x slower on this backend).
    hist = jnp.sum(
        (tiles[..., None] == jnp.arange(nbins)[None, None, None, :]).astype(
            jnp.float32
        ),
        axis=2,
    )  # (n, n_tiles, nbins)

    if clip_limit > 0:
        limit = jnp.maximum(clip_limit * ky * kx / nbins, 1.0)
        excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
        hist = jnp.minimum(hist, limit) + excess / nbins

    cdf = jnp.cumsum(hist, axis=-1)
    mapping = cdf / cdf[..., -1:]  # (n, n_tiles, nbins)

    # Every tile's LUT applied to every pixel in one MXU matmul, then
    # the static bilinear blend selects/weights the surrounding tiles.
    pix_bins = bins[:, :sy, :sx].reshape(n, sy * sx)
    onehot = jax.nn.one_hot(pix_bins, nbins, dtype=jnp.float32)
    values = jnp.einsum(
        "npb,ntb->npt", onehot, mapping,
        precision=jax.lax.Precision.DEFAULT,
    )  # (n, sy*sx, n_tiles); exact: one-hot selects f32 CDF entries
    W = jnp.asarray(_blend_weights(sy, sx, ky, kx)).reshape(n_tiles, sy * sx)
    out = jnp.einsum("npt,tp->np", values, W)
    return out.reshape(n, sy, sx)


def adaptive_histogram_equalization(
    patterns: jnp.ndarray,
    kernel_size: tuple[int, int] | None = None,
    clip_limit: float = 0.0,
    nbins: int = 128,
    dtype_out=None,
    chunk: int = 512,
) -> jnp.ndarray:
    """CLAHE each pattern and rescale to the output dtype range.

    Parameters mirror ``EBSD.adaptive_histogram_equalization``
    (reference ``signals/_kikuchipy_signal.py``): default
    ``kernel_size`` is a quarter of the signal shape, 128 bins,
    ``clip_limit=0`` (no contrast limiting). ``chunk`` bounds the
    one-hot intermediate (``chunk * sy * sx * nbins`` floats) when the
    batch is large.
    """
    patterns = jnp.asarray(patterns)
    # .dtype (not np.asarray) so the op stays jit-traceable.
    if dtype_out is None:
        dtype_out = patterns.dtype
    dtype_out = np.dtype(dtype_out)
    sy, sx = patterns.shape[-2:]
    if kernel_size is None:
        kernel_size = (max(sy // 4, 1), max(sx // 4, 1))
    ky, kx = (int(k) for k in kernel_size)

    in_min, in_max = (
        get_dtype_range(patterns.dtype)
        if jnp.issubdtype(patterns.dtype, jnp.integer)
        else (None, None)
    )
    p = patterns.astype(jnp.float32)
    if in_min is None:
        imin = jnp.min(p, axis=(-2, -1), keepdims=True)
        imax = jnp.max(p, axis=(-2, -1), keepdims=True)
    else:
        imin, imax = float(in_min), float(in_max)
    p = (p - imin) / (imax - imin)

    lead = p.shape[:-2]
    flat = p.reshape((-1, sy, sx))
    n = flat.shape[0]
    if n <= chunk:
        out = _clahe_batch(flat, ky, kx, nbins, float(clip_limit))
    else:
        # Pad to a whole number of chunks and lax.map over them so the
        # one-hot intermediate stays bounded.
        n_chunks = -(-n // chunk)
        padded = jnp.concatenate(
            [flat, jnp.zeros((n_chunks * chunk - n, sy, sx), flat.dtype)]
        )
        out = jax.lax.map(
            lambda c: _clahe_batch(c, ky, kx, nbins, float(clip_limit)),
            padded.reshape(n_chunks, chunk, sy, sx),
        ).reshape(n_chunks * chunk, sy, sx)[:n]
    out = out.reshape(lead + (sy, sx))

    omin, omax = get_dtype_range(dtype_out)
    omin_ = jnp.min(out, axis=(-2, -1), keepdims=True)
    omax_ = jnp.max(out, axis=(-2, -1), keepdims=True)
    out = (out - omin_) / (omax_ - omin_) * (omax - omin) + omin
    return out.astype(dtype_out)
