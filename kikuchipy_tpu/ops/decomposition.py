"""Pattern decomposition (PCA) and model reconstruction.

TPU-native replacement for the reference's HyperSpy-delegated
``decomposition`` + ``get_decomposition_model`` (reference
``signals/ebsd.py:2665-2725``): PCA by economy SVD of the centered
pattern matrix on device, with low-rank reconstruction and per-pattern
rescale back to the storage dtype.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from kikuchipy_tpu.utils.dtypes import get_dtype_range

__all__ = ["pca", "pca_reconstruct"]


def pca(
    patterns: jnp.ndarray, components: int, return_variance: bool = False
):
    """PCA of a pattern batch.

    Returns ``(factors, loadings, mean)``: ``factors (components, d)``
    are the principal pattern components, ``loadings (n, components)``
    the per-pattern weights, and ``mean (d,)`` the mean pattern. With
    ``return_variance``, appends ``(explained_variance,
    explained_variance_ratio)`` over the kept components (matching the
    reference/HyperSpy learning-results fields: singular values squared
    over ``n - 1``, ratio over the TOTAL variance).
    """
    p = jnp.asarray(patterns, dtype=jnp.float32)
    lead = p.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    x = p.reshape(n, -1)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    # Economy SVD; n is usually << d for EBSD scans of small patterns.
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    k = min(components, s.shape[0])
    factors = vt[:k]
    loadings = u[:, :k] * s[:k]
    out = (np.asarray(factors), np.asarray(loadings), np.asarray(mean))
    if return_variance:
        s_np = np.asarray(s)
        var = s_np**2 / max(n - 1, 1)
        total = float(var.sum())
        ratio = var / total if total > 0 else np.zeros_like(var)
        out = out + (var[:k], ratio[:k])
    return out


def pca_reconstruct(
    patterns: jnp.ndarray,
    components: int | list[int] | None,
    dtype_out=None,
) -> np.ndarray:
    """Low-rank PCA reconstruction of the patterns, rescaled per pattern
    to the output dtype range for integer dtypes.

    ``components`` follows the reference's
    ``get_decomposition_model`` convention (``signals/ebsd.py:2683``):
    an int keeps components ``0..components``, a list keeps exactly
    those components, and None keeps all of them.
    """
    patterns = jnp.asarray(patterns)
    shape = patterns.shape
    if components is None:
        n = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        k_fit: int = min(n, int(shape[-2] * shape[-1]))
        select = None
    elif isinstance(components, (list, tuple, np.ndarray)):
        select = np.asarray(components, dtype=int)
        k_fit = int(select.max()) + 1
    else:
        k_fit = int(components)
        select = None
    factors, loadings, mean = pca(patterns, k_fit)
    if select is not None:
        factors = factors[select]
        loadings = loadings[:, select]
    recon = loadings @ factors + mean
    recon = recon.reshape(shape)
    if dtype_out is None:
        return np.asarray(recon)
    dtype_out = np.dtype(dtype_out)
    if np.issubdtype(dtype_out, np.integer):
        omin, omax = get_dtype_range(dtype_out)
        imin = recon.min(axis=(-2, -1), keepdims=True)
        imax = recon.max(axis=(-2, -1), keepdims=True)
        recon = (recon - imin) / (imax - imin) * (omax - omin) + omin
    return np.asarray(recon).astype(dtype_out)
