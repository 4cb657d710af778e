"""Similarity metrics for dictionary indexing.

NCC (normalized cross-correlation) and NDP (normalized dot product),
re-designed TPU-first: pattern preparation is a fused elementwise chain
(cast -> mask -> center -> L2-normalize) and matching is a single MXU
matmul, so the whole metric runs as one XLA program per dictionary tile.

Semantics match the reference's metric classes
(``/root/reference/src/kikuchipy/indexing/similarity_metrics/
_normalized_cross_correlation.py:88-183`` and
``_normalized_dot_product.py:25-172``): ``signal_mask`` is True for
pixels to *exclude*, scores are ``sum(x_hat * y_hat)`` over the kept
pixels, and higher is better (``sign=+1``) for both metrics.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SimilarityMetric", "ncc", "ndp", "get_metric"]


@dataclasses.dataclass(frozen=True)
class SimilarityMetric:
    """A similarity metric: how to prepare patterns and match them.

    Attributes
    ----------
    name
        Metric name ("ncc" or "ndp").
    centered
        Whether patterns are zero-meaned before normalization (True for
        NCC, False for NDP).
    sign
        +1 if greater is better.
    dtype
        Computation dtype (float32 default).
    """

    name: str
    centered: bool
    sign: int = 1
    dtype: np.dtype = np.float32

    def prepare(
        self,
        patterns: jnp.ndarray,
        keep_idx: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Flatten to ``(n, n_kept_pixels)``, select masked-in pixels,
        center (NCC only) and L2-normalize each pattern.

        Parameters
        ----------
        patterns
            ``(..., sy, sx)`` or ``(n, d)`` array.
        keep_idx
            Optional int array of flattened pixel indices to keep
            (complement of the reference's ``signal_mask``); static
            per-problem, computed host-side by :func:`signal_mask_to_idx`.
        """
        return _prepare(
            jnp.asarray(patterns), keep_idx, self.centered, jnp.dtype(self.dtype)
        )

    def match(self, experimental: jnp.ndarray, dictionary: jnp.ndarray) -> jnp.ndarray:
        """Similarity matrix ``(n_exp, n_dict)`` via one MXU matmul."""
        return _match(experimental, dictionary)


@partial(jax.jit, static_argnames=("centered", "dtype"))
def _prepare(patterns, keep_idx, centered: bool, dtype):
    if patterns.ndim == 2:
        p = patterns
    else:
        p = patterns.reshape((-1, patterns.shape[-2] * patterns.shape[-1]))
    p = p.astype(dtype)
    if keep_idx is not None:
        p = jnp.take(p, keep_idx, axis=1)
    if centered:
        p = p - jnp.mean(p, axis=1, keepdims=True)
    norm = jnp.sqrt(jnp.sum(jnp.square(p), axis=1, keepdims=True))
    return p / norm


@jax.jit
def _match(experimental, dictionary):
    return jnp.matmul(
        experimental,
        dictionary.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=experimental.dtype,
    )


def signal_mask_to_idx(
    signal_mask: np.ndarray | None, sig_size: int
) -> np.ndarray | None:
    """Convert a boolean exclude-mask (True = drop pixel, reference
    convention) to a static array of kept flat pixel indices."""
    if signal_mask is None:
        return None
    mask = np.asarray(signal_mask).ravel()
    if mask.size != sig_size:
        raise ValueError(
            f"signal_mask has {mask.size} elements, expected {sig_size}"
        )
    if not mask.any():
        # A keep-everything mask is semantically identical to no mask:
        # normalize to None so downstream gathers are skipped and mask
        # provenance checks (PreparedDictionary.mask_hash) agree between
        # the two spellings.
        return None
    return np.nonzero(~mask)[0].astype(np.int32)


ncc = SimilarityMetric(name="ncc", centered=True)
ndp = SimilarityMetric(name="ndp", centered=False)

_METRICS = {"ncc": ncc, "ndp": ndp}


def get_metric(metric: str | SimilarityMetric) -> SimilarityMetric:
    if isinstance(metric, SimilarityMetric):
        return metric
    try:
        return _METRICS[metric.lower()]
    except KeyError:
        raise ValueError(
            f"Unknown metric {metric!r}; use one of {sorted(_METRICS)}"
        )
