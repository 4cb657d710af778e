"""Virtual BSE image signal (reference
``/root/reference/src/kikuchipy/signals/virtual_bse_image.py:27-101``):
a thin wrapper over a 2D (or RGB) image array with the per-image
intensity operations users chain after
:class:`~kikuchipy_tpu.imaging.vbse.VirtualBSEImager`."""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["VirtualBSEImage"]


@dataclasses.dataclass
class VirtualBSEImage:
    """A virtual backscatter electron image.

    Attributes
    ----------
    data
        Image array ``(ny, nx)`` or ``(ny, nx, 3)`` for RGB.
    metadata
        Free-form metadata (e.g. the ROI it was integrated over).
    """

    data: np.ndarray
    metadata: dict = dataclasses.field(default_factory=dict)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(np.asarray(self.data).shape)

    def _apply(self, fn) -> "VirtualBSEImage":
        data = np.asarray(self.data)
        out = np.asarray(fn(data[None]))[0]
        return dataclasses.replace(self, data=out)

    def rescale_intensity(self, **kwargs) -> "VirtualBSEImage":
        from kikuchipy_tpu.ops import pattern as _ops

        return self._apply(lambda d: _ops.rescale_intensity(d, **kwargs))

    def normalize_intensity(self, **kwargs) -> "VirtualBSEImage":
        from kikuchipy_tpu.ops import pattern as _ops

        return self._apply(lambda d: _ops.normalize_intensity(d, **kwargs))

    def adaptive_histogram_equalization(self, **kwargs) -> "VirtualBSEImage":
        from kikuchipy_tpu.ops.ahe import adaptive_histogram_equalization

        return self._apply(
            lambda d: adaptive_histogram_equalization(d, **kwargs)
        )

    def change_dtype(self, dtype) -> "VirtualBSEImage":
        """Return the image cast to ``dtype`` (the reference's in-place
        HyperSpy ``change_dtype``; a new signal is returned here)."""
        return dataclasses.replace(
            self, data=np.asarray(self.data).astype(np.dtype(dtype))
        )

    def deepcopy(self) -> "VirtualBSEImage":
        import copy

        return copy.deepcopy(self)

    def as_lazy(self) -> "VirtualBSEImage":
        """Reference-compat shim; returns ``self``."""
        return self

    def compute(self) -> "VirtualBSEImage":
        """Reference-compat shim; returns ``self``."""
        return self

    def plot(self, ax=None, **imshow_kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        ax.imshow(
            np.asarray(self.data),
            cmap=imshow_kwargs.pop("cmap", "gray"),
            **imshow_kwargs,
        )
        ax.axis("off")
        return ax
