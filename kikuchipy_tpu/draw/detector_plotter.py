"""Static detector plotter (reference's experimental interactive
``EBSDDetectorPlotter``, ``/root/reference/src/kikuchipy/draw/
_ebsd_detector_plotter.py:630``).

The reference builds an ipywidgets slider UI; headless TPU pipelines
get a static three-panel figure instead (side view, top view, detector
screen with optional geometrical-simulation / master-pattern overlay)
that re-renders on demand via :meth:`EBSDDetectorPlotter.plot`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["EBSDDetectorPlotter"]


class EBSDDetectorPlotter:
    """Three-panel detector-sample geometry figure with overlays.

    Parameters
    ----------
    detector
        :class:`~kikuchipy_tpu.geometry.detector.EBSDDetector` to
        visualize. Multi-PC detectors are collapsed to their average PC
        (as in the reference).
    rotation
        Optional ``(4,)`` quaternion; required for overlays.
    master_pattern
        Optional :class:`EBSDMasterPattern` — when given together with
        ``rotation``, the simulated pattern at that orientation is shown
        on the detector panel.
    """

    def __init__(self, detector, rotation=None, *, master_pattern=None):
        self._detector = dataclasses.replace(
            detector, pc=np.atleast_2d(detector.pc_average)
        )
        self._rotation = None if rotation is None else np.asarray(rotation)
        self._master_pattern = master_pattern

    @property
    def detector(self):
        return self._detector

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(detector={self._detector!r}, "
            f"rotation={self._rotation})"
        )

    def _simulate_pattern(self) -> np.ndarray | None:
        if self._master_pattern is None or self._rotation is None:
            return None
        import jax.numpy as jnp

        pats = self._master_pattern.get_patterns(
            self._rotation.reshape(1, 4), self._detector, compute=True
        )
        return np.asarray(jnp.asarray(pats.data)).reshape(
            self._detector.shape
        )

    def plot(self, return_figure: bool = False):
        """Render the side/top geometry views and the detector panel."""
        import matplotlib.pyplot as plt

        from kikuchipy_tpu.draw.detector_plot import (
            plot_detector,
            plot_detector_sample_geometry,
        )

        fig = plt.figure(figsize=(12, 4))
        ax_side = fig.add_subplot(1, 3, 1)
        ax_top = fig.add_subplot(1, 3, 2)
        ax_det = fig.add_subplot(1, 3, 3)
        plot_detector_sample_geometry(
            self._detector, mode="side", ax=ax_side
        )
        plot_detector_sample_geometry(self._detector, mode="top", ax=ax_top)
        pattern = self._simulate_pattern()
        if pattern is not None:
            ax_det.imshow(pattern, cmap="gray")
            ax_det.set_title("simulated pattern")
            ax_det.set_axis_off()
        else:
            plot_detector(self._detector, ax=ax_det)
        if return_figure:
            return fig
