"""Projection-center (PC) calibration and fitting.

- :class:`PCCalibrationMovingScreen`: the moving-screen technique
  (Hjelen et al. 1991), matching the reference's implementation
  (``/root/reference/src/kikuchipy/detectors/_calibration.py:31-300``):
  PCx/PCy from intersections of lines between corresponding features of
  two patterns at known detector distances, PCz from line-length ratios.
- PC fitting over a map: plane / affine / projective fits of scattered
  PCs vs beam position, and PC extrapolation from an average, matching
  ``detectors/_fit_projection_center.py`` and the detector methods
  ``estimate_xtilt``/``extrapolate_pc``/``fit_pc``
  (``_ebsd_detector.py:1045-1500``).
"""

from __future__ import annotations

import dataclasses
from itertools import combinations

import numpy as np

from kikuchipy_tpu.geometry.detector import EBSDDetector

__all__ = [
    "PCCalibrationMovingScreen",
    "fit_pc_plane",
    "fit_pc_affine",
    "fit_pc_projective",
    "estimate_xtilt",
    "estimate_xtilt_ztilt",
    "extrapolate_pc",
]


def _lines_between_points(points: np.ndarray) -> np.ndarray:
    """All lines (x1, y1, x2, y2) between point pairs."""
    return np.array(
        [np.concatenate([points[i], points[j]])
         for i, j in combinations(range(len(points)), 2)]
    )


def _line_intersection(l1: np.ndarray, l2: np.ndarray) -> np.ndarray:
    """Intersection of two lines given as (x1, y1, x2, y2)."""
    x1, y1, x2, y2 = l1
    x3, y3, x4, y4 = l2
    denom = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    d1 = x1 * y2 - y1 * x2
    d2 = x3 * y4 - y3 * x4
    px = (d1 * (x3 - x4) - (x1 - x2) * d2) / denom
    py = (d1 * (y3 - y4) - (y1 - y2) * d2) / denom
    return np.array([px, py])


class PCCalibrationMovingScreen:
    """Moving-screen PC calibration from two patterns at known detector
    distances. See the module docstring; parameter semantics match the
    reference exactly."""

    def __init__(
        self,
        pattern_in: np.ndarray,
        pattern_out: np.ndarray,
        points_in,
        points_out,
        delta_z: float = 1.0,
        px_size: float | None = None,
        binning: int = 1,
        convention: str = "tsl",
    ) -> None:
        self.patterns = np.stack([pattern_in, pattern_out])
        self.points = np.stack([points_in, points_out]).astype(np.float64)
        self.delta_z = delta_z
        self.px_size = px_size
        self.binning = binning
        self.convention = convention
        self._lines = np.stack(
            [
                _lines_between_points(self.points[0]),
                _lines_between_points(self.points[1]),
            ]
        )

    @property
    def shape(self) -> tuple[int, int]:
        return self.patterns[0].shape

    nrows = property(lambda self: self.shape[0])
    ncols = property(lambda self: self.shape[1])
    n_points = property(lambda self: len(self.points[0]))
    lines = property(lambda self: self._lines)
    n_lines = property(lambda self: len(self._lines[0]))

    @property
    def line_lengths(self) -> np.ndarray:
        start = self._lines[:, :, :2]
        end = self._lines[:, :, 2:]
        return np.linalg.norm(end - start, axis=-1)

    @property
    def lines_start(self) -> np.ndarray:
        """Starting points of the within-pattern lines, ``(2, n_lines,
        2)`` (reference ``_calibration.py:140``)."""
        return self._lines[:, :, :2]

    @property
    def lines_end(self) -> np.ndarray:
        """End points of the within-pattern lines, ``(2, n_lines, 2)``
        (reference ``_calibration.py:147``)."""
        return self._lines[:, :, 2:]

    def make_lines(self) -> None:
        """(Re)build all lines between the feature points per pattern
        (run on init; reference ``_calibration.py:255``). Call after
        mutating :attr:`points`."""
        self._lines = np.stack(
            [
                _lines_between_points(self.points[0]),
                _lines_between_points(self.points[1]),
            ]
        )

    @property
    def lines_out_in(self) -> np.ndarray:
        """Lines from each "out" feature to its "in" counterpart; they
        all pass (ideally) through (PCx, PCy)."""
        return np.hstack([self.points[1], self.points[0]])

    @property
    def lines_out_in_start(self) -> np.ndarray:
        """Starting ("out") points of the between-pattern lines,
        ``(n_points, 2)`` (reference ``_calibration.py:169``)."""
        return self.lines_out_in[:, :2]

    @property
    def lines_out_in_end(self) -> np.ndarray:
        """End ("in") points of the between-pattern lines,
        ``(n_points, 2)`` (reference ``_calibration.py:176``)."""
        return self.lines_out_in[:, 2:]

    @property
    def _pxy_all(self) -> np.ndarray:
        lines = self.lines_out_in
        return np.array(
            [
                _line_intersection(lines[i], lines[j])
                for i, j in combinations(range(self.n_points), 2)
            ]
        )

    @property
    def pxy_within_detector(self) -> np.ndarray:
        p = self._pxy_all
        return (
            (p[:, 0] > 0)
            & (p[:, 0] < self.ncols)
            & (p[:, 1] > 0)
            & (p[:, 1] < self.nrows)
        )

    @property
    def pxy_all(self) -> np.ndarray:
        return self._pxy_all[self.pxy_within_detector]

    @property
    def pxy(self) -> np.ndarray:
        return np.nanmean(self.pxy_all, axis=0)

    @property
    def pcx_all(self) -> np.ndarray:
        return self.pxy_all[:, 0] / self.ncols

    @property
    def pcy_all(self) -> np.ndarray:
        pcy = self.pxy_all[:, 1] / self.nrows
        if self.convention == "tsl":
            pcy = 1 - pcy
        return pcy

    @property
    def pcz_all(self) -> np.ndarray:
        lengths = self.line_lengths
        pcz = self.delta_z / ((lengths[1] / lengths[0]) - 1)
        if self.px_size is not None:
            pcz = pcz / (self.nrows * self.px_size * self.binning)
        return pcz[self.pxy_within_detector]

    @property
    def pc_all(self) -> np.ndarray:
        return np.column_stack([self.pcx_all, self.pcy_all, self.pcz_all])

    @property
    def pc(self) -> np.ndarray:
        return np.nanmean(self.pc_all, axis=0)

    def to_detector(self, **kwargs) -> EBSDDetector:
        """Detector with the calibrated average PC."""
        return EBSDDetector(
            shape=self.shape,
            pc=self.pc,
            px_size=self.px_size or 1.0,
            binning=self.binning,
            convention=self.convention,
            **kwargs,
        )

    def plot(self, return_figure: bool = False):
        """Patterns with annotated points/lines and the PC estimate."""
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(ncols=3, figsize=(12, 4))
        for i, (ax, title) in enumerate(zip(axes[:2], ["in", "out"])):
            ax.imshow(self.patterns[i], cmap="gray")
            pts = self.points[i]
            ax.scatter(pts[:, 0], pts[:, 1], c="r")
            ax.set_title(title)
        ax = axes[2]
        ax.imshow(self.patterns[0], cmap="gray")
        for line in self.lines_out_in:
            ax.axline(line[:2], line[2:], color="y", lw=0.7)
        pxy = self.pxy
        ax.scatter(*pxy, c="r", marker="*", s=150)
        ax.set_title(f"PC = {np.round(self.pc, 3)}")
        if return_figure:
            return fig

    def __repr__(self) -> str:
        return (
            f"PCCalibrationMovingScreen(shape={self.shape}, "
            f"n_points={self.n_points}, pc={np.round(self.pc, 3)})"
        )


def fit_pc_plane(
    pc: np.ndarray, nav_shape: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Least-squares plane fit of each PC component vs beam position.

    Returns the fitted PC grid ``nav_shape + (3,)`` and the ``(3, 3)``
    coefficient matrix (slope_x, slope_y, intercept per component).
    """
    pc = np.asarray(pc, dtype=np.float64).reshape(-1, 3)
    yy, xx = np.indices(nav_shape)
    A = np.column_stack(
        [xx.ravel(), yy.ravel(), np.ones(pc.shape[0])]
    )
    coeffs, *_ = np.linalg.lstsq(A, pc, rcond=None)
    fitted = (A @ coeffs).reshape(nav_shape + (3,))
    return fitted, coeffs.T


def fit_pc_affine(
    beam_xy: np.ndarray, pc: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Affine fit mapping beam positions ``(n, 2)`` to PCs ``(n, 3)``.

    Returns fitted PCs and the ``(3, 3)`` affine matrix acting on
    homogeneous beam coordinates.
    """
    beam_xy = np.asarray(beam_xy, dtype=np.float64)
    pc = np.asarray(pc, dtype=np.float64)
    A = np.column_stack([beam_xy, np.ones(len(beam_xy))])
    coeffs, *_ = np.linalg.lstsq(A, pc, rcond=None)
    return A @ coeffs, coeffs.T


def fit_pc_projective(
    beam_xy: np.ndarray, pc: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Projective fit of (PCx, PCy) vs beam position with PCz fit as a
    plane. Solves the homography with the DLT algorithm."""
    beam_xy = np.asarray(beam_xy, dtype=np.float64)
    pc = np.asarray(pc, dtype=np.float64)
    n = len(beam_xy)
    A = np.zeros((2 * n, 9))
    for i, ((x, y), (u, v, _)) in enumerate(zip(beam_xy, pc)):
        A[2 * i] = [-x, -y, -1, 0, 0, 0, u * x, u * y, u]
        A[2 * i + 1] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]
    _, _, vt = np.linalg.svd(A)
    H = vt[-1].reshape(3, 3)
    hom = np.column_stack([beam_xy, np.ones(n)]) @ H.T
    fitted_xy = hom[:, :2] / hom[:, 2:]
    A3 = np.column_stack([beam_xy, np.ones(n)])
    cz, *_ = np.linalg.lstsq(A3, pc[:, 2], rcond=None)
    fitted = np.column_stack([fitted_xy, A3 @ cz])
    return fitted, H


def estimate_xtilt_ztilt(
    detector: EBSDDetector, degrees: bool = True
) -> tuple[float, float]:
    """Estimate detector x-tilt and z-tilt from the PC plane over the
    map (reference ``EBSDDetector.estimate_xtilt_ztilt``,
    ``_ebsd_detector.py:1242``): fit ``pcz = a*pcx + b*pcy + c``; the
    x-tilt follows from the PCy slope and the z-tilt from the PCx
    slope."""
    pc = detector.pc_flattened
    A = np.column_stack([pc[:, 0], pc[:, 1], np.ones(len(pc))])
    (a, b, _), *_ = np.linalg.lstsq(A, pc[:, 2], rcond=None)
    xtilt = np.arctan(-b)
    ztilt = np.arctan(-a)
    if degrees:
        return float(np.rad2deg(xtilt)), float(np.rad2deg(ztilt))
    return float(xtilt), float(ztilt)


def estimate_xtilt(
    detector: EBSDDetector, degrees: bool = True
) -> float:
    """Estimate the detector x-tilt from the slope of PCy vs PCz over
    the map (reference ``EBSDDetector.estimate_xtilt``,
    ``_ebsd_detector.py:1045``): for a perfectly aligned detector,
    ``tan(tilt) = -d(PCz)/d(PCy)``."""
    pc = detector.pc_flattened
    pcy, pcz = pc[:, 1], pc[:, 2]
    slope = np.polyfit(pcy, pcz, 1)[0]
    xtilt = np.arctan(-slope)
    return float(np.rad2deg(xtilt)) if degrees else float(xtilt)


def extrapolate_pc(
    pc_from_detector: EBSDDetector,
    beam_positions: np.ndarray,
    nav_shape: tuple[int, int],
    step_sizes: tuple[float, float],
    px_size: float | None = None,
) -> EBSDDetector:
    """Extrapolate a full PC grid from PCs measured at a few beam
    positions via an affine fit (reference
    ``EBSDDetector.extrapolate_pc``, ``_ebsd_detector.py:1315``)."""
    beam_positions = np.asarray(beam_positions, dtype=np.float64).reshape(-1, 2)
    pc = pc_from_detector.pc_flattened
    _, coeffs = fit_pc_affine(beam_positions, pc)
    yy, xx = np.indices(nav_shape)
    xy = np.column_stack(
        [xx.ravel() * step_sizes[1], yy.ravel() * step_sizes[0]]
    )
    new_pc = np.column_stack([xy, np.ones(len(xy))]) @ coeffs.T
    return dataclasses.replace(
        pc_from_detector, pc=new_pc.reshape(nav_shape + (3,))
    )
