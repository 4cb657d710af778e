"""Detector geometry and PC calibration (public namespace mirroring the
reference's ``kikuchipy.detectors``)."""

from kikuchipy_tpu.detectors.calibration import (
    PCCalibrationMovingScreen,
    estimate_xtilt,
    estimate_xtilt_ztilt,
    extrapolate_pc,
    fit_pc_affine,
    fit_pc_plane,
    fit_pc_projective,
)
from kikuchipy_tpu.geometry.detector import EBSDDetector

__all__ = [
    "EBSDDetector",
    "PCCalibrationMovingScreen",
    "estimate_xtilt",
    "estimate_xtilt_ztilt",
    "extrapolate_pc",
    "fit_pc_affine",
    "fit_pc_plane",
    "fit_pc_projective",
]
