"""Detector geometry (public namespace mirroring the reference's
``kikuchipy.detectors``)."""

from kikuchipy_tpu.geometry.detector import EBSDDetector

__all__ = ["EBSDDetector"]
