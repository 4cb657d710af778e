"""Imaging tools (public namespace mirroring ``kikuchipy.imaging``)."""

from kikuchipy_tpu.imaging.vbse import VirtualBSEImager

__all__ = ["VirtualBSEImager"]
