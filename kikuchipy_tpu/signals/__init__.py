"""Signal objects (public namespace mirroring ``kikuchipy.signals``)."""

from kikuchipy_tpu.signals import util
from kikuchipy_tpu.signals.ebsd import EBSD
from kikuchipy_tpu.signals.lazy import LazyEBSD
from kikuchipy_tpu.signals.master_pattern import (
    EBSDMasterPattern,
    ECPMasterPattern,
)
from kikuchipy_tpu.signals.virtual_bse_image import VirtualBSEImage

# Migration aliases: master patterns and VBSE images are small, so this
# framework keeps them eager — the Lazy* names resolve to the eager
# classes for ported isinstance checks/constructors. Scans DO have a
# true out-of-core class: signals.lazy.LazyEBSD (chunk-streamed op
# chain; reference LazyEBSD, signals/ebsd.py:3186).
LazyEBSDMasterPattern = EBSDMasterPattern
LazyECPMasterPattern = ECPMasterPattern
LazyVirtualBSEImage = VirtualBSEImage

__all__ = [
    "EBSD",
    "EBSDMasterPattern",
    "ECPMasterPattern",
    "LazyEBSD",
    "LazyEBSDMasterPattern",
    "LazyECPMasterPattern",
    "LazyVirtualBSEImage",
    "VirtualBSEImage",
    "util",
]
