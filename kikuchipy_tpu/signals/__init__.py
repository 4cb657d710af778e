"""Signal objects (public namespace mirroring ``kikuchipy.signals``)."""

from kikuchipy_tpu.signals import util
from kikuchipy_tpu.signals.ebsd import EBSD
from kikuchipy_tpu.signals.master_pattern import (
    EBSDMasterPattern,
    ECPMasterPattern,
)
from kikuchipy_tpu.signals.virtual_bse_image import VirtualBSEImage

# Migration aliases: this framework has no lazy/eager class split — jit
# staging and io.streaming replace Dask laziness (reference LazyEBSD,
# signals/ebsd.py:3186). The Lazy* names resolve to the eager classes
# so isinstance checks and constructors in ported code keep working;
# use kikuchipy_tpu.io.streaming for out-of-core scans.
LazyEBSD = EBSD
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
