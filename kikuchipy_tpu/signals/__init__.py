"""Signal objects (public namespace mirroring ``kikuchipy.signals``)."""

from kikuchipy_tpu.signals import util
from kikuchipy_tpu.signals.ebsd import EBSD
from kikuchipy_tpu.signals.master_pattern import (
    EBSDMasterPattern,
    ECPMasterPattern,
)
from kikuchipy_tpu.signals.virtual_bse_image import VirtualBSEImage

__all__ = [
    "EBSD",
    "EBSDMasterPattern",
    "ECPMasterPattern",
    "VirtualBSEImage",
    "util",
]
