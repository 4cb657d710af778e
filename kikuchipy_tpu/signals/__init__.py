"""Signal objects (public namespace mirroring ``kikuchipy.signals``)."""

from kikuchipy_tpu.signals.ebsd import EBSD
from kikuchipy_tpu.signals.master_pattern import (
    EBSDMasterPattern,
    ECPMasterPattern,
)

__all__ = ["EBSD", "EBSDMasterPattern", "ECPMasterPattern"]
