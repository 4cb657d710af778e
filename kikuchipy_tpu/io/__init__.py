"""IO system (public namespace mirroring ``kikuchipy.io``)."""

from kikuchipy_tpu.io._io import load, plugins, save

__all__ = ["load", "plugins", "save"]
