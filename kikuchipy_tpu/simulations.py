"""Alias of :mod:`kikuchipy_tpu.simulation` matching the reference's
``kikuchipy.simulations`` namespace."""

from kikuchipy_tpu.simulation import (
    GeometricalKikuchiPatternSimulation,
    KikuchiPatternLine,
    KikuchiPatternSimulator,
    KikuchiPatternZoneAxis,
)

__all__ = [
    "GeometricalKikuchiPatternSimulation",
    "KikuchiPatternLine",
    "KikuchiPatternSimulator",
    "KikuchiPatternZoneAxis",
]
