"""Simulation engine (public namespace mirroring
``kikuchipy.simulations``)."""

from kikuchipy_tpu.simulation.kikuchi_pattern_simulator import (
    GeometricalKikuchiPatternSimulation,
    KikuchiPatternSimulator,
)
from kikuchipy_tpu.simulation.features import (
    KikuchiPatternLine,
    KikuchiPatternZoneAxis,
)

__all__ = [
    "GeometricalKikuchiPatternSimulation",
    "KikuchiPatternLine",
    "KikuchiPatternSimulator",
    "KikuchiPatternZoneAxis",
]
