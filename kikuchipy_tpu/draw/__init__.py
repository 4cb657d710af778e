"""Visualization tools (public namespace mirroring ``kikuchipy.draw``)."""

from kikuchipy_tpu.draw.detector_plotter import (
    EBSDDetectorPlotter,
    plot_detector_interactive,
)
from kikuchipy_tpu.draw.detector_plot import (
    plot_detector,
    plot_detector_sample_geometry,
)
from kikuchipy_tpu.draw.navigators import get_rgb_navigator
from kikuchipy_tpu.draw.markers import (
    get_line_segment_list,
    get_point_list,
)

from kikuchipy_tpu.draw.positions import plot_pattern_positions_in_map
from kikuchipy_tpu.draw.sphere import plot_master_pattern_sphere, sample_sphere

__all__ = [
    "EBSDDetectorPlotter",
    "plot_detector_interactive",
    "plot_pattern_positions_in_map",
    "get_line_segment_list",
    "get_point_list",
    "get_rgb_navigator",
    "plot_detector",
    "plot_detector_sample_geometry",
]
