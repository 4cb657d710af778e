"""Filter windows (public namespace mirroring ``kikuchipy.filters``)."""

from kikuchipy_tpu.filters.window import (
    Window,
    distance_to_origin,
    highpass_fft_filter,
    lowpass_fft_filter,
    modified_hann,
)

__all__ = [
    "Window",
    "distance_to_origin",
    "highpass_fft_filter",
    "lowpass_fft_filter",
    "modified_hann",
]
