"""Per-pattern/chip processing functions (public namespace mirroring the
reference's ``kikuchipy.pattern``; the same batched kernels as
:mod:`kikuchipy_tpu.ops.pattern`)."""

from kikuchipy_tpu import pattern_chunk as chunk
from kikuchipy_tpu.ops.pattern import (
    fft,
    fft_filter,
    fft_frequency_vectors,
    fft_spectrum,
    get_dynamic_background,
    get_image_quality,
    ifft,
    normalize_intensity,
    remove_dynamic_background,
    remove_static_background,
    rescale_intensity,
)

__all__ = [
    "fft",
    "fft_filter",
    "chunk",
    "fft_frequency_vectors",
    "fft_spectrum",
    "get_dynamic_background",
    "get_image_quality",
    "ifft",
    "normalize_intensity",
    "remove_dynamic_background",
    "remove_static_background",
    "rescale_intensity",
]
