"""Public-namespace parity with the reference.

Pins every name in the reference's public API (`__init__.pyi` +
submodule ``__all__`` lists, /root/reference/src/kikuchipy) to an
attribute on the corresponding kikuchipy_tpu namespace, so API drift
or an incomplete port fails loudly.
"""

import importlib

import numpy as np
import pytest

import kikuchipy_tpu as kp

REFERENCE_API = {
    "": ["load", "set_log_level"],
    "data": [
        "clear_cache", "ebsd_master_pattern", "ni_gain",
        "ni_gain_calibration", "nickel_ebsd_large",
        "nickel_ebsd_master_pattern_small", "nickel_ebsd_small",
        "si_wafer", "si_ebsd_moving_screen",
    ],
    "detectors": ["EBSDDetector", "PCCalibrationMovingScreen"],
    "draw": [
        "EBSDDetectorPlotter", "get_rgb_navigator",
        "plot_pattern_positions_in_map",
    ],
    "filters": [
        "Window", "distance_to_origin", "highpass_fft_filter",
        "lowpass_fft_filter", "modified_hann",
    ],
    "imaging": ["VirtualBSEImager"],
    "indexing": [
        "NormalizedCrossCorrelationMetric", "NormalizedDotProductMetric",
        "SimilarityMetric",
        "compute_refine_orientation_projection_center_results",
        "compute_refine_orientation_results",
        "compute_refine_projection_center_results", "merge_crystal_maps",
        "orientation_similarity_map", "xmap_from_hough_indexing_data",
    ],
    "io": ["plugins"],
    "pattern": [
        "chunk", "fft", "fft_filter", "fft_frequency_vectors",
        "fft_spectrum", "get_dynamic_background", "get_image_quality",
        "ifft", "normalize_intensity", "remove_dynamic_background",
        "rescale_intensity",
    ],
    "signals": [
        "EBSD", "EBSDMasterPattern", "ECPMasterPattern", "LazyEBSD",
        "LazyEBSDMasterPattern", "LazyECPMasterPattern",
        "LazyVirtualBSEImage", "VirtualBSEImage", "util",
    ],
    "simulations": [
        "GeometricalKikuchiPatternSimulation", "KikuchiPatternSimulator",
    ],
}


@pytest.mark.parametrize("module", sorted(REFERENCE_API))
def test_namespace_covers_reference(module):
    target = kp if not module else importlib.import_module(
        f"kikuchipy_tpu.{module}"
    )
    missing = [n for n in REFERENCE_API[module] if not hasattr(target, n)]
    assert not missing, f"kikuchipy_tpu.{module} missing {missing}"


class TestCompatShims:
    def test_lazy_aliases_are_eager_classes(self):
        assert kp.signals.LazyEBSD is kp.signals.EBSD
        assert kp.signals.LazyEBSDMasterPattern is kp.signals.EBSDMasterPattern

    def test_pattern_chunk_delegates(self, dummy_patterns):
        out = kp.pattern.chunk.get_dynamic_background(
            dummy_patterns.astype(np.float32), std=2
        )
        assert out.shape == dummy_patterns.shape
        batched = np.asarray(
            kp.pattern.get_dynamic_background(
                dummy_patterns.astype(np.float32), std=2
            )
        )
        np.testing.assert_allclose(out, batched)

    def test_detector_plotter_smoke(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        det = kp.detectors.EBSDDetector(
            shape=(60, 60), pc=(0.42, 0.22, 0.5), sample_tilt=70
        )
        pl = kp.draw.EBSDDetectorPlotter(det)
        fig = pl.plot(return_figure=True)
        assert fig is not None and len(fig.axes) == 3
        plt.close(fig)
        assert "EBSDDetectorPlotter" in repr(pl)
