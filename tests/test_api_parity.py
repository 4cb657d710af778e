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
    "signals.util": ["get_chunking", "get_dask_array", "grid_indices"],
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
        # LazyEBSD is a REAL out-of-core class since round 4
        # (signals/lazy.py); master patterns stay eager aliases.
        from kikuchipy_tpu.signals.lazy import LazyEBSD

        assert kp.signals.LazyEBSD is LazyEBSD
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

    def test_get_chunking_policy(self):
        from kikuchipy_tpu.signals.util import get_chunking

        # 55x75 nav of 60x60 float32 patterns at the reference's 30 MB
        # default: signal axes whole, nav axes split to <= ~30 MB chunks.
        chunks = get_chunking(
            data_shape=(55, 75, 60, 60), nav_dim=2, sig_dim=2,
            dtype="float32",
        )
        assert len(chunks) == 4
        assert chunks[2] == (60,) and chunks[3] == (60,)
        assert sum(chunks[0]) == 55 and sum(chunks[1]) == 75
        max_chunk = max(chunks[0]) * max(chunks[1]) * 60 * 60 * 4
        assert max_chunk <= 30e6
        # A chunk must still be a useful fraction of the budget.
        assert max_chunk >= 0.25 * 30e6

        # Explicit chunk_shape wins over the byte budget.
        chunks = get_chunking(
            data_shape=(9, 60, 60), nav_dim=1, sig_dim=2,
            chunk_shape=4, dtype="uint8",
        )
        assert chunks == ((4, 4, 1), (60,), (60,))

        # Byte-string limits parse like dask's ("1 MB", "1MiB").
        c1 = get_chunking(
            data_shape=(100, 60, 60), nav_dim=1, sig_dim=2,
            chunk_bytes="1 MB", dtype="float32",
        )
        assert max(c1[0]) * 60 * 60 * 4 <= 1e6

        # Small data: one chunk covering everything.
        c2 = get_chunking(
            data_shape=(3, 3, 3, 3), nav_dim=2, sig_dim=2, dtype="uint8"
        )
        assert c2 == ((3,), (3,), (3,), (3,))

    def test_get_chunking_from_signal(self, dummy_patterns):
        from kikuchipy_tpu.signals.util import get_chunking

        signal = kp.signals.EBSD(dummy_patterns)
        chunks = get_chunking(signal=signal)
        assert len(chunks) == signal.data.ndim
        assert tuple(sum(c) for c in chunks) == signal.data.shape

    def test_get_dask_array_requires_dask(self, dummy_patterns):
        from kikuchipy_tpu.signals.util import get_dask_array

        signal = kp.signals.EBSD(dummy_patterns)
        try:
            import dask.array as da  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="streaming"):
                get_dask_array(signal)
        else:
            arr = get_dask_array(signal, dtype="float32")
            assert arr.dtype == np.float32
            np.testing.assert_array_equal(
                np.asarray(arr), np.asarray(signal.data, dtype="float32")
            )

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
