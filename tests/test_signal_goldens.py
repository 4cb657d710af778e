"""Signal-level dynamic-background and image-quality conformance
tests against reference goldens
(/root/reference/tests/test_signals/test_ebsd.py:533-620,1893-1933).
These exercise the frequency-domain (Barnes rFFT) path at the
signal level."""

import numpy as np
import pytest

from kikuchipy_tpu.signals.ebsd import EBSD

# fmt: off
DYN_SUBTRACT_STD2 = np.array([
    170, 215, 181, 255, 221, 188, 221, 32, 0, 255,
    198, 228, 199, 0, 230, 229, 201, 174, 0, 84,
    77, 147, 48, 255, 81, 74, 249, 246, 0, 216,
    177, 109, 255, 250, 40, 44, 120, 2, 255, 8,
    32, 0, 67, 63, 145, 254, 195, 0, 120, 229,
    237, 222, 196, 1, 164, 34, 255, 128, 173, 0,
    47, 49, 7, 133, 245, 218, 110, 166, 0, 59,
    255, 60, 255, 71, 35, 145, 108, 144, 0, 108,
    253,
], np.uint8).reshape((3, 3, 3, 3))
DYN_SUBTRACT_STD3 = np.array([
    181, 218, 182, 255, 218, 182, 218, 36, 0, 255,
    198, 226, 198, 0, 226, 226, 198, 170, 0, 84,
    84, 142, 56, 255, 84, 84, 254, 254, 0, 218,
    181, 109, 255, 254, 36, 36, 113, 0, 255, 0,
    28, 0, 57, 57, 141, 255, 191, 0, 127, 223,
    223, 223, 191, 0, 169, 42, 255, 127, 170, 0,
    42, 42, 0, 141, 254, 226, 113, 169, 0, 56,
    255, 56, 255, 72, 36, 145, 109, 145, 0, 109,
    254,
], np.uint8).reshape((3, 3, 3, 3))
DYN_DIVIDE_STD2 = np.array([
    176, 217, 186, 254, 225, 194, 225, 39, 0, 255,
    199, 228, 199, 0, 231, 230, 202, 174, 0, 93,
    88, 159, 60, 255, 91, 86, 245, 241, 0, 214,
    174, 107, 255, 247, 37, 38, 127, 0, 255, 0,
    30, 0, 67, 63, 150, 255, 199, 0, 128, 234,
    244, 224, 201, 0, 166, 42, 254, 133, 180, 0,
    47, 48, 0, 132, 238, 212, 109, 164, 0, 56,
    255, 57, 255, 72, 36, 146, 109, 145, 0, 109,
    252,
], np.uint8).reshape((3, 3, 3, 3))
DYN_DIVIDE_STD3 = np.array([
    181, 218, 182, 255, 219, 182, 219, 36, 0, 255,
    198, 226, 198, 0, 226, 226, 198, 170, 0, 85,
    85, 142, 56, 255, 85, 85, 254, 254, 0, 218,
    181, 109, 254, 254, 36, 36, 114, 0, 255, 0,
    28, 0, 57, 57, 142, 255, 191, 0, 127, 223,
    224, 223, 191, 0, 169, 42, 255, 127, 170, 0,
    42, 42, 0, 141, 253, 225, 113, 169, 0, 56,
    254, 56, 255, 72, 36, 145, 109, 145, 0, 109,
    254,
], np.uint8).reshape((3, 3, 3, 3))
# fmt: on

IQ_NORMALIZED = np.array([
    [-0.0241, -0.0625, -0.0052],
    [-0.0317, -0.0458, -0.0956],
    [-0.1253, 0.0120, -0.2385],
])
IQ_RAW = np.array([
    [0.2694, 0.2926, 0.2299],
    [0.2673, 0.1283, 0.2032],
    [0.1105, 0.2671, 0.2159],
])


class TestSignalDynamicBackground:
    @pytest.mark.parametrize(
        "operation, std, answer",
        [
            ("subtract", 2, DYN_SUBTRACT_STD2),
            ("subtract", 3, DYN_SUBTRACT_STD3),
            ("divide", 2, DYN_DIVIDE_STD2),
            ("divide", 3, DYN_DIVIDE_STD3),
        ],
    )
    def test_golden(self, dummy_patterns, operation, std, answer):
        s = EBSD(data=dummy_patterns)
        out = s.remove_dynamic_background(
            operation=operation, std=std, filter_domain="spatial"
        )
        got = np.asarray(out.data).astype(int)
        diff = np.abs(got - answer.astype(int))
        # Integer-boundary truncation tolerance as for the static
        # background goldens (reference kernels use fastmath).
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.05


class TestSignalImageQuality:
    def test_normalized(self, dummy_patterns):
        s = EBSD(data=dummy_patterns)
        iq = s.get_image_quality(normalize=True)
        np.testing.assert_allclose(iq, IQ_NORMALIZED, atol=1e-4)

    def test_raw(self, dummy_patterns):
        s = EBSD(data=dummy_patterns)
        iq = s.get_image_quality(normalize=False)
        np.testing.assert_allclose(iq, IQ_RAW, atol=1e-4)


class TestRescaleIntensityGoldens:
    """Reference goldens from tests/test_signals/test_ebsd.py:1031-1115."""

    @pytest.mark.parametrize(
        "kwargs, answer",
        [
            (
                dict(relative=True),
                np.array([[141, 170, 141], [198, 170, 141], [170, 28, 0]],
                         np.uint8),
            ),
            (
                dict(relative=True, dtype_out=np.float32),
                np.array([[0.1111, 0.3333, 0.1111], [0.5555, 0.3333, 0.1111],
                          [0.3333, -0.7777, -1]], np.float32),
            ),
            (
                dict(),
                np.array([[182, 218, 182], [255, 218, 182], [218, 36, 0]],
                         np.uint8),
            ),
            (
                dict(dtype_out=np.float32),
                np.array([[0.4285, 0.7142, 0.4285], [1, 0.7142, 0.4285],
                          [0.7142, -0.7142, -1]], np.float32),
            ),
        ],
    )
    def test_golden(self, dummy_patterns, kwargs, answer):
        s = EBSD(data=dummy_patterns).rescale_intensity(**kwargs)
        got = np.asarray(s.data)[0, 0]
        assert got.dtype == answer.dtype
        np.testing.assert_allclose(got, answer, atol=1e-4)

    @pytest.mark.parametrize(
        "percentiles, answer",
        [
            ((10, 90), np.array([[198, 245, 198], [254, 245, 198],
                                 [245, 9, 0]])),
            ((1, 99), np.array([[183, 220, 183], [255, 220, 183],
                                [220, 34, 0]])),
        ],
    )
    def test_percentiles_golden(self, dummy_patterns, percentiles, answer):
        s = EBSD(data=dummy_patterns.astype(np.float32))
        out = s.rescale_intensity(percentiles=percentiles, dtype_out=np.uint8)
        got = np.asarray(out.data)[0, 0].astype(int)
        # Reference asserts atol=2 (fastmath/percentile interpolation).
        assert np.abs(got - answer).max() <= 2

    def test_conflicting_args_raise(self, dummy_patterns):
        s = EBSD(data=dummy_patterns)
        with pytest.raises(ValueError, match="'percentiles' must be None"):
            s.rescale_intensity(in_range=(0, 9), percentiles=(1, 99))
        with pytest.raises(ValueError, match="'in_range' must be None"):
            s.rescale_intensity(relative=True, in_range=(0, 9))


class TestNormalizeIntensityGoldens:
    """Reference goldens from tests/test_signals/test_ebsd.py:2075-2135."""

    @pytest.mark.parametrize(
        "num_std, sqrt, answer",
        [
            (1, True, np.array([[0.0653, 0.2124, 0.0653],
                                [0.3595, 0.2124, 0.0653],
                                [0.2124, -0.5229, -0.6700]])),
            (2, True, np.array([[0.0326, 0.1062, 0.0326],
                                [0.1797, 0.1062, 0.0326],
                                [0.1062, -0.2614, -0.3350]])),
            (1, False, np.array([[0.1961, 0.6373, 0.1961],
                                 [1.0786, 0.6373, 0.1961],
                                 [0.6373, -1.5689, -2.0101]])),
        ],
    )
    def test_float_golden(self, dummy_patterns, num_std, sqrt, answer):
        s = EBSD(data=dummy_patterns).normalize_intensity(
            num_std=num_std, divide_by_square_root=sqrt, dtype_out=np.float32
        )
        got = np.asarray(s.data)[0, 0]
        np.testing.assert_allclose(got, answer, atol=1e-4)
        assert abs(float(np.mean(np.asarray(s.data)))) < 1e-6

    def test_int16_truncation_golden(self, dummy_patterns):
        # dtype_out=None keeps the input dtype (int16), truncating.
        s = EBSD(data=dummy_patterns.astype(np.int16)).normalize_intensity()
        got = np.asarray(s.data)[0, 0]
        assert got.dtype == np.int16
        np.testing.assert_array_equal(
            got, np.array([[0, 0, 0], [1, 0, 0], [0, -1, -2]])
        )


class TestStaticBackgroundScaleGolden:
    def test_scale_bg_golden(self, dummy_patterns, dummy_background):
        """Reference golden from tests/test_signals/test_ebsd.py:476-488."""
        s = EBSD(data=dummy_patterns).remove_static_background(
            scale_bg=True, static_bg=dummy_background
        )
        np.testing.assert_array_equal(
            np.asarray(s.data)[0, 0],
            np.array([[15, 150, 15], [180, 255, 120], [150, 0, 75]]),
        )


class TestAverageNeighbourGolden:
    def test_arange_oracle(self):
        """Manual build-up oracle from tests/test_signals/test_ebsd.py:
        1625-1650 (plus-window neighbor sums, then per-pattern rescale).
        """
        from kikuchipy_tpu.ops.pattern import rescale_intensity

        arr = np.arange(81, dtype=np.float32).reshape(3, 3, 3, 3)
        wsum = np.array([[3, 4, 3], [4, 5, 4], [3, 4, 3]])
        desired = np.zeros_like(arr)
        for i in range(3):
            for j in range(3):
                p = np.zeros((3, 3), arr.dtype)
                for k in [(i - 1, j), (i, j), (i + 1, j), (i, j - 1), (i, j + 1)]:
                    if -1 not in k and 3 not in k:
                        p += arr[k]
                p /= wsum[i, j]
                desired[i, j] = np.asarray(
                    rescale_intensity(p[None], dtype_out=np.float32)
                )[0]
        got = np.asarray(EBSD(data=arr).average_neighbour_patterns().data)
        np.testing.assert_allclose(got, desired, atol=1e-5)


class TestFFTFilterSpatialGolden:
    def test_sobel_equals_correlate(self, dummy_patterns):
        """Barnes spatial filtering == scipy.ndimage.correlate + rescale
        (reference tests/test_signals/test_ebsd.py:1987-2010)."""
        from scipy.ndimage import correlate

        w = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]])
        s = EBSD(data=dummy_patterns.astype(np.float32))
        got = np.asarray(s.fft_filter(w, function_domain="spatial").data)
        for i in range(3):
            for j in range(3):
                p3 = correlate(dummy_patterns[i, j].astype(np.float32), weights=w)
                p3 = (p3 - p3.min()) / (p3.max() - p3.min()) * 2 - 1
                np.testing.assert_allclose(got[i, j], p3, atol=1e-5)

    def test_unknown_domain_raises(self, dummy_patterns):
        s = EBSD(data=dummy_patterns)
        with pytest.raises(ValueError, match="function_domain must be"):
            s.fft_filter(np.ones((3, 3)), function_domain="Underdark")
