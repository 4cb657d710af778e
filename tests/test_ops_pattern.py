"""Pattern-kernel conformance tests.

Expected outputs are the hard-coded goldens from the reference's own test
suite (/root/reference/tests/test_pattern/test_pattern.py:50-88), which
exercise the same dummy 3x3 scan of 3x3 uint8 patterns. Matching them
verifies our kernels reproduce the reference's behavior bit-for-bit
(integer outputs) / to float tolerance.
"""

import numpy as np
import pytest

from kikuchipy_tpu.ops import pattern as pat

# Goldens from /root/reference/tests/test_pattern/test_pattern.py:50-88,
# all computed from dummy pattern [0, 0] = [[5,6,5],[7,6,5],[6,1,0]].
RESCALED_UINT8 = np.array([[182, 218, 182], [255, 218, 182], [218, 36, 0]], np.uint8)
RESCALED_FLOAT32 = np.array(
    [[0.4285, 0.7142, 0.4285], [1, 0.7142, 0.4285], [0.7142, -0.7142, -1]], np.float32
)
RESCALED_UINT8_0100 = np.array([[71, 85, 71], [100, 85, 71], [85, 14, 0]], np.uint8)
# Full-scan static background goldens from reference
# tests/test_signals/test_ebsd.py (TestRemoveStaticBackgroundEBSD).
# fmt: off
STATIC_SUBTRACT_UINT8 = np.array([
    127, 212, 127, 255, 255, 170, 212, 0, 0, 255, 218, 218, 218, 0, 255, 255,
    218, 218, 0, 92, 69, 139, 92, 231, 92, 92, 255, 218, 0, 182, 182, 145,
    255, 255, 36, 72, 95, 0, 255, 0, 63, 0, 63, 63, 191, 226, 198, 0, 141,
    255, 226, 226, 198, 56, 153, 51, 255, 153, 255, 0, 51, 51, 51, 113, 255,
    198, 113, 198, 0, 56, 255, 85, 191, 63, 0, 127, 127, 127, 0, 95, 255,
], np.uint8).reshape((3, 3, 3, 3))
STATIC_DIVIDE_UINT8 = np.array([
    127, 191, 127, 223, 255, 159, 191, 31, 0, 229, 223, 204, 223, 0, 255,
    255, 223, 255, 0, 63, 51, 106, 56, 191, 63, 63, 255, 196, 0, 167, 182,
    157, 255, 255, 36, 60, 113, 0, 255, 0, 47, 0, 70, 70, 236, 174, 163, 0,
    109, 255, 191, 191, 163, 0, 153, 47, 229, 143, 255, 0, 47, 47, 0, 113,
    255, 181, 113, 226, 0, 56, 255, 75, 132, 51, 10, 102, 119, 102, 0, 76,
    255,
], np.uint8).reshape((3, 3, 3, 3))
# fmt: on
DYN_CORR_UINT8_SPATIAL_STD2 = np.array(
    [[170, 215, 181], [255, 221, 188], [221, 32, 0]], np.uint8
)
DYN_CORR_UINT8_SPATIAL_STD1 = np.array(
    [[120, 197, 156], [255, 241, 223], [226, 0, 9]], np.uint8
)
DYN_CORR_FLOAT32_SPATIAL_DIV_STD0375 = np.array(
    [[0.9248, 0.9727, 0.9449], [0.9865, 1, 0.9986], [0.9903, 0.5766, -1]], np.float32
)
DYN_CORR_UINT8_FREQUENCY_STD1_TRUNCATE3 = np.array(
    [[111, 191, 141], [255, 253, 243], [221, 0, 38]], np.uint8
)
DYN_CORR_UINT8_FREQUENCY_STD2_TRUNCATE4 = np.array(
    [[159, 214, 179], [255, 227, 201], [216, 14, 0]], np.uint8
)


@pytest.fixture
def p00(dummy_patterns):
    return dummy_patterns[0, 0]


class TestRescaleIntensity:
    def test_uint8(self, p00):
        out = pat.rescale_intensity(p00, dtype_out=np.uint8)
        np.testing.assert_array_equal(np.asarray(out), RESCALED_UINT8)

    def test_float32(self, p00):
        out = pat.rescale_intensity(p00, dtype_out=np.float32)
        np.testing.assert_allclose(np.asarray(out), RESCALED_FLOAT32, atol=1e-4)

    def test_default_dtype(self, p00):
        out = pat.rescale_intensity(p00)
        np.testing.assert_array_equal(np.asarray(out), RESCALED_UINT8)

    def test_out_range(self, p00):
        out = pat.rescale_intensity(p00, out_range=(0, 100), dtype_out=np.uint8)
        np.testing.assert_array_equal(np.asarray(out), RESCALED_UINT8_0100)

    def test_complex_raises(self, p00):
        with pytest.raises(KeyError, match="Could not set output"):
            pat.rescale_intensity(p00, dtype_out=complex)

    def test_batched_matches_single(self, dummy_patterns):
        batched = np.asarray(pat.rescale_intensity(dummy_patterns, dtype_out=np.uint8))
        for i in range(3):
            for j in range(3):
                single = np.asarray(
                    pat.rescale_intensity(dummy_patterns[i, j], dtype_out=np.uint8)
                )
                np.testing.assert_array_equal(batched[i, j], single)

    def test_percentiles(self, p00):
        out = np.asarray(
            pat.rescale_intensity(
                p00.astype(np.float32), percentiles=(10, 90), dtype_out=np.uint8
            )
        )
        assert out.min() == 0 and out.max() == 255


class TestNormalizeIntensity:
    def test_zero_mean_unit_std(self, p00):
        out = np.asarray(pat.normalize_intensity(p00.astype(np.float32)))
        assert abs(out.mean()) < 1e-6
        np.testing.assert_allclose(out.std(), 1.0, atol=1e-6)

    def test_divide_by_square_root(self, p00):
        out = np.asarray(
            pat.normalize_intensity(
                p00.astype(np.float32), divide_by_square_root=True
            )
        )
        np.testing.assert_allclose(out.std() * 3, 1.0, atol=1e-6)


class TestRemoveStaticBackground:
    def test_subtract_golden(self, dummy_patterns, dummy_background):
        out = pat.remove_static_background(dummy_patterns, dummy_background, "subtract")
        assert np.asarray(out).dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(out), STATIC_SUBTRACT_UINT8)

    def test_divide_golden(self, dummy_patterns, dummy_background):
        # The reference golden was produced with Numba fastmath; values
        # landing exactly on integer boundaries (e.g. a true value of
        # 153.0 computed as 152.99999x in strict float32) can truncate
        # one gray level lower. Allow at most 1 level on a few pixels.
        out = np.asarray(
            pat.remove_static_background(dummy_patterns, dummy_background, "divide")
        ).astype(np.int32)
        diff = np.abs(out - STATIC_DIVIDE_UINT8.astype(np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.05

    def test_scale_bg_differs(self, p00, dummy_background):
        a = np.asarray(
            pat.remove_static_background(p00, dummy_background, "subtract")
        )
        b = np.asarray(
            pat.remove_static_background(
                p00, dummy_background, "subtract", scale_bg=True
            )
        )
        assert not np.array_equal(a, b)

    def test_invalid_operation(self, p00, dummy_background):
        with pytest.raises(ValueError, match="operation"):
            pat.remove_static_background(p00, dummy_background, "multiply")


class TestRemoveDynamicBackground:
    @pytest.mark.parametrize(
        "std, operation, dtype_out, answer",
        [
            (1, "subtract", np.uint8, DYN_CORR_UINT8_SPATIAL_STD1),
            (2, "subtract", np.uint8, DYN_CORR_UINT8_SPATIAL_STD2),
            (None, "divide", np.float32, DYN_CORR_FLOAT32_SPATIAL_DIV_STD0375),
        ],
    )
    def test_spatial(self, p00, std, operation, dtype_out, answer):
        out = pat.remove_dynamic_background(
            p00.astype(np.float32),
            operation=operation,
            filter_domain="spatial",
            std=std,
            dtype_out=dtype_out,
        )
        np.testing.assert_allclose(np.asarray(out), answer, atol=1e-4)

    @pytest.mark.parametrize(
        "std, truncate, answer",
        [
            (1, 3, DYN_CORR_UINT8_FREQUENCY_STD1_TRUNCATE3),
            (2, 4, DYN_CORR_UINT8_FREQUENCY_STD2_TRUNCATE4),
        ],
    )
    def test_frequency(self, p00, std, truncate, answer):
        out = pat.remove_dynamic_background(
            p00.astype(np.float32), std=std, truncate=truncate, dtype_out=np.uint8
        )
        np.testing.assert_allclose(np.asarray(out), answer)

    def test_invalid_domain(self, p00):
        with pytest.raises(ValueError, match="filter_domain"):
            pat.remove_dynamic_background(p00, filter_domain="Taldorei")

    def test_get_dynamic_background_dtype(self, p00):
        bg = pat.get_dynamic_background(p00, std=2)
        assert np.asarray(bg).dtype == np.uint8


class TestImageQuality:
    def test_frequency_vectors(self):
        fv = pat.fft_frequency_vectors((3, 3))
        # Matches reference fft_frequency_vectors (_pattern.py:365-389).
        expected = np.array([[1, 4, 1], [4, 7, 4], [1, 4, 1]])
        np.testing.assert_array_equal(fv, expected)

    def test_iq_in_range(self, dummy_patterns):
        iq = np.asarray(pat.get_image_quality(dummy_patterns))
        assert iq.shape == (3, 3)
        assert np.all(iq <= 1.0)


class TestBinning:
    def test_bin2d(self):
        p = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = np.asarray(pat.bin2d(p, 2))
        expected = np.array([[10, 18], [42, 50]], np.float32)
        np.testing.assert_array_equal(out, expected)

    def test_downsample_rescales(self):
        p = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = np.asarray(pat.downsample(p, 2, dtype_out=np.uint8))
        assert out.shape == (2, 2)
        assert out.min() == 0 and out.max() == 255


class TestFFTFilter:
    def test_lowpass_roundtrip(self, p00):
        from kikuchipy_tpu.filters.window import Window

        tf = Window("lowpass", cutoff=1.4, shape=(3, 3))
        out = pat.fft_filter(
            p00.astype(np.float32), np.asarray(tf), shift=True
        )
        assert np.asarray(out).shape == (3, 3)

    def test_identity_transfer(self, p00):
        out = np.asarray(
            pat.fft_filter(p00.astype(np.float32), np.ones((3, 3)), shift=False)
        )
        np.testing.assert_allclose(out, p00.astype(np.float32), atol=1e-4)


class TestPercentileConformance:
    def test_matches_numpy_per_pattern(self, dummy_patterns):
        out = np.asarray(
            pat.rescale_intensity(
                dummy_patterns.astype(np.float32),
                percentiles=(10, 90),
                dtype_out=np.float32,
            )
        )
        for i in range(3):
            for j in range(3):
                p = dummy_patterns[i, j].astype(np.float32)
                lo, hi = np.nanpercentile(p, q=(10, 90))
                clipped = np.clip(p, lo, hi)
                expected = (clipped - lo) / (hi - lo) * 2 - 1
                np.testing.assert_allclose(out[i, j], expected, atol=1e-5)


class TestGetDynamicBackgroundReferenceGoldens:
    """Hard-coded expected backgrounds of the dummy pattern (0, 0) from
    the reference test suite
    (/root/reference/tests/test_pattern/test_pattern.py:282-328)."""

    @pytest.mark.parametrize(
        "std, truncate, answer",
        [
            (1, 4, [[4, 4, 4], [5, 4, 3], [4, 2, 1]]),
            (2, 2, [[4, 4, 3], [4, 4, 4], [4, 4, 4]]),
            (None, 4, [[4, 4, 4], [5, 4, 4], [5, 1, 0]]),
        ],
    )
    def test_spatial(self, dummy_patterns, std, truncate, answer):
        p = dummy_patterns[0, 0]
        bg = np.asarray(
            pat.get_dynamic_background(
                p, filter_domain="spatial", std=std, truncate=truncate
            )
        )
        assert np.allclose(bg, answer)

    @pytest.mark.parametrize(
        "std, dtype, answer",
        [
            (1, np.uint8, [[5, 5, 5], [5, 5, 4], [5, 4, 3]]),
            (2, np.uint8, [[5, 5, 4], [5, 4, 4], [5, 4, 3]]),
            (
                1,
                np.float32,
                [
                    [5.3672, 5.4999, 5.4016],
                    [5.7932, 5.4621, 4.8999],
                    [5.8638, 4.7310, 3.3672],
                ],
            ),
        ],
    )
    def test_frequency(self, dummy_patterns, std, dtype, answer):
        p = dummy_patterns[0, 0].astype(dtype)
        bg = np.asarray(pat.get_dynamic_background(p, std=std))
        assert np.allclose(bg, answer, atol=1e-4)


class TestImageQualityReferenceGoldens:
    """Per-pattern IQ goldens from the reference test suite
    (/root/reference/tests/test_pattern/test_pattern.py:336-357)."""

    @pytest.mark.parametrize(
        "idx, normalize, answer",
        [
            ((0, 0), True, -0.0241),
            ((0, 0), False, 0.2694),
            ((2, 2), True, -0.2385),
        ],
    )
    def test_per_pattern(self, dummy_patterns, idx, normalize, answer):
        p = dummy_patterns[idx].astype(np.float32)
        iq = float(np.asarray(pat.get_image_quality(p, normalize=normalize)))
        assert np.isclose(iq, answer, atol=1e-4)

    def test_white_noise_near_zero(self):
        rng = np.random.default_rng(0)
        p = rng.random((501, 501)).astype(np.float32)
        iq = float(np.asarray(pat.get_image_quality(p)))
        assert np.isclose(iq, 0.0, atol=1e-2)


class TestFFTReferenceGoldens:
    """FFT spectrum-sum and apodization goldens from the reference
    test suite (/root/reference/tests/test_pattern/test_pattern.py:
    410-445). Our kernels accumulate in float32, so sums match the
    reference's float64 values at f32 resolution (ULP 2e-3 at 1.5e4)."""

    @pytest.mark.parametrize(
        "shift, real_fft_only, expected_sum",
        [
            (True, True, 15352),
            (True, False, 20402),
            (False, False, 20402),
            (False, True, 15352),
        ],
    )
    def test_spectrum_sum(self, shift, real_fft_only, expected_sum):
        p = np.ones((101, 101))
        p[50, 50] = 2
        f = pat.fft(p, shift=shift, real_fft_only=real_fft_only)
        s = float(np.sum(np.asarray(pat.fft_spectrum(f))))
        assert np.isclose(s, expected_sum, atol=0.01)

    def test_apodization_window_equals_premultiplied(self, dummy_patterns):
        from kikuchipy_tpu.filters import Window

        p = dummy_patterns[0, 0]
        w = Window("hamming", shape=p.shape)
        p2 = np.asarray(pat.fft(p, apodization_window=np.asarray(w), shift=True))
        p3 = np.asarray(pat.fft(p * np.asarray(w), shift=True))
        p4 = np.asarray(pat.fft(p, shift=True))
        np.testing.assert_allclose(p2, p3, atol=1e-5)
        assert not np.allclose(p2, p4, atol=1e-1)

    @pytest.mark.parametrize("shift", [True, False])
    def test_ifft_roundtrip_even_axis(self, shift):
        rng = np.random.default_rng(0)
        p = rng.random((101, 100))
        f = pat.fft(p, shift=shift)
        np.testing.assert_allclose(
            np.asarray(pat.ifft(f, shift=shift)), p, atol=1e-5
        )
