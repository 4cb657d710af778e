"""Neighbour-pattern-averaging conformance tests against the reference's
hard-coded full-scan goldens
(/root/reference/tests/test_signals/test_ebsd.py:1230-1616,
``TestAverageNeighbourPatterns``): circular/rectangular/gaussian windows,
1D windows on 2D scans, and 1D scans. Exercises window resolution
(even-shape origin = size//2, matching scipy.ndimage.correlate),
zero-extended borders with per-position weight sums, and the final
per-pattern uint8 rescale."""

import numpy as np
import pytest

from kikuchipy_tpu.filters.window import Window
from kikuchipy_tpu.ops.neighbors import average_neighbour_patterns

# fmt: off
CIRCULAR_33 = np.array([
    255, 109, 218, 218, 36, 236, 255, 36, 0, 143, 111, 255, 159, 0,
    207, 159, 63, 175, 135, 119, 34, 119, 0, 255, 153, 119, 102, 182,
    24, 255, 121, 109, 85, 133, 0, 12, 255, 107, 228, 80, 40, 107,
    161, 147, 0, 204, 0, 51, 51, 51, 229, 25, 76, 255, 194, 105,
    255, 135, 149, 60, 105, 119, 0, 204, 102, 255, 89, 127, 0, 12,
    140, 127, 255, 185, 0, 69, 162, 46, 0, 208, 0,
], np.uint8).reshape((3, 3, 3, 3))
RECTANGULAR_23 = np.array([
    255, 223, 223, 255, 0, 223, 255, 63, 0, 109, 145, 145, 200, 0,
    255, 163, 54, 127, 119, 136, 153, 170, 0, 255, 153, 136, 221, 212,
    42, 255, 127, 0, 141, 184, 14, 28, 210, 45, 180, 135, 0, 255,
    210, 15, 30, 200, 109, 182, 109, 0, 255, 182, 145, 182, 150, 34,
    255, 57, 81, 0, 57, 69, 11, 255, 38, 191, 63, 114, 38, 51,
    89, 0, 255, 117, 137, 19, 117, 0, 0, 176, 58,
], np.uint8).reshape((3, 3, 3, 3))
GAUSSIAN_33_STD2 = np.array([
    218, 46, 255, 139, 0, 150, 194, 3, 11, 211, 63, 196, 145, 0,
    255, 211, 33, 55, 175, 105, 155, 110, 0, 255, 169, 135, 177, 184,
    72, 255, 112, 59, 62, 115, 55, 0, 255, 51, 225, 107, 21, 122,
    85, 47, 0, 255, 129, 152, 77, 0, 169, 48, 187, 170, 153, 36,
    255, 63, 86, 0, 57, 69, 4, 254, 45, 206, 58, 115, 16, 33,
    98, 0, 255, 121, 117, 32, 121, 14, 0, 174, 66,
], np.uint8).reshape((3, 3, 3, 3))
# Window (3,) on the full 2D scan: applied along the first (slow, y)
# navigation axis (reference reshapes a short window to shape + (1,)).
WINDOW_1D_ON_2D = np.array([
    233, 106, 212, 233, 170, 233, 255, 21, 0,
    191, 95, 255, 95, 0, 111, 143, 127, 159,
    98, 117, 0, 117, 117, 255, 137, 117, 117,
    239, 95, 255, 223, 191, 175, 207, 31, 0,
    155, 127, 255, 56, 0, 14, 70, 155, 85,
    175, 111, 0, 143, 127, 255, 95, 127, 191,
    231, 0, 255, 162, 139, 139, 162, 23, 0,
    135, 135, 255, 60, 105, 0, 60, 165, 105,
    255, 127, 0, 127, 163, 182, 109, 145, 109,
], np.uint8).reshape((3, 3, 3, 3))
# dummy_signal.inav[:, 0] (the y=0 scan row) averaged with window (3,).
ONE_NAV_DIM = np.array([
    255, 223, 223, 255, 0, 223, 255, 63, 0, 109, 145, 145, 200, 0,
    255, 163, 54, 127, 119, 136, 153, 170, 0, 255, 153, 136, 221,
], np.uint8).reshape((3, 3, 3))
# fmt: on


class TestAverageNeighbourGoldens:
    @pytest.mark.parametrize(
        "window, window_shape, kwargs, answer",
        [
            ("circular", (3, 3), {}, CIRCULAR_33),
            ("rectangular", (2, 3), {}, RECTANGULAR_23),
            ("gaussian", (3, 3), {"std": 2}, GAUSSIAN_33_STD2),
            (None, (3,), {}, WINDOW_1D_ON_2D),
        ],
    )
    def test_full_scan_golden(
        self, dummy_patterns, window, window_shape, kwargs, answer
    ):
        out = np.asarray(
            average_neighbour_patterns(
                dummy_patterns,
                window=window,
                window_shape=window_shape,
                **kwargs,
            )
        )
        assert out.dtype == np.uint8
        if window == "gaussian":
            # Non-integer gaussian weights land one intensity on an
            # exact integer rounding boundary; the reference golden was
            # produced with fastmath float32 (see CLAUDE.md tolerance
            # convention).
            diff = np.abs(out.astype(int) - answer.astype(int))
            assert diff.max() <= 1
            assert (diff > 0).mean() < 0.05
        else:
            np.testing.assert_array_equal(out, answer)

    def test_one_nav_dim_golden(self, dummy_patterns):
        # The reference's 1D-scan case: the y=0 row as a 1-column map so
        # the (3,) -> (3, 1) window averages along the scan direction.
        row = dummy_patterns[0][:, None]  # (3, 1, 3, 3)
        out = np.asarray(
            average_neighbour_patterns(row, window_shape=(3,))
        )
        np.testing.assert_array_equal(out[:, 0], ONE_NAV_DIM)

    def test_pass_window_object(self, dummy_patterns):
        # Passing a prebuilt Window equals passing its name (reference
        # test_average_neighbour_patterns_pass_window).
        out_name = np.asarray(average_neighbour_patterns(dummy_patterns))
        out_win = np.asarray(
            average_neighbour_patterns(dummy_patterns, window=np.asarray(Window()))
        )
        np.testing.assert_array_equal(out_name, out_win)
        np.testing.assert_array_equal(out_name, CIRCULAR_33)


class TestADPReferenceGoldens:
    """Average-neighbour-dot-product map goldens on the real nickel
    scan from the reference test suite
    (/root/reference/tests/test_signals/test_ebsd.py:2197-2290)."""

    @pytest.fixture(scope="class")
    def nickel(self):
        import kikuchipy_tpu as kp

        return kp.load(
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        )

    DEFAULT = [
        [0.995679, 0.996117, 0.997220],
        [0.996363, 0.996561, 0.997252],
        [0.995731, 0.996134, 0.997048],
    ]

    def test_default_circular(self, nickel):
        adp = np.asarray(nickel.get_average_neighbour_dot_product_map())
        assert np.allclose(adp, self.DEFAULT, atol=1e-5)
        assert adp.dtype == np.float32

    def test_rectangular_window(self, nickel):
        from kikuchipy_tpu.filters import Window

        adp = np.asarray(
            nickel.get_average_neighbour_dot_product_map(
                window=Window("rectangular")
            )
        )
        assert np.allclose(
            adp,
            [
                [0.995135, 0.995891, 0.997144],
                [0.995425, 0.996032, 0.997245],
                [0.995160, 0.995959, 0.997019],
            ],
            atol=1e-5,
        )

    def test_zero_mean_false(self, nickel):
        adp = np.asarray(
            nickel.get_average_neighbour_dot_product_map(zero_mean=False)
        )
        assert np.allclose(
            adp,
            [
                [0.999663, 0.999699, 0.999785],
                [0.999717, 0.999733, 0.999786],
                [0.999666, 0.999698, 0.999769],
            ],
            atol=1e-5,
        )

    def test_normalize_false(self, nickel):
        adp = np.asarray(
            nickel.get_average_neighbour_dot_product_map(normalize=False)
        )
        assert np.allclose(
            adp,
            [
                [6402544, 6398041.5, 6434939.5],
                [6411949.5, 6409170, 6464348],
                [6451061, 6456555.5, 6489456],
            ],
            atol=1e-5,
        )


class TestDPMatricesReferenceGoldens:
    """Neighbour dot-product matrix goldens on the real nickel scan
    (/root/reference/tests/test_signals/test_ebsd.py:2408-2530)."""

    @pytest.fixture(scope="class")
    def nickel(self):
        import kikuchipy_tpu as kp

        return kp.load(
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        )

    def test_windows(self, nickel):
        from kikuchipy_tpu.filters import Window

        cases = [
            (
                Window("circular", shape=(3, 3)),
                [
                    [np.nan, 0.997347, np.nan],
                    [0.994177, 1, 0.997358],
                    [np.nan, 0.997360, np.nan],
                ],
            ),
            (
                Window("rectangular", shape=(3, 3)),
                [
                    [0.994048, 0.997347, 0.996990],
                    [0.994177, 1, 0.997358],
                    [0.994017, 0.997360, 0.996960],
                ],
            ),
            (
                Window("rectangular", shape=(3, 2)),
                [[0.994048, 0.997347], [0.994177, 1], [0.994017, 0.997360]],
            ),
            (
                Window("rectangular", shape=(2, 3)),
                [[0.994048, 0.997347, 0.996990], [0.994177, 1, 0.997358]],
            ),
        ]
        for window, want in cases:
            dp = np.asarray(
                nickel.get_neighbour_dot_product_matrices(window=window)
            )
            assert np.allclose(dp[1, 1], want, atol=1e-5, equal_nan=True)

    def test_zero_mean_false(self, nickel):
        dp = np.asarray(
            nickel.get_neighbour_dot_product_matrices(zero_mean=False)
        )
        assert np.allclose(
            dp[1, 1],
            [
                [np.nan, 0.999796, np.nan],
                [0.999547, 1, 0.999794],
                [np.nan, 0.999796, np.nan],
            ],
            atol=1e-5,
            equal_nan=True,
        )
