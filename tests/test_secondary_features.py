"""Tests for neighbour ops, CLAHE, OSM, merge_crystal_maps, and VBSE."""

import numpy as np
import pytest

from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, Phase, PhaseList
from kikuchipy_tpu.crystallography.sampling import super_fibonacci
from kikuchipy_tpu.indexing.merge import merge_crystal_maps
from kikuchipy_tpu.indexing.osm import orientation_similarity_map
from kikuchipy_tpu.ops.ahe import adaptive_histogram_equalization
from kikuchipy_tpu.ops.neighbors import (
    average_dot_product_map,
    average_neighbour_patterns,
    neighbour_dot_product_matrices,
)
from kikuchipy_tpu.imaging.vbse import VirtualBSEImager, get_rgb_image
from kikuchipy_tpu.signals.ebsd import EBSD


class TestAverageNeighbourPatterns:
    def test_identity_window_noop(self, dummy_patterns):
        with np.testing.assert_no_warnings():
            out = average_neighbour_patterns(
                dummy_patterns, window=np.ones((1, 1))
            )
        np.testing.assert_array_equal(np.asarray(out), dummy_patterns)

    def test_averaging_smooths(self, dummy_patterns):
        out = np.asarray(average_neighbour_patterns(dummy_patterns))
        assert out.shape == dummy_patterns.shape
        assert out.dtype == np.uint8
        # Full-range rescale per pattern
        assert (out.min(axis=(2, 3)) == 0).all()
        assert (out.max(axis=(2, 3)) == 255).all()

    def test_uniform_map_stays_uniform(self):
        # If all patterns are identical, averaging must reproduce them
        # exactly (after the per-pattern rescale).
        p = np.tile(np.arange(9, dtype=np.uint8).reshape(1, 1, 3, 3), (4, 4, 1, 1))
        out = np.asarray(average_neighbour_patterns(p))
        expected = np.asarray(
            average_neighbour_patterns(p[:1, :1], window=np.ones((1, 1)))
        )
        # rescaled original
        from kikuchipy_tpu.ops.pattern import rescale_intensity

        exp = np.asarray(rescale_intensity(p[0, 0]))
        np.testing.assert_array_equal(out[2, 2], exp)

    def test_matches_scipy_correlate(self, dummy_patterns):
        from scipy.ndimage import correlate

        w = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=float)
        out = np.asarray(
            average_neighbour_patterns(dummy_patterns, window=w)
        )
        # Reference semantics: correlate patterns and window sums over
        # nav axes with zero-extension, divide, per-pattern rescale.
        p = dummy_patterns.astype(np.float32)
        num = correlate(p, w[:, :, None, None], mode="constant")
        den = correlate(
            np.ones((3, 3), dtype=float), w, mode="constant"
        )
        # The reference divides and rescales in float32 (numba kernel,
        # pattern/chunk.py:147-165) after scipy's f64-accumulated
        # correlate; mirror that op order exactly.
        avg = (num / den[:, :, None, None]).astype(np.float32)
        imin = avg.min(axis=(2, 3), keepdims=True)
        imax = avg.max(axis=(2, 3), keepdims=True)
        expected = (
            (avg - imin) / (imax - imin) * np.float32(255)
        ).astype(np.uint8)
        np.testing.assert_array_equal(out, expected)


class TestNeighbourDotProducts:
    def test_adp_map(self, dummy_patterns):
        adp = average_dot_product_map(dummy_patterns)
        assert adp.shape == (3, 3)
        assert np.isfinite(adp).all()
        assert (adp <= 1.0 + 1e-6).all()

    def test_identical_patterns_give_one(self):
        p = np.tile(np.arange(9, dtype=np.uint8).reshape(1, 1, 3, 3), (4, 4, 1, 1))
        adp = average_dot_product_map(p)
        np.testing.assert_allclose(adp, 1.0, atol=1e-6)

    def test_matrices(self, dummy_patterns):
        m = neighbour_dot_product_matrices(dummy_patterns)
        assert m.shape == (3, 3, 3, 3)
        # Corner coefficients of the circular window are NaN
        assert np.isnan(m[0, 0, 0, 0])
        # Center value is the squared norm of the normalized pattern = 1
        np.testing.assert_allclose(m[1, 1, 1, 1], 1.0, atol=1e-6)
        # Symmetric: dp(a->b) == dp(b->a)
        np.testing.assert_allclose(m[1, 1, 1, 2], m[1, 2, 1, 0], atol=1e-6)


class TestAHE:
    def test_shape_dtype(self, dummy_patterns):
        # Tiny patterns: kernel floor 1x1
        out = adaptive_histogram_equalization(dummy_patterns, kernel_size=(2, 2))
        assert np.asarray(out).shape == dummy_patterns.shape
        assert np.asarray(out).dtype == np.uint8

    def test_equalizes_real_pattern(self):
        # A low-contrast gradient image gets its histogram flattened.
        rng = np.random.default_rng(0)
        img = (
            np.linspace(100, 156, 64 * 64)
            .reshape(64, 64)
            .astype(np.float32)
        )
        img += rng.normal(scale=2, size=img.shape)
        out = np.asarray(
            adaptive_histogram_equalization(
                img.astype(np.uint8), kernel_size=(16, 16)
            )
        )
        assert out.min() == 0 and out.max() == 255
        # Histogram must be flatter: std of histogram counts decreases
        h_in, _ = np.histogram(img, bins=32, range=(0, 255))
        h_out, _ = np.histogram(out, bins=32, range=(0, 255))
        assert h_out.std() < h_in.std()

    def test_monotone_within_tile(self):
        # CLAHE preserves intensity order within a single-tile image.
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, size=(32, 32)).astype(np.uint8)
        out = np.asarray(
            adaptive_histogram_equalization(img, kernel_size=(32, 32))
        )
        order_in = np.argsort(img.ravel(), kind="stable")
        assert (np.diff(out.ravel()[order_in].astype(int)) >= 0).all()


class TestOSM:
    def test_identical_lists_give_n(self):
        sim = np.tile(np.arange(5), (9, 1))
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"simulation_indices": sim, "scores": np.ones((9, 5))},
        )
        osm = orientation_similarity_map(xmap)
        np.testing.assert_allclose(osm, 5.0)

    def test_disjoint_lists_give_zero(self):
        sim = (np.arange(9)[:, None] * 10) + np.arange(5)
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"simulation_indices": sim, "scores": np.ones((9, 5))},
        )
        osm = orientation_similarity_map(xmap)
        np.testing.assert_allclose(osm, 0.0)

    def test_normalize_and_from_n_best(self):
        sim = np.tile(np.arange(5), (9, 1))
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"simulation_indices": sim, "scores": np.ones((9, 5))},
        )
        osm = orientation_similarity_map(xmap, normalize=True)
        np.testing.assert_allclose(osm, 1.0)
        osms = orientation_similarity_map(xmap, n_best=5, from_n_best=3)
        assert osms.shape == (3, 3, 3)

    def test_n_best_too_large(self):
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"simulation_indices": np.zeros((9, 2), int), "scores": np.ones((9, 2))},
        )
        with pytest.raises(ValueError, match="cannot be greater"):
            orientation_similarity_map(xmap, n_best=5)


class TestMergeCrystalMaps:
    def _make_map(self, scores, name, sim_offset=0):
        n, k = scores.shape
        return CrystalMap(
            rotations=super_fibonacci(n * k).reshape(n, k, 4),
            shape=(n,),
            prop={
                "scores": scores,
                "simulation_indices": np.arange(n * k).reshape(n, k) + sim_offset,
            },
            phases=PhaseList(Phase(name, space_group=225)),
        )

    def test_phase_assignment(self):
        s1 = np.array([[0.9, 0.8], [0.2, 0.1], [0.5, 0.4]])
        s2 = np.array([[0.3, 0.2], [0.7, 0.6], [0.6, 0.5]])
        m1 = self._make_map(s1, "a")
        m2 = self._make_map(s2, "b")
        merged = merge_crystal_maps([m1, m2])
        np.testing.assert_array_equal(merged.phase_id, [0, 1, 1])
        np.testing.assert_allclose(merged.prop["scores"][0], s1[0])
        np.testing.assert_allclose(merged.prop["scores"][1], s2[1])
        # merged_scores is the descending sort of all scores
        np.testing.assert_allclose(
            merged.prop["merged_scores"][0], [0.9, 0.8, 0.3, 0.2]
        )
        assert merged.phases.names == ["a", "b"]

    def test_mean_n_best(self):
        # First map has best top-1 but worse top-2 mean.
        s1 = np.array([[0.9, 0.1]])
        s2 = np.array([[0.8, 0.7]])
        m1, m2 = self._make_map(s1, "a"), self._make_map(s2, "b")
        top1 = merge_crystal_maps([m1, m2], mean_n_best=1)
        top2 = merge_crystal_maps([m1, m2], mean_n_best=2)
        assert top1.phase_id[0] == 0
        assert top2.phase_id[0] == 1

    def test_single_map_raises(self):
        m = self._make_map(np.ones((2, 2)), "a")
        with pytest.raises(ValueError, match="at least two"):
            merge_crystal_maps([m])


class TestVBSE:
    @pytest.fixture
    def signal(self, dummy_patterns):
        return EBSD(data=dummy_patterns)

    def test_grid(self, signal):
        imager = VirtualBSEImager(signal)
        imager.grid_shape = (3, 3)
        assert imager.roi_from_grid((1, 1)) == (1, 2, 1, 2)

    def test_intensity_sum(self, signal, dummy_patterns):
        imager = VirtualBSEImager(signal)
        roi = (0, 2, 0, 2)
        img = imager.get_virtual_bse_intensity(roi)
        expected = dummy_patterns[..., 0:2, 0:2].astype(np.float32).sum(axis=(2, 3))
        np.testing.assert_allclose(img, expected)

    def test_images_from_grid(self, signal):
        imager = VirtualBSEImager(signal)
        imager.grid_shape = (3, 3)
        images = imager.get_images_from_grid()
        assert images.shape == (3, 3, 3, 3)

    def test_rgb_image(self, signal):
        imager = VirtualBSEImager(signal)
        imager.grid_shape = (3, 3)
        rgb = imager.get_rgb_image(r=(0, 0), g=(1, 1), b=(2, 2))
        assert rgb.shape == (3, 3, 3)
        assert rgb.dtype == np.uint8

    def test_rgb_percentiles(self, signal):
        imager = VirtualBSEImager(signal)
        imager.grid_shape = (3, 3)
        rgb = imager.get_rgb_image(
            r=(0, 0), g=(1, 1), b=(2, 2), percentiles=(1, 99)
        )
        assert rgb.dtype == np.uint8


class TestOSMCenterIndex:
    def test_center_index_selects_footprint_center(self):
        # 3x1 vertical footprint: truthy cells (0,1),(1,1),(2,1) of a
        # 3x3 array; center_index=1 is the geometric center.
        sim = np.tile(np.arange(5), (9, 1))
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"simulation_indices": sim, "scores": np.ones((9, 5))},
        )
        fp = np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], dtype=bool)
        osm = orientation_similarity_map(xmap, footprint=fp, center_index=1)
        np.testing.assert_allclose(osm, 5.0)

    def test_center_index_out_of_range(self):
        sim = np.tile(np.arange(5), (9, 1))
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"simulation_indices": sim, "scores": np.ones((9, 5))},
        )
        with pytest.raises(ValueError, match="center_index"):
            orientation_similarity_map(xmap, center_index=9)


class TestMergeNavigationMasks:
    def _make_map(self, scores, name, sim_offset=0):
        n, k = scores.shape
        return CrystalMap(
            rotations=super_fibonacci(n * k).reshape(n, k, 4),
            shape=(n,),
            prop={
                "scores": scores,
                "simulation_indices": np.arange(n * k).reshape(n, k)
                + sim_offset,
            },
            phases=PhaseList(Phase(name, space_group=225)),
        )

    def test_disjoint_masks(self):
        # Map a covers points 0,1 of a 4-point grid; map b covers 2,3.
        m_a = self._make_map(np.array([[0.9, 0.8], [0.7, 0.6]]), "a")
        m_b = self._make_map(np.array([[0.5, 0.4], [0.3, 0.2]]), "b")
        mask_a = np.array([False, False, True, True])
        mask_b = np.array([True, True, False, False])
        merged = merge_crystal_maps(
            [m_a, m_b], navigation_masks=[mask_a, mask_b]
        )
        np.testing.assert_array_equal(merged.phase_id, [0, 0, 1, 1])
        np.testing.assert_allclose(
            merged.prop["scores"][:, 0], [0.9, 0.7, 0.5, 0.3]
        )

    def test_overlapping_masks_pick_better(self):
        # Both maps cover the middle two points; b wins the third point.
        m_a = self._make_map(np.array([[0.9, 0.8], [0.2, 0.1], [0.5, 0.4]]), "a")
        m_b = self._make_map(np.array([[0.7, 0.6], [0.6, 0.5]]), "b")
        mask_a = np.array([False, False, False, True])
        mask_b = np.array([True, False, False, True])
        merged = merge_crystal_maps(
            [m_a, m_b], navigation_masks=[mask_a, mask_b]
        )
        # point 0: only a; point 1: a 0.2 vs b 0.7 -> b; point 2:
        # a 0.5 vs b 0.6 -> b; point 3: neither -> -1.
        np.testing.assert_array_equal(merged.phase_id, [0, 1, 1, -1])
        assert np.isnan(merged.prop["scores"][3]).all()

    def test_mask_count_mismatch(self):
        m_a = self._make_map(np.ones((2, 2)), "a")
        m_b = self._make_map(np.ones((2, 2)), "b")
        with pytest.raises(ValueError, match="navigation mask"):
            merge_crystal_maps(
                [m_a, m_b],
                navigation_masks=[np.array([False, True, True]), None],
            )

    def test_lower_is_better_via_negative_mean_n_best(self):
        m_a = self._make_map(np.array([[0.1, 0.2]]), "a")
        m_b = self._make_map(np.array([[0.3, 0.4]]), "b")
        merged = merge_crystal_maps([m_a, m_b], mean_n_best=-1)
        assert merged.phase_id[0] == 0
        # Explicit greater_is_better=False equals the sign convention.
        merged2 = merge_crystal_maps(
            [m_a, m_b], mean_n_best=1, greater_is_better=False
        )
        assert merged2.phase_id[0] == 0


class TestWindowReferenceGoldens:
    """Transfer-function and window goldens from the reference test
    suite (/root/reference/tests/test_filters/test_window.py:282-495)."""

    def test_lowpass_fft_filter(self):
        from kikuchipy_tpu.filters import Window, lowpass_fft_filter

        w = lowpass_fft_filter(shape=(5, 5), cutoff=1, cutoff_width=1)
        answer = np.array(
            [
                [0.0012, 0.0470, 0.1353, 0.0470, 0.0012],
                [0.0470, 0.7095, 1.0, 0.7095, 0.0470],
                [0.1353, 1.0, 1.0, 1.0, 0.1353],
                [0.0470, 0.7095, 1.0, 0.7095, 0.0470],
                [0.0012, 0.0470, 0.1353, 0.0470, 0.0012],
            ]
        )
        assert np.allclose(w, answer, atol=1e-4)
        w2 = lowpass_fft_filter(shape=(6, 5), cutoff=2, cutoff_width=1)
        answer2 = np.array(
            [
                [0.0057, 0.0670, 0.1353, 0.0670, 0.0057],
                [0.2534, 0.8945, 1.0, 0.8945, 0.2534],
                [0.8945, 1.0, 1.0, 1.0, 0.8945],
                [1.0, 1.0, 1.0, 1.0, 1.0],
                [0.8945, 1.0, 1.0, 1.0, 0.8945],
                [0.2534, 0.8945, 1.0, 0.8945, 0.2534],
            ]
        )
        assert np.allclose(w2, answer2, atol=1e-4)
        w3 = Window("lowpass", cutoff=30, cutoff_width=15, shape=(96, 96))
        w4 = lowpass_fft_filter(shape=(96, 96), cutoff=30)
        assert np.allclose(w3, w4)

    def test_highpass_fft_filter(self):
        from kikuchipy_tpu.filters import Window, highpass_fft_filter

        w = highpass_fft_filter(shape=(5, 5), cutoff=2, cutoff_width=2)
        answer = np.array(
            [
                [1, 1, 1, 1, 1],
                [1, 0.8423, 0.6065, 0.8423, 1],
                [1, 0.6065, 0.1353, 0.6065, 1],
                [1, 0.8423, 0.6065, 0.8423, 1],
                [1, 1, 1, 1, 1],
            ]
        )
        assert np.allclose(w, answer, atol=1e-4)
        w2 = Window("highpass", cutoff=30, cutoff_width=15, shape=(96, 96))
        w3 = highpass_fft_filter(shape=(96, 96), cutoff=30)
        assert np.allclose(w2, w3)

    def test_modified_hann(self):
        from kikuchipy_tpu.filters import Window, modified_hann

        assert np.allclose(modified_hann(3), [0.5, 1, 0.5], atol=1e-4)
        answer11 = [0.1423, 0.4154, 0.6548, 0.8412, 0.9594, 1.0, 0.9594,
                    0.8412, 0.6548, 0.4154, 0.1423]
        assert np.allclose(modified_hann(11), answer11, atol=1e-4)
        assert np.isclose(np.sum(modified_hann(96)), 61.1182, atol=1e-4)
        assert np.isclose(np.sum(modified_hann(801)), 509.9328, atol=1e-4)
        assert np.allclose(
            Window("modified_hann", shape=(30,)), modified_hann(30)
        )

    def test_distance_to_origin(self):
        from kikuchipy_tpu.filters import distance_to_origin

        r = distance_to_origin(shape=(3, 4), origin=(1, 3))
        answer = np.array(
            [
                [3.1622, 2.2360, 1.4142, 1],
                [3, 2, 1, 0],
                [3.1622, 2.2360, 1.4142, 1],
            ]
        )
        assert np.allclose(r, answer, atol=1e-4)

    def test_gaussian_normalized(self):
        from kikuchipy_tpu.filters import Window

        std = 0.5
        w = Window("gaussian", std=std, shape=(3, 3))
        w = w / (2 * np.pi * std**2)
        w = w / np.sum(w)
        answer = np.array(
            [
                [0.01134374, 0.08381951, 0.01134374],
                [0.08381951, 0.61934703, 0.08381951],
                [0.01134374, 0.08381951, 0.01134374],
            ]
        )
        assert np.allclose(w, answer)


class TestVBSEReferenceGoldens:
    """RGB virtual BSE goldens from the reference test suite
    (/root/reference/tests/test_imaging/test_virtual_bse_imager.py:
    184-268) on the real nickel scan. The combined RGB stack is always
    min-max rescaled to the dtype range at the end (percentile range
    when given), matching reference ``imaging/vbse.py:518-522``."""

    @pytest.fixture()
    def imager(self):
        import kikuchipy_tpu as kp

        path = (
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        )
        s = kp.load(path)
        return kp.imaging.VirtualBSEImager(s)

    def test_rgb_contrast_stretching(self, imager):
        img = imager.get_rgb_image(r=(0, 0), g=(0, 1), b=(0, 2))
        assert np.isclose(np.asarray(img).mean(), 136.481481)
        img = imager.get_rgb_image(
            r=(0, 0), g=(0, 1), b=(0, 2), percentiles=(1, 99)
        )
        assert np.isclose(np.asarray(img).mean(), 134.740740)

    def test_rgb_alpha(self, imager):
        alpha = np.arange(9).reshape(3, 3)
        img = imager.get_rgb_image(r=(0, 0), g=(0, 1), b=(0, 2), alpha=alpha)
        assert np.isclose(np.asarray(img).mean(), 88.5, atol=0.1)
        alpha2 = np.arange(9).reshape(3, 3)
        alpha2[0] += 10
        img = imager.get_rgb_image(r=(0, 0), g=(0, 1), b=(0, 2), alpha=alpha2)
        assert np.isclose(np.asarray(img).mean(), 107.9, atol=0.1)

    def test_rgb_multiple_rois_per_channel(self, imager):
        img = imager.get_rgb_image(
            r=[(0, 1), (0, 2)], g=[(1, 1), (1, 2)], b=[(2, 1), (2, 2)]
        )
        assert np.isclose(np.asarray(img).mean(), 125.1, atol=0.1)
        img = imager.get_rgb_image(
            r=[(2, 1), (2, 2)], g=[(3, 1), (3, 2)], b=[(4, 1), (4, 2)]
        )
        assert np.isclose(np.asarray(img).mean(), 109.0, atol=0.1)


class TestMergeNavigationMasksReferenceScenarios:
    """The reference test suite's navigation-mask merge scenarios
    (/root/reference/tests/test_indexing/test_merge_crystal_maps.py:
    459-595), with its exact expected phase ids / scores / indices."""

    def _maps(self):
        def make(name, sg, offset, boost00):
            scores = np.arange(12, dtype=float)
            if boost00:
                scores = scores.copy()
                scores[0] = 1.0
            return CrystalMap(
                rotations=super_fibonacci(12),
                shape=(3, 4),
                prop={
                    "scores": scores,
                    "simulation_indices": np.arange(12) + offset,
                },
                phases=PhaseList(Phase(name, space_group=sg)),
            )

        return make("a", 225, 0, False), make("b", 194, 12, True)

    def test_no_masks(self):
        xmap1, xmap2 = self._maps()
        merged = merge_crystal_maps([xmap1, xmap2])
        np.testing.assert_allclose(
            merged.phase_id, [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        )
        np.testing.assert_allclose(
            np.ravel(merged.prop["scores"]),
            [1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        )
        np.testing.assert_allclose(
            np.ravel(merged.prop["simulation_indices"]),
            [12, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        )

    def test_disjoint_masks(self):
        xmap1, xmap2 = self._maps()
        nav_mask1 = np.ones((3, 4), dtype=bool)
        nav_mask1[1:, 1:] = False
        nav_mask2 = ~nav_mask1
        merged = merge_crystal_maps(
            [xmap1[~nav_mask1.ravel()], xmap2[~nav_mask2.ravel()]],
            navigation_masks=[nav_mask1, nav_mask2],
        )
        np.testing.assert_allclose(
            merged.phase_id, [1, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0]
        )
        np.testing.assert_allclose(
            np.ravel(merged.prop["simulation_indices"]),
            [12, 13, 14, 15, 16, 5, 6, 7, 20, 9, 10, 11],
        )

    def test_partial_mask_one_map_full(self):
        xmap1, xmap2 = self._maps()
        nav_mask1 = np.ones((3, 4), dtype=bool)
        nav_mask1[1:, 1:] = False
        # xmap1 only in the first row and column.
        merged = merge_crystal_maps(
            [xmap1[nav_mask1.ravel()], xmap2],
            navigation_masks=[~nav_mask1, None],
        )
        np.testing.assert_allclose(
            merged.phase_id, [1, 0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1]
        )
        # xmap1 only in the lower-right block.
        merged = merge_crystal_maps(
            [xmap1[~nav_mask1.ravel()], xmap2],
            navigation_masks=[nav_mask1, None],
        )
        np.testing.assert_allclose(
            merged.phase_id, [1, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0]
        )


class TestMergeNotIndexedReferenceScenario:
    """The reference's not-indexed merge scenario
    (/root/reference/tests/test_indexing/test_merge_crystal_maps.py:
    650-686): per-point not-indexed entries never compete; points
    not indexed in every map stay -1."""

    def test_not_indexed(self):
        from kikuchipy_tpu.geometry import quaternion as Q
        import jax.numpy as jnp

        def make(name, sg, indexed, scores, angle_deg):
            n = 12
            half = np.deg2rad(angle_deg) / 2
            rot = np.tile(
                [np.cos(half), 0.0, 0.0, np.sin(half)], (n, 1)
            )
            phase_id = np.where(indexed.ravel(), 0, -1)
            return CrystalMap(
                rotations=rot,
                phase_id=phase_id,
                shape=(4, 3),
                prop={"scores": np.asarray(scores, float).ravel()},
                phases=PhaseList(Phase(name, space_group=sg)),
            )

        idx_a = np.array([[1, 1, 0], [1, 0, 1], [0, 1, 1], [0, 1, 1]], bool)
        sc_a = [[2, 2, 0], [3, 0, 4], [0, 4, 3], [0, 2, 1]]
        idx_b = np.array([[1, 1, 0], [1, 1, 1], [0, 1, 1], [0, 1, 0]], bool)
        sc_b = [[3, 1, 0], [2, 1, 5], [0, 2, 4], [0, 1, 0]]
        xmap_a = make("a", 225, idx_a, sc_a, 30)
        xmap_b = make("b", 194, idx_b, sc_b, 60)

        merged = merge_crystal_maps(
            [xmap_a, xmap_b], simulation_indices_prop=None
        )
        np.testing.assert_allclose(
            merged.phase_id, [1, 0, -1, 0, 1, 1, -1, 0, 1, -1, 0, 0]
        )
        indexed = merged.phase_id >= 0
        angles = 2 * np.arccos(
            np.clip(np.abs(np.asarray(merged.rotations)[indexed, 0]), 0, 1)
        )
        np.testing.assert_allclose(
            np.rad2deg(angles),
            [60, 30, 30, 60, 60, 30, 60, 30, 30],
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.ravel(merged.prop["scores"])[indexed],
            [3, 2, 3, 1, 5, 4, 4, 2, 1],
        )


class TestMergeDuplicatePhaseNames:
    def _xmap(self, name, sg, boost_idx):
        scores = np.ones((6, 2))
        scores[boost_idx] += 1 + boost_idx
        return CrystalMap(
            rotations=super_fibonacci(12).reshape(6, 2, 4),
            shape=(6,),
            prop={
                "scores": scores,
                "simulation_indices": np.arange(12).reshape(6, 2),
            },
            phases=PhaseList(Phase(name, space_group=sg)),
        )

    def test_same_name_different_phase_renamed_with_warning(self):
        maps = [self._xmap("a", sg, i) for i, sg in enumerate([1, 2, 3])]
        with pytest.warns(UserWarning, match="duplicates of phase 'a'"):
            merged = merge_crystal_maps(maps)
        for name in ("a", "a1", "a2"):
            assert name in merged.phases.names

    def test_identical_phase_collapses_without_warning(self):
        import warnings

        maps = [self._xmap("a", 225, i) for i in range(2)]
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            merged = merge_crystal_maps(maps)
        assert merged.phases.names == ["a"]

    def test_mean_n_best_varying_scores(self):
        # Reference test_mean_n_best_varying_scores (:372-391).
        def make(name, sg):
            return CrystalMap(
                rotations=super_fibonacci(18).reshape(6, 3, 4),
                shape=(6,),
                prop={
                    "scores": np.ones((6, 3)),
                    "simulation_indices": np.arange(18).reshape(6, 3),
                },
                phases=PhaseList(Phase(name, space_group=sg)),
            )

        xmap1, xmap2 = make("a", 225), make("b", 194)
        xmap1.prop["scores"][0] = [1, 2, 2.1]
        xmap2.prop["scores"][0] = [1, 1.9, 3]
        xmap2.prop["scores"][1] = 2.0
        m1 = merge_crystal_maps([xmap1, xmap2], mean_n_best=2)
        m2 = merge_crystal_maps([xmap1, xmap2], mean_n_best=3)
        np.testing.assert_allclose(m1.phase_id, [0, 1, 0, 0, 0, 0])
        np.testing.assert_allclose(m2.phase_id, [1, 1, 0, 0, 0, 0])


class TestVBSEGridImageReferenceGolden:
    def test_single_tile_mean(self, dummy_patterns):
        # Reference test_get_single_image_from_grid
        # (/root/reference/tests/test_imaging/test_virtual_bse_imager
        # .py:116-120): one-tile grid over the dummy scan sums each
        # whole pattern; mean 40.666668.
        import kikuchipy_tpu as kp

        vi = kp.imaging.VirtualBSEImager(kp.signals.EBSD(dummy_patterns))
        vi.grid_shape = (1, 1)
        imgs = vi.get_images_from_grid()
        arr = np.asarray(getattr(imgs, "data", imgs))
        assert np.isclose(arr.mean(), 40.666668)
