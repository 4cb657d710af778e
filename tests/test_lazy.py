"""Lazy/eager parity matrix.

The reference runs most signal tests for both ``EBSD`` and ``LazyEBSD``
(SURVEY.md §4: "Lazy-vs-eager is the main backend matrix"). Here the
analogous guarantee: every chainable preprocessing op gives IDENTICAL
results through :class:`kikuchipy_tpu.signals.lazy.LazyEBSD`'s
chunk-at-a-time execution as through the eager batched path — including
chunk sizes that split the scan mid-row and the halo-aware neighbor
averaging. Plus streamed DI/refinement/save parity and memmap-lazy
binary readers.
"""

import dataclasses

import numpy as np
import pytest

import kikuchipy_tpu as kp
from kikuchipy_tpu.signals.ebsd import EBSD
from kikuchipy_tpu.signals.lazy import ArraySource, H5Source, LazyEBSD


@pytest.fixture()
def scan():
    rng = np.random.default_rng(7)
    data = rng.integers(10, 250, size=(6, 5, 12, 14), dtype=np.uint8)
    bg = rng.integers(20, 200, size=(12, 14), dtype=np.uint8)
    return EBSD(data=data, static_background=bg)


def _lazy(scan, chunk_size):
    return scan.as_lazy(chunk_size=chunk_size)


OPS = [
    ("rescale_intensity", {}),
    ("rescale_intensity", {"dtype_out": np.float32}),
    ("normalize_intensity", {}),
    ("remove_static_background", {"operation": "subtract"}),
    ("remove_static_background", {"operation": "divide"}),
    ("remove_dynamic_background", {"operation": "subtract"}),
    ("remove_dynamic_background", {"filter_domain": "spatial"}),
    ("get_dynamic_background", {}),
    ("adaptive_histogram_equalization", {"kernel_size": (6, 7)}),
    ("downsample", {"factor": 2}),
    ("rebin", {"scale": (1, 1, 2, 2)}),
    ("average_neighbour_patterns", {}),
]


class TestLazyEagerParity:
    @pytest.mark.parametrize("op,kwargs", OPS, ids=lambda p: str(p)[:40])
    @pytest.mark.parametrize("chunk_size", [7, 30])
    def test_single_op(self, scan, op, kwargs, chunk_size):
        eager = getattr(scan, op)(**kwargs)
        lazy = getattr(_lazy(scan, chunk_size), op)(**kwargs).compute()
        np.testing.assert_array_equal(
            np.asarray(eager.data), np.asarray(lazy.data)
        )
        assert eager.signal_shape == lazy.signal_shape

    @pytest.mark.parametrize("chunk_size", [7, 1024])
    def test_chained_pipeline(self, scan, chunk_size):
        eager = (
            scan.remove_static_background()
            .remove_dynamic_background()
            .average_neighbour_patterns()
            .rescale_intensity()
        )
        lazy = (
            _lazy(scan, chunk_size)
            .remove_static_background()
            .remove_dynamic_background()
            .average_neighbour_patterns()
            .rescale_intensity()
            .compute()
        )
        np.testing.assert_array_equal(
            np.asarray(eager.data), np.asarray(lazy.data)
        )

    def test_ops_after_nav_op(self, scan):
        eager = scan.average_neighbour_patterns().downsample(2)
        lazy = (
            _lazy(scan, 10).average_neighbour_patterns().downsample(2).compute()
        )
        np.testing.assert_array_equal(
            np.asarray(eager.data), np.asarray(lazy.data)
        )

    def test_downsample_updates_probe_attributes(self, scan):
        lazy = _lazy(scan, 8).downsample(2)
        assert lazy.signal_shape == (6, 7)
        eager = lazy.compute()
        assert eager.detector.shape == (6, 7)
        assert eager.detector.binning == 2
        assert eager.static_background.shape == (6, 7)

    def test_lazy_is_deferred(self, scan):
        calls = []
        src = ArraySource(np.asarray(scan.data), scan.navigation_shape)
        orig_read = src.read
        src.read = lambda a, b: calls.append((a, b)) or orig_read(a, b)
        lazy = LazyEBSD(
            source=src, static_background=scan.static_background
        ).remove_static_background()
        assert calls == []  # nothing read until compute/probe
        lazy.compute()
        assert calls  # chunks were read

    def test_as_lazy_roundtrip_no_ops(self, scan):
        out = scan.as_lazy().compute()
        np.testing.assert_array_equal(np.asarray(out.data), np.asarray(scan.data))

    def test_repr_counts_ops(self, scan):
        lazy = scan.as_lazy().rescale_intensity().normalize_intensity()
        assert "2 pending ops" in repr(lazy)


class TestLazyH5:
    def test_h5_source_and_save(self, scan, tmp_path):
        path = tmp_path / "scan.h5"
        scan.save(str(path))
        lazy = kp.load(str(path), lazy=True)
        assert isinstance(lazy, LazyEBSD)
        assert lazy.navigation_shape == (6, 5)
        processed = lazy.remove_static_background()
        out_path = tmp_path / "processed.h5"
        processed.save(str(out_path))
        back = kp.load(str(out_path))
        eager = kp.load(str(path)).remove_static_background()
        np.testing.assert_array_equal(
            np.asarray(back.data), np.asarray(eager.data)
        )

    def test_h5_source_chunk_reads(self, scan, tmp_path):
        path = tmp_path / "scan.h5"
        scan.save(str(path))
        src = H5Source(path, "Scan 1/EBSD/Data/patterns", nav_shape=(6, 5))
        flat = np.asarray(scan.data).reshape(-1, 12, 14)
        np.testing.assert_array_equal(src.read(3, 11), flat[3:11])
        np.testing.assert_array_equal(src.read(0, 30), flat)


@pytest.mark.slow
class TestLazyIndexingRefinement:
    @pytest.fixture()
    def nickel(self):
        import kikuchipy_tpu.data as data

        s = data.nickel_ebsd_small()
        s = s.remove_static_background().remove_dynamic_background()
        mp = data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        return s, mp

    def test_streamed_di_matches_eager(self, nickel):
        from kikuchipy_tpu.crystallography.sampling import (
            sample_fundamental_zone,
        )

        s, mp = nickel
        rot = np.asarray(sample_fundamental_zone(8.0, "m-3m"))
        det = dataclasses.replace(s.detector, pc=s.detector.pc_average)
        dictionary = mp.get_patterns(rot, det, energy=20, compute=True)
        eager_xmap = s.dictionary_indexing(dictionary, keep_n=5)
        lazy_xmap = s.as_lazy(chunk_size=4).dictionary_indexing(
            dictionary, keep_n=5
        )
        np.testing.assert_array_equal(
            eager_xmap.prop["simulation_indices"],
            lazy_xmap.prop["simulation_indices"],
        )
        np.testing.assert_allclose(
            eager_xmap.prop["scores"], lazy_xmap.prop["scores"], atol=1e-6
        )

    def test_streamed_refinement_matches_eager(self, nickel):
        s, mp = nickel
        lazy = s.as_lazy(chunk_size=4)
        lazy = dataclasses.replace(lazy, xmap=s.xmap)
        res_lazy = lazy.refine_orientation(
            master_pattern=mp, energy=20, max_iters=20
        )
        res_eager = s.refine_orientation(
            master_pattern=mp, energy=20, max_iters=20
        )
        np.testing.assert_allclose(
            np.asarray(res_lazy.xmap.best_rotations),
            np.asarray(res_eager.xmap.best_rotations),
            atol=1e-5,
        )


class TestMemmapReaders:
    def test_nordif_lazy_memmap(self, tmp_path):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 255, size=(2, 3, 4, 5), dtype=np.uint8)
        raw = tmp_path / "Pattern.dat"
        data.tofile(raw)
        # A NORDIF folder carries the acquisition background; provide
        # one so the reader loads warning-free.
        from PIL import Image

        Image.fromarray(
            np.full((4, 5), 7, np.uint8), mode="L"
        ).save(tmp_path / "Background acquisition pattern.bmp")
        lazy = kp.load(
            str(raw), scan_size=(3, 2), pattern_size=(5, 4), lazy=True
        )
        assert isinstance(lazy, LazyEBSD)
        assert isinstance(lazy.source._array.base, np.memmap) or isinstance(
            lazy.source._array, np.memmap
        )
        out = lazy.compute()
        np.testing.assert_array_equal(np.asarray(out.data), data)

    def test_edax_lazy_memmap(self, tmp_path):
        # Version-1 up1: header (version, sx, sy, offset) then patterns.
        rng = np.random.default_rng(4)
        sx, sy, n = 6, 4, 5
        pats = rng.integers(0, 255, size=(n, sy, sx), dtype=np.uint8)
        path = tmp_path / "scan.up1"
        with open(path, "wb") as f:
            np.array([1, sx, sy, 16], dtype=np.uint32).tofile(f)
            pats.tofile(f)
        lazy = kp.load(str(path), lazy=True)
        assert isinstance(lazy, LazyEBSD)
        out = lazy.compute()
        np.testing.assert_array_equal(
            np.asarray(out.data).reshape(n, sy, sx), pats
        )

    def test_fallback_materializes_with_cache(self, scan):
        lazy = scan.as_lazy().rescale_intensity()
        # get_image_quality is not chainable -> materialize-and-delegate.
        iq = lazy.get_image_quality()
        assert iq.shape == (30,) or iq.shape == (6, 5)
        assert lazy._computed is not None  # cached materialization
