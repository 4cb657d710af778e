"""Tests for as_lambert re-projection, Window.plot, set_log_level,
.ang export, and PCA decomposition."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, Phase, PhaseList
from kikuchipy_tpu.crystallography.sampling import super_fibonacci
from kikuchipy_tpu.filters.window import Window
from kikuchipy_tpu.io.plugins.ang import file_writer as write_ang


class TestAsLambert:
    def test_reprojection_consistency(self):
        """Re-projecting the real stereographic master to Lambert must
        closely match the shipped Lambert master (away from the grid
        edge, where the stereographic rim is sparsely sampled)."""
        sp = kp.data.nickel_ebsd_master_pattern_small(
            projection="stereographic", hemisphere="both"
        )
        lam_true = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        lam = sp.as_lambert()
        assert lam.projection == "lambert"
        a = np.asarray(lam.data[0], dtype=float)
        b = np.asarray(lam_true.data[0], dtype=float)
        # Compare the central region; normalize both.
        sl = slice(80, 321)
        a_c, b_c = a[sl, sl], b[sl, sl]
        a_c = (a_c - a_c.mean()) / a_c.std()
        b_c = (b_c - b_c.mean()) / b_c.std()
        ncc = (a_c * b_c).mean()
        assert ncc > 0.95, ncc

    def test_lambert_identity(self):
        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        assert mp.as_lambert() is mp

    def test_plot(self):
        mp = kp.data.nickel_ebsd_master_pattern_small()
        ax = mp.plot()
        assert ax is not None


class TestWindowPlot:
    def test_plot(self):
        w = Window("gaussian", std=1, shape=(5, 5))
        fig = w.plot(return_figure=True)
        assert fig is not None


class TestLogging:
    def test_set_log_level(self):
        import logging

        kp.set_log_level("DEBUG")
        assert logging.getLogger("kikuchipy_tpu").level == logging.DEBUG
        kp.set_log_level("WARNING")


class TestAngWriter:
    def test_write(self, tmp_path):
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"scores": np.linspace(0.2, 0.9, 9)},
            phases=PhaseList(
                Phase("ni", space_group=225, lattice=(3.52,) * 3 + (90.0,) * 3)
            ),
        )
        f = tmp_path / "map.ang"
        write_ang(f, xmap, step_sizes=(1.5, 1.5))
        text = f.read_text()
        assert "# GRID: SqrGrid" in text
        assert "MaterialName" in text
        data_lines = [l for l in text.splitlines() if not l.startswith("#")]
        assert len(data_lines) == 9
        row = data_lines[0].split()
        assert len(row) == 10


class TestDecomposition:
    def test_pca_reconstruct_denoises(self):
        from kikuchipy_tpu.ops.decomposition import pca, pca_reconstruct

        rng = np.random.default_rng(0)
        # Rank-2 signal + noise
        basis = rng.normal(size=(2, 64))
        weights = rng.normal(size=(50, 2))
        clean = weights @ basis
        noisy = clean + rng.normal(scale=0.05, size=clean.shape)
        recon = pca_reconstruct(noisy.reshape(50, 8, 8), 2)
        err_recon = np.abs(recon.reshape(50, 64) - clean).mean()
        err_noisy = np.abs(noisy - clean).mean()
        assert err_recon < err_noisy

        factors, loadings, mean = pca(noisy.reshape(50, 8, 8), 2)
        assert factors.shape == (2, 64)
        assert loadings.shape == (50, 2)

    def test_signal_method(self, dummy_patterns):
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        model = s.get_decomposition_model(components=3)
        assert np.asarray(model.data).shape == dummy_patterns.shape
        assert np.asarray(model.data).dtype == np.uint8

    def test_model_write_matches_in_memory(self, dummy_patterns, tmp_path):
        import kikuchipy_tpu as kp
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        model = s.get_decomposition_model(components=3)
        out = tmp_path / "model.h5"
        s.get_decomposition_model_write(out, components=3, chunk_size=4)
        written = kp.load(out)
        np.testing.assert_array_equal(
            np.asarray(written.data).reshape(-1, 3, 3),
            np.asarray(model.data).reshape(-1, 3, 3),
        )

    def test_lazy_shims(self, dummy_patterns):
        from kikuchipy_tpu.signals.ebsd import EBSD
        from kikuchipy_tpu.signals.lazy import LazyEBSD

        s = EBSD(data=dummy_patterns)
        # as_lazy returns a REAL out-of-core signal since round 4
        # (tests/test_lazy.py has the parity matrix); eager compute()
        # remains an identity shim.
        assert isinstance(s.as_lazy(), LazyEBSD)
        assert s.compute() is s


class TestProfiling:
    def test_stage_timer(self):
        import time as _time

        from kikuchipy_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("a", items=100):
            _time.sleep(0.01)
        with t.stage("a", items=100):
            pass
        with t.stage("b"):
            pass
        rep = t.report()
        assert rep["a"]["items"] == 200
        assert rep["a"]["seconds"] >= 0.01
        assert "a:" in repr(t)


class TestGridIndices:
    """Reference goldens from signals/util/array_tools.py docstrings and
    tests/test_signals/test_ebsd.py:2896-2903."""

    def test_2d_docstring_golden(self):
        from kikuchipy_tpu.utils.grid import grid_indices

        idx = grid_indices((4, 5), (55, 75))
        assert np.array_equal(idx[0][:, 0], [11, 22, 33, 44])
        assert np.array_equal(idx[1][0], [12, 25, 38, 51, 64])

    def test_1d_docstring_golden(self):
        from kikuchipy_tpu.utils.grid import grid_indices

        idx, spacing = grid_indices(10, 105, return_spacing=True)
        assert np.array_equal(idx[0], np.arange(8, 99, 10))
        assert np.array_equal(spacing, [10])

    def test_extract_grid_golden(self):
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=np.zeros((55, 75, 2, 2), dtype=np.uint8))
        _, idx = s.extract_grid((2, 3), return_indices=True)
        assert np.array_equal(
            idx,
            np.array([[[14, 14], [28, 28], [42, 42]],
                      [[25, 50], [25, 50], [25, 50]]]),
        )

    def test_incompatible_raises(self):
        from kikuchipy_tpu.utils.grid import grid_indices

        with pytest.raises(ValueError, match="must be compatible"):
            grid_indices((10, 10), (5, 75))


class TestIndexingCompatShims:
    def test_metric_factories(self):
        from kikuchipy_tpu.indexing import (
            NormalizedCrossCorrelationMetric,
            NormalizedDotProductMetric,
        )

        assert NormalizedCrossCorrelationMetric().name == "ncc"
        assert NormalizedDotProductMetric().centered is False

    def test_xmap_from_hough_indexing_data(self):
        from kikuchipy_tpu.crystallography.crystal_map import Phase, PhaseList
        from kikuchipy_tpu.indexing import xmap_from_hough_indexing_data

        n = 6
        dt = np.dtype([
            ("quat", "f8", (4,)), ("phase", "i8"), ("fit", "f8"),
            ("cm", "f8"), ("pq", "f8"), ("nmatch", "i8"),
        ])
        data = np.zeros((2, n), dtype=dt)
        data[-1]["quat"][:, 0] = 1.0
        data[-1]["phase"] = 0
        data[-1]["fit"] = 0.4
        xmap = xmap_from_hough_indexing_data(
            data, PhaseList(Phase("ni", 225)), navigation_shape=(2, 3),
            step_sizes=(1.5, 2.0),
        )
        assert xmap.shape == (2, 3)
        assert xmap.prop["fit"].shape == (n,)
        assert xmap.x[1] == 2.0 and xmap.y[3] == 1.5

    def test_compute_refine_unwrappers(self):
        from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
        from kikuchipy_tpu.indexing import (
            compute_refine_orientation_projection_center_results,
            compute_refine_orientation_results,
            compute_refine_projection_center_results,
        )
        from kikuchipy_tpu.indexing.refinement import RefinementResult

        xmap = CrystalMap(
            rotations=np.tile([1.0, 0, 0, 0], (4, 1)),
            prop={"scores": np.ones(4), "num_evals": np.full(4, 7)},
        )
        res = RefinementResult(xmap=xmap, detector="DET")
        assert compute_refine_orientation_results(res) is xmap
        scores, det, evals = compute_refine_projection_center_results(res)
        assert det == "DET" and scores.shape == (4,) and evals[0] == 7
        x2, d2 = compute_refine_orientation_projection_center_results(res)
        assert x2 is xmap and d2 == "DET"


class TestDataAccessors:
    def test_download_backed_raise_without_cache(self):
        import kikuchipy_tpu.data as d

        for fn in (d.ni_gain, d.si_wafer, d.si_ebsd_moving_screen):
            with pytest.raises(FileNotFoundError, match="KP_TPU_DATA_DIR"):
                fn()
        with pytest.raises(FileNotFoundError, match="KP_TPU_DATA_DIR"):
            d.ebsd_master_pattern("al")

    def test_validation(self):
        import kikuchipy_tpu.data as d

        with pytest.raises(ValueError, match=r"\[1, 10\]"):
            d.ni_gain(0)
        with pytest.raises(ValueError, match="distance"):
            d.si_ebsd_moving_screen(3)
        with pytest.raises(ValueError, match="phase"):
            d.ebsd_master_pattern("unobtainium")

    def test_clear_cache_never_touches_reference(self, monkeypatch, tmp_path):
        import kikuchipy_tpu.data as d

        cache = tmp_path / "cache"
        cache.mkdir()
        (cache / "x.h5").write_bytes(b"abc")
        monkeypatch.setenv("KP_TPU_DATA_DIR", str(cache))
        d.clear_cache()
        assert not cache.exists()


class TestReferenceShims:
    def test_calibration_line_properties(self):
        from kikuchipy_tpu.detectors.calibration import (
            PCCalibrationMovingScreen,
        )

        c = PCCalibrationMovingScreen(
            pattern_in=np.zeros((10, 10)),
            pattern_out=np.zeros((10, 10)),
            points_in=[(1, 1), (2, 7), (8, 4)],
            points_out=[(2, 2), (3, 8), (9, 5)],
        )
        assert c.lines_start.shape == (2, c.n_lines, 2)
        assert c.lines_end.shape == (2, c.n_lines, 2)
        np.testing.assert_array_equal(
            np.hstack([c.lines_start[0], c.lines_end[0]]), c.lines[0]
        )
        assert c.lines_out_in_start.shape == (c.n_points, 2)
        np.testing.assert_array_equal(c.lines_out_in_start, c.points[1])
        np.testing.assert_array_equal(c.lines_out_in_end, c.points[0])
        old = c.lines.copy()
        c.make_lines()
        np.testing.assert_array_equal(c.lines, old)

    def test_get_indexer_wiring(self, monkeypatch):
        from kikuchipy_tpu.geometry.detector import EBSDDetector
        from kikuchipy_tpu.indexing import hough as hough_mod
        from kikuchipy_tpu.signals.ebsd import EBSD

        det = EBSDDetector(shape=(8, 8), pc=(0.5, 0.3, 0.5))
        indexer = det.get_indexer(phase_list="fake-phase", n_bands=7)
        assert indexer.detector is det
        assert indexer.kwargs == {"n_bands": 7}

        calls = {}

        def fake(signal, phase_list=None, reflectors=None, **kw):
            calls["phase_list"] = phase_list
            calls["kw"] = kw
            calls["detector"] = signal.detector
            return "xmap"

        monkeypatch.setattr(hough_mod, "hough_indexing", fake)
        s = EBSD(data=np.zeros((2, 8, 8), np.uint8))
        out = s.hough_indexing(indexer=indexer, n_theta=45)
        assert out == "xmap"
        assert calls["phase_list"] == "fake-phase"
        assert calls["kw"] == {"n_bands": 7, "n_theta": 45}
        assert calls["detector"] is det

    def test_master_pattern_shims(self):
        from kikuchipy_tpu.signals.master_pattern import (
            EBSDMasterPattern,
            ECPMasterPattern,
        )

        mp = EBSDMasterPattern(data=np.zeros((2, 11, 11), np.uint8))
        assert mp.as_lazy() is mp
        assert mp.compute() is mp
        ecp = mp.set_signal_type("ECPMasterPattern")
        assert isinstance(ecp, ECPMasterPattern)
        assert ecp.hemisphere == mp.hemisphere
        ebsd = mp.set_signal_type("EBSD")
        assert ebsd.data.shape == (2, 11, 11)
        with pytest.raises(ValueError, match="Unknown signal type"):
            mp.set_signal_type("nonsense")

    def test_vbse_shims(self):
        from kikuchipy_tpu.signals.virtual_bse_image import VirtualBSEImage

        v = VirtualBSEImage(data=np.arange(9.0).reshape(3, 3))
        assert v.as_lazy() is v and v.compute() is v
        v8 = v.change_dtype(np.uint8)
        assert np.asarray(v8.data).dtype == np.uint8
        assert v.deepcopy() is not v

    def test_simulation_as_markers(self):
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib.collections import LineCollection

        from kikuchipy_tpu.crystallography.reciprocal import (
            Lattice,
            ReciprocalLatticeVectors,
        )
        from kikuchipy_tpu.crystallography.crystal_map import Phase
        from kikuchipy_tpu.geometry.detector import EBSDDetector
        from kikuchipy_tpu.simulation.kikuchi_pattern_simulator import (
            KikuchiPatternSimulator,
        )
        from kikuchipy_tpu.geometry.quaternion import from_euler

        phase = Phase(
            name="ni", space_group=225, lattice=Lattice(3.52, 3.52, 3.52)
        )
        ref = ReciprocalLatticeVectors.from_min_dspacing(phase, 1.2)
        sim = KikuchiPatternSimulator(ref)
        det = EBSDDetector(shape=(60, 60), pc=(0.42, 0.21, 0.5), sample_tilt=70)
        rot = np.asarray(from_euler(np.deg2rad([[10, 20, 30], [40, 50, 60]])))
        geo = sim.on_detector(det, rot)
        assert geo.phase is not None
        # Reference defaults: lines only.
        markers = geo.as_markers()
        assert len(markers) == 2
        assert [len(per_point) for per_point in markers] == [1, 1]
        assert isinstance(markers[0][0], LineCollection)
        markers = geo.as_markers(zone_axes=True, pc=True)
        assert isinstance(markers[0][0], LineCollection)
        assert "x" in markers[0][1]
        assert markers[0][2]["marker"] == "*"


class TestDecompositionModelOptions:
    """Reference kwargs on get_decomposition_model (ref ebsd.py:2665)."""

    def test_components_list_and_none(self, dummy_patterns):
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        m_all = s.get_decomposition_model(components=None)
        # All components reconstruct the (float32-cast) data up to SVD
        # round-off; after rescale to uint8 that is the original
        # pattern to within one gray level at rounding boundaries.
        a = np.asarray(m_all.data).astype(int)
        b = np.asarray(s.rescale_intensity(dtype_out=np.uint8).data).astype(int)
        assert np.abs(a - b).max() <= 1
        m_list = s.get_decomposition_model(components=[0, 2])
        m_int = s.get_decomposition_model(components=3)
        assert np.asarray(m_list.data).shape == dummy_patterns.shape
        assert not np.array_equal(
            np.asarray(m_list.data), np.asarray(m_int.data)
        )

    def test_dtype_out(self, dummy_patterns):
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        m = s.get_decomposition_model(components=2, dtype_out="float32")
        assert np.asarray(m.data).dtype == np.float32


class TestOptimizePCMethodArg:
    def test_unknown_method_raises(self, dummy_patterns):
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        with pytest.raises(ValueError, match="must be one of"):
            s.hough_indexing_optimize_pc(method="simplex")

    def test_batch_requires_phase(self, dummy_patterns):
        # batch=True is implemented (per-pattern PCs, see
        # tests/test_hough.py::TestBatchedPCOptimization); without a
        # phase there are no reflectors to fit bands against.
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        with pytest.raises(ValueError, match="lattice|phase"):
            s.hough_indexing_optimize_pc(batch=True)


class TestDecompositionMethod:
    def test_decomposition_stores_learning_results(self, dummy_patterns):
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=dummy_patterns)
        s.decomposition(output_dimension=3)
        lr = s.learning_results
        assert lr.factors.shape == (3, 9)
        assert lr.loadings.shape == (9, 3)
        # Reconstruction from the stored results matches the model op.
        recon = lr.loadings @ lr.factors + lr.mean
        model = s.get_decomposition_model(components=3, dtype_out="float32")
        np.testing.assert_allclose(
            recon.reshape(np.asarray(model.data).shape),
            np.asarray(model.data),
            atol=1e-4,
        )
        with pytest.raises(ValueError, match="SVD"):
            s.decomposition(algorithm="NMF")
