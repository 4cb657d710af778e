"""Draw module smoke tests (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import kikuchipy_tpu as kp

from kikuchipy_tpu.draw import (
    get_line_segment_list,
    get_point_list,
    get_rgb_navigator,
    plot_detector,
    plot_detector_sample_geometry,
)
from kikuchipy_tpu.geometry.detector import EBSDDetector


class TestDetectorPlot:
    def test_plot_detector_pixel(self):
        det = EBSDDetector(shape=(60, 60), pc=(0.4, 0.3, 0.5))
        fig = plot_detector(
            det, pattern=np.zeros((60, 60)), draw_gnomonic_circles=True,
            return_figure=True,
        )
        assert fig is not None

    def test_plot_detector_gnomonic(self):
        det = EBSDDetector(shape=(60, 60), pc=(0.4, 0.3, 0.5))
        ax = plot_detector(det, coordinates="gnomonic")
        assert ax is not None

    @pytest.mark.parametrize("mode", ["side", "top"])
    def test_geometry_views(self, mode):
        det = EBSDDetector(shape=(60, 60), sample_tilt=70, tilt=8)
        fig = plot_detector_sample_geometry(det, mode=mode, return_figure=True)
        assert fig is not None

    def test_geometry_bad_mode(self):
        det = EBSDDetector()
        with pytest.raises(ValueError, match="mode"):
            plot_detector_sample_geometry(det, mode="oblique")


class TestMarkers:
    def test_line_segments(self):
        lines = np.array([[0, 0, 1, 1], [np.nan] * 4, [1, 0, 0, 1]])
        lc = get_line_segment_list(lines)
        assert len(lc.get_segments()) == 2

    def test_points(self):
        pts = np.array([[0, 0], [np.nan, 1], [2, 3]])
        kw = get_point_list(pts)
        assert len(kw["x"]) == 2


class TestNavigator:
    def test_rgb_navigator(self):
        rgb = np.random.default_rng(0).uniform(size=(4, 5, 3))
        nav = get_rgb_navigator(rgb)
        assert nav.dtype == np.uint8
        assert nav.max() == 255 and nav.min() == 0


class TestPlotPatternPositions:
    def test_roi_only(self):
        import matplotlib

        matplotlib.use("Agg")
        from kikuchipy_tpu.draw import plot_pattern_positions_in_map

        fig = plot_pattern_positions_in_map(
            np.array([[5, 5], [20, 30]]), roi_shape=(55, 75),
            return_figure=True,
        )
        assert fig is not None

    def test_roi_in_area_with_images(self):
        import matplotlib

        matplotlib.use("Agg")
        from kikuchipy_tpu.draw import plot_pattern_positions_in_map

        rng = np.random.default_rng(0)
        fig = plot_pattern_positions_in_map(
            np.array([[30, 40]]), roi_shape=(55, 75), roi_origin=(10, 20),
            area_shape=(100, 120), area_image=rng.random((100, 120)),
            return_figure=True,
        )
        assert fig is not None

    def test_bad_shape_raises(self):
        from kikuchipy_tpu.draw import plot_pattern_positions_in_map

        with pytest.raises(ValueError, match=r"\(n, 2\)"):
            plot_pattern_positions_in_map(np.ones((3, 3)), (5, 5))


class TestSpherePlot:
    """Master-pattern sphere rendering (reference plot_spherical is
    pyvista; ours is matplotlib 3D, usable headless)."""

    def test_sample_sphere_continuity_at_equator(self):
        from kikuchipy_tpu.draw.sphere import sample_sphere

        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="stereographic", hemisphere="both"
        )
        hemis = mp._hemispheres_at_energy()
        x, y, z, vals = sample_sphere(hemis[0], hemis[1], 91, 181)
        assert vals.shape == (91, 181)
        # Upper and lower samples must agree along the equator (both
        # hemispheres share the boundary circle).
        eq = np.argmin(np.abs(z[:, 0]))
        upper_row = vals[eq - 1]
        lower_row = vals[eq + 1]
        # Intensities are uint8-scaled; neighbouring rings are close.
        assert np.abs(upper_row.astype(float) - lower_row.astype(float)).mean() < 12

    def test_plot_spherical_smoke(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="stereographic", hemisphere="both"
        )
        fig = mp.plot_spherical(return_figure=True, n_polar=31, n_azimuth=61)
        assert fig is not None
        plt.close(fig)
        fig = mp.plot_spherical(
            return_figure=True, style="points", n_polar=31, n_azimuth=61
        )
        plt.close(fig)

    def test_plot_spherical_requires_stereographic_both(self):
        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        with pytest.raises(ValueError, match="stereographic"):
            mp.plot_spherical()
        mp2 = kp.data.nickel_ebsd_master_pattern_small(
            projection="stereographic", hemisphere="upper"
        )
        with pytest.raises(ValueError, match="hemispheres"):
            mp2.plot_spherical()


class TestParityPlotUpgrades:
    """Round-1 late additions: reference kwargs on plotting methods."""

    def test_window_plot_options(self):
        from kikuchipy_tpu.filters import Window

        w = Window("gaussian", shape=(5, 5), std=1.0)
        fig = w.plot(
            grid=True, show_values=False, cmap="magma",
            cmap_label="Coefficient", colorbar=True, return_figure=True,
        )
        plt.close(fig)
        ax = w.plot(colorbar=False, show_values=True)
        plt.close(ax.figure)

    def test_vbse_plot_grid_visible_indices(self, dummy_patterns):
        import kikuchipy_tpu as kp
        from kikuchipy_tpu.imaging import VirtualBSEImager

        imager = VirtualBSEImager(kp.signals.EBSD(dummy_patterns))
        imager.grid_shape = (3, 3)
        fig = imager.plot_grid(visible_indices=True, return_figure=True)
        texts = [t for ax in fig.axes for t in ax.texts]
        assert len(texts) == 9
        plt.close(fig)
        fig = imager.plot_grid(visible_indices=False, return_figure=True)
        assert not [t for ax in fig.axes for t in ax.texts]
        plt.close(fig)

    def test_simulator_plot_stereographic_and_spherical(self):
        from kikuchipy_tpu.crystallography.reciprocal import (
            Lattice,
            ReciprocalLatticeVectors,
        )
        from kikuchipy_tpu.simulations import KikuchiPatternSimulator

        lat = Lattice(3.52, 3.52, 3.52, 90, 90, 90)
        ref = ReciprocalLatticeVectors.from_min_dspacing(lat, 1.0)
        ref.calculate_structure_factor([("Ni", 0, 0, 0)], space_group=225)
        ref = ref.allowed()
        ref.calculate_theta(20.0)
        sim = KikuchiPatternSimulator(ref)

        fig = sim.plot(return_figure=True)
        assert len(fig.axes) >= 1
        plt.close(fig)
        fig = sim.plot(hemisphere="both", mode="bands", return_figure=True)
        assert len(fig.axes) == 2
        plt.close(fig)
        fig = sim.plot(projection="spherical", scaling=None, return_figure=True)
        plt.close(fig)
        with pytest.raises(ValueError, match="mode"):
            sim.plot(mode="dots")
        with pytest.raises(ImportError, match="pyvista"):
            sim.plot(projection="spherical", backend="pyvista")
        with pytest.raises(ValueError, match="hemisphere"):
            sim.plot(hemisphere="north")

    def test_calibration_plot_kwargs(self):
        from kikuchipy_tpu.detectors import PCCalibrationMovingScreen

        rng = np.random.default_rng(0)
        p_in = rng.random((60, 60)).astype(np.float32)
        p_out = rng.random((60, 60)).astype(np.float32)
        cal = PCCalibrationMovingScreen(
            pattern_in=p_in,
            pattern_out=p_out,
            points_in=[(10, 10), (50, 10), (30, 50)],
            points_out=[(5, 5), (55, 5), (30, 57)],
            delta_z=1.0,
            px_size=1.0,
        )
        fig = cal.plot(
            pattern_kwargs={"cmap": "magma"},
            line_kwargs={"color": "c"},
            scatter_kwargs={"c": "b"},
            pc_kwargs={"c": "g"},
            return_figure=True,
        )
        plt.close(fig)


class TestPlotDetectorReferenceKwargs:
    def test_all_reference_kwargs(self):
        det = EBSDDetector(shape=(60, 60), pc=(0.42, 0.22, 0.5))
        fig = plot_detector(
            det,
            pattern=np.zeros((60, 60)),
            pattern_kwargs={"cmap": "magma"},
            show_pc=True,
            pc_kwargs={"c": "r"},
            draw_gnomonic_circles=True,
            gnomonic_angles=[10, 30],
            gnomonic_circles_kwargs={"color": "w"},
            zoom=1.5,
            return_figure=True,
        )
        ax = fig.axes[0]
        x0, x1 = ax.get_xlim()
        assert x1 - x0 > 60  # zoomed out beyond the detector
        plt.close(fig)


class TestInteractivePlotter:
    """matplotlib.widgets.Slider interactive detector explorer
    (reference _ebsd_detector_plotter.py:226-410 ipywidgets UI)."""

    def test_sliders_drive_detector_and_pattern(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        import kikuchipy_tpu as kp
        from kikuchipy_tpu.draw import plot_detector_interactive
        from kikuchipy_tpu.geometry import quaternion as quat

        import jax.numpy as jnp

        det = kp.detectors.EBSDDetector(
            shape=(60, 60), pc=(0.42, 0.21, 0.5), sample_tilt=70
        )
        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        rot = np.asarray(
            quat.from_euler(jnp.asarray([[0.5, 0.4, 0.3]]))
        )[0]
        fig, sliders = plot_detector_interactive(
            det, rotation=rot, master_pattern=mp
        )
        assert set(sliders) == {
            "sample_tilt", "detector_tilt", "azimuthal", "pcx", "pcy", "pcz"
        }
        ax_det = fig.axes[2]
        img0 = ax_det.images[0].get_array().copy()

        sliders["pcz"].set_val(0.7)
        # The internal detector follows the sliders...
        img1 = fig.axes[2].images[0].get_array()
        assert not np.array_equal(img0, img1)  # ...and the overlay re-simulated
        plt.close(fig)

    def test_interactive_without_master_pattern(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        import kikuchipy_tpu as kp
        from kikuchipy_tpu.draw import EBSDDetectorPlotter

        det = kp.detectors.EBSDDetector(
            shape=(10, 10), pc=(0.5, 0.5, 0.5), sample_tilt=70
        )
        plotter = EBSDDetectorPlotter(det)
        fig, sliders = plotter.interactive()
        sliders["sample_tilt"].set_val(65.0)
        assert float(plotter.detector.sample_tilt) == pytest.approx(65.0)
        plt.close(fig)
