"""PC calibration and fitting tests."""

import numpy as np
import pytest

from kikuchipy_tpu.detectors.calibration import (
    PCCalibrationMovingScreen,
    estimate_xtilt,
    extrapolate_pc,
    fit_pc_affine,
    fit_pc_plane,
    fit_pc_projective,
)
from kikuchipy_tpu.geometry.detector import EBSDDetector


def _synthetic_moving_screen(pc=(0.4, 0.3, 0.5), delta_z=2.0, px_size=0.05):
    """Synthesize feature points for two camera positions given a true
    PC: moving the screen out by delta_z magnifies the pattern about
    (PCx, PCy) by (z + dz) / z."""
    nrows = ncols = 100
    pxy = np.array([pc[0] * ncols, (1 - pc[1]) * nrows])  # tsl convention
    z_px = pc[2] * nrows  # in px units with px_size = 1
    z_um = z_px * px_size
    mag = (z_um + delta_z) / z_um
    rng = np.random.default_rng(0)
    pts_in = rng.uniform(20, 80, size=(5, 2))
    pts_out = pxy + (pts_in - pxy) * mag
    return (
        np.zeros((nrows, ncols)),
        np.zeros((nrows, ncols)),
        pts_in,
        pts_out,
        delta_z,
        px_size,
    )


class TestMovingScreen:
    def test_recovers_true_pc(self):
        p_in, p_out, pts_in, pts_out, dz, px = _synthetic_moving_screen()
        cal = PCCalibrationMovingScreen(
            p_in, p_out, pts_in, pts_out, delta_z=dz, px_size=px
        )
        np.testing.assert_allclose(cal.pc, [0.4, 0.3, 0.5], atol=1e-6)
        assert cal.n_lines == 10
        assert cal.n_points == 5

    def test_convention_bruker(self):
        p_in, p_out, pts_in, pts_out, dz, px = _synthetic_moving_screen()
        cal = PCCalibrationMovingScreen(
            p_in, p_out, pts_in, pts_out, delta_z=dz, px_size=px,
            convention="bruker",
        )
        np.testing.assert_allclose(cal.pc[1], 0.7, atol=1e-6)

    def test_to_detector(self):
        p_in, p_out, pts_in, pts_out, dz, px = _synthetic_moving_screen()
        cal = PCCalibrationMovingScreen(
            p_in, p_out, pts_in, pts_out, delta_z=dz, px_size=px
        )
        det = cal.to_detector()
        assert det.shape == (100, 100)

    def test_plot(self):
        import matplotlib

        matplotlib.use("Agg")
        p_in, p_out, pts_in, pts_out, dz, px = _synthetic_moving_screen()
        cal = PCCalibrationMovingScreen(
            p_in, p_out, pts_in, pts_out, delta_z=dz, px_size=px
        )
        fig = cal.plot(return_figure=True)
        assert fig is not None


class TestPCFitting:
    def _pc_grid(self, nav_shape=(8, 10), noise=0.0):
        yy, xx = np.indices(nav_shape)
        pc = np.stack(
            [
                0.5 - 1e-3 * xx,
                0.3 + 5e-4 * yy,
                0.5 + 2e-4 * yy - 1e-4 * xx,
            ],
            axis=-1,
        )
        if noise:
            pc += np.random.default_rng(0).normal(scale=noise, size=pc.shape)
        return pc

    def test_fit_plane_exact(self):
        pc = self._pc_grid()
        fitted, coeffs = fit_pc_plane(pc, (8, 10))
        np.testing.assert_allclose(fitted, pc, atol=1e-12)
        np.testing.assert_allclose(coeffs[0, 0], -1e-3, atol=1e-12)

    def test_fit_plane_denoises(self):
        pc_true = self._pc_grid()
        pc_noisy = self._pc_grid(noise=1e-3)
        fitted, _ = fit_pc_plane(pc_noisy, (8, 10))
        err_noisy = np.abs(pc_noisy - pc_true).mean()
        err_fit = np.abs(fitted - pc_true).mean()
        assert err_fit < err_noisy

    def test_fit_affine(self):
        pc = self._pc_grid().reshape(-1, 3)
        yy, xx = np.indices((8, 10))
        xy = np.column_stack([xx.ravel(), yy.ravel()]).astype(float)
        fitted, mat = fit_pc_affine(xy, pc)
        np.testing.assert_allclose(fitted, pc, atol=1e-12)
        assert mat.shape == (3, 3)

    def test_fit_projective(self):
        pc = self._pc_grid().reshape(-1, 3)
        yy, xx = np.indices((8, 10))
        xy = np.column_stack([xx.ravel(), yy.ravel()]).astype(float)
        fitted, H = fit_pc_projective(xy, pc)
        np.testing.assert_allclose(fitted, pc, atol=1e-8)
        assert H.shape == (3, 3)

    def test_estimate_xtilt(self):
        # Construct PCs consistent with a known tilt: moving down the
        # map (pcy increasing), pcz decreases with slope -tan(xtilt).
        xtilt = np.deg2rad(10.0)
        pcy = np.linspace(0.2, 0.4, 50)
        pcz = 0.6 - np.tan(xtilt) * pcy
        pc = np.column_stack([np.full(50, 0.5), pcy, pcz])
        det = EBSDDetector(shape=(60, 60), pc=pc)
        np.testing.assert_allclose(estimate_xtilt(det), 10.0, atol=1e-8)

    def test_extrapolate_pc(self):
        # PCs measured on a coarse grid extrapolate to the full map.
        pc_full = self._pc_grid((8, 10))
        coarse_idx = np.ix_([0, 4, 7], [0, 5, 9])
        pc_coarse = pc_full[coarse_idx]
        yy, xx = np.indices((8, 10))
        beam = np.stack(
            [xx[coarse_idx].ravel() * 2.0, yy[coarse_idx].ravel() * 2.0],
            axis=-1,
        )
        det_coarse = EBSDDetector(shape=(60, 60), pc=pc_coarse.reshape(-1, 3))
        det_full = extrapolate_pc(
            det_coarse, beam, (8, 10), step_sizes=(2.0, 2.0)
        )
        np.testing.assert_allclose(det_full.pc, pc_full, atol=1e-10)


class TestXtiltZtilt:
    def test_estimate_both_tilts(self):
        from kikuchipy_tpu.detectors.calibration import estimate_xtilt_ztilt

        xt, zt = np.deg2rad(8.0), np.deg2rad(3.0)
        rng = np.random.default_rng(0)
        pcx = rng.uniform(0.4, 0.6, 100)
        pcy = rng.uniform(0.2, 0.4, 100)
        pcz = 0.7 - np.tan(zt) * pcx - np.tan(xt) * pcy
        det = EBSDDetector(
            shape=(60, 60), pc=np.column_stack([pcx, pcy, pcz])
        )
        got_x, got_z = estimate_xtilt_ztilt(det)
        np.testing.assert_allclose(got_x, 8.0, atol=1e-8)
        np.testing.assert_allclose(got_z, 3.0, atol=1e-8)


class TestMovingScreenReferenceGoldens:
    """PC goldens from the reference test suite
    (/root/reference/tests/test_detectors/test_calibration.py:27-109):
    the silicon moving-screen experiment's annotated band intersections
    (the PC depends only on the points and detector shape, so blank
    480x480 patterns stand in for the download-gated images)."""

    POINTS_IN = [(109, 131), (390, 139), (246, 232), (129, 228), (364, 237)]
    POINTS_OUT = [(77, 146), (424, 156), (246, 269), (104, 265), (392, 276)]
    PX_SIZE = 46 / 508

    def _cal(self, n=5, **kwargs):
        blank = np.zeros((480, 480), np.uint8)
        return PCCalibrationMovingScreen(
            blank, blank, self.POINTS_IN[:n], self.POINTS_OUT[:n],
            delta_z=5, px_size=kwargs.pop("px_size", self.PX_SIZE), **kwargs,
        )

    @pytest.mark.parametrize(
        "n_points, desired_pc",
        [
            (3, [0.5123, 0.8606, 0.4981]),
            (4, [0.5062, 0.8640, 0.5064]),
            (5, [0.5054, 0.8624, 0.5036]),
        ],
    )
    def test_pc(self, n_points, desired_pc):
        assert np.allclose(self._cal(n_points).pc, desired_pc, atol=1e-4)

    def test_pc_convention(self):
        assert np.isclose(self._cal().pc[1], 0.8624, atol=1e-4)
        assert np.isclose(
            self._cal(convention="bruker").pc[1], 0.1376, atol=1e-4
        )

    def test_pc_no_px_size(self):
        # PCz in the same unit as delta_z when px_size is unknown.
        assert np.isclose(self._cal(px_size=None).pc[2], 21.8872, atol=1e-4)
