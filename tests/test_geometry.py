"""Geometry-core tests: quaternions, Lambert projection, detector."""

import numpy as np
import pytest

import jax.numpy as jnp

from kikuchipy_tpu.geometry import quaternion as quat
from kikuchipy_tpu.geometry.lambert import lambert_to_vector, vector_to_lambert
from kikuchipy_tpu.geometry.detector import EBSDDetector


class TestQuaternion:
    def test_from_euler_identity(self):
        q = np.asarray(quat.from_euler(jnp.zeros(3)))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-12)

    def test_from_euler_known(self):
        # 90 deg about Z (alpha=pi/2): q = (cos(pi/4), 0, 0, -sin(pi/4))
        # with the reference's sign convention (_utils/numba.py:44-56).
        q = np.asarray(quat.from_euler(jnp.array([np.pi / 2, 0.0, 0.0])))
        np.testing.assert_allclose(
            q, [np.cos(np.pi / 4), 0, 0, -np.sin(np.pi / 4)], atol=1e-12
        )

    def test_euler_roundtrip(self):
        rng = np.random.default_rng(42)
        eu = np.stack(
            [
                rng.uniform(0, 2 * np.pi, 50),
                rng.uniform(0.01, np.pi - 0.01, 50),
                rng.uniform(0, 2 * np.pi, 50),
            ],
            axis=-1,
        )
        q = quat.from_euler(jnp.asarray(eu))
        eu2 = np.asarray(quat.to_euler(q))
        q2 = quat.from_euler(jnp.asarray(eu2))
        ang = np.asarray(quat.angle_between(q, q2))
        assert ang.max() < 1e-6

    def test_rotate_vector_matches_matrix(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(10, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        v = rng.normal(size=(10, 3))
        out = np.asarray(quat.rotate_vector(jnp.asarray(q), jnp.asarray(v)))
        # rotate_vector is the active rotation by q: to_matrix(q) @ v.
        m = np.asarray(quat.to_matrix(jnp.asarray(q)))
        expected = np.einsum("nij,nj->ni", m, v)
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_multiply_conjugate_identity(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(5, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        prod = np.asarray(quat.multiply(jnp.asarray(q), quat.conjugate(jnp.asarray(q))))
        np.testing.assert_allclose(prod[:, 0], 1.0, atol=1e-12)
        np.testing.assert_allclose(prod[:, 1:], 0.0, atol=1e-12)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(100, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q = np.where(q[:, :1] < 0, -q, q)
        m = quat.to_matrix(jnp.asarray(q))
        q2 = np.asarray(quat.from_matrix(m))
        np.testing.assert_allclose(q2, q, atol=1e-8)


class TestLambert:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        v = rng.normal(size=(500, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        v[:, 2] = np.abs(v[:, 2])  # upper hemisphere
        xy = vector_to_lambert(jnp.asarray(v))
        v2 = np.array(lambert_to_vector(xy / np.sqrt(np.pi / 2)))
        v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
        np.testing.assert_allclose(v2, v, atol=1e-10)

    def test_pole(self):
        xy = np.asarray(vector_to_lambert(jnp.asarray([[0.0, 0.0, 1.0]])))
        np.testing.assert_allclose(xy, [[0.0, 0.0]], atol=1e-12)

    def test_equal_area(self):
        # Lambert is area preserving: points uniform on the hemisphere
        # map to points uniform on the square.
        rng = np.random.default_rng(4)
        v = rng.normal(size=(20000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        v[:, 2] = np.abs(v[:, 2])
        xy = np.asarray(vector_to_lambert(jnp.asarray(v))) / np.sqrt(np.pi / 2)
        # Quadrant counts should be ~uniform
        counts, *_ = np.histogram2d(xy[:, 0], xy[:, 1], bins=4, range=[[-1, 1], [-1, 1]])
        assert counts.std() / counts.mean() < 0.12


class TestEBSDDetector:
    def test_defaults(self):
        det = EBSDDetector()
        assert det.shape == (1, 1)
        np.testing.assert_allclose(det.pc, [[0.5, 0.5, 0.5]])
        assert det.sample_tilt == 70.0

    def test_gnomonic_bounds_centered_pc(self):
        det = EBSDDetector(shape=(60, 60), pc=(0.5, 0.5, 0.5))
        gb = det.gnomonic_bounds.squeeze()
        np.testing.assert_allclose(gb, [-1, 1, -1, 1])

    def test_gnomonic_known(self):
        # Values checkable by hand from the Britton conventions
        # (reference detectors/_ebsd_detector.py:731-833).
        det = EBSDDetector(shape=(60, 80), pc=(0.4, 0.6, 0.5))
        ar = 80 / 60
        np.testing.assert_allclose(det.x_min, -ar * 0.4 / 0.5)
        np.testing.assert_allclose(det.x_max, ar * 0.6 / 0.5)
        np.testing.assert_allclose(det.y_min, -0.4 / 0.5)
        np.testing.assert_allclose(det.y_max, 0.6 / 0.5)

    def test_pc_conversions_roundtrip(self):
        det = EBSDDetector(shape=(60, 70), px_size=59.2, binning=8, pc=(0.4, 0.6, 0.5))
        for conv in ["tsl", "oxford", "emsoft", "emsoft4"]:
            pc_conv = det.pc_in_convention(conv)
            det2 = EBSDDetector(
                shape=(60, 70), px_size=59.2, binning=8, pc=pc_conv, convention=conv
            )
            np.testing.assert_allclose(det2.pc, det.pc, atol=1e-12)

    def test_pc_tsl_formula(self):
        # tsl->bruker: y -> 1 - y, z -> z * min(r,c)/r
        # (reference detectors/_ebsd_detector.py:2305-2309)
        det = EBSDDetector(shape=(60, 80), pc=(0.4, 0.2, 0.6), convention="tsl")
        np.testing.assert_allclose(det.pc, [[0.4, 0.8, 0.6]])

    def test_sample_to_detector_tilt_only(self):
        # With all angles zero the detector frame is X_d=Y_s, Y_d=Z_s,
        # Z_d=X_s.
        det = EBSDDetector(sample_tilt=0.0, tilt=0.0)
        m = det.sample_to_detector
        np.testing.assert_allclose(
            m, [[0, 1, 0], [0, 0, 1], [1, 0, 0]], atol=1e-14
        )

    def test_sample_to_detector_orthonormal(self):
        det = EBSDDetector(sample_tilt=70.0, tilt=8.3, azimuthal=4.0, twist=1.2)
        m = det.sample_to_detector
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-12)

    def test_pixel_gnomonic_roundtrip(self):
        # Coordinates ordered (y, x) like the reference converters.
        det = EBSDDetector(shape=(60, 60), pc=(0.42, 0.55, 0.5))
        px = np.array([[10.0, 20.0], [0.0, 0.0], [59.0, 59.0]])
        gn = det.to_gnomonic_coords(px)
        assert gn.shape == (1, 3, 2)  # single-PC nav shape is (1,)
        px2 = det.to_pixel_coords(gn)
        np.testing.assert_allclose(px2, px[None], atol=1e-12)

    def test_crop(self):
        det = EBSDDetector(shape=(60, 60), pc=(0.4, 0.6, 0.5))
        det2 = det.crop((10, 50, 20, 60))
        assert det2.shape == (40, 40)
        # PC must still point at the same physical spot:
        # pcx*ncols - col0 == pcx2*ncols2
        np.testing.assert_allclose(det2.pcx * 40, det.pcx * 60 - 20)
        np.testing.assert_allclose(det2.pcz * 40, det.pcz * 60)

    def test_save_load_roundtrip(self, tmp_path):
        det = EBSDDetector(
            shape=(60, 60),
            px_size=59.2,
            binning=2,
            tilt=5.0,
            azimuthal=1.0,
            twist=0.5,
            sample_tilt=69.0,
            pc=np.random.default_rng(0).uniform(0.3, 0.7, size=(3, 4, 3)),
        )
        fname = tmp_path / "det.txt"
        det.save(fname)
        det2 = EBSDDetector.load(fname)
        assert det2.shape == det.shape
        assert det2.navigation_shape == det.navigation_shape
        np.testing.assert_allclose(det2.pc, det.pc, atol=1e-9)
        assert det2.sample_tilt == det.sample_tilt

    def test_multiple_pcs(self):
        pc = np.arange(27, dtype=float).reshape((3, 3, 3))
        pc = pc / pc.max()
        det = EBSDDetector(shape=(3, 3), pc=pc)
        assert det.navigation_shape == (3, 3)
        assert det.navigation_size == 9
        assert det.gnomonic_bounds.shape == (3, 3, 4)

    def test_invalid_convention(self):
        with pytest.raises(ValueError, match="Unrecognized"):
            EBSDDetector(pc=(0.5, 0.5, 0.5), convention="nonsense")


class TestCoordinateConversions:
    """Reference goldens from tests/test_detectors/test_ebsd_detector.py
    :306-349 (coordinates ordered (y, x) / (gy, gx))."""

    PC = np.array([
        [[0.4214844, 0.21500351, 0.50201974],
         [0.42414583, 0.21014019, 0.50104439]],
        [[0.42088203, 0.2165417, 0.50079336],
         [0.42725023, 0.21450546, 0.49996293]],
    ])

    def test_per_pc_broadcast_golden(self):
        det = EBSDDetector(shape=(60, 60), pc=self.PC)
        out = det.to_gnomonic_coords(np.array([[12.7, 36.2]]))
        want = np.array([
            [[[0.00664684, 0.36223463]], [[-0.00304659, 0.357628]]],
            [[[0.00973462, 0.36432453]], [[0.00567801, 0.35219232]]],
        ])
        assert out.shape == (2, 2, 1, 2)
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_detector_index_golden_and_roundtrip(self):
        det = EBSDDetector(shape=(60, 60), pc=self.PC)
        coords = np.array([[12.7, 36.2], [43.7, 2.5], [27.7, 8.2]])
        out = det.to_gnomonic_coords(coords, (0, 1))
        want = np.array([
            [-0.00304659, 0.35762801],
            [-1.03422601, -0.76336381],
            [-0.50200438, -0.57375985],
        ])
        np.testing.assert_allclose(out, want, atol=1e-6)
        np.testing.assert_allclose(
            det.to_pixel_coords(out, (0, 1)), coords, atol=1e-9
        )

    def test_wrong_index_dim_raises(self):
        det = EBSDDetector(shape=(60, 60), pc=self.PC)
        with pytest.raises(ValueError, match="navigation dimension"):
            det.to_gnomonic_coords(np.array([[1.0, 2.0]]), 0)

    def test_bad_last_axis_raises(self):
        det = EBSDDetector(shape=(60, 60), pc=(0.5, 0.5, 0.5))
        with pytest.raises(ValueError, match="length 2"):
            det.to_gnomonic_coords(np.ones((2, 3)))


class TestDetectorExtrapolatePC:
    """Pinned to the reference's own test goldens
    (/root/reference/tests/test_detectors/test_ebsd_detector.py:803-832).
    """

    def _det0(self):
        from kikuchipy_tpu.geometry.detector import EBSDDetector

        return EBSDDetector(
            shape=(240, 240),
            pc=(0.5, 0.3, 0.5),
            sample_tilt=70,
            tilt=0,
            px_size=70,
            binning=2,
        )

    def test_extrapolate_pc_reference_golden(self):
        det = self._det0().extrapolate_pc(
            pc_indices=[7, 15],
            navigation_shape=(15, 31),
            step_sizes=(50, 50),
        )
        assert det.navigation_shape == (15, 31)
        np.testing.assert_allclose(det.pc_average, [0.5, 0.3, 0.5], atol=1e-7)
        np.testing.assert_allclose(
            det.pc_flattened.min(0), [0.4777, 0.2902, 0.4964], atol=1e-4
        )
        np.testing.assert_allclose(
            det.pc_flattened.max(0), [0.5223, 0.3098, 0.5036], atol=1e-4
        )

    def test_estimate_xtilt_ztilt_recovers_alpha(self):
        # Extrapolated PC plane encodes alpha = 90 - sample_tilt + tilt
        # (reference test :763-771).
        det = self._det0().extrapolate_pc(
            pc_indices=[0, 0],
            navigation_shape=(15, 20),
            step_sizes=(1, 1),
        )
        xtilt, ztilt = det.estimate_xtilt_ztilt(degrees=True)
        np.testing.assert_allclose(xtilt, 20.0, atol=1e-6)
        np.testing.assert_allclose(ztilt, 0.0, atol=1e-6)

    def test_outlier_exclusion(self):
        import dataclasses as dc

        det = self._det0().extrapolate_pc(
            pc_indices=[0, 0], navigation_shape=(4, 5), step_sizes=(1, 1)
        )
        pc = det.pc_flattened.copy()
        pc[0] = [0.9, 0.9, 0.9]
        det2 = dc.replace(det, pc=pc.reshape(4, 5, 3))
        out = np.zeros(20, bool)
        out[0] = True
        xtilt, ztilt = det2.estimate_xtilt_ztilt(degrees=True, is_outlier=out)
        np.testing.assert_allclose(xtilt, 20.0, atol=1e-6)
        np.testing.assert_allclose(ztilt, 0.0, atol=1e-6)

    def test_side_top_views(self):
        import matplotlib

        matplotlib.use("Agg")
        det = self._det0()
        det.plot_side_view()
        det.plot_top_view()


class TestFitPCReferenceMode:
    """EBSDDetector.fit_pc / estimate_xtilt with the reference's full
    signatures (reference ``_ebsd_detector.py:1427,1045``)."""

    def _planar_detector(self, noise=0.0, outliers=()):
        # PCs on a plane over a 4x5 map, reference-like magnitudes.
        ny, nx = 4, 5
        yy, xx = np.indices((ny, nx)).astype(float)
        pcx = 0.50 + 0.004 * xx
        pcy = 0.30 + 0.006 * yy
        pcz = 0.55 - 0.003 * yy
        pc = np.stack([pcx, pcy, pcz], axis=-1)
        if noise:
            rng = np.random.default_rng(7)
            pc += rng.normal(scale=noise, size=pc.shape)
        for (r, c) in outliers:
            pc[r, c] += np.array([0.05, -0.08, 0.06])
        return EBSDDetector(shape=(60, 60), pc=pc, sample_tilt=70.0)

    def test_fit_pc_projective_interpolates(self):
        det = self._planar_detector()
        ny, nx = 4, 5
        idx = np.stack(np.indices((ny, nx)).astype(float))
        new = det.fit_pc(idx, idx, transformation="projective")
        assert new.navigation_shape == (ny, nx)
        np.testing.assert_allclose(new.pc, det.pc, atol=5e-4)

    def test_fit_pc_affine_extrapolates_to_larger_map(self):
        det = self._planar_detector()
        idx = np.stack(np.indices((4, 5)).astype(float))
        big = np.stack(np.indices((8, 10)).astype(float))
        new = det.fit_pc(idx, big, transformation="affine")
        assert new.navigation_shape == (8, 10)
        # The fitted plane extends the per-axis gradients.
        np.testing.assert_allclose(new.pc[:4, :5], det.pc, atol=1e-6)
        assert new.pc[7, 0, 1] > det.pc[3, 0, 1]
        # Sample tilt re-estimated from the plane: near the original.
        assert abs(new.sample_tilt - 70.0) < 15

    def test_fit_pc_outlier_exclusion(self):
        det = self._planar_detector(outliers=[(1, 2)])
        clean = self._planar_detector()
        idx = np.stack(np.indices((4, 5)).astype(float))
        is_outlier = np.zeros((4, 5), dtype=bool)
        is_outlier[1, 2] = True
        new = det.fit_pc(
            idx, idx, transformation="affine", is_outlier=is_outlier
        )
        np.testing.assert_allclose(new.pc, clean.pc, atol=1e-6)

    def test_fit_pc_validation(self):
        det = self._planar_detector()
        idx = np.stack(np.indices((4, 5)).astype(float))
        with pytest.raises(ValueError, match="pc_indices"):
            det.fit_pc(idx[:, :2], idx)
        with pytest.raises(ValueError, match="map_indices"):
            det.fit_pc(idx, idx[0])
        with pytest.raises(ValueError, match="is_outlier"):
            det.fit_pc(idx, idx, is_outlier=np.zeros(3, dtype=bool))
        one_pc = EBSDDetector(shape=(60, 60), pc=(0.5, 0.3, 0.5))
        with pytest.raises(ValueError, match="multiple"):
            one_pc.fit_pc(idx, idx)

    def test_fit_pc_legacy_method_mode(self):
        det = self._planar_detector(noise=1e-4)
        new = det.fit_pc(method="plane")
        assert new.navigation_shape == det.navigation_shape
        resid = np.abs(new.pc - self._planar_detector().pc).max()
        assert resid < 1e-3

    def test_fit_pc_return_figure(self):
        import matplotlib

        matplotlib.use("Agg")
        det = self._planar_detector()
        idx = np.stack(np.indices((4, 5)).astype(float))
        out = det.fit_pc(idx, idx, plot=True, return_figure=True)
        assert isinstance(out, tuple) and len(out) == 2
        import matplotlib.pyplot as plt

        plt.close(out[1])

    def test_estimate_xtilt_robust_flags_outliers(self):
        det = self._planar_detector(noise=2e-4, outliers=[(2, 3)])
        tilt, outliers = det.estimate_xtilt(
            detect_outliers=True, return_outliers=True
        )
        flat_out = np.nonzero(outliers)[0]
        assert 2 * 5 + 3 in flat_out
        # Reference convention: x_tilt = pi/2 + atan(dPCy/dPCz); with
        # dPCy/dPCz = 0.006 / -0.003 = -2 the angle is ~26.6 deg.
        assert abs(tilt - np.rad2deg(np.pi / 2 + np.arctan(-2.0))) < 3.0

    def test_estimate_xtilt_plot(self):
        import matplotlib

        matplotlib.use("Agg")
        det = self._planar_detector()
        out = det.estimate_xtilt(
            detect_outliers=True, plot=True, return_figure=True
        )
        import matplotlib.pyplot as plt

        assert isinstance(out, tuple)
        plt.close(out[-1])


class TestPlotPCModes:
    def _det(self):
        pc = np.random.default_rng(0).uniform(0.4, 0.6, size=(3, 4, 3))
        return EBSDDetector(shape=(60, 60), pc=pc)

    def test_modes(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        det = self._det()
        for mode in ("map", "scatter", "3d"):
            fig = det.plot_pc(mode=mode, return_figure=True, annotate=True)
            plt.close(fig)
        with pytest.raises(ValueError, match="mode"):
            det.plot_pc(mode="nope")
        with pytest.raises(ValueError, match="orientation"):
            det.plot_pc(mode="scatter", orientation="diagonal")

    def test_pos_alias_and_load_fname(self, tmp_path):
        det = self._det()
        coords = np.array([[10.0, 20.0]])
        np.testing.assert_allclose(
            det.to_gnomonic_coords(coords, detector_index=(0, 0)),
            det.to_gnomonic_coords(pos=coords, detector_index=(0, 0)),
        )
        np.testing.assert_allclose(
            det.to_pixel_coords(coords, detector_index=(0, 0)),
            det.to_pixel_coords(pos=coords, detector_index=(0, 0)),
        )
        path = tmp_path / "det.txt"
        det.save(path)
        d1 = EBSDDetector.load(path)
        d2 = EBSDDetector.load(fname=path)
        np.testing.assert_allclose(d1.pc, d2.pc)


class TestCoordinateConversionReferenceGoldens:
    """Conversion-factor goldens from the reference test suite
    (/root/reference/tests/test_utils/test_detector_coordinates.py:59-75)
    on the real nickel_ebsd_small detector (first navigation row).

    The pixel<->gnomonic conversion is affine per navigation point, so
    the slope/offset are recovered from our to_gnomonic_coords /
    to_pixel_coords by probing (0, 0) and (1, 1)."""

    def _factors(self, convert, det_index):
        p0 = convert(np.array([[0.0, 0.0]]), detector_index=det_index)[0]
        p1 = convert(np.array([[1.0, 1.0]]), detector_index=det_index)[0]
        # Conversions return (y, x)-ordered pairs.
        m_y, m_x = p1 - p0
        c_y, c_x = p0
        return m_x, c_x, m_y, c_y

    def test_conversion_factors(self):
        import h5py

        path = (
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        )
        with h5py.File(path) as f:
            h = f["Scan 1/EBSD/Header"]
            pc = np.stack([h["pcx"][:], h["pcy"][:], h["pcz"][:]], axis=-1)
        det = EBSDDetector(shape=(60, 60), pc=pc[0], sample_tilt=70)
        exp = {
            "pix_to_gn": {
                "m_x": [0.03319923, 0.03326385, 0.03330547],
                "c_x": [-0.83957734, -0.84652344, -0.85204404],
                "m_y": [-0.03319923, -0.03326385, -0.03330547],
                "c_y": [0.42827701, 0.41940433, 0.42255835],
            },
            "gn_to_pix": {
                "m_x": [30.12118421, 30.06266362, 30.02509794],
                "c_x": [25.28906376, 25.4487495, 25.58270568],
                "m_y": [-30.12118421, -30.06266362, -30.02509794],
                "c_y": [12.90021062, 12.60841133, 12.6873559],
            },
        }
        for i in range(3):
            m_x, c_x, m_y, c_y = self._factors(det.to_gnomonic_coords, i)
            assert np.allclose(
                [m_x, c_x, m_y, c_y],
                [exp["pix_to_gn"][k][i] for k in ("m_x", "c_x", "m_y", "c_y")],
            )
            m_x, c_x, m_y, c_y = self._factors(det.to_pixel_coords, i)
            assert np.allclose(
                [m_x, c_x, m_y, c_y],
                [exp["gn_to_pix"][k][i] for k in ("m_x", "c_x", "m_y", "c_y")],
            )


class TestGnomonicRangeReferenceGoldens:
    """Gnomonic range/scale goldens from the reference test suite
    (/root/reference/tests/test_detectors/test_ebsd_detector.py:228-257,
    with its pc1 fixture used in the internal Bruker convention)."""

    PC1 = (0.4210, 0.7794, 0.5049)

    @pytest.mark.parametrize(
        "shape, x_range, y_range",
        [
            ((60, 60), [-0.833828, 1.146762], [-0.436918, 1.543672]),
            ((510, 510), [-0.833828, 1.146762], [-0.436918, 1.543672]),
            ((1, 1), [-0.833828, 1.146762], [-0.436918, 1.543672]),
            ((480, 640), [-1.111771, 1.529016], [-0.436918, 1.543672]),
        ],
    )
    def test_gnomonic_range(self, shape, x_range, y_range):
        det = EBSDDetector(shape=shape, pc=self.PC1)
        assert np.allclose(det.x_range, x_range, atol=1e-6)
        assert np.allclose(det.y_range, y_range, atol=1e-6)

    @pytest.mark.parametrize(
        "shape, x_scale, y_scale",
        [
            ((60, 60), 0.033569, 0.033569),
            ((510, 510), 0.003891, 0.003891),
            ((1, 1), 1.980590, 1.980590),
            ((480, 640), 0.004133, 0.004135),
        ],
    )
    def test_gnomonic_scale(self, shape, x_scale, y_scale):
        det = EBSDDetector(shape=shape, pc=self.PC1)
        assert np.allclose(det.x_scale, x_scale, atol=1e-6)
        assert np.allclose(det.y_scale, y_scale, atol=1e-6)


class TestSampleToDetectorReferenceGoldens:
    """sample_to_detector goldens from the reference test suite
    (/root/reference/tests/test_detectors/test_ebsd_detector.py:258-274;
    the reference returns an orix quaternion, ours the equivalent
    rotation matrix)."""

    @staticmethod
    def _quat_to_matrix(q):
        w, x, y, z = q
        return np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )

    @pytest.mark.parametrize(
        "tilt, azimuthal, twist, sample_tilt, expected_quat",
        [
            (0, 0, 0, 90.0, [0.7071, 0.0, 0.0, -0.7071]),
            (0, 0, 0, 70.0, [0.6964, -0.1228, -0.1228, -0.6964]),
            (8.3, 4.7, -1.02, 70.0, [0.6861, -0.2021, -0.1428, -0.6841]),
        ],
    )
    def test_golden(self, tilt, azimuthal, twist, sample_tilt, expected_quat):
        det = EBSDDetector(
            tilt=tilt, azimuthal=azimuthal, twist=twist, sample_tilt=sample_tilt
        )
        np.testing.assert_allclose(
            det.sample_to_detector,
            self._quat_to_matrix(expected_quat),
            atol=5e-4,
        )

    @pytest.mark.parametrize("sample_tilt", [0.0, 70.0])
    def test_azimuthal_rotates_about_detector_y(self, sample_tilt):
        # Reference :291-301: changing azimuthal must not move the
        # detector Y axis.
        import dataclasses

        det = EBSDDetector(sample_tilt=sample_tilt, tilt=40.0)
        y0 = det.sample_to_detector[1]
        for azimuthal in (20.0, -40.0):
            det2 = dataclasses.replace(det, azimuthal=azimuthal, pc=det.pc.copy())
            np.testing.assert_allclose(det2.sample_to_detector[1], y0, atol=1e-8)


class TestCropReferenceGoldens:
    """Detector crop goldens and semantics from the reference test
    suite (/root/reference/tests/test_detectors/test_ebsd_detector.py:
    490-523)."""

    def test_crop_pc_golden(self):
        det = EBSDDetector((6, 6), pc=(3 / 6, 2 / 6, 0.5))
        det2 = det.crop((1, 5, 2, 6))
        assert det2.shape == (4, 4)
        np.testing.assert_allclose(det2.pc, [[0.25, 0.25, 0.75]])

    def test_crop_clamps_out_of_range(self):
        det = EBSDDetector((60, 60), pc=(0.42, 0.22, 0.50))
        det2 = det.crop((-10, 50, 20, 70))  # clamps to (0, 50, 20, 60)
        assert det2.shape == (50, 40)

    def test_crop_raises(self):
        det = EBSDDetector((6, 6), pc=(3 / 6, 2 / 6, 0.5))
        with pytest.raises(ValueError):
            det.crop((1.0, 5, 2, 6))
        with pytest.raises(ValueError):
            det.crop((5, 1, 2, 6))
        with pytest.raises(ValueError):
            det.crop((1, 5, 6, 2))


class TestDetectorDimensionsReferenceGoldens:
    """Derived-dimension goldens from the reference test suite
    (/root/reference/tests/test_detectors/test_ebsd_detector.py:87-146)."""

    @pytest.mark.parametrize(
        "shape, px_size, binning, pc, ssd, width, height, size, "
        "shape_unbinned, px_size_binned",
        [
            ((60, 60), 70, 8, [1, 1, 0.5], 16800, 33600, 33600, 3600,
             (480, 480), 560),
            ((60, 60), 70, 8, [1, 1, 0.7], 23520, 33600, 33600, 3600,
             (480, 480), 560),
            ((480, 460), 70, 0.5, [1, 1, 0.7], 11760, 16100, 16800,
             220800, (240, 230), 35),
            ((340, 680), 40, 2, [1, 1, 0.7], 19040, 54400, 27200,
             231200, (680, 1360), 80),
        ],
    )
    def test_dimensions(
        self, shape, px_size, binning, pc, ssd, width, height, size,
        shape_unbinned, px_size_binned,
    ):
        det = EBSDDetector(
            shape=shape, px_size=px_size, binning=binning, pc=pc
        )
        assert np.isclose(det.specimen_scintillator_distance, ssd)
        assert np.isclose(det.width, width)
        assert np.isclose(det.height, height)
        assert det.size == size
        assert det.unbinned_shape == shape_unbinned
        assert np.isclose(det.px_size_binned, px_size_binned)


class TestEMsoftPCConversionReferenceGoldens:
    """EMsoft -> Bruker -> EMsoft/TSL/Oxford conversion goldens from
    the reference test suite
    (/root/reference/tests/test_detectors/test_ebsd_detector.py:
    552-631); the pc_* converters are methods as in the reference."""

    @pytest.mark.parametrize(
        "shape, pc, px_size, binning, version, desired_pc",
        [
            ((60, 60), [-3.4848, 114.2016, 15767.7], 59.2, 8, 5,
             [0.50726, 0.26208, 0.55489]),
            ((61, 61), [-10.6320, 145.5187, 19918.9], 59.2, 8, 5,
             [0.52178688525, 0.20180594262, 0.68948341272]),
            ((61, 61), [10.632, 145.5187, 19918.9], 59.2, 8, 5,
             [0.47821, 0.20181, 0.68948]),
            ((80, 60), [-0.55, -13.00, 16075.2], 50, 6, 5,
             [0.50153, 0.52708, 0.66980]),
            ((80, 60), [0.55, -13.00, 16075.2], 50, 6, 4,
             [0.50153, 0.52708, 0.66980]),
            ((480, 640), [0, 0, 15000], 50, 1, 5, [0.5, 0.5, 0.625]),
        ],
    )
    def test_emsoft_roundtrip(
        self, shape, pc, px_size, binning, version, desired_pc
    ):
        det = EBSDDetector(
            shape=shape, pc=pc, px_size=px_size, binning=binning,
            convention=f"emsoft{version}",
        )
        assert np.allclose(np.ravel(det.pc), desired_pc, atol=1e-5)
        assert np.allclose(
            np.ravel(det.pc_emsoft(version=version)), pc, atol=1e-3
        )
        assert np.allclose(np.ravel(det.pc_bruker()), desired_pc, atol=1e-5)

        pc_tsl = np.ravel(det.pc).copy()
        pc_tsl[1] = 1 - pc_tsl[1]
        pc_tsl[2] /= min(shape) / shape[0]
        assert np.allclose(np.ravel(det.pc_tsl()), pc_tsl, atol=1e-5)

        pc_oxford = np.ravel(det.pc).copy()
        pc_oxford[1] = 1 - pc_oxford[1]
        pc_oxford[1:] /= det.aspect_ratio
        assert np.allclose(np.ravel(det.pc_oxford()), pc_oxford, atol=1e-5)


class TestDetectorReprReferenceGolden:
    def test_exact_repr(self):
        # Reference tests/test_detectors/test_ebsd_detector.py:148-163.
        det = EBSDDetector(
            shape=(1, 2), px_size=3, binning=4, tilt=5, azimuthal=2,
            twist=1.02, pc=(0.421, 0.779, 0.505),
        )
        assert repr(det) == (
            "EBSDDetector\n"
            "  shape (Ny, Nx):     (1, 2)\n"
            "  pc (PCx, PCy, PCz): (0.421, 0.779, 0.505)\n"
            "  sample_tilt:        70.0\N{DEGREE SIGN}\n"
            "  tilt:               5.0\N{DEGREE SIGN}\n"
            "  azimuthal:          2.0\N{DEGREE SIGN}\n"
            "  twist:              1.02\N{DEGREE SIGN}\n"
            "  binning:            4\n"
            "  px_size:            3.0 um"
        )
