"""Simulation engine tests: reciprocal lattice, structure factors,
kinematical master patterns, geometrical on-detector simulations."""

import numpy as np
import pytest

import jax.numpy as jnp

from kikuchipy_tpu.crystallography.crystal_map import Phase
from kikuchipy_tpu.crystallography.reciprocal import (
    Lattice,
    ReciprocalLatticeVectors,
    electron_wavelength,
)
from kikuchipy_tpu.geometry import quaternion as quat
from kikuchipy_tpu.geometry.detector import EBSDDetector
from kikuchipy_tpu.simulation import KikuchiPatternSimulator


NI_LATTICE = Lattice(3.5236, 3.5236, 3.5236, 90, 90, 90)
NI_ATOMS = [  # fcc
    ("ni", 0, 0, 0),
    ("ni", 0.5, 0.5, 0),
    ("ni", 0.5, 0, 0.5),
    ("ni", 0, 0.5, 0.5),
]


@pytest.fixture(scope="module")
def ni_reflectors():
    rlv = ReciprocalLatticeVectors.from_min_dspacing(NI_LATTICE, 1.0)
    rlv.calculate_structure_factor(NI_ATOMS)
    rlv.calculate_theta(20.0)
    return rlv.allowed()


class TestLattice:
    def test_cubic_d_spacing(self):
        # d_111 for cubic = a / sqrt(3)
        d = NI_LATTICE.d_spacing([1, 1, 1])
        np.testing.assert_allclose(d, 3.5236 / np.sqrt(3), rtol=1e-10)

    def test_hexagonal_d_spacing(self):
        # d_100 for hexagonal = a * sqrt(3) / 2
        lat = Lattice(3.0, 3.0, 5.0, 90, 90, 120)
        np.testing.assert_allclose(
            lat.d_spacing([1, 0, 0]), 3.0 * np.sqrt(3) / 2, rtol=1e-10
        )

    def test_metric_roundtrip(self):
        lat = Lattice(2, 3, 4, 80, 95, 105)
        a = lat.structure_matrix
        np.testing.assert_allclose(a @ a.T, lat.direct_metric, atol=1e-10)
        b = lat.reciprocal_structure_matrix
        np.testing.assert_allclose(b @ b.T, lat.reciprocal_metric, atol=1e-10)


class TestElectronWavelength:
    def test_known_values(self):
        # 20 kV -> 0.00859 nm (0.0859 A), 200 kV -> 0.0251 A
        np.testing.assert_allclose(electron_wavelength(20), 0.0859, atol=2e-4)
        np.testing.assert_allclose(electron_wavelength(200), 0.0251, atol=2e-4)


class TestReciprocalLatticeVectors:
    def test_fcc_extinction_rules(self, ni_reflectors):
        # fcc: h,k,l all even or all odd survive
        hkl = ni_reflectors.hkl
        parity = hkl % 2
        all_even = (parity == 0).all(axis=1)
        all_odd = (parity == 1).all(axis=1)
        assert (all_even | all_odd).all()
        # (111) and (200) families present
        d = ni_reflectors.dspacing
        assert np.isclose(d.max(), 3.5236 / np.sqrt(3), rtol=1e-6)

    def test_forbidden_excluded(self):
        rlv = ReciprocalLatticeVectors.from_min_dspacing(NI_LATTICE, 1.0)
        rlv.calculate_structure_factor(NI_ATOMS)
        amp = np.abs(rlv.structure_factor)
        # (100) is forbidden in fcc
        i100 = np.where((rlv.hkl == [1, 0, 0]).all(axis=1))[0]
        assert amp[i100] < 1e-10 * amp.max()

    def test_intensity_decays(self, ni_reflectors):
        # |F| decreases with decreasing d (higher order)
        amp = np.abs(ni_reflectors.structure_factor)
        d = ni_reflectors.dspacing
        assert amp[np.argmax(d)] > amp[np.argmin(d)]

    def test_theta_order(self, ni_reflectors):
        # Bragg angle increases with decreasing d
        order = np.argsort(-ni_reflectors.dspacing)
        assert np.all(np.diff(ni_reflectors.theta[order]) >= -1e-12)

    def test_unique_families(self, ni_reflectors):
        fam, mult = ni_reflectors.unique_families()
        # {111} multiplicity 8, {200} multiplicity 6 in the full set
        i = np.argmax(fam.dspacing)
        assert mult[i] == 8
        assert mult.sum() == ni_reflectors.size


class TestMasterPattern:
    def test_kinematical_master_pattern(self, ni_reflectors):
        sim = KikuchiPatternSimulator(
            ni_reflectors, phase=Phase("ni", space_group=225)
        )
        mp = sim.calculate_master_pattern(half_size=64)
        assert mp.data.shape == (129, 129)
        assert mp.projection == "stereographic"
        # Fourfold symmetry about the pattern center for a cubic crystal
        # in the standard orientation: [001] pole at center.
        img = mp.data
        np.testing.assert_allclose(img, np.rot90(img), atol=1e-3 * img.max())

    def test_both_hemispheres(self, ni_reflectors):
        sim = KikuchiPatternSimulator(ni_reflectors)
        mp = sim.calculate_master_pattern(half_size=32, hemisphere="both")
        assert mp.data.shape == (2, 65, 65)
        # Centrosymmetric crystal: hemispheres identical
        np.testing.assert_allclose(mp.data[0], mp.data[1], atol=1e-6)

    def test_scaling_options(self, ni_reflectors):
        sim = KikuchiPatternSimulator(ni_reflectors)
        a = sim.calculate_master_pattern(half_size=16, scaling="linear").data
        b = sim.calculate_master_pattern(half_size=16, scaling="square").data
        c = sim.calculate_master_pattern(half_size=16, scaling=None).data
        assert not np.allclose(a / a.max(), b / b.max())
        assert not np.allclose(a / a.max(), c / c.max())
        with pytest.raises(ValueError, match="scaling"):
            sim.calculate_master_pattern(half_size=16, scaling="log")


class TestOnDetector:
    def test_band_lines_orthogonal_to_reflectors(self, ni_reflectors):
        """Geometric consistency with the master-pattern projector: a
        point on a band-center line, traced back through the detector
        geometry and crystal rotation, must be perpendicular to its
        reciprocal-lattice vector."""
        fam = ni_reflectors
        det = EBSDDetector(shape=(60, 60), pc=(0.42, 0.21, 0.50), sample_tilt=70)
        rng = np.random.default_rng(0)
        eu = rng.uniform(0, 1, size=(2, 3)) * [2 * np.pi, np.pi, 2 * np.pi]
        rot = np.asarray(quat.from_euler(jnp.asarray(eu)))

        sim = KikuchiPatternSimulator(fam, phase=Phase("ni", 225))
        geo = sim.on_detector(det, rot)

        for idx in range(2):
            traces = geo.lines_coordinates(
                idx, coordinates="gnomonic", exclude_nan=False
            )
            in_pat = ~np.isnan(traces).any(axis=1)
            assert in_pat.sum() > 3  # several bands visible
            m_d2s = det.detector_to_sample
            q = rot[idx]
            for trace, g_hkl in zip(traces[in_pat], geo.lines.hkl[in_pat]):
                # Midpoint of the line segment, as a detector-frame ray
                xm, ym = (trace[0] + trace[2]) / 2, (trace[1] + trace[3]) / 2
                v_det = np.array([xm, ym, 1.0])
                v_sample = m_d2s @ v_det
                v_cryst = np.asarray(
                    quat.rotate_vector(jnp.asarray(q), jnp.asarray(v_sample))
                )
                g_cart = (
                    g_hkl @ fam.lattice.reciprocal_structure_matrix
                )
                cosang = (v_cryst @ g_cart) / (
                    np.linalg.norm(v_cryst) * np.linalg.norm(g_cart)
                )
                assert abs(cosang) < 1e-6

    def test_zone_axes_on_line_intersections(self, ni_reflectors):
        fam = ni_reflectors
        det = EBSDDetector(shape=(60, 60), pc=(0.5, 0.5, 0.5))
        rot = np.array([[1.0, 0, 0, 0]])
        sim = KikuchiPatternSimulator(fam)
        geo = sim.on_detector(det, rot)
        xy = geo.zone_axes_coordinates(0, coordinates="gnomonic")
        assert xy.shape[0] > 0 and not np.isnan(xy).any()

    def test_as_collections_and_plot(self, ni_reflectors):
        import matplotlib

        matplotlib.use("Agg")
        fam = ni_reflectors
        det = EBSDDetector(shape=(60, 60), pc=(0.5, 0.3, 0.5))
        sim = KikuchiPatternSimulator(fam)
        geo = sim.on_detector(det, np.array([[1.0, 0, 0, 0]]))
        from matplotlib.collections import LineCollection, PathCollection
        from matplotlib.text import Text

        colls = geo.as_collections(0, zone_axes=True, zone_axes_labels=True)
        assert len(colls) == 3
        assert isinstance(colls[0], LineCollection)
        assert isinstance(colls[1], PathCollection)
        assert all(isinstance(t, Text) for t in colls[2])
        ax = geo.plot(0, pattern=np.zeros((60, 60)))
        assert ax is not None


class TestGeometricalSimulationReferenceGoldens:
    """Pixel-coordinate goldens from the reference's own test suite
    (/root/reference/tests/test_simulations/
    test_kikuchi_pattern_simulation.py:104-125): Al {200} Kikuchi lines
    and <100> zone axis on a (60, 60) default detector at +-80 deg
    rotations about Z."""

    def _sim(self):
        hkl = np.array(
            [[2, 0, 0], [-2, 0, 0], [0, 2, 0], [0, -2, 0], [0, 0, 2],
             [0, 0, -2]],
            dtype=float,
        )
        lat = Lattice(4.05, 4.05, 4.05, 90, 90, 90)
        ref = ReciprocalLatticeVectors(
            hkl=hkl, lattice=lat, dspacing=lat.d_spacing(hkl)
        )
        ref.calculate_theta(20.0)
        det = EBSDDetector(shape=(60, 60))
        half = np.deg2rad(80) / 2
        pair = np.array(
            [
                [np.cos(half), 0, 0, np.sin(half)],
                [np.cos(half), 0, 0, -np.sin(half)],
            ]
        )
        rot = np.stack([pair, pair])  # (2, 2, 4) like the reference's stack
        return KikuchiPatternSimulator(ref).on_detector(det, rot)

    def test_lines_coordinates_golden(self):
        sim = self._sim()
        assert np.allclose(
            sim.lines_coordinates(),
            [[24.4, -11.9, 38.0, 70.3], [-12.1, 26.6, 67.2, 11.7]],
            atol=0.1,
        )
        # (1, 1) is the -80 deg rotation, as in the reference test.
        assert np.allclose(
            sim.lines_coordinates((1, 1)),
            [[21.0, 70.3, 34.6, -11.9], [-8.2, 11.7, 71.1, 26.6]],
            atol=0.1,
        )

    def test_zone_axes_coordinates_golden(self):
        sim = self._sim()
        assert np.allclose(sim.zone_axes_coordinates(), [[29.5, 18.76]], atol=0.01)
        assert np.allclose(
            sim.zone_axes_coordinates((1, 1)), [[29.5, 18.76]], atol=0.01
        )

    def test_as_collections_coordinates_golden(self):
        # Reference test_coordinates (:240-262): first Kikuchi line in
        # pixel and gnomonic coordinates, zone-axis circle center and
        # label position in gnomonic coordinates.
        sim = self._sim()
        coll1 = sim.as_collections()
        coords1 = coll1[0].get_paths()[0].vertices.ravel()
        assert np.allclose(coords1, [24.4, -11.92, 38.0, 70.3], atol=0.1)
        coll2 = sim.as_collections(
            coordinates="gnomonic", zone_axes=True, zone_axes_labels=True
        )
        coords2 = coll2[0].get_paths()[0].vertices.ravel()
        assert np.allclose(coords2, [-0.2, 1.4, 0.3, -1.4], atol=0.1)
        za_coords2 = coll2[1].get_paths()[0].vertices
        assert np.allclose(za_coords2.mean(axis=0), [0, 0.36], atol=0.01)
        za_labels_coords2 = coll2[2][0]
        assert np.allclose(
            za_labels_coords2.get_position(), [0, 0.42], atol=0.01
        )
