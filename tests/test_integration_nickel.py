"""End-to-end integration: preprocess + dictionary-index the real
nickel_ebsd_small scan against a dictionary generated from the real
EMsoft nickel master pattern, and check the indexed orientations agree
with the scan's stored (reference-indexed) orientations.

This mirrors BASELINE.json config 2 and the reference's DI benchmark
(/root/reference/benchmarks/indexing/test_dictionary_indexing.py).
"""

import numpy as np
import pytest

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.sampling import (
    disorientation_angle,
    sample_fundamental_zone,
)
from kikuchipy_tpu.filters.window import Window


@pytest.fixture(scope="module")
def nickel(nickel_ebsd_small_path):
    return kp.load(nickel_ebsd_small_path)


@pytest.fixture(scope="module")
def master(nickel_master_pattern_path):
    return kp.load(
        nickel_master_pattern_path, projection="lambert", hemisphere="both"
    )


# module-scoped path fixtures (conftest ones are function-scoped)
@pytest.fixture(scope="module")
def nickel_ebsd_small_path():
    from pathlib import Path

    p = Path("/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5")
    if not p.exists():
        pytest.skip("reference data not available")
    return p


@pytest.fixture(scope="module")
def nickel_master_pattern_path():
    from pathlib import Path

    p = Path(
        "/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/"
        "ni_mc_mp_20kv_uint8_gzip_opts9.h5"
    )
    if not p.exists():
        pytest.skip("reference data not available")
    return p


class TestLoadedSignal:
    def test_scan_attributes(self, nickel):
        assert nickel.navigation_shape == (3, 3)
        assert nickel.signal_shape == (60, 60)
        assert nickel.static_background is not None
        assert nickel.detector.navigation_shape == (3, 3)
        assert nickel.xmap is not None and nickel.xmap.size == 9
        np.testing.assert_allclose(
            nickel.detector.pc_average, [0.425, 0.213, 0.501], atol=0.01
        )

    def test_master_pattern(self, master):
        assert master.signal_shape == (401, 401)
        assert master.phase.space_group == 225
        assert master.hemisphere == "both"


@pytest.mark.slow
class TestEndToEndDI:
    def test_dictionary_indexing_recovers_orientations(self, nickel, master):
        s = nickel.remove_static_background()
        s = s.remove_dynamic_background()

        det = kp.detectors.EBSDDetector(
            shape=(60, 60),
            pc=nickel.detector.pc_average,
            sample_tilt=nickel.detector.sample_tilt,
        )
        rot = sample_fundamental_zone(4.0, "m-3m")
        dictionary = master.get_patterns(rot, det, dtype_out=np.float32)
        assert dictionary.data.shape == (rot.shape[0], 60, 60)

        signal_mask = ~np.asarray(
            Window("circular", shape=(60, 60)), dtype=bool
        )
        xmap = s.dictionary_indexing(
            dictionary, keep_n=10, signal_mask=signal_mask
        )

        scores = xmap.prop["scores"]
        assert scores.shape == (9, 10)
        # The reference's own DI benchmark reports mean top-NCC ~ 0.1887
        # at 6 deg sampling with a circular mask
        # (/root/reference/benchmarks/indexing/test_dictionary_indexing.py
        # :54-63); at 4 deg with the average PC we land slightly higher.
        assert scores[:, 0].min() > 0.15
        assert scores[:, 0].mean() > 0.2
        # Descending scores
        assert np.all(np.diff(scores, axis=1) <= 1e-6)

        # Indexed orientations within ~2x dictionary resolution of the
        # stored (reference-produced) orientations.
        stored = nickel.xmap.best_rotations
        got = xmap.best_rotations
        ang = np.degrees(disorientation_angle(stored, got, "m-3m"))
        assert ang.max() < 8.0, ang

    def test_fused_projection_di_matches_materialized(self, nickel, master):
        """The virtual-dictionary path (project_fn fused into the DI
        loop) must agree with materializing the dictionary first."""
        from kikuchipy_tpu.indexing.di import dictionary_index

        s = nickel.remove_static_background().remove_dynamic_background()
        det = kp.detectors.EBSDDetector(
            shape=(60, 60),
            pc=nickel.detector.pc_average,
            sample_tilt=nickel.detector.sample_tilt,
        )
        rot = sample_fundamental_zone(8.0, "m-3m")
        dictionary = master.get_patterns(rot, det, dtype_out=np.float32)

        materialized = dictionary_index(
            np.asarray(s.data), dictionary=dictionary.data, keep_n=5
        )
        fused = dictionary_index(
            np.asarray(s.data),
            project_fn=master.projector(det),
            rotations=rot,
            keep_n=5,
            n_per_iteration=512,
        )
        np.testing.assert_array_equal(
            fused.simulation_indices, materialized.simulation_indices
        )
        np.testing.assert_allclose(
            fused.scores, materialized.scores, atol=1e-5
        )


@pytest.mark.slow
class TestMultiPhaseWorkflow:
    def test_merge_prefers_correct_phase(self, nickel, master):
        """Two-phase indexing: the real (fcc Ni, dynamical) dictionary
        versus a kinematically simulated hexagonal alpha-Ti dictionary.
        The merged map must pick the Ni phase at every point. Exercises
        simulator -> as_lambert -> projector -> DI -> merge across
        modules."""
        from kikuchipy_tpu.crystallography.crystal_map import Phase, PhaseList
        from kikuchipy_tpu.crystallography.reciprocal import (
            Lattice,
            ReciprocalLatticeVectors,
        )
        from kikuchipy_tpu.indexing.merge import merge_crystal_maps
        from kikuchipy_tpu.indexing.osm import orientation_similarity_map
        from kikuchipy_tpu.simulation import KikuchiPatternSimulator

        s = nickel.remove_static_background().remove_dynamic_background()
        det = kp.detectors.EBSDDetector(
            shape=(60, 60), pc=nickel.detector.pc_average,
            sample_tilt=nickel.detector.sample_tilt,
        )
        mask = ~np.asarray(Window("circular", shape=(60, 60)), dtype=bool)

        rot_fcc = sample_fundamental_zone(4.0, "m-3m")
        d_ni = master.get_patterns(rot_fcc, det, dtype_out=np.float32)
        d_ni.xmap.phases = PhaseList(Phase("ni", space_group=225))

        # Kinematical alpha-Ti master pattern -> Lambert -> dictionary.
        lat = Lattice(2.95, 2.95, 4.68, 90, 90, 120)
        rlv = ReciprocalLatticeVectors.from_min_dspacing(lat, 1.2)
        rlv.calculate_structure_factor(
            [("ti", 1 / 3, 2 / 3, 0.25), ("ti", 2 / 3, 1 / 3, 0.75)]
        )
        rlv.calculate_theta(20.0)
        sim = KikuchiPatternSimulator(
            rlv.allowed(), phase=Phase("ti", space_group=194)
        )
        mp_ti = sim.calculate_master_pattern(
            half_size=200, hemisphere="both"
        ).as_lambert()
        rot_hex = sample_fundamental_zone(4.0, "6/mmm")
        d_ti = mp_ti.get_patterns(rot_hex, det, dtype_out=np.float32)
        d_ti.xmap.phases = PhaseList(Phase("ti", space_group=194))

        xmap_ni = s.dictionary_indexing(d_ni, keep_n=5, signal_mask=mask)
        xmap_ti = s.dictionary_indexing(d_ti, keep_n=5, signal_mask=mask)
        # Compare by best score: the correct phase has a sharp top-1
        # peak, while a wrong phase's scores form a flat plateau (its
        # top-5 mean can exceed the correct phase's).
        merged = merge_crystal_maps([xmap_ni, xmap_ti], mean_n_best=1)

        np.testing.assert_array_equal(merged.phase_id, np.zeros(9))
        assert merged.phases.names[0] == "ni"
        np.testing.assert_allclose(
            merged.prop["scores"], xmap_ni.prop["scores"]
        )
        # Merged OSM works on the merged (offset-unique) indices.
        osm = orientation_similarity_map(
            merged, simulation_indices_prop="merged_simulation_indices",
            n_best=5,
        )
        assert osm.shape == (3, 3)


class TestProjectionReferenceGoldens:
    """Projection goldens from the reference's own test suite
    (/root/reference/tests/test_signals/test_ebsd_master_pattern.py)."""

    def test_detector_azimuthal_means(self, master):
        # :374-397: identity rotation on a (480, 640) EMsoft4-convention
        # detector; azimuthal +-10 deg shifts the mean uint8 intensity
        # to 43.39 / 43.56.
        import dataclasses

        det = kp.detectors.EBSDDetector(
            shape=(480, 640),
            px_size=50,
            pc=(20, 20, 15000),
            convention="emsoft4",
            tilt=10,
        )
        det2 = dataclasses.replace(det, azimuthal=10.0, pc=det.pc.copy())
        det3 = dataclasses.replace(det, azimuthal=-10.0, pc=det.pc.copy())
        identity = np.array([[1.0, 0.0, 0.0, 0.0]])
        kwargs = {"energy": 20, "dtype_out": np.uint8}
        sim1 = master.get_patterns(identity, det, **kwargs)
        sim2 = master.get_patterns(identity, det2, **kwargs)
        sim3 = master.get_patterns(identity, det3, **kwargs)
        assert not np.allclose(
            np.asarray(sim1.data), np.asarray(sim2.data)
        )
        assert np.isclose(np.asarray(sim2.data).mean(), 43.39, atol=1e-2)
        assert np.isclose(np.asarray(sim3.data).mean(), 43.56, atol=1e-2)

    def test_master_pattern_intensity_goldens(self, master):
        # :640-653: rescale to float32 gives [-1, 1]; normalize gives
        # min/max [-1.33, 5.93] on the upper-hemisphere stereographic
        # master pattern. Our fixture is the Lambert one; load the
        # stereographic projection directly.
        mp = kp.load(
            "/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/"
            "ni_mc_mp_20kv_uint8_gzip_opts9.h5",
        )
        r = mp.rescale_intensity(dtype_out=np.float32)
        assert np.allclose(
            [np.asarray(r.data).min(), np.asarray(r.data).max()],
            [-1.0, 1.0],
        )
        n = mp.change_dtype("float32").normalize_intensity()
        assert np.allclose(
            [np.asarray(n.data).min(), np.asarray(n.data).max()],
            [-1.33, 5.93],
            atol=1e-2,
        )


class TestReferenceBenchmarkParity:
    """The reference's own DI benchmark criterion reproduced end to end
    (/root/reference/benchmarks/indexing/test_dictionary_indexing.py):
    cubochoric 6-degree m-3m sampling (orix's grid; 3557 orientations,
    the docstring's "about 3600"), projection through a (0.42, 0.22,
    0.50) detector, circular mask, keep_n=1 — mean top NCC must hit the
    reference's asserted 0.1887 +- 1e-4."""

    def test_mean_top_ncc_matches_reference_benchmark(self, nickel, master):
        from kikuchipy_tpu.crystallography.sampling import (
            get_sample_fundamental,
        )

        rot = get_sample_fundamental(6.0, "m-3m")
        assert 3400 <= rot.shape[0] <= 3800  # "about 3600"
        s = nickel.remove_static_background().remove_dynamic_background()
        det = kp.detectors.EBSDDetector(
            shape=(60, 60), pc=(0.42, 0.22, 0.50), sample_tilt=70
        )
        dic = master.get_patterns(rot, det, energy=20)
        mask = ~np.asarray(Window("circular", (60, 60)), dtype=bool)
        xmap = s.dictionary_indexing(dic, keep_n=1, signal_mask=mask)
        assert np.isclose(
            np.mean(xmap.prop["scores"]), 0.1887, atol=1e-4
        )


class TestCropProjectionConsistency:
    def test_cropped_detector_projects_slice(self, master):
        # Reference test_crop_simulated (:511-523): projecting through
        # a cropped detector must equal slicing the full projection.
        import h5py

        with h5py.File(
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        ) as f:
            g = f["Scan 1/EBSD/CrystalMap/crystal_map/data"]
            eul = np.stack([g["phi1"][:], g["Phi"][:], g["phi2"][:]], -1)
        from kikuchipy_tpu.geometry import quaternion as Q

        rot = np.asarray(Q.from_euler(eul))
        det = kp.detectors.EBSDDetector(
            shape=(60, 60), pc=(0.42, 0.22, 0.50), sample_tilt=70
        )
        det2 = det.crop((0, 50, 20, 60))
        # dtype_out == master dtype skips the per-pattern rescale, so
        # the cropped projection must equal the sliced full projection
        # exactly (rescaled outputs differ slightly: min/max are taken
        # over different pixel sets).
        kwds = {"energy": 20, "dtype_out": np.uint8}
        sim1 = master.get_patterns(rot, det, **kwds)
        sim2 = master.get_patterns(rot, det2, **kwds)
        np.testing.assert_array_equal(
            np.asarray(sim2.data), np.asarray(sim1.data)[:, :50, 20:60]
        )
        assert np.asarray(sim2.data).shape == (9, 50, 40)
