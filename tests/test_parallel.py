"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax

from kikuchipy_tpu.indexing.di import dictionary_index
from kikuchipy_tpu.parallel.mesh import (
    make_mesh,
    sharded_dictionary_index,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    exp = rng.normal(size=(24, 60, 60)).astype(np.float32)
    dictionary = rng.normal(size=(160, 60, 60)).astype(np.float32)
    # Plant exact matches so top-1 indices are unambiguous
    dictionary[7] = exp[0]
    dictionary[100] = exp[5]
    return exp, dictionary


class TestMakeMesh:
    def test_default(self, devices):
        mesh = make_mesh()
        assert mesh.shape == {"scan": 8, "dict": 1}

    def test_2d(self, devices):
        mesh = make_mesh(n_scan=2, n_dict=4)
        assert mesh.shape == {"scan": 2, "dict": 4}

    def test_mismatch_raises(self, devices):
        with pytest.raises(ValueError, match="does not match"):
            make_mesh(n_scan=3, n_dict=3)


class TestShardedDI:
    @pytest.mark.parametrize("mesh_shape", [(8, 1), (1, 8), (2, 4), (4, 2)])
    def test_matches_single_device(self, devices, problem, mesh_shape):
        exp, dictionary = problem
        ref = dictionary_index(exp, dictionary=dictionary, keep_n=5)
        mesh = make_mesh(*mesh_shape)
        scores, idx = sharded_dictionary_index(
            exp, dictionary, keep_n=5, mesh=mesh
        )
        np.testing.assert_array_equal(idx, ref.simulation_indices)
        np.testing.assert_allclose(scores, ref.scores, atol=1e-5)

    @pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4)])
    def test_mixed_precision_matches_highest(self, devices, problem, mesh_shape):
        # bf16 candidate selection + local f32 rescore: top-1 indices and
        # scores must agree with the all-f32 path (planted exact matches
        # give an unambiguous winner; rescored scores are f32-exact).
        exp, dictionary = problem
        mesh = make_mesh(*mesh_shape)
        s_ref, i_ref = sharded_dictionary_index(
            exp, dictionary, keep_n=5, mesh=mesh
        )
        s_mix, i_mix = sharded_dictionary_index(
            exp, dictionary, keep_n=5, mesh=mesh, precision="mixed"
        )
        np.testing.assert_array_equal(i_mix[:, 0], i_ref[:, 0])
        np.testing.assert_allclose(s_mix[:, 0], s_ref[:, 0], atol=2e-6)

    @pytest.mark.parametrize("mesh_shape", [(8, 1), (1, 8), (2, 4)])
    def test_f16_approx_matches_single_device(self, devices, problem, mesh_shape):
        # The round-2 fast path (f16 materialization + transposed
        # group-compressed selection) plumbed through the mesh: the
        # sharded result must equal the SINGLE-DEVICE f16+approx result
        # (same tier per shard, deterministic group semantics) and the
        # exact path's top-1.
        exp, dictionary = problem
        ref_exact = dictionary_index(exp, dictionary=dictionary, keep_n=5)
        mesh = make_mesh(*mesh_shape)
        scores, idx = sharded_dictionary_index(
            exp, dictionary, keep_n=5, mesh=mesh, precision="f16",
            approx_topk=True,
        )
        # Group-compressed selection guarantees the exact top-1 and that
        # every returned candidate carries its true score (within f16
        # materialization rounding). Deep ranks may differ between group
        # decompositions on a 160-entry toy dictionary (5 groups), so
        # assert the invariants, not rank-for-rank equality.
        np.testing.assert_array_equal(idx[:, 0], ref_exact.simulation_indices[:, 0])

        def _prep(x):
            x = x.reshape(x.shape[0], -1).astype(np.float32)
            x = x - x.mean(axis=1, keepdims=True)
            return x / np.linalg.norm(x, axis=1, keepdims=True)

        sim = _prep(exp) @ _prep(dictionary).T
        true_scores = np.take_along_axis(sim, idx, axis=1)
        np.testing.assert_allclose(scores, true_scores, atol=5e-4)
        # Dict-replicated meshes shard nothing along dict, so the
        # per-shard group compression is identical to single-device:
        if mesh_shape[1] == 1:
            ref = dictionary_index(
                exp, dictionary=dictionary, keep_n=5, precision="f16",
                approx_topk=True,
            )
            np.testing.assert_array_equal(idx, ref.simulation_indices)
            np.testing.assert_allclose(scores, ref.scores, atol=1e-6)

    @pytest.mark.parametrize("precision", ["f16", "int8"])
    def test_prepared_dictionary_sharded(self, devices, problem, precision):
        # A PreparedDictionary (prepared + pre-quantized once) must flow
        # through the sharded path and agree with the raw-array path.
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        exp, dictionary = problem
        prep = prepare_dictionary(dictionary, quantize=(precision == "int8"))
        mesh = make_mesh(2, 4)
        s_raw, i_raw = sharded_dictionary_index(
            exp, dictionary, keep_n=5, mesh=mesh, precision=precision
        )
        s_prep, i_prep = sharded_dictionary_index(
            exp, prep, keep_n=5, mesh=mesh, precision=precision
        )
        np.testing.assert_array_equal(i_prep, i_raw)
        np.testing.assert_allclose(s_prep, s_raw, atol=1e-5)
        ref = dictionary_index(exp, dictionary=dictionary, keep_n=5)
        np.testing.assert_array_equal(
            i_prep[:, 0], ref.simulation_indices[:, 0]
        )

    def test_prepared_dictionary_mask_mismatch_raises(self, devices, problem):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        exp, dictionary = problem
        mask = np.zeros((60, 60), dtype=bool)
        mask[:10] = True  # exclude top rows at prepare time only
        prep = prepare_dictionary(dictionary, signal_mask=mask)
        mesh = make_mesh(2, 4)
        with pytest.raises(ValueError, match="signal_mask"):
            sharded_dictionary_index(exp, prep, keep_n=5, mesh=mesh)

    def test_padding_path(self, devices, problem):
        # 23 experimental patterns and 157 dictionary entries: neither
        # divides the mesh axes, exercising the padding logic.
        exp, dictionary = problem
        exp, dictionary = exp[:23], dictionary[:157]
        ref = dictionary_index(exp, dictionary=dictionary, keep_n=4)
        mesh = make_mesh(n_scan=4, n_dict=2)
        scores, idx = sharded_dictionary_index(
            exp, dictionary, keep_n=4, mesh=mesh
        )
        np.testing.assert_array_equal(idx, ref.simulation_indices)
        np.testing.assert_allclose(scores, ref.scores, atol=1e-5)

    def test_signal_mask(self, devices, problem):
        exp, dictionary = problem
        mask = np.zeros((60, 60), dtype=bool)
        mask[:10] = True
        ref = dictionary_index(
            exp, dictionary=dictionary, keep_n=3, signal_mask=mask
        )
        scores, idx = sharded_dictionary_index(
            exp, dictionary, keep_n=3, mesh=make_mesh(2, 4), signal_mask=mask
        )
        np.testing.assert_array_equal(idx, ref.simulation_indices)
        np.testing.assert_allclose(scores, ref.scores, atol=1e-5)


class TestShardedFusedDI:
    def test_matches_unsharded_fused(self, devices):
        """The fully fused sharded path (per-shard on-device dictionary
        projection + all_gather merge) must agree with the single-device
        fused path on the real master pattern."""
        from pathlib import Path

        import jax.numpy as jnp

        import kikuchipy_tpu as kp
        from kikuchipy_tpu.crystallography.sampling import (
            sample_fundamental_zone,
        )
        from kikuchipy_tpu.parallel.mesh import (
            sharded_fused_dictionary_index,
        )
        from kikuchipy_tpu.projection.master_pattern import (
            direction_cosines_from_detector,
        )

        mp_path = Path(
            "/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/"
            "ni_mc_mp_20kv_uint8_gzip_opts9.h5"
        )
        if not mp_path.exists():
            pytest.skip("reference data not available")
        mp = kp.load(mp_path, projection="lambert", hemisphere="both")
        det = kp.detectors.EBSDDetector(
            shape=(60, 60), pc=(0.42, 0.21, 0.5), sample_tilt=70
        )

        rot = sample_fundamental_zone(10.0, "m-3m")
        rot = rot[: (len(rot) // 8) * 8]
        nickel = kp.load(
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        )
        s = nickel.remove_static_background().remove_dynamic_background()
        exp = np.tile(
            np.asarray(s.data).reshape(9, -1).astype(np.float32), (2, 1)
        )[:16]

        master = mp._hemispheres_at_energy().astype(np.float32)
        dc = direction_cosines_from_detector(det)
        npy, npx = master.shape[-2:]
        scale = (npx - 1) / 2

        mesh = make_mesh(n_scan=2, n_dict=4)
        scores, idx = sharded_fused_dictionary_index(
            exp, rot, master, dc, npx, npy, scale, keep_n=5, mesh=mesh
        )

        ref = dictionary_index(
            exp,
            project_fn=lambda r: __import__(
                "kikuchipy_tpu.projection.master_pattern",
                fromlist=["project_patterns"],
            ).project_patterns(
                jnp.asarray(r, jnp.float32), dc, jnp.asarray(master),
                npx, npy, scale,
            ),
            rotations=rot,
            keep_n=5,
        )
        np.testing.assert_array_equal(idx, ref.simulation_indices)
        np.testing.assert_allclose(scores, ref.scores, atol=1e-5)


@pytest.mark.slow
class TestShardedRefinement:
    def test_matches_single_device(self):
        from pathlib import Path

        import dataclasses
        import kikuchipy_tpu as kp
        from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
        from kikuchipy_tpu.geometry import quaternion as quat
        import jax.numpy as jnp
        from kikuchipy_tpu.parallel import make_mesh, sharded_refine_orientation

        p = Path("/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5")
        if not p.exists():
            pytest.skip("reference data not available")
        raw = kp.load(p)
        s = raw.remove_static_background().remove_dynamic_background()
        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        # Perturb so refinement has work to do.
        rng = np.random.default_rng(3)
        axes = rng.normal(size=(9, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        dq = np.asarray(quat.from_axis_angle(jnp.asarray(axes), np.deg2rad(1.5)))
        q0 = np.asarray(
            quat.multiply(jnp.asarray(dq), jnp.asarray(raw.xmap.best_rotations))
        )
        xmap0 = CrystalMap(rotations=q0, shape=(3, 3), phases=raw.xmap.phases)

        single = s.refine_orientation(
            xmap=xmap0, detector=raw.detector, master_pattern=mp, max_iters=60
        )
        mesh = make_mesh(n_scan=8)
        sharded = sharded_refine_orientation(
            s, xmap=xmap0, detector=raw.detector, master_pattern=mp,
            mesh=mesh, max_iters=60,
        )
        # 9 points pad to 16 over 8 devices; results must agree.
        assert sharded.xmap.rotations.shape == (9, 4)
        np.testing.assert_allclose(
            np.abs(np.sum(sharded.xmap.best_rotations
                          * single.xmap.best_rotations, axis=1)),
            1.0, atol=1e-5,
        )
        np.testing.assert_allclose(
            sharded.xmap.prop["scores"], single.xmap.prop["scores"], atol=1e-4
        )

    def test_pc_and_joint_match_single_device(self):
        """PC and joint refinement are elementwise over map points too
        (per-point solver state): the scan-sharded programs must agree
        with single-device, including the per-point refined PCs coming
        back unpadded (9 points pad to 16 over 8 devices)."""
        from pathlib import Path

        import kikuchipy_tpu as kp
        from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
        from kikuchipy_tpu.parallel import make_mesh
        from kikuchipy_tpu.parallel.refine import (
            sharded_refine_orientation_projection_center,
            sharded_refine_projection_center,
        )

        p = Path("/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5")
        if not p.exists():
            pytest.skip("reference data not available")
        raw = kp.load(p)
        s = raw.remove_static_background().remove_dynamic_background()
        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        xmap0 = CrystalMap(
            rotations=np.asarray(raw.xmap.best_rotations), shape=(3, 3),
            phases=raw.xmap.phases,
        )
        mesh = make_mesh(n_scan=8)
        kw = dict(
            xmap=xmap0, detector=raw.detector, master_pattern=mp,
            max_iters=40, method="lm",
        )

        single_pc = s.refine_projection_center(**kw)
        sharded_pc = sharded_refine_projection_center(s, mesh=mesh, **kw)
        pc_a = np.asarray(sharded_pc.detector.pc).reshape(-1, 3)
        pc_b = np.asarray(single_pc.detector.pc).reshape(-1, 3)
        assert pc_a.shape == (9, 3)
        np.testing.assert_allclose(pc_a, pc_b, atol=1e-5)

        single_j = s.refine_orientation_projection_center(**kw)
        sharded_j = sharded_refine_orientation_projection_center(
            s, mesh=mesh, **kw
        )
        assert sharded_j.xmap.rotations.shape == (9, 4)
        np.testing.assert_allclose(
            np.abs(np.sum(sharded_j.xmap.best_rotations
                          * single_j.xmap.best_rotations, axis=1)),
            1.0, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sharded_j.detector.pc).reshape(-1, 3),
            np.asarray(single_j.detector.pc).reshape(-1, 3),
            atol=1e-5,
        )


class TestMultihost:
    """Multi-host driver exercised in single-process mode (the 8
    virtual devices act as one host's local devices; process_count=1).
    Real DCN layouts differ only in the device->host map."""

    def test_host_navigation_slice_partition(self):
        from kikuchipy_tpu.parallel.multihost import host_navigation_slice

        # Every pattern assigned exactly once, contiguous host-major.
        for n_total, n_proc in [(100, 4), (9, 2), (7, 8), (75 * 55, 16)]:
            stops = []
            covered = 0
            for p in range(n_proc):
                sl = host_navigation_slice(n_total, p, n_proc)
                assert sl.start == covered
                covered = sl.stop
                stops.append(sl.stop)
            assert covered == n_total

        with pytest.raises(ValueError):
            host_navigation_slice(10, 5, 4)

    def test_multihost_mesh_shapes(self, devices):
        from kikuchipy_tpu.parallel.multihost import multihost_mesh

        mesh = multihost_mesh()
        assert mesh.shape == {"scan": 8, "dict": 1}
        mesh = multihost_mesh(n_dict_local=4)
        assert mesh.shape == {"scan": 2, "dict": 4}
        with pytest.raises(ValueError):
            multihost_mesh(n_dict_local=3)

    @pytest.mark.parametrize("n_dict_local", [1, 2, 4])
    def test_matches_single_device(self, devices, problem, n_dict_local):
        from kikuchipy_tpu.parallel.multihost import (
            host_navigation_slice,
            multihost_dictionary_index,
            multihost_mesh,
        )

        exp, dictionary = problem
        sl = host_navigation_slice(exp.shape[0])
        assert (sl.start, sl.stop) == (0, exp.shape[0])  # 1 process

        mesh = multihost_mesh(n_dict_local=n_dict_local)
        scores, idx = multihost_dictionary_index(
            exp[sl], dictionary, keep_n=5, mesh=mesh
        )
        ref = dictionary_index(exp, dictionary, keep_n=5)
        np.testing.assert_array_equal(idx, np.asarray(ref.simulation_indices))
        np.testing.assert_allclose(
            scores, np.asarray(ref.scores), rtol=0, atol=2e-6
        )
        assert idx[0, 0] == 7 and idx[5, 0] == 100

    def test_uneven_scan_and_dict_padding(self, devices):
        from kikuchipy_tpu.parallel.multihost import (
            multihost_dictionary_index,
            multihost_mesh,
        )

        rng = np.random.default_rng(1)
        exp = rng.normal(size=(13, 16, 16)).astype(np.float32)  # 13 % 8 != 0
        dictionary = rng.normal(size=(21, 16, 16)).astype(np.float32)
        dictionary[3] = exp[2]
        mesh = multihost_mesh(n_dict_local=2)  # 21 % 2 != 0 -> dict pad
        scores, idx = multihost_dictionary_index(
            exp, dictionary, keep_n=4, mesh=mesh
        )
        ref = dictionary_index(exp, dictionary, keep_n=4)
        np.testing.assert_array_equal(idx, np.asarray(ref.simulation_indices))
        np.testing.assert_allclose(
            scores, np.asarray(ref.scores), rtol=0, atol=2e-6
        )
        assert idx[2, 0] == 3


class TestMultiPhaseShardedDI:
    """BASELINE config 5 shape: two phases indexed with the dictionary
    axis sharded over the mesh, then merged into a multi-phase map with
    merge_crystal_maps — verified identical to the single-device path
    on the virtual 8-device mesh."""

    def test_two_phase_sharded_merge(self, devices):
        from kikuchipy_tpu.crystallography.crystal_map import (
            CrystalMap,
            Phase,
            PhaseList,
        )
        from kikuchipy_tpu.crystallography.sampling import super_fibonacci
        from kikuchipy_tpu.indexing.merge import merge_crystal_maps

        rng = np.random.default_rng(11)
        n, d, m = 24, 16 * 16, 96
        exp = rng.normal(size=(n, 16, 16)).astype(np.float32)
        dict_a = rng.normal(size=(m, 16, 16)).astype(np.float32)
        dict_b = rng.normal(size=(m, 16, 16)).astype(np.float32)
        # Make phase A clearly win the first half of the scan and B the
        # second half by embedding the experimental patterns.
        dict_a[:12] = exp[:12] + 0.05 * dict_a[:12]
        dict_b[:12] = exp[12:] + 0.05 * dict_b[:12]
        rot_a = super_fibonacci(m)
        rot_b = super_fibonacci(m)

        mesh = make_mesh(2, 4)

        def index_phase(dic, rot, name, sg):
            scores, idx = sharded_dictionary_index(exp, dic, keep_n=4, mesh=mesh)
            ref = dictionary_index(exp, dictionary=dic, keep_n=4)
            np.testing.assert_array_equal(idx, ref.simulation_indices)
            np.testing.assert_allclose(scores, ref.scores, atol=1e-5)
            return CrystalMap(
                rotations=rot[idx],
                shape=(n,),
                prop={"scores": scores, "simulation_indices": idx},
                phases=PhaseList(Phase(name, space_group=sg)),
            )

        xmap_a = index_phase(dict_a, rot_a, "a", 225)
        xmap_b = index_phase(dict_b, rot_b, "b", 194)
        merged = merge_crystal_maps([xmap_a, xmap_b])
        assert (merged.phase_id[:12] == 0).all()
        assert (merged.phase_id[12:] == 1).all()
        assert merged.phases.names == ["a", "b"]


class TestMultihostTwoProcess:
    """TRUE multi-process validation: two jax.distributed processes (4
    virtual CPU devices each, 8 global) run multihost_dictionary_index
    on their host slices; per-host blocks and the gathered copy must be
    bit-identical to the single-process result (VERDICT r1 item 3)."""

    @pytest.mark.slow
    def test_two_process_matches_single(self, tmp_path):
        import socket
        import subprocess
        import sys
        from pathlib import Path

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        worker = Path(__file__).parent / "_multihost_worker.py"
        env = os.environ.copy()
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        repo_root = str(Path(__file__).parent.parent)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", str(port),
                 str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, err = p.communicate(timeout=300)
                outs.append((p.returncode, out, err))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for rc, out, err in outs:
            assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"

        # Single-device expectation computed by worker 0 in the same
        # runtime configuration (bit-exact comparison; pytest's x64
        # flag would reorder near-tied scores).
        z = np.load(tmp_path / "expected.npz")
        exp_scores, exp_idx = z["scores"], z["idx"]

        blocks = []
        for pid in range(2):
            z = np.load(tmp_path / f"out_{pid}.npz")
            n_block = int(z["stop"]) - int(z["start"])
            assert z["scores"].shape[0] == n_block
            blocks.append((int(z["start"]), z["scores"], z["idx"]))
        blocks.sort()
        scores = np.concatenate([b[1] for b in blocks])
        idx = np.concatenate([b[2] for b in blocks])
        np.testing.assert_array_equal(idx, exp_idx)
        np.testing.assert_allclose(scores, exp_scores, atol=1e-5)

        # Both hosts' gathered copies hold the identical full map.
        for pid in range(2):
            z = np.load(tmp_path / f"gathered_{pid}.npz")
            np.testing.assert_array_equal(z["idx"], exp_idx)
            np.testing.assert_allclose(z["scores"], exp_scores, atol=1e-5)

        # Multihost refinement (VERDICT r4 item 5): per-host blocks must
        # be BIT-identical to the same per-block LM program run
        # single-process (host-major DP has zero cross-host coupling).
        ref = np.load(tmp_path / "refine_expected.npz")
        rblocks = []
        for pid in range(2):
            z = np.load(tmp_path / f"refine_{pid}.npz")
            rblocks.append((int(z["start"]), z["rot"], z["scores"]))
        rblocks.sort()
        np.testing.assert_array_equal(
            np.concatenate([b[1] for b in rblocks]), ref["rot"]
        )
        np.testing.assert_array_equal(
            np.concatenate([b[2] for b in rblocks]), ref["scores"]
        )

        # Both hosts' gathered refinement copies hold the full map.
        for pid in range(2):
            z = np.load(tmp_path / f"refine_gathered_{pid}.npz")
            np.testing.assert_array_equal(z["rot"], ref["rot"])
            np.testing.assert_array_equal(z["scores"], ref["scores"])
