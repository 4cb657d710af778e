"""Worker process for the TRUE two-process multihost test.

Launched by ``tests/test_parallel.py::TestMultihostTwoProcess`` (and by
``__graft_entry__.dryrun_multichip``'s optional 2-process leg): each
worker initializes ``jax.distributed`` against a shared local
coordinator, owns 4 virtual CPU devices (8 global across 2 processes),
reads only ITS host slice of a deterministic synthetic scan, and runs
:func:`kikuchipy_tpu.parallel.multihost.multihost_dictionary_index`.
The parent compares the per-host blocks (and the all-gathered copy)
against the single-process result bit-for-bit.

The scan size (37) is chosen to NOT divide the process count so the
remainder/padding path of ``multihost_dictionary_index`` is exercised:
host 0 holds 19 patterns + 1 pad row, host 1 holds 18 + 2.
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import numpy as np

    from kikuchipy_tpu.parallel.multihost import (
        host_navigation_slice,
        multihost_dictionary_index,
        multihost_mesh,
    )

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    rng = np.random.default_rng(0)
    n_total, m, d = 37, 120, 64
    exp = rng.normal(size=(n_total, d)).astype(np.float32)
    dic = np.concatenate(
        [rng.normal(size=(m - n_total, d)).astype(np.float32), exp]
    )

    sl = host_navigation_slice(n_total)
    mesh = multihost_mesh(n_dict_local=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "scan": 2 * nproc,
        "dict": 2,
    }

    scores, idx = multihost_dictionary_index(
        exp[sl], dic, keep_n=5, mesh=mesh, n_total=n_total
    )
    np.savez(
        os.path.join(outdir, f"out_{pid}.npz"),
        scores=scores,
        idx=idx,
        start=sl.start,
        stop=sl.stop,
    )

    if pid == 0:
        # The single-device expectation, computed in the SAME runtime
        # configuration (f32, no pytest x64) so the comparison is
        # bit-exact even among near-tied scores.
        from kikuchipy_tpu.indexing.di import dictionary_index

        ref = dictionary_index(exp, dictionary=dic, keep_n=5)
        np.savez(
            os.path.join(outdir, "expected.npz"),
            scores=ref.scores,
            idx=ref.simulation_indices,
        )

    # gather_results: every host must end up with the full map (DCN
    # all-gather of the compact top-k blocks only).
    s_all, i_all = multihost_dictionary_index(
        exp[sl],
        dic,
        keep_n=5,
        mesh=mesh,
        n_total=n_total,
        gather_results=True,
    )
    np.savez(
        os.path.join(outdir, f"gathered_{pid}.npz"), scores=s_all, idx=i_all
    )

    # ---- Multihost refinement leg (VERDICT r4 item 5) ----
    # Host-major DP: each host refines its host_navigation_slice block
    # on its own local devices (zero DCN in the optimization); pid 0
    # additionally recomputes BOTH blocks locally with the identical
    # program/mesh so the parent can assert bit-identity.
    import dataclasses

    import kikuchipy_tpu as kp
    from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
    from kikuchipy_tpu.geometry import quaternion as quat
    from kikuchipy_tpu.parallel.multihost import multihost_refine_orientation
    from kikuchipy_tpu.parallel.refine import sharded_refine_orientation
    from kikuchipy_tpu.signals.ebsd import EBSD
    import jax.numpy as jnp
    from jax.sharding import Mesh

    raw = kp.data.nickel_ebsd_small()
    s0 = raw.remove_static_background().remove_dynamic_background()
    base = np.asarray(s0.data).reshape(9, 60, 60)
    stored = np.asarray(raw.xmap.best_rotations)
    n_ref_total = 13  # not divisible by 2: exercises unequal blocks
    scan = np.tile(base, (2, 1, 1))[:n_ref_total]
    truth = np.tile(stored, (2, 1))[:n_ref_total]
    rng2 = np.random.default_rng(1)
    axes = rng2.normal(size=(n_ref_total, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    dq = np.asarray(quat.from_axis_angle(jnp.asarray(axes), np.deg2rad(1.5)))
    starts = np.asarray(quat.multiply(jnp.asarray(dq), jnp.asarray(truth)))

    mp_pat = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    det = dataclasses.replace(
        raw.detector, pc=raw.detector.pc_average.reshape(1, 3)
    )
    kw = dict(
        master_pattern=mp_pat, energy=20, method="lm", max_iters=5,
        trust_region=[4, 4, 4], nav_chunk=None,
    )

    sl_r = host_navigation_slice(n_ref_total)
    sig_local = EBSD(data=scan[sl_r], detector=det)
    xmap_local = CrystalMap(
        rotations=starts[sl_r], shape=(sl_r.stop - sl_r.start,)
    )
    res = multihost_refine_orientation(
        sig_local, xmap=xmap_local, detector=det, n_total=n_ref_total, **kw
    )
    np.savez(
        os.path.join(outdir, f"refine_{pid}.npz"),
        rot=np.asarray(res.xmap.best_rotations),
        scores=np.asarray(res.xmap.prop["scores"]),
        start=sl_r.start,
        stop=sl_r.stop,
    )

    # gather_results leg: every host assembles the identical full map
    # (DCN all-gather of the compact per-block results only).
    _, rot_all, scores_all, pcs_all = multihost_refine_orientation(
        sig_local, xmap=xmap_local, detector=det, n_total=n_ref_total,
        gather_results=True, **kw
    )
    assert pcs_all is None  # orientation mode: single-PC detector
    np.savez(
        os.path.join(outdir, f"refine_gathered_{pid}.npz"),
        rot=rot_all, scores=scores_all,
    )

    if pid == 0:
        # Expected: the same per-block program on this host's devices.
        local_mesh = Mesh(
            np.asarray(jax.local_devices()).reshape(-1, 1),
            axis_names=("scan", "dict"),
        )
        rots, scs = [], []
        for p in range(nproc):
            sl_p = host_navigation_slice(n_ref_total, p, nproc)
            sig_p = EBSD(data=scan[sl_p], detector=det)
            xmap_p = CrystalMap(
                rotations=starts[sl_p], shape=(sl_p.stop - sl_p.start,)
            )
            r = sharded_refine_orientation(
                sig_p, xmap=xmap_p, detector=det, mesh=local_mesh, **kw
            )
            rots.append(np.asarray(r.xmap.best_rotations))
            scs.append(np.asarray(r.xmap.prop["scores"]))
        np.savez(
            os.path.join(outdir, "refine_expected.npz"),
            rot=np.concatenate(rots),
            scores=np.concatenate(scs),
        )

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
