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
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
