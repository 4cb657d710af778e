"""Multi-chip refinement: map points data-parallel over the ``scan``
mesh axis.

The batched refinement objectives (orientation, projection center, and
joint) are elementwise over map points — solver state is per point —
so partitioning is pure data parallelism: inputs are placed with a
``P("scan")`` sharding and GSPMD partitions the whole batched-solver
program with no collectives in the hot loop (the reference has no
distributed backend at all, SURVEY.md §2.12).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "sharded_refine_orientation",
    "sharded_refine_projection_center",
    "sharded_refine_orientation_projection_center",
]


def _sharded_refine(
    refine_fn,
    signal,
    xmap=None,
    detector=None,
    master_pattern=None,
    energy: float | None = None,
    mesh: Mesh | None = None,
    **kwargs,
):
    """Run ``refine_fn`` (one of the three refinement modes) with the
    experimental patterns and start orientations sharded over the
    mesh's ``scan`` axis.

    Map points are padded to a multiple of the scan-axis size, the
    padded arrays are committed to a ``P("scan")`` sharding, and the
    standard jitted refinement program runs partitioned; results
    (rotations, scores, per-point PCs for the PC/joint modes) are
    unpadded on the way out.
    """
    import dataclasses

    from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
    from kikuchipy_tpu.parallel.mesh import make_mesh
    from kikuchipy_tpu.signals.ebsd import EBSD

    if mesh is None:
        mesh = make_mesh()
    n_scan = mesh.shape["scan"]

    xmap = xmap if xmap is not None else signal.xmap
    n = signal.navigation_size
    pad = (-n) % n_scan

    data = np.asarray(signal.data).reshape((n,) + signal.signal_shape)
    q0 = np.asarray(xmap.best_rotations)
    if pad:
        data = np.concatenate([data, np.repeat(data[:1], pad, axis=0)])
        q0 = np.concatenate([q0, np.repeat(q0[:1], pad, axis=0)])

    sharding = NamedSharding(mesh, P("scan"))
    data_sharded = jax.device_put(jnp.asarray(data), sharding)

    det = detector if detector is not None else signal.detector
    if det is not None and det.navigation_size not in (1, n + pad):
        # Per-point PCs must pad with the patterns.
        pc = det.pc.reshape(-1, 3)
        if pc.shape[0] != n:
            raise ValueError(
                f"detector has {pc.shape[0]} PCs for {n} map points"
            )
        if pad:
            pc = np.concatenate([pc, np.repeat(pc[:1], pad, axis=0)])
        det = dataclasses.replace(det, pc=pc)
    detector = det

    padded_signal = EBSD(
        data=data_sharded,
        detector=det,
        static_background=signal.static_background,
    )
    padded_xmap = CrystalMap(
        rotations=q0, shape=(n + pad,), phases=xmap.phases
    )
    res = refine_fn(
        padded_signal,
        xmap=padded_xmap,
        detector=detector,
        master_pattern=master_pattern,
        energy=energy,
        **kwargs,
    )

    out = res.xmap
    trimmed_xmap = CrystalMap(
        rotations=np.asarray(out.rotations)[:n],
        phase_id=np.asarray(xmap.phase_id),
        shape=signal.navigation_shape,
        prop={k: np.asarray(v)[:n] for k, v in out.prop.items()},
        phases=out.phases,
    )
    det_out = res.detector
    if det_out is not None and det_out.navigation_size == n + pad:
        # PC/joint modes return one PC per (padded) point: trim the
        # padding and restore the navigation shape UNCONDITIONALLY —
        # gating on `pad` would make the returned pc's shape depend on
        # whether the scan size happened to divide the mesh.
        nav_shape = signal.navigation_shape
        pc = np.asarray(det_out.pc).reshape(-1, 3)[:n]
        det_out = dataclasses.replace(
            det_out,
            pc=pc.reshape(
                nav_shape + (3,) if len(nav_shape) == 2 else (-1, 3)
            ),
        )
    return dataclasses.replace(res, xmap=trimmed_xmap, detector=det_out)


def sharded_refine_orientation(signal, **kwargs):
    """:func:`~kikuchipy_tpu.indexing.refinement.refine_orientation`
    scan-sharded over the mesh (see :func:`_sharded_refine`)."""
    from kikuchipy_tpu.indexing.refinement import refine_orientation

    return _sharded_refine(refine_orientation, signal, **kwargs)


def sharded_refine_projection_center(signal, **kwargs):
    """:func:`~kikuchipy_tpu.indexing.refinement.
    refine_projection_center` scan-sharded over the mesh; per-point
    refined PCs come back unpadded."""
    from kikuchipy_tpu.indexing.refinement import refine_projection_center

    return _sharded_refine(refine_projection_center, signal, **kwargs)


def sharded_refine_orientation_projection_center(signal, **kwargs):
    """:func:`~kikuchipy_tpu.indexing.refinement.
    refine_orientation_projection_center` scan-sharded over the mesh."""
    from kikuchipy_tpu.indexing.refinement import (
        refine_orientation_projection_center,
    )

    return _sharded_refine(
        refine_orientation_projection_center, signal, **kwargs
    )
