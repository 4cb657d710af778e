"""Multi-host (multi-process) dictionary indexing over DCN + ICI.

The reference is strictly single-process (SURVEY.md §2.12); this module
is the TPU-native scale-out path for pod slices spanning several hosts:

- The **scan axis is host-major data parallelism**: each host reads only
  its own contiguous slice of the navigation grid from disk
  (:func:`host_navigation_slice`) and contributes it to one global
  device array with :func:`jax.make_array_from_process_local_data` — no
  pattern ever crosses the host boundary, so the NCC matmul runs
  entirely on-chip with **zero DCN traffic**.
- The **dict axis stays within a host** (ICI): the dictionary is
  replicated per host and sharded over each host's local devices; the
  per-shard top-k candidates merge with an ``all_gather`` that rides
  ICI only.
- Results come back per host (each host's slice of the score /
  simulation-index arrays), or globally with
  ``jax.experimental.multihost_utils.process_allgather`` when every
  host needs the full map.

Single-process runs (tests, one-host TPU slices) degenerate cleanly:
``process_count == 1`` makes the host slice the whole scan and the mesh
identical to :func:`kikuchipy_tpu.parallel.mesh.make_mesh`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kikuchipy_tpu.parallel.mesh import sharded_match_topk

__all__ = [
    "host_navigation_slice",
    "multihost_mesh",
    "multihost_dictionary_index",
    "multihost_refine_orientation",
]


def host_navigation_slice(
    n_total: int,
    process_index: int | None = None,
    process_count: int | None = None,
) -> slice:
    """This host's contiguous slice of the flattened navigation axis.

    Patterns are distributed host-major in equal contiguous blocks (the
    last host takes the remainder), so each host can read its block
    straight from the scan file (h5py/memmap) without coordination.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if not 0 <= process_index < process_count:
        raise ValueError(
            f"process_index {process_index} outside [0, {process_count})"
        )
    per_host = -(-n_total // process_count)  # ceil
    start = min(process_index * per_host, n_total)
    stop = min(start + per_host, n_total)
    return slice(start, stop)


def multihost_mesh(n_dict_local: int | None = None) -> Mesh:
    """A ``("scan", "dict")`` mesh laid out host-major on ``scan``.

    The ``scan`` (data-parallel) axis spans hosts — its collectives (none
    in the DI hot path) would ride DCN — while the ``dict`` axis is
    entirely within each host so the top-k ``all_gather`` stays on ICI.

    Parameters
    ----------
    n_dict_local
        Devices per host given to the ``dict`` axis (must divide the
        local device count). Default 1: all-device data parallelism,
        dictionary replicated.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if n_dict_local is None:
        n_dict_local = 1
    if n_local % n_dict_local:
        raise ValueError(
            f"n_dict_local {n_dict_local} must divide the local device "
            f"count {n_local}"
        )
    n_scan_local = n_local // n_dict_local
    # jax.devices() orders devices process-major, so reshaping to
    # (hosts * scan_local, dict_local) keeps each row's dict axis within
    # one host and stacks hosts along scan.
    dev = np.asarray(jax.devices()).reshape(
        n_proc * n_scan_local, n_dict_local
    )
    return Mesh(dev, axis_names=("scan", "dict"))


def multihost_refine_orientation(
    local_signal,
    xmap=None,
    detector=None,
    master_pattern=None,
    energy: float | None = None,
    n_total: int | None = None,
    gather_results: bool = False,
    mode: str = "orientation",
    **kwargs,
):
    """Refine a host-distributed scan's orientations (VERDICT r4 item 5;
    SURVEY §2.12 multi-host plan).

    The refinement objective is ELEMENTWISE over map points — solver
    state (simplexes / LM damping) is per point — so the correct
    multihost layout is the same host-major data parallelism as
    :func:`multihost_dictionary_index` taken to its limit: each host
    refines only its own :func:`host_navigation_slice` block, sharded
    over its local devices
    (:func:`kikuchipy_tpu.parallel.refine.sharded_refine_orientation`),
    with ZERO cross-host traffic in the optimization. The only DCN
    communication is the optional final ``process_allgather`` of the
    compact results (quaternions + scores, ~24 bytes/point).

    Parameters
    ----------
    local_signal
        THIS host's :class:`EBSD` block (the
        :func:`host_navigation_slice` rows of the global scan).
    xmap
        This host's start orientations (same slice).
    n_total
        Global number of map points (required with
        ``gather_results=True`` when host blocks are unequal).
    gather_results
        If True, every host returns the full-map refined rotations and
        scores (assembled host-major); otherwise each host returns its
        own block's :class:`RefinementResult`.
    mode
        ``"orientation"`` (default), ``"pc"``, or ``"joint"`` — which
        refinement runs on each host's block (all three are elementwise
        over map points, so the host-major layout is identical).
    **kwargs
        Forwarded to the underlying refinement (method, projector,
        trust_region, ...).

    Returns
    -------
    RefinementResult or tuple
        With ``gather_results=False`` (default): this host's block's
        :class:`RefinementResult`. With ``gather_results=True``: the
        tuple ``(result, rotations (n_total, 4), scores (n_total,),
        pcs)`` where ``pcs`` is the assembled ``(n_total, 3)``
        per-point PC field for ``mode="pc"``/``"joint"`` and ``None``
        for ``mode="orientation"`` — the SAME arity regardless of the
        process count, so single-process smoke runs of multihost
        scripts unpack identically.
    """
    from kikuchipy_tpu.parallel import refine as _refine

    refine_fn = {
        "orientation": _refine.sharded_refine_orientation,
        "pc": _refine.sharded_refine_projection_center,
        "joint": _refine.sharded_refine_orientation_projection_center,
    }[mode]

    # Per-host mesh: the scan axis spans only this host's devices, so
    # the partitioned refinement program never emits a DCN collective.
    local_mesh = Mesh(
        np.asarray(jax.local_devices()).reshape(-1, 1),
        axis_names=("scan", "dict"),
    )
    res = refine_fn(
        local_signal,
        xmap=xmap,
        detector=detector,
        master_pattern=master_pattern,
        energy=energy,
        mesh=local_mesh,
        **kwargs,
    )
    if not gather_results:
        return res

    n_local = local_signal.navigation_size
    rot = np.asarray(res.xmap.best_rotations).reshape(-1, 4)
    scores = np.asarray(res.xmap.prop["scores"]).reshape(-1)
    det_res = res.detector
    pcs = (
        np.asarray(det_res.pc).reshape(-1, 3)
        if det_res is not None and det_res.navigation_size == n_local
        else None
    )

    n_proc = jax.process_count()
    if n_proc == 1:
        return res, rot, scores, pcs

    from jax.experimental import multihost_utils

    if n_total is None:
        n_total = n_local * n_proc
    per_host = -(-n_total // n_proc)
    pad = per_host - rot.shape[0]

    def _pad(a):
        if not pad:
            return a
        return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])

    # Gather the per-point PC field too: for mode="pc"/"joint" it IS
    # the primary output (the xmap rotations are unchanged in PC mode).
    payload = (_pad(rot), _pad(scores))
    if pcs is not None:
        payload = payload + (_pad(pcs),)
    gathered = multihost_utils.process_allgather(payload, tiled=False)
    rot_all = np.asarray(gathered[0]).reshape(n_proc, per_host, 4)
    scores_all = np.asarray(gathered[1]).reshape(n_proc, per_host)
    pcs_all = (
        np.asarray(gathered[2]).reshape(n_proc, per_host, 3)
        if pcs is not None
        else None
    )
    parts_r, parts_s, parts_p = [], [], []
    for p in range(n_proc):
        sl = host_navigation_slice(n_total, p, n_proc)
        k = sl.stop - sl.start
        parts_r.append(rot_all[p][:k])
        parts_s.append(scores_all[p][:k])
        if pcs_all is not None:
            parts_p.append(pcs_all[p][:k])
    return (
        res,
        np.concatenate(parts_r),
        np.concatenate(parts_s),
        np.concatenate(parts_p) if parts_p else None,
    )


def multihost_dictionary_index(
    local_patterns,
    dictionary,
    keep_n: int = 20,
    metric="ncc",
    mesh: Mesh | None = None,
    signal_mask: np.ndarray | None = None,
    n_total: int | None = None,
    gather_results: bool = False,
    precision: str = "highest",
    approx_topk: bool = False,
):
    """Index a scan distributed across hosts against a host-replicated
    dictionary.

    Parameters
    ----------
    local_patterns
        THIS host's patterns, ``(n_local, sy, sx)`` or ``(n_local, d)``
        — the :func:`host_navigation_slice` block of the global scan.
    dictionary
        Full dictionary, ``(m, sy, sx)`` or ``(m, d)``, identical on
        every host (each host projects or loads the whole dictionary).
    keep_n
        Top matches kept per pattern.
    mesh
        A ``("scan", "dict")`` mesh from :func:`multihost_mesh`.
    n_total
        Global number of patterns. Default: ``n_local * process_count``
        (exact when every host block is equal; pass explicitly when the
        last host holds a remainder).
    gather_results
        If True, all-gather the per-host results so every host returns
        the full ``(n_total, keep_n)`` arrays (DCN traffic: ~8 bytes *
        keep_n per pattern). Otherwise each host returns its own block.
    precision, approx_topk
        Per-shard match tier and transposed group-compressed selection,
        exactly as in :func:`kikuchipy_tpu.indexing.di.dictionary_index`
        (every shard runs the single-device fast path; see
        :func:`kikuchipy_tpu.parallel.mesh.sharded_match_topk`).
        ``dictionary`` may be a
        :class:`~kikuchipy_tpu.indexing.di.PreparedDictionary` to skip
        per-call preparation (and, for ``precision="int8"``, per-call
        quantization).

    Returns
    -------
    (scores, indices)
        This host's block (or the full arrays with
        ``gather_results=True``) as NumPy arrays.
    """
    from kikuchipy_tpu.indexing.di import PreparedDictionary
    from kikuchipy_tpu.indexing.metrics import get_metric, signal_mask_to_idx

    metric = get_metric(metric)
    if mesh is None:
        mesh = multihost_mesh()
    n_scan, n_dict = mesh.shape["scan"], mesh.shape["dict"]
    n_proc = jax.process_count()

    local_patterns = np.asarray(local_patterns)
    if local_patterns.ndim > 2:
        local_patterns = local_patterns.reshape(local_patterns.shape[0], -1)

    dict_q_np = dict_scale_np = None
    prepared_in = isinstance(dictionary, PreparedDictionary)
    if prepared_in:
        if dictionary.metric_name != metric.name:
            raise ValueError(
                f"PreparedDictionary was prepared with metric "
                f"{dictionary.metric_name!r}, requested {metric.name!r}"
            )
        if precision == "int8":
            q, s = dictionary.quantized_int8()
            dict_q_np = np.asarray(q)
            dict_scale_np = np.asarray(s)
        dictionary = jnp.asarray(dictionary.prepared)
    else:
        dictionary = jnp.asarray(dictionary)
        if dictionary.ndim > 2:
            dictionary = dictionary.reshape(dictionary.shape[0], -1)

    n_local, d = local_patterns.shape
    m = dictionary.shape[0]
    if n_total is None:
        n_total = n_local * n_proc

    # Pad so the global scan axis divides the mesh and every host holds
    # an equal block (make_array_from_process_local_data requires local
    # blocks consistent with the global sharding).
    if n_scan % n_proc:
        raise ValueError(
            f"scan mesh axis ({n_scan}) must be a multiple of the "
            f"process count ({n_proc})"
        )
    shard_rows = n_scan // n_proc  # scan shards per host
    per_host = -(-n_total // n_proc)
    per_host += (-per_host) % shard_rows
    pad_local = per_host - n_local
    if pad_local:
        local_patterns = np.concatenate(
            [
                local_patterns,
                np.zeros((pad_local, d), local_patterns.dtype),
            ],
            axis=0,
        )
    n_global = per_host * n_proc

    m_pad = (-m) % n_dict
    if m_pad:
        pad_rows = jnp.broadcast_to(dictionary[:1], (m_pad, d))
        dictionary = jnp.concatenate([dictionary, pad_rows], axis=0)
        if dict_q_np is not None:
            dict_q_np = np.concatenate(
                [dict_q_np, np.broadcast_to(dict_q_np[:1], (m_pad, d))],
                axis=0,
            )
            dict_scale_np = np.concatenate(
                [dict_scale_np, np.broadcast_to(dict_scale_np[:1], (m_pad,))]
            )

    exp_sharding = NamedSharding(mesh, P("scan", None))
    dict_sharding = NamedSharding(mesh, P("dict", None))

    # Host-local block -> one global array; each host feeds exactly the
    # shards it addresses (scan is host-major, so that's its own block).
    exp = jax.make_array_from_process_local_data(
        exp_sharding, local_patterns, (n_global, d)
    )
    # The dict axis lives within each host, so every process addresses
    # the full dictionary axis; local data = the whole dictionary.
    dct = jax.make_array_from_process_local_data(
        dict_sharding, np.asarray(dictionary), dictionary.shape
    )

    keep_idx = signal_mask_to_idx(signal_mask, d)
    keep_idx = None if keep_idx is None else jnp.asarray(keep_idx)
    exp_prepared = jax.jit(metric.prepare, out_shardings=exp_sharding)(
        exp, keep_idx
    )
    dict_prepared = jax.jit(metric.prepare, out_shardings=dict_sharding)(
        dct, keep_idx
    )

    keep_n_eff = min(keep_n, m)
    k_query = min(keep_n_eff + m_pad, m + m_pad) if m_pad else keep_n_eff
    scores, idx = sharded_match_topk(exp_prepared, dict_prepared, k_query, mesh)

    if gather_results and n_proc > 1:
        from jax.experimental import multihost_utils

        scores = np.asarray(multihost_utils.process_allgather(scores, tiled=True))
        idx = np.asarray(multihost_utils.process_allgather(idx, tiled=True))

        # Pad rows sit at the END OF EACH HOST BLOCK (each host padded
        # its local slice to per_host rows), not all at the global end:
        # strip per block, keeping each host's real row count.
        def _strip_host_padding(arr):
            blocks = arr.reshape(n_proc, per_host, -1)
            return np.concatenate(
                [
                    blocks[p][: (sl := host_navigation_slice(n_total, p, n_proc)).stop - sl.start]
                    for p in range(n_proc)
                ],
                axis=0,
            )

        scores = _strip_host_padding(scores)
        idx = _strip_host_padding(idx)
        n_keep_rows = n_total
    else:
        # Assemble this host's block from its addressable shards. Each
        # scan shard appears once per dict-axis replica; keep one copy
        # per distinct scan range.
        def _local_block(arr):
            blocks = {}
            for s in arr.addressable_shards:
                start = s.index[0].start or 0
                if start not in blocks:
                    blocks[start] = np.asarray(s.data)
            return np.concatenate(
                [blocks[k] for k in sorted(blocks)], axis=0
            )

        scores = _local_block(scores)[:n_local]
        idx = _local_block(idx)[:n_local]
        n_keep_rows = n_local

    if m_pad:
        out_s = np.empty((n_keep_rows, keep_n_eff), scores.dtype)
        out_i = np.empty((n_keep_rows, keep_n_eff), idx.dtype)
        for row in range(n_keep_rows):
            valid = idx[row] < m
            out_s[row] = scores[row][valid][:keep_n_eff]
            out_i[row] = idx[row][valid][:keep_n_eff]
        scores, idx = out_s, out_i
    return scores, idx
