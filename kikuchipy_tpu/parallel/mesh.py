"""Device-mesh parallelism for dictionary indexing.

The reference has no distributed backend (SURVEY.md §2.12); the TPU
design shards the problem over a 2D ``jax.sharding.Mesh``:

- ``"scan"`` axis: experimental patterns, pure data parallelism over
  beam positions;
- ``"dict"`` axis: dictionary entries, model-parallel-style sharding of
  the dictionary with a cross-shard top-k merge.

Each device computes the NCC matmul of its (scan-shard x dict-shard)
block plus a local top-k; an ``all_gather`` over the ``dict`` axis (ICI)
then merges the per-shard candidates into the global top-k. Per-device
FLOPs scale as 1/(n_scan * n_dict) with only O(keep_n) communication per
pattern — the collective cost is negligible next to the matmul.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "sharded_match_topk",
    "sharded_dictionary_index",
    "sharded_fused_dictionary_index",
]


def make_mesh(
    n_scan: int | None = None,
    n_dict: int | None = None,
    devices=None,
) -> Mesh:
    """Build a ``("scan", "dict")`` mesh over the available devices.

    With no arguments, uses all devices on the ``scan`` axis (the common
    case: dictionary replicated, scan data-parallel).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_scan is None and n_dict is None:
        n_scan, n_dict = n, 1
    elif n_scan is None:
        n_scan = n // n_dict
    elif n_dict is None:
        n_dict = n // n_scan
    if n_scan * n_dict != n:
        raise ValueError(
            f"mesh {n_scan}x{n_dict} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(n_scan, n_dict)
    return Mesh(dev_array, axis_names=("scan", "dict"))


@partial(jax.jit, static_argnames=("keep_n", "mesh", "precision", "approx"))
def sharded_match_topk(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    keep_n: int,
    mesh: Mesh,
    precision: str = "highest",
    approx: bool = False,
    dict_q: jnp.ndarray | None = None,
    dict_scale: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Match prepared experimental patterns against a prepared dictionary
    on a ``("scan", "dict")`` mesh and return the global top-k.

    ``exp_prepared (n, d)`` is sharded over ``scan`` rows,
    ``dict_prepared (m, d)`` over ``dict`` rows. ``n`` must divide by the
    scan axis size and ``m`` by the dict axis size. Returns
    ``(scores, indices)`` of shape ``(n, keep_n)`` sharded over ``scan``
    and replicated over ``dict``.

    Each shard's match runs THE single-device fast path
    (:func:`kikuchipy_tpu.indexing.di._index_resident`), so every
    precision tier and the transposed group-compressed selection
    (``approx=True``, the round-2 headline: f16 score materialization +
    group-top-2, ~1.5x the exact per-tile ``lax.top_k``) apply per shard
    unchanged. Tiers that rescore ("mixed"/"int8") rescore shard-locally
    — candidate rows live on the owning shard — so the cross-shard
    ``all_gather`` merge (ICI) always sees final-precision scores and
    the sharded result equals the single-device result for the exact
    tiers bit-for-bit. For ``precision="int8"``, pass the
    pre-quantized ``dict_q (m, d) int8`` / ``dict_scale (m,)`` from
    :meth:`PreparedDictionary.quantized_int8`, sharded like the
    dictionary.
    """
    from kikuchipy_tpu.indexing.di import _index_resident

    m = dict_prepared.shape[0]
    n_dict = mesh.shape["dict"]
    m_local = m // n_dict
    k_local = min(keep_n, m_local)
    k_out = min(keep_n, m)
    has_q = dict_q is not None

    def local_step(exp_local, dict_local, *q):
        dq, ds = q if has_q else (None, None)
        s, i = _index_resident(
            exp_local, dict_local, k_local, m_local, precision, approx,
            dq, ds,
        )
        i = (i + jax.lax.axis_index("dict") * m_local).astype(jnp.int32)
        # Merge candidates across dictionary shards over ICI.
        s_all = jax.lax.all_gather(s, "dict", axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, "dict", axis=1, tiled=True)
        s_out, pos = jax.lax.top_k(s_all, k_out)
        i_out = jnp.take_along_axis(i_all, pos, axis=1)
        return s_out, i_out

    in_specs = [P("scan", None), P("dict", None)]
    args = [exp_prepared, dict_prepared]
    if has_q:
        in_specs += [P("dict", None), P("dict")]
        args += [dict_q, dict_scale]
    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("scan", None), P("scan", None)),
        check_vma=False,
    )(*args)


def sharded_fused_dictionary_index(
    experimental,
    rotations,
    master: jnp.ndarray,
    dc: jnp.ndarray,
    npx: int,
    npy: int,
    scale: float,
    keep_n: int = 20,
    mesh: Mesh | None = None,
):
    """Fully fused multi-chip DI: each device on the ``dict`` mesh axis
    *projects* its own shard of dictionary orientations from the
    (replicated) master pattern and matches it against its ``scan``
    shard of experimental patterns, merging per-shard top-k with an
    ``all_gather`` — the dictionary never exists in HBM, on any chip.

    Parameters
    ----------
    experimental
        ``(n, d)`` prepared* or raw flattened patterns — prepared here
        with the NCC metric, so pass raw flattened float patterns.
    rotations
        ``(m, 4)`` quaternions; sharded over the ``dict`` axis.
    master, dc, npx, npy, scale
        Projection inputs as for
        :func:`kikuchipy_tpu.projection.master_pattern.project_patterns`
        (replicated on every device).
    """
    from kikuchipy_tpu.indexing.metrics import ncc
    from kikuchipy_tpu.projection.master_pattern import project_patterns

    if mesh is None:
        mesh = make_mesh()
    n_scan, n_dict = mesh.shape["scan"], mesh.shape["dict"]

    experimental = jnp.asarray(experimental)
    if experimental.ndim > 2:
        experimental = experimental.reshape(
            (-1, experimental.shape[-2] * experimental.shape[-1])
        )
    rotations = jnp.asarray(rotations, dtype=jnp.float32)
    n, d = experimental.shape
    m = rotations.shape[0]
    if n % n_scan or m % n_dict:
        raise ValueError(
            f"n={n} and m={m} must divide the mesh axes {dict(mesh.shape)}"
        )
    m_local = m // n_dict
    keep_n_eff = min(keep_n, m_local)

    exp_sharding = NamedSharding(mesh, P("scan", None))
    rot_sharding = NamedSharding(mesh, P("dict", None))
    experimental = jax.device_put(experimental, exp_sharding)
    rotations = jax.device_put(rotations, rot_sharding)

    def local_step(exp_local, rot_local, master_r, dc_r):
        sim_patterns = project_patterns(
            rot_local, dc_r, master_r, npx, npy, scale
        )
        dict_prepared = ncc.prepare(sim_patterns, None)
        exp_prepared = ncc.prepare(exp_local, None)
        sim = jnp.matmul(
            exp_prepared,
            dict_prepared.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        s, i = jax.lax.top_k(sim, keep_n_eff)
        i = (i + jax.lax.axis_index("dict") * m_local).astype(jnp.int32)
        s_all = jax.lax.all_gather(s, "dict", axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, "dict", axis=1, tiled=True)
        k_out = min(keep_n, m)
        s_out, pos = jax.lax.top_k(s_all, k_out)
        i_out = jnp.take_along_axis(i_all, pos, axis=1)
        return s_out, i_out

    fn = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P("scan", None), P("dict", None), P(), P()),
            out_specs=(P("scan", None), P("scan", None)),
            check_vma=False,
        )
    )
    scores, idx = fn(experimental, rotations, jnp.asarray(master), jnp.asarray(dc))
    return np.asarray(scores), np.asarray(idx)


def sharded_dictionary_index(
    experimental,
    dictionary,
    keep_n: int = 20,
    metric="ncc",
    mesh: Mesh | None = None,
    signal_mask: np.ndarray | None = None,
    precision: str = "highest",
    approx_topk: bool = False,
):
    """Dictionary indexing over a device mesh.

    Pads the scan and dictionary axes to multiples of the mesh axes,
    prepares patterns on device with sharded layouts, matches with
    :func:`sharded_match_topk`, and strips the padding. Returns
    ``(scores, indices)`` as NumPy arrays.

    ``dictionary`` may be a
    :class:`~kikuchipy_tpu.indexing.di.PreparedDictionary` — its
    (already prepared, and for ``precision="int8"`` pre-quantized)
    arrays are resharded over the ``dict`` axis and reused, skipping
    per-call preparation exactly as on a single device.
    """
    from kikuchipy_tpu.indexing.di import PreparedDictionary
    from kikuchipy_tpu.indexing.metrics import get_metric, signal_mask_to_idx

    metric = get_metric(metric)
    if mesh is None:
        mesh = make_mesh()

    experimental = jnp.asarray(experimental)
    if experimental.ndim > 2:
        experimental = experimental.reshape(
            (-1, experimental.shape[-2] * experimental.shape[-1])
        )
    n, d = experimental.shape
    keep_idx = signal_mask_to_idx(signal_mask, d)
    keep_idx = None if keep_idx is None else jnp.asarray(keep_idx)
    n_scan, n_dict = mesh.shape["scan"], mesh.shape["dict"]
    exp_sharding = NamedSharding(mesh, P("scan", None))
    dict_sharding = NamedSharding(mesh, P("dict", None))

    dict_q = dict_scale = None
    prepared_in = isinstance(dictionary, PreparedDictionary)
    if prepared_in:
        if dictionary.metric_name != metric.name:
            raise ValueError(
                f"PreparedDictionary was prepared with metric "
                f"{dictionary.metric_name!r}, requested {metric.name!r}"
            )
        dict_prepared = dictionary.prepared
        if precision == "int8":
            dict_q, dict_scale = dictionary.quantized_int8()
        m = dict_prepared.shape[0]
    else:
        dictionary = jnp.asarray(dictionary)
        if dictionary.ndim > 2:
            dictionary = dictionary.reshape(
                (-1, dictionary.shape[-2] * dictionary.shape[-1])
            )
        m = dictionary.shape[0]

    n_pad = (-n) % n_scan
    m_pad = (-m) % n_dict
    if n_pad:
        experimental = jnp.concatenate(
            [experimental, jnp.zeros((n_pad, d), experimental.dtype)], axis=0
        )

    def _pad_rows(arr, n_rows):
        # Padding rows replicate the first row (already valid/normalized)
        # so scores stay finite; padded entries are dropped by index.
        pad = jnp.broadcast_to(arr[:1], (n_rows,) + arr.shape[1:])
        return jnp.concatenate([arr, pad], axis=0)

    experimental = jax.device_put(experimental, exp_sharding)
    prepare = jax.jit(metric.prepare, out_shardings=exp_sharding)
    exp_prepared = prepare(experimental, keep_idx)

    if prepared_in:
        if m_pad:
            dict_prepared = _pad_rows(dict_prepared, m_pad)
            if dict_q is not None:
                dict_q = _pad_rows(dict_q, m_pad)
                dict_scale = _pad_rows(dict_scale, m_pad)
        dict_prepared = jax.device_put(dict_prepared, dict_sharding)
        if dict_q is not None:
            dict_q = jax.device_put(dict_q, dict_sharding)
            dict_scale = jax.device_put(
                dict_scale, NamedSharding(mesh, P("dict"))
            )
    else:
        if m_pad:
            dictionary = _pad_rows(dictionary, m_pad)
        dictionary = jax.device_put(dictionary, dict_sharding)
        prepare_d = jax.jit(metric.prepare, out_shardings=dict_sharding)
        dict_prepared = prepare_d(dictionary, keep_idx)

    if dict_prepared.shape[1] != exp_prepared.shape[1]:
        raise ValueError(
            f"dictionary feature size {dict_prepared.shape[1]} != "
            f"experimental feature size {exp_prepared.shape[1]} — the "
            f"signal_mask here must match the one used at "
            f"prepare_dictionary time"
        )
    keep_n_eff = min(keep_n, m)
    k_query = min(keep_n_eff + m_pad, m + m_pad) if m_pad else keep_n_eff
    scores, idx = sharded_match_topk(
        exp_prepared, dict_prepared, k_query, mesh, precision, approx_topk,
        dict_q, dict_scale,
    )
    scores = np.asarray(scores)[:n]
    idx = np.asarray(idx)[:n]
    if m_pad:
        # Drop padded dictionary entries (indices >= m), keep first
        # keep_n_eff valid entries per row.
        out_s = np.empty((n, keep_n_eff), scores.dtype)
        out_i = np.empty((n, keep_n_eff), idx.dtype)
        for row in range(n):
            valid = idx[row] < m
            out_s[row] = scores[row][valid][:keep_n_eff]
            out_i[row] = idx[row][valid][:keep_n_eff]
        scores, idx = out_s, out_i
    return scores, idx
