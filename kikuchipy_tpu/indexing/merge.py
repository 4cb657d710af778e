"""Merge single-phase crystal maps into a multi-phase map.

Follows the reference's ``merge_crystal_maps`` semantics
(``/root/reference/src/kikuchipy/indexing/_merge_crystal_maps.py:28-354``):
the phase at each point is the one whose mean of the ``mean_n_best``
best scores wins; per-point rotations/scores/simulation indices are
taken from the winning map, and combined sorted score/index arrays are
added as ``merged_*`` properties (indices offset per map so they stay
unique for OSM computation).
"""

from __future__ import annotations

import numpy as np

from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, PhaseList

__all__ = ["merge_crystal_maps"]


def merge_crystal_maps(
    crystal_maps: list[CrystalMap],
    mean_n_best: int = 1,
    greater_is_better: bool = True,
    scores_prop: str = "scores",
    simulation_indices_prop: str | None = "simulation_indices",
) -> CrystalMap:
    """Merge per-phase crystal maps by comparing scores per point."""
    n_maps = len(crystal_maps)
    if n_maps < 2:
        raise ValueError("Pass at least two crystal maps to merge")
    shapes = {xmap.shape for xmap in crystal_maps}
    if len(shapes) != 1:
        raise ValueError(
            f"Crystal maps must have the same navigation shape; got {shapes}"
        )
    sizes = {xmap.size for xmap in crystal_maps}
    rpp = {xmap.rotations_per_point for xmap in crystal_maps}
    if len(rpp) != 1:
        raise ValueError(
            "Crystal maps must have the same number of rotations per point"
        )
    n_per_point = rpp.pop()
    m = sizes.pop()
    sign = 1.0 if greater_is_better else -1.0

    # (M, N, K) combined scores
    combined = np.stack(
        [np.atleast_2d(np.asarray(x.prop[scores_prop]).reshape(m, -1)) for x in crystal_maps],
        axis=-1,
    )

    best = np.nanmean(combined[:, :mean_n_best], axis=1)  # (M, K)
    phase_id = np.nanargmax(sign * best, axis=1)

    rot_shape = (m, n_per_point, 4) if n_per_point > 1 else (m, 4)
    new_rot = np.zeros(rot_shape)
    new_scores = np.zeros(combined.shape[:-1], dtype=combined.dtype)
    new_idx = (
        np.zeros(combined.shape[:-1], dtype=np.int32)
        if simulation_indices_prop is not None
        else None
    )

    phases = PhaseList()
    for i, xmap in enumerate(crystal_maps):
        mask = phase_id == i
        phase = xmap.phases[xmap.phases.ids[0]] if len(xmap.phases) else None
        if phase is not None:
            if phase.name in phases.names:
                # Same-named phases collapse to one id.
                phase_id[mask] = phases.names.index(phase.name)
            else:
                phases.add(i, phase)
        if not mask.any():
            continue
        new_rot[mask] = np.asarray(xmap.rotations).reshape(rot_shape)[mask]
        new_scores[mask] = np.asarray(xmap.prop[scores_prop]).reshape(
            combined.shape[:-1]
        )[mask]
        if new_idx is not None and simulation_indices_prop in xmap.prop:
            new_idx[mask] = np.asarray(
                xmap.prop[simulation_indices_prop]
            ).reshape(combined.shape[:-1])[mask]

    # Merged, sorted scores across all maps.
    flat = combined.reshape(m, -1)
    order = np.argsort(sign * -flat, kind="mergesort", axis=1)
    merged_scores = np.take_along_axis(flat, order, axis=1)
    props = {scores_prop: new_scores, f"merged_{scores_prop}": merged_scores}

    if simulation_indices_prop is not None:
        sim_list = []
        offset = 0
        for i, xmap in enumerate(crystal_maps):
            sim = np.asarray(xmap.prop[simulation_indices_prop]).reshape(
                combined.shape[:-1]
            ).astype(np.float64)
            if i > 0:
                offset = int(np.nanmax(sim_list[-1])) + 1
            sim_list.append(sim + offset)
        comb_sim = np.stack(sim_list, axis=-1).reshape(m, -1)
        merged_sim = np.take_along_axis(comb_sim, order, axis=1)
        props[simulation_indices_prop] = new_idx
        props[f"merged_{simulation_indices_prop}"] = merged_sim

    first = crystal_maps[0]
    return CrystalMap(
        rotations=new_rot,
        phase_id=phase_id,
        shape=first.shape,
        prop=props,
        phases=phases,
        scan_unit=first.scan_unit,
    )
