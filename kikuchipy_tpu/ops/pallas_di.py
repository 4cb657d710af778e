"""Pallas TPU kernel: fused NCC matmul + running top-k.

The dictionary-indexing hot loop as a single Mosaic kernel: each grid
step multiplies an experimental-pattern tile against a dictionary tile
on the MXU and folds the block's best ``k`` scores into a running
per-row top-k held in VMEM scratch — the ``(n, m)`` similarity matrix is
never materialized in HBM and no separate ``top_k`` pass is needed
(replacing the reference's ``da.einsum`` + ``argtopk`` stages,
``/root/reference/src/kikuchipy/indexing/_dictionary_indexing.py:
197-198``, and the XLA ``matmul`` + ``lax.top_k`` pipeline in
:mod:`kikuchipy_tpu.indexing.di`).

Top-k inside the kernel: ``k`` rounds of (max, first-argmax, masked
select, mask-out) over the concatenation of the running top-k and the
new score block — only max/min reductions and selects (robust Mosaic
lowering), with a threshold test skipping blocks that cannot beat the
current per-row k-th score.

STATUS (re-measured round 2; see BENCH_NOTES.md "round 2"): all
variants exact against ``lax.top_k`` in interpreter mode (covered by
tests/test_pallas_di.py). Round 1's conclusion that "this backend
promotes bf16 tiles to f32-class matmuls" is WRONG on the current
backend (bf16 runs 126 TF/s vs 28.9 for f32 HIGHEST; int8 206 TOP/s).
The v5 int8 kernel's matmul-only floor is excellent (31.4 ms per
8192 x 100k x 3600 batch = 260k pps), but Mosaic's data-dependent
``while_loop`` extraction stalls the inter-block pipeline (~28 us per
block regardless of the scanned width), capping the fused kernel at
~67k pps. The production path is the TRANSPOSED group-compressed
XLA pipeline in :mod:`kikuchipy_tpu.indexing.di` (``_group_topk_T``,
129-190k pps); this module remains the from-scratch kernel line and
the HBM-footprint option (the (n, m) score block never materializes).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "ncc_match_topk_pallas",
    "ncc_match_topk_pallas_v3",
    "ncc_match_topk_pallas_v4",
    "ncc_match_topk_pallas_v5",
]

_NEG_INF = float(np.finfo(np.float32).min)


def _extract_concat_topk(run_s, run_i, sim, base_col, k):
    """Top-k over the concatenation of the running top-k (with stored
    indices) and a new score block, via k rounds of (max, first-argmax,
    masked-index select, mask-out). Uses only max/min reductions and
    selects — no lane rolls — for robust Mosaic lowering, and a
    ``fori_loop`` so only one round's temporaries are live at a time
    (the unrolled form blows the scoped-VMEM stack)."""
    r_dim = sim.shape[0]
    c_dim = sim.shape[1]
    n = k + c_dim
    vals0 = jnp.concatenate([run_s, sim], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_dim, n), 1)
    sim_ids = jax.lax.broadcasted_iota(jnp.int32, (r_dim, c_dim), 1) + base_col
    payload = jnp.concatenate([run_i, sim_ids], axis=1)
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (r_dim, k), 1)

    big = jnp.int32(2**30)

    def round_body(t, carry):
        vals, out_s, out_i = carry
        m = jnp.max(vals, axis=1, keepdims=True)
        is_max = vals >= m
        am = jnp.min(jnp.where(is_max, pos, big), axis=1, keepdims=True)
        at_am = pos == am
        sel = jnp.min(jnp.where(at_am, payload, big), axis=1, keepdims=True)
        slot = out_pos == t
        out_s = jnp.where(slot, m, out_s)
        out_i = jnp.where(slot, sel, out_i)
        vals = jnp.where(at_am, _NEG_INF, vals)
        return vals, out_s, out_i

    init = (
        vals0,
        jnp.full((r_dim, k), _NEG_INF, dtype=jnp.float32),
        jnp.zeros((r_dim, k), dtype=jnp.int32),
    )
    _, out_s, out_i = jax.lax.fori_loop(0, k, round_body, init)
    return out_s, out_i


def _kernel(exp_ref, dict_ref, out_s_ref, out_i_ref, run_s, run_i, *, k, tile_m):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        run_s[:] = jnp.full(run_s.shape, _NEG_INF, dtype=jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, dtype=jnp.int32)

    sim = jax.lax.dot_general(
        exp_ref[:],
        dict_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # Threshold skip: the block only matters for rows whose current
    # k-th best score is below the block's row maximum. After the first
    # few dictionary tiles almost every block fails this test, so the
    # steady-state cost is the matmul alone.
    row_max = jnp.max(sim, axis=1)
    kth = run_s[:, k - 1]
    needs_work = jnp.any(row_max > kth)

    @pl.when(needs_work)
    def _():
        s, i = _extract_concat_topk(run_s[:], run_i[:], sim, j * tile_m, k)
        run_s[:] = s
        run_i[:] = i

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _kernel_v3(
    exp_ref, dict_ref, out_s_ref, out_i_ref, sim_acc, run_s, run_i,
    *, k, tile_m,
):
    """D-accumulating variant: grid (i, j, kd); the contraction
    dimension is blocked so exp/dict tiles stay small enough for
    double-buffered VMEM pipelining, accumulating the score block in
    scratch and folding it into the running top-k on the last kd step."""
    j = pl.program_id(1)
    kd = pl.program_id(2)
    n_kd = pl.num_programs(2)

    @pl.when((j == 0) & (kd == 0))
    def _():
        run_s[:] = jnp.full(run_s.shape, _NEG_INF, dtype=jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, dtype=jnp.int32)

    @pl.when(kd == 0)
    def _():
        sim_acc[:] = jnp.zeros(sim_acc.shape, dtype=jnp.float32)

    sim_acc[:] += jax.lax.dot_general(
        exp_ref[:],
        dict_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kd == n_kd - 1)
    def _():
        sim = sim_acc[:]
        row_max = jnp.max(sim, axis=1)
        kth = run_s[:, k - 1]

        @pl.when(jnp.any(row_max > kth))
        def _():
            s, i = _extract_concat_topk(run_s[:], run_i[:], sim, j * tile_m, k)
            run_s[:] = s
            run_i[:] = i

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_s_ref[:] = run_s[:]
            out_i_ref[:] = run_i[:]


@partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_m", "tile_d", "interpret"),
)
def ncc_match_topk_pallas_v3(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    k: int = 20,
    tile_n: int = 512,
    tile_m: int = 512,
    tile_d: int = 1200,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused matmul+top-k with contraction blocking (see
    :func:`_kernel_v3`). ``tile_d`` must be a multiple of 128 (Mosaic
    lane constraint); the contraction dimension is zero-padded to a
    multiple of ``tile_d`` automatically (harmless for dot products)."""
    n, d = exp_prepared.shape
    m = dict_prepared.shape[0]
    if tile_d % 128:
        raise ValueError(f"tile_d={tile_d} must be a multiple of 128")
    if n % tile_n or m % tile_m:
        raise ValueError(
            f"n={n} and m={m} must be multiples of tile_n={tile_n} / "
            f"tile_m={tile_m}; pad the inputs"
        )
    d_pad = (-d) % tile_d
    if d_pad:
        exp_prepared = jnp.pad(exp_prepared, ((0, 0), (0, d_pad)))
        dict_prepared = jnp.pad(dict_prepared, ((0, 0), (0, d_pad)))
        d = d + d_pad
    grid = (n // tile_n, m // tile_m, d // tile_d)
    kernel = partial(_kernel_v3, k=k, tile_m=tile_m)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_d), lambda i, j, kd: (i, kd)),
            pl.BlockSpec((tile_m, tile_d), lambda i, j, kd: (j, kd)),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, k), lambda i, j, kd: (i, 0)),
            pl.BlockSpec((tile_n, k), lambda i, j, kd: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, tile_m), jnp.float32),
            pltpu.VMEM((tile_n, k), jnp.float32),
            pltpu.VMEM((tile_n, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(exp_prepared, dict_prepared)


def _insert_stream_topk(run_s, run_i, sim, base_col, k):
    """Fold a score block into the running (descending-sorted) top-k by
    repeated max-extraction + sorted insertion, stopping as soon as no
    row can improve.

    Unlike :func:`_extract_concat_topk` (fixed ``k`` rounds per block),
    the ``while_loop`` trip count is data-dependent: the first
    dictionary tile costs ~``k`` rounds, but in steady state almost
    every block terminates after the single ``cond`` evaluation, so the
    per-step VPU cost collapses to one row-max pass.
    """
    r_dim, c_dim = sim.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_dim, c_dim), 1)
    ids = pos + base_col
    big = jnp.int32(2**30)

    def cond(carry):
        vals, rs, ri = carry
        return jnp.any(jnp.max(vals, axis=1) > rs[:, k - 1])

    slot = jax.lax.broadcasted_iota(jnp.int32, (r_dim, k), 1)

    def body(carry):
        vals, rs, ri = carry
        bmax = jnp.max(vals, axis=1, keepdims=True)  # (r, 1)
        at_max = vals >= bmax
        am = jnp.min(jnp.where(at_max, pos, big), axis=1, keepdims=True)
        extracted = pos == am
        cand_i = jnp.min(
            jnp.where(extracted, ids, big), axis=1, keepdims=True
        )
        improve = bmax > rs[:, k - 1 : k]
        # Remove the extracted column so the loop makes progress.
        vals = jnp.where(extracted, _NEG_INF, vals)
        # Sorted insertion by rank arithmetic (no boolean concatenates
        # or lane rolls -- both fail Mosaic lowering): the insertion
        # slot p is the count of kept entries >= the candidate; slots
        # before p keep their value, slot p takes the candidate, and
        # slots after p take their left neighbour.
        p = jnp.sum(
            (rs >= bmax).astype(jnp.int32), axis=1, keepdims=True
        )
        rs_shifted = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        ri_shifted = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        new_rs = jnp.where(
            slot == p, bmax, jnp.where(slot > p, rs_shifted, rs)
        )
        new_ri = jnp.where(
            slot == p, cand_i, jnp.where(slot > p, ri_shifted, ri)
        )
        rs = jnp.where(improve, new_rs, rs)
        ri = jnp.where(improve, new_ri, ri)
        return vals, rs, ri

    _, out_s, out_i = jax.lax.while_loop(cond, body, (sim, run_s, run_i))
    return out_s, out_i


def _kernel_v4(
    exp_ref, dict_ref, out_s_ref, out_i_ref, run_s, run_i, *, k, tile_m,
    extraction,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        run_s[:] = jnp.full(run_s.shape, _NEG_INF, dtype=jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, dtype=jnp.int32)

    # Single-pass bf16 MXU matmul with f32 accumulation (the fast mode's
    # accuracy contract; ~1e-4 absolute score error on normalized NCC).
    sim = jax.lax.dot_general(
        exp_ref[:],
        dict_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if extraction == "stream":
        s, i = _insert_stream_topk(run_s[:], run_i[:], sim, j * tile_m, k)
        run_s[:] = s
        run_i[:] = i
    elif extraction == "none":  # debug: matmul-only floor measurement
        run_s[:, 0] = jnp.max(sim, axis=1)
    else:
        row_max = jnp.max(sim, axis=1)
        kth = run_s[:, k - 1]

        @pl.when(jnp.any(row_max > kth))
        def _():
            s, i = _extract_concat_topk(
                run_s[:], run_i[:], sim, j * tile_m, k
            )
            run_s[:] = s
            run_i[:] = i

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_m", "interpret", "extraction"),
)
def ncc_match_topk_pallas_v4(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    k: int = 20,
    tile_n: int = 512,
    tile_m: int = 512,
    interpret: bool = False,
    extraction: str = "fori",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused bf16 NCC matmul + streaming-insertion top-k (v4).

    The inputs are cast to bfloat16 (halving HBM traffic and running the
    MXU in its native single-pass mode) and the whole contraction
    dimension is kept in one VMEM block per tile, so the grid is just
    ``(n / tile_n, m / tile_m)``; the running top-k lives in VMEM
    scratch and is updated with the data-dependent insertion loop of
    :func:`_insert_stream_topk`.

    VMEM at the default 512x512 tiles and d=3712: 3.8 MB exp (constant
    across the inner grid axis) + 2 x 3.8 MB double-buffered dictionary
    + 1 MB f32 score block -- ~12.4 MB of the ~16 MB budget.
    """
    n, d = exp_prepared.shape
    m = dict_prepared.shape[0]
    if n % tile_n or m % tile_m:
        raise ValueError(
            f"n={n} and m={m} must be multiples of tile_n={tile_n} / "
            f"tile_m={tile_m}; pad the inputs"
        )
    d_pad = (-d) % 128
    if d_pad:
        exp_prepared = jnp.pad(exp_prepared, ((0, 0), (0, d_pad)))
        dict_prepared = jnp.pad(dict_prepared, ((0, 0), (0, d_pad)))
        d = d + d_pad
    exp_bf16 = exp_prepared.astype(jnp.bfloat16)
    dict_bf16 = dict_prepared.astype(jnp.bfloat16)
    grid = (n // tile_n, m // tile_m)
    kernel = partial(_kernel_v4, k=k, tile_m=tile_m, extraction=extraction)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_m, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, k), jnp.float32),
            pltpu.VMEM((tile_n, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d,
            bytes_accessed=n * d * 2 + (n // tile_n) * m * d * 2 + n * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(exp_bf16, dict_bf16)


@partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_m", "interpret"),
)
def ncc_match_topk_pallas(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    k: int = 20,
    tile_n: int = 256,
    tile_m: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused similarity matmul + top-k.

    Parameters
    ----------
    exp_prepared
        ``(n, d)`` prepared (centered/normalized) experimental patterns,
        float32. ``n`` must be a multiple of ``tile_n``.
    dict_prepared
        ``(m, d)`` prepared dictionary, float32. ``m`` must be a
        multiple of ``tile_m``.
    k
        Matches to keep (<= tile_m).
    interpret
        Run in the Pallas interpreter (for CPU testing).

    Returns
    -------
    ``(scores, indices)`` of shape ``(n, k)``, descending.
    """
    n, d = exp_prepared.shape
    m = dict_prepared.shape[0]
    if n % tile_n or m % tile_m:
        raise ValueError(
            f"n={n} and m={m} must be multiples of tile_n={tile_n} / "
            f"tile_m={tile_m}; pad the inputs"
        )
    grid = (n // tile_n, m // tile_m)
    kernel = partial(_kernel, k=k, tile_m=tile_m)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_m, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, k), jnp.float32),
            pltpu.VMEM((tile_n, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(exp_prepared, dict_prepared)


def _group_compress(sim, base_col, group):
    """Per-row, per-group max + element index over INTERLEAVED groups:
    with ``G = c / group`` groups, group ``t`` holds columns
    ``{t, t+G, t+2G, ...}``, so the reduction is an elementwise max
    over ``group`` CONTIGUOUS ``(r, G)`` slices — 2D ops only (Mosaic
    rejects the (r, G, group) reshape a contiguous grouping would
    need). Returns ``(r, G)`` values and global column ids.

    Selection then sees group maxima only: a score is lost iff a
    better score lands in its group. Interleaving makes that
    UNCORRELATED for dictionaries ordered by orientation similarity —
    adjacent (correlated) dictionary entries are in different groups
    by construction; same-group entries are ``G`` columns apart."""
    r_dim, c_dim = sim.shape
    G = c_dim // group
    best = sim[:, :G]
    best_j = jnp.zeros((r_dim, G), dtype=jnp.int32)
    for jj in range(1, group):
        blk = sim[:, jj * G : (jj + 1) * G]
        take = blk > best
        best = jnp.where(take, blk, best)
        best_j = jnp.where(take, jnp.int32(jj), best_j)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_dim, G), 1)
    return best, best_j * G + lane + base_col


def _kernel_v5(
    exp_ref, dict_ref, scale_ref, out_s_ref, out_i_ref, run_s, run_i,
    *, k, tile_m, extraction, group,
):
    """int8 variant of :func:`_kernel_v4`: s8 x s8 -> s32 on the MXU
    (v5e native rate, ~2x bf16), scaled to f32 selection scores by the
    per-dictionary-row quantization scales. int8 tiles also halve the
    VMEM footprint that OOM'd v4 at n=8192 (see BENCH_NOTES.md round-2
    tier re-measurement). With ``group > 1`` the score block is first
    compressed to per-group (max, index) so the insertion loop scans a
    ``group``x smaller block (the extraction was ~3x the matmul cost at
    group=1)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        run_s[:] = jnp.full(run_s.shape, _NEG_INF, dtype=jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, dtype=jnp.int32)

    d32 = jax.lax.dot_general(
        exp_ref[:],
        dict_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sim = d32.astype(jnp.float32) * scale_ref[:]

    if extraction == "stream":
        if group > 1:
            gvals, gids = _group_compress(sim, j * tile_m, group)
            s, i = _insert_stream_topk_ids(
                run_s[:], run_i[:], gvals, gids, k
            )
        else:
            s, i = _insert_stream_topk(
                run_s[:], run_i[:], sim, j * tile_m, k
            )
        run_s[:] = s
        run_i[:] = i
    elif extraction == "none":  # debug: matmul-only floor measurement
        run_s[:, 0] = jnp.max(sim, axis=1)
    else:
        row_max = jnp.max(sim, axis=1)
        kth = run_s[:, k - 1]

        @pl.when(jnp.any(row_max > kth))
        def _():
            s, i = _extract_concat_topk(
                run_s[:], run_i[:], sim, j * tile_m, k
            )
            run_s[:] = s
            run_i[:] = i

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _insert_stream_topk_ids(run_s, run_i, vals, ids, k):
    """:func:`_insert_stream_topk` for (value, explicit-id) pairs (the
    group-compressed block carries its own global column ids)."""
    r_dim, c_dim = vals.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_dim, c_dim), 1)
    big = jnp.int32(2**30)
    slot = jax.lax.broadcasted_iota(jnp.int32, (r_dim, k), 1)

    def cond(carry):
        v, rs, ri = carry
        return jnp.any(jnp.max(v, axis=1) > rs[:, k - 1])

    def body(carry):
        v, rs, ri = carry
        bmax = jnp.max(v, axis=1, keepdims=True)
        at_max = v >= bmax
        am = jnp.min(jnp.where(at_max, pos, big), axis=1, keepdims=True)
        extracted = pos == am
        cand_i = jnp.min(jnp.where(extracted, ids, big), axis=1, keepdims=True)
        improve = bmax > rs[:, k - 1 : k]
        v = jnp.where(extracted, _NEG_INF, v)
        p = jnp.sum((rs >= bmax).astype(jnp.int32), axis=1, keepdims=True)
        rs_shifted = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        ri_shifted = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        new_rs = jnp.where(slot == p, bmax, jnp.where(slot > p, rs_shifted, rs))
        new_ri = jnp.where(slot == p, cand_i, jnp.where(slot > p, ri_shifted, ri))
        rs = jnp.where(improve, new_rs, rs)
        ri = jnp.where(improve, new_ri, ri)
        return v, rs, ri

    _, out_s, out_i = jax.lax.while_loop(cond, body, (vals, run_s, run_i))
    return out_s, out_i


@partial(
    jax.jit,
    static_argnames=(
        "k", "tile_n", "tile_m", "interpret", "extraction", "group"
    ),
)
def ncc_match_topk_pallas_v5(
    exp_q: jnp.ndarray,
    dict_q: jnp.ndarray,
    dict_scale: jnp.ndarray,
    k: int = 20,
    tile_n: int = 512,
    tile_m: int = 512,
    interpret: bool = False,
    extraction: str = "stream",
    group: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused int8 NCC matmul + streaming-insertion top-k (v5).

    Inputs are PRE-QUANTIZED int8 rows (see
    ``indexing.di._quantize_rows_int8`` /
    :class:`~kikuchipy_tpu.indexing.di.PreparedDictionary`): the
    experimental-side scale is rank-invariant per pattern and omitted;
    ``dict_scale`` (``(m,)`` f32) scales the s32 block to selection
    scores. The ``(n, m)`` score matrix never reaches HBM.

    Selection error is that of rowwise-max-abs int8 quantization
    (~1e-2 relative); pair with an exact f32 rescore of the survivors
    (``indexing.di._rescore_candidates``) for exact final scores, as
    ``precision="pallas-int8"`` in :func:`kikuchipy_tpu.indexing.di.
    dictionary_index` does.
    """
    n, d = exp_q.shape
    m = dict_q.shape[0]
    if n % tile_n or m % tile_m:
        raise ValueError(
            f"n={n} and m={m} must be multiples of tile_n={tile_n} / "
            f"tile_m={tile_m}; pad the inputs"
        )
    d_pad = (-d) % 128
    if d_pad:
        exp_q = jnp.pad(exp_q, ((0, 0), (0, d_pad)))
        dict_q = jnp.pad(dict_q, ((0, 0), (0, d_pad)))
        d = d + d_pad
    if group > 1 and tile_m % group:
        raise ValueError(f"group={group} must divide tile_m={tile_m}")
    scale_row = dict_scale.reshape(1, m).astype(jnp.float32)
    grid = (n // tile_n, m // tile_m)
    kernel = partial(
        _kernel_v5, k=k, tile_m=tile_m, extraction=extraction, group=group
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_m, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, k), jnp.float32),
            pltpu.VMEM((tile_n, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d,
            bytes_accessed=n * d + (n // tile_n) * m * d + n * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(exp_q, dict_q, scale_row)
