"""Dictionary indexing: match experimental EBSD patterns against a
dictionary of simulated patterns and keep the top-k best matches.

TPU-native design (replaces the reference's dask einsum + host-side
top-k merge, ``/root/reference/src/kikuchipy/indexing/
_dictionary_indexing.py:36-203``):

- pattern preparation and the NCC/NDP match run as one fused XLA program
  per dictionary tile — an MXU matmul at ``Precision.HIGHEST`` followed
  by an on-device ``top_k``;
- the running top-k across dictionary tiles is carried **on device**
  (an unrolled static-tile program when the dictionary is resident, a
  host loop of jitted steps when streaming), never round-tripping
  scores to the host;
- the dictionary can be *virtual*: a ``project_fn(rotations)`` callback
  generates each tile on device from the master pattern, fusing
  dictionary generation into the indexing loop so the full dictionary is
  never materialized.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from kikuchipy_tpu.indexing.metrics import (
    SimilarityMetric,
    get_metric,
    signal_mask_to_idx,
)

__all__ = [
    "DictionaryIndexingResult",
    "PreparedDictionary",
    "prepare_dictionary",
    "dictionary_index",
    "merge_topk",
]

_logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DictionaryIndexingResult:
    """Top-k dictionary matches per experimental pattern.

    Attributes
    ----------
    scores
        ``(n_experimental, keep_n)`` best similarity scores, descending.
    simulation_indices
        ``(n_experimental, keep_n)`` dictionary indices of the matches.
    patterns_per_second, comparisons_per_second
        Indexing throughput (matches the reference's reporting,
        ``_dictionary_indexing.py:130-139``).
    """

    scores: np.ndarray
    simulation_indices: np.ndarray
    patterns_per_second: float = 0.0
    comparisons_per_second: float = 0.0


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

# Past this many full tiles the unrolled static-slice loop in
# _index_resident switches to a lax.scan: HLO size (and this stack's
# multi-minute remote compiles) grows linearly with the unroll count.
_MAX_UNROLL_TILES = 32


def _quantize_rows_int8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rowwise max-abs int8 quantization: ``(values int8, scales f32)``."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    s = jnp.where(s == 0, jnp.ones_like(s), s)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s[:, 0].astype(x.dtype)


@dataclasses.dataclass
class PreparedDictionary:
    """A dictionary prepared once and reused across every indexing call.

    The reference re-normalizes the dictionary every run
    (``_dictionary_indexing.py:130`` prepares per chunk, per call); on
    TPU the dictionary is the *reusable* operand — scans change, the
    dictionary doesn't — so preparation (cast/mask/center/normalize)
    and, for the int8 MXU tier, rowwise max-abs quantization are done
    once here and the results stay resident in HBM across calls. This is
    what makes the reduced-precision selection tiers profitable: round 1
    measured per-call quantization eating the int8 matmul's win
    (BENCH_NOTES.md "tier pick order").

    Create with :func:`prepare_dictionary`; pass anywhere a raw
    ``dictionary`` array is accepted.
    """

    prepared: jnp.ndarray
    metric_name: str = "ncc"
    # Provenance of the signal mask used at prepare time: the kept-pixel
    # count is ``prepared.shape[1]``; ``mask_hash`` additionally
    # distinguishes different masks of the same size (None = unknown,
    # e.g. a PreparedDictionary built by hand from a raw array).
    mask_hash: int | None = None
    _q8: tuple[jnp.ndarray, jnp.ndarray] | None = dataclasses.field(
        default=None, repr=False, compare=False
    )

    @property
    def n_dictionary(self) -> int:
        return self.prepared.shape[0]

    @property
    def n_features(self) -> int:
        """Kept-pixel count after the prepare-time signal mask."""
        return self.prepared.shape[1]

    def quantized_int8(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Pre-quantized ``(values int8 (m, d), scales (m,))``, computed
        on first use and cached on the object."""
        if self._q8 is None:
            q, s = jax.jit(_quantize_rows_int8)(self.prepared)
            object.__setattr__(self, "_q8", (q, s))
        return self._q8


def prepare_dictionary(
    dictionary: jnp.ndarray | np.ndarray,
    metric: str | SimilarityMetric = "ncc",
    signal_mask: np.ndarray | None = None,
    quantize: bool = False,
) -> PreparedDictionary:
    """Prepare (and optionally pre-quantize) a dictionary once for reuse
    across many :func:`dictionary_index` calls.

    Parameters
    ----------
    dictionary
        ``(m, sy, sx)`` or ``(m, d)`` simulated patterns.
    metric, signal_mask
        As for :func:`dictionary_index` — the mask must match the one
        used at indexing time (it changes the kept-pixel set).
    quantize
        Eagerly build the int8 tier's quantized copy (otherwise built
        lazily on the first ``precision="int8"`` call).
    """
    metric = get_metric(metric)
    dictionary = jnp.asarray(dictionary)
    sig_size = int(np.prod(dictionary.shape[1:]))
    keep_idx = signal_mask_to_idx(signal_mask, sig_size)
    keep_idx = None if keep_idx is None else jnp.asarray(keep_idx)
    prep = PreparedDictionary(
        prepared=metric.prepare(dictionary, keep_idx),
        metric_name=metric.name,
        mask_hash=_mask_hash(keep_idx),
    )
    if quantize:
        prep.quantized_int8()
    return prep


def _mask_hash(keep_idx) -> int:
    """Stable hash of the kept-pixel index set (0 = no mask)."""
    if keep_idx is None:
        return 0
    import zlib

    return zlib.crc32(np.ascontiguousarray(np.asarray(keep_idx)).tobytes())


def _group_topk_T(simT: jnp.ndarray, k: int, group: int = 32):
    """:func:`_group_topk` on a TRANSPOSED ``(c, n)`` score block.

    The transposed layout is the fast one on this backend: the group
    reduction runs over contiguous row blocks of the matmul output
    (fusing with its epilogue instead of forcing a full (n, c) HBM
    materialization — measured 110 -> 80 ms per 8192 x 100k pass, and
    63 ms with f16 materialization; BENCH_NOTES.md round-2 "transposed
    selection"). Only the tiny ``(n, c/group)`` compressed block is
    transposed back for the exact ``top_k``.
    """
    c, n = simT.shape
    G = c // group
    if G < k:
        return jax.lax.top_k(simT.T.astype(jnp.float32), k)
    # Evaluated and rejected (round 5): packing (f16 score, 5-bit g)
    # into one sortable int32 per fold slot — fewer state arrays and a
    # gather-free tail, but the per-element pack arithmetic (bitcast +
    # monotone map + shifts) costs MORE than it saves on the VPU:
    # full pass 153 -> 181 ms measured at 16384 x 100k
    # (tools/probe_di_breakdown.py). The plain f16-compare fold below
    # stays the production selection.
    # Per-group top-2 (best and runner-up): a true rank-r candidate is
    # lost only when >= 2 better-scoring candidates share its group
    # (probability ~(k/n_groups)^2 per rank — negligible), against
    # ~k/n_groups for top-1-only compression, whose deep-rank drops
    # measurably perturbed keep_n scores on noise-dense data.
    #
    # Computed as a STREAMING elementwise fold over the `group` static
    # contiguous row blocks (group g of the interleaved grouping IS the
    # contiguous block simT[g*G:(g+1)*G]) instead of a reduce over the
    # major axis of a (group, G, n) view: any major-axis reduce of that
    # view — even a plain max — scalarizes in the TPU backend into
    # ~3 KB of code PER OUTPUT TILE, ballooning the binary to ~160 MB
    # at n=16384 (and binaries ship server-side at tunnel speed on this
    # stack: 953 s first execution in BENCH_r04). The fold is pure
    # maximum/select chains that fuse with the matmul epilogue: 5.3 MB,
    # same semantics incl. first-match tie order
    # (tools/probe_codesize{,2,3}.py).
    neg = jnp.asarray(-jnp.inf, simT.dtype)
    m1 = jnp.full((G, n), neg, simT.dtype)
    m2 = m1
    j1 = jnp.zeros((G, n), jnp.int32)
    j2 = j1
    for g in range(group):
        blk = simT[g * G : (g + 1) * G]
        b1 = blk > m1
        b2 = ~b1 & (blk > m2)
        m2 = jnp.where(b1, m1, jnp.where(b2, blk, m2))
        j2 = jnp.where(b1, j1, jnp.where(b2, g, j2))
        m1 = jnp.where(b1, blk, m1)
        j1 = jnp.where(b1, g, j1)
    lane = jnp.arange(G, dtype=jnp.int32)[None, :]
    cand_s = jnp.concatenate(
        [m1.T.astype(jnp.float32), m2.T.astype(jnp.float32)], axis=1
    )  # (n, 2G)
    cand_i = jnp.concatenate([j1.T * G + lane, j2.T * G + lane], axis=1)
    rem = c - G * group
    if rem:
        # Tail columns (c not a multiple of group) ride along as
        # singleton candidates — exactness for them, negligible cost.
        tail = simT[G * group :].T.astype(jnp.float32)       # (n, rem)
        cand_s = jnp.concatenate([cand_s, tail], axis=1)
        cand_i = jnp.concatenate(
            [
                cand_i,
                jnp.broadcast_to(
                    G * group + jnp.arange(rem, dtype=jnp.int32)[None, :],
                    (n, rem),
                ),
            ],
            axis=1,
        )
    s, pos = jax.lax.top_k(cand_s, k)
    col = jnp.take_along_axis(cand_i, pos, axis=1)
    return s, col


@partial(jax.jit, static_argnames=("keep_n", "precision"), donate_argnums=(2, 3))
def _match_merge_step(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    best_scores: jnp.ndarray,
    best_idx: jnp.ndarray,
    index_offset: jnp.ndarray,
    keep_n: int,
    precision: str = "highest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Match one dictionary tile and fold it into the carried top-k."""
    sim = jnp.matmul(
        exp_prepared,
        dict_prepared.T,
        precision=_PRECISIONS[precision],
        preferred_element_type=exp_prepared.dtype,
    )
    k_tile = min(keep_n, sim.shape[1])
    tile_scores, tile_idx = jax.lax.top_k(sim, k_tile)
    tile_idx = (tile_idx + index_offset).astype(jnp.int32)
    all_scores = jnp.concatenate([best_scores, tile_scores], axis=1)
    all_idx = jnp.concatenate([best_idx, tile_idx], axis=1)
    new_scores, pos = jax.lax.top_k(all_scores, keep_n)
    new_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return new_scores, new_idx


@partial(jax.jit, static_argnames=("keep_n",))
def merge_topk(
    scores_a: jnp.ndarray,
    idx_a: jnp.ndarray,
    scores_b: jnp.ndarray,
    idx_b: jnp.ndarray,
    keep_n: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two top-k result sets (e.g. from two dictionary shards)."""
    all_scores = jnp.concatenate([scores_a, scores_b], axis=1)
    all_idx = jnp.concatenate([idx_a, idx_b], axis=1)
    new_scores, pos = jax.lax.top_k(all_scores, keep_n)
    new_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return new_scores, new_idx


@partial(jax.jit, static_argnames=("keep_n", "tile", "precision", "approx"))
def _index_resident(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    keep_n: int,
    tile: int,
    precision: str = "highest",
    approx: bool = False,
    dict_q: jnp.ndarray | None = None,
    dict_scale: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully on-device DI over a resident, already-prepared dictionary:
    an unrolled static-tile loop (tile starts are compile-time
    constants) whose per-tile top-k candidates merge in one final exact
    ``top_k``. With ``approx``, per-tile candidates come from the
    transposed group-compressed selection (:func:`_group_topk_T`:
    true top-1 guaranteed, deeper ranks lose only on group collisions,
    ~1.8x faster than the exact per-tile ``lax.top_k``).

    Reduced-precision candidate selection + exact rescoring
    (``precision="mixed"`` or ``"int8"``): the O(n*m*d) selection matmul
    runs in single-pass bfloat16 ("mixed", 126 TF/s measured on v5e vs
    28.9 for f32 HIGHEST) or rowwise max-abs-quantized int8 ("int8",
    206 TOP/s), carrying ``2*keep_n`` candidates per pattern; the
    surviving candidates are then rescored at float32
    ``Precision.HIGHEST``, so final scores are f32-exact. A true
    top-keep_n entry is lost only if selection rounding error (~4e-3
    absolute for bf16, ~1e-2 relative for int8, on unit-norm NCC
    scores) pushes it below the carried 2*keep_n-th candidate; callers
    wanting guarantees validate against a "highest" subset (as
    ``bench.py`` does)."""
    n_exp = exp_prepared.shape[0]
    m = dict_prepared.shape[0]
    dtype = exp_prepared.dtype

    reduced = precision in ("mixed", "int8")
    if reduced:
        # Carry extra candidates so selection ranking noise near the
        # keep_n boundary is corrected by the exact rescore.
        k_carry = min(max(2 * keep_n, keep_n + 8), m)
    else:
        k_carry = keep_n

    # The "f16" tier materializes the (n_exp, tile) score block as
    # float16 — halving the block's HBM write + the top-k's read
    # traffic — and converts back to f32 AT THE TOP-K INPUT: exact
    # lax.top_k on float16 keys hits a slow lowering on this backend
    # (measured ~9x slower than the f32 pass, BENCH_NOTES.md "f16
    # top-k trap"), while a convert fused into the top-k operand read
    # is free. f16's 11-bit mantissa bounds the rounding of an NCC
    # score in [-1, 1] by 2.44e-4 absolute — inside the 1e-3 agreement
    # gate — so the tier needs no rescore. int8/mixed selection stays
    # f32 (their rescore makes extra selection rounding pointless and
    # the int32->f32 scale product is already fused).
    # With approx (transposed selection), int8/mixed also materialize
    # f16 — their exact rescore makes the extra rounding free, and the
    # halved HBM write is the dominant saving (write bandwidth measured
    # ~62 GB/s on this stack vs ~200 read; BENCH_NOTES.md round-2).
    sel_dtype = (
        jnp.float16
        if precision == "f16" or (approx and precision in ("int8", "mixed"))
        else dtype
    )

    if precision == "int8":
        # exp rows share a scale per row, which is rank-invariant per
        # pattern and across tiles, so only the dictionary-side scales
        # enter the selection scores. The dictionary-side quantization
        # is hoisted out entirely when a PreparedDictionary supplies
        # dict_q/dict_scale (reused across calls).
        exp_q, _ = _quantize_rows_int8(exp_prepared)
        if dict_q is None:
            dict_q, dict_scale = _quantize_rows_int8(dict_prepared)

        def sel_scores(block_q, block_scale):
            d = jax.lax.dot_general(
                exp_q,
                block_q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (d.astype(dtype) * block_scale[None, :]).astype(sel_dtype)

        def sel_block(start, size):
            return sel_scores(
                dict_q[start : start + size], dict_scale[start : start + size]
            )

        def sel_scores_T(block_q, block_scale):
            d = jax.lax.dot_general(
                block_q,
                exp_q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (d.astype(dtype) * block_scale[:, None]).astype(sel_dtype)

        def sel_block_T(start, size):
            return sel_scores_T(
                dict_q[start : start + size], dict_scale[start : start + size]
            )

    else:
        if precision == "mixed":
            exp_mm = exp_prepared.astype(jnp.bfloat16)
            # Precision is numerically moot for bf16 inputs (single MXU
            # pass, 126 TF/s measured round 2 vs 28.9 for f32 HIGHEST;
            # BENCH_NOTES.md "Round 2: tier re-measurement").
            mm_precision = jax.lax.Precision.HIGHEST
        elif precision == "f16":
            exp_mm = exp_prepared
            mm_precision = jax.lax.Precision.DEFAULT
        else:
            exp_mm = exp_prepared
            mm_precision = _PRECISIONS[precision]

        def _match(block):
            if precision == "mixed":
                block = block.astype(jnp.bfloat16)
            sim = jnp.matmul(
                exp_mm,
                block.T,
                precision=mm_precision,
                preferred_element_type=dtype,
            )
            # The f32->f16 convert fuses into the matmul epilogue; the
            # f32 block never reaches HBM.
            return sim.astype(sel_dtype)

        def sel_block(start, size):
            return _match(dict_prepared[start : start + size])

        def _match_T(block):
            if precision == "mixed":
                block = block.astype(jnp.bfloat16)
            sim = jnp.matmul(
                block,
                exp_mm.T,
                precision=mm_precision,
                preferred_element_type=dtype,
            )
            return sim.astype(sel_dtype)

        def sel_block_T(start, size):
            return _match_T(dict_prepared[start : start + size])

    def tile_topk(sim, k):
        sim = sim.astype(dtype)  # no-op except the f16 tier (see above)
        return jax.lax.top_k(sim, k)

    # Unrolled static-tile loop: tile starts/sizes are compile-time
    # constants (m and tile are static), so static slices let XLA fuse
    # the dictionary reads straight into the matmuls — a lax.scan with
    # dynamic_slice measured ~40% slower on the f16+approx tier (the
    # sliced 720 MB tile copy materializes at the slow HBM write
    # bandwidth; BENCH_NOTES.md round-2 "scan vs unrolled"). But HLO
    # size (and this stack's multi-minute remote compiles) grows
    # linearly with the tile count, so past _MAX_UNROLL_TILES full
    # tiles the loop switches to a lax.scan with a carried top-k —
    # slower per tile, compile-time bounded.
    n_full = m // tile
    if n_full > _MAX_UNROLL_TILES and tile >= k_carry:
        # Trace-time notice (fires once per compilation): the scan path
        # measured ~44% slower per tile than the unrolled loop at wafer
        # scale (BENCH_NOTES round 5) — callers can often avoid it by
        # raising n_per_iteration so m // tile <= _MAX_UNROLL_TILES.
        _logger.info(
            "dictionary tiling: %d tiles exceed the %d-tile unroll "
            "limit; using the lax.scan carried-top-k path (~40%% "
            "slower per tile). A larger n_per_iteration may avoid it.",
            n_full,
            _MAX_UNROLL_TILES,
        )
        d_feat = dict_prepared.shape[1]
        m_main = n_full * tile

        def scan_body(carry, xs):
            bs, bi, start = carry
            if precision == "int8":
                block_q, block_scale = xs
                simT_or_sim = (
                    sel_scores_T(block_q, block_scale)
                    if approx
                    else sel_scores(block_q, block_scale)
                )
            else:
                simT_or_sim = _match_T(xs) if approx else _match(xs)
            if approx:
                ts, ti = _group_topk_T(simT_or_sim, k_carry)
            else:
                ts, ti = tile_topk(simT_or_sim, k_carry)
            all_s = jnp.concatenate([bs, ts.astype(bs.dtype)], axis=1)
            all_i = jnp.concatenate(
                [bi, (ti + start).astype(jnp.int32)], axis=1
            )
            ns, pos = jax.lax.top_k(all_s, k_carry)
            ni = jnp.take_along_axis(all_i, pos, axis=1)
            return (ns, ni, start + tile), None

        if precision == "int8":
            xs = (
                dict_q[:m_main].reshape(n_full, tile, -1),
                dict_scale[:m_main].reshape(n_full, tile),
            )
        else:
            xs = dict_prepared[:m_main].reshape(n_full, tile, d_feat)
        init = (
            jnp.full((n_exp, k_carry), -jnp.inf, dtype=dtype),
            jnp.zeros((n_exp, k_carry), dtype=jnp.int32),
            jnp.int32(0),
        )
        (scores, idx, _), _ = jax.lax.scan(scan_body, init, xs)
        if m_main < m:  # tail tile, statically sliced + merged
            size = m - m_main
            if approx:
                t_scores, t_idx = _group_topk_T(
                    sel_block_T(m_main, size), min(k_carry, size)
                )
            else:
                t_scores, t_idx = tile_topk(
                    sel_block(m_main, size), min(k_carry, size)
                )
            all_s = jnp.concatenate(
                [scores, t_scores.astype(scores.dtype)], axis=1
            )
            all_i = jnp.concatenate(
                [idx, (t_idx + m_main).astype(jnp.int32)], axis=1
            )
            scores, pos = jax.lax.top_k(all_s, k_carry)
            idx = jnp.take_along_axis(all_i, pos, axis=1)
    else:
        parts_s, parts_i = [], []
        for start in range(0, m, tile):
            size = min(tile, m - start)
            if approx:
                simT = sel_block_T(start, size)
                t_scores, t_idx = _group_topk_T(simT, min(k_carry, size))
            else:
                sim = sel_block(start, size)
                t_scores, t_idx = tile_topk(sim, min(k_carry, size))
            parts_s.append(t_scores)
            parts_i.append((t_idx + start).astype(jnp.int32))
        if len(parts_s) == 1:
            scores, idx = parts_s[0], parts_i[0]
        else:
            all_s = jnp.concatenate(parts_s, axis=1)
            all_i = jnp.concatenate(parts_i, axis=1)
            scores, pos = jax.lax.top_k(all_s, k_carry)
            idx = jnp.take_along_axis(all_i, pos, axis=1)

    if reduced:
        scores, idx = _rescore_candidates(
            exp_prepared, dict_prepared, idx, keep_n
        )
    elif scores.dtype != dtype:
        # "f16" tier: indices are exact (mod f16-tie ordering); scores
        # carry the <=2.44e-4 materialization rounding.
        scores = scores.astype(dtype)
    return scores, idx


def _index_pallas_int8(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    keep_n: int,
    dict_q: jnp.ndarray | None = None,
    dict_scale: jnp.ndarray | None = None,
    tile_n: int = 512,
    tile_m: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The low-HBM indexing tier (``precision="pallas-int8"``): the
    fused Pallas kernel (:func:`kikuchipy_tpu.ops.pallas_di.
    ncc_match_topk_pallas_v5`) multiplies int8-quantized operands on the
    MXU and folds each score block into a VMEM-resident running top-k —
    the ``(n, m)`` score matrix NEVER materializes in HBM (peak HBM =
    operands + the ``(n, k)`` results, vs ``n*m*2`` bytes for the f16
    XLA tier: 3.2 GB at 16k x 100k). Selection is int8-approximate;
    survivors are rescored exactly at f32 ``Precision.HIGHEST``, so
    final scores are exact for all candidates that survive selection
    (same contract as ``precision="int8"``). ~35% slower than the XLA
    f16 tier on-chip (BENCH_NOTES.md round-2: Mosaic extraction stalls
    the inter-block pipeline) — use it when the score block's HBM
    footprint, not speed, is the constraint.

    The experimental side is padded to a ``tile_n`` multiple with
    repeated rows (dropped from the result); a dictionary remainder
    past the last full ``tile_m`` tile is matched by an exact XLA pass
    and merged before rescoring.
    """
    import jax as _jax

    from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v5

    n, d = exp_prepared.shape
    m = dict_prepared.shape[0]
    k_carry = min(max(2 * keep_n, keep_n + 8), m)
    interpret = _jax.default_backend() == "cpu"

    if dict_q is None:
        dict_q, dict_scale = jax.jit(_quantize_rows_int8)(dict_prepared)
    exp_q, exp_scale = jax.jit(_quantize_rows_int8)(exp_prepared)

    tile_n = min(tile_n, max(8, -(-n // 8) * 8))
    n_pad = (-n) % tile_n
    if n_pad:
        exp_q = jnp.concatenate(
            [exp_q, jnp.broadcast_to(exp_q[:1], (n_pad, d))], axis=0
        )

    # Small dictionaries: shrink the tile so the fused kernel still
    # covers most rows (int8 sublane tiling wants multiples of 32).
    if m < tile_m:
        tile_m = max(32, (m // 32) * 32)
    m_main = (m // tile_m) * tile_m if m >= 32 else 0
    cand_s, cand_i = [], []
    if m_main:
        k_main = min(k_carry, m_main)
        s, i = ncc_match_topk_pallas_v5(
            exp_q,
            dict_q[:m_main],
            dict_scale[:m_main],
            k=k_main,
            tile_n=tile_n,
            tile_m=tile_m,
            interpret=interpret,
        )
        # The kernel omits the per-row experimental scale (it is
        # rank-invariant WITHIN a row); restore it so kernel candidates
        # merge on the same scale as the exact remainder scores.
        cand_s.append(s[:n] * exp_scale[:, None])
        cand_i.append(i[:n])
    if m - m_main:
        # Remainder tile via the exact XLA pass (small: < tile_m rows).
        sim = jnp.matmul(
            exp_prepared,
            dict_prepared[m_main:].T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=exp_prepared.dtype,
        )
        s, i = jax.lax.top_k(sim, min(k_carry, m - m_main))
        cand_s.append(s)
        cand_i.append((i + m_main).astype(jnp.int32))
    if len(cand_s) == 1:
        idx = cand_i[0]
    else:
        all_s = jnp.concatenate(cand_s, axis=1)
        all_i = jnp.concatenate(cand_i, axis=1)
        _, pos = jax.lax.top_k(all_s, min(k_carry, all_s.shape[1]))
        idx = jnp.take_along_axis(all_i, pos, axis=1)
    return _rescore_candidates(exp_prepared, dict_prepared, idx, keep_n)


def _rescore_candidates(
    exp_prepared: jnp.ndarray,
    dict_prepared: jnp.ndarray,
    cand_idx: jnp.ndarray,
    keep_n: int,
    slab: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact f32 rescoring of per-pattern candidate sets.

    Gathers the candidates' dictionary rows (a DMA-friendly row gather;
    slabbed over patterns to bound the ``(slab, k_c, d)`` buffer) and
    recomputes their scores at ``Precision.HIGHEST``, then keeps the
    exact top ``keep_n``."""
    n_exp = exp_prepared.shape[0]
    out_s, out_i = [], []
    for s0 in range(0, n_exp, slab):
        e = exp_prepared[s0 : s0 + slab]
        ci = cand_idx[s0 : s0 + slab]
        rows = jnp.take(dict_prepared, ci, axis=0)
        sc = jnp.einsum(
            "nd,nkd->nk", e, rows, precision=jax.lax.Precision.HIGHEST
        )
        s, pos = jax.lax.top_k(sc, keep_n)
        i = jnp.take_along_axis(ci, pos, axis=1)
        out_s.append(s)
        out_i.append(i)
    if len(out_s) == 1:
        return out_s[0], out_i[0]
    return jnp.concatenate(out_s, axis=0), jnp.concatenate(out_i, axis=0)


@partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf: jnp.ndarray, block: jnp.ndarray, start) -> jnp.ndarray:
    """In-place (donated) row write into a preallocated device buffer."""
    return jax.lax.dynamic_update_slice(buf, block, (start, jnp.int32(0)))


def _project_dictionary_resident(
    project_fn, rotations, metric, keep_idx, m, d_feat, proj_tile, progress
) -> jnp.ndarray:
    """Project + prepare the virtual dictionary into ONE preallocated
    HBM buffer (donated in-place row writes), so peak memory is the
    buffer itself — not buffer + per-tile block list + a concatenate
    copy (~2x transient near the residency threshold)."""
    buf = jnp.zeros((m, d_feat), dtype=metric.dtype)
    for start in range(0, m, proj_tile):
        if progress is not None:
            progress(start, m)
        end = min(start + proj_tile, m)
        block = metric.prepare(project_fn(rotations[start:end]), keep_idx)
        buf = _write_rows(buf, block, jnp.int32(start))
    return buf


def _default_tile(n_exp: int, budget_bytes: int = 2 << 30) -> int:
    """Dictionary tile size bounding the similarity block
    (n_exp x tile x 4 bytes) to ~2 GiB; larger tiles measured faster on
    v5e up to this budget (see PROGRESS: 45.7k pps at tile 6250 vs
    54.4k at 50000 for n_exp=8192)."""
    return max(4096, budget_bytes // (4 * max(n_exp, 1)))


def dictionary_index(
    experimental: jnp.ndarray | np.ndarray,
    dictionary: jnp.ndarray | np.ndarray | None = None,
    keep_n: int = 20,
    n_per_iteration: int | None = None,
    metric: str | SimilarityMetric = "ncc",
    signal_mask: np.ndarray | None = None,
    navigation_mask: np.ndarray | None = None,
    dictionary_tiles: Iterable[tuple[int, np.ndarray]] | None = None,
    project_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    rotations: jnp.ndarray | None = None,
    dictionary_size: int | None = None,
    precision: str = "highest",
    approx_topk: bool = False,
    verbose: bool = False,
    progress=None,
) -> DictionaryIndexingResult:
    """Index experimental patterns against a dictionary.

    Exactly one dictionary source must be given:

    - ``dictionary``: an in-memory array ``(m, sy, sx)`` / ``(m, d)``,
      or a :class:`PreparedDictionary` (from
      :func:`prepare_dictionary`) whose preparation — and int8
      quantization, for ``precision="int8"`` — is reused across calls;
    - ``dictionary_tiles``: an iterable of ``(start_index, tile_array)``
      for host-streamed dictionaries larger than memory;
    - ``project_fn`` + ``rotations``: a device callback generating
      dictionary tiles on the fly (fused dictionary generation).

    Parameters
    ----------
    experimental
        ``(..., sy, sx)`` experimental patterns (leading axes flattened).
    keep_n
        Number of best matches kept per pattern.
    n_per_iteration
        Dictionary tile size (default 4096, clamped to the dictionary
        size). Controls peak memory: the score block is
        ``n_experimental x n_per_iteration``.
    metric
        "ncc" (default) or "ndp", or a :class:`SimilarityMetric`.
    signal_mask
        Boolean detector-pixel mask, True = exclude (reference
        convention).
    navigation_mask
        Boolean map mask over the flattened navigation grid, True =
        exclude the pattern from indexing. Scores for excluded patterns
        are returned as NaN and indices as -1.
    precision
        Matmul precision for the in-memory ``dictionary`` path:
        "highest" (default, f32-exact), "high", "default", "f16"
        (f32-class matmul with scores materialized as float16 — exact
        indices, scores within 2.44e-4, roughly half the top-k's HBM
        traffic), "mixed" (bf16 candidate selection + exact f32
        rescoring of the survivors), "int8" (quantized selection +
        exact rescoring; pre-quantized once when the dictionary is a
        :class:`PreparedDictionary`), or "pallas-int8" (the fused
        Pallas kernel: the ``(n, m)`` score block never materializes in
        HBM — the low-memory option for huge scans x huge dictionaries;
        see :func:`_index_pallas_int8`). See :func:`_index_resident`.
    progress
        Optional callback ``progress(done, total)`` invoked per
        dictionary tile in the streaming paths (the reference shows a
        tqdm bar here, ``_dictionary_indexing.py:105``).

    Returns
    -------
    DictionaryIndexingResult
    """
    metric = get_metric(metric)
    experimental = jnp.asarray(experimental)
    if experimental.ndim > 2:
        experimental = experimental.reshape(
            (-1,) + experimental.shape[-2:]
        )
    n_all = experimental.shape[0]
    sig_size = int(np.prod(experimental.shape[1:]))

    nav_keep = None
    if navigation_mask is not None:
        nav_mask = np.asarray(navigation_mask).ravel()
        if nav_mask.size != n_all:
            raise ValueError(
                f"navigation_mask has {nav_mask.size} elements, expected {n_all}"
            )
        nav_keep = np.nonzero(~nav_mask)[0]
        experimental = jnp.take(experimental, jnp.asarray(nav_keep), axis=0)

    keep_idx = signal_mask_to_idx(signal_mask, sig_size)
    keep_idx = None if keep_idx is None else jnp.asarray(keep_idx)
    exp_prepared = metric.prepare(experimental, keep_idx)
    n_exp = exp_prepared.shape[0]

    t0 = time.perf_counter()

    if dictionary is not None:
        dict_q = dict_scale = None
        if isinstance(dictionary, PreparedDictionary):
            if dictionary.metric_name != metric.name:
                raise ValueError(
                    f"PreparedDictionary was prepared with metric "
                    f"{dictionary.metric_name!r}, requested {metric.name!r}"
                )
            if dictionary.n_features != exp_prepared.shape[1]:
                raise ValueError(
                    f"signal_mask mismatch: PreparedDictionary keeps "
                    f"{dictionary.n_features} pixels but the indexing-"
                    f"time signal_mask keeps {exp_prepared.shape[1]} — "
                    f"pass the same signal_mask to prepare_dictionary "
                    f"and dictionary_index"
                )
            if (
                dictionary.mask_hash is not None
                and dictionary.mask_hash != _mask_hash(keep_idx)
            ):
                raise ValueError(
                    "signal_mask mismatch: the mask used at "
                    "prepare_dictionary time selects a different pixel "
                    "set than the indexing-time signal_mask (same size, "
                    "different pixels) — scores would be misaligned"
                )
            dict_prepared = dictionary.prepared
            if precision in ("int8", "pallas-int8"):
                dict_q, dict_scale = dictionary.quantized_int8()
        else:
            dictionary = jnp.asarray(dictionary)
            dict_prepared = metric.prepare(dictionary, keep_idx)
        m = dict_prepared.shape[0]
        keep_n_eff = min(keep_n, m)
        if precision == "pallas-int8":
            scores, idx = _index_pallas_int8(
                exp_prepared, dict_prepared, keep_n_eff, dict_q, dict_scale
            )
        else:
            tile = min(n_per_iteration or _default_tile(n_exp), m)
            scores, idx = _index_resident(
                exp_prepared, dict_prepared, keep_n_eff, tile, precision,
                approx_topk, dict_q, dict_scale,
            )
    elif project_fn is not None:
        if rotations is None:
            raise ValueError("project_fn requires rotations")
        rotations = jnp.asarray(rotations)
        m = rotations.shape[0]
        keep_n_eff = min(keep_n, m)
        d_feat = int(exp_prepared.shape[1])
        # "Fused" means no HOST round-trip — the projected dictionary
        # may still materialize in HBM, where it is cheap (452 MB for
        # 31k x 3600) and unlocks the fast _index_resident path
        # (transposed group-top-k etc.). Only when the prepared
        # dictionary would not fit the HBM budget does the per-tile
        # project-and-merge loop take over.
        if m * d_feat * 4 <= 4 << 30:
            proj_tile = min(n_per_iteration or 8192, m)
            dict_prepared = _project_dictionary_resident(
                project_fn, rotations, metric, keep_idx, m, d_feat,
                proj_tile, progress,
            )
            tile = min(n_per_iteration or _default_tile(n_exp), m)
            scores, idx = _index_resident(
                exp_prepared, dict_prepared, keep_n_eff, tile, precision,
                approx_topk,
            )
        else:
            tile = min(n_per_iteration or 4096, m)
            scores = jnp.full(
                (n_exp, keep_n_eff), -jnp.inf, dtype=metric.dtype
            )
            idx = jnp.zeros((n_exp, keep_n_eff), dtype=jnp.int32)
            for start in range(0, m, tile):
                end = min(start + tile, m)
                if progress is not None:
                    progress(start, m)
                block = project_fn(rotations[start:end])
                block_prepared = metric.prepare(block, keep_idx)
                scores, idx = _match_merge_step(
                    exp_prepared,
                    block_prepared,
                    scores,
                    idx,
                    jnp.int32(start),
                    keep_n_eff,
                )
    elif dictionary_tiles is not None:
        if dictionary_size is None:
            raise ValueError("dictionary_tiles requires dictionary_size")
        m = dictionary_size
        keep_n_eff = min(keep_n, m)
        scores = jnp.full((n_exp, keep_n_eff), -jnp.inf, dtype=metric.dtype)
        idx = jnp.zeros((n_exp, keep_n_eff), dtype=jnp.int32)
        for start, block in dictionary_tiles:
            if progress is not None:
                progress(start, m)
            block_prepared = metric.prepare(jnp.asarray(block), keep_idx)
            scores, idx = _match_merge_step(
                exp_prepared,
                block_prepared,
                scores,
                idx,
                jnp.int32(start),
                keep_n_eff,
            )
    else:
        raise ValueError(
            "Provide one of dictionary, dictionary_tiles, or project_fn"
        )

    scores = np.asarray(jax.block_until_ready(scores))
    idx = np.asarray(idx)
    dt = time.perf_counter() - t0
    pps = n_exp / dt
    cps = n_exp * m / dt
    if verbose:
        print(
            f"  Indexing speed: {pps:.5f} patterns/s, {cps:.5f} comparisons/s"
        )

    # Sanity check: for *unrelated* unit-norm patterns the best of m NCC
    # scores concentrates near sqrt(2 ln m / d) (extreme value of m
    # N(0, 1/d) correlations). A mean top-1 within 1.5x of that null
    # level means the dictionary is statistically indistinguishable from
    # random w.r.t. these patterns — almost always a wrong projection
    # center / convention, wrong tilts, or wrong phase.
    if scores.size and m > 1:
        d_feat = int(exp_prepared.shape[1])
        null_level = float(np.sqrt(2.0 * np.log(m) / max(d_feat, 2)))
        top1_mean = float(np.nanmean(scores[:, 0]))
        if top1_mean < 1.5 * null_level:
            _logger.warning(
                "Mean best score %.3f is close to the chance level %.3f "
                "for %d random dictionary patterns: the dictionary may "
                "not describe these patterns. Check the projection "
                "center (and its convention), sample/camera tilts, and "
                "the phase.",
                top1_mean,
                null_level,
                m,
            )

    if nav_keep is not None:
        scores_all = np.full((n_all, scores.shape[1]), np.nan, dtype=scores.dtype)
        idx_all = np.full((n_all, idx.shape[1]), -1, dtype=idx.dtype)
        scores_all[nav_keep] = scores
        idx_all[nav_keep] = idx
        scores, idx = scores_all, idx_all

    return DictionaryIndexingResult(
        scores=scores,
        simulation_indices=idx,
        patterns_per_second=pps,
        comparisons_per_second=cps,
    )
