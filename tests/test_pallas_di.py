"""Fused Pallas NCC+top-k kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(256, 256)).astype(np.float32)
    d = rng.normal(size=(1024, 256)).astype(np.float32)
    return jnp.asarray(e), jnp.asarray(d)


class TestPallasKernel:
    def test_matches_lax_topk(self, problem):
        e, d = problem
        s, i = ncc_match_topk_pallas(
            e, d, k=10, tile_n=128, tile_m=256, interpret=True
        )
        ref_s, ref_i = jax.lax.top_k(e @ d.T, 10)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_multiple_dict_tiles(self, problem):
        e, d = problem
        # tile_m=128 -> 8 sequential merge steps
        s, i = ncc_match_topk_pallas(
            e, d, k=5, tile_n=128, tile_m=128, interpret=True
        )
        ref_s, ref_i = jax.lax.top_k(e @ d.T, 5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_bad_tiling_raises(self, problem):
        e, d = problem
        with pytest.raises(ValueError, match="multiples"):
            ncc_match_topk_pallas(e[:100], d, k=5, interpret=True)


class TestPallasKernelV3:
    def test_v3_matches_lax_topk(self, problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v3

        e, d = problem
        s, i = ncc_match_topk_pallas_v3(
            e, d, k=7, tile_n=128, tile_m=256, tile_d=128, interpret=True
        )
        ref_s, ref_i = jax.lax.top_k(e @ d.T, 7)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_v3_bad_tiling(self, problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v3

        e, d = problem
        with pytest.raises(ValueError, match="multiple of 128"):
            ncc_match_topk_pallas_v3(e, d, k=5, tile_d=100, interpret=True)


class TestPallasKernelV4:
    def test_v4_matches_bf16_topk_exactly(self, problem):
        """v4 (bf16 matmul + streaming-insertion top-k) must be
        bit-identical to XLA's bf16 matmul + lax.top_k, including tie
        ordering (stable, lowest index first)."""
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v4

        e, d = problem
        # Plant exact duplicates to exercise tie-breaking.
        d = np.array(d, copy=True)
        d[10] = d[50] = np.asarray(e)[0]
        d = jnp.asarray(d)
        s, i = ncc_match_topk_pallas_v4(
            e, d, k=7, tile_n=128, tile_m=256, interpret=True
        )
        sim = jnp.matmul(
            e.astype(jnp.bfloat16),
            d.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        ref_s, ref_i = jax.lax.top_k(sim, 7)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_v4_pads_contraction(self, problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v4

        e, d = problem
        # Odd d: zero-padded to a lane multiple internally.
        e2 = e[:, :200]
        d2 = d[:, :200]
        s, i = ncc_match_topk_pallas_v4(
            e2, d2, k=5, tile_n=128, tile_m=256, interpret=True
        )
        sim = jnp.matmul(
            e2.astype(jnp.bfloat16),
            d2.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        ref_s, ref_i = jax.lax.top_k(sim, 5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_v4_bad_tiling_raises(self, problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v4

        e, d = problem
        with pytest.raises(ValueError, match="multiples"):
            ncc_match_topk_pallas_v4(e[:100], d, k=5, interpret=True)


class TestV5Int8:
    """Fused int8 matmul + top-k (v5): pre-quantized rows, per-dict-row
    scales, optional per-group compression (see pallas_di.py)."""

    @pytest.fixture
    def q_problem(self):
        from kikuchipy_tpu.indexing.di import _quantize_rows_int8

        rng = np.random.default_rng(3)
        e = jnp.asarray(rng.normal(size=(16, 100)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(128, 100)).astype(np.float32))
        eq, _ = _quantize_rows_int8(e)
        dq, ds = _quantize_rows_int8(d)
        ref = (
            np.asarray(eq, np.int32) @ np.asarray(dq, np.int32).T
        ).astype(np.float32) * np.asarray(ds)[None, :]
        return eq, dq, ds, ref

    def test_v5_exact_group1(self, q_problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v5

        eq, dq, ds, ref = q_problem
        s, i = ncc_match_topk_pallas_v5(
            eq, dq, ds, 5, tile_n=8, tile_m=32, interpret=True
        )
        rs, ri = jax.lax.top_k(jnp.asarray(ref), 5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs))

    def test_v5_group_compression(self, q_problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v5

        eq, dq, ds, ref = q_problem
        g, tile_m = 8, 32
        s8, i8 = ncc_match_topk_pallas_v5(
            eq, dq, ds, 5, tile_n=8, tile_m=tile_m, interpret=True, group=g
        )
        # Interleaved groups PER TILE: within tile j, group t holds
        # columns {t, t+G, ...} of the tile (G = tile_m / g).
        n, m = ref.shape
        G = tile_m // g
        tiles = ref.reshape(n, m // tile_m, g, G)     # (n, tiles, g, G)
        gmax = tiles.max(axis=2)                       # (n, tiles, G)
        goff = tiles.argmax(axis=2)                    # slice index jj
        base = (np.arange(m // tile_m) * tile_m)[None, :, None]
        gids = base + goff * G + np.arange(G)[None, None, :]
        gmax = gmax.reshape(n, -1)
        gids = gids.reshape(n, -1)
        rs, rpos = jax.lax.top_k(jnp.asarray(gmax), 5)
        ri = np.take_along_axis(gids, np.asarray(rpos), axis=1)
        np.testing.assert_array_equal(np.asarray(i8), ri)
        np.testing.assert_allclose(np.asarray(s8), np.asarray(rs))

    def test_v5_group_must_divide(self, q_problem):
        from kikuchipy_tpu.ops.pallas_di import ncc_match_topk_pallas_v5

        eq, dq, ds, _ = q_problem
        with pytest.raises(ValueError, match="group"):
            ncc_match_topk_pallas_v5(
                eq, dq, ds, 5, tile_n=8, tile_m=32, interpret=True, group=7
            )


class TestPallasInt8Tier:
    """precision="pallas-int8" in dictionary_index: the user-reachable
    low-HBM tier (VERDICT r3 item 6) — fused kernel selection + exact
    f32 rescore, remainder tile via XLA, exp padding dropped."""

    def _problem(self, n=20, m=150, d=100, seed=5):
        rng = np.random.default_rng(seed)
        exp = rng.normal(size=(n, d)).astype(np.float32)
        dic = rng.normal(size=(m, d)).astype(np.float32)
        # Plant clear matches so int8 selection keeps the true top-1.
        dic[:n] = exp + 0.5 * rng.normal(size=(n, d)).astype(np.float32)
        return exp, dic

    def test_matches_exact_tier(self):
        from kikuchipy_tpu.indexing.di import dictionary_index

        exp, dic = self._problem()
        res_exact = dictionary_index(exp, dic, keep_n=5)
        res_pallas = dictionary_index(exp, dic, keep_n=5, precision="pallas-int8")
        np.testing.assert_array_equal(
            res_pallas.simulation_indices[:, 0],
            res_exact.simulation_indices[:, 0],
        )
        # Rescore makes surviving candidates' scores f32-exact.
        top1_exact = res_exact.scores[:, 0]
        top1_pallas = res_pallas.scores[:, 0]
        np.testing.assert_allclose(top1_pallas, top1_exact, atol=1e-6)

    def test_prepared_dictionary_reuses_quantization(self):
        from kikuchipy_tpu.indexing.di import (
            dictionary_index,
            prepare_dictionary,
        )

        exp, dic = self._problem(n=12, m=96)
        prep = prepare_dictionary(dic, quantize=True)
        res = dictionary_index(exp, prep, keep_n=3, precision="pallas-int8")
        res_exact = dictionary_index(exp, dic, keep_n=3)
        np.testing.assert_array_equal(
            res.simulation_indices[:, 0], res_exact.simulation_indices[:, 0]
        )

    def test_remainder_only_dictionary(self):
        # m < 32: everything through the exact XLA remainder pass.
        from kikuchipy_tpu.indexing.di import dictionary_index

        exp, dic = self._problem(n=6, m=20)
        res = dictionary_index(exp, dic, keep_n=4, precision="pallas-int8")
        res_exact = dictionary_index(exp, dic, keep_n=4)
        np.testing.assert_array_equal(
            res.simulation_indices, res_exact.simulation_indices
        )
        np.testing.assert_allclose(res.scores, res_exact.scores, atol=1e-6)

    def test_best_match_in_remainder_tile(self):
        # Plant the TRUE best matches past the last full kernel tile
        # (m=150 -> m_main=128, remainder 129..149): the kernel's
        # scale-corrected candidates must merge correctly with the
        # exact remainder pass (regression: uncorrected kernel scores
        # dominated the merge and dropped remainder winners).
        from kikuchipy_tpu.indexing.di import dictionary_index

        rng = np.random.default_rng(9)
        n, m, d = 16, 150, 100
        exp = rng.normal(size=(n, d)).astype(np.float32)
        dic = rng.normal(size=(m, d)).astype(np.float32)
        dic[130 : 130 + n] = exp + 0.3 * rng.normal(size=(n, d)).astype(
            np.float32
        )
        res = dictionary_index(exp, dic, keep_n=5, precision="pallas-int8")
        res_exact = dictionary_index(exp, dic, keep_n=5)
        np.testing.assert_array_equal(
            res.simulation_indices[:, 0], res_exact.simulation_indices[:, 0]
        )
        assert (res.simulation_indices[:, 0] == np.arange(130, 130 + n)).all()
        np.testing.assert_allclose(
            res.scores[:, 0], res_exact.scores[:, 0], atol=1e-6
        )
