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
