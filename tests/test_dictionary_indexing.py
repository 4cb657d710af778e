"""Dictionary indexing engine tests.

Mirrors the reference's self-matching strategy
(/root/reference/tests/test_indexing/test_dictionary_indexing.py:27-60):
a dictionary equal to the experimental patterns must index every pattern
to itself with NCC score ~1.
"""

import numpy as np
import pytest

from kikuchipy_tpu.indexing.di import dictionary_index, merge_topk
from kikuchipy_tpu.indexing.metrics import get_metric, ncc, ndp, signal_mask_to_idx


@pytest.fixture
def exp(dummy_patterns):
    return dummy_patterns.reshape(9, 3, 3).astype(np.float32)


class TestSelfMatching:
    def test_self_match_ncc(self, exp):
        res = dictionary_index(exp, dictionary=exp, keep_n=1)
        np.testing.assert_allclose(res.scores[:, 0], 1.0, atol=1e-6)
        np.testing.assert_array_equal(res.simulation_indices[:, 0], np.arange(9))

    def test_self_match_ndp(self, exp):
        res = dictionary_index(exp, dictionary=exp, keep_n=1, metric="ndp")
        np.testing.assert_allclose(res.scores[:, 0], 1.0, atol=1e-6)
        np.testing.assert_array_equal(res.simulation_indices[:, 0], np.arange(9))

    def test_keep_n_clamped(self, exp):
        res = dictionary_index(exp, dictionary=exp, keep_n=100)
        assert res.scores.shape == (9, 9)
        # Scores sorted descending per row
        assert np.all(np.diff(res.scores, axis=1) <= 1e-7)

    def test_4d_nav_input(self, dummy_patterns):
        res = dictionary_index(
            dummy_patterns.astype(np.float32),
            dictionary=dummy_patterns.reshape(9, 3, 3).astype(np.float32),
            keep_n=1,
        )
        np.testing.assert_array_equal(res.simulation_indices[:, 0], np.arange(9))


class TestChunking:
    @pytest.mark.parametrize("tile", [1, 2, 3, 4, 9])
    def test_tile_size_invariance(self, exp, tile):
        full = dictionary_index(exp, dictionary=exp, keep_n=3)
        tiled = dictionary_index(exp, dictionary=exp, keep_n=3, n_per_iteration=tile)
        np.testing.assert_allclose(tiled.scores, full.scores, atol=1e-6)
        np.testing.assert_array_equal(
            tiled.simulation_indices, full.simulation_indices
        )

    def test_streamed_tiles_match_resident(self, exp):
        rng = np.random.default_rng(7)
        dictionary = rng.normal(size=(50, 3, 3)).astype(np.float32)
        resident = dictionary_index(exp, dictionary=dictionary, keep_n=5)
        tiles = [
            (s, dictionary[s : s + 7]) for s in range(0, 50, 7)
        ]
        streamed = dictionary_index(
            exp, dictionary_tiles=tiles, dictionary_size=50, keep_n=5
        )
        np.testing.assert_allclose(streamed.scores, resident.scores, atol=1e-6)
        np.testing.assert_array_equal(
            streamed.simulation_indices, resident.simulation_indices
        )

    def test_project_fn_virtual_dictionary(self, exp):
        rng = np.random.default_rng(8)
        dictionary = rng.normal(size=(30, 9)).astype(np.float32)

        def project_fn(rot_block):
            # "rotations" here are just indices into the fake dictionary
            idx = np.asarray(rot_block).astype(int)
            return dictionary[idx]

        resident = dictionary_index(
            exp, dictionary=dictionary.reshape(30, 3, 3), keep_n=4
        )
        virtual = dictionary_index(
            exp,
            project_fn=project_fn,
            rotations=np.arange(30),
            keep_n=4,
            n_per_iteration=11,
        )
        np.testing.assert_allclose(virtual.scores, resident.scores, atol=1e-6)
        np.testing.assert_array_equal(
            virtual.simulation_indices, resident.simulation_indices
        )


class TestMasks:
    def test_signal_mask(self, exp):
        # Excluding pixels changes scores but self-match must survive.
        mask = np.zeros((3, 3), dtype=bool)
        mask[0, 0] = True  # exclude one pixel
        res = dictionary_index(exp, dictionary=exp, keep_n=1, signal_mask=mask)
        np.testing.assert_allclose(res.scores[:, 0], 1.0, atol=1e-6)
        np.testing.assert_array_equal(res.simulation_indices[:, 0], np.arange(9))

    def test_signal_mask_to_idx(self):
        mask = np.array([[True, False], [False, True]])
        idx = signal_mask_to_idx(mask, 4)
        np.testing.assert_array_equal(idx, [1, 2])

    def test_navigation_mask(self, exp):
        nav_mask = np.zeros(9, dtype=bool)
        nav_mask[[2, 5]] = True
        res = dictionary_index(
            exp, dictionary=exp, keep_n=1, navigation_mask=nav_mask
        )
        assert np.isnan(res.scores[2, 0]) and np.isnan(res.scores[5, 0])
        assert res.simulation_indices[2, 0] == -1
        kept = np.setdiff1d(np.arange(9), [2, 5])
        np.testing.assert_array_equal(res.simulation_indices[kept, 0], kept)

    def test_bad_masks_raise(self, exp):
        with pytest.raises(ValueError, match="signal_mask"):
            dictionary_index(exp, dictionary=exp, signal_mask=np.zeros(5, bool))
        with pytest.raises(ValueError, match="navigation_mask"):
            dictionary_index(exp, dictionary=exp, navigation_mask=np.zeros(5, bool))


class TestMergeTopk:
    def test_merge(self):
        import jax.numpy as jnp

        s1 = jnp.asarray([[0.9, 0.5], [0.3, 0.2]])
        i1 = jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32)
        s2 = jnp.asarray([[0.7, 0.6], [0.9, 0.1]])
        i2 = jnp.asarray([[10, 11], [12, 13]], dtype=jnp.int32)
        s, i = merge_topk(s1, i1, s2, i2, 2)
        np.testing.assert_allclose(np.asarray(s), [[0.9, 0.7], [0.9, 0.3]])
        np.testing.assert_array_equal(np.asarray(i), [[0, 10], [12, 2]])


class TestMetricValidation:
    def test_unknown_metric(self, exp):
        with pytest.raises(ValueError, match="Unknown metric"):
            get_metric("xcorr")

    def test_metric_objects(self):
        assert ncc.centered and not ndp.centered

    def test_no_dictionary_raises(self, exp):
        with pytest.raises(ValueError, match="Provide one of"):
            dictionary_index(exp)

    def test_ncc_matches_manual(self, exp):
        rng = np.random.default_rng(9)
        dictionary = rng.normal(size=(20, 9)).astype(np.float32)
        res = dictionary_index(exp, dictionary=dictionary, keep_n=20)
        # Manual NCC in float64
        e = exp.reshape(9, -1).astype(np.float64)
        e -= e.mean(axis=1, keepdims=True)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        d = dictionary.astype(np.float64)
        d -= d.mean(axis=1, keepdims=True)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        expected = e @ d.T
        # res keeps all 20 scores; compare score at each reported index.
        expected_at_idx = np.take_along_axis(
            expected, res.simulation_indices, axis=1
        )
        np.testing.assert_allclose(res.scores, expected_at_idx, atol=1e-5)
        # And the reported order must be the descending sort of all 20.
        np.testing.assert_allclose(
            res.scores, -np.sort(-expected, axis=1), atol=1e-5
        )


class TestProgressCallback:
    def test_progress_called_per_tile(self, exp):
        calls = []
        dictionary_index(
            exp,
            dictionary_tiles=[(s, exp[s : s + 3]) for s in range(0, 9, 3)],
            dictionary_size=9,
            keep_n=2,
            progress=lambda done, total: calls.append((done, total)),
        )
        assert calls == [(0, 9), (3, 9), (6, 9)]


class TestApproxTopk:
    def test_approx_matches_exact_on_clear_peaks(self, exp):
        exact = dictionary_index(exp, dictionary=exp, keep_n=1)
        approx = dictionary_index(exp, dictionary=exp, keep_n=1, approx_topk=True)
        np.testing.assert_array_equal(
            approx.simulation_indices, exact.simulation_indices
        )
        np.testing.assert_allclose(approx.scores, exact.scores, atol=1e-6)


class TestGroupSelectionTail:
    """General-path selection invariants at awkward shapes (the f16
    tier's production fold; a packed int32 variant was evaluated and
    rejected on measured speed, see di.py:_group_topk_T)."""

    def test_dispatch_conditions(self):
        import jax.numpy as jnp

        from kikuchipy_tpu.indexing.di import _group_topk_T

        rng = np.random.default_rng(4)
        # c not a multiple of group: must take the general path (with
        # the singleton tail) and still return exact top-1.
        c, n, k = 3210, 32, 9
        simT = jnp.asarray(rng.standard_normal((c, n)).astype(np.float16))
        s, i = (np.asarray(x) for x in _group_topk_T(simT, k, 32))
        sim = np.asarray(simT, np.float32).T
        np.testing.assert_allclose(s[:, 0], sim.max(axis=1), atol=0)
        np.testing.assert_allclose(
            np.take_along_axis(sim, i, axis=1), s, atol=1e-3
        )


class TestChanceLevelWarning:
    """dictionary_index warns when the best scores sit at the chance
    level for unrelated patterns (wrong PC / tilts / phase)."""

    def test_warns_on_unrelated_dictionary(self, caplog):
        rng = np.random.default_rng(7)
        e = rng.normal(size=(4, 256)).astype(np.float32)
        d = rng.normal(size=(100, 256)).astype(np.float32)
        with caplog.at_level("WARNING", logger="kikuchipy_tpu.indexing.di"):
            dictionary_index(e, d, keep_n=5)
        assert any("chance level" in r.message for r in caplog.records)

    def test_silent_on_matching_dictionary(self, caplog):
        rng = np.random.default_rng(7)
        e = rng.normal(size=(4, 256)).astype(np.float32)
        d = np.concatenate([e, rng.normal(size=(100, 256)).astype(np.float32)])
        with caplog.at_level("WARNING", logger="kikuchipy_tpu.indexing.di"):
            dictionary_index(e, d, keep_n=5)
        assert not any("chance level" in r.message for r in caplog.records)


class TestMixedPrecision:
    """precision="mixed": bf16 candidate selection + exact f32 rescore.

    Final scores must be f32-exact (they are recomputed at
    Precision.HIGHEST), and on data with a clear winner the indices must
    match the all-f32 path.
    """

    def test_mixed_matches_highest_self_match(self, exp):
        exact = dictionary_index(exp, dictionary=exp, keep_n=3)
        mixed = dictionary_index(exp, dictionary=exp, keep_n=3, precision="mixed")
        np.testing.assert_array_equal(
            mixed.simulation_indices[:, 0], exact.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(
            mixed.scores[:, 0], exact.scores[:, 0], atol=2e-6
        )

    def test_mixed_rescore_is_exact(self):
        # Embed the experimental patterns in a noise dictionary: the
        # self-match (score 1) must survive bf16 selection, and its
        # rescored score must equal the f32 path's bitwise-closely.
        rng = np.random.default_rng(3)
        e = rng.normal(size=(16, 144)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(200, 144)).astype(np.float32), e])
        exact = dictionary_index(e, d, keep_n=5)
        mixed = dictionary_index(e, d, keep_n=5, precision="mixed")
        np.testing.assert_array_equal(
            mixed.simulation_indices[:, 0], exact.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(
            mixed.scores[:, 0], exact.scores[:, 0], atol=2e-6
        )

    def test_mixed_tiled_matches_untiled(self):
        rng = np.random.default_rng(4)
        e = rng.normal(size=(8, 64)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(100, 64)).astype(np.float32), e])
        full = dictionary_index(e, d, keep_n=4, precision="mixed")
        tiled = dictionary_index(
            e, d, keep_n=4, precision="mixed", n_per_iteration=17
        )
        np.testing.assert_array_equal(
            tiled.simulation_indices[:, 0], full.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(tiled.scores[:, 0], full.scores[:, 0], atol=2e-6)


class TestInt8Precision:
    """precision="int8": quantized candidate selection + exact f32
    rescore (selection error ~1e-2 relative; final scores f32-exact)."""

    def test_int8_matches_highest(self):
        rng = np.random.default_rng(5)
        e = rng.normal(size=(16, 144)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(200, 144)).astype(np.float32), e])
        exact = dictionary_index(e, d, keep_n=5)
        q = dictionary_index(e, d, keep_n=5, precision="int8")
        np.testing.assert_array_equal(
            q.simulation_indices[:, 0], exact.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(q.scores[:, 0], exact.scores[:, 0], atol=2e-6)

    def test_int8_tiled_matches_untiled(self):
        rng = np.random.default_rng(6)
        e = rng.normal(size=(8, 64)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(100, 64)).astype(np.float32), e])
        full = dictionary_index(e, d, keep_n=4, precision="int8")
        tiled = dictionary_index(
            e, d, keep_n=4, precision="int8", n_per_iteration=17
        )
        np.testing.assert_array_equal(
            tiled.simulation_indices[:, 0], full.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(tiled.scores[:, 0], full.scores[:, 0], atol=2e-6)

    def test_int8_zero_row_safe(self):
        # An all-constant pattern normalizes to zeros after NCC prepare;
        # the quantization scale guard must not produce NaN.
        rng = np.random.default_rng(7)
        e = rng.normal(size=(4, 64)).astype(np.float32)
        d = rng.normal(size=(20, 64)).astype(np.float32)
        d[3] = 1.0  # constant row -> zero after centering
        res = dictionary_index(e, d, keep_n=3, precision="int8")
        assert np.isfinite(res.scores).all()


class TestReferenceKwargs:
    def test_rechunk_and_dtype_accepted(self, dummy_patterns):
        # The reference's dictionary_indexing(dtype=..., rechunk=...)
        # call pattern (its tests/test_indexing/test_dictionary_indexing
        # .py:36,54-58) must work; self-matching still scores 1.
        import kikuchipy_tpu as kp
        from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
        from kikuchipy_tpu.crystallography.sampling import super_fibonacci

        s = kp.signals.EBSD(dummy_patterns)
        d = kp.signals.EBSD(
            np.asarray(dummy_patterns).reshape(-1, 3, 3),
            xmap=CrystalMap(rotations=super_fibonacci(9), shape=(9,)),
        )
        xmap = s.dictionary_indexing(
            d, metric="ndp", rechunk=True, keep_n=3
        )
        np.testing.assert_allclose(
            np.asarray(xmap.prop["scores"])[:, 0], 1.0, atol=1e-6
        )
        xmap64 = s.dictionary_indexing(
            d, dtype=np.float64, n_per_iteration=2, keep_n=3
        )
        np.testing.assert_allclose(
            np.asarray(xmap64.prop["scores"])[:, 0], 1.0, atol=1e-9
        )


class TestPreparedDictionary:
    """prepare_dictionary: one-time preparation/quantization reused
    across calls (the dictionary is the reusable operand on TPU; the
    reference re-prepares per call, _dictionary_indexing.py:130)."""

    def test_prepared_matches_raw(self):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        rng = np.random.default_rng(11)
        e = rng.normal(size=(12, 100)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(150, 100)).astype(np.float32), e])
        prep = prepare_dictionary(d)
        raw = dictionary_index(e, d, keep_n=5)
        via_prep = dictionary_index(e, prep, keep_n=5)
        np.testing.assert_array_equal(
            via_prep.simulation_indices, raw.simulation_indices
        )
        np.testing.assert_allclose(via_prep.scores, raw.scores, rtol=0, atol=0)

    def test_prepared_int8_matches_raw_int8(self):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        rng = np.random.default_rng(12)
        e = rng.normal(size=(10, 81)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(120, 81)).astype(np.float32), e])
        prep = prepare_dictionary(d, quantize=True)
        assert prep._q8 is not None  # eagerly quantized
        raw = dictionary_index(e, d, keep_n=4, precision="int8")
        via_prep = dictionary_index(e, prep, keep_n=4, precision="int8")
        np.testing.assert_array_equal(
            via_prep.simulation_indices[:, 0], raw.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(
            via_prep.scores[:, 0], raw.scores[:, 0], atol=2e-6
        )

    def test_prepared_with_mask(self):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        rng = np.random.default_rng(13)
        e = rng.normal(size=(6, 7, 7)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(40, 7, 7)).astype(np.float32), e])
        mask = np.zeros((7, 7), dtype=bool)
        mask[0, :3] = True  # exclude
        prep = prepare_dictionary(d, signal_mask=mask)
        raw = dictionary_index(e, d, keep_n=3, signal_mask=mask)
        via_prep = dictionary_index(e, prep, keep_n=3, signal_mask=mask)
        np.testing.assert_array_equal(
            via_prep.simulation_indices, raw.simulation_indices
        )

    def test_metric_mismatch_raises(self):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        rng = np.random.default_rng(14)
        d = rng.normal(size=(20, 36)).astype(np.float32)
        e = rng.normal(size=(4, 36)).astype(np.float32)
        prep = prepare_dictionary(d, metric="ndp")
        with pytest.raises(ValueError, match="metric"):
            dictionary_index(e, prep, keep_n=2, metric="ncc")

    def test_mask_size_mismatch_raises(self):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        rng = np.random.default_rng(15)
        d = rng.normal(size=(20, 6, 6)).astype(np.float32)
        e = rng.normal(size=(4, 6, 6)).astype(np.float32)
        mask = np.zeros((6, 6), dtype=bool)
        mask[0] = True
        prep = prepare_dictionary(d, signal_mask=mask)
        with pytest.raises(ValueError, match="signal_mask mismatch"):
            dictionary_index(e, prep, keep_n=2)  # no mask at index time

    def test_mask_same_size_different_pixels_raises(self):
        from kikuchipy_tpu.indexing.di import prepare_dictionary

        rng = np.random.default_rng(16)
        d = rng.normal(size=(20, 6, 6)).astype(np.float32)
        e = rng.normal(size=(4, 6, 6)).astype(np.float32)
        mask_a = np.zeros((6, 6), dtype=bool)
        mask_a[0] = True
        mask_b = np.zeros((6, 6), dtype=bool)
        mask_b[-1] = True  # same excluded count, different pixels
        prep = prepare_dictionary(d, signal_mask=mask_a)
        with pytest.raises(ValueError, match="different pixel"):
            dictionary_index(e, prep, keep_n=2, signal_mask=mask_b)


class TestScanFallback:
    """Past _MAX_UNROLL_TILES full tiles _index_resident switches from
    the unrolled static-slice loop to a lax.scan with a carried top-k;
    results must be identical (mod cross-tile tie order)."""

    @pytest.mark.parametrize(
        "precision,approx",
        [("highest", False), ("f16", True), ("int8", False), ("mixed", True)],
    )
    def test_scan_matches_unrolled(self, precision, approx):
        rng = np.random.default_rng(17)
        e = rng.normal(size=(6, 64)).astype(np.float32)
        # 40 tiles of 16 rows -> scan path; embed the experimental rows
        # so top-1 has a clear margin for the reduced-precision tiers.
        d = rng.normal(size=(640, 64)).astype(np.float32)
        d[::100][:6] = e + 0.3 * rng.normal(size=(6, 64)).astype(np.float32)
        unrolled = dictionary_index(
            e, d, keep_n=5, n_per_iteration=640, precision=precision,
            approx_topk=approx,
        )
        scanned = dictionary_index(
            e, d, keep_n=5, n_per_iteration=16, precision=precision,
            approx_topk=approx,
        )
        np.testing.assert_array_equal(
            scanned.simulation_indices[:, 0], unrolled.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(
            scanned.scores, unrolled.scores, atol=5e-3
        )

    def test_scan_exact_matches_host_reference(self):
        rng = np.random.default_rng(18)
        e = rng.normal(size=(5, 32)).astype(np.float32)
        d = rng.normal(size=(330, 32)).astype(np.float32)  # tail tile of 10

        def prep_rows(x):
            x = x - x.mean(axis=1, keepdims=True)
            return x / np.linalg.norm(x, axis=1, keepdims=True)

        ref = prep_rows(e) @ prep_rows(d).T
        order = np.argsort(-ref, axis=1)[:, :4]
        res = dictionary_index(e, d, keep_n=4, n_per_iteration=10)
        np.testing.assert_array_equal(res.simulation_indices, order)
        np.testing.assert_allclose(
            res.scores, np.take_along_axis(ref, order, axis=1), atol=1e-5
        )

    def test_streamed_scan_with_prepared_dictionary(self, tmp_path):
        import h5py

        from kikuchipy_tpu.indexing.di import prepare_dictionary
        from kikuchipy_tpu.io.streaming import dictionary_index_streamed

        rng = np.random.default_rng(15)
        e = rng.normal(size=(20, 6, 6)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(60, 6, 6)).astype(np.float32), e])
        prep = prepare_dictionary(d)
        path = tmp_path / "scan.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("Scan 1/EBSD/Data/patterns", data=e)

        res = dictionary_index_streamed(path, prep, chunk_size=8, keep_n=3)
        ref = dictionary_index(e, d, keep_n=3)
        np.testing.assert_array_equal(
            res.simulation_indices, ref.simulation_indices
        )


class TestF16Tier:
    """precision="f16": f32-class matmul, scores materialized as float16
    (indices exact modulo f16 ties; scores within 2.44e-4)."""

    def test_f16_matches_highest(self):
        rng = np.random.default_rng(16)
        e = rng.normal(size=(16, 144)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(200, 144)).astype(np.float32), e])
        exact = dictionary_index(e, d, keep_n=5)
        f16 = dictionary_index(e, d, keep_n=5, precision="f16")
        np.testing.assert_array_equal(
            f16.simulation_indices[:, 0], exact.simulation_indices[:, 0]
        )
        np.testing.assert_allclose(f16.scores, exact.scores, atol=3e-4)
        assert f16.scores.dtype == np.float32

    def test_f16_tiled_matches_untiled(self):
        rng = np.random.default_rng(17)
        e = rng.normal(size=(8, 64)).astype(np.float32)
        d = np.concatenate([rng.normal(size=(100, 64)).astype(np.float32), e])
        full = dictionary_index(e, d, keep_n=4, precision="f16")
        tiled = dictionary_index(
            e, d, keep_n=4, precision="f16", n_per_iteration=17
        )
        np.testing.assert_array_equal(
            tiled.simulation_indices[:, 0], full.simulation_indices[:, 0]
        )
