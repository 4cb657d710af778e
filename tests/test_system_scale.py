"""Scale-shaped streamed system test (VERDICT r3 item 7).

A synthetic scan at the exact nickel_ebsd_large shape (55x75 nav grid,
60x60 uint8 patterns; BASELINE.json config 5 — the download-backed file
itself is unreachable in the zero-egress env) is built from the real
EMsoft nickel master pattern with known orientations, written to a
kikuchipy-h5ebsd file, and indexed through the out-of-core streamed
path with checkpoint-kill-resume fault injection. The interrupted+
resumed run must be BIT-IDENTICAL to an uninterrupted one — the
restart-from-scratch gap of the reference (SURVEY.md §5: no
checkpoint/resume anywhere; long jobs restart from zero).
"""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tests; default run skips (run with -m "")

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.sampling import (
    disorientation_angle,
    reduce_to_fundamental_zone,
    sample_fundamental_zone,
    super_fibonacci,
)
from kikuchipy_tpu.io.streaming import dictionary_index_streamed
from kikuchipy_tpu.signals.ebsd import EBSD

NAV = (55, 75)  # nickel_ebsd_large navigation shape
SIG = (60, 60)  # nickel_ebsd_large pattern shape


@pytest.fixture(scope="module")
def large_scan(tmp_path_factory):
    mp_path = Path(
        "/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/"
        "ni_mc_mp_20kv_uint8_gzip_opts9.h5"
    )
    if not mp_path.exists():
        pytest.skip("reference data not available")
    mp = kp.load(mp_path, projection="lambert", hemisphere="both")
    det = kp.detectors.EBSDDetector(
        shape=SIG, pc=(0.42, 0.28, 0.5), sample_tilt=70
    )
    n = NAV[0] * NAV[1]  # 4125 patterns — the real file's count
    truth = reduce_to_fundamental_zone(super_fibonacci(n), "m-3m")
    sim = mp.get_patterns(truth, det, dtype_out=np.float32)
    pats = (np.asarray(sim.data, dtype=np.float32) + 1) / 2  # [-1,1]->[0,1]
    # Physical diffuseness (as in test_system_synthetic): sharp
    # kinematical bands decorrelate within ~2 deg; blur so the NCC
    # landscape is realistic for a few-degree dictionary.
    import jax.numpy as jnp

    from kikuchipy_tpu.ops.pattern import _gaussian_blur_spatial

    pats = np.asarray(
        _gaussian_blur_spatial(jnp.asarray(pats, jnp.float32), 1.8, 4.0),
        dtype=np.float32,
    )
    rng = np.random.default_rng(7)
    yy, xx = np.indices(SIG)
    bg = 60 + 40 * np.exp(-((xx - 30) ** 2 + (yy - 25) ** 2) / 1100)
    noisy = pats * 130 + bg + rng.normal(scale=5.0, size=pats.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)

    s = EBSD(
        data=noisy.reshape(*NAV, *SIG),
        detector=det,
        static_background=bg.astype(np.uint8),
    )
    path = tmp_path_factory.mktemp("scale") / "large.h5"
    s.save(path)

    dictionary = mp.get_patterns(
        sample_fundamental_zone(5.0, "m-3m"), det, dtype_out=np.float32
    )
    return path, truth, np.asarray(dictionary.data), dictionary.xmap


class TestScaleStreamedResume:
    def test_kill_resume_bit_identical(self, large_scan, tmp_path):
        path, truth, dictionary, dict_xmap = large_scan
        bg = np.asarray(kp.load(path).static_background)

        from kikuchipy_tpu.ops.pattern import (
            remove_dynamic_background,
            remove_static_background,
        )

        def preprocess(chunk):
            out = remove_static_background(chunk, bg, "subtract")
            return np.asarray(remove_dynamic_background(out))

        kw = dict(
            dataset="Scan 1/EBSD/Data/patterns",
            chunk_size=512,
            keep_n=10,
        )

        # Uninterrupted reference run (no checkpointing).
        ref = dictionary_index_streamed(
            path, dictionary, preprocess_fn=preprocess, **kw
        )

        # Fault-injected run: crash mid-scan (after 4 of 9 chunks)...
        ckpt = tmp_path / "di_ckpt.npz"
        calls = {"n": 0}

        def crashing_preprocess(chunk):
            calls["n"] += 1
            if calls["n"] > 4:
                raise RuntimeError("injected crash")
            return preprocess(chunk)

        with pytest.raises(RuntimeError, match="injected crash"):
            dictionary_index_streamed(
                path, dictionary, preprocess_fn=crashing_preprocess,
                checkpoint_path=ckpt, **kw,
            )
        assert ckpt.exists()

        # ...then resume from the checkpoint. Completed chunks must not
        # be re-processed (results sync with a one-chunk lag, so at most
        # one completed chunk repeats).
        resumed_chunks = []

        def counting_preprocess(chunk):
            resumed_chunks.append(chunk.shape[0])
            return preprocess(chunk)

        res = dictionary_index_streamed(
            path, dictionary, preprocess_fn=counting_preprocess,
            checkpoint_path=ckpt, **kw,
        )
        n_chunks_total = -(-truth.shape[0] // kw["chunk_size"])  # 9
        assert len(resumed_chunks) <= n_chunks_total - 3

        # Bit-identical to the uninterrupted run: same winners, same
        # float32 scores, for every one of the 4125 map points.
        np.testing.assert_array_equal(
            res.simulation_indices, ref.simulation_indices
        )
        np.testing.assert_array_equal(res.scores, ref.scores)

        # Sanity at scale: the 5-degree dictionary recovers the planted
        # orientations for the bulk of the map.
        got = dict_xmap.best_rotations[res.simulation_indices[:, 0]]
        ang = np.degrees(disorientation_angle(truth, got, "m-3m"))
        assert np.median(ang) < 5.0, np.median(ang)
        assert (ang < 10).mean() > 0.85
