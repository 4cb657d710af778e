"""Full-system synthetic test (BASELINE config 5 in miniature): build a
noisy synthetic scan from the real master pattern with known
orientations, write it to a kikuchipy h5ebsd file, stream-index it
against a dictionary, and verify orientation recovery + refinement.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tests; default run skips (run with -m "")

import jax.numpy as jnp

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
from kikuchipy_tpu.crystallography.sampling import (
    disorientation_angle,
    sample_fundamental_zone,
    super_fibonacci,
    reduce_to_fundamental_zone,
)
from kikuchipy_tpu.io.streaming import dictionary_index_streamed
from kikuchipy_tpu.signals.ebsd import EBSD


@pytest.fixture(scope="module")
def synthetic_scan(tmp_path_factory):
    from pathlib import Path

    mp_path = Path(
        "/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/"
        "ni_mc_mp_20kv_uint8_gzip_opts9.h5"
    )
    if not mp_path.exists():
        pytest.skip("reference data not available")
    mp = kp.load(mp_path, projection="lambert", hemisphere="both")
    det = kp.detectors.EBSDDetector(
        shape=(48, 48), pc=(0.42, 0.28, 0.5), sample_tilt=70
    )
    rng = np.random.default_rng(42)
    n = 12 * 12
    truth = reduce_to_fundamental_zone(super_fibonacci(n * 7)[::7][:n], "m-3m")
    sim = mp.get_patterns(truth, det, dtype_out=np.float32)
    # get_patterns rescales float32 output to [-1, 1]; map to [0, 1].
    pats = (np.asarray(sim.data, dtype=np.float64) + 1) / 2
    # Physical diffuseness: sharp kinematically-projected bands
    # decorrelate within ~2 deg of misorientation; real experimental
    # patterns are blurred by the diffuse background. Blur to make the
    # NCC landscape realistic for a few-degree dictionary.
    from kikuchipy_tpu.ops.pattern import _gaussian_blur_spatial
    import jax.numpy as _jnp

    pats = np.asarray(
        _gaussian_blur_spatial(_jnp.asarray(pats, _jnp.float32), 1.5, 4.0),
        dtype=np.float64,
    )
    # Add noise and a synthetic static background gradient.
    yy, xx = np.indices((48, 48))
    bg = 60 + 40 * np.exp(-((xx - 24) ** 2 + (yy - 20) ** 2) / 700)
    noisy = pats * 120 + bg + rng.normal(scale=6.0, size=pats.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)

    s = EBSD(
        data=noisy.reshape(12, 12, 48, 48),
        detector=det,
        static_background=bg.astype(np.uint8),
    )
    folder = tmp_path_factory.mktemp("synthetic")
    path = folder / "scan.h5"
    s.save(path)
    return path, truth, det, mp


class TestSyntheticSystem:
    def test_streamed_di_recovers_orientations(self, synthetic_scan):
        path, truth, det, mp = synthetic_scan
        s = kp.load(path)
        assert s.navigation_shape == (12, 12)

        pre = s.remove_static_background().remove_dynamic_background()

        rot = sample_fundamental_zone(4.0, "m-3m")
        dictionary = mp.get_patterns(rot, det, dtype_out=np.float32)

        from kikuchipy_tpu.ops.pattern import (
            remove_dynamic_background,
            remove_static_background,
        )

        bg = np.asarray(s.static_background)

        def preprocess(chunk):
            out = remove_static_background(chunk, bg, "subtract")
            return np.asarray(remove_dynamic_background(out))

        res = dictionary_index_streamed(
            path, dictionary.data, preprocess_fn=preprocess,
            chunk_size=50, keep_n=10,
        )
        got = rot[res.simulation_indices[:, 0]]
        ang = np.degrees(disorientation_angle(truth, got, "m-3m"))
        # 4-degree dictionary: nearly everything within ~2x resolution.
        assert np.median(ang) < 3.0, (np.median(ang), ang.max())
        assert (ang < 8).mean() > 0.9

        # Refinement pulls below the dictionary resolution.
        xmap0 = CrystalMap(rotations=got, shape=(12, 12))
        ref = pre.refine_orientation(
            xmap=xmap0, detector=det, master_pattern=mp, max_iters=80
        )
        ang_ref = np.degrees(
            disorientation_angle(truth, ref.xmap.best_rotations, "m-3m")
        )
        assert np.median(ang_ref) < 1.0, np.median(ang_ref)
        assert np.median(ang_ref) < np.median(ang)
