"""Native C++ loader tests (with NumPy-fallback parity)."""

import numpy as np
import pytest

from kikuchipy_tpu import native


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    pats = rng.integers(0, 255, size=(50, 12, 12), dtype=np.uint8)
    bg = rng.integers(1, 255, size=(12, 12)).astype(np.float32)
    return pats, bg


class TestNative:
    def test_builds(self):
        # g++ is baked into the image; the library must build.
        assert native.available()

    def test_u8_to_f32(self, data):
        pats, _ = data
        out = native.u8_to_f32(pats)
        np.testing.assert_array_equal(out, pats.astype(np.float32))

    @pytest.mark.parametrize("operation", ["subtract", "divide"])
    def test_preprocess_matches_numpy(self, data, operation):
        pats, bg = data
        out = native.preprocess_u8(pats, bg, operation)
        p = pats.reshape(50, -1).astype(np.float32)
        p = p - bg.ravel() if operation == "subtract" else p / bg.ravel()
        mn = p.min(1, keepdims=True)
        mx = p.max(1, keepdims=True)
        expected = ((p - mn) / (mx - mn) * 2 - 1).reshape(pats.shape)
        np.testing.assert_allclose(out, expected, atol=2e-6)

    def test_preprocess_matches_device_kernel(self, data):
        """The host staging path must agree with the device kernel."""
        from kikuchipy_tpu.ops.pattern import remove_static_background

        pats, bg = data
        host = native.preprocess_u8(pats, bg, "subtract")
        device = np.asarray(
            remove_static_background(
                pats, bg, "subtract", dtype_out=np.float32,
                out_range=(-1.0, 1.0),
            )
        )
        np.testing.assert_allclose(host, device, atol=2e-6)

    def test_reorder(self, data):
        pats, _ = data
        order = np.random.default_rng(1).permutation(50)
        out = native.reorder_patterns(pats, order)
        np.testing.assert_array_equal(out, pats[order])

    def test_bad_bg_size(self, data):
        pats, _ = data
        with pytest.raises(ValueError, match="static background"):
            native.preprocess_u8(pats, np.ones((3, 3), np.float32))
