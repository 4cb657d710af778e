"""Signal-level dynamic-background and image-quality conformance
tests against reference goldens
(/root/reference/tests/test_signals/test_ebsd.py:533-620,1893-1933).
These exercise the frequency-domain (Barnes rFFT) path at the
signal level."""

import numpy as np
import pytest

from kikuchipy_tpu.signals.ebsd import EBSD

# fmt: off
DYN_SUBTRACT_STD2 = np.array([
    170, 215, 181, 255, 221, 188, 221, 32, 0, 255,
    198, 228, 199, 0, 230, 229, 201, 174, 0, 84,
    77, 147, 48, 255, 81, 74, 249, 246, 0, 216,
    177, 109, 255, 250, 40, 44, 120, 2, 255, 8,
    32, 0, 67, 63, 145, 254, 195, 0, 120, 229,
    237, 222, 196, 1, 164, 34, 255, 128, 173, 0,
    47, 49, 7, 133, 245, 218, 110, 166, 0, 59,
    255, 60, 255, 71, 35, 145, 108, 144, 0, 108,
    253,
], np.uint8).reshape((3, 3, 3, 3))
DYN_SUBTRACT_STD3 = np.array([
    181, 218, 182, 255, 218, 182, 218, 36, 0, 255,
    198, 226, 198, 0, 226, 226, 198, 170, 0, 84,
    84, 142, 56, 255, 84, 84, 254, 254, 0, 218,
    181, 109, 255, 254, 36, 36, 113, 0, 255, 0,
    28, 0, 57, 57, 141, 255, 191, 0, 127, 223,
    223, 223, 191, 0, 169, 42, 255, 127, 170, 0,
    42, 42, 0, 141, 254, 226, 113, 169, 0, 56,
    255, 56, 255, 72, 36, 145, 109, 145, 0, 109,
    254,
], np.uint8).reshape((3, 3, 3, 3))
DYN_DIVIDE_STD2 = np.array([
    176, 217, 186, 254, 225, 194, 225, 39, 0, 255,
    199, 228, 199, 0, 231, 230, 202, 174, 0, 93,
    88, 159, 60, 255, 91, 86, 245, 241, 0, 214,
    174, 107, 255, 247, 37, 38, 127, 0, 255, 0,
    30, 0, 67, 63, 150, 255, 199, 0, 128, 234,
    244, 224, 201, 0, 166, 42, 254, 133, 180, 0,
    47, 48, 0, 132, 238, 212, 109, 164, 0, 56,
    255, 57, 255, 72, 36, 146, 109, 145, 0, 109,
    252,
], np.uint8).reshape((3, 3, 3, 3))
DYN_DIVIDE_STD3 = np.array([
    181, 218, 182, 255, 219, 182, 219, 36, 0, 255,
    198, 226, 198, 0, 226, 226, 198, 170, 0, 85,
    85, 142, 56, 255, 85, 85, 254, 254, 0, 218,
    181, 109, 254, 254, 36, 36, 114, 0, 255, 0,
    28, 0, 57, 57, 142, 255, 191, 0, 127, 223,
    224, 223, 191, 0, 169, 42, 255, 127, 170, 0,
    42, 42, 0, 141, 253, 225, 113, 169, 0, 56,
    254, 56, 255, 72, 36, 145, 109, 145, 0, 109,
    254,
], np.uint8).reshape((3, 3, 3, 3))
# fmt: on

IQ_NORMALIZED = np.array([
    [-0.0241, -0.0625, -0.0052],
    [-0.0317, -0.0458, -0.0956],
    [-0.1253, 0.0120, -0.2385],
])
IQ_RAW = np.array([
    [0.2694, 0.2926, 0.2299],
    [0.2673, 0.1283, 0.2032],
    [0.1105, 0.2671, 0.2159],
])


class TestSignalDynamicBackground:
    @pytest.mark.parametrize(
        "operation, std, answer",
        [
            ("subtract", 2, DYN_SUBTRACT_STD2),
            ("subtract", 3, DYN_SUBTRACT_STD3),
            ("divide", 2, DYN_DIVIDE_STD2),
            ("divide", 3, DYN_DIVIDE_STD3),
        ],
    )
    def test_golden(self, dummy_patterns, operation, std, answer):
        s = EBSD(data=dummy_patterns)
        out = s.remove_dynamic_background(
            operation=operation, std=std, filter_domain="spatial"
        )
        got = np.asarray(out.data).astype(int)
        diff = np.abs(got - answer.astype(int))
        # Integer-boundary truncation tolerance as for the static
        # background goldens (reference kernels use fastmath).
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.05


class TestSignalImageQuality:
    def test_normalized(self, dummy_patterns):
        s = EBSD(data=dummy_patterns)
        iq = s.get_image_quality(normalize=True)
        np.testing.assert_allclose(iq, IQ_NORMALIZED, atol=1e-4)

    def test_raw(self, dummy_patterns):
        s = EBSD(data=dummy_patterns)
        iq = s.get_image_quality(normalize=False)
        np.testing.assert_allclose(iq, IQ_RAW, atol=1e-4)
