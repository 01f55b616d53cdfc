"""Filter response engines vs the NumPy valid-correlation reference."""

import numpy as np
import pytest

from partsbaseddetector_tpu.ops import reference
from partsbaseddetector_tpu.ops.conv import filter_responses, filter_responses_fft


def _bank(rng, sizes, c=32):
    fh = max(s[0] for s in sizes)
    fw = max(s[1] for s in sizes)
    bank = np.zeros((len(sizes), fh, fw, c), dtype=np.float32)
    raw = []
    for i, (h, w) in enumerate(sizes):
        f = rng.randn(h, w, c).astype(np.float32) * 0.1
        bank[i, :h, :w] = f
        raw.append(f)
    return bank, raw


@pytest.mark.parametrize("engine", [filter_responses, filter_responses_fft])
def test_responses_match_reference(engine):
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 18, 22, 32).astype(np.float32)
    sizes = [(5, 5), (3, 4), (5, 5), (2, 2)]
    bank, raw = _bank(rng, sizes)
    got = np.asarray(engine(feat, bank))
    fh, fw = bank.shape[1], bank.shape[2]
    assert got.shape == (2, 18 - fh + 1, 22 - fw + 1, len(sizes))
    for s in range(2):
        for i, f in enumerate(raw):
            want = reference.fconv_valid(feat[s].astype(np.float64), f)
            h, w = f.shape[:2]
            # the shared grid covers the top-left of each true response;
            # zero-padded taps make the overlap exact
            oh, ow = got.shape[1], got.shape[2]
            np.testing.assert_allclose(
                got[s, :, :, i], want[:oh, :ow], rtol=1e-4, atol=1e-4
            )


def test_spatial_and_fft_engines_agree():
    rng = np.random.RandomState(1)
    feat = rng.randn(3, 25, 31, 32).astype(np.float32)
    bank, _ = _bank(rng, [(6, 6), (4, 5)])
    a = np.asarray(filter_responses(feat, bank))
    b = np.asarray(filter_responses_fft(feat, bank))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
