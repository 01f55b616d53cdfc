"""HOG conv-formulation vs the NumPy scatter-loop semantic reference."""

import numpy as np
import pytest

from partsbaseddetector_tpu.ops import reference
from partsbaseddetector_tpu.ops.hog import hog_features


@pytest.mark.parametrize(
    "shape,sbin",
    [
        ((40, 48), 8),
        ((41, 50), 8),  # visible grid != image size (rounding)
        ((36, 44), 4),
        ((37, 45), 4),
        ((30, 33), 3),  # odd sbin
    ],
)
def test_hog_matches_reference(shape, sbin):
    rng = np.random.RandomState(42)
    im = (rng.rand(*shape, 3) * 255).astype(np.float64)
    want = reference.hog(im, sbin)
    got = np.asarray(hog_features(im.astype(np.float32), sbin))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hog_structured_image():
    """Oriented edges land in the right orientation channels."""
    im = np.zeros((64, 64, 3))
    im[:, 32:, :] = 200.0  # vertical edge -> horizontal gradient
    want = reference.hog(im, 8)
    got = np.asarray(hog_features(im.astype(np.float32), 8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # occlusion channel is all zero
    assert np.all(got[..., 31] == 0)


def test_hog_gradient_channel_tiebreak():
    """Identical channels must still agree (first-channel-wins ties)."""
    rng = np.random.RandomState(3)
    g = rng.rand(32, 32, 1) * 255
    im = np.repeat(g, 3, axis=2)
    want = reference.hog(im, 4)
    got = np.asarray(hog_features(im.astype(np.float32), 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
