"""Resize/reduce matmul resampling vs the NumPy semantic reference."""

import numpy as np
import pytest

from partsbaseddetector_tpu.ops import reference
from partsbaseddetector_tpu.ops.resize import reduce_image, resize_image


@pytest.mark.parametrize("shape", [(24, 30), (37, 41), (64, 48)])
@pytest.mark.parametrize("scale", [0.9330329915368074, 0.75, 0.5, 1.0])
def test_resize_matches_reference(shape, scale):
    rng = np.random.RandomState(0)
    im = rng.rand(*shape, 3) * 255
    want = reference.resize(im, scale)
    got = np.asarray(resize_image(im.astype(np.float32), scale))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("shape", [(24, 30), (37, 41), (33, 47)])
def test_reduce_matches_reference(shape):
    rng = np.random.RandomState(1)
    im = rng.rand(*shape, 3) * 255
    want = reference.reduce(im)
    got = np.asarray(reduce_image(im.astype(np.float32)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


def test_resize_weights_rows_sum_to_one():
    for src, dst in [(100, 93), (50, 25), (31, 17)]:
        w = reference.resize_weights(src, dst)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=5e-3)


def test_reduce_weights_rows_sum_to_one():
    for src in [20, 21, 33, 64]:
        w = reference.reduce_weights(src)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
