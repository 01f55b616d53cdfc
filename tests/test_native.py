"""Native C++ kernels vs the NumPy semantic reference."""

import numpy as np
import pytest

from partsbaseddetector_tpu import native
from partsbaseddetector_tpu.ops import reference

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_native_hog():
    rng = np.random.RandomState(0)
    im = rng.rand(41, 50, 3) * 255
    want = reference.hog(im, 8)
    got = native.hog(im, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_native_resize_reduce():
    rng = np.random.RandomState(1)
    im = rng.rand(37, 45, 3) * 255
    np.testing.assert_allclose(
        native.resize(im, 0.777), reference.resize(im, 0.777), rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        native.reduce(im), reference.reduce(im), rtol=2e-4, atol=2e-3
    )


def test_native_shiftdt():
    rng = np.random.RandomState(2)
    score = rng.randn(15, 19)
    w = np.array([0.03, -0.01, 0.02, 0.015])
    for sx, sy, dlx, dly, step in [(0, 0, 19, 15, 1), (2, -1, 12, 9, 1), (1, 1, 8, 6, 2)]:
        want = reference.shift_dt_2d(score, w, sx, sy, dlx, dly, step)
        got = native.shiftdt(score, w, sx, sy, dlx, dly, step)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-10, atol=1e-10)
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_array_equal(got[2], want[2])


def test_native_fconv():
    rng = np.random.RandomState(3)
    feat = rng.rand(20, 24, 32).astype(np.float32)
    filt = rng.rand(5, 4, 32).astype(np.float32)
    want = reference.fconv_valid(feat.astype(np.float64), filt.astype(np.float64))
    got = native.fconv_valid(feat, filt)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_native_paint_nms():
    boxes = np.array(
        [[10, 10, 30, 30], [12, 12, 32, 32], [100, 100, 130, 130]],
        dtype=np.float64,
    )
    keep = native.paint_nms(boxes, (200, 200), overlap=0.2)
    np.testing.assert_array_equal(keep, [True, False, True])


def test_native_box_medians():
    """pbd_box_medians == the per-box Python median (_median_depth) on
    random boxes including off-image, empty, NaN/inf-laden regions."""
    from partsbaseddetector_tpu.depth import _median_depth

    rng = np.random.RandomState(3)
    depth = rng.rand(37, 53).astype(np.float32) * 4.0
    depth[rng.rand(37, 53) < 0.1] = np.nan
    depth[rng.rand(37, 53) < 0.05] = np.inf
    boxes = []
    for _ in range(200):
        x1, y1 = rng.uniform(-10, 55), rng.uniform(-10, 40)
        boxes.append([x1, y1, x1 + rng.uniform(-2, 20), y1 + rng.uniform(-2, 20)])
    boxes.append([-5.0, -5.0, -1.5, -1.5])  # fully off-image
    boxes.append([10.2, 10.7, 10.2, 10.7])  # single pixel
    boxes = np.asarray(boxes, dtype=np.float64)
    got = native.box_medians(depth, boxes)
    want = np.array([_median_depth(depth, b) for b in boxes])
    np.testing.assert_array_equal(got, want)
