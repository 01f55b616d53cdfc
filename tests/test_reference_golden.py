"""Cross-implementation golden parity vs the reference's ACTUAL code.

Round 1 pinned every kernel's semantics to our own NumPy port
(ops/reference.py) — if the port misread the reference, every test
would agree and all would be wrong together. These tests close that
loop: tests/refgold compiles the reference's self-contained MEX kernels
(/root/reference/matlab/mex/{features,shiftdt,resize,reduce,fconv}.cc)
in place behind a minimal mex.h shim and we assert, on randomized
inputs, that

  - the NumPy port matches the reference bit-for-bit (float64 paths:
    tolerance ~1e-12 for accumulated-order differences only), and
  - the JAX/TPU kernels match within float32 tolerance with EXACT
    argmax pointers for the distance transform.
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import refgold  # noqa: E402

from partsbaseddetector_tpu.ops import reference as port  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refgold.available(),
    reason="reference MEX oracle unavailable (no /root/reference or g++)",
)


def _rand_image(rng, h, w):
    return (rng.rand(h, w, 3) * 255.0).astype(np.float64)


# ---------------------------------------------------------------------------
# HOG features (matlab/mex/features.cc)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,sbin,seed", [(40, 30, 8, 0), (64, 96, 8, 1), (57, 83, 4, 2), (96, 64, 16, 3)]
)
def test_hog_port_matches_reference(h, w, sbin, seed):
    rng = np.random.RandomState(seed)
    im = _rand_image(rng, h, w)
    want = refgold.features(im, sbin)
    got = port.hog(im, sbin)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("h,w,sbin,seed", [(64, 96, 8, 1), (57, 83, 4, 2)])
def test_hog_jax_matches_reference(h, w, sbin, seed):
    from partsbaseddetector_tpu.ops.hog import hog_features

    rng = np.random.RandomState(seed)
    im = _rand_image(rng, h, w)
    want = refgold.features(im, sbin)
    got = np.asarray(hog_features(im.astype(np.float32), sbin))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


# ---------------------------------------------------------------------------
# Pyramid resampling (matlab/mex/resize.cc, reduce.cc)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,scale,seed",
    [(40, 30, 0.7, 0), (61, 47, 0.5, 1), (100, 80, 0.9170, 2), (33, 57, 0.3, 3)],
)
def test_resize_port_matches_reference(h, w, scale, seed):
    rng = np.random.RandomState(seed)
    im = _rand_image(rng, h, w)
    want = refgold.resize(im, scale)
    got = port.resize(im, scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


@pytest.mark.parametrize("h,w,seed", [(40, 30, 0), (61, 47, 1), (96, 128, 2)])
def test_reduce_port_matches_reference(h, w, seed):
    rng = np.random.RandomState(seed)
    im = _rand_image(rng, h, w)
    want = refgold.reduce(im)
    got = port.reduce(im)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


@pytest.mark.parametrize("h,w,scale,seed", [(61, 47, 0.5, 1), (100, 80, 0.9170, 2)])
def test_resize_jax_matches_reference(h, w, scale, seed):
    from partsbaseddetector_tpu.ops.resize import resize_image

    rng = np.random.RandomState(seed)
    im = _rand_image(rng, h, w)
    want = refgold.resize(im, scale)
    got = np.asarray(resize_image(im.astype(np.float32), scale))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


def test_reduce_jax_matches_reference():
    from partsbaseddetector_tpu.ops.resize import reduce_image

    rng = np.random.RandomState(4)
    im = _rand_image(rng, 61, 47)
    want = refgold.reduce(im)
    got = np.asarray(reduce_image(im.astype(np.float32)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


# ---------------------------------------------------------------------------
# Multi-channel valid correlation (matlab/mex/fconv.cc)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,c,fh,fw,seed",
    [(20, 18, 32, 5, 4, 0), (15, 15, 32, 6, 6, 1), (30, 22, 31, 3, 7, 2)],
)
def test_fconv_port_matches_reference(h, w, c, fh, fw, seed):
    rng = np.random.RandomState(seed)
    feat = rng.randn(h, w, c)
    filt = rng.randn(fh, fw, c)
    want = refgold.fconv(feat, filt)
    got = port.fconv_valid(feat, filt)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)


def test_fconv_jax_matches_reference():
    from partsbaseddetector_tpu.ops.conv import filter_responses

    rng = np.random.RandomState(3)
    feat = rng.randn(20, 18, 32).astype(np.float32)
    filt = rng.randn(5, 5, 32).astype(np.float32)
    want = refgold.fconv(feat.astype(np.float64), filt.astype(np.float64))
    got = np.asarray(filter_responses(feat[None], filt[None]))[0, :, :, 0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


# ---------------------------------------------------------------------------
# Generalized shifted/subsampled distance transform (matlab/mex/shiftdt.cc)
# ---------------------------------------------------------------------------

# (wx2, wx1, wy2, wy1) positive quadratic/linear deformation costs as
# stored in models; shifts/dlens pick output grids smaller, equal and
# larger than the source.
_DT_CASES = [
    (15, 12, [0.02, 0.01, 0.03, -0.005], 2, 1, 10, 9, 1, 0),
    (24, 24, [0.05, 0.0, 0.05, 0.0], 0, 0, 24, 24, 1, 1),
    (17, 31, [0.004, -0.02, 0.012, 0.03], 5, 3, 40, 35, 1, 2),
    (9, 9, [0.11, 0.2, 0.07, -0.1], 1, 2, 6, 5, 2, 3),
    (33, 21, [0.01, 0.0, 0.02, 0.0], 3, 4, 21, 33, 1, 4),
]


@pytest.mark.parametrize("h,w,wdef,sx,sy,lx,ly,step,seed", _DT_CASES)
def test_shiftdt_port_matches_reference(h, w, wdef, sx, sy, lx, ly, step, seed):
    rng = np.random.RandomState(seed)
    vals = rng.randn(h, w)
    wdef = np.asarray(wdef, dtype=np.float64)
    want_m, want_ix, want_iy = refgold.shiftdt(vals, wdef, sx, sy, lx, ly, step)
    got_m, got_ix, got_iy = port.shift_dt_2d(vals, wdef, sx, sy, lx, ly, step)
    np.testing.assert_allclose(got_m, want_m, rtol=0, atol=1e-10)
    np.testing.assert_array_equal(got_ix, want_ix)
    np.testing.assert_array_equal(got_iy, want_iy)


@pytest.mark.parametrize("h,w,wdef,sx,sy,lx,ly,step,seed", _DT_CASES)
def test_shiftdt_jax_matches_reference(h, w, wdef, sx, sy, lx, ly, step, seed):
    from partsbaseddetector_tpu.ops.distance_transform import (
        shift_distance_transform_2d,
    )

    rng = np.random.RandomState(seed)
    vals = rng.randn(h, w).astype(np.float32)
    wdef = np.asarray(wdef, dtype=np.float32)
    want_m, want_ix, want_iy = refgold.shiftdt(
        vals.astype(np.float64), np.float64(wdef), sx, sy, lx, ly, step
    )
    got_m, got_ix, got_iy = shift_distance_transform_2d(
        vals, wdef, np.int32(sx), np.int32(sy), lx, ly, step
    )
    np.testing.assert_allclose(np.asarray(got_m), want_m, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_ix), want_ix)
    np.testing.assert_array_equal(np.asarray(got_iy), want_iy)


def test_shiftdt_reference_fuzz_port():
    """Wider randomized sweep of the port vs the actual MEX scan."""
    rng = np.random.RandomState(42)
    for _ in range(25):
        h = int(rng.randint(4, 40))
        w = int(rng.randint(4, 40))
        wdef = np.array(
            [
                rng.uniform(1e-3, 0.2),
                rng.uniform(-0.3, 0.3),
                rng.uniform(1e-3, 0.2),
                rng.uniform(-0.3, 0.3),
            ]
        )
        sx = int(rng.randint(0, w))
        sy = int(rng.randint(0, h))
        lx = int(rng.randint(1, w + 10))
        ly = int(rng.randint(1, h + 10))
        vals = rng.randn(h, w)
        want_m, want_ix, want_iy = refgold.shiftdt(vals, wdef, sx, sy, lx, ly)
        got_m, got_ix, got_iy = port.shift_dt_2d(vals, wdef, sx, sy, lx, ly)
        np.testing.assert_allclose(got_m, want_m, rtol=0, atol=1e-9)
        np.testing.assert_array_equal(got_ix, want_ix)
        np.testing.assert_array_equal(got_iy, want_iy)
