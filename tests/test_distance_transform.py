"""Distance transform: batched max-plus vs the sequential lower envelope.

The envelope scan (ops/reference.dt1d_envelope, the exact algorithm of
matlab/mex/shiftdt.cc) is the authority for both values and argmax
tie-breaking.
"""

import numpy as np
import pytest

from partsbaseddetector_tpu.ops import reference
from partsbaseddetector_tpu.ops.distance_transform import (
    distance_transform_2d,
    shift_distance_transform_2d,
)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize(
    "a,b", [(-0.01, 0.0), (-0.05, 0.02), (-1.0, -0.5), (-0.002, 0.001)]
)
def test_envelope_equals_bruteforce_1d(seed, a, b):
    rng = np.random.RandomState(seed)
    src = rng.randn(50) * 2
    for shift, dlen, step in [(0, 50, 1), (-3, 40, 1), (5, 20, 2), (2, 50, 1)]:
        v_env, p_env = reference.dt1d_envelope(src, a, b, shift, dlen, step)
        v_bf, p_bf = reference.dt_argmax_bruteforce(src, a, b, shift, dlen, step)
        np.testing.assert_allclose(v_env, v_bf, rtol=1e-10, atol=1e-10)
        np.testing.assert_array_equal(p_env, p_bf)


def test_envelope_tie_breaking_prefers_smaller_v():
    # symmetric src around the center with b=0 creates exact ties
    src = np.zeros(9)
    v_env, p_env = reference.dt1d_envelope(src, -0.5, 0.0)
    v_bf, p_bf = reference.dt_argmax_bruteforce(src, -0.5, 0.0)
    np.testing.assert_array_equal(p_env, p_bf)
    np.testing.assert_array_equal(p_env, np.arange(9))  # identity at cost 0


@pytest.mark.parametrize("seed", range(3))
def test_2d_jax_matches_reference(seed):
    rng = np.random.RandomState(seed)
    score = rng.randn(13, 17).astype(np.float64)
    w = np.array([0.03, -0.01, 0.02, 0.015])
    for sx, sy, dlx, dly, step in [
        (0, 0, 17, 13, 1),
        (2, -1, 10, 8, 1),
        (-2, 3, 17, 13, 1),
        (1, 1, 8, 6, 2),
    ]:
        want_m, want_ix, want_iy = reference.shift_dt_2d(
            score, w, sx, sy, dlx, dly, step
        )
        got_m, got_ix, got_iy = shift_distance_transform_2d(
            score.astype(np.float32),
            w.astype(np.float32),
            np.int32(sx),
            np.int32(sy),
            dlx,
            dly,
            step,
        )
        np.testing.assert_allclose(np.asarray(got_m), want_m, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_ix), want_ix)
        np.testing.assert_array_equal(np.asarray(got_iy), want_iy)


def test_2d_batched_per_mixture_params():
    """Batch dims with per-mixture (a, b, shift) must broadcast."""
    rng = np.random.RandomState(7)
    k = 3
    scores = rng.randn(k, 11, 9)
    wdef = np.abs(rng.rand(k, 4) * 0.05) + 0.01
    wdef[:, 1] = rng.randn(k) * 0.01
    wdef[:, 3] = rng.randn(k) * 0.01
    sx = np.array([0, 2, -1], dtype=np.int32)
    sy = np.array([1, 0, -2], dtype=np.int32)
    got_m, got_ix, got_iy = shift_distance_transform_2d(
        scores.astype(np.float32), wdef.astype(np.float32), sx, sy, 9, 11, 1
    )
    for i in range(k):
        want_m, want_ix, want_iy = reference.shift_dt_2d(
            scores[i], wdef[i], int(sx[i]), int(sy[i]), 9, 11, 1
        )
        np.testing.assert_allclose(
            np.asarray(got_m[i]), want_m, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(got_ix[i]), want_ix)
        np.testing.assert_array_equal(np.asarray(got_iy[i]), want_iy)


def test_neg_inf_sources_never_win():
    score = np.full((6, 6), -np.inf, dtype=np.float32)
    score[2, 3] = 1.0
    w = np.array([0.01, 0.0, 0.01, 0.0], dtype=np.float32)
    msg, ix, iy = distance_transform_2d(score, w, np.int32(0), np.int32(0))
    assert np.all(np.asarray(ix) == 3)
    assert np.all(np.asarray(iy) == 2)
    assert np.isfinite(np.asarray(msg)).all()
