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


@pytest.mark.slow
def test_hybrid_pyramid_matches_default():
    """The octave-batched pyramid builder must match the per-scale
    loop builder to 1 ulp: clamped gathers + iota masks reproduce each
    scale's edge semantics exactly; the only drift is fp reduction
    order in the 18-orientation sums (XLA tiles batched shapes
    differently), bounded at ~1e-7."""
    import jax.numpy as jnp

    from partsbaseddetector_tpu.models.model import (
        ModelSpec,
        make_synthetic_model,
        pack_model,
    )
    from partsbaseddetector_tpu.ops.pyramid import (
        build_plan,
        build_pyramid_features_hybrid,
        build_pyramid_features,
    )

    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(4, 3), sbin=4, interval=3, thresh=0.0,
        seed=11,
    )
    spec = pack_model(model).spec
    rng = np.random.RandomState(0)
    for shape in [(97, 113), (160, 120)]:
        im = jnp.asarray(
            (rng.rand(*shape, 3) * 255).astype(np.float32)
        )
        plan = build_plan(shape, spec, 4, 3, buckets_per_octave=1)
        got = build_pyramid_features_hybrid(im, plan, spec)
        want = build_pyramid_features(im, plan, spec)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=0, atol=1e-6
            )


@pytest.mark.slow
def test_hybrid_pyramid_matches_default_half_octave():
    import jax.numpy as jnp

    from partsbaseddetector_tpu.models.model import (
        make_synthetic_model,
        pack_model,
    )
    from partsbaseddetector_tpu.ops.pyramid import (
        build_plan,
        build_pyramid_features_hybrid,
        build_pyramid_features,
    )

    model = make_synthetic_model(
        nparts=2, nmix=1, fsize=(3, 3), sbin=4, interval=4, thresh=0.0,
        seed=12,
    )
    spec = pack_model(model).spec
    rng = np.random.RandomState(1)
    im = jnp.asarray((rng.rand(110, 90, 3) * 255).astype(np.float32))
    plan = build_plan((110, 90), spec, 3, 3, buckets_per_octave=2)
    got = build_pyramid_features_hybrid(im, plan, spec)
    want = build_pyramid_features(im, plan, spec)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=0, atol=1e-6
        )
