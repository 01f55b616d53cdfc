"""End-to-end training smoke test: plant a visual pattern, train a
3-part model with the full trainmodel driver, and verify the trained
detector localizes the pattern on held-out images."""

import numpy as np
import pytest

from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference
from partsbaseddetector_tpu.train.trainmodel import train_model


def _make_scene(rng, with_object=True, size=96):
    im = rng.rand(size, size, 3) * 40
    points = None
    if with_object:
        cx = rng.randint(28, size - 44)
        cy = rng.randint(28, size - 44)
        # three vertically stacked parts with distinct textures
        im[cy - 8 : cy + 8, cx - 8 : cx + 8, 0] += 200  # root: red block
        im[cy + 10 : cy + 26, cx - 8 : cx + 8, 1] += 200  # part 1: green
        im[cy + 28 : cy + 44, cx - 8 : cx + 8, 2] += 200  # part 2: blue
        points = np.array(
            [[cx, cy], [cx, cy + 18], [cx, cy + 36]], dtype=np.float64
        )
    return np.clip(im, 0, 255), points


@pytest.mark.slow
def test_train_model_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    pa = [0, 0, 1]
    positives = []
    for _ in range(12):
        im, pts = _make_scene(rng, True)
        positives.append({"im": im, "points": pts})
    negatives = [
        {"im": _make_scene(rng, False)[0]} for _ in range(4)
    ]

    model = train_model(
        "toy3",
        positives,
        negatives,
        K=[1, 1, 1],
        pa=pa,
        sbin=8,
        interval=2,
        cachedir=str(tmp_path / "cache"),
        warp_iters=1,
        latent_iters=1,
        nmax=400,
    )
    model.validate()
    assert model.nparts(0) == 3

    # held-out: object image must outscore a pure-noise image
    im_pos, pts = _make_scene(np.random.RandomState(77), True)
    im_neg, _ = _make_scene(np.random.RandomState(78), False)
    d_pos = detect_reference(im_pos, model, thresh=-1e9)[0]
    d_neg = detect_reference(im_neg, model, thresh=-1e9)[0]
    assert d_pos["score"] > d_neg["score"], (d_pos["score"], d_neg["score"])

    # and localize the root near the planted pattern
    bx = d_pos["boxes"][0]
    cx, cy = 0.5 * (bx[0] + bx[2]), 0.5 * (bx[1] + bx[3])
    assert abs(cx - pts[0, 0]) < 20 and abs(cy - pts[0, 1]) < 20, (
        (cx, cy),
        pts[0],
    )
