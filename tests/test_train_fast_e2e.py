"""FAST-TIER training round trip (VERDICT r4 weak-point 6): the default
`pytest tests/ -q` run must fail if the trainer breaks, not just the
slow tier. A minimal 2-part model trains through the FULL driver path —
feature extraction, warped-positive init, latent positives, interleaved
hard-negative mining, QP, vec2model — and the trained model must
separate held-out object scenes from noise. Realistic-scale proofs
(8/13/26 parts, multi-mixture) stay in the slow tier
(test_trainmodel_e2e.py, test_train_realistic_e2e.py).

Ref: matlab/learning/trainmodel.m:19-64 (driver),
matlab/learning/train.m:44-176 (latent SSVM loop).
"""

import numpy as np

from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference
from partsbaseddetector_tpu.train.trainmodel import train_model


def _scene(rng, with_object=True, size=72):
    im = rng.rand(size, size, 3) * 40
    points = None
    if with_object:
        cx = rng.randint(22, size - 26)
        cy = rng.randint(22, size - 40)
        im[cy - 8 : cy + 8, cx - 8 : cx + 8, 0] += 200  # root: red
        im[cy + 10 : cy + 26, cx - 8 : cx + 8, 2] += 200  # part: blue
        points = np.array([[cx, cy], [cx, cy + 18]], dtype=np.float64)
    return np.clip(im, 0, 255), points


def test_tiny_train_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    positives = []
    for _ in range(6):
        im, pts = _scene(rng, True)
        positives.append({"im": im, "points": pts})
    negatives = [{"im": _scene(rng, False)[0]} for _ in range(2)]

    model = train_model(
        "toy2-fast",
        positives,
        negatives,
        K=[1, 1],
        pa=[0, 0],
        sbin=8,
        interval=2,
        cachedir=str(tmp_path / "cache"),
        warp_iters=1,
        latent_iters=1,
        nmax=150,
    )
    model.validate()
    assert model.nparts(0) == 2

    im_pos, pts = _scene(np.random.RandomState(91), True)
    im_neg, _ = _scene(np.random.RandomState(92), False)
    d_pos = detect_reference(im_pos, model, thresh=-1e9)[0]
    d_neg = detect_reference(im_neg, model, thresh=-1e9)[0]
    assert d_pos["score"] > d_neg["score"], (d_pos["score"], d_neg["score"])

    bx = d_pos["boxes"][0]
    cx, cy = 0.5 * (bx[0] + bx[2]), 0.5 * (bx[1] + bx[3])
    assert abs(cx - pts[0, 0]) < 18 and abs(cy - pts[0, 1]) < 18, (
        (cx, cy),
        pts[0],
    )
