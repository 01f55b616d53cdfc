"""TPU mining detector (train/detect_tpu.py) parity vs detect_reference.

The QP training loop mines latent positives and hard negatives through
the jitted pipeline with the weights as traced arguments; these tests
pin that path to the loop-level NumPy reference on placements — level,
per-part grid coords, mixture indices — not just scores/boxes, because
the QP writes feature vectors from the placements
(matlab/learning/train.m:75-106).
"""

import numpy as np
import pytest

from partsbaseddetector_tpu import make_synthetic_model
from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference
from partsbaseddetector_tpu.train.detect_tpu import TPUMiner


def _assert_placements_equal(got, want, atol=2e-3):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < atol, (g["score"], w["score"])
        assert g["component"] == w["component"]
        assert g["level"] == w["level"], (g["level"], w["level"])
        np.testing.assert_array_equal(g["xs"], w["xs"])
        np.testing.assert_array_equal(g["ys"], w["ys"])
        np.testing.assert_array_equal(g["mixtures"], w["mixtures"])
        np.testing.assert_allclose(
            g["boxes"], w["boxes"], atol=5e-2, rtol=1e-4
        )


def test_plain_mining_parity():
    """Hard-negative mining contract: top detections with grid coords."""
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(4, 4), sbin=8, interval=3, thresh=-1.0,
        seed=3,
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(120, 140, 3) * 255).astype(np.float32)
    want = detect_reference(im, model, thresh=-1e8)[:20]
    got = TPUMiner(model, max_det=32).detect(im, thresh=-1e8)[:20]
    _assert_placements_equal(got, want)


def test_latent_mining_parity():
    """Latent-positive constraint: per-part IoU masks select the same
    single best placement as detect.m:60-95."""
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(4, 4), sbin=8, interval=3, thresh=-1.0,
        seed=3,
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(120, 140, 3) * 255).astype(np.float32)
    boxes = np.array(
        [
            [30.0, 30.0, 65.0, 65.0],
            [40.0, 55.0, 75.0, 90.0],
            [55.0, 35.0, 90.0, 70.0],
        ]
    )
    miner = TPUMiner(model, max_det=32)
    want = detect_reference(
        im, model, thresh=-1e8, part_boxes=boxes, overlap=0.3
    )
    got = miner.detect(im, thresh=-1e8, part_boxes=boxes, overlap=0.3)
    assert len(want) == 1
    _assert_placements_equal(got, want)

    # the fixed-mixtures quirk: ONLY the mixture constraint applies
    # (detect.m:88-99)
    fm = np.array([1, 0, 1])
    want = detect_reference(
        im, model, thresh=-1e8, part_boxes=boxes, overlap=0.3,
        fixed_mixtures=fm,
    )
    got = miner.detect(
        im, thresh=-1e8, part_boxes=boxes, overlap=0.3, fixed_mixtures=fm
    )
    _assert_placements_equal(got, want)
    assert all(got[0]["mixtures"] == fm)


def test_weight_update_without_recompile():
    """set_model adopts new weights through the SAME compiled program
    (the QP loop updates weights every iteration)."""
    model = make_synthetic_model(
        nparts=2, nmix=2, fsize=(4, 4), sbin=8, interval=2, thresh=-1.0,
        seed=7,
    )
    rng = np.random.RandomState(1)
    im = (rng.rand(110, 120, 3) * 255).astype(np.float32)
    miner = TPUMiner(model, max_det=16)
    _assert_placements_equal(
        miner.detect(im, thresh=-1e8)[:10],
        detect_reference(im, model, thresh=-1e8)[:10],
    )
    n_compiled = len(miner._fns)

    # perturb weights in place (what vec_to_model does each iteration)
    for f in model.filters:
        f += rng.randn(*f.shape).astype(np.float32) * 0.05
    model.biases = model.biases + 0.1
    miner.set_model(model)
    _assert_placements_equal(
        miner.detect(im, thresh=-1e8)[:10],
        detect_reference(im, model, thresh=-1e8)[:10],
    )
    assert len(miner._fns) == n_compiled, "weight update must not recompile"


@pytest.mark.slow
def test_octave_offset_part_mining_parity():
    """A part an octave below the root (anchor ds=1) — the miner's
    placements and latent masks must track the finer grid."""
    model = make_synthetic_model(
        nparts=2, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=-1e9,
        seed=60,
    )
    model.anchors[model.defid[0][1][0]][2] = 1  # ds = 1
    rng = np.random.RandomState(0)
    im = (rng.rand(130, 140, 3) * 255).astype(np.float32)
    want = detect_reference(im, model, thresh=-1e8)[:10]
    got = TPUMiner(model, max_det=16).detect(im, thresh=-1e8)[:10]
    _assert_placements_equal(got, want)
