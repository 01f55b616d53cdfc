"""Plausible-depth response gating (the intended
SearchSpacePruning::filterResponseByDepth, src/SearchSpacePruning.cpp:
47-70 — the reference computes Z = fx*X/scale per scale and then
discards it; we implement the intended masking as a device-side
response gate).

Three layers of evidence:
  - the device mask builder (pipeline.depth_response_masks) equals the
    host predictor (depth.depth_level_mask) bit-for-bit;
  - a gated detect() changes the candidate set exactly as the NumPy
    reference pipeline predicts when fed the same per-level masks;
  - unknown depth (0 / NaN) passes everywhere, so gating with an
    uninformative depth map is a no-op.
"""

import numpy as np
import pytest

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu.depth import DepthGate, depth_level_mask
from partsbaseddetector_tpu.models.model import pack_model
from partsbaseddetector_tpu.ops.reference_pipeline import (
    detect_reference,
    feature_pyramid,
)
from partsbaseddetector_tpu.pipeline import depth_response_masks, make_plan


def _model(seed=10):
    return make_synthetic_model(
        nparts=4, nmix=2, fsize=(4, 4), sbin=8, interval=3, thresh=2.0,
        seed=seed,
    )


def _calibrate(model, im, keep=12):
    probe = detect_reference(im, model, thresh=-1e9)
    scores = sorted((d["score"] for d in probe), reverse=True)
    model.thresh = float(scores[min(keep, len(scores)) - 1]) - 1e-6
    return model


def _split_depth(shape):
    """Left half at 2.5 m (plausible at every pyramid scale: with
    fx*X=32 the expected depth spans [2, 4] m and tol=0.5 admits 2.5
    throughout), right half at 20 m (implausible at every scale) — so
    gating reroutes or drops exactly the placements touching the right
    half."""
    depth = np.full(shape, 2.5, dtype=np.float32)
    depth[:, shape[1] // 2 :] = 20.0
    return depth


GATE = DepthGate(object_width_m=0.4, fx=80.0, tolerance=0.5)


def test_device_masks_equal_host_predictor():
    import jax

    model = _model()
    packed = pack_model(model)
    imsize = (170, 190)
    plan = make_plan(packed, imsize)
    depth = _split_depth(imsize)
    dev = jax.jit(
        lambda d: depth_response_masks(d, plan, packed.spec, GATE)
    )(depth)
    masked_any = 0
    for b, bucket in enumerate(plan.buckets):
        got = np.asarray(dev[b])
        for i, sidx in enumerate(bucket.scale_indices):
            info = plan.scales[sidx]
            want = depth_level_mask(
                depth,
                got[i].shape,
                info.box_scale,
                -packed.spec.padx,
                -packed.spec.pady,
                imsize,
                GATE,
            )
            np.testing.assert_array_equal(got[i], want)
            masked_any += int((~want).sum())
    assert masked_any > 0, "fixture must actually gate something"


@pytest.mark.slow
def test_gated_detect_matches_numpy_predictor():
    model = _model()
    rng = np.random.RandomState(0)
    im = (rng.rand(170, 190, 3) * 255).astype(np.float32)
    depth = _split_depth(im.shape[:2])

    feats, box_scales, padx, pady = feature_pyramid(im, model)
    masks = [
        depth_level_mask(
            depth, f.shape[:2], box_scales[lv], -padx, -pady,
            im.shape[:2], GATE,
        )
        for lv, f in enumerate(feats)
    ]
    # calibrate the threshold on GATED scores so the fixture keeps a
    # candidate population after pruning
    probe = detect_reference(im, model, thresh=-1e9, level_masks=masks)
    scores = sorted((d["score"] for d in probe), reverse=True)
    model.thresh = float(scores[min(12, len(scores)) - 1]) - 1e-6
    want = detect_reference(im, model, level_masks=masks)
    want_plain = detect_reference(im, model)
    assert len(want) != len(want_plain) or any(
        abs(a["score"] - b["score"]) > 1e-9 for a, b in zip(want, want_plain)
    ), "fixture must actually change the candidate set"

    det = PartsBasedDetector(model, max_detections=512, depth_gate=GATE)
    got = det.detect_dense(im, depth).to_candidates()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert abs(g.score - w["score"]) < 2e-3, (g.score, w["score"])
        np.testing.assert_allclose(g.parts, w["boxes"], rtol=1e-4, atol=5e-2)
        np.testing.assert_array_equal(g.mixtures, w["mixtures"])


def test_unknown_depth_gates_nothing():
    model = _model(seed=11)
    rng = np.random.RandomState(1)
    im = (rng.rand(120, 140, 3) * 255).astype(np.float32)
    _calibrate(model, im, keep=8)
    depth = np.zeros(im.shape[:2], dtype=np.float32)  # all-unknown

    det = PartsBasedDetector(model, max_detections=256, depth_gate=GATE)
    plain = det.detect_dense(im).to_candidates()
    gated = det.detect_dense(im, depth).to_candidates()
    assert len(plain) == len(gated) > 0
    for a, b in zip(plain, gated):
        assert a.score == b.score
        np.testing.assert_array_equal(a.parts, b.parts)


def test_detect_applies_gate_and_candidate_filter():
    """detect(im, depth) composes both depth stages: response gating
    (when a gate is configured) and the candidate-consistency filter
    (src/SearchSpacePruning.cpp:73-95)."""
    model = _model(seed=12)
    rng = np.random.RandomState(2)
    im = (rng.rand(160, 180, 3) * 255).astype(np.float32)
    _calibrate(model, im, keep=8)
    depth = np.full(im.shape[:2], 2.0, dtype=np.float32)

    det = PartsBasedDetector(model, max_detections=256, depth_gate=GATE)
    cands = det.detect(im, depth)
    # gated dense detection, then the same candidate filter
    from partsbaseddetector_tpu.depth import filter_candidates_by_depth

    want = filter_candidates_by_depth(
        det._packed, det.detect_dense(im, depth).to_candidates(), depth
    )
    assert len(cands) == len(want)
    for a, b in zip(cands, want):
        assert a.score == b.score
