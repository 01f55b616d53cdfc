"""backtrack_merged vs per-bucket backtrack equivalence.

The merged tail (ops/dp.py::backtrack_merged) replaces NB per-bucket
top_k sorts + NB*(P-1) serialized gathers with one global sort + one
gather per tree level. The candidate SET (scores, boxes, mixtures,
components) must match the per-bucket path exactly; order among
exactly-tied scores may differ, so comparisons sort by
(score, box-corner) key. Covers multi-bucket pyramids, both border
modes, on-device NMS, and a multi-component model.
Reference walk semantics: detect_fast.m:144-177.
"""

import os

import numpy as np
import pytest

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu.models.model import (
    make_face_like_model,
    make_person_like_model,
)


def _detect(model, im, backtrack, **kw):
    os.environ["PBD_BACKTRACK"] = backtrack
    try:
        det = PartsBasedDetector(model, max_detections=64, **kw)
        return det.detect(im)
    finally:
        os.environ.pop("PBD_BACKTRACK", None)


def _key(c):
    return (round(float(c.score), 5),) + tuple(
        np.round(np.asarray(c.parts), 3).reshape(-1)
    )


def _assert_same(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for ca, cb in zip(sorted(a, key=_key), sorted(b, key=_key)):
        assert ca.score == cb.score
        assert ca.component == cb.component
        # box formulas are identical but compile in separate programs,
        # so XLA's FMA contraction can differ by last-ulp (~1e-5 px)
        np.testing.assert_allclose(
            np.asarray(ca.parts), np.asarray(cb.parts), rtol=0, atol=1e-4
        )
        np.testing.assert_array_equal(ca.mixtures, cb.mixtures)


def _image(seed, h=128, w=160):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(
        np.float32
    )


def _with_thresh(model, im, keep=20, **kw):
    model.thresh = -1e9
    probe = PartsBasedDetector(model, max_detections=64, **kw)
    got = probe.detect(im)
    scores = sorted((c.score for c in got), reverse=True)
    model.thresh = float(scores[min(keep, len(scores)) - 1]) - 1e-6
    return model


@pytest.mark.slow
@pytest.mark.parametrize("border", ["matlab", "cpp"])
def test_merged_matches_per_bucket(border):
    model = make_synthetic_model(seed=3, nparts=5, nmix=2, ncomponents=2)
    im = _image(0)
    model = _with_thresh(model, im, border_mode=border)
    _assert_same(
        _detect(model, im, "merged", border_mode=border),
        _detect(model, im, "per_bucket", border_mode=border),
    )


@pytest.mark.slow
def test_merged_matches_per_bucket_person_buckets2():
    model = make_person_like_model(seed=1)
    im = _image(1, 96, 120)
    model = _with_thresh(model, im, keep=10)
    _assert_same(
        _detect(model, im, "merged", buckets_per_octave=2),
        _detect(model, im, "per_bucket", buckets_per_octave=2),
    )


@pytest.mark.slow
def test_merged_matches_per_bucket_with_nms():
    model = make_face_like_model(seed=2)
    im = _image(2, 96, 112)
    model = _with_thresh(model, im, keep=12)
    _assert_same(
        _detect(model, im, "merged", nms_overlap=0.4),
        _detect(model, im, "per_bucket", nms_overlap=0.4),
    )
