"""Committed golden detection fixtures: guard against semantic drift.

The fixture was generated once from the NumPy reference pipeline
(loop-level semantics); every detector implementation must keep
reproducing it bit-for-box."""

import os

import numpy as np

from partsbaseddetector_tpu import PartsBasedDetector, load_model
from partsbaseddetector_tpu.cpu_detector import CPUPartsBasedDetector

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _load():
    model = load_model(os.path.join(FIX, "golden_model.npz"))
    g = np.load(os.path.join(FIX, "golden_detections.npz"))
    return model, g


def test_tpu_detector_reproduces_golden():
    model, g = _load()
    det = PartsBasedDetector(model, max_detections=64)
    got = det.detect(g["image"])
    assert len(got) == len(g["scores"])
    for c, boxes, score in zip(got, g["boxes"], g["scores"]):
        assert abs(c.score - score) < 2e-3
        np.testing.assert_allclose(c.parts, boxes, atol=5e-2)


def test_cpu_detector_reproduces_golden():
    model, g = _load()
    det = CPUPartsBasedDetector(model)
    got = det.detect(g["image"])
    assert len(got) == len(g["scores"])
    for c, boxes, score in zip(got, g["boxes"], g["scores"]):
        assert abs(c.score - score) < 1e-3
        np.testing.assert_allclose(c.parts, boxes, atol=1e-2)
