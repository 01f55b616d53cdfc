"""CPU (native-kernel) detector vs TPU/XLA detector cross-check."""

import numpy as np
import pytest

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu import native
from partsbaseddetector_tpu.cpu_detector import CPUPartsBasedDetector


def test_cpu_detector_matches_jax_detector():
    model = make_synthetic_model(
        nparts=4, nmix=2, fsize=(4, 4), sbin=8, interval=2, thresh=1.0, seed=40
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(140, 150, 3) * 255).astype(np.float32)

    cpu = CPUPartsBasedDetector(model)
    probe = cpu.detect(im)
    model.thresh = probe[min(30, len(probe)) - 1].score - 1e-6
    got_cpu = [c for c in probe if c.score >= model.thresh]
    jaxdet = PartsBasedDetector(model, max_detections=512)
    got_jax = jaxdet.detect(im)

    assert len(got_cpu) == len(got_jax)
    for a, b in zip(got_cpu, got_jax):
        assert abs(a.score - b.score) < 2e-3
        np.testing.assert_allclose(a.parts, b.parts, atol=5e-2)


@pytest.mark.skipif(not native.available(), reason="no native library")
def test_cpu_detector_native_vs_numpy_kernels():
    model = make_synthetic_model(
        nparts=3, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=0.5, seed=41
    )
    rng = np.random.RandomState(1)
    im = (rng.rand(100, 100, 3) * 255).astype(np.float32)
    a = CPUPartsBasedDetector(model, use_native=True).detect(im)
    b = CPUPartsBasedDetector(model, use_native=False).detect(im)
    assert len(a) == len(b)
    for ca, cb in zip(a, b):
        assert abs(ca.score - cb.score) < 1e-3
        np.testing.assert_allclose(ca.parts, cb.parts, atol=1e-3)
