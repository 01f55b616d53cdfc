"""Isolate the hybrid-profile regression (BENCH r4 cold run: hybrid
16.6 img/s vs f32 43.0). Times, at person26-VGA on the real chip:
  a) f32 pipeline (reference point)
  b) bf16 pipeline, rerank OFF (the low-precision floor)
  c) bf16 + fp32 rerank, shared fp32 pyramid (current detector.py)
and prints a device-op breakdown for (c).
Usage: python tools/hybrid_probe.py [a b c ...]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model
from partsbaseddetector_tpu.utils.profiling import device_op_breakdown

IMSIZE = (480, 640)
im = jax.device_put(
    (np.random.RandomState(0).rand(*IMSIZE, 3) * 255).astype(np.float32)
)


def timeit(fn, iters=20):
    out = fn(im)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(im)
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


which = set(sys.argv[1:]) or {"a", "b", "c"}
model = make_person_like_model()
model.thresh = 100.0
kw = dict(max_detections=256, buckets_per_octave=2)

if "a" in which:
    det = PartsBasedDetector(model, **kw)
    print(json.dumps({"profile": "f32", "ms": round(timeit(det.detect_fn(IMSIZE)), 2)}))

if "b" in which:
    det = PartsBasedDetector(model, dtype=jnp.bfloat16, rerank_fp32=False, **kw)
    print(json.dumps({"profile": "bf16 no-rerank", "ms": round(timeit(det.detect_fn(IMSIZE)), 2)}))

if "c" in which:
    det = PartsBasedDetector(model, dtype=jnp.bfloat16, **kw)
    fn = det.detect_fn(IMSIZE)
    ms = timeit(fn)
    bd = device_op_breakdown(fn, im, iters=5)
    print(json.dumps({"profile": "hybrid (shared fp32 pyramid)", "ms": round(ms, 2), "device_op_ms": bd}))
