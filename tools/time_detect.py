import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, numpy as np
from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model

model = make_person_like_model(); model.thresh = 100.0
det = PartsBasedDetector(model, max_detections=256, buckets_per_octave=2)
fn = det.detect_fn((480, 640))
im = jax.device_put((np.random.RandomState(0).rand(480, 640, 3)*255).astype(np.float32))
out = fn(im); jax.block_until_ready(out); _ = np.asarray(out[1])
t0 = time.perf_counter()
for _ in range(30): out = fn(im)
_ = np.asarray(out[1])
print(f"full detect: {(time.perf_counter()-t0)/30*1e3:.2f} ms")
