"""Cold-compile time vs XLA effort knobs for the person-VGA detect.

The <60 s cold-build goal (VERDICT r1 item 6) is bounded by XLA's
optimization passes on this 1-core host, not by tracing or Mosaic
(ROADMAP: ~36 s trace+lower + ~136 s XLA). This measures whether the
documented XLA effort knobs buy compile time, and what they cost at
runtime. Uses a throwaway compilation cache dir so every compile is
genuinely cold. Usage: python tools/compile_effort.py [opt_name]
"""
import os, sys, time, tempfile, json

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="jaxcache_effort_"
)
sys.path.insert(0, "/root/repo")
import jax
import numpy as np
from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model

OPTIONS = {
    "default": {},
    "exec_effort_min": {"exec_time_optimization_effort": -1.0},
    "opt_level_1": {"xla_backend_optimization_level": 1},
    "eff_o1": {"optimization_level": 1},
    "eff_o0": {"optimization_level": 0},
}

which = sys.argv[1] if len(sys.argv) > 1 else "default"
opts = OPTIONS[which]

model = make_person_like_model()
model.thresh = 100.0
det = PartsBasedDetector(
    model, max_detections=256,
    buckets_per_octave=int(os.environ.get("PBD_CE_BPO", "2")),
)
im = jax.device_put(
    (np.random.RandomState(0).rand(480, 640, 3) * 255).astype(np.float32)
)

fn = jax.jit(det._build_fn((480, 640)))
t0 = time.perf_counter()
lowered = fn.lower(im)
t_lower = time.perf_counter() - t0
t0 = time.perf_counter()
compiled = lowered.compile(compiler_options=opts or None)
t_compile = time.perf_counter() - t0

out = compiled(im)
jax.block_until_ready(out)
_ = np.asarray(out[1])
t0 = time.perf_counter()
for _ in range(30):
    out = compiled(im)
_ = np.asarray(out[1])
ms = (time.perf_counter() - t0) / 30 * 1e3
print(json.dumps({
    "option": which, "opts": opts, "lower_s": round(t_lower, 1),
    "compile_s": round(t_compile, 1), "detect_ms": round(ms, 2),
}))
