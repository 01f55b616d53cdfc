"""Run the committed golden detection fixture on the real chip.

The CPU test suite (tests/test_golden.py) pins semantics on the CPU
backend; this tool asserts the same fixture on actual TPU hardware with
whatever kernel configuration the environment selects (PBD_CONV,
PBD_DT_IMPL, PBD_DT_XPASS, ...), so kernel changes get hardware
re-validation before landing. Prints PASS/FAIL per candidate set.
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from partsbaseddetector_tpu import PartsBasedDetector, load_model

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

model = load_model(os.path.join(FIX, "golden_model.npz"))
g = np.load(os.path.join(FIX, "golden_detections.npz"))
print("backend:", jax.default_backend(), jax.devices()[0])

det = PartsBasedDetector(model, max_detections=64)
got = det.detect(g["image"])
ok = len(got) == len(g["scores"])
print(f"candidates: {len(got)}/{len(g['scores'])}")
worst_s, worst_b = 0.0, 0.0
for c, boxes, score in zip(got, g["boxes"], g["scores"]):
    worst_s = max(worst_s, abs(c.score - score))
    worst_b = max(worst_b, float(np.max(np.abs(c.parts - boxes))))
print(f"max |dscore| = {worst_s:.3e}  max |dbox| = {worst_b:.3e}")
ok = ok and worst_s < 2e-3 and worst_b < 5e-2
print("top score:", got[0].score if got else None)
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
