"""Static inventory of every DT kernel call in the person26-VGA serving
program: shapes, quadratic weights, valid counts — plus the implied
displacement-window radii for a range of live value ranges R. Traces on
CPU (jax.eval_shape), so it runs in seconds and needs no TPU.

The window kernel skips source chunks beyond
    wt = (|w1| + sqrt(w1^2 + 4 w2 (R + (w2 d + |w1|) d))) / (2 w2)
(ops/pallas_dt.py::_make_sublane_kernel). Work scales with
min(wt*2, H)/H, so this prints, per call, the fraction of source rows
the current per-map range bound keeps for representative R values.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import partsbaseddetector_tpu.ops.distance_transform as dtmod
from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model

calls = []

orig = dtmod.shift_distance_transform_2d_packed


def spy(score, wdef, shift_x, shift_y, dlen_x, dlen_y, step=1, **kw):
    try:
        w = np.asarray(wdef)
        w2x = np.unique(np.round(w[..., 0].ravel(), 4)).tolist()[:6]
        w2y = np.unique(np.round(w[..., 2].ravel(), 4)).tolist()[:6]
    except Exception:
        w2x = w2y = []
    calls.append(
        dict(
            shape=tuple(score.shape),
            dlen_x=int(dlen_x),
            dlen_y=int(dlen_y),
            step=int(step),
            w2x=w2x,
            w2y=w2y,
            valid_h=(
                None
                if kw.get("valid_h") is None
                else int(np.max(kw["valid_h"]))
            ),
        )
    )
    return orig(score, wdef, shift_x, shift_y, dlen_x, dlen_y, step, **kw)


dtmod.shift_distance_transform_2d_packed = spy
import partsbaseddetector_tpu.ops.dp as dpmod

dpmod.shift_distance_transform_2d_packed = spy

model = make_person_like_model()
model.thresh = 100.0
det = PartsBasedDetector(model, max_detections=256, buckets_per_octave=2)
fn = det._build_fn((480, 640))
jax.eval_shape(fn, jax.ShapeDtypeStruct((480, 640, 3), np.float32))

tot_y = tot_x = 0.0
print(f"{len(calls)} DT 2-D calls")
for c in calls:
    b = int(np.prod(c["shape"][:-2]))
    h, w = c["shape"][-2:]
    # brute samples (no window): y pass b*dlen_y*h*w ; x pass b*dlen_x*w*dlen_y
    sy = b * c["dlen_y"] * h * w
    sx = b * c["dlen_x"] * w * c["dlen_y"]
    tot_y += sy
    tot_x += sx
    w2 = min(c["w2y"]) if c["w2y"] else 0.0
    wins = {}
    for R in (5.0, 20.0, 80.0):
        if w2 > 0:
            wt = np.sqrt(R / w2)
            wins[R] = round(min(1.0, 2 * wt / h), 2)
        else:
            wins[R] = 1.0
    print(
        f"  {c['shape']} -> ({c['dlen_y']},{c['dlen_x']}) step{c['step']}"
        f" w2y={c['w2y']} keep@R=5/20/80: {list(wins.values())}"
        f" samples y/x = {sy/1e6:.0f}M/{sx/1e6:.0f}M"
    )
print(f"total brute samples: y {tot_y/1e9:.2f}G  x {tot_x/1e9:.2f}G")
