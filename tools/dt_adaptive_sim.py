"""Premise check for the adaptive outward-scan DT kernel (v4 design):
on REAL response data, how many source chunks would each output tile
process before a suffix-max exit bound fires, vs (a) brute force and
(b) the current a-priori per-map-range window?

Analyzes the LEAF level of the biggest bucket (the dominant DT cost;
leaf DT inputs are pure filter responses, no accumulated messages), on
a natural-statistics image. Host NumPy; responses come from ONE jitted
conv on CPU. Prints processed-chunk fractions.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model
from partsbaseddetector_tpu.ops.conv import filter_responses
from partsbaseddetector_tpu.ops.pyramid import (
    build_pyramid_features,
    mask_responses,
    response_valid_extents,
)
from partsbaseddetector_tpu.pipeline import make_plan

model = make_person_like_model()
det = PartsBasedDetector(model, max_detections=16, buckets_per_octave=2)
packed = det._packed
plan = make_plan(packed, (240, 320), 2)
im = (np.random.RandomState(0).rand(240, 320, 3) * 255).astype(np.float32)
im = gaussian_filter(im, (4, 4, 0)).astype(np.float32)


@jax.jit
def responses(im):
    feats = build_pyramid_features(im, plan, packed.spec)
    out = []
    for b, bucket in enumerate(plan.buckets):
        resp = filter_responses(feats[b], jnp.asarray(packed.filters))
        vh, vw = response_valid_extents(
            plan, bucket, packed.filter_sizes, packed.spec.border
        )
        out.append(mask_responses(resp, vh, vw, -jnp.inf))
    return out


resp = [np.asarray(r) for r in responses(jnp.asarray(im))]
comp = packed.components[0]

# leaf parts: deepest level of the tree
depth = np.zeros(comp.filterid.shape[0], np.int64)
for p in range(1, len(depth)):
    depth[p] = depth[int(comp.parentid[p])] + 1
leaves = [p for p in range(1, len(depth)) if depth[p] == depth.max()]
print(f"leaves: {leaves}")

SUB, TS = 8, 24
defw, _, _ = comp.tensors()


def simulate(src, A, B1, dlen):
    h, w = src.shape
    live = np.isfinite(src).any(axis=1)
    if not live.any():
        return 0, 0, 0
    nv = int(np.max(np.nonzero(live)[0])) + 1
    live_chunks = (nv + SUB - 1) // SUB
    nch = (h + SUB - 1) // SUB
    cmax = np.full((nch, w), -np.inf)
    for c in range(nch):
        seg = src[c * SUB : (c + 1) * SUB]
        if seg.size:
            cmax[c] = np.where(np.isfinite(seg), seg, -np.inf).max(axis=0)
    sufup = np.maximum.accumulate(cmax[::-1], axis=0)[::-1]
    sufdn = np.maximum.accumulate(cmax, axis=0)
    pen = lambda d: (A * d + B1) * d
    fin = src[np.isfinite(src)]
    R = fin.max() - fin.min() if fin.size else 0.0
    da = dw = tot = 0
    for t0 in range(0, dlen, TS):
        ts = min(TS, dlen - t0)
        q = np.arange(t0, t0 + ts).astype(np.float64)
        tot += live_chunks
        if A < 0:
            delta = max(0.0, max(-q[0], q[-1] - (nv - 1)))
            cb = R + (-A * delta + abs(B1)) * delta
            wt = (abs(B1) + np.sqrt(B1 * B1 + 4 * -A * cb)) / (2 * -A)
            lo = max(0, int(np.floor((q[0] - wt) / SUB)))
            hi = min(live_chunks, int(np.floor((q[-1] + wt) / SUB)) + 1)
            dw += max(0, hi - lo)
        else:
            dw += live_chunks
        c0 = int(np.clip((q[0] + q[-1]) / 2 // SUB, 0, live_chunks - 1))
        best = np.full((ts, w), -np.inf)
        nproc = 0
        for si in range(live_chunks):
            cs = ([c0] if si == 0 else [
                c for c in (c0 - si, c0 + si) if 0 <= c < live_chunks
            ])
            if not cs:
                break
            for c in cs:
                vs = np.arange(c * SUB, min((c + 1) * SUB, h))
                d = q[:, None] - vs[None, :]
                vals = pen(d)[:, :, None] + np.where(
                    np.isfinite(src[vs]), src[vs], -np.inf
                )[None, :, :]
                best = np.maximum(best, vals.max(axis=1))
                nproc += 1
            slo, shi = c0 - si, c0 + si
            bound = np.full((ts, w), -np.inf)
            dstar = -B1 / (2 * A) if A < 0 else 0.0
            if slo - 1 >= 0:
                dlo = np.maximum(q - (slo * SUB - 1), 0.0)
                pb = pen(dlo)
                if A < 0 and dstar > 0:
                    pb = np.where(dlo < dstar, pen(dstar), pb)
                bound = np.maximum(bound, sufdn[slo - 1][None, :] + pb[:, None])
            if shi + 1 < live_chunks:
                dhi = np.maximum(((shi + 1) * SUB) - q, 0.0)
                pb = pen(-dhi)
                if A < 0 and dstar < 0:
                    pb = np.where(dhi < -dstar, pen(dstar), pb)
                bound = np.maximum(bound, sufup[shi + 1][None, :] + pb[:, None])
            if np.all(best >= bound):
                break
        da += nproc
    return da, dw, tot


tot = np.zeros(3)
src_b = resp[0]  # biggest bucket (S, H, W, F)
for p in leaves[:4]:
    for mix in range(comp.filterid.shape[1]):
        f = int(comp.filterid[p][mix])
        A = -float(defw[p][mix][2])
        B1 = -float(defw[p][mix][3])
        for s in range(src_b.shape[0]):
            sm = src_b[s, :, :, f].astype(np.float64)
            da, dw, t = simulate(sm, A, B1, sm.shape[0])
            tot += (da, dw, t)
print(
    f"TOTAL (leaf y-pass, bucket0): adaptive {tot[0]/tot[2]:.2%}  "
    f"a-priori window {tot[1]/tot[2]:.2%} of brute chunks"
)
