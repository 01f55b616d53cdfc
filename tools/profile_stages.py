"""Per-stage TPU timing of the person26-VGA detect pipeline.

Times progressively longer prefixes of the pipeline as separate jitted
programs (HOG pyramid; +conv responses; +tree DP; full detect with
backtrack); stage cost = difference of adjacent prefixes. Differences
are approximate (XLA fuses differently per program) but good enough to
rank bottlenecks.

Usage: python tools/profile_stages.py [H W] [iters]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.models.model import make_person_like_model
from partsbaseddetector_tpu.ops.pyramid import build_pyramid_features
from partsbaseddetector_tpu.pipeline import make_plan, root_scores


def timeit(fn, im, iters):
    out = fn(im)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(im)
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    imsize = (480, 640)
    iters = 20
    args = sys.argv[1:]
    if len(args) >= 2:
        imsize = (int(args[0]), int(args[1]))
    if len(args) >= 3:
        iters = int(args[2])

    model = make_person_like_model()
    model.thresh = 100.0
    det = PartsBasedDetector(model, max_detections=256, buckets_per_octave=2)
    packed = det._packed
    plan = make_plan(packed, imsize, det.buckets_per_octave)
    spec = packed.spec

    def hog_only(im):
        return build_pyramid_features(im.astype(jnp.float32), plan, spec)

    def conv_prefix(im):
        from partsbaseddetector_tpu.ops.conv import filter_responses
        from partsbaseddetector_tpu.ops.pyramid import (
            mask_responses,
            response_valid_extents,
        )

        feats = build_pyramid_features(im.astype(jnp.float32), plan, spec)
        filters = jnp.asarray(packed.filters, jnp.float32)
        out = []
        for b, bucket in enumerate(plan.buckets):
            resp = filter_responses(feats[b], filters)
            vh, vw = response_valid_extents(
                plan, bucket, packed.filter_sizes, spec.border
            )
            out.append(mask_responses(resp, vh, vw, -jnp.inf))
        return out

    def dp_prefix(im):
        scores = root_scores(
            im.astype(jnp.float32), packed, plan, with_tables=True
        )
        # return rootv maps + tables so the DP isn't dead-code eliminated
        return [s.rootv for s in scores], [
            t for s in scores for t in s.tables.values()
        ]

    def dp_notables(im):
        scores = root_scores(
            im.astype(jnp.float32), packed, plan, with_tables=False
        )
        return [s.rootv for s in scores]

    full = det.detect_fn(imsize)

    im = jax.device_put(
        (np.random.RandomState(0).rand(*imsize, 3) * 255).astype(np.float32)
    )

    stages = [
        ("hog_pyramid", jax.jit(hog_only)),
        ("+conv", jax.jit(conv_prefix)),
        ("+dp_notables", jax.jit(dp_notables)),
        ("+dp_tables", jax.jit(dp_prefix)),
        ("full_detect", full),
    ]
    prev = 0.0
    print(f"imsize={imsize} iters={iters} devices={jax.devices()}")
    for name, fn in stages:
        t0 = time.perf_counter()
        sec = timeit(fn, im, iters)
        compile_s = time.perf_counter() - t0 - sec * iters
        print(
            f"{name:14s}: {sec * 1e3:8.2f} ms  (delta {max(sec - prev, 0) * 1e3:7.2f} ms, compile+warm {compile_s:.1f}s)"
        )
        prev = sec


if __name__ == "__main__":
    main()
