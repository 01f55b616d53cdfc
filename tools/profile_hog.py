"""Bisect the HOG-pyramid stage cost on TPU: time progressive prefixes.

Prefixes: resample chain only; + gradient/orientation maps; + histogram
matmuls; + normalization/output; full bucket assembly. Both the batched
and per-scale loop builders.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from partsbaseddetector_tpu.models.model import make_person_like_model, pack_model
from partsbaseddetector_tpu.ops import hog as hog_mod
from partsbaseddetector_tpu.ops.hog import _hist_matrix, _orientation_units
from partsbaseddetector_tpu.ops.pyramid import (
    _scale_images,
    build_plan,
    build_pyramid_features,
    build_pyramid_features_hybrid,
)
from partsbaseddetector_tpu.utils.rounding import cround

NORIENT = 18


def timeit(fn, im, iters=20):
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
    packed = pack_model(make_person_like_model())
    spec = packed.spec
    plan = build_plan(imsize, spec, 5, 5, 2)

    def images_only(im):
        return _scale_images(im.astype(jnp.float32), plan, spec)

    def grad_stage(im):
        ims = _scale_images(im.astype(jnp.float32), plan, spec)
        outs = []
        for x in ims:
            dy = x[2:, 1:-1, :] - x[:-2, 1:-1, :]
            dx = x[1:-1, 2:, :] - x[1:-1, :-2, :]
            v3 = dx * dx + dy * dy
            ci = jnp.argmax(v3, axis=-1)
            pick = jax.nn.one_hot(ci, 3, dtype=x.dtype)
            gdx = (dx * pick).sum(-1)
            gdy = (dy * pick).sum(-1)
            gv = (v3 * pick).sum(-1)
            outs.append((gdx, gdy, gv))
        return outs

    def orient_stage(im):
        ims = _scale_images(im.astype(jnp.float32), plan, spec)
        outs = []
        uu, vv = _orientation_units(jnp.float32)
        for x in ims:
            dy = x[2:, 1:-1, :] - x[:-2, 1:-1, :]
            dx = x[1:-1, 2:, :] - x[1:-1, :-2, :]
            v3 = dx * dx + dy * dy
            ci = jnp.argmax(v3, axis=-1)
            pick = jax.nn.one_hot(ci, 3, dtype=x.dtype)
            gdx = (dx * pick).sum(-1)
            gdy = (dy * pick).sum(-1)
            gv = (v3 * pick).sum(-1)
            dots = gdx[..., None] * uu + gdy[..., None] * vv
            inter = jnp.stack([dots, -dots], axis=-1).reshape(
                *dots.shape[:-1], 18
            )
            idx = jnp.argmax(inter, axis=-1)
            best_o = (idx >> 1) + 9 * (idx & 1)
            mag = jnp.sqrt(gv)
            onehot = jax.nn.one_hot(best_o, NORIENT, dtype=x.dtype) * mag[..., None]
            outs.append(onehot)
        return outs

    def hist_stage(im):
        ims = _scale_images(im.astype(jnp.float32), plan, spec)
        outs = []
        uu, vv = _orientation_units(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        for x in ims:
            h, w, _ = x.shape
            bh, bw = cround(h / spec.sbin), cround(w / spec.sbin)
            vh, vw = bh * spec.sbin, bw * spec.sbin
            dy = x[2:, 1:-1, :] - x[:-2, 1:-1, :]
            dx = x[1:-1, 2:, :] - x[1:-1, :-2, :]
            ey, ex = max(vh - h, 0), max(vw - w, 0)
            dy = jnp.pad(dy, ((0, ey), (0, ex), (0, 0)), mode="edge")[
                : vh - 2, : vw - 2
            ]
            dx = jnp.pad(dx, ((0, ey), (0, ex), (0, 0)), mode="edge")[
                : vh - 2, : vw - 2
            ]
            v3 = dx * dx + dy * dy
            ci = jnp.argmax(v3, axis=-1)
            pick = jax.nn.one_hot(ci, 3, dtype=x.dtype)
            gdx = (dx * pick).sum(-1)
            gdy = (dy * pick).sum(-1)
            gv = (v3 * pick).sum(-1)
            dots = gdx[..., None] * uu + gdy[..., None] * vv
            inter = jnp.stack([dots, -dots], axis=-1).reshape(
                *dots.shape[:-1], 18
            )
            idx = jnp.argmax(inter, axis=-1)
            best_o = (idx >> 1) + 9 * (idx & 1)
            mag = jnp.sqrt(gv)
            onehot = jax.nn.one_hot(best_o, NORIENT, dtype=x.dtype) * mag[..., None]
            onehot = jnp.pad(onehot, ((1, 1), (1, 1), (0, 0)))
            my = jnp.asarray(_hist_matrix(bh, vh, spec.sbin), x.dtype)
            mx = jnp.asarray(_hist_matrix(bw, vw, spec.sbin), x.dtype)
            tmp = jnp.matmul(my, onehot.reshape(vh, vw * NORIENT), precision=hi)
            hist = jnp.einsum(
                "yvc,xv->yxc", tmp.reshape(bh, vw, NORIENT), mx, precision=hi
            )
            outs.append(hist)
        return outs

    def full_loop(im):
        return build_pyramid_features(im.astype(jnp.float32), plan, spec)

    def full_batched(im):
        return build_pyramid_features_hybrid(im.astype(jnp.float32), plan, spec)

    im = jax.device_put(
        (np.random.RandomState(0).rand(*imsize, 3) * 255).astype(np.float32)
    )
    for name, fn in [
        ("images_only", images_only),
        ("grad", grad_stage),
        ("orient", orient_stage),
        ("hist", hist_stage),
        ("full_loop", full_loop),
        ("full_batched", full_batched),
    ]:
        t0 = time.perf_counter()
        sec = timeit(jax.jit(fn), im)
        compile_s = time.perf_counter() - t0 - sec * 20
        print(f"{name:13s}: {sec * 1e3:8.2f} ms (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
