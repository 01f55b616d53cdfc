"""A/B the rescore patch gather: elementwise jnp.take of a (K,Pm,bh,bw,C)
index tensor vs one row-gather of contiguous (bw*C) slices per
(candidate, part, filter-row). Shapes match person26-VGA serving
(K=256 candidates, Pm=26 parts, 6x6x32 filters, ~13M-float flat
feature buffer)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K, PM, BH, BW, C = 256, 26, 6, 6, 32
FLAT = 13_000_000

rng = np.random.RandomState(0)
flat = jnp.asarray(rng.rand(FLAT).astype(np.float32))
base = jnp.asarray(
    rng.randint(0, FLAT - BH * 2000 * C, size=(K, PM)).astype(np.int32)
)
wb = jnp.full((K, PM), 1000, jnp.int32)
filt = jnp.asarray(rng.rand(K, PM, BH, BW, C).astype(np.float32))


@jax.jit
def take_path(flat, base, wb, filt):
    iy = jnp.arange(BH, dtype=jnp.int32)[None, None, :, None, None]
    ix = jnp.arange(BW, dtype=jnp.int32)[None, None, None, :, None]
    ic = jnp.arange(C, dtype=jnp.int32)[None, None, None, None, :]
    idx = (
        base[:, :, None, None, None]
        + (iy * wb[:, :, None, None, None] + ix) * C
        + ic
    )
    patches = jnp.take(flat, idx, mode="clip")
    return jnp.einsum("kpijc,kpijc->kp", patches, filt)


@jax.jit
def rowslice_path(flat, base, wb, filt):
    iy = jnp.arange(BH, dtype=jnp.int32)[None, None, :]
    starts = (base[:, :, None] + iy * wb[:, :, None] * C).reshape(-1)
    rows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(flat, (s,), (BW * C,))
    )(starts)
    patches = rows.reshape(K, PM, BH, BW, C)
    return jnp.einsum("kpijc,kpijc->kp", patches, filt)


def timeit(f):
    out = f(flat, base, wb, filt)
    jax.block_until_ready(out)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(flat, base, wb, filt)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / 20 * 1e3


a = take_path(flat, base, wb, filt)
b = rowslice_path(flat, base, wb, filt)
print("max delta:", float(jnp.max(jnp.abs(a - b))))
print("take_path ms:", round(timeit(take_path), 3))
print("rowslice  ms:", round(timeit(rowslice_path), 3))
