"""Probe: can Mosaic lower an in-kernel 2D transpose, and how fast?

If `out_ref[...] = x.T` lowers and runs near VPU speed, the x-pass DT
can read/write natural-layout arrays with in-kernel transposes and the
4 response-sized XLA transpose copies around it (~360 MB/detect of
slow minor-dim relayout traffic) disappear.

Usage: python tools/transpose_kernel_probe.py
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_tp(shape, bt):
    b, h, w = shape

    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0].T

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, w, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w, h), jnp.float32),
    )


def bench(fn, x, iters=30):
    o = fn(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(x)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3, o


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    for shape in [(160, 168, 128), (160, 166, 126), (520, 128, 104)]:
        x = jax.device_put(rng.randn(*shape).astype(np.float32))
        try:
            f = jax.jit(make_tp(shape, None))
            ms, o = bench(f, x)
            ok = np.array_equal(np.asarray(o), np.asarray(x).swapaxes(-1, -2))
            g = jax.jit(lambda t: jnp.swapaxes(t, -1, -2))
            ms2, o2 = bench(g, x)
            mb = np.prod(shape) * 4 / 1e6
            print(f"{shape}: pallas.T {ms:.3f} ms ({mb/ms:.1f} GB/s) "
                  f"exact={ok}  xla.swap {ms2:.3f} ms ({mb/ms2:.1f} GB/s)")
        except Exception as e:
            print(f"{shape}: FAILED {type(e).__name__}: {str(e)[:200]}")
