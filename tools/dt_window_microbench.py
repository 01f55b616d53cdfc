"""Window-kernel (v3) vs chunked-kernel (v2) on real TPU: exactness + speed.

Shapes mimic the person26-VGA finest bucket x-pass: (G*S*M*H) rows of
width ~160, with per-scale bucket padding and realistic deformation
magnitudes.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from partsbaseddetector_tpu.ops.pallas_dt import (
    _dt1d_pallas_2d,
    _dt1d_pallas_window,
)


def main():
    rng = np.random.RandomState(0)
    G, S, M, H = 8, 5, 4, 120
    n = 160
    dlen = 160
    bsz = G * S * M * H
    src = (rng.randn(bsz, n) * 1.5).astype(np.float32)
    # bucket padding: per-scale valid widths 160, 147, 135, 124, 114
    vws = np.array([160, 147, 135, 124, 114])
    vw = np.repeat(
        np.broadcast_to(vws[None, :, None, None], (G, S, M, H)).reshape(bsz), 1
    )
    mask = np.arange(n)[None, :] >= vw[:, None]
    src[mask] = -np.inf
    a = -(0.01 + 0.04 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    sh = rng.randint(-6, 7, size=bsz)
    aux = rng.randint(0, 4000, size=(bsz, n)).astype(np.int32)
    ov = vw.astype(np.int32)  # consumer extent ~ same as source extent

    srcj = jnp.asarray(src)
    auxj = jnp.asarray(aux)

    f2 = jax.jit(
        lambda s, x: _dt1d_pallas_2d(
            s, jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(sh.astype(np.float32)), jnp.asarray(vw, jnp.int32),
            x, dlen, 1, 16, False, True,
        )
    )
    f3 = jax.jit(
        lambda s, x: _dt1d_pallas_window(
            s, jnp.asarray(a), jnp.asarray(b), sh, ov, x, dlen, 16,
            False, True,
        )
    )
    f3_noov = jax.jit(
        lambda s, x: _dt1d_pallas_window(
            s, jnp.asarray(a), jnp.asarray(b), sh, None, x, dlen, 16,
            False, True,
        )
    )

    o2, p2 = f2(srcj, auxj)
    o3, p3 = f3(srcj, auxj)
    o3n, p3n = f3_noov(srcj, auxj)
    o2, p2, o3, p3, o3n, p3n = map(np.asarray, (o2, p2, o3, p3, o3n, p3n))

    # exactness where the consumer looks (lane < ov)
    lane_ok = np.arange(dlen)[None, :] < ov[:, None]
    print("value mismatches (ov lanes):", int((o2 != o3)[lane_ok].sum()))
    print("ptr   mismatches (ov lanes):", int((p2 != p3)[lane_ok].sum()))
    print("value mismatches (full, no-ov):", int((o2 != o3n).sum()))
    print("ptr   mismatches (full, no-ov):", int((p2 != p3n).sum()))

    for name, f in [("v2", f2), ("v3", f3), ("v3-noov", f3_noov)]:
        out = f(srcj, auxj)
        jax.block_until_ready(out)
        _ = np.asarray(out[0])
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = f(srcj, auxj)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms  ({bsz} rows x {n} -> {dlen})")


if __name__ == "__main__":
    main()
