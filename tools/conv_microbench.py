"""Microbench the part-filter conv variants on the real bucket shapes.

Variants: lax.conv at HIGHEST/HIGH/DEFAULT precision, im2row+dot, and
F padded to a 128 multiple. Shapes follow person26 VGA bpo=2 buckets.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

S, C, F = 5, 32, 104
FH = FW = 5
BUCKETS = [(124, 164), (88, 116), (62, 82), (44, 58), (31, 41), (22, 29), (16, 21)]

rng = np.random.RandomState(0)
filt = jnp.asarray(rng.randn(F, FH, FW, C).astype(np.float32))
feats = [jnp.asarray(rng.randn(S, h, w, C).astype(np.float32)) for h, w in BUCKETS]


def conv(feat, filt, prec):
    kern = jnp.transpose(filt, (1, 2, 3, 0))
    return jax.lax.conv_general_dilated(
        feat, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec, preferred_element_type=feat.dtype)


def im2row_dot(feat, filt, prec):
    s, h, w, c = feat.shape
    oh, ow = h - FH + 1, w - FW + 1
    cols = [feat[:, i:i + oh, j:j + ow, :] for i in range(FH) for j in range(FW)]
    patches = jnp.concatenate(cols, axis=-1)  # (S, oh, ow, FH*FW*C)
    k2 = jnp.transpose(filt, (1, 2, 3, 0)).reshape(FH * FW * C, F)
    return jnp.einsum("shwk,kf->shwf", patches, k2, precision=prec)


def bench(name, fn_builder):
    fns = []
    for feat in feats:
        f = jax.jit(fn_builder)
        f(feat).block_until_ready()
        fns.append((f, feat))
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        outs = [f(feat) for f, feat in fns]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / N * 1e3
    flops = sum(2 * S * (h - FH + 1) * (w - FW + 1) * FH * FW * C * F
                for h, w in BUCKETS)
    print(f"{name:28s} {dt:7.3f} ms  {flops/dt*1e3/1e12:6.2f} TFLOP/s")
    return outs


H = jax.lax.Precision.HIGHEST
HI = jax.lax.Precision.HIGH
D = jax.lax.Precision.DEFAULT
ref = bench("conv HIGHEST", partial(conv, filt=filt, prec=H))
bench("conv HIGH", partial(conv, filt=filt, prec=HI))
bench("conv DEFAULT", partial(conv, filt=filt, prec=D))
bench("im2row+dot HIGHEST", partial(im2row_dot, filt=filt, prec=H))


bf = [f.astype(jnp.bfloat16) for f in feats]
filtbf = filt.astype(jnp.bfloat16)


def conv_bf(feat, filt, prec):
    kern = jnp.transpose(filt, (1, 2, 3, 0))
    return jax.lax.conv_general_dilated(
        feat, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec, preferred_element_type=jnp.float32)


feats_save = feats
feats = bf
bench("conv bf16-in f32-acc", partial(conv_bf, filt=filtbf, prec=D))
feats = feats_save

# accuracy check: HIGH and im2row vs HIGHEST
o_high = [jax.jit(partial(conv, filt=filt, prec=HI))(f) for f in feats]
o_def = [jax.jit(partial(conv, filt=filt, prec=D))(f) for f in feats]
for name, outs in [("HIGH", o_high), ("DEFAULT", o_def)]:
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(outs, ref))
    print(f"max|{name} - HIGHEST| = {err:.2e}")
