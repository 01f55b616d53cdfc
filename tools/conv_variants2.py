"""Trace-timed conv reformulations on the big bucket shape.

A plain (M=98820, K=800, N=104) HIGHEST dot runs at ~25 TFLOP/s on this
chip while lax.conv achieves ~5.4 — these variants probe how much of the
gap explicit GEMM formulations recover and where layout relayouts eat it.
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from partsbaseddetector_tpu.utils.profiling import device_op_breakdown

S, C, F, FH, FW = 5, 32, 104, 5, 5
H, W = 126, 166
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(S, H, W, C).astype(np.float32))
filt = jnp.asarray(rng.randn(F, FH, FW, C).astype(np.float32))
OH, OW = H - FH + 1, W - FW + 1
FLOPS = 2 * S * OH * OW * FH * FW * C * F
P = jax.lax.Precision.HIGHEST

def conv_ref(feat, filt):
    kern = jnp.transpose(filt, (1, 2, 3, 0))
    return jax.lax.conv_general_dilated(
        feat, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=P, preferred_element_type=feat.dtype)

def conv_rowpatch(feat, filt):
    # patches along W only: K = FW*C = 160, accumulate over FH rows
    k2 = jnp.transpose(filt, (1, 2, 3, 0)).reshape(FH, FW * C, F)
    out = None
    for i in range(FH):
        cols = [feat[:, i:i + OH, j:j + OW, :] for j in range(FW)]
        patch = jnp.concatenate(cols, axis=-1)  # (S, OH, OW, 160)
        t = jnp.einsum("shwk,kf->shwf", patch, k2[i], precision=P)
        out = t if out is None else out + t
    return out

def conv_25dots(feat, filt):
    k2 = jnp.transpose(filt, (1, 2, 3, 0))  # (FH, FW, C, F)
    out = None
    for i in range(FH):
        for j in range(FW):
            t = jnp.einsum("shwc,cf->shwf", feat[:, i:i+OH, j:j+OW, :],
                           k2[i, j], precision=P)
            out = t if out is None else out + t
    return out

def conv_nchw(feat, filt):
    f2 = jnp.transpose(feat, (0, 3, 1, 2))
    kern = jnp.transpose(filt, (0, 3, 1, 2))  # OIHW
    o = jax.lax.conv_general_dilated(
        f2, kern, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=P, preferred_element_type=feat.dtype)
    return jnp.transpose(o, (0, 2, 3, 1))

ref = None
for name, fn in [("lax.conv NHWC", conv_ref), ("rowpatch K=160", conv_rowpatch),
                 ("25 dots K=32", conv_25dots), ("lax.conv NCHW", conv_nchw)]:
    f = jax.jit(fn)
    o = np.asarray(f(feat, filt))
    if ref is None:
        ref = o
    else:
        err = np.max(np.abs(o - ref))
        assert err < 2e-3, (name, err)
    d = device_op_breakdown(f, feat, filt, iters=20)
    ms = d.get("program_total", 0)
    print(f"{name:18s} {ms:7.3f} ms  {FLOPS/ms*1e3/1e12:5.1f} TFLOP/s")
