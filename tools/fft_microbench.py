"""Fourier-engine microbench: where do the FFT path's milliseconds go,
and can spectra caching / friendly sizes / MXU contraction close the
gap to the spatial engine?

Context (VERDICT r2 weak#1): BENCH_r02 config 3 measured the Fourier
engine at 0.43x the spatial engine (18.4 vs 43.1 img/s) with no
analysis. The reference's FourierConvolutionEngine exists because CPU
FFT beats CPU spatial conv for big filter banks
(src/FourierConvolutionEngine.cpp); on TPU the spatial path is an
implicit-GEMM MXU kernel, so the tradeoff must be re-measured, not
assumed.

Variants timed on the real person26-VGA bucket shapes:
  spatial   lax.conv (XLA) -- the differentiable training path
  pallas    implicit-GEMM kernel -- the serving path
  fft       current filter_responses_fft (exact sizes s=(H, W))
  fft_pad   FFT sizes padded up to small 2/3/5-smooth sizes
  fft_mm    spectra contraction as explicit (S*H*Wf, C) x (C, F)
            real matmuls (4 per complex product) -- MXU instead of
            elementwise einsum
Each also reports the per-stage split (rfft2 feats / contraction /
irfft2) so the ceiling is attributable.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.model import (
    make_person_like_model,
    pack_model,
)
from partsbaseddetector_tpu.ops.conv import (
    filter_responses,
    filter_responses_fft,
)
from partsbaseddetector_tpu.ops.conv_pallas import filter_responses_infer
from partsbaseddetector_tpu.ops.pyramid import build_pyramid_features
from partsbaseddetector_tpu.pipeline import make_plan

IMSIZE = (480, 640)


def smooth235(n):
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += 1


def fft_padded(features, filters):
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    hp, wp = smooth235(h), smooth235(w)
    feat_f = jnp.fft.rfft2(jnp.transpose(features, (0, 3, 1, 2)), s=(hp, wp))
    filt_f = jnp.fft.rfft2(jnp.transpose(filters, (0, 3, 1, 2)), s=(hp, wp))
    spec = jnp.einsum("schw,fchw->sfhw", feat_f, jnp.conj(filt_f))
    out = jnp.fft.irfft2(spec, s=(hp, wp)).astype(features.dtype)
    out = out[:, :, : h - fh + 1, : w - fw + 1]
    return jnp.transpose(out, (0, 2, 3, 1))


def fft_matmul(features, filters):
    """Contraction over channels as real matmuls on the MXU."""
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    feat_f = jnp.fft.rfft2(jnp.transpose(features, (0, 3, 1, 2)), s=(h, w))
    filt_f = jnp.conj(
        jnp.fft.rfft2(jnp.transpose(filters, (0, 3, 1, 2)), s=(h, w))
    )
    # (S, C, H, Wf) -> (S, H, Wf, C); (F, C, H, Wf) -> (H, Wf, C, F)
    a = jnp.transpose(feat_f, (0, 2, 3, 1))
    b = jnp.transpose(filt_f, (2, 3, 1, 0))
    mm = lambda x, y: jnp.einsum(
        "shwc,hwcf->shwf", x, y, precision=jax.lax.Precision.HIGHEST
    )
    re = mm(a.real, b.real) - mm(a.imag, b.imag)
    im_ = mm(a.real, b.imag) + mm(a.imag, b.real)
    spec = jnp.transpose(re + 1j * im_, (0, 3, 1, 2))
    out = jnp.fft.irfft2(spec, s=(h, w)).astype(features.dtype)
    out = out[:, :, : h - fh + 1, : w - fw + 1]
    return jnp.transpose(out, (0, 2, 3, 1))


def time_jit(fn, *args, iters=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters, out


def main():
    person = make_person_like_model()
    packed = pack_model(person)
    plan = make_plan(packed, IMSIZE, 2)
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.rand(*IMSIZE, 3).astype(np.float32) * 255)
    feats = jax.jit(lambda x: build_pyramid_features(x, plan, packed.spec))(im)
    feats = [jax.block_until_ready(f) for f in feats]
    filters = jnp.asarray(packed.filters, jnp.float32)
    print(
        "bucket feat shapes:",
        [tuple(f.shape) for f in feats],
        "filters:",
        tuple(filters.shape),
    )

    variants = [
        ("spatial(xla)", filter_responses),
        ("pallas", filter_responses_infer),
        ("fft(exact)", filter_responses_fft),
        ("fft(padded)", fft_padded),
        ("fft(matmul)", fft_matmul),
    ]
    ref_out = None
    for name, fn in variants:
        total = 0.0
        outs = []
        for b, feat in enumerate(feats):
            sec, out = time_jit(fn, feat, filters)
            total += sec
            outs.append(np.asarray(out))
        if ref_out is None:
            ref_out = outs
            err = 0.0
        else:
            err = max(
                float(np.nanmax(np.abs(o - r)))
                for o, r in zip(outs, ref_out)
            )
        print(f"{name:14s} {total * 1e3:7.2f} ms  max|err|={err:.2e}")

    # stage split for the exact-size FFT on bucket 0
    feat = feats[0]
    s, h, w, c = feat.shape
    tf = jnp.transpose(feat, (0, 3, 1, 2))
    sec_f, feat_f = time_jit(lambda x: jnp.fft.rfft2(x, s=(h, w)), tf)
    filt_f = jnp.conj(
        jnp.fft.rfft2(jnp.transpose(filters, (0, 3, 1, 2)), s=(h, w))
    )
    sec_e, spec = time_jit(
        lambda a, b: jnp.einsum("schw,fchw->sfhw", a, b), feat_f, filt_f
    )
    sec_i, _ = time_jit(lambda x: jnp.fft.irfft2(x, s=(h, w)), spec)
    print(
        f"bucket0 split: rfft2(feats)={sec_f * 1e3:.2f} ms  "
        f"einsum={sec_e * 1e3:.2f} ms  irfft2={sec_i * 1e3:.2f} ms  "
        f"(irfft2 is over S*F={spec.shape[0] * spec.shape[1]} maps)"
    )


if __name__ == "__main__":
    main()
