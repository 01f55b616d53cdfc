"""Part-filter response maps as one batched MXU convolution.

The reference computes per-(filter, channel) 2-D correlations with a
vendored cv::FilterEngine under OpenMP (src/SpatialConvolutionEngine.cpp)
or per-filter pthreads/BLAS MEX kernels (matlab/mex/fconv*.cc). On TPU
all filters, mixtures and scales collapse into a single
`lax.conv_general_dilated` call: features are NHWC with the scale-bucket
as the batch dimension, the whole filter bank is one HWIO tensor.

Filters of different spatial sizes are zero-padded to a common (fh, fw):
zero taps contribute nothing, so the *valid* correlation of a padded
filter equals the true response on the shared top-left-anchored output
grid — responses of all filters land on one aligned grid with no
per-filter offsets. Rows/columns beyond a filter's true valid extent are
masked to -inf downstream (they would otherwise read alignment padding).

An FFT engine provides the FourierConvolutionEngine capability
(src/FourierConvolutionEngine.cpp — implementing the *intended* behavior;
the shipped engine never stores its filter DFTs, see SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filter_responses(features: jax.Array, filters: jax.Array) -> jax.Array:
    """Valid multi-channel correlation of a filter bank.

    features: (S, H, W, C) scale-bucket batch.
    filters:  (F, fh, fw, C) zero-padded bank.
    Returns (S, H-fh+1, W-fw+1, F); out[s,y,x,f] = sum feat[s,y+i,x+j,c]*filt[f,i,j,c].
    """
    kern = jnp.transpose(filters, (1, 2, 3, 0))  # HWIO
    return jax.lax.conv_general_dilated(
        features,
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=features.dtype,
    )


# spectra memo: keyed on (id(filters), h, w). The cached value holds a
# reference to the filters array itself, so its id() can never be
# recycled while the entry lives — the cache is correct, not just
# probabilistic. Bounded: one model's filter bank spans a handful of
# (h, w) bucket shapes per image size.
_SPECTRA_CACHE: dict = {}


def fft_filter_spectra(
    filters: "np.ndarray", h: int, w: int
) -> "np.ndarray":
    """Host-side conjugate filter spectra for an (h, w) transform size —
    the cached `setFilters` state the reference's FourierConvolutionEngine
    *intends* to keep (src/FourierConvolutionEngine.cpp:118-139 computes
    per-channel DFTs into a local and drops them; we keep them). Computed
    in float64 and rounded once to float32, so the value is the best f32
    representation of the true spectrum.

    Memoized per (filters identity, h, w): retracing the serving program
    (new image shape, new engine, vmap batch) reuses the spectra instead
    of paying the O(F*C*HW log HW) host FFT on every trace.

    filters: (F, fh, fw, C) host array. Returns (2, h, wf, C, F) float32
    — stacked [real, imag] of the conjugate spectra, transposed for the
    MXU channel contraction in filter_responses_fft. Split re/im (no
    complex dtype) so the device arrays stay plain f32: the contraction
    wants four real matmuls anyway, and complex layouts are a backend
    support surface this engine no longer depends on.
    """
    import numpy as np

    key = (id(filters), int(h), int(w))
    hit = _SPECTRA_CACHE.get(key)
    if hit is not None:
        return hit[1]

    filt_f = np.conj(
        np.fft.rfft2(
            np.transpose(filters.astype(np.float64), (0, 3, 1, 2)),
            s=(h, w),
        )
    )  # (F, C, h, wf)
    bt = np.transpose(filt_f, (2, 3, 1, 0))  # (h, wf, C, F)
    out = np.stack([bt.real, bt.imag]).astype(np.float32)
    _SPECTRA_CACHE[key] = (filters, out)
    return out


def _fft_impl() -> str:
    """'native' (jnp.fft, used on CPU where XLA's FFT is solid) or
    'matmul' (per-axis DFT contractions, ops/dft.py — the default on
    accelerator backends: the axon TPU backend's FFT custom call fails
    UNIMPLEMENTED above a small transform batch, and at feature-pyramid
    sizes the explicit DFT is MXU work with no support surface).
    Override with PBD_FFT_IMPL=native|matmul."""
    import os

    impl = os.environ.get("PBD_FFT_IMPL", "auto")
    if impl in ("native", "matmul"):
        return impl
    return "native" if jax.default_backend() == "cpu" else "matmul"


def filter_responses_fft(
    features: jax.Array,
    filters: jax.Array,
    spectra: "np.ndarray | jax.Array | None" = None,
) -> jax.Array:
    """Same contract via the frequency domain (correlation theorem).

    Circular cross-correlation out = irfft2(rfft2(feat) * conj(rfft2(filt)))
    is exact on the first (H-fh+1, W-fw+1) rows/cols, which is all the
    valid grid needs — no extra padding required. Channel spectra are
    summed before the single inverse transform per (scale, filter), as
    the reference engine intends (src/FourierConvolutionEngine.cpp:57-80).

    The channel contraction runs as four real (S*H*Wf, C) x (C, F)
    matmuls at HIGHEST precision — MXU work instead of a complex
    elementwise einsum (which XLA evaluates at default precision: bf16
    passes, measured 9.7e-3 max response error vs 4.7e-6 for the matmul
    form; tools/fft_microbench.py). spectra (optional) is the cached
    conjugate filter spectrum stack from fft_filter_spectra — serving
    device-puts it once and threads it as a runtime arg.

    Transforms themselves dispatch on the backend (_fft_impl): native
    jnp.fft on CPU, per-axis DFT matmuls (ops/dft.py) elsewhere.
    """
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    assert c == fc
    dtype = features.dtype
    if _fft_impl() == "matmul":
        return _filter_responses_dft(
            features, filters, spectra, (s, h, w, c, f, fh, fw)
        )
    mm = lambda x, y: jnp.einsum(
        "shwc,hwcf->shwf", x, y, precision=jax.lax.Precision.HIGHEST
    )
    feat_f = jnp.fft.rfft2(jnp.transpose(features, (0, 3, 1, 2)), s=(h, w))
    if spectra is None:
        filt_f = jnp.conj(
            jnp.fft.rfft2(jnp.transpose(filters, (0, 3, 1, 2)), s=(h, w))
        )
        br = jnp.transpose(filt_f.real, (2, 3, 1, 0))  # (h, wf, C, F)
        bi = jnp.transpose(filt_f.imag, (2, 3, 1, 0))
    else:
        sp = jnp.asarray(spectra)
        br, bi = sp[0], sp[1]
    a = jnp.transpose(feat_f, (0, 2, 3, 1))  # (S, h, wf, C)
    re = mm(a.real, br) - mm(a.imag, bi)
    im = mm(a.real, bi) + mm(a.imag, br)
    spec = jnp.transpose(re + 1j * im, (0, 3, 1, 2))  # (S, F, h, wf)
    out = jnp.fft.irfft2(spec, s=(h, w)).astype(dtype)
    out = out[:, :, : h - fh + 1, : w - fw + 1]
    return jnp.transpose(out, (0, 2, 3, 1))


def _dft_precision():
    """Matmul precision for the DFT transforms. HIGHEST measured
    FASTER than HIGH on the v5e backend for these einsums (79 vs
    113 ms whole-program, tools A/B 2026-08-21: XLA's f32 path beats
    the 3-pass bf16 emulation at these skinny shapes) and is exact —
    so it is the default on both counts. Override with
    PBD_FFT_PRECISION=high|highest for probes."""
    import os

    name = os.environ.get("PBD_FFT_PRECISION", "highest").upper()
    return getattr(jax.lax.Precision, name)


def _filter_responses_dft(features, filters, spectra, dims):
    """DFT-as-matmul body: identical math, layout-specialized einsums
    (the transforms contract the h/w axes in place, so the NHWC feature
    stack never transposes). Differentiable (plain einsums), so the
    training path works unchanged when the fourier engine is selected
    on an accelerator backend. The inverse bases are sliced to the
    valid output extent (h-fh+1, w-fw+1) up front — downstream masks
    everything beyond it, so those rows/cols are never computed."""
    from .dft import dft_bases, rfft2_matmul

    s, h, w, c, f, fh, fw = dims
    dtype = features.dtype
    hp = _dft_precision()
    b = dft_bases(h, w)
    hv, wv = h - fh + 1, w - fw + 1
    x = features.astype(jnp.float32)
    # forward rfft2 along (h, w) of the (S, h, w, C) stack
    zr = jnp.einsum("shwc,wk->shkc", x, b.fwd_w_c, precision=hp)
    zi = -jnp.einsum("shwc,wk->shkc", x, b.fwd_w_s, precision=hp)
    eh = lambda z, m: jnp.einsum("shkc,hm->smkc", z, m, precision=hp)
    ar = eh(zr, b.fwd_h_c) + eh(zi, b.fwd_h_s)
    ai = eh(zi, b.fwd_h_c) - eh(zr, b.fwd_h_s)
    if spectra is None:
        # traced filters (training): same matmul transform, then conj
        fp = jnp.pad(
            filters.astype(jnp.float32),
            ((0, 0), (0, h - fh), (0, w - fw), (0, 0)),
        )
        fzr, fzi = rfft2_matmul(
            jnp.transpose(fp, (0, 3, 1, 2)), b
        )  # (F, C, h, wf)
        br = jnp.transpose(fzr, (2, 3, 1, 0))  # (h, wf, C, F)
        bi = -jnp.transpose(fzi, (2, 3, 1, 0))
    else:
        sp = jnp.asarray(spectra)
        br, bi = sp[0], sp[1]
    # channel contraction at the same precision as the transforms
    mm = lambda x, y: jnp.einsum("shwc,hwcf->shwf", x, y, precision=hp)
    re = mm(ar, br) - mm(ai, bi)  # (S, h, wf, F)
    im = mm(ar, bi) + mm(ai, br)
    # inverse: complex ifft along h, hermitian-folded real inverse along
    # w — both restricted to the valid grid
    ihc, ihs = b.inv_h_c[:, :hv], b.inv_h_s[:, :hv]
    iwc, iws = b.inv_w_c[:, :wv], b.inv_w_s[:, :wv]
    ei = lambda z, m: jnp.einsum("smkf,mh->shkf", z, m, precision=hp)
    yr = ei(re, ihc) - ei(im, ihs)
    yi = ei(im, ihc) + ei(re, ihs)
    out = jnp.einsum(
        "shkf,kn->shnf", yr, iwc, precision=hp
    ) - jnp.einsum("shkf,kn->shnf", yi, iws, precision=hp)
    return out.astype(dtype)
