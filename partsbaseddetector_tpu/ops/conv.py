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
    in float64 and rounded once to complex64, so the baked constant is
    the best c64 representation of the true spectrum.

    Memoized per (filters identity, h, w): retracing the serving program
    (new image shape, new engine, vmap batch) reuses the spectra instead
    of paying the O(F*C*HW log HW) host FFT on every trace.

    filters: (F, fh, fw, C) host array. Returns (h, wf, C, F) complex64,
    conjugated and transposed for the MXU contraction in
    filter_responses_fft.
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
    out = np.ascontiguousarray(
        np.transpose(filt_f, (2, 3, 1, 0))
    ).astype(np.complex64)
    _SPECTRA_CACHE[key] = (filters, out)
    return out


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
    conjugate filter spectrum from fft_filter_spectra — serving bakes it
    as a constant so no filter FFT runs per trace.
    """
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    assert c == fc
    dtype = features.dtype
    feat_f = jnp.fft.rfft2(jnp.transpose(features, (0, 3, 1, 2)), s=(h, w))
    if spectra is None:
        filt_f = jnp.conj(
            jnp.fft.rfft2(jnp.transpose(filters, (0, 3, 1, 2)), s=(h, w))
        )
        b = jnp.transpose(filt_f, (2, 3, 1, 0))  # (h, wf, C, F)
    else:
        b = jnp.asarray(spectra)
    a = jnp.transpose(feat_f, (0, 2, 3, 1))  # (S, h, wf, C)
    mm = lambda x, y: jnp.einsum(
        "shwc,hwcf->shwf", x, y, precision=jax.lax.Precision.HIGHEST
    )
    re = mm(a.real, b.real) - mm(a.imag, b.imag)
    im = mm(a.real, b.imag) + mm(a.imag, b.real)
    spec = jnp.transpose(re + 1j * im, (0, 3, 1, 2))  # (S, F, h, wf)
    out = jnp.fft.irfft2(spec, s=(h, w)).astype(dtype)
    out = out[:, :, : h - fh + 1, : w - fw + 1]
    return jnp.transpose(out, (0, 2, 3, 1))
