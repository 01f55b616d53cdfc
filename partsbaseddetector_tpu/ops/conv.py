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


def filter_responses_fft(features: jax.Array, filters: jax.Array) -> jax.Array:
    """Same contract via the frequency domain (correlation theorem).

    Circular cross-correlation out = irfft2(rfft2(feat) * conj(rfft2(filt)))
    is exact on the first (H-fh+1, W-fw+1) rows/cols, which is all the
    valid grid needs — no extra padding required. Channel spectra are
    summed before the single inverse transform per (scale, filter), as
    the reference engine intends (src/FourierConvolutionEngine.cpp:57-80).
    """
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    assert c == fc
    dtype = features.dtype
    feat_f = jnp.fft.rfft2(jnp.transpose(features, (0, 3, 1, 2)), s=(h, w))
    filt_f = jnp.fft.rfft2(jnp.transpose(filters, (0, 3, 1, 2)), s=(h, w))
    # (S, 1, C, H, Wf) * (1, F, C, H, Wf) summed over C
    spec = jnp.einsum("schw,fchw->sfhw", feat_f, jnp.conj(filt_f))
    out = jnp.fft.irfft2(spec, s=(h, w)).astype(dtype)
    out = out[:, :, : h - fh + 1, : w - fw + 1]
    return jnp.transpose(out, (0, 2, 3, 1))
