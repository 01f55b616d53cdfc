"""Pyramid resampling as MXU matmuls.

The reference builds its image pyramid with two separable CPU passes of
cached interpolation weights (matlab/mex/resize.cc) and a 5-tap binomial
reduce (matlab/mex/reduce.cc); the C++ path uses cv::resize/pyrDown
(src/HOGFeatures.cpp:114-127). Both resamplers are *linear* maps, so the
TPU-native formulation precomputes the exact weight matrices on the host
once per (src_len, dst_len) pair and applies them as two dense matmuls —
which XLA places on the MXU and fuses with neighboring ops. No gathers,
no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.rounding import cround

from . import reference


@functools.lru_cache(maxsize=None)
def resize_matrix(src_len: int, dst_len: int, dtype=np.float32) -> np.ndarray:
    """Dense (dst_len, src_len) area-averaging resample matrix (exact
    resize.cc weights, computed in float64 then cast). Returns NumPy so
    the cache never captures jit tracers."""
    return np.asarray(
        reference.resize_weights(src_len, dst_len), dtype=np.dtype(dtype)
    )


@functools.lru_cache(maxsize=None)
def reduce_matrix(src_len: int, dtype=np.float32) -> np.ndarray:
    """Dense (round(src/2), src_len) binomial reduce matrix (exact
    reduce.cc boundary stencils). NumPy-valued for cache safety."""
    return np.asarray(reference.reduce_weights(src_len), dtype=np.dtype(dtype))


def _apply_separable(im: jax.Array, wh: jax.Array, ww: jax.Array) -> jax.Array:
    """(H, W, C) -> (dh, dw, C) via row matmul then column matmul.

    HIGHEST precision keeps fp32 resampling exact on the MXU (TPU
    matmuls otherwise run bf16 passes; parity target is 1e-5-level)."""
    h, w, c = im.shape
    hi = jax.lax.Precision.HIGHEST
    out = jnp.matmul(wh, im.reshape(h, w * c), precision=hi)
    out = out.reshape(-1, w, c)
    # contract width with ww^T: (dh, W, C) x (dw, W) -> (dh, dw, C)
    out = jnp.einsum("hwc,vw->hvc", out, ww, precision=hi)
    return out


def resize_image(im: jax.Array, scale: float) -> jax.Array:
    """Resize an (H, W, C) image by a static scale factor <= 1."""
    h, w = im.shape[:2]
    dh, dw = cround(h * scale), cround(w * scale)
    return _apply_separable(
        im, resize_matrix(h, dh, im.dtype), resize_matrix(w, dw, im.dtype)
    )


def reduce_image(im: jax.Array) -> jax.Array:
    """Half-size binomial reduce of an (H, W, C) image."""
    h, w = im.shape[:2]
    return _apply_separable(im, reduce_matrix(h, im.dtype), reduce_matrix(w, im.dtype))
