"""Real-matmul DFT: rfft2/irfft2 as per-axis MXU contractions.

Why this exists: the Fourier conv engine (ops/conv.py, implementing the
intended behavior of the reference's FourierConvolutionEngine,
src/FourierConvolutionEngine.cpp:57-80) needs 2-D real FFTs of shape
(batch, h, w) with batch = scales*channels (~160) or scales*filters
(~520). XLA:TPU lowers jnp.fft to an FFT custom call that, on the
tunneled axon backend, fails with `UNIMPLEMENTED: TPU backend error`
once the transform batch grows past a small count (measured: batch 8 at
130x170 executes, batch 160 does not — round-4 bench config 3 errored
on exactly this). Feature-pyramid transform sizes are small (h, w <=
~170 at VGA), so an explicit DFT — one (axis_len x axis_len) matrix
contraction per axis, in real arithmetic — is cheap, lands on the MXU,
and has no backend-support surface at all. This is the "DFT as matmul"
formulation: O(n^2) per axis instead of O(n log n), which at n <= 170
costs a few GFLOP per image — noise against the engine's HBM-bound
spectra materialization (tools/fft_microbench.py).

Everything stays in split re/im float32 arrays (no complex dtype on
device): the channel contraction in filter_responses_fft already wants
split real matmuls for MXU precision control, and some backends handle
complex layouts poorly.

Conventions match numpy: forward kernel e^{-2*pi*i*j*k/n}; inverse
normalizes by 1/n and folds the hermitian symmetry of the real
transform into per-frequency weights c_k (1 for k=0 and the Nyquist
bin when n is even, else 2). Validated bit-close against
numpy.fft.rfft2/irfft2 in tests/test_dft.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGH = jax.lax.Precision.HIGHEST


class DFTBases(NamedTuple):
    """Per-(h, w) constant DFT matrices (float32 numpy; baked as program
    constants — a 170x170 matrix is ~115 KB, negligible)."""

    fwd_w_c: np.ndarray  # (w, wf)  cos(2*pi*j*k/w)
    fwd_w_s: np.ndarray  # (w, wf)  sin(2*pi*j*k/w)
    fwd_h_c: np.ndarray  # (h, h)   cos(2*pi*j*m/h)
    fwd_h_s: np.ndarray  # (h, h)   sin(2*pi*j*m/h)
    inv_h_c: np.ndarray  # (h, h)   cos(2*pi*m*j/h)/h
    inv_h_s: np.ndarray  # (h, h)   sin(2*pi*m*j/h)/h
    inv_w_c: np.ndarray  # (wf, w)  c_k*cos(2*pi*k*n/w)/w
    inv_w_s: np.ndarray  # (wf, w)  c_k*sin(2*pi*k*n/w)/w


_BASES_CACHE: dict = {}


def dft_bases(h: int, w: int) -> DFTBases:
    """Build (and memoize) the DFT matrices for an (h, w) transform.

    Computed in float64, rounded once to float32 — each matrix entry is
    the best f32 representation of the true twiddle."""
    key = (int(h), int(w))
    hit = _BASES_CACHE.get(key)
    if hit is not None:
        return hit
    wf = w // 2 + 1
    j_w = np.arange(w)[:, None]
    k_w = np.arange(wf)[None, :]
    ang_w = 2.0 * np.pi * (j_w * k_w) / w
    j_h = np.arange(h)[:, None]
    m_h = np.arange(h)[None, :]
    ang_h = 2.0 * np.pi * (j_h * m_h) / h
    # hermitian fold weights for the real inverse along w
    c_k = np.full(wf, 2.0)
    c_k[0] = 1.0
    if w % 2 == 0:
        c_k[-1] = 1.0
    n_w = np.arange(w)[None, :]
    k_wi = np.arange(wf)[:, None]
    ang_wi = 2.0 * np.pi * (k_wi * n_w) / w
    b = DFTBases(
        fwd_w_c=np.cos(ang_w).astype(np.float32),
        fwd_w_s=np.sin(ang_w).astype(np.float32),
        fwd_h_c=np.cos(ang_h).astype(np.float32),
        fwd_h_s=np.sin(ang_h).astype(np.float32),
        inv_h_c=(np.cos(ang_h) / h).astype(np.float32),
        inv_h_s=(np.sin(ang_h) / h).astype(np.float32),
        inv_w_c=(c_k[:, None] * np.cos(ang_wi) / w).astype(np.float32),
        inv_w_s=(c_k[:, None] * np.sin(ang_wi) / w).astype(np.float32),
    )
    _BASES_CACHE[key] = b
    return b


def rfft2_matmul(
    x: jax.Array, b: DFTBases
) -> Tuple[jax.Array, jax.Array]:
    """Forward 2-D real DFT of x (..., h, w) -> (re, im) of shape
    (..., h, wf), numerically equal to numpy.fft.rfft2(x).

    Two real contractions along w (e^{-i*ang} = cos - i*sin), then one
    complex contraction along h expanded into four real matmuls."""
    x = x.astype(jnp.float32)
    # along w: z = x @ (cos - i sin)
    zr = jnp.einsum("...hw,wk->...hk", x, b.fwd_w_c, precision=_HIGH)
    zi = -jnp.einsum("...hw,wk->...hk", x, b.fwd_w_s, precision=_HIGH)
    # along h: (cos - i sin) * (zr + i zi), contracting the h index
    e = lambda z, m: jnp.einsum("...hk,hm->...mk", z, m, precision=_HIGH)
    out_r = e(zr, b.fwd_h_c) + e(zi, b.fwd_h_s)
    out_i = e(zi, b.fwd_h_c) - e(zr, b.fwd_h_s)
    return out_r, out_i


def irfft2_matmul(
    zr: jax.Array, zi: jax.Array, b: DFTBases
) -> jax.Array:
    """Inverse of rfft2_matmul: (re, im) of (..., h, wf) -> real
    (..., h, w), numerically equal to numpy.fft.irfft2(z, s=(h, w)).

    Complex inverse along h (e^{+i*ang}/h), then the hermitian-folded
    real inverse along w."""
    e = lambda z, m: jnp.einsum("...mk,mh->...hk", z, m, precision=_HIGH)
    # along h: (cos + i sin)/h * (zr + i zi)
    yr = e(zr, b.inv_h_c) - e(zi, b.inv_h_s)
    yi = e(zi, b.inv_h_c) + e(zr, b.inv_h_s)
    # along w: out[n] = sum_k c_k/w * (yr cos - yi sin)
    out = jnp.einsum(
        "...hk,kn->...hn", yr, b.inv_w_c, precision=_HIGH
    ) - jnp.einsum("...hk,kn->...hn", yi, b.inv_w_s, precision=_HIGH)
    return out
