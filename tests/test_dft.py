"""DFT-as-matmul transforms (ops/dft.py) and the matmul Fourier engine.

The accelerator path of filter_responses_fft replaces jnp.fft with
per-axis DFT contractions (the axon TPU backend's FFT custom call is
batch-limited; ops/dft.py docstring). These tests pin the transforms
against numpy.fft and the engine against the spatial conv, on CPU where
both implementations run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.ops.conv import (
    fft_filter_spectra,
    filter_responses,
    filter_responses_fft,
)
from partsbaseddetector_tpu.ops.dft import (
    dft_bases,
    irfft2_matmul,
    rfft2_matmul,
)


@pytest.mark.parametrize("h,w", [(13, 17), (16, 16), (31, 24), (8, 9)])
def test_rfft2_matmul_matches_numpy(h, w):
    rng = np.random.RandomState(0)
    x = rng.randn(3, 5, h, w).astype(np.float32)
    b = dft_bases(h, w)
    zr, zi = jax.jit(lambda x: rfft2_matmul(x, b))(jnp.asarray(x))
    ref = np.fft.rfft2(x.astype(np.float64))
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(np.asarray(zr) - ref.real).max() / scale < 2e-6
    assert np.abs(np.asarray(zi) - ref.imag).max() / scale < 2e-6


@pytest.mark.parametrize("h,w", [(13, 17), (16, 16), (31, 24), (8, 9)])
def test_irfft2_matmul_matches_numpy(h, w):
    rng = np.random.RandomState(1)
    wf = w // 2 + 1
    z = (rng.randn(2, 4, h, wf) + 1j * rng.randn(2, 4, h, wf)).astype(
        np.complex64
    )
    b = dft_bases(h, w)
    out = jax.jit(
        lambda r, i: irfft2_matmul(r, i, b)
    )(jnp.asarray(z.real), jnp.asarray(z.imag))
    ref = np.fft.irfft2(z.astype(np.complex128), s=(h, w))
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(np.asarray(out) - ref).max() / scale < 2e-6


def test_roundtrip_identity():
    rng = np.random.RandomState(2)
    h, w = 21, 30
    x = rng.randn(6, h, w).astype(np.float32)
    b = dft_bases(h, w)
    zr, zi = rfft2_matmul(jnp.asarray(x), b)
    back = irfft2_matmul(zr, zi, b)
    assert np.abs(np.asarray(back) - x).max() < 1e-5


def _bank(rng, f, fh, fw, c):
    return rng.randn(f, fh, fw, c).astype(np.float32) * 0.1


def test_matmul_engine_matches_spatial(monkeypatch):
    monkeypatch.setenv("PBD_FFT_IMPL", "matmul")
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 20, 26, 8).astype(np.float32)
    bank = _bank(rng, 7, 5, 5, 8)
    ref = np.asarray(filter_responses(jnp.asarray(feat), jnp.asarray(bank)))
    out = np.asarray(
        jax.jit(filter_responses_fft)(jnp.asarray(feat), jnp.asarray(bank))
    )
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 5e-4


def test_matmul_engine_with_cached_spectra(monkeypatch):
    monkeypatch.setenv("PBD_FFT_IMPL", "matmul")
    rng = np.random.RandomState(4)
    h, w = 19, 23
    feat = rng.randn(3, h, w, 8).astype(np.float32)
    bank = _bank(rng, 6, 4, 5, 8)
    sp = fft_filter_spectra(bank, h, w)
    assert sp.shape == (2, h, w // 2 + 1, 8, 6)
    assert sp.dtype == np.float32
    ref = np.asarray(filter_responses(jnp.asarray(feat), jnp.asarray(bank)))
    out = np.asarray(
        jax.jit(filter_responses_fft)(
            jnp.asarray(feat), jnp.asarray(bank), jnp.asarray(sp)
        )
    )
    assert np.abs(out - ref).max() < 5e-4


def test_native_engine_with_cached_spectra(monkeypatch):
    monkeypatch.setenv("PBD_FFT_IMPL", "native")
    rng = np.random.RandomState(5)
    h, w = 19, 23
    feat = rng.randn(3, h, w, 8).astype(np.float32)
    bank = _bank(rng, 6, 4, 5, 8)
    sp = fft_filter_spectra(bank, h, w)
    ref = np.asarray(filter_responses(jnp.asarray(feat), jnp.asarray(bank)))
    out = np.asarray(
        jax.jit(filter_responses_fft)(
            jnp.asarray(feat), jnp.asarray(bank), jnp.asarray(sp)
        )
    )
    assert np.abs(out - ref).max() < 5e-4


def test_matmul_engine_differentiable(monkeypatch):
    """The training path (spectra=None, traced filters) must carry
    filter gradients through the matmul transforms."""
    monkeypatch.setenv("PBD_FFT_IMPL", "matmul")
    rng = np.random.RandomState(6)
    feat = jnp.asarray(rng.randn(1, 12, 14, 4).astype(np.float32))
    bank = jnp.asarray(_bank(rng, 3, 3, 3, 4))

    def loss(bk):
        return filter_responses_fft(feat, bk).sum()

    g = jax.grad(loss)(bank)
    # gradient of sum of valid correlation = sum of feature windows
    ref = jax.grad(lambda bk: filter_responses(feat, bk).sum())(bank)
    assert np.abs(np.asarray(g) - np.asarray(ref)).max() < 5e-4
