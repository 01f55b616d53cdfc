"""Pallas implicit-GEMM conv kernel vs the XLA engine (interpret mode).

The kernel's semantics (patch layout, K-major weight order, lane-padding
discipline) are CPU-testable through the Pallas interpreter; the TPU
numbers live in tools/conv_pallas_proto.py and ROADMAP.md.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.ops.conv import filter_responses
from partsbaseddetector_tpu.ops.conv_pallas import (
    _choose_toh,
    filter_responses_infer,
    filter_responses_pallas,
    pallas_conv_eligible,
)


def _rand(rng, shape):
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "s,h,w,c,f,fh,fw",
    [
        (2, 18, 22, 32, 7, 5, 5),
        (1, 9, 31, 32, 3, 3, 4),   # non-square filter, W not lane-round
        pytest.param(
            3, 12, 12, 16, 130, 5, 5, marks=pytest.mark.slow
        ),  # F past one lane tile, C=16
        (1, 6, 6, 8, 1, 2, 2),     # minimal
        pytest.param(
            2, 40, 129, 32, 104, 5, 5, marks=pytest.mark.slow
        ),  # OW just past a lane boundary
    ],
)
def test_pallas_matches_xla(s, h, w, c, f, fh, fw):
    rng = np.random.RandomState(0)
    feat = jnp.asarray(_rand(rng, (s, h, w, c)))
    filt = jnp.asarray(_rand(rng, (f, fh, fw, c)) * 0.1)
    want = np.asarray(filter_responses(feat, filt))
    got = np.asarray(filter_responses_pallas(feat, filt, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_zero_padded_bank_rows():
    # zero-padded filter taps (the shared-bank alignment trick) must
    # contribute nothing, exactly as in the XLA engine
    rng = np.random.RandomState(1)
    feat = jnp.asarray(_rand(rng, (1, 10, 14, 32)))
    bank = np.zeros((2, 5, 5, 32), np.float32)
    bank[0, :3, :3] = _rand(rng, (3, 3, 32))
    bank[1] = _rand(rng, (5, 5, 32))
    bank = jnp.asarray(bank)
    want = np.asarray(filter_responses(feat, bank))
    got = np.asarray(filter_responses_pallas(feat, bank, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_under_vmap():
    # detect_batch_fn vmaps the whole pipeline over images; the kernel
    # must batch correctly through the pallas_call batching rule
    rng = np.random.RandomState(2)
    feat = jnp.asarray(_rand(rng, (3, 2, 9, 11, 32)))
    filt = jnp.asarray(_rand(rng, (4, 3, 3, 32)) * 0.1)
    got = np.asarray(
        jax.vmap(
            lambda x: filter_responses_pallas(x, filt, interpret=True)
        )(feat)
    )
    want = np.asarray(jax.vmap(lambda x: filter_responses(x, filt))(feat))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_eligibility_gates():
    rng = np.random.RandomState(3)
    ok_f = jnp.asarray(_rand(rng, (1, 10, 12, 32)))
    ok_w = jnp.asarray(_rand(rng, (2, 3, 3, 32)))
    assert pallas_conv_eligible(ok_f, ok_w)
    # channel misalignment
    assert not pallas_conv_eligible(
        jnp.asarray(_rand(rng, (1, 10, 12, 12))),
        jnp.asarray(_rand(rng, (2, 3, 3, 12))),
    )
    # non-f32
    assert not pallas_conv_eligible(ok_f.astype(jnp.bfloat16), ok_w)
    # filter larger than feature
    assert not pallas_conv_eligible(
        ok_f, jnp.asarray(_rand(rng, (2, 11, 3, 32)))
    )
    # VMEM blow-up falls back instead of erroring
    assert _choose_toh(4000, 4000, 32, 104, 5, 5, 3996) == 0


def test_infer_dispatch_xla_on_cpu(monkeypatch):
    # auto mode on the CPU backend must route to the XLA engine
    rng = np.random.RandomState(4)
    feat = jnp.asarray(_rand(rng, (1, 8, 9, 32)))
    filt = jnp.asarray(_rand(rng, (2, 3, 3, 32)))
    monkeypatch.delenv("PBD_CONV", raising=False)
    got = np.asarray(filter_responses_infer(feat, filt))
    want = np.asarray(filter_responses(feat, filt))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # and the interpret override exercises the kernel end-to-end
    monkeypatch.setenv("PBD_CONV", "interpret")
    got2 = np.asarray(filter_responses_infer(feat, filt))
    np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-5)
