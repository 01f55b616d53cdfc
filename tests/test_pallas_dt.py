"""Pallas DT kernel vs the envelope reference (interpret mode on CPU)."""

import numpy as np
import pytest

from partsbaseddetector_tpu.ops import reference
from partsbaseddetector_tpu.ops.pallas_dt import dt1d_pallas


@pytest.mark.parametrize("n,dlen,step,shift", [
    (50, 50, 1, 0),
    (130, 130, 1, -3),
    (166, 166, 1, 5),
    (40, 20, 2, 1),
])
def test_pallas_dt_matches_envelope(n, dlen, step, shift):
    rng = np.random.RandomState(0)
    bsz = 5
    src = rng.randn(bsz, n).astype(np.float32) * 2
    a = -(0.01 + 0.04 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    shifts = np.full(bsz, shift, dtype=np.float32)
    out, ptr = dt1d_pallas(src, a, b, shifts, dlen, step, interpret=True)
    out, ptr = np.asarray(out), np.asarray(ptr)
    for i in range(bsz):
        want_v, want_p = reference.dt1d_envelope(
            src[i].astype(np.float64), float(a[i]), float(b[i]), shift, dlen, step
        )
        np.testing.assert_allclose(out[i], want_v, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(ptr[i], want_p)


def test_pallas_dt_neg_inf_padding():
    src = np.full((2, 30), -np.inf, dtype=np.float32)
    src[:, 7] = 3.0
    a = np.full(2, -0.02, np.float32)
    b = np.zeros(2, np.float32)
    out, ptr = dt1d_pallas(src, a, b, np.zeros(2, np.float32), 30, 1, interpret=True)
    assert np.all(np.asarray(ptr) == 7)
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_dt_batch_shapes():
    rng = np.random.RandomState(1)
    src = rng.randn(2, 3, 17).astype(np.float32)
    a = np.full((2, 3), -0.05, np.float32)
    b = np.zeros((2, 3), np.float32)
    s = np.zeros((2, 3), np.float32)
    out, ptr = dt1d_pallas(src, a, b, s, 17, 1, interpret=True)
    assert out.shape == (2, 3, 17) and ptr.shape == (2, 3, 17)
    want, wptr = reference.dt1d_envelope(
        src[1, 2].astype(np.float64), -0.05, 0.0, 0, 17, 1
    )
    np.testing.assert_allclose(np.asarray(out[1, 2]), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ptr[1, 2]), wptr)


def test_pallas_dt_aux_packing():
    """x-pass aux carry must equal the gather composition."""
    rng = np.random.RandomState(5)
    src = rng.randn(4, 40).astype(np.float32)
    aux = rng.randint(0, 4000, (4, 40)).astype(np.int32)
    a = np.full(4, -0.03, np.float32)
    b = np.full(4, 0.01, np.float32)
    s = np.zeros(4, np.float32)
    out, ptr = dt1d_pallas(src, a, b, s, 40, 1, interpret=True, aux=aux)
    out2, ix = dt1d_pallas(src, a, b, s, 40, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)
    ix = np.asarray(ix)
    want = (np.take_along_axis(aux, ix, axis=1) << 12) | ix
    np.testing.assert_array_equal(np.asarray(ptr), want)


def test_pallas_dt_custom_vjp_matches_xla_grads():
    """The Pallas kernel's custom VJP must match the XLA max-subgradient
    for src, a and b."""
    import jax
    import jax.numpy as jnp

    from partsbaseddetector_tpu.ops import distance_transform as dtm

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(3, 20).astype(np.float32))
    a = jnp.asarray(np.full(3, -0.05, np.float32))
    b = jnp.asarray(np.full(3, 0.02, np.float32))
    shift = jnp.zeros(3, jnp.float32)

    def loss_pallas(src, a, b):
        out, _ = dt1d_pallas(
            src, a, b, shift, 20, 1, interpret=True, differentiable=True
        )
        return jnp.sum(out * jnp.arange(20.0))

    def loss_xla(src, a, b):
        out, _ = dtm._dt1d(src, a, b, shift, 20, 1, use_pallas=False)
        return jnp.sum(out * jnp.arange(20.0))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(src, a, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(src, a, b)
    for p_, x_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p_), np.asarray(x_), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dlen,n", [(128, 100), (80, 150), (200, 200)])
def test_window_kernel_per_row_shifts(dlen, n, monkeypatch):
    monkeypatch.setenv("PBD_DT_WINDOW", "1")
    """Adaptive-window path (pack=1, step=1): per-row shifts, -inf
    bucket padding, exact value+pointer parity vs the envelope scan."""
    rng = np.random.RandomState(3)
    bsz = 7
    src = (rng.randn(bsz, n) * 2).astype(np.float32)
    # simulate bucket padding: some rows valid only to a prefix
    vw = np.array([n, n, 60, 60, 25, n, 5])
    for i in range(bsz):
        src[i, vw[i]:] = -np.inf
    a = -(0.01 + 0.04 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    shifts = rng.randint(-6, 7, size=bsz).astype(np.float32)
    out, ptr = dt1d_pallas(src, a, b, shifts, dlen, 1, interpret=True)
    out, ptr = np.asarray(out), np.asarray(ptr)
    for i in range(bsz):
        want_v, want_p = reference.dt1d_envelope(
            src[i].astype(np.float64), float(a[i]), float(b[i]),
            int(shifts[i]), dlen, 1
        )
        finite = np.isfinite(want_v)
        np.testing.assert_allclose(
            out[i][finite], want_v[finite], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(ptr[i][finite], want_p[finite])


def test_window_kernel_out_valid_masks_dont_care_lanes(monkeypatch):
    monkeypatch.setenv("PBD_DT_WINDOW", "1")
    rng = np.random.RandomState(4)
    bsz, n, dlen = 4, 120, 120
    src = (rng.randn(bsz, n) * 2).astype(np.float32)
    a = np.full(bsz, -0.02, np.float32)
    b = np.zeros(bsz, np.float32)
    sh = np.zeros(bsz, np.float32)
    ov = np.array([120, 80, 40, 0], np.int32)
    out, ptr = dt1d_pallas(
        src, a, b, sh, dlen, 1, interpret=True, out_valid=ov
    )
    full_out, full_ptr = dt1d_pallas(src, a, b, sh, dlen, 1, interpret=True)
    out, ptr = np.asarray(out), np.asarray(ptr)
    for i in range(bsz):
        k = ov[i]
        np.testing.assert_array_equal(out[i, :k], np.asarray(full_out)[i, :k])
        np.testing.assert_array_equal(ptr[i, :k], np.asarray(full_ptr)[i, :k])
        assert np.all(out[i, k:] < -1e37) and np.all(ptr[i, k:] == 0)


def test_window_kernel_aux_packing(monkeypatch):
    monkeypatch.setenv("PBD_DT_WINDOW", "1")
    rng = np.random.RandomState(5)
    bsz, n, dlen = 3, 90, 100
    src = (rng.randn(bsz, n) * 2).astype(np.float32)
    aux = rng.randint(0, 4095, size=(bsz, n)).astype(np.int32)
    a = -(0.01 + 0.03 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    sh = np.full(bsz, -2.0, np.float32)
    import jax.numpy as jnp

    out, ptr = dt1d_pallas(
        src, a, b, sh, dlen, 1, interpret=True, aux=jnp.asarray(aux)
    )
    out, ptr = np.asarray(out), np.asarray(ptr)
    for i in range(bsz):
        want_v, want_p = reference.dt1d_envelope(
            src[i].astype(np.float64), float(a[i]), float(b[i]), -2, dlen, 1
        )
        np.testing.assert_allclose(out[i], want_v, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(ptr[i] & 0xFFF, want_p)
        np.testing.assert_array_equal(ptr[i] >> 12, aux[i][want_p])


@pytest.mark.parametrize("h,w,dlen,step,shift", [
    (50, 70, 50, 1, 0),
    (130, 96, 130, 1, -3),
    (23, 160, 40, 1, 5),
    (40, 64, 20, 2, 1),
    (7, 100, 12, 1, 0),
])
def test_sublane_dt_matches_envelope(h, w, dlen, step, shift):
    """Sublane-scan y-pass kernel: exact value+pointer parity with the
    envelope reference along axis -2."""
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(0)
    bsz = 3
    src = (rng.randn(bsz, h, w) * 2).astype(np.float32)
    a = -(0.01 + 0.04 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    shifts = np.full(bsz, shift, dtype=np.float32)
    out, ptr = dt1d_sublane(src, a, b, shifts, dlen, step, interpret=True)
    out, ptr = np.asarray(out), np.asarray(ptr)
    assert out.shape == (bsz, dlen, w) and ptr.shape == (bsz, dlen, w)
    for i in range(bsz):
        for x in range(w):
            want_v, want_p = reference.dt1d_envelope(
                src[i, :, x].astype(np.float64), float(a[i]), float(b[i]),
                shift, dlen, step
            )
            np.testing.assert_allclose(
                out[i, :, x], want_v, rtol=1e-4, atol=1e-4
            )
            np.testing.assert_array_equal(ptr[i, :, x], want_p)


def test_sublane_dt_neg_inf_and_nvalid():
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(2)
    bsz, h, w = 4, 60, 80
    src = (rng.randn(bsz, h, w) * 2).astype(np.float32)
    nv = np.array([60, 40, 17, 1], np.int32)
    for i in range(bsz):
        src[i, nv[i]:, :] = -np.inf
    a = np.full(bsz, -0.02, np.float32)
    b = np.full(bsz, 0.01, np.float32)
    sh = np.full(bsz, -2.0, np.float32)
    out, ptr = dt1d_sublane(
        src, a, b, sh, 60, 1, nvalid=nv, interpret=True
    )
    out, ptr = np.asarray(out), np.asarray(ptr)
    for i in range(bsz):
        for x in range(0, w, 7):
            want_v, want_p = reference.dt1d_envelope(
                src[i, :, x].astype(np.float64), float(a[i]), float(b[i]),
                -2, 60, 1
            )
            np.testing.assert_allclose(
                out[i, :, x], want_v, rtol=1e-4, atol=1e-4
            )
            np.testing.assert_array_equal(ptr[i, :, x], want_p)


def test_sublane_dt_batch_shapes():
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(3)
    src = rng.randn(2, 3, 19, 65).astype(np.float32)
    a = np.full((2, 3), -0.05, np.float32)
    b = np.zeros((2, 3), np.float32)
    s = np.zeros((2, 3), np.float32)
    out, ptr = dt1d_sublane(src, a, b, s, 19, 1, interpret=True)
    assert out.shape == (2, 3, 19, 65) and ptr.shape == (2, 3, 19, 65)
    want, wptr = reference.dt1d_envelope(
        src[1, 2, :, 33].astype(np.float64), -0.05, 0.0, 0, 19, 1
    )
    np.testing.assert_allclose(
        np.asarray(out[1, 2, :, 33]), want, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ptr[1, 2, :, 33]), wptr)


@pytest.mark.parametrize("n,dlen,shift", [(166, 166, 0), (140, 150, -4), (200, 190, 3)])
def test_dlen_past_lane_multiple_matches_envelope(n, dlen, shift):
    """dlen just past a 128 multiple (the 65%-lane-utilization shapes):
    values and pointers must match the envelope exactly, incl. aux
    composition and -inf padded rows."""
    rng = np.random.RandomState(7)
    bsz = 6
    src = (rng.randn(bsz, n) * 2).astype(np.float32)
    src[2, 100:] = -np.inf
    aux = rng.randint(0, 4000, (bsz, n)).astype(np.int32)
    a = -(0.01 + 0.04 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    sh = np.full(bsz, shift, np.float32)
    out, ptr = dt1d_pallas(src, a, b, sh, dlen, 1, interpret=True, aux=aux)
    out, ptr = np.asarray(out), np.asarray(ptr)
    assert out.shape == (bsz, dlen)
    for i in range(bsz):
        want_v, want_p = reference.dt1d_envelope(
            src[i].astype(np.float64), float(a[i]), float(b[i]), shift, dlen, 1
        )
        fin = np.isfinite(want_v)
        np.testing.assert_allclose(out[i][fin], want_v[fin], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(ptr[i][fin] & 0xFFF, want_p[fin])
        np.testing.assert_array_equal(
            (ptr[i] >> 12)[fin], aux[i][want_p[fin]]
        )


@pytest.mark.parametrize("h,w,dlen,step,shift,tie_stress", [
    pytest.param(70, 90, 70, 1, -2, False, marks=pytest.mark.slow),
    (166, 126, 166, 1, 0, False),
    (40, 64, 20, 2, 1, False),
    pytest.param(33, 50, 33, 1, 0, True, marks=pytest.mark.slow),
])
def test_sublane_dt_aux_matches_lane_kernel(h, w, dlen, step, shift,
                                            tie_stress):
    """Sublane aux carry (the transposed x-pass): packed (aux<<12)|v
    pointers and values must bit-match the lane-chunked kernel on the
    same data. tie_stress uses a == b == 0 (pure max) so nearly every
    output ties across many sources — exercising the smallest-v rule
    through the ILP-chain merges of both kernels."""
    import jax.numpy as jnp
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(7)
    bsz = 3
    if tie_stress:
        src = (rng.randint(-6, 6, (bsz, h, w)) / 4.0).astype(np.float32)
        a = np.zeros(bsz, np.float32)
        b = np.zeros(bsz, np.float32)
    else:
        # dyadic rationals (multiples of 1/64, |values| << 2^24/64) keep
        # every product/sum exactly representable, so both kernels are
        # bit-identical regardless of FMA-contraction choices — the
        # assert pins indexing/packing/tie semantics, not fp rounding
        # (value accuracy is covered by the envelope-reference tests)
        src = (rng.randint(-96, 96, (bsz, h, w)) / 64.0).astype(np.float32)
        a = (-(1 + rng.randint(0, 8, bsz)) / 64.0).astype(np.float32)
        b = (rng.randint(-4, 5, bsz) / 64.0).astype(np.float32)
    aux = rng.randint(0, 1500, (bsz, h, w)).astype(np.int32)
    sh = np.full(bsz, shift, np.float32)
    out_s, ptr_s = dt1d_sublane(
        jnp.asarray(src), a, b, sh, dlen, step,
        aux=jnp.asarray(aux), interpret=True,
    )
    # lane kernel scans the LAST axis: feed it the transposed maps with
    # per-row broadcast params, then transpose its outputs back
    a2 = np.broadcast_to(a[:, None], (bsz, w))
    b2 = np.broadcast_to(b[:, None], (bsz, w))
    sh2 = np.broadcast_to(sh[:, None], (bsz, w))
    out_l, ptr_l = dt1d_pallas(
        jnp.swapaxes(jnp.asarray(src), -1, -2), a2, b2, sh2, dlen, step,
        aux=jnp.swapaxes(jnp.asarray(aux), -1, -2), interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out_s), np.swapaxes(np.asarray(out_l), -1, -2)
    )
    np.testing.assert_array_equal(
        np.asarray(ptr_s), np.swapaxes(np.asarray(ptr_l), -1, -2)
    )


@pytest.mark.slow
def test_xpass_sublane_composition_exact(monkeypatch):
    """Full 2-D packed DT: the sublane x-pass must produce bit-identical
    messages and packed pointers to the lane-chunked x-pass, including
    -inf bucket padding and per-row valid extents."""
    import jax.numpy as jnp
    from partsbaseddetector_tpu.ops.distance_transform import (
        shift_distance_transform_2d_packed,
    )

    monkeypatch.setenv("PBD_DT_IMPL", "interpret")
    rng = np.random.RandomState(11)
    G, S, H, W = 2, 3, 40, 70
    # dyadic data (see test_sublane_dt_aux_matches_lane_kernel): exact
    # arithmetic makes the two x-pass backends bit-comparable
    score = (rng.randint(-96, 96, (G, S, H, W)) / 64.0).astype(np.float32)
    vh = np.array([[40, 28, 9]] * G, np.int32)
    vw = np.array([[70, 51, 16]] * G, np.int32)
    for g in range(G):
        for s in range(S):
            score[g, s, vh[g, s]:, :] = -np.inf
            score[g, s, :, vw[g, s]:] = -np.inf
    wdef = ((1 + rng.randint(0, 6, (G, S, 4))) / 64.0).astype(np.float32)
    sx = rng.randint(-3, 4, (G, S)).astype(np.float32)
    sy = rng.randint(-3, 4, (G, S)).astype(np.float32)

    def run():
        return shift_distance_transform_2d_packed(
            jnp.asarray(score), jnp.asarray(wdef), sx, sy,
            dlen_x=W, dlen_y=H, valid_h=vh, valid_w=vw,
        )

    monkeypatch.setenv("PBD_DT_XPASS", "chunked")
    m0, p0 = run()
    monkeypatch.setenv("PBD_DT_XPASS", "sublane")
    m1, p1 = run()
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


@pytest.mark.parametrize("h,w,dlen,step,shift,scale", [
    (166, 126, 166, 1, 0, 1.0),
    (100, 80, 100, 1, -3, 1.0),
    (64, 70, 30, 2, 5, 1.0),
    (90, 60, 90, 1, 0, 200.0),   # huge range -> window degenerates to full
    (90, 60, 90, 1, 0, 0.001),   # tiny range -> tightest window
    (13, 40, 13, 1, 2, 1.0),     # tail-only map (h < 16)
])
def test_sublane_window_bitexact_vs_full(h, w, dlen, step, shift, scale):
    """The displacement-window pruning must be invisible: bit-identical
    values AND pointers to the full scan, across ranges that make the
    window tight, loose, and degenerate, with dead lanes, dead maps and
    -inf row padding (nvalid) in the batch."""
    import jax.numpy as jnp
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(13)
    bsz = 5
    src = (rng.randn(bsz, h, w) * scale).astype(np.float32)
    nv = np.array([h, max(1, h // 2), max(1, h - 3), h, h], np.int32)
    for i in range(bsz):
        src[i, nv[i]:, :] = -np.inf
    src[1, :, w // 2:] = -np.inf  # dead lanes
    src[2, :, :] = -np.inf        # dead map
    aux = rng.randint(0, 2000, (bsz, h, w)).astype(np.int32)
    a = -(0.005 + 0.05 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)  # both signs of w1
    sh = np.full(bsz, shift, np.float32)
    outs = {}
    for win in (False, True):
        outs[win] = dt1d_sublane(
            jnp.asarray(src), a, b, sh, dlen, step, nvalid=nv,
            aux=jnp.asarray(aux), interpret=True, window=win,
        )
    np.testing.assert_array_equal(
        np.asarray(outs[False][0]), np.asarray(outs[True][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs[False][1]), np.asarray(outs[True][1])
    )


def test_sublane_window_pure_max_and_zero_w2():
    """w2 == 0 (no quadratic term) must disable the window (fall back to
    the full scan) — a linear or zero penalty has no finite exclusion
    radius."""
    import jax.numpy as jnp
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(3)
    src = rng.randn(3, 80, 40).astype(np.float32)
    a = np.array([0.0, 0.0, -0.02], np.float32)
    b = np.array([0.0, 0.05, -0.05], np.float32)
    sh = np.zeros(3, np.float32)
    o0 = dt1d_sublane(jnp.asarray(src), a, b, sh, 80, 1, interpret=True,
                      window=False)
    o1 = dt1d_sublane(jnp.asarray(src), a, b, sh, 80, 1, interpret=True,
                      window=True)
    np.testing.assert_array_equal(np.asarray(o0[0]), np.asarray(o1[0]))
    np.testing.assert_array_equal(np.asarray(o0[1]), np.asarray(o1[1]))


def test_sublane_window_under_vmap():
    """The fused batched detect vmaps the whole pipeline, which batches
    the per-image window-range operand. Regression for the Mosaic
    lowering rejection of batched 1-D SMEM scalars (they ride as
    (bsz, 1) blocks now): vmap results must bit-match the per-image
    calls, window on and off."""
    import jax
    import jax.numpy as jnp
    from partsbaseddetector_tpu.ops.pallas_dt import dt1d_sublane

    rng = np.random.RandomState(7)
    B, bsz, h, w = 3, 4, 20, 130
    # different per-image magnitudes -> genuinely different window
    # ranges per vmapped instance
    src = (rng.randn(B, bsz, h, w) *
           (1.0 + 3.0 * np.arange(B))[:, None, None, None]).astype(
               np.float32)
    nv = np.array([h, h - 5, h, max(1, h // 3)], np.int32)
    for i in range(bsz):
        src[:, i, nv[i]:, :] = -np.inf
    a = -(0.01 + 0.05 * rng.rand(bsz)).astype(np.float32)
    b = (0.02 * rng.randn(bsz)).astype(np.float32)
    sh = np.full(bsz, -2.0, np.float32)
    for win in (False, True):
        fn = lambda x: dt1d_sublane(
            x, a, b, sh, 24, 1, nvalid=nv, interpret=True, window=win
        )
        got_v, got_p = jax.vmap(fn)(jnp.asarray(src))
        for bi in range(B):
            want_v, want_p = fn(jnp.asarray(src[bi]))
            np.testing.assert_array_equal(
                np.asarray(got_v[bi]), np.asarray(want_v)
            )
            np.testing.assert_array_equal(
                np.asarray(got_p[bi]), np.asarray(want_p)
            )


def test_scale_packed_dt2d_bitexact(monkeypatch):
    """The scale-packed 2-D DT (scales of a bucket packed along lanes,
    ops/distance_transform.py::_scale_packed_dt2d) must be bit-identical
    to per-scale invocations of the SAME sublane composition — messages
    AND packed pointers — with per-scale valid extents (the nvalid_min
    witness-bound case), -inf padding, and anchor shifts of both signs.
    Bit-exactness holds by construction: the kernel scores every visited
    (q, v) candidate directly (no running recurrence) and the window
    bound only excludes strict losers, so packing can change which dead
    candidates are scanned but never the winner or its value. A second
    check pins pointers against the NumPy MATLAB-composition reference
    (shift_dt_2d) for semantic ground truth."""
    import jax.numpy as jnp
    import partsbaseddetector_tpu.ops.distance_transform as dt
    from partsbaseddetector_tpu.ops import reference

    monkeypatch.setenv("PBD_DT_IMPL", "interpret")
    monkeypatch.setenv("PBD_DT_PACK", "1")
    rng = np.random.RandomState(5)
    G, S, M, H, W = 1, 3, 2, 14, 11
    dlen_y, dlen_x = 12, 10
    score = (rng.randn(G, S, M, H, W) * 4).astype(np.float32)
    vh = np.zeros((G, S, M, W), np.int32)
    vw = np.zeros((G, S, M, dlen_y), np.int32)
    hws = np.zeros((G, S, M, 2), np.int32)
    for g in range(G):
        for s in range(S):
            for m in range(M):
                hh = rng.randint(6, H + 1)
                ww = rng.randint(5, W + 1)
                score[g, s, m, hh:, :] = -np.inf
                score[g, s, m, :, ww:] = -np.inf
                vh[g, s, m, :ww] = hh
                vw[g, s, m, : min(hh + 2, dlen_y)] = ww
                hws[g, s, m] = (hh, ww)
    wdef = (np.abs(rng.randn(G, 1, M, 4)) * 0.05 + 0.01).astype(
        np.float32
    )
    sx = rng.randint(-2, 3, (G, 1, M)).astype(np.float32)
    sy = rng.randint(-2, 3, (G, 1, M)).astype(np.float32)
    m1, p1 = dt.shift_distance_transform_2d_packed(
        jnp.asarray(score), jnp.asarray(wdef), jnp.asarray(sx),
        jnp.asarray(sy), dlen_x=dlen_x, dlen_y=dlen_y, step=1,
        valid_h=vh, valid_w=vw, pack_axis=1,
    )
    m1, p1 = np.asarray(m1), np.asarray(p1)

    # per-scale reference through the SAME kernel composition (S=1
    # packing is the identity layout): bit-exact, pointers included
    ax, bx = -wdef[..., 0], -wdef[..., 1]
    ay, by = -wdef[..., 2], -wdef[..., 3]
    for s in range(S):
        sl = np.s_[:, s : s + 1]
        m0, p0 = dt._scale_packed_dt2d(
            jnp.asarray(score[sl]), jnp.asarray(ax), jnp.asarray(bx),
            jnp.asarray(ay), jnp.asarray(by), jnp.asarray(sx),
            jnp.asarray(sy), dlen_x, dlen_y, 1,
            vh[sl], vw[sl], pack_axis=1,
        )
        np.testing.assert_array_equal(np.asarray(m0), m1[sl])
        np.testing.assert_array_equal(np.asarray(p0), p1[sl])

    # semantic ground truth: MATLAB-composition NumPy DT per map
    for g in range(G):
        for s in range(S):
            for m in range(M):
                hh, ww = hws[g, s, m]
                msg, ix, iy = reference.shift_dt_2d(
                    score[g, s, m, :hh, :ww].astype(np.float64),
                    wdef[g, 0, m], int(sx[g, 0, m]), int(sy[g, 0, m]),
                    dlen_x, dlen_y,
                )
                got_m = m1[g, s, m]
                got_p = p1[g, s, m]
                np.testing.assert_allclose(got_m, msg, rtol=2e-6, atol=2e-5)
                np.testing.assert_array_equal(got_p & 0xFFF, ix)
                np.testing.assert_array_equal(got_p >> 12, iy)
