"""Pallas implicit-GEMM filter-bank correlation for TPU.

XLA:TPU's conv lowering runs the part-filter bank at ~7 TFLOP/s
(f32-HIGHEST) while a plain dot at the identical GEMM shape reaches
~25 TFLOP/s (tools/conv_variants2.py); every tested conv formulation
(NHWC/NCHW lax.conv, W-patch, per-tap dot accumulation) hits the same
lowering wall. This kernel captures the gap by building the im2row
patch matrix *inside* VMEM and issuing one big MXU dot per row block:

  - The feature map arrives pre-transposed to (S, H, C, W) so each row
    slice is a natural (C sublane, W lane) tile; patch rows are written
    at *static* sublane offsets (C per tap) with *static* lane shifts
    (j < fw) — no in-kernel transposes, no dynamic lane starts (Mosaic
    only supports 128-aligned dynamic lane slices; static ones are free).
  - One dot_general per (scale, row-block) contracts K = fh*fw*C on
    dim 0 of both operands: (K, TOH*OWP) patches x (K, FP) filters.
  - The weight matrix is laid out K-major (row C*(i*fw+j)+c holds
    filt[:, i, j, c]) to match the patch write order exactly.

Measured on v5e (tools/conv_pallas_proto.py, person26 big bucket
S=5 126x166x32, F=104 5x5): 1.30 ms / 12.6 TFLOP/s vs 2.34 ms /
7 TFLOP/s for lax.conv — DMA-bound at that point (TOH=2/4/8 all equal).

Replaces the reference's per-(filter, channel) cv::FilterEngine loop
(src/SpatialConvolutionEngine.cpp:70-124) and the per-filter MEX
kernels (matlab/mex/fconv.cc, fconvMT.cc, fconvblas.cc) on the TPU
serving path; `ops/conv.py::filter_responses` remains the XLA fallback
and the training/differentiable path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leave headroom under the ~16 MB/core VMEM budget: exceeding it on the
# tunneled worker wedges rather than erroring, so the limit is enforced
# both by this estimate and by CompilerParams(vmem_limit_bytes=...).
_VMEM_BUDGET = 13 << 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_bytes(h: int, w: int, c: int, f: int, fh: int, fw: int,
                toh: int, ow: int) -> int:
    """Conservative VMEM footprint of one grid step (f32)."""
    k = fh * fw * c
    owp = _round_up(ow, 128)
    fp = _round_up(f, 128)
    noh = -(-(h - fh + 1) // toh)
    hp = noh * toh + fh - 1
    feat_block = hp * c * _round_up(w, 128) * 4 * 2  # double-buffered
    weights = k * fp * 4
    scratch = k * toh * owp * 4
    out_block = toh * _round_up(ow, 8) * fp * 4 * 2
    return feat_block + weights + scratch + out_block


def _choose_toh(h: int, w: int, c: int, f: int, fh: int, fw: int,
                ow: int) -> int:
    """Largest row-block tile that fits the VMEM budget (0 = none).

    Measured throughput is flat across TOH=2..8 (DMA-bound); larger
    tiles just reduce grid overhead, so take the biggest that fits.
    """
    for toh in (8, 4, 2, 1):
        if toh <= h - fh + 1 or toh == 1:
            if _vmem_bytes(h, w, c, f, fh, fw, toh, ow) <= _VMEM_BUDGET:
                return toh
    return 0


def pallas_conv_eligible(features: jax.Array, filters: jax.Array) -> bool:
    """True when the Pallas kernel supports (and should run) this call.

    Requirements: f32 in/out, sublane-aligned channel count, the filter
    not larger than the feature, and the full-scale feature block +
    patch scratch fitting VMEM (large images fall back to lax.conv).
    """
    if features.ndim != 4 or filters.ndim != 4:
        return False
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    if fc != c or c % 8 != 0:
        return False
    if features.dtype != jnp.float32 or filters.dtype != jnp.float32:
        return False
    if fh > h or fw > w:
        return False
    ow = w - fw + 1
    return _choose_toh(h, w, c, f, fh, fw, ow) > 0


def _conv_kernel(feat_ref, w_ref, out_ref, patch, *, toh, fh, fw, c, ow,
                 owp):
    """One (scale, row-block) step: build K x (toh*owp) patches, dot.

    feat_ref: (1, hp, c, w) — index constant across the row axis, so the
    block is fetched once per scale. w_ref: (K, FP). out_ref:
    (1, toh, ow, FP). patch scratch: (K, toh*owp); lane padding columns
    ow..owp keep stale data — their dot rows are sliced off below.
    """
    base = pl.program_id(1) * toh
    for t in range(toh):
        for i in range(fh):
            row = feat_ref[0, base + t + i]  # (c, w) tile
            for j in range(fw):
                k = i * fw + j
                patch[
                    pl.ds(c * k, c), pl.ds(t * owp, ow)
                ] = row[:, j : j + ow]
    acc = jax.lax.dot_general(
        patch[:, :], w_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (toh*owp, FP)
    out_ref[0] = acc.reshape(toh, owp, -1)[:, :ow, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def filter_responses_pallas(
    features: jax.Array, filters: jax.Array, interpret: bool = False
) -> jax.Array:
    """Valid multi-channel correlation, implicit-GEMM Pallas kernel.

    Same contract as `ops.conv.filter_responses`: features (S, H, W, C),
    filters (F, fh, fw, C) -> (S, H-fh+1, W-fw+1, F).
    """
    s, h, w, c = features.shape
    f, fh, fw, fc = filters.shape
    assert fc == c
    oh, ow = h - fh + 1, w - fw + 1
    k = fh * fw * c
    owp = _round_up(ow, 128)
    fp = _round_up(f, 128)
    toh = _choose_toh(h, w, c, f, fh, fw, ow)
    if toh <= 0:
        raise ValueError(
            f"shapes exceed the VMEM budget: {features.shape} x "
            f"{filters.shape}"
        )
    noh = -(-oh // toh)
    hp = noh * toh + fh - 1

    # weights K-major: row c*(i*fw+j)+ch = filt[:, i, j, ch]
    w2 = jnp.transpose(filters, (1, 2, 3, 0)).reshape(k, f)
    w2 = jnp.pad(w2, ((0, 0), (0, fp - f)))
    feat_t = jnp.transpose(features, (0, 1, 3, 2))  # (S, H, C, W)
    feat_t = jnp.pad(feat_t, ((0, 0), (0, hp - h), (0, 0), (0, 0)))

    kernel = functools.partial(
        _conv_kernel, toh=toh, fh=fh, fw=fw, c=c, ow=ow, owp=owp
    )
    out = pl.pallas_call(
        kernel,
        grid=(s, noh),
        in_specs=[
            pl.BlockSpec(
                (1, hp, c, w), lambda si, r: (si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, toh, ow, fp), lambda si, r: (si, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((s, noh * toh, ow, fp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, toh * owp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 << 20  # error at compile, never wedge
        ),
        interpret=interpret,
    )(feat_t, w2)
    return out[:, :oh, :, :f]


def _conv_impl() -> str:
    return os.environ.get("PBD_CONV", "auto")


def filter_responses_infer(features: jax.Array, filters: jax.Array):
    """Inference-path dispatcher: the Pallas kernel on TPU when the
    shapes are eligible, `lax.conv` otherwise. PBD_CONV=xla|pallas|
    interpret overrides (interpret runs the kernel in the interpreter —
    CPU-testable kernel semantics). The XLA path is also the
    differentiable one; training always uses it directly."""
    from .conv import filter_responses

    impl = _conv_impl()
    if impl == "xla":
        return filter_responses(features, filters)
    if impl == "interpret":
        return filter_responses_pallas(features, filters, interpret=True)
    if impl != "pallas":  # auto
        if jax.default_backend() == "cpu":
            return filter_responses(features, filters)
        if not pallas_conv_eligible(features, filters):
            return filter_responses(features, filters)
    return filter_responses_pallas(features, filters)
