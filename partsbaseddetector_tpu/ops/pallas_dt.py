"""Pallas TPU kernel for the 1-D generalized distance transform.

The XLA brute-force formulation in distance_transform.py materializes /
re-streams an (batch, dlen, N) cost tensor through HBM for the max and
argmax reductions. This kernel computes both in ONE pass with the
source row resident in VMEM:

  grid over row tiles; per tile the (TB, N) source block is loaded
  once. The v-loop walks 128-wide source chunks (aligned dynamic
  slices); within a chunk every lane extraction is *static*, so Mosaic
  emits a lane-broadcast + 4 VPU ops per source sample — no HBM
  traffic, no second argmax pass, fully unrolled inner loop.

Per source sample v and output position q = shift + i*step:
  val = (a*(q-v) + b) * (q-v) + src[v];  out = max, ptr = first argmax
(strict > keeps the smallest v on ties, matching the lower-envelope
semantics — see distance_transform.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NACC = 4  # independent select-chain accumulators (ILP)
NEG = float(np.finfo(np.float32).min)  # -inf breaks min-identity padding


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dt_kernel(
    src_ref, a_ref, b_ref, shift_ref, nvalid_ref, out_ref, ptr_ref,
    *, nchunks, dlenp, step, tb,
):
    a = a_ref[:, :]  # (TB, 1)
    b = b_ref[:, :]
    q = shift_ref[:, :] + step * jax.lax.broadcasted_iota(
        jnp.int32, (tb, dlenp), 1
    ).astype(jnp.float32)

    def chunk_body(c, carry):
        acc = list(carry)  # ILP accumulator pairs (best, bestv)
        chunk = src_ref[:, pl.ds(c * LANE, LANE)]  # (TB, 128), aligned
        qc = q - (c * LANE).astype(jnp.float32)

        # static unroll with ILP accumulators: j mod NACC goes to its
        # own independent select chain, breaking the loop-carried
        # dependency; chains merge exactly after the last chunk
        for j in range(LANE):
            lane = j % NACC
            best, bestv = acc[lane]
            sval = chunk[:, j : j + 1]  # (TB, 1), static lane extract
            d = qc - jnp.float32(j)
            val = (a * d + b) * d + sval
            pred = val > best
            v_id = c * LANE + j
            acc[lane] = (
                jnp.where(pred, val, best),
                jnp.where(pred, v_id, bestv),
            )
        return tuple(acc)

    init = tuple(
        (jnp.full((tb, dlenp), NEG, jnp.float32), jnp.zeros((tb, dlenp), jnp.int32))
        for _ in range(NACC)
    )
    # dynamic trip count: chunks past this tile's longest valid source
    # row are pure -inf padding and can never win the max
    live = pl.cdiv(jnp.max(nvalid_ref[:, :]), LANE)
    acc = jax.lax.fori_loop(0, jnp.minimum(live, nchunks), chunk_body, init)
    best, bestv = acc[0]
    for best2, bestv2 in acc[1:]:
        # exact first-max merge: strictly greater wins; on ties the
        # smaller source index wins (envelope tie rule)
        pred = (best2 > best) | ((best2 == best) & (bestv2 < bestv))
        best = jnp.where(pred, best2, best)
        bestv = jnp.where(pred, bestv2, bestv)
    out_ref[:, :] = best
    ptr_ref[:, :] = bestv


def _dt_kernel_aux(
    src_ref, aux_ref, a_ref, b_ref, shift_ref, nvalid_ref, out_ref, ptr_ref,
    *, nchunks, dlenp, step, tb,
):
    """x-pass variant that carries a per-source aux value (the y-pass
    argmax) through the max, emitting packed (aux << 12) | v pointers —
    the Iy = tmpIy[Ix] composition (shiftdt.cc:102-108) fused into the
    kernel instead of a huge downstream gather."""
    a = a_ref[:, :]
    b = b_ref[:, :]
    q = shift_ref[:, :] + step * jax.lax.broadcasted_iota(
        jnp.int32, (tb, dlenp), 1
    ).astype(jnp.float32)

    def chunk_body(c, carry):
        acc = list(carry)
        chunk = src_ref[:, pl.ds(c * LANE, LANE)]
        # packed pointer per source sample: (aux << 12) | v
        pchunk = (aux_ref[:, pl.ds(c * LANE, LANE)] << 12) | (
            c * LANE + jax.lax.broadcasted_iota(jnp.int32, (tb, LANE), 1)
        )
        qc = q - (c * LANE).astype(jnp.float32)

        for j in range(LANE):
            lane = j % NACC
            best, bestp = acc[lane]
            sval = chunk[:, j : j + 1]
            pval = pchunk[:, j : j + 1]
            d = qc - jnp.float32(j)
            val = (a * d + b) * d + sval
            pred = val > best
            acc[lane] = (
                jnp.where(pred, val, best),
                jnp.where(pred, pval, bestp),
            )
        return tuple(acc)

    init = tuple(
        (
            jnp.full((tb, dlenp), NEG, jnp.float32),
            jnp.full((tb, dlenp), 0x7FFFFFFF, jnp.int32),
        )
        for _ in range(NACC)
    )
    live = pl.cdiv(jnp.max(nvalid_ref[:, :]), LANE)
    acc = jax.lax.fori_loop(0, jnp.minimum(live, nchunks), chunk_body, init)
    best, bestp = acc[0]
    for best2, bestp2 in acc[1:]:
        # tie rule: smaller source index v (the low 12 packed bits)
        pred = (best2 > best) | (
            (best2 == best) & ((bestp2 & 0xFFF) < (bestp & 0xFFF))
        )
        best = jnp.where(pred, best2, best)
        bestp = jnp.where(pred, bestp2, bestp)
    bestp = jnp.where(best == NEG, 0, bestp)  # all-masked rows
    out_ref[:, :] = best
    ptr_ref[:, :] = bestp


@functools.partial(
    jax.jit, static_argnames=("dlen", "step", "tb", "interpret", "has_aux")
)
def _dt1d_pallas_2d(
    src, a, b, shift, nvalid, aux, dlen: int, step: int, tb: int,
    interpret: bool, has_aux: bool,
):
    bsz, n = src.shape
    np_ = _round_up(max(n, LANE), LANE)
    dlenp = _round_up(max(dlen, LANE), LANE)
    bp = _round_up(max(bsz, tb), tb)

    src_p = jnp.full((bp, np_), NEG, jnp.float32)
    src_p = src_p.at[:bsz, :n].set(src.astype(jnp.float32))
    a_p = jnp.zeros((bp, 1), jnp.float32).at[:bsz, 0].set(a.astype(jnp.float32))
    b_p = jnp.zeros((bp, 1), jnp.float32).at[:bsz, 0].set(b.astype(jnp.float32))
    s_p = jnp.zeros((bp, 1), jnp.float32).at[:bsz, 0].set(
        shift.astype(jnp.float32)
    )
    n_p = jnp.zeros((bp, 1), jnp.int32).at[:bsz, 0].set(
        nvalid.astype(jnp.int32)
    )

    row_spec = lambda w: pl.BlockSpec(
        (tb, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((bp, dlenp), jnp.float32),
        jax.ShapeDtypeStruct((bp, dlenp), jnp.int32),
    ]
    if has_aux:
        aux_p = jnp.zeros((bp, np_), jnp.int32)
        aux_p = aux_p.at[:bsz, :n].set(aux.astype(jnp.int32))
        kernel = functools.partial(
            _dt_kernel_aux, nchunks=np_ // LANE, dlenp=dlenp, step=step, tb=tb
        )
        out, ptr = pl.pallas_call(
            kernel,
            grid=(bp // tb,),
            in_specs=[
                row_spec(np_), row_spec(np_), row_spec(1), row_spec(1),
                row_spec(1), row_spec(1),
            ],
            out_specs=[row_spec(dlenp), row_spec(dlenp)],
            out_shape=out_shape,
            interpret=interpret,
        )(src_p, aux_p, a_p, b_p, s_p, n_p)
    else:
        kernel = functools.partial(
            _dt_kernel, nchunks=np_ // LANE, dlenp=dlenp, step=step, tb=tb
        )
        out, ptr = pl.pallas_call(
            kernel,
            grid=(bp // tb,),
            in_specs=[
                row_spec(np_), row_spec(1), row_spec(1), row_spec(1), row_spec(1)
            ],
            out_specs=[row_spec(dlenp), row_spec(dlenp)],
            out_shape=out_shape,
            interpret=interpret,
        )(src_p, a_p, b_p, s_p, n_p)
    return out[:bsz, :dlen], ptr[:bsz, :dlen]


def _default_tb() -> int:
    import os

    return int(os.environ.get("PBD_DT_TB", "16"))


@functools.lru_cache(maxsize=None)
def _diff_dt(dlen: int, step: int, tb: int, interpret: bool, has_aux: bool):
    """custom_vjp wrapper so the training path can differentiate
    through the Pallas kernel: the forward saves the argmax pointers;
    the backward is the max's subgradient —
      d(out)/d(src[v]) = sum of cotangents at outputs whose argmax is v,
      d(out)/d(a) = g * d^2, d(out)/d(b) = g * d with d = q - v*.
    shift and aux are non-differentiable (integer grid metadata)."""

    @jax.custom_vjp
    def f(src, a, b, shift, nvalid, aux):
        return _dt1d_pallas_2d(
            src, a, b, shift, nvalid, aux, dlen, step, tb, interpret, has_aux
        )

    def fwd(src, a, b, shift, nvalid, aux):
        out, ptr = f(src, a, b, shift, nvalid, aux)
        return (out, ptr), (ptr, shift, src.shape[-1])

    def bwd(res, cots):
        g_out, _ = cots  # pointer cotangent is symbolically zero (int)
        ptr, shift, n = res
        v = (ptr & 0xFFF) if has_aux else ptr
        q = shift[:, None].astype(jnp.float32) + step * jax.lax.broadcasted_iota(
            jnp.int32, g_out.shape, 1
        ).astype(jnp.float32)
        d = q - v.astype(jnp.float32)
        g_a = jnp.sum(g_out * d * d, axis=-1)  # (B,)
        g_b = jnp.sum(g_out * d, axis=-1)
        # scatter cotangents to winning sources (one-hot contraction —
        # same O(dlen*N) shape as the forward, fuses on device)
        onehot = (
            v[..., :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        ).astype(g_out.dtype)
        g_src = jnp.einsum("bq,bqn->bn", g_out, onehot)
        return g_src, g_a, g_b, jnp.zeros_like(shift), None, None

    f.defvjp(fwd, bwd)
    return f


def dt1d_pallas(
    src,
    a,
    b,
    shift,
    dlen: int,
    step: int = 1,
    tb: int = None,
    interpret: bool = False,
    nvalid=None,
    aux=None,
    differentiable: bool = False,
):
    """Batched 1-D DT along the last axis via the Pallas kernel.

    src: (..., N); a, b, shift broadcastable to src.shape[:-1].
    nvalid (optional, broadcastable to batch): per-row count of valid
    source entries — everything beyond must be -inf; the kernel skips
    whole 128-chunks past the tile's max (exactness preserved, ~30%
    fewer iterations on pyramid buckets).
    aux (optional, same shape as src, int32 < 2^12): per-source values
    carried through the max; the pointer output becomes packed
    (aux[argmax] << 12) | argmax — the fused Iy composition.
    Returns (out (..., dlen) f32, ptr (..., dlen) int32).
    """
    if tb is None:
        tb = _default_tb()
    batch_shape = src.shape[:-1]
    n = src.shape[-1]
    if nvalid is None:
        nvalid = n
    bsz = int(np.prod(batch_shape)) if batch_shape else 1
    src2 = src.reshape(bsz, n)
    full = lambda x: jnp.broadcast_to(jnp.asarray(x), batch_shape).reshape(bsz)
    has_aux = aux is not None
    aux2 = aux.reshape(bsz, n) if has_aux else src2[..., :0]
    if differentiable:
        fn = _diff_dt(dlen, step, tb, interpret, has_aux)
        out, ptr = fn(
            src2,
            full(a).astype(jnp.float32),
            full(b).astype(jnp.float32),
            full(shift).astype(jnp.float32),
            jnp.asarray(full(nvalid), jnp.int32),
            aux2,
        )
    else:
        out, ptr = _dt1d_pallas_2d(
            src2, full(a), full(b), full(shift), full(nvalid), aux2,
            dlen, step, tb, interpret, has_aux,
        )
    return out.reshape(*batch_shape, dlen), ptr.reshape(*batch_shape, dlen)
