"""Pallas TPU kernel for the 1-D generalized distance transform.

The XLA brute-force formulation in distance_transform.py materializes /
re-streams an (batch, dlen, N) cost tensor through HBM for the max and
argmax reductions. This kernel computes both in ONE pass with the
source row resident in VMEM:

  grid over row tiles; per tile the source block is loaded once. The
  v-loop walks lane-aligned source chunks (aligned dynamic slices);
  within a chunk every lane extraction is *static*, so Mosaic emits a
  lane-broadcast + a few VPU ops per source sample — no HBM traffic,
  no second argmax pass, fully unrolled inner loop.

Two exact packing optimizations kill the 128-lane padding waste that
dominates the deep pyramid buckets (grids of 13..66 cells):

  * tail peeling — the last source chunk unrolls only the `n mod spc`
    real samples instead of a full lane width (sources are compile-time
    sized by the scale grid, so the tail length is static);
  * row packing — when dlen <= 64/32/16, 2/4/8 rows share one 128-lane
    vector: outputs AND sources of `pack` consecutive rows interleave
    within the lane dimension, so both the output lanes and the v-loop
    trip count shrink by the pack factor. Deformation params (a, b,
    shift, nvalid) become per-lane vectors; the per-source broadcast is
    assembled from `pack` static lane extracts + (pack-1) lane-masked
    selects. This is a pure re-packing — values, tie rules and pointer
    semantics are bit-identical to the unpacked scan.

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


def _make_kernel(
    *, nchunks, ntail, spc, pack, dlenp, step, tb, has_aux
):
    """Build the DT kernel body.

    nchunks: total source chunks (incl. tail); ntail: real samples in
    the last chunk (1..spc); spc = LANE // pack sources per chunk per
    subrow; dlenp: output lane width (pack * (dlenp // pack) outputs);
    a/b/shift/nvalid arrive as (tb, dlenp) per-lane vectors.
    """
    sub = dlenp // pack  # outputs per subrow

    def make_extract():
        """Lane-masked source broadcast assembly: (tb, LANE) chunk ->
        (tb, dlenp) vector where subrow s's lanes get chunk[:, s*spc+j].
        Masks are built from iota inside the kernel (pallas forbids
        captured constants)."""
        lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, dlenp), 1)
        masks = [lane_id >= s * sub for s in range(1, pack)]

        def extract(chunk, j):
            vec = chunk[:, j : j + 1]
            for s in range(1, pack):
                sv = chunk[:, s * spc + j : s * spc + j + 1]
                vec = jnp.where(masks[s - 1], sv, vec)
            return vec

        return extract

    def kernel(*refs):
        extract = make_extract()
        if has_aux:
            (src_ref, aux_ref, a_ref, b_ref, shift_ref, nvalid_ref,
             out_ref, ptr_ref) = refs
        else:
            (src_ref, a_ref, b_ref, shift_ref, nvalid_ref,
             out_ref, ptr_ref) = refs
            aux_ref = None
        a = a_ref[:, :]  # (tb, dlenp)
        b = b_ref[:, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (tb, dlenp), 1) % sub
        q = shift_ref[:, :] + step * pos.astype(jnp.float32)

        def chunk_body(c, carry, nj):
            acc = list(carry)  # ILP accumulator pairs (best, bestv/p)
            chunk = src_ref[:, pl.ds(c * LANE, LANE)]
            if has_aux:
                achunk = aux_ref[:, pl.ds(c * LANE, LANE)]
            qc = q - jnp.asarray(c * spc, jnp.float32)  # c may be traced

            # static unroll with ILP accumulators: j mod NACC goes to
            # its own independent select chain, breaking the
            # loop-carried dependency; chains merge exactly at the end
            for j in range(nj):
                lane = j % NACC
                best, bestv = acc[lane]
                sval = extract(chunk, j)
                d = qc - jnp.float32(j)
                val = (a * d + b) * d + sval
                pred = val > best
                if has_aux:
                    pval = (extract(achunk, j) << 12) | (c * spc + j)
                else:
                    pval = c * spc + j
                acc[lane] = (
                    jnp.where(pred, val, best),
                    jnp.where(pred, pval, bestv),
                )
            return tuple(acc)

        init = tuple(
            (
                jnp.full((tb, dlenp), NEG, jnp.float32),
                jnp.full((tb, dlenp), 0x7FFFFFFF, jnp.int32)
                if has_aux
                else jnp.zeros((tb, dlenp), jnp.int32),
            )
            for _ in range(NACC)
        )
        # dynamic trip count: full chunks past this tile's longest valid
        # source row are pure NEG padding and can never win the max
        live = pl.cdiv(jnp.max(nvalid_ref[:, :]), spc)
        nfull = nchunks - 1
        acc = jax.lax.fori_loop(
            0,
            jnp.minimum(live, nfull),
            lambda c, carry: chunk_body(c, carry, LANE // pack),
            init,
        )
        # peeled tail chunk: only the ntail real samples are unrolled
        # (sources beyond n never existed; no wasted lane iterations)
        acc = chunk_body(nfull, acc, ntail)

        best, bestv = acc[0]
        vkey = (bestv & 0xFFF) if has_aux else bestv
        for best2, bestv2 in acc[1:]:
            # exact first-max merge: strictly greater wins; on ties the
            # smaller source index wins (envelope tie rule)
            vkey2 = (bestv2 & 0xFFF) if has_aux else bestv2
            pred = (best2 > best) | ((best2 == best) & (vkey2 < vkey))
            best = jnp.where(pred, best2, best)
            bestv = jnp.where(pred, bestv2, bestv)
            vkey = jnp.where(pred, vkey2, vkey)
        if has_aux:
            bestv = jnp.where(best == NEG, 0, bestv)  # all-masked rows
        out_ref[:, :] = best
        ptr_ref[:, :] = bestv

    return kernel


def _choose_pack(dlen: int) -> int:
    for pack in (8, 4, 2):
        if dlen <= LANE // pack:
            return pack
    return 1


@functools.partial(
    jax.jit, static_argnames=("dlen", "step", "tb", "interpret", "has_aux")
)
def _dt1d_pallas_2d(
    src, a, b, shift, nvalid, aux, dlen: int, step: int, tb: int,
    interpret: bool, has_aux: bool,
):
    bsz, n = src.shape
    pack = _choose_pack(dlen)
    spc = LANE // pack  # sources per chunk per subrow
    sub = LANE // pack if pack > 1 else _round_up(max(dlen, LANE), LANE)
    dlenp = pack * sub  # output lane width (LANE when packed)
    nchunks = max(1, -(-n // spc))
    ntail = n - (nchunks - 1) * spc

    nvec = -(-bsz // pack)  # packed vector-rows
    bp = _round_up(max(nvec, tb), tb)
    rows = bp * pack  # padded original-row count

    def pad_rows(x, fill, dtype):
        out = jnp.full((rows,), fill, dtype)
        return out.at[:bsz].set(x.astype(dtype))

    # source slab: (rows, n) -> NEG-pad cols to chunk multiple, then
    # interleave pack consecutive rows within each chunk's lanes
    def pack_slab(x2, fill, dtype):
        slab = jnp.full((rows, nchunks * spc), fill, dtype)
        slab = slab.at[:bsz, :n].set(x2.astype(dtype))
        slab = slab.reshape(bp, pack, nchunks, spc)
        return jnp.transpose(slab, (0, 2, 1, 3)).reshape(bp, nchunks * LANE)

    src_p = pack_slab(src, NEG, jnp.float32)

    # per-lane param vectors: subrow s of vector-row r owns lane range
    # [s*sub, (s+1)*sub) and carries original row r*pack + s's params
    def lane_vec(x, fill, dtype):
        v = pad_rows(x, fill, dtype).reshape(bp, pack, 1)
        return jnp.broadcast_to(v, (bp, pack, sub)).reshape(bp, dlenp)

    a_p = lane_vec(a, 0.0, jnp.float32)
    b_p = lane_vec(b, 0.0, jnp.float32)
    s_p = lane_vec(shift, 0.0, jnp.float32)
    n_p = lane_vec(nvalid, 0, jnp.int32)

    row_spec = lambda w: pl.BlockSpec(
        (tb, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((bp, dlenp), jnp.float32),
        jax.ShapeDtypeStruct((bp, dlenp), jnp.int32),
    ]
    kernel = _make_kernel(
        nchunks=nchunks, ntail=ntail, spc=spc, pack=pack, dlenp=dlenp,
        step=step, tb=tb, has_aux=has_aux,
    )
    operands = [src_p]
    in_specs = [row_spec(nchunks * LANE)]
    if has_aux:
        aux_p = pack_slab(aux, 0, jnp.int32)
        operands.append(aux_p)
        in_specs.append(row_spec(nchunks * LANE))
    operands += [a_p, b_p, s_p, n_p]
    in_specs += [row_spec(dlenp)] * 4

    out, ptr = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=[row_spec(dlenp), row_spec(dlenp)],
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    # unpack: (bp, pack, sub) -> (rows, sub) -> (bsz, dlen)
    out = out.reshape(bp * pack, sub)[:bsz, :dlen]
    ptr = ptr.reshape(bp * pack, sub)[:bsz, :dlen]
    return out, ptr


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
    whole source chunks past the tile's max (exactness preserved).
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
