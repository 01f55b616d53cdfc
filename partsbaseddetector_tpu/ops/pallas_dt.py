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
def _nacc() -> int:
    """Independent select-chain accumulators (ILP) in the sublane DT
    kernel; tunable for A/B probes (tools/), default measured-best."""
    import os

    return int(os.environ.get("PBD_DT_NACC", "2"))


NACC = 4  # lane-chunk kernel accumulators (ILP)
NEG = float(np.finfo(np.float32).min)  # -inf breaks min-identity padding


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_affine() -> bool:
    """Opt-in (PBD_DT_AFFINE=1): chunk-centered affine decomposition in
    the pack==1 chunked kernel (see _make_kernel). Measured and
    REJECTED on v5e: 3x SLOWER than the direct form (45.8 vs 148.7
    Gsample/s on the big x-pass shape, tools/dt_xpass_microbench.py) —
    the per-sample (tb, 1) column arithmetic + explicit lane broadcast
    costs more than the full-tile FMAs it saves (Mosaic folds the
    direct form's extracted-lane operand into the adds for free)."""
    import os

    return os.environ.get("PBD_DT_AFFINE", "0") == "1"


def _make_kernel(
    *, nchunks, ntail, spc, pack, dlenp, step, tb, has_aux, cond_tail
):
    """Build the DT kernel body.

    nchunks: total source chunks (incl. tail); ntail: real samples in
    the last chunk (1..spc); spc = LANE // pack sources per chunk per
    subrow; dlenp: output lane width (pack * (dlenp // pack) outputs);
    a/b/shift/nvalid arrive as (tb, dlenp) per-lane vectors.

    pack == 1 uses an affine decomposition of the quadratic around the
    chunk midpoint m (with qm = q - m, jm = j - spc/2, d = qm - jm):
        val = a d^2 + b d + s_v
            = [a qm^2 + b qm] + jm * [-(2 a qm + b)] + [a jm^2 + s_v]
    The bracketed per-output terms Q2m and Lm are computed once per
    chunk; per source sample only c_j = a jm^2 + s_v (a thin (tb, 1)
    column) plus one broadcast-add and one scalar-FMA touch the full
    tile — ~5 full-tile VPU ops per sample instead of ~8. Centering at
    the chunk midpoint bounds the intermediates near winning
    displacements (|jm| < spc/2), so the rearrangement's fp error on
    any max candidate stays ~1e-4 · penalty-at-distance. With row
    packing the per-lane a/b make c_j full-width, so the direct form
    is kept.
    """
    sub = dlenp // pack  # outputs per subrow
    affine = pack == 1 and _use_affine()
    half = spc / 2.0

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
        a = a_ref[:, :]  # (tb, dlenp) — or (tb, 1) in affine mode
        b = b_ref[:, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (tb, dlenp), 1) % sub
        q = shift_ref[:, :] + step * pos.astype(jnp.float32)

        def chunk_body(c, carry, nj):
            acc = list(carry)  # ILP accumulator pairs (best, bestv/p)
            chunk = src_ref[:, pl.ds(c * LANE, LANE)]
            if has_aux:
                achunk = aux_ref[:, pl.ds(c * LANE, LANE)]
            cf = (c * spc).astype(jnp.float32) if hasattr(c, "aval") \
                else jnp.float32(c * spc)
            if affine:
                qm = q - (cf + jnp.float32(half))  # chunk-centered
                t = a * qm
                q2m = (t + b) * qm  # (tb, dlenp), once per chunk
                lm = -(t + t + b)
            else:
                qc = q - cf  # c may be traced

            # static unroll with ILP accumulators: j mod NACC goes to
            # its own independent select chain, breaking the
            # loop-carried dependency; chains merge exactly at the end
            for j in range(nj):
                lane = j % NACC
                best, bestv = acc[lane]
                sval = extract(chunk, j)
                if affine:
                    jm = jnp.float32(j - half)
                    cj = a * (jm * jm) + sval  # (tb, 1)
                    val = (q2m + cj) + jm * lm
                else:
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
        nv_max = jnp.max(nvalid_ref[:, :])
        live = pl.cdiv(nv_max, spc)
        nfull = nchunks - 1
        acc = jax.lax.fori_loop(
            0,
            jnp.minimum(live, nfull),
            lambda c, carry: chunk_body(c, carry, LANE // pack),
            init,
        )
        # peeled tail chunk: only the ntail real samples are unrolled
        # (sources beyond n never existed; no wasted lane iterations).
        # cond_tail (scan-schedule batches, which pad levels with dead
        # slots) skips it when no valid source reaches it; the branch
        # costs ~2 ms/img on mostly-live batches, so the default path
        # keeps the unconditional tail.
        if cond_tail:
            acc = jax.lax.cond(
                nv_max > nfull * spc,
                lambda carry: chunk_body(nfull, carry, ntail),
                lambda carry: carry,
                acc,
            )
        else:
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
    jax.jit,
    static_argnames=(
        "dlen", "step", "tb", "interpret", "has_aux", "cond_tail"
    ),
)
def _dt1d_pallas_2d(
    src, a, b, shift, nvalid, aux, dlen: int, step: int, tb: int,
    interpret: bool, has_aux: bool, cond_tail: bool = False,
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
    # [s*sub, (s+1)*sub) and carries original row r*pack + s's params.
    # pack == 1 (affine kernel): thin (bp, 1) columns instead.
    def lane_vec(x, fill, dtype):
        if pack == 1 and _use_affine():
            return pad_rows(x, fill, dtype).reshape(bp, 1)
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
        step=step, tb=tb, has_aux=has_aux, cond_tail=cond_tail,
    )
    operands = [src_p]
    in_specs = [row_spec(nchunks * LANE)]
    if has_aux:
        aux_p = pack_slab(aux, 0, jnp.int32)
        operands.append(aux_p)
        in_specs.append(row_spec(nchunks * LANE))
    operands += [a_p, b_p, s_p, n_p]
    in_specs += [
        row_spec(1 if (pack == 1 and _use_affine()) else dlenp)
    ] * 4

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


def _make_window_kernel(
    *, dlen, dlenp, c0, smax, tb, has_aux
):
    """Adaptive-window DT kernel (v3): displacement-ordered scan with an
    exact early-exit bound.

    The quadratic spring cost makes far displacements unwinnable: once
    every (valid) output lane's running best exceeds
        max_src + max_{|d| > s} pen(d),
    no remaining displacement can change the result, so the scan stops.
    The bound is inflated by a small slack so fp32 rounding can only
    delay the exit, never cause a miss — results stay bit-identical to
    the full scan (verified by the property tests).

    Layout: output positions on lanes; the source row is stored as an
    anchor-aligned slab so that displacement d reads the contiguous
    lane slice [c0 - d, c0 - d + dlenp) — one dynamic-start vector load
    per displacement, identical for every row in the tile.

    sh_ref carries the per-row anchor so pointers are emitted in source
    coordinates: v = sh + i - d.
    """

    def kernel(*refs):
        if has_aux:
            (slab_ref, aslab_ref, a_ref, b_ref, sh_ref, ov_ref,
             out_ref, ptr_ref) = refs
        else:
            (slab_ref, a_ref, b_ref, sh_ref, ov_ref,
             out_ref, ptr_ref) = refs
            aslab_ref = None
        a = a_ref[:, :]  # (tb, 1)
        b = b_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tb, dlenp), 1)
        ovm = lane < ov_ref[:, :]  # valid-output mask
        msrc = jnp.max(slab_ref[:, :], axis=1, keepdims=True)  # (tb, 1)

        pen = lambda x: (a * x + b) * x
        # concave vertex d* = -b/(2a); guard a >= 0 (never exit early)
        neg_a = a < 0.0
        dstar = jnp.where(neg_a, -b / (2.0 * jnp.where(neg_a, a, -1.0)), 0.0)
        exitable = neg_a | ((a == 0.0) & (b == 0.0))

        INITP = jnp.int32(0x7FFFFFFF)

        wide = dlenp + LANE

        def shifted(ref, d_int):
            """ref lanes [c0 - d, c0 - d + dlenp): Mosaic only allows
            128-aligned dynamic lane starts, so load one extra chunk at
            the aligned base and lane-rotate by the remainder."""
            offset = c0 - d_int
            al = pl.multiple_of((offset // LANE) * LANE, LANE)
            rem = offset - al
            w = ref[:, pl.ds(al, wide)]
            return pltpu.roll(w, (wide - rem) % wide, axis=1)[:, :dlenp]

        def step_d(d_int, best, bptr):
            d = d_int.astype(jnp.float32)
            sval = shifted(slab_ref, d_int)
            val = pen(d) + sval
            v_vec = sh_ref[:, :] + lane - d_int
            if has_aux:
                aval = shifted(aslab_ref, d_int)
                pval = (aval << 12) | v_vec
                bv = bptr & 0xFFF
            else:
                pval = v_vec
                bv = bptr
            upd = (val > best) | ((val == best) & (v_vec < bv))
            return jnp.where(upd, val, best), jnp.where(upd, pval, bptr)

        def body(carry):
            s, _, best, bptr = carry
            best, bptr = step_d(s, best, bptr)
            # s=0 runs d=0 twice; the second pass is an exact no-op
            best, bptr = step_d(-s, best, bptr)
            # exact exit bound over the remaining displacements |d| > s
            sf = (s + 1).astype(jnp.float32)
            pf = jnp.maximum(pen(sf), pen(-sf))
            pf = jnp.where(
                neg_a & (jnp.abs(dstar) > sf), jnp.maximum(pf, pen(dstar)), pf
            )
            slack = 1e-3 + 1e-3 * (jnp.abs(msrc) + jnp.abs(pf))
            bound = msrc + pf + slack
            bound = jnp.where(msrc == NEG, NEG, bound)
            bound = jnp.where(exitable, bound, jnp.float32(np.inf))
            stop = jnp.all((~ovm) | (best >= bound))
            return s + 1, stop, best, bptr

        init = (
            jnp.int32(0),
            jnp.bool_(False),
            jnp.full((tb, dlenp), NEG, jnp.float32),
            jnp.full((tb, dlenp), INITP, jnp.int32),
        )
        _, _, best, bptr = jax.lax.while_loop(
            lambda c: (c[0] <= smax) & (~c[1]), body, init
        )
        best = jnp.where(ovm, best, NEG)
        # pointer contract matches v2: rows/lanes with no winnable source
        # (best still NEG) report pointer 0
        bptr = jnp.where(ovm & (best != NEG), bptr, 0)
        out_ref[:, :] = best
        ptr_ref[:, :] = bptr

    return kernel


def _dt1d_pallas_window(
    src, a, b, shifts: np.ndarray, out_valid, aux, dlen: int, tb: int,
    interpret: bool, has_aux: bool,
):
    """Window-kernel driver for step == 1 with static per-row shifts.

    shifts: static NumPy integer per-row anchors. Builds an
    anchor-aligned NEG-padded slab (so every displacement is one
    contiguous lane slice), then runs the adaptive kernel. out_valid:
    static per-row count of output lanes that must be exact (None ->
    all dlen); lanes beyond it return (NEG, 0).
    """
    bsz, n = src.shape
    sh = np.asarray(shifts, np.int64).reshape(bsz)
    jmin = int(-sh.max())
    jmax = int(n - 1 - sh.min())
    jlen = jmax - jmin + 1
    dlenp = _round_up(max(dlen, LANE), LANE)
    smax = int(max(jmax, dlen - 1 - jmin))
    # symmetric layout: displacement d slices lanes [c0 - d, c0 - d + dlenp)
    # with c0 = smax, so every |d| <= smax stays in bounds
    c0 = smax
    padl = smax + jmin  # >= 0 since smax >= dlen - 1 - jmin >= -jmin
    # +LANE: the kernel loads one extra chunk at the aligned base
    wp = _round_up(2 * smax + dlenp, LANE) + LANE

    # aligned gather: slab[r, padl + (j - jmin)] = src[r, sh[r] + j]
    idx = sh[:, None] + (jmin + np.arange(jlen))[None, :]  # static (bsz, jlen)
    ok = (idx >= 0) & (idx < n)
    idxc = np.clip(idx, 0, n - 1).astype(np.int32)

    def aligned(x, fill, dtype):
        g = jnp.take_along_axis(x.astype(dtype), jnp.asarray(idxc), axis=1)
        g = jnp.where(jnp.asarray(ok), g, fill)
        out = jnp.full((bsz, wp), fill, dtype)
        return jax.lax.dynamic_update_slice(out, g, (0, padl))

    slab = aligned(src, NEG, jnp.float32)
    c0 = padl - jmin  # slice start for displacement 0

    bp = _round_up(max(bsz, tb), tb)

    def pad_rows(x2, fill):
        if x2.shape[0] == bp:
            return x2
        return jnp.concatenate(
            [x2, jnp.full((bp - bsz, x2.shape[1]), fill, x2.dtype)], axis=0
        )

    slab = pad_rows(slab, NEG)
    col = lambda x, dtype: pad_rows(
        jnp.asarray(x, dtype).reshape(bsz, 1), jnp.asarray(0, dtype)
    )
    a_p = col(a, jnp.float32)
    b_p = col(b, jnp.float32)
    sh_p = col(sh, jnp.int32)
    if out_valid is None:
        out_valid = jnp.full((bsz,), dlen, jnp.int32)
    ov_p = col(jnp.minimum(jnp.asarray(out_valid, jnp.int32), dlen), jnp.int32)

    row_spec = lambda w: pl.BlockSpec(
        (tb, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_window_kernel(
        dlen=dlen, dlenp=dlenp, c0=c0, smax=smax, tb=tb, has_aux=has_aux
    )
    operands = [slab]
    in_specs = [row_spec(wp)]
    if has_aux:
        operands.append(pad_rows(aligned(aux, 0, jnp.int32), 0))
        in_specs.append(row_spec(wp))
    operands += [a_p, b_p, sh_p, ov_p]
    in_specs += [row_spec(1)] * 4

    out, ptr = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=[row_spec(dlenp), row_spec(dlenp)],
        out_shape=[
            jax.ShapeDtypeStruct((bp, dlenp), jnp.float32),
            jax.ShapeDtypeStruct((bp, dlenp), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    return out[:bsz, :dlen], ptr[:bsz, :dlen]


def _make_sublane_kernel(*, h, dlen, w, ts, step, nacc, has_aux=False,
                         window=False):
    """DT scan along the SUBLANE axis (axis -2): per source row v the
    update is `pen(q - v) + src[v, :]` — a (ts, 1) penalty column
    sublane-broadcast against the (1, w) source row. No transposes, no
    lane extraction, and the full-tile op count per source sample drops
    to ~4 (broadcast-add, compare, two selects); the penalty polynomial
    runs on a single-lane column. Source rows stream in 8-sublane
    chunks with a dynamic live bound (chunks past the map's valid
    height are pure -inf padding) plus a static tail.

    has_aux: per-source int32 rows (< 2^12) carried through the max —
    the pointer output becomes (aux[argmax, :] << 12) | argmax, the
    fused Iy composition the x-pass needs (same contract as the
    lane-chunked kernel's aux).

    window: exact displacement-window pruning along sublanes. Sources
    more than W_t from this tile's output range cannot win: a source at
    distance d scores at most pen(d) + max_src, while the in-window
    candidate v_near = clip(q, 0, nv-1) guarantees
    best >= pen(q - v_near) + src[v_near] >= pen(+-delta) + min_src, so
    any d with w2 d^2 - |w1| d > R + (w2 delta + |w1|) delta loses
    STRICTLY (R = max_src - min_src over live values arrives per map in
    SMEM; slack inflates the bound so fp rounding can only widen the
    window, never drop a winner — ties included, since excluded sources
    are strictly below the max). The chunk loop then runs only
    [c_lo, c_hi) — dynamic 8-aligned sublane starts are cheap on TPU,
    exactly the trick that is impossible along lanes (128-aligned
    starts). Dead (NEG/-inf) sources can never win nor serve as
    v_near, so they are excluded from R by the caller.
    """
    sub = 8  # f32 sublane granularity
    nfull = h // sub
    ntail = h - nfull * sub

    def kernel(*refs):
        if window and has_aux:
            (a_ref, b_ref, sh_ref, nv_ref, nvmin_ref, rng_ref, src_ref,
             aux_ref, out_ref, ptr_ref) = refs
        elif window:
            (a_ref, b_ref, sh_ref, nv_ref, nvmin_ref, rng_ref, src_ref,
             out_ref, ptr_ref) = refs
            aux_ref = None
        elif has_aux:
            (a_ref, b_ref, sh_ref, nv_ref, src_ref, aux_ref,
             out_ref, ptr_ref) = refs
            rng_ref = None
        else:
            (a_ref, b_ref, sh_ref, nv_ref, src_ref,
             out_ref, ptr_ref) = refs
            aux_ref = None
            rng_ref = None
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        a = a_ref[bi, 0]
        b = b_ref[bi, 0]
        i = ti * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)
        q = sh_ref[bi, 0] + jnp.float32(step) * i.astype(jnp.float32)

        def row_update(carry_entry, vf, v_int, srow, arow):
            best, bestv = carry_entry
            d = q - vf  # (ts, 1)
            pen = (a * d + b) * d
            val = pen + srow  # (ts, w) sublane-broadcast add
            pred = val > best
            pval = ((arow << 12) | v_int) if has_aux else v_int
            return (
                jnp.where(pred, val, best),
                jnp.where(pred, pval, bestv),
            )

        def chunk_body(c, carry):
            acc = list(carry)
            base = pl.multiple_of(c * sub, sub)
            chunk = src_ref[0, pl.ds(base, sub), :]  # (8, w)
            achunk = aux_ref[0, pl.ds(base, sub), :] if has_aux else None
            cf = (c * sub).astype(jnp.float32)
            for j in range(sub):
                acc[j % nacc] = row_update(
                    acc[j % nacc], cf + jnp.float32(j),
                    c * sub + j, chunk[j : j + 1, :],
                    achunk[j : j + 1, :] if has_aux else None,
                )
            return tuple(acc)

        init = tuple(
            (
                jnp.full((ts, w), NEG, jnp.float32),
                jnp.full((ts, w), 0x7FFFFFFF, jnp.int32)
                if has_aux
                else jnp.zeros((ts, w), jnp.int32),
            )
            for _ in range(nacc)
        )
        if nfull > 0:
            live = pl.cdiv(nv_ref[pl.program_id(0), 0], sub)
            hi = jnp.minimum(live, nfull)
            lo = jnp.int32(0)
            if window:
                a_s = a_ref[bi, 0]
                b_s = b_ref[bi, 0]
                qlo = sh_ref[bi, 0] + jnp.float32(step) * (ti * ts)
                qhi = qlo + jnp.float32(step * (ts - 1))
                w2 = -a_s
                w1m = jnp.abs(b_s)
                # witness bound: every LIVE lane is live on at least
                # [0, nvmin) (= nv when lanes come from one map; the
                # per-segment min when several scale maps are packed
                # along lanes), so clip(q, 0, nvmin-1) is a live
                # in-window candidate for every lane that can win
                nvf = nvmin_ref[bi, 0].astype(jnp.float32)
                # max distance from any tile output to [0, nvmin-1]
                delta = jnp.maximum(
                    0.0, jnp.maximum(-qlo, qhi - (nvf - 1.0))
                )
                c_bound = (
                    rng_ref[bi, 0] + (w2 * delta + w1m) * delta
                ) * 1.00001 + 1e-4
                wt = (
                    w1m + jnp.sqrt(w1m * w1m + 4.0 * w2 * c_bound)
                ) / (2.0 * jnp.where(w2 > 0, w2, 1.0))
                wt = wt * 1.0001 + 1.0  # fp slack: only widens
                winlo = jnp.floor((qlo - wt) / sub).astype(jnp.int32)
                winhi = jnp.floor((qhi + wt) / sub).astype(jnp.int32) + 1
                # w2 == 0: no quadratic term -> no finite bound
                ok = w2 > 0.0
                lo = jnp.where(ok, jnp.maximum(0, winlo), 0)
                hi = jnp.where(ok, jnp.minimum(hi, winhi), hi)
                lo = jnp.minimum(lo, hi)
            acc = list(jax.lax.fori_loop(lo, hi, chunk_body, init))
        else:
            acc = list(init)
        for j in range(ntail):  # static tail rows
            v = nfull * sub + j
            acc[j % nacc] = row_update(
                acc[j % nacc], jnp.float32(v), v,
                src_ref[0, v : v + 1, :],
                aux_ref[0, v : v + 1, :] if has_aux else None,
            )
        best, bestv = acc[0]
        vkey = (bestv & 0xFFF) if has_aux else bestv
        for best2, bestv2 in acc[1:]:
            # exact first-max merge: ties go to the smaller source index
            vkey2 = (bestv2 & 0xFFF) if has_aux else bestv2
            pred = (best2 > best) | ((best2 == best) & (vkey2 < vkey))
            best = jnp.where(pred, best2, best)
            bestv = jnp.where(pred, bestv2, bestv)
            vkey = jnp.where(pred, vkey2, vkey)
        if has_aux:
            bestv = jnp.where(best == NEG, 0, bestv)  # all-masked rows
        out_ref[0, :, :] = best
        ptr_ref[0, :, :] = bestv

    return kernel


def _sublane_ts() -> int:
    import os

    return int(os.environ.get("PBD_DT_TS", "24"))


@functools.partial(
    jax.jit,
    static_argnames=("dlen", "step", "interpret", "has_aux", "window"),
)
def _dt1d_sublane_call(src, a, b, shift, nvalid, aux, dlen: int, step: int,
                       interpret: bool, has_aux: bool = False,
                       window: bool = False, nvalid_min=None):
    bsz, h, w = src.shape
    # scalars ride SMEM as (bsz, 1): a 2-D block whose last two dims
    # equal the array's stays a legal Mosaic block even after vmap
    # prepends a batch dim (a 1-D (bsz,) operand batches to (B, bsz)
    # with block (1, bsz), which the TPU lowering rejects) — the fused
    # batched detect vmaps this call with a per-image window range
    a_p = jnp.asarray(a, jnp.float32).reshape(bsz, 1)
    b_p = jnp.asarray(b, jnp.float32).reshape(bsz, 1)
    sh_p = jnp.asarray(shift, jnp.float32).reshape(bsz, 1)
    nv_p = jnp.asarray(nvalid, jnp.int32).reshape(bsz, 1)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ts = min(_sublane_ts(), _round_up(dlen, 8))
    nqt = -(-dlen // ts)
    kernel = _make_sublane_kernel(
        h=h, dlen=dlen, w=w, ts=ts, step=step, nacc=_nacc(),
        has_aux=has_aux, window=window,
    )
    map_spec = pl.BlockSpec(
        (1, h, w), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
    )
    operands = [a_p, b_p, sh_p, nv_p]
    in_specs = [scalar_spec] * 4
    if window:
        nvm = nvalid if nvalid_min is None else nvalid_min
        nvm_p = jnp.asarray(nvm, jnp.int32).reshape(bsz, 1)
        operands.append(nvm_p)
        in_specs.append(scalar_spec)
        # per-map live value range R = max - min over sources that can
        # win (strictly above the NEG sentinel; -inf/NEG never wins and
        # never serves as the v_near witness — see _make_sublane_kernel)
        srcf = src.astype(jnp.float32)
        livem = srcf > (0.5 * NEG)
        mx = jnp.max(jnp.where(livem, srcf, -jnp.inf), axis=(-2, -1))
        mn = jnp.min(jnp.where(livem, srcf, jnp.inf), axis=(-2, -1))
        rng_p = mx - mn
        rng_p = jnp.where(jnp.isfinite(rng_p), rng_p, 0.0)
        operands.append(rng_p.reshape(bsz, 1))
        in_specs.append(scalar_spec)
    operands.append(src.astype(jnp.float32))
    in_specs.append(map_spec)
    if has_aux:
        operands.append(aux.astype(jnp.int32))
        in_specs.append(map_spec)
    out, ptr = pl.pallas_call(
        kernel,
        grid=(bsz, nqt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, ts, w), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
            )
        ]
        * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, dlen, w), jnp.float32),
            jax.ShapeDtypeStruct((bsz, dlen, w), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    return out, ptr


def dt1d_sublane(
    src,
    a,
    b,
    shift,
    dlen: int,
    step: int = 1,
    nvalid=None,
    interpret: bool = False,
    aux=None,
    window: bool = False,
    nvalid_min=None,
):
    """Batched 1-D DT along axis -2 (the sublane axis) — the y pass in
    the natural (..., H, W) layout, so the 2-D composition needs zero
    transposes. src: (..., H, W); a/b/shift broadcastable to
    src.shape[:-2]; nvalid: per-map valid source-row count (rows beyond
    must be -inf). aux (optional, same shape as src, int32 < 2^12):
    per-source rows carried through the max — ptr becomes
    (aux[argmax] << 12) | argmax (the fused pointer composition; used
    by the transposed x-pass). window=True enables the exact
    displacement-window chunk pruning (see _make_sublane_kernel); it
    additionally requires every lane to be either entirely dead (all
    sources <= NEG/2) or live at each index in [0, nvalid) — interior
    dead holes would invalidate the nearest-source witness. The
    pipeline's -inf padding is contiguous rectangles, which satisfies
    this. nvalid_min (optional): when lanes of one map pack SEVERAL
    source maps side by side (the scale-packed DT path), the per-map
    minimum live height across the packed segments — the window's
    nearest-source witness must be live in every live lane, so the
    bound uses the min while the scan range uses the max.
    Returns (out (..., dlen, W), ptr int32 same shape).
    """
    batch_shape = src.shape[:-2]
    h, w = src.shape[-2], src.shape[-1]
    bsz = int(np.prod(batch_shape)) if batch_shape else 1
    src3 = src.reshape(bsz, h, w)
    full = lambda x: jnp.broadcast_to(jnp.asarray(x), batch_shape).reshape(bsz)
    if nvalid is None:
        nvalid = h
    has_aux = aux is not None
    aux3 = aux.reshape(bsz, h, w) if has_aux else src3[..., :0, :0]
    out, ptr = _dt1d_sublane_call(
        src3, full(a), full(b), full(shift), full(nvalid), aux3, dlen,
        step, interpret, has_aux, window,
        None if nvalid_min is None else full(nvalid_min),
    )
    return (
        out.reshape(*batch_shape, dlen, w),
        ptr.reshape(*batch_shape, dlen, w),
    )


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


def _use_window() -> bool:
    """Opt-in (PBD_DT_WINDOW=1): the adaptive-window kernel is exact and
    its early exit fires (verified), but on v5e the dynamic lane rotates
    it needs (Mosaic requires 128-aligned dynamic lane starts, so every
    displacement costs an extra-chunk load + pltpu.roll) plus the
    serialized while-loop made it ~9x slower than the chunked kernel on
    the person26 shapes (tools/dt_window_microbench.py). Kept as an
    option for hardware where dynamic lane shifts are cheap."""
    import os

    return os.environ.get("PBD_DT_WINDOW", "0") == "1"


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
    out_valid=None,
    cond_tail: bool = False,
):
    """Batched 1-D DT along the last axis via the Pallas kernel.

    src: (..., N); a, b, shift broadcastable to src.shape[:-1].
    nvalid (optional, broadcastable to batch): per-row count of valid
    source entries — everything beyond must be -inf; the kernel skips
    whole source chunks past the tile's max (exactness preserved).
    aux (optional, same shape as src, int32 < 2^12): per-source values
    carried through the max; the pointer output becomes packed
    (aux[argmax] << 12) | argmax — the fused Iy composition.
    out_valid (optional, static NumPy, broadcastable to batch): per-row
    count of output lanes that must be exact. Lanes beyond it return
    (NEG, 0) instead of their true values — callers pass the consumer's
    valid extent so the adaptive window kernel can stop early.
    Returns (out (..., dlen) f32, ptr (..., dlen) int32).
    """
    if tb is None:
        tb = _default_tb()
    batch_shape = src.shape[:-1]
    n = src.shape[-1]
    if nvalid is None:
        nvalid = n

    # NOTE a lane-remainder split (dlen=166 -> full-width 128-lane call
    # + row-packed 38-lane call, concatenated) was measured and
    # REJECTED: 5.9 vs 3.7 ms on the big x-pass shape — the packed
    # remainder call's per-sample select overhead plus slab repacking
    # outweighs the ~25% lane-sample saving (git history, r2).
    bsz = int(np.prod(batch_shape)) if batch_shape else 1
    src2 = src.reshape(bsz, n)
    full = lambda x: jnp.broadcast_to(jnp.asarray(x), batch_shape).reshape(bsz)
    has_aux = aux is not None
    aux2 = aux.reshape(bsz, n) if has_aux else src2[..., :0]

    if (
        step == 1
        and not differentiable
        and _choose_pack(dlen) == 1
        and _use_window()
    ):
        try:
            sh_np = np.asarray(shift)
        except Exception:
            sh_np = None  # traced shift: fall back to the chunked kernel
        if sh_np is not None and np.all(sh_np == np.round(sh_np)):
            sh_full = np.broadcast_to(
                sh_np.astype(np.int64), batch_shape
            ).reshape(bsz)
            ov = None
            if out_valid is not None:
                ov = np.broadcast_to(
                    np.asarray(out_valid, np.int32), batch_shape
                ).reshape(bsz)
            out, ptr = _dt1d_pallas_window(
                src2, full(a), full(b), sh_full, ov, aux2, dlen, tb,
                interpret, has_aux,
            )
            return (
                out.reshape(*batch_shape, dlen),
                ptr.reshape(*batch_shape, dlen),
            )

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
            dlen, step, tb, interpret, has_aux, cond_tail,
        )
    return out.reshape(*batch_shape, dlen), ptr.reshape(*batch_shape, dlen)
