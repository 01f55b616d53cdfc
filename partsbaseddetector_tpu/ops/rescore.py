"""fp32 re-scoring of backtracked placements (hybrid-precision serving).

The bf16 fast profile runs the whole pipeline (HOG, conv, distance
transforms, tree DP) in bfloat16 — ~2x less HBM traffic through the
DT wall — but bf16's 8-bit mantissa flips near-tie placements and
rounds box coordinates. This module restores exactness where it is
cheap: given the top-k candidates' *placements* (level + per-part grid
coords + mixtures from the backtrack pointer walk), it recomputes each
candidate's full detection score in float32

    score = resp_root + root_bias
          + sum_child [ resp_child + bias[l_par, k] - defcost(dx, dy) ]

directly from fp32 HOG features (one patch gather + dot per part —
thousands of dot products vs the full pipeline's billions), and
rebuilds the part boxes in fp32. Candidates are then re-sorted by the
fp32 score. This is the score-reconstruction identity the reference
training code asserts (matlab/detection/detect.m:141-146: the
extracted feature must reproduce the DP score); here it runs on device
as a serving stage.

Semantics pinned by tests: defcost follows shiftdt.cc:65-78 (negated
positive costs, output grid q = shift + i*step — see
ops/reference.py::shift_dt_2d); responses are the zero-padded-bank
valid correlation of ops/conv.py; biases/root bias follow
detect_fast.m:118-141/46-48.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import PackedModel
from ..ops.pyramid import PyramidPlan

NEG_INF = -jnp.inf


class RescoreTables(NamedTuple):
    """Static per-model tables, components stacked/padded to a common
    (P_max, M_max) so one gather serves every candidate regardless of
    its component. Padded slots hold finite benign values (0 biases,
    zero def weights, filter 0): padded *parts* are killed by partmask,
    padded *mixtures* are unreachable from valid candidates (the DP
    never selects a masked mixture — its -inf bias cannot win a max).
    """

    parent: np.ndarray  # (NC, Pm) int32
    partmask: np.ndarray  # (NC, Pm) float32 1.0 for real parts
    filterid: np.ndarray  # (NC, Pm, Mm) int32
    defw: np.ndarray  # (NC, Pm, Mm, 4) float32 positive costs
    shift_x: np.ndarray  # (NC, Pm, Mm) float32
    shift_y: np.ndarray  # (NC, Pm, Mm) float32
    step: np.ndarray  # (NC, Pm) float32
    bias: np.ndarray  # (NC, Pm, Mm, Mm) float32 [l_parent, k_child]
    root_bias: np.ndarray  # (NC, Mm) float32
    fsize: np.ndarray  # (NC, Pm, Mm, 2) float32 true (fh, fw) in cells
    ds: np.ndarray  # (NC, Pm) int32 accumulated octave offsets
    # pyramid-plan derived
    bsc_flat: np.ndarray  # (sum S_b,) float32 box scales, bucket-major
    soff: np.ndarray  # (NB,) int32 bucket offsets into bsc_flat
    bpo: int  # buckets per octave


def build_rescore_tables(
    packed: PackedModel, plan: PyramidPlan, buckets_per_octave: int = 1
) -> RescoreTables:
    comps = packed.components
    nc = len(comps)
    pm = max(c.nparts for c in comps)
    mm = max(c.maxmix for c in comps)

    parent = np.zeros((nc, pm), np.int32)
    partmask = np.zeros((nc, pm), np.float32)
    filterid = np.zeros((nc, pm, mm), np.int32)
    defw = np.zeros((nc, pm, mm, 4), np.float32)
    shift_x = np.zeros((nc, pm, mm), np.float32)
    shift_y = np.zeros((nc, pm, mm), np.float32)
    step = np.ones((nc, pm), np.float32)
    bias = np.zeros((nc, pm, mm, mm), np.float32)
    root_bias = np.zeros((nc, mm), np.float32)
    fsize = np.ones((nc, pm, mm, 2), np.float32)
    ds = np.zeros((nc, pm), np.int32)
    for c, comp in enumerate(comps):
        p, m = comp.nparts, comp.maxmix
        parent[c, :p] = comp.parentid
        partmask[c, :p] = 1.0
        filterid[c, :p, :m] = comp.filterid
        defw[c, :p, :m] = comp.defw
        shift_x[c, :p, :m] = comp.shift_x
        shift_y[c, :p, :m] = comp.shift_y
        step[c, :p] = comp.step
        b = np.where(np.isfinite(comp.bias), comp.bias, 0.0)
        bias[c, :p, :m, :m] = b
        rb = np.where(np.isfinite(comp.root_bias), comp.root_bias, 0.0)
        root_bias[c, :m] = rb
        fsize[c, :p, :m] = comp.fsize
        if comp.ds_total is not None:
            ds[c, :p] = comp.ds_total

    s_l = [len(b.scale_indices) for b in plan.buckets]
    soff = np.concatenate([[0], np.cumsum(s_l)[:-1]]).astype(np.int32)
    bsc_flat = np.asarray(
        [
            plan.scales[s].box_scale
            for b in plan.buckets
            for s in b.scale_indices
        ],
        np.float32,
    )
    return RescoreTables(
        parent=parent,
        partmask=partmask,
        filterid=filterid,
        defw=defw,
        shift_x=shift_x,
        shift_y=shift_y,
        step=step,
        bias=bias,
        root_bias=root_bias,
        fsize=fsize,
        ds=ds,
        bsc_flat=bsc_flat,
        soff=soff,
        bpo=int(buckets_per_octave),
    )


def _geometry_terms(
    tables: RescoreTables,
    cidx: jax.Array,  # (K,) int32
    bid: jax.Array,  # (K,)
    si: jax.Array,  # (K,)
    xs: jax.Array,  # (K, Pm)
    ys: jax.Array,
    ms: jax.Array,
    box_off_x: int,
    box_off_y: int,
):
    """Shared fp32 geometry of a placement: per-child deformation +
    pairwise-bias score terms, the root bias, part boxes, and the
    part/mixture gather metadata both appearance paths need.

    Returns (geom (K, Pm) f32 = bias - defcost for children / 0 for the
    root slot, rootb (K,), boxes (K, Pm, 4), pmask (K, Pm), fid (K, Pm),
    bb (K, Pm) per-part bucket index, prng (1, Pm))."""
    f32 = jnp.float32
    _, pm = xs.shape
    t = lambda a: jnp.asarray(a)
    par = t(tables.parent)[cidx]  # (K, Pm)
    pmask = t(tables.partmask)[cidx]  # (K, Pm) f32
    fid = jnp.take_along_axis(
        t(tables.filterid)[cidx], ms[..., None], axis=2
    )[..., 0]  # (K, Pm)
    ds_p = t(tables.ds)[cidx]  # (K, Pm) int32
    prng = jnp.arange(pm, dtype=jnp.int32)[None, :]  # (1, Pm)

    # deformation + pairwise bias terms (children only)
    pxs = jnp.take_along_axis(xs, par, axis=1).astype(f32)
    pys = jnp.take_along_axis(ys, par, axis=1).astype(f32)
    pms = jnp.take_along_axis(ms, par, axis=1)  # parent mixture l
    shx = jnp.take_along_axis(
        t(tables.shift_x)[cidx], ms[..., None], axis=2
    )[..., 0]
    shy = jnp.take_along_axis(
        t(tables.shift_y)[cidx], ms[..., None], axis=2
    )[..., 0]
    stp = t(tables.step)[cidx]  # (K, Pm) f32
    dx = shx + pxs * stp - xs.astype(f32)
    dy = shy + pys * stp - ys.astype(f32)
    dw = jnp.take_along_axis(
        t(tables.defw)[cidx],
        ms[..., None, None],
        axis=2,
    )[:, :, 0]  # (K, Pm, 4)
    defcost = (
        dw[..., 0] * dx * dx
        + dw[..., 1] * dx
        + dw[..., 2] * dy * dy
        + dw[..., 3] * dy
    )
    bias_pk = jnp.take_along_axis(
        jnp.take_along_axis(
            t(tables.bias)[cidx], pms[..., None, None], axis=2
        )[:, :, 0],
        ms[..., None],
        axis=2,
    )[..., 0]  # (K, Pm) = bias[c, p, l_parent, k_child]
    rootb = jnp.take_along_axis(
        t(tables.root_bias)[cidx], ms[:, :1], axis=1
    )[:, 0]  # (K,)
    geom = jnp.where(prng == 0, 0.0, bias_pk - defcost)

    # fp32 part boxes (detect_fast.m:170-175 geometry)
    root_scale = t(tables.bsc_flat)[t(tables.soff)[bid] + si]  # (K,)
    scale = root_scale[:, None] / jnp.exp2(ds_p.astype(f32))
    fsz = jnp.take_along_axis(
        t(tables.fsize)[cidx], ms[..., None, None], axis=2
    )[:, :, 0]  # (K, Pm, 2)
    x1 = (xs.astype(f32) + box_off_x) * scale
    y1 = (ys.astype(f32) + box_off_y) * scale
    x2 = x1 + fsz[..., 1] * scale - 1
    y2 = y1 + fsz[..., 0] * scale - 1
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)  # (K, Pm, 4)
    # padded parts replicate the root box (matches detector._build_fn)
    boxes = jnp.where((pmask > 0)[..., None], boxes, boxes[:, :1])

    # per-part bucket: ds octaves finer than the root's bucket
    bb = ds_p * tables.bpo  # subtracted from bid by the caller
    return geom, rootb, boxes, pmask, fid, bb, prng


def rescore_placements(
    feats32: List[jax.Array],
    filters32: jax.Array,
    tables: RescoreTables,
    comps: jax.Array,  # (K,) int32 component per candidate
    bid: jax.Array,  # (K,) int32 root bucket per candidate
    si: jax.Array,  # (K,) int32 within-bucket scale
    xs: jax.Array,  # (K, Pm) int32 grid coords (part's own grid)
    ys: jax.Array,  # (K, Pm) int32
    ms: jax.Array,  # (K, Pm) int32 mixtures
    box_off_x: int,
    box_off_y: int,
) -> Tuple[jax.Array, jax.Array]:
    """Recompute detection scores and part boxes in fp32 from FEATURES —
    the literal w . phi(placement) identity (detect.m:141-146): one
    patch gather + dot per part.

    This is the semantic reference formulation (and what training-side
    feature extraction means); serving uses rescore_from_responses,
    which gathers one precomputed fp32 response scalar per part instead
    of a (bh, bw, C) patch — the 7.7M-element patch gather measured
    ~40 ms/img on v5e (tools/rescore_gather_probe.py: TPU gathers do
    not coalesce the contiguous patch rows), vs microseconds for the
    scalar gather.

    feats32: per-bucket (S_b, H_b, W_b, C) fp32 HOG stacks (the same
    plan the bf16 pipeline used). filters32: (F, bh, bw, C) fp32
    zero-padded bank. Returns (scores (K,) f32, boxes (K, Pm, 4) f32).
    Padded candidates produce finite garbage — callers mask by their
    validity (top_k padding) before use.
    """
    k_tot, pm = xs.shape
    f, bh, bw, ch = filters32.shape
    nb = len(feats32)

    # flat fp32 feature buffer + static per-bucket geometry
    flat = jnp.concatenate([ft.reshape(-1) for ft in feats32])
    sizes = np.asarray([int(np.prod(ft.shape)) for ft in feats32], np.int64)
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    h_l = np.asarray([ft.shape[1] for ft in feats32], np.int32)
    w_l = np.asarray([ft.shape[2] for ft in feats32], np.int32)
    assert off[-1] + sizes[-1] < 2**31 - 1, "flat feature index fits int32"

    cidx = comps.astype(jnp.int32)
    geom, rootb, boxes, pmask, fid, ds_b, prng = _geometry_terms(
        tables, cidx, bid, si, xs, ys, ms, box_off_x, box_off_y
    )
    t = lambda a: jnp.asarray(a)
    bb = jnp.clip(bid[:, None] - ds_b, 0, nb - 1)  # (K, Pm)
    hb = t(h_l)[bb]
    wb = t(w_l)[bb]
    base = (
        t(off.astype(np.int32))[bb]
        + ((si[:, None] * hb + ys) * wb + xs) * ch
    )  # (K, Pm) int32

    # patch gather: (K, Pm, bh, bw, C) from the flat buffer
    iy = jnp.arange(bh, dtype=jnp.int32)[None, None, :, None, None]
    ix = jnp.arange(bw, dtype=jnp.int32)[None, None, None, :, None]
    ic = jnp.arange(ch, dtype=jnp.int32)[None, None, None, None, :]
    idx = (
        base[:, :, None, None, None]
        + (iy * wb[:, :, None, None, None] + ix) * ch
        + ic
    )
    patches = jnp.take(flat, idx, mode="clip")
    filtsel = filters32[fid]  # (K, Pm, bh, bw, C)
    app = jnp.einsum(
        "kpijc,kpijc->kp",
        patches,
        filtsel,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, Pm) f32

    scores = ((app + geom) * pmask).sum(axis=1) + rootb
    return scores, boxes


def rescore_from_responses(
    resps32: List[jax.Array],
    tables: RescoreTables,
    comps: jax.Array,  # (K,) int32 component per candidate
    bid: jax.Array,  # (K,) int32 root bucket per candidate
    si: jax.Array,  # (K,) int32 within-bucket scale
    xs: jax.Array,  # (K, Pm) int32 grid coords (part's own grid)
    ys: jax.Array,  # (K, Pm) int32
    ms: jax.Array,  # (K, Pm) int32 mixtures
    box_off_x: int,
    box_off_y: int,
) -> Tuple[jax.Array, jax.Array]:
    """Recompute detection scores and part boxes in fp32 from the
    pipeline's own fp32 filter RESPONSES (the hybrid serving path).

    resps32: per-bucket (S_b, Hr, Wr, F) fp32 response stacks — the
    raw (unmasked) conv outputs root_scores collected. The appearance
    term of part p is exactly resp32[bucket][si, y, x, filterid], so
    the whole re-score is K*Pm scalar gathers + fp32 geometry — the
    score-reconstruction identity of detect.m:141-146 evaluated from
    responses instead of features. Requires the conv stage to have run
    in fp32 (root_scores conv_dtype=float32): the reconstruction then
    EQUALS the f32 pipeline's score for the same placement bit-for-bit
    up to sum association.

    Returns (scores (K,) f32, boxes (K, Pm, 4) f32). Padded candidates
    produce finite garbage — callers mask by validity before use.
    """
    nb = len(resps32)
    nf = resps32[0].shape[-1]

    flat = jnp.concatenate(
        [r.astype(jnp.float32).reshape(-1) for r in resps32]
    )
    sizes = np.asarray([int(np.prod(r.shape)) for r in resps32], np.int64)
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    h_l = np.asarray([r.shape[1] for r in resps32], np.int32)
    w_l = np.asarray([r.shape[2] for r in resps32], np.int32)
    assert off[-1] + sizes[-1] < 2**31 - 1, "flat response index fits int32"

    cidx = comps.astype(jnp.int32)
    geom, rootb, boxes, pmask, fid, ds_b, prng = _geometry_terms(
        tables, cidx, bid, si, xs, ys, ms, box_off_x, box_off_y
    )
    t = lambda a: jnp.asarray(a)
    bb = jnp.clip(bid[:, None] - ds_b, 0, nb - 1)  # (K, Pm)
    hb = t(h_l)[bb]
    wb = t(w_l)[bb]
    idx = (
        t(off.astype(np.int32))[bb]
        + ((si[:, None] * hb + ys) * wb + xs) * nf
        + fid
    )  # (K, Pm) int32
    app = jnp.take(flat, idx, mode="clip")  # (K, Pm) scalar gather

    scores = ((app + geom) * pmask).sum(axis=1) + rootb
    return scores, boxes
