"""Generalized quadratic distance transforms as batched max-plus passes.

The reference computes these with a sequential lower-envelope scan per
row (include/DistanceTransform.hpp:152-182, matlab/mex/shiftdt.cc:17-51).
That algorithm is O(N) but inherently serial and branchy — the worst
possible shape for a TPU. The TPU-native formulation evaluates the
separable transform directly:

    out[..., qy, qx] = max_{vy, vx}  fy(qy - vy) + fx(qx - vx) + src[..., vy, vx]

as two batched (dlen, N) broadcast-and-reduce passes on the VPU. That is
O(N^2) per row instead of O(N), but every output element is independent,
so the whole (scales x parts x mixtures x rows) batch becomes one fused
elementwise+reduce kernel with zero control flow; for feature-map sized
N the arithmetic is far cheaper than the serialization it removes.

Argmax parity: jnp.argmax takes the *first* maximum, which matches the
envelope algorithm's preference for the smaller source index at
intersection ties (the `while (z[k+1] < q)` strict comparison in
shiftdt.cc:42-43). Property tests verify exact score and argmax equality
against ops/reference.dt1d_envelope.

Conventions:
  - Deformation weights are the model's positive costs
    [wx2, wx1, wy2, wy1]; they are negated here, exactly as
    DynamicProgram.cpp:126-127 and shiftdt.cc:70-73 do.
  - The output grid is q = shift + i*step (0-based), the "shiftdt
    superset" that also covers the C++ anchor-offset grid (step=1,
    dlen=input length).
  - Pointer composition follows the MATLAB/`shiftdt` authority: y-pass
    first, x-pass second, Iy = tmpIy gathered at Ix
    (shiftdt.cc:95-108). SURVEY.md §7 flags the C++ composition order
    as defective; we implement the correct one.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _use_pallas() -> bool:
    """Pick the DT backend: the Pallas kernel on TPU (one fused
    VMEM-resident pass), the XLA broadcast-reduce elsewhere. Override
    with PBD_DT_IMPL=xla|pallas|interpret (interpret runs the Pallas
    kernel in the interpreter — CPU-testable kernel semantics)."""
    impl = os.environ.get("PBD_DT_IMPL", "auto")
    if impl in ("pallas", "interpret"):
        return True
    if impl == "xla":
        return False
    return jax.default_backend() not in ("cpu",)


def _interpret() -> bool:
    return os.environ.get("PBD_DT_IMPL") == "interpret"


def _use_sublane_xpass(dlen_x: int, dlen_y: int, n: int) -> bool:
    """Pick the x-pass kernel by a static per-shape cost model.

    The x pass scans along W. The lane-chunked kernel does it in place
    (outputs on lanes) at ~6(+pack extracts) full-tile VPU ops per
    source sample on a dlenp-lane-padded tile; the sublane kernel needs
    the map transposed (W on sublanes) but runs at ~4.5 ops/sample —
    the penalty polynomial lives on a (ts, 1) column instead of the
    full tile — with only 128-lane padding on dlen_y. Both are exact
    (same op order, same tie rules), so the choice is pure cost:

      lane:    (dlen_y / pack) * dlenp * n * (6 + (pack-1))
      sublane: ceil(dlen_x/ts)*ts * round_up(dlen_y, 128) * n * 4.0

    Constants calibrated on v5e (tools/dt_xpass_sublane_microbench.py:
    big 160x126x166 lane 4.00 ms vs sublane 2.60; mid 106x91x119 1.84
    vs 1.66; small 80x47x61 1.17 vs 1.20 — model picks the measured
    winner on all three). Override with PBD_DT_XPASS=sublane|chunked.
    """
    mode = os.environ.get("PBD_DT_XPASS", "auto")
    if mode == "sublane":
        return True
    if mode == "chunked":
        return False
    from .pallas_dt import LANE, _choose_pack, _round_up, _sublane_ts

    pack = _choose_pack(dlen_x)
    dlenp = LANE if pack > 1 else _round_up(max(dlen_x, LANE), LANE)
    cost_lane = (dlen_y / pack) * dlenp * n * (6.0 + (pack - 1))
    ts = _sublane_ts()
    outp = -(-dlen_x // ts) * ts
    cost_sub = outp * _round_up(dlen_y, LANE) * n * 4.0
    return cost_lane > cost_sub


def _subwin() -> bool:
    """Exact displacement-window pruning in the sublane kernels
    (PBD_DT_SUBWIN=1|0): sources provably unable to win — beyond the
    radius where the quadratic deformation cost exceeds the map's live
    value range — are skipped chunk-wise. Dynamic 8-aligned sublane
    starts make this cheap, unlike the lane-axis window (9x slower,
    see _use_window). Exact incl. ties; costs one max/min reduction
    per map."""
    return os.environ.get("PBD_DT_SUBWIN", "1") == "1"


def _use_scale_pack() -> bool:
    """Pack the scale axis of a (..., S, M, H, W) DT batch along LANES:
    every scale in a pyramid bucket shares the part's deformation
    weights and anchor shift, so S maps of width W become one map of
    width S*W. Lane tiles are 128 wide — the deep-pyramid grids are
    13-66 cells and even the finest person26-VGA grid is ~160, so
    unpacked maps waste 38-86% of every VPU lane tile; packing cuts the
    DT's dominant cost by that factor. Exact: lanes are independent in
    the sublane-scan kernel, and the window bound gets the per-map MIN
    live height across packed scales so the nearest-source witness
    stays valid (see dt1d_sublane). Override with PBD_DT_PACK=0."""
    return os.environ.get("PBD_DT_PACK", "1") == "1"


def _use_sublane_ypass(w: int) -> bool:
    """The sublane-scan y-pass kernel runs the DT in the natural
    (..., H, W) layout (W on lanes) — no transposes, fewer VPU ops per
    source sample. Worth it when lane utilization is decent; narrow
    deep-pyramid buckets (W < 64) stay on the row-packed lane-chunked
    kernel, whose packing fights exactly that waste. Override with
    PBD_DT_YPASS=sublane|chunked."""
    mode = os.environ.get("PBD_DT_YPASS", "auto")
    if mode == "sublane":
        return True
    if mode == "chunked":
        return False
    return w >= 64


def _dt1d(
    src: jax.Array,
    a: jax.Array,
    b: jax.Array,
    shift: jax.Array,
    dlen: int,
    step: int,
    nvalid=None,
    use_pallas=None,
    differentiable: bool = False,
    out_valid=None,
    cond_tail: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """1-D max-plus transform along the last axis.

    src: (..., N); a, b, shift broadcastable to src.shape[:-1]; nvalid
    (optional) is a per-row valid source count (a pure perf hint — the
    region beyond it must already be -inf). out_valid: see
    shift_distance_transform_2d_packed (Pallas window path only).
    Returns (out (..., dlen), argmax int32 (..., dlen)).
    """
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas:
        from .pallas_dt import dt1d_pallas

        return dt1d_pallas(
            src, a, b, shift, dlen, step, nvalid=nvalid,
            interpret=_interpret(), differentiable=differentiable,
            out_valid=out_valid, cond_tail=cond_tail,
        )
    n = src.shape[-1]
    dtype = src.dtype
    v = jnp.arange(n, dtype=dtype)
    i = jnp.arange(dlen, dtype=dtype)
    q = shift[..., None].astype(dtype) + step * i  # (..., dlen)
    d = q[..., :, None] - v  # (..., dlen, N)
    a_ = a[..., None, None].astype(dtype)
    b_ = b[..., None, None].astype(dtype)
    vals = (a_ * d + b_) * d + src[..., None, :]
    out = jnp.max(vals, axis=-1)
    ptr = jnp.argmax(vals, axis=-1).astype(jnp.int32)
    return out, ptr


def _scale_packed_dt2d(
    score: jax.Array,
    ax, bx, ay, by,
    shift_x, shift_y,
    dlen_x: int,
    dlen_y: int,
    step: int,
    valid_h,
    valid_w,
    pack_axis: int,
) -> tuple[jax.Array, jax.Array]:
    """2-D shifted DT with the `pack_axis` batch dim packed along lanes
    for BOTH 1-D passes (see _use_scale_pack). Requires ax/bx/ay/by and
    shift_x/shift_y constant along pack_axis (the caller guarantees it:
    scales within a bucket share the part's deformation parameters).
    Exactness: each lane is an independent 1-D DT; the window prune
    stays exact because its scan range uses the packed map's MAX live
    height while the witness bound uses the MIN across live packed
    segments."""
    from .pallas_dt import dt1d_sublane

    bshape = score.shape[:-2]
    nb = len(bshape)
    pack_axis = pack_axis % nb
    s_pack = bshape[pack_axis]
    h, w = score.shape[-2:]
    subwin = _subwin()

    def param(v):
        # (..constant along pack_axis..) -> packed batch shape
        v = jnp.broadcast_to(jnp.asarray(v), bshape)
        return jnp.moveaxis(v, pack_axis, -1)[..., 0]

    def counts(v):
        """Per-lane or per-map valid counts -> (nv_max, nv_min) over
        the packed segments (min restricted to live segments)."""
        if v is None:
            return None, None
        v = np.asarray(v) if isinstance(v, np.ndarray) else jnp.asarray(v)
        xp = np if isinstance(v, np.ndarray) else jnp
        if v.ndim == nb + 1:
            v = v.max(axis=-1)  # per-map
        v = xp.broadcast_to(v, bshape)
        v = xp.moveaxis(v, pack_axis, -1)  # (..., S)
        nv_max = v.max(axis=-1)
        live = xp.where(v > 0, v, np.iinfo(np.int32).max)
        nv_min = xp.minimum(live.min(axis=-1), nv_max)
        return nv_max, nv_min

    def pack(x):
        # (..., S at pack_axis ..., R, C) -> (..., R, S*C): the packed
        # segments sit side by side along lanes
        x = jnp.moveaxis(x, pack_axis, -2)  # (..., R, S, C)
        return x.reshape(*x.shape[:-3], x.shape[-3], s_pack * x.shape[-1])

    def unpack(x):
        # (..., R, S*C) -> original batch layout (..., S, ..., R, C)
        x = x.reshape(*x.shape[:-1], s_pack, x.shape[-1] // s_pack)
        return jnp.moveaxis(x, -2, pack_axis)

    # y pass: H on sublanes, S*W on lanes
    nvh, nvh_min = counts(valid_h)
    tmp_p, iy_p = dt1d_sublane(
        pack(score),
        param(ay), param(by), param(shift_y),
        dlen_y, step,
        nvalid=nvh, window=subwin, interpret=_interpret(),
        nvalid_min=nvh_min,
    )  # (..., dlen_y, S*W)

    # x pass: W on sublanes, S*dlen_y on lanes, fused Iy-as-aux
    swap = lambda x: jnp.swapaxes(x, -1, -2)
    tmp_t = pack(swap(unpack(tmp_p)))  # (..., W, S*dlen_y)
    iy_t = pack(swap(unpack(iy_p)))
    nvw, nvw_min = counts(valid_w)
    msg_t, ptr_t = dt1d_sublane(
        tmp_t,
        param(ax), param(bx), param(shift_x),
        dlen_x, step,
        nvalid=nvw, aux=iy_t, window=subwin, interpret=_interpret(),
        nvalid_min=nvw_min,
    )  # (..., dlen_x, S*dlen_y)
    return swap(unpack(msg_t)), swap(unpack(ptr_t))


def shift_distance_transform_2d_packed(
    score: jax.Array,
    wdef: jax.Array,
    shift_x: jax.Array,
    shift_y: jax.Array,
    dlen_x: int,
    dlen_y: int,
    step: int = 1,
    valid_h=None,
    valid_w=None,
    differentiable: bool = False,
    out_valid_h=None,
    out_valid_w=None,
    dead_heavy: bool = False,
    pack_axis=None,
) -> tuple[jax.Array, jax.Array]:
    """2-D shifted/subsampled generalized DT with packed pointers.

    score: (..., H, W) child score maps (use -inf padding for invalid
        regions; padded sources can never win the max).
    wdef: (..., 4) positive deformation costs [wx2, wx1, wy2, wy1].
    shift_x / shift_y: broadcastable to score.shape[:-2], 0-based output
        grid origins (MATLAB startx/starty minus 1).
    valid_h / valid_w: optional per-batch valid extents (perf hint).
    out_valid_h / out_valid_w: optional static consumer valid extents
    (the parent grid's), broadcastable per-row; output positions beyond
    them are don't-care — the adaptive window kernel returns (NEG, 0)
    there and can stop scanning early. Downstream -inf masking makes
    those positions semantically dead, so results are unchanged.
    differentiable=True attaches the max-subgradient custom VJP to the
    Pallas kernel (training differentiates straight through it).
    pack_axis (optional): a batch axis along which wdef/shift_x/shift_y
    are constant (the scale axis of a bucket) — maps along it are
    packed side by side on VPU lanes for both passes (_use_scale_pack).
    Returns (msg, ptr) with ptr = (Iy << 12) | Ix int32 — on the Pallas
    path the Iy = tmpIy[Ix] composition (shiftdt.cc:102-108) is fused
    into the x-pass kernel, avoiding an 8M-element gather.
    """
    use_pallas = _use_pallas()
    ax, bx = -wdef[..., 0], -wdef[..., 1]
    ay, by = -wdef[..., 2], -wdef[..., 3]

    if (
        pack_axis is not None
        and use_pallas
        and not differentiable
        and not dead_heavy
        and _use_scale_pack()
        and score.ndim >= 4
        and score.shape[pack_axis % (score.ndim - 2)] > 1
    ):
        return _scale_packed_dt2d(
            score, ax, bx, ay, by, shift_x, shift_y,
            dlen_x, dlen_y, step, valid_h, valid_w, pack_axis,
        )

    def _expand(v, batch_ndim):
        """Accept per-batch scalars (appended axis) or fully-shaped
        per-row valid counts (rows with 0 are skipped outright)."""
        if v is None:
            return None
        v = jnp.asarray(v)
        return v if v.ndim == batch_ndim else v[..., None]

    def _expand_np(v, batch_ndim):
        if v is None:
            return None
        v = np.asarray(v)
        return v if v.ndim == batch_ndim else v[..., None]

    # y pass over columns
    if (
        use_pallas
        and not differentiable
        and not _interpret()
        and _use_sublane_ypass(score.shape[-1])
    ):
        # sublane-scan kernel: DT along axis -2 in place — no transposes
        from .pallas_dt import dt1d_sublane

        if valid_h is None:
            nv_map = None
        else:
            vh = valid_h
            # per-lane counts (..., W) -> per-map max; scalars pass through
            if hasattr(vh, "ndim") and np.ndim(vh) == score.ndim - 1:
                vh = (
                    np.max(vh, axis=-1)
                    if isinstance(vh, np.ndarray)
                    else jnp.max(jnp.asarray(vh), axis=-1)
                )
            nv_map = vh
        tmp, tmp_iy = dt1d_sublane(
            score, ay, by, shift_y, dlen_y, step, nvalid=nv_map,
            window=_subwin(),
        )
    else:
        # transpose layout: (..., H, W) -> (..., W, H) -> dt -> transpose back
        src_t = jnp.swapaxes(score, -1, -2)
        tmp, tmp_iy = _dt1d(
            src_t,
            ay[..., None],
            by[..., None],
            jnp.asarray(shift_y)[..., None],
            dlen_y,
            step,
            nvalid=_expand(valid_h, src_t.ndim - 1),
            use_pallas=use_pallas,
            differentiable=differentiable,
            out_valid=_expand_np(out_valid_h, src_t.ndim - 1),
            cond_tail=dead_heavy,
        )
        tmp = jnp.swapaxes(tmp, -1, -2)  # (..., dlen_y, W)
        tmp_iy = jnp.swapaxes(tmp_iy, -1, -2)

    # x pass over rows of the intermediate, carrying tmp_iy as aux
    if (
        use_pallas
        and not differentiable
        and not dead_heavy
        and _use_sublane_xpass(dlen_x, dlen_y, tmp.shape[-1])
    ):
        # transposed sublane scan: W on sublanes, dlen_y on lanes; the
        # fused (Iy << 12) | Ix composition rides the aux stream
        from .pallas_dt import dt1d_sublane

        if valid_w is None:
            nv_map = None
        else:
            vw = valid_w
            if hasattr(vw, "ndim") and np.ndim(vw) == score.ndim - 1:
                vw = (
                    np.max(vw, axis=-1)
                    if isinstance(vw, np.ndarray)
                    else jnp.max(jnp.asarray(vw), axis=-1)
                )
            nv_map = vw
        msg_t, ptr_t = dt1d_sublane(
            jnp.swapaxes(tmp, -1, -2),
            ax,
            bx,
            shift_x,
            dlen_x,
            step,
            nvalid=nv_map,
            aux=jnp.swapaxes(tmp_iy, -1, -2),
            interpret=_interpret(),
            window=_subwin(),
        )
        return jnp.swapaxes(msg_t, -1, -2), jnp.swapaxes(ptr_t, -1, -2)

    sx = jnp.asarray(shift_x)[..., None]
    bxk = bx[..., None]
    axk = ax[..., None]
    nw = _expand(valid_w, tmp.ndim - 1)
    if use_pallas:
        from .pallas_dt import dt1d_pallas

        msg, ptr = dt1d_pallas(
            tmp, axk, bxk, sx, dlen_x, step, nvalid=nw, aux=tmp_iy,
            interpret=_interpret(), differentiable=differentiable,
            out_valid=_expand_np(out_valid_w, tmp.ndim - 1),
            cond_tail=dead_heavy,
        )
        return msg, ptr
    msg, ix = _dt1d(
        tmp, axk, bxk, sx, dlen_x, step, nvalid=nw, use_pallas=use_pallas,
        differentiable=differentiable,
    )
    iy = jnp.take_along_axis(tmp_iy, ix, axis=-1)
    return msg, (iy << 12) | ix


def shift_distance_transform_2d(
    score: jax.Array,
    wdef: jax.Array,
    shift_x: jax.Array,
    shift_y: jax.Array,
    dlen_x: int,
    dlen_y: int,
    step: int = 1,
    valid_h=None,
    valid_w=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """As shift_distance_transform_2d_packed but returning unpacked
    (msg, Ix, Iy) 0-based source coordinates."""
    msg, ptr = shift_distance_transform_2d_packed(
        score, wdef, shift_x, shift_y, dlen_x, dlen_y, step, valid_h, valid_w
    )
    return msg, ptr & 0xFFF, ptr >> 12


def distance_transform_2d(
    score: jax.Array,
    wdef: jax.Array,
    anchor_x: jax.Array,
    anchor_y: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Same-size anchored DT — the C++ detect() grid
    (src/DynamicProgram.cpp:124-128): output grid q = anchor + i, output
    size equals input size."""
    h, w = score.shape[-2], score.shape[-1]
    return shift_distance_transform_2d(
        score, wdef, anchor_x, anchor_y, dlen_x=w, dlen_y=h, step=1
    )
