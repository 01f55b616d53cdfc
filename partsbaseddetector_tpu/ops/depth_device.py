"""Device-side depth-consistency filtering for the serving path.

The candidate depth filter (src/SearchSpacePruning.cpp:73-95: keep a
candidate when every connected part pair's median box depths differ by
less than ||anchor||*zfactor) ran host-side in rounds 1-2: after the
candidate readback, a second pass over the depth map computed 416 box
medians (~11 ms/frame native) with a readback dependency in the
middle of the stream loop. Here the medians AND the keep decision run
inside the jitted program — the part boxes are already on device after
backtracking — so the host applies a precomputed (max_det,) bool mask
and never touches the depth map.

Median semantics follow include/Math.hpp:62-72 (nth_element at n/2 —
the UPPER middle, no averaging — over finite values of the clipped
box; empty/all-invalid regions give 0.0 which passes the filter).
Boxes whose clipped sides fit the static sample budget (cap, default
48 px) are EXACT: every pixel is gathered once. Larger boxes gather a
strided cap x cap grid — an approximation documented and bounded by
tests (the host path in depth.py stays the exact reference
implementation and the default for detect() without a device filter).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def box_depth_medians(
    depth: jax.Array, boxes: jax.Array, cap: int = 48
) -> jax.Array:
    """Median depth per box, on device.

    depth: (H, W) float; boxes: (B, 4) [x1, y1, x2, y2] inclusive image
    coordinates (float, as backtrack emits). Returns (B,) medians in
    depth's dtype. Exact Math::median for boxes with clipped sides
    <= cap; strided-grid approximation beyond.
    """
    h, w = depth.shape
    # _clip_box semantics (depth.py): x1 = int(max(b0, 0)),
    # x2 = int(min(b2 + 1, w)) exclusive; int() truncation == floor on
    # the non-negative values that matter (negatives only arise for
    # empty boxes, which yield 0.0 either way)
    x1 = jnp.floor(jnp.maximum(boxes[:, 0], 0)).astype(jnp.int32)
    y1 = jnp.floor(jnp.maximum(boxes[:, 1], 0)).astype(jnp.int32)
    x2 = jnp.floor(jnp.minimum(boxes[:, 2] + 1, w)).astype(jnp.int32)
    y2 = jnp.floor(jnp.minimum(boxes[:, 3] + 1, h)).astype(jnp.int32)
    bw = x2 - x1  # may be <= 0 (empty)
    bh = y2 - y1

    i = jnp.arange(cap, dtype=jnp.int32)
    # unit stride (exact) when the side fits the budget; stride side/cap
    # otherwise: floor(i * max(side, cap) / cap) is i for side <= cap
    sx = jnp.maximum(bw, cap)[:, None]
    sy = jnp.maximum(bh, cap)[:, None]
    ix = jnp.clip(x1[:, None] + (i[None, :] * sx) // cap, 0, w - 1)
    iy = jnp.clip(y1[:, None] + (i[None, :] * sy) // cap, 0, h - 1)
    vx = i[None, :] < jnp.minimum(bw, cap)[:, None]  # (B, cap)
    vy = i[None, :] < jnp.minimum(bh, cap)[:, None]

    vals = depth[iy[:, :, None], ix[:, None, :]]  # (B, cap, cap)
    valid = vy[:, :, None] & vx[:, None, :] & jnp.isfinite(vals)
    vals = jnp.where(valid, vals, jnp.inf).reshape(vals.shape[0], -1)
    n = valid.reshape(valid.shape[0], -1).sum(axis=1)
    ordered = jnp.sort(vals, axis=1)
    med = jnp.take_along_axis(
        ordered, jnp.minimum(n // 2, cap * cap - 1)[:, None], axis=1
    )[:, 0]
    return jnp.where(n > 0, med, jnp.zeros_like(med))


def component_tables(packed) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-component (parentid, anchor-norm) tables padded to
    (C, P_max) for the device filter. Padded part slots get parent 0
    and +inf norm (their boxes replicate the root box, so their medians
    can never trip the threshold anyway)."""
    c_count = len(packed.components)
    p_max = packed.max_nparts
    par = np.zeros((c_count, p_max), dtype=np.int32)
    norms = np.full((c_count, p_max), np.inf, dtype=np.float32)
    for c, comp in enumerate(packed.components):
        p = comp.nparts
        par[c, :p] = np.asarray(comp.parentid[:p], dtype=np.int32)
        a = np.asarray(comp.anchor[1:p, 0, :2], dtype=np.float64)
        norms[c, 1:p] = np.linalg.norm(a, axis=1)
        norms[c, 0] = np.inf  # the root has no parent edge
    return par, norms


def depth_keep_mask(
    depth: jax.Array,
    boxes: jax.Array,  # (K, P, 4)
    comps: jax.Array,  # (K,) int32
    parent_tbl: np.ndarray,  # (C, P)
    norm_tbl: np.ndarray,  # (C, P)
    zfactor: float = 0.5,
    cap: int = 48,
) -> jax.Array:
    """(K,) bool: True where the candidate passes the depth-consistency
    filter (src/SearchSpacePruning.cpp:73-95 semantics: reject when any
    child/parent median pair with both medians > 0 differs by more than
    ||anchor(0)|| * zfactor)."""
    k, p, _ = boxes.shape
    meds = box_depth_medians(depth, boxes.reshape(k * p, 4), cap).reshape(k, p)
    par = jnp.asarray(parent_tbl)[comps]  # (K, P)
    norms = jnp.asarray(norm_tbl, meds.dtype)[comps]
    pmed = jnp.take_along_axis(meds, par, axis=1)
    bad = (meds > 0) & (pmed > 0) & (jnp.abs(meds - pmed) > norms * zfactor)
    bad = bad.at[:, 0].set(False)  # root row carries no edge
    return ~bad.any(axis=1)
