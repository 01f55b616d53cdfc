"""Non-maxima suppression variants.

Three capabilities from the reference:
  1. part-aware greedy box NMS (matlab/detection/nms.m): per-part IoA
     overlap against the kept set, including the union covering box,
     capped at 1000 candidates — the NMS the MATLAB eval path uses;
  2. pixel-level block local-maxima NMS over a score map
     (src/nms.cpp:84-129, Neubeck & Van Gool; exported but unused by
     the reference pipeline — provided for API completeness);
  3. greedy paint NMS lives on types.Candidate.non_maxima_suppression
     (include/Candidate.hpp:277-304), the variant the C++ apps call.

(1) and (2) have both NumPy and jittable on-device forms; candidate
counts are static on device (masks, not shrinking lists).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Part-aware greedy box NMS (detection/nms.m)
# ---------------------------------------------------------------------------


def part_nms(
    boxes: np.ndarray,
    scores: np.ndarray,
    overlap: float = 0.5,
    max_candidates: int = 1000,
) -> np.ndarray:
    """Greedy part-aware NMS. boxes (N, P, 4), scores (N,).

    A candidate is suppressed if, for *any* part (or the union covering
    box), its intersection with a kept candidate's same part exceeds
    `overlap` of the kept part's area (intersection-over-kept-area, as
    nms.m:58-69 computes). Returns indices of kept candidates in
    descending score order.
    """
    n = boxes.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    order = np.argsort(-scores, kind="stable")
    if n > max_candidates:
        order = order[:max_candidates]
    b = boxes[order].astype(np.float64)
    # append the union covering box as an extra "part" (nms.m:37-48)
    union = np.concatenate(
        [
            b[:, :, 0].min(1, keepdims=True),
            b[:, :, 1].min(1, keepdims=True),
            b[:, :, 2].max(1, keepdims=True),
            b[:, :, 3].max(1, keepdims=True),
        ],
        axis=1,
    )[:, None, :]
    b = np.concatenate([b, union], axis=1)  # (N, P+1, 4)
    area = (b[:, :, 2] - b[:, :, 0] + 1) * (b[:, :, 3] - b[:, :, 1] + 1)

    keep: List[int] = []
    alive = np.ones(len(order), dtype=bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        xx1 = np.maximum(b[i, :, 0], b[:, :, 0])
        yy1 = np.maximum(b[i, :, 1], b[:, :, 1])
        xx2 = np.minimum(b[i, :, 2], b[:, :, 2])
        yy2 = np.minimum(b[i, :, 3], b[:, :, 3])
        w = np.clip(xx2 - xx1 + 1, 0, None)
        h = np.clip(yy2 - yy1 + 1, 0, None)
        o = (w * h) / area[i][None, :]  # IoA vs the *kept* candidate
        alive &= o.max(axis=1) <= overlap
        alive[i] = False
    return np.asarray(keep, dtype=np.int64)


def part_nms_device(
    boxes: jax.Array, scores: jax.Array, valid: jax.Array, overlap: float = 0.5
) -> jax.Array:
    """On-device part-aware NMS over a static candidate budget.

    boxes (N, P, 4) pre-sorted by descending score, valid (N,) bool.
    Returns a keep-mask (N,). Sequential greedy pass as lax.scan (the
    decision chain is a true data dependence); all geometry vectorized.
    """
    boxes = jnp.asarray(boxes)
    valid = jnp.asarray(valid)
    n, p, _ = boxes.shape
    union = jnp.stack(
        [
            boxes[:, :, 0].min(1),
            boxes[:, :, 1].min(1),
            boxes[:, :, 2].max(1),
            boxes[:, :, 3].max(1),
        ],
        axis=-1,
    )[:, None, :]
    b = jnp.concatenate([boxes, union], axis=1)  # (N, P+1, 4)
    area = (b[:, :, 2] - b[:, :, 0] + 1) * (b[:, :, 3] - b[:, :, 1] + 1)

    # pairwise IoA[i, j, part]: intersection(i, j) / area(i)
    xx1 = jnp.maximum(b[:, None, :, 0], b[None, :, :, 0])
    yy1 = jnp.maximum(b[:, None, :, 1], b[None, :, :, 1])
    xx2 = jnp.minimum(b[:, None, :, 2], b[None, :, :, 2])
    yy2 = jnp.minimum(b[:, None, :, 3], b[None, :, :, 3])
    w = jnp.clip(xx2 - xx1 + 1, 0, None)
    h = jnp.clip(yy2 - yy1 + 1, 0, None)
    ioa = (w * h) / area[:, None, :]
    suppresses = (ioa.max(-1) > overlap)  # (kept_i, candidate_j)

    def body(kept, i):
        # candidate i survives if valid and no kept earlier candidate
        # suppresses it
        killed = jnp.any(kept & suppresses[:, i])
        keep_i = valid[i] & ~killed
        kept = kept.at[i].set(keep_i)
        return kept, keep_i

    kept0 = jnp.zeros(n, dtype=bool)
    _, keep = jax.lax.scan(body, kept0, jnp.arange(n))
    return keep


# ---------------------------------------------------------------------------
# Pixel-level block local-maxima NMS (src/nms.cpp)
# ---------------------------------------------------------------------------


def pixel_nms(src: np.ndarray, sz: int, mask: np.ndarray | None = None) -> np.ndarray:
    """255-mask of strict local maxima of (2sz+1)^2 windows.

    Block-partition the map into (sz+1)-sized blocks, take each block's
    maximum, then verify it against its full (2sz+1)^2 neighborhood —
    the Neubeck & Van Gool ICPR'06 scheme the reference vendors. An
    optional mask restricts eligible maxima.
    """
    h, w = src.shape
    out = np.zeros((h, w), dtype=np.uint8)
    step = sz + 1
    neg = -np.inf
    s = src.astype(np.float64)
    if mask is not None:
        s = np.where(mask != 0, s, neg)
    for by in range(0, h, step):
        for bx in range(0, w, step):
            blk = s[by : by + step, bx : bx + step]
            if not np.isfinite(blk).any():
                continue
            iy, ix = np.unravel_index(np.argmax(blk), blk.shape)
            cy, cx = by + iy, bx + ix
            v = s[cy, cx]
            y1, y2 = max(cy - sz, 0), min(cy + sz + 1, h)
            x1, x2 = max(cx - sz, 0), min(cx + sz + 1, w)
            neigh = s[y1:y2, x1:x2].copy()
            neigh[cy - y1, cx - x1] = neg
            if v > neigh.max():
                out[cy, cx] = 255
    return out


def pixel_nms_device(src: jax.Array, sz: int) -> jax.Array:
    """Jittable local-maxima mask: src[y,x] is a maximum iff it strictly
    exceeds every other value in its (2sz+1)^2 window. Implemented as a
    max-pool (reduce_window) comparison — one fused pass, no blocks."""
    k = 2 * sz + 1
    neigh_max = jax.lax.reduce_window(
        src,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding=(((sz, sz), (sz, sz))),
    )
    # strict: the window max equals src AND occurs exactly once
    eq = (src == neigh_max).astype(jnp.int32)
    count = jax.lax.reduce_window(
        eq,
        0,
        jax.lax.add,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding=(((sz, sz), (sz, sz))),
    )
    return (src == neigh_max) & (count == 1)
