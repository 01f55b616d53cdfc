"""32-channel Felzenszwalb HOG as pure XLA tensor ops (no scatters).

The reference computes HOG with per-pixel scatter-adds into cell
histograms (matlab/mex/features.cc:111-141, src/HOGFeatures.cpp:251-266).
Scatters are hostile to TPUs. The key observation for the TPU-native
formulation: the trilinear bin weights depend only on the pixel's offset
within its sbin-block, so the scatter is exactly a *fixed 2*sbin tent
filter applied with stride sbin* to the (orientation-one-hot x magnitude)
map. That turns the histogram stage into one strided depthwise
convolution, and everything after it (block energy, 4-way normalization,
0.2 clamping, texture channels) is elementwise math and slicing.

Semantics pinned by ops/reference.py (golden tests):
  - gradients from the color channel with the strongest magnitude,
    first-channel-wins on ties (MATLAB RGB order is authoritative),
  - 18-way orientation snapping with the reference's interleaved
    (dot, -dot) strict-> first-max tie-breaking,
  - pixels indexed on the visible = round(dim/sbin)*sbin grid with
    reads clamped to dim-2,
  - output (bh-2, bw-2, 32): 18 contrast-sensitive + 9 insensitive +
    4 texture-energy + 1 zero occlusion channel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.rounding import cround

from . import reference

NORIENT = 18
FLEN = 32


@functools.lru_cache(maxsize=None)
def _tent_kernel(sbin: int) -> np.ndarray:
    """1-D trilinear scatter weights as a gather filter.

    For cell c, contributing pixels are y = c*sbin - pad + u for
    u in [0, 2*sbin) with pad = floor((sbin+1)/2); the trilinear weight
    is tent(t) with t = (u + 0.5 - pad)/sbin + 0.5 (t in (0, 2)),
    tent(t) = t for t < 1 else 2 - t. This reproduces the vx0/vx1
    interpolation of features.cc:111-119 exactly.
    """
    pad = (sbin + 1) // 2
    u = np.arange(2 * sbin, dtype=np.float64)
    t = (u + 0.5 - pad) / sbin + 0.5
    return np.where(t < 1.0, t, 2.0 - t)


@functools.lru_cache(maxsize=None)
def _hist_matrix(blocks: int, vlen: int, sbin: int) -> np.ndarray:
    """(blocks, vlen) strided tent-aggregation matrix: row c carries the
    2*sbin tent weights at pixel positions c*sbin - pad + u. Lets the
    histogram stage run as two MXU matmuls instead of a strided
    depthwise conv (same trick as ops/resize.py)."""
    pad = (sbin + 1) // 2
    k = _tent_kernel(sbin)
    m = np.zeros((blocks, vlen), dtype=np.float32)
    for c in range(blocks):
        for u in range(2 * sbin):
            y = c * sbin - pad + u
            if 0 <= y < vlen:
                m[c, y] = k[u]
    return m


def _orientation_units(dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    return (
        jnp.asarray(reference.HOG_UU, dtype=dtype),
        jnp.asarray(reference.HOG_VV, dtype=dtype),
    )


def hog_histogram(im: jax.Array, sbin: int) -> jax.Array:
    """Per-scale pixel stages of HOG: (H, W, 3) -> (bh, bw, 18) cell
    histogram. Identical math to the first half of hog_features; the
    orientation one-hot fuses into the strided tent matmuls, so the
    heavy pixel-grid work never materializes (tools/profile_hog.py:
    6.7 ms for all 46 person-VGA scales vs 24 ms materialized)."""
    h, w, _ = im.shape
    bh = cround(h / sbin)
    bw = cround(w / sbin)
    vh, vw = bh * sbin, bw * sbin
    dtype = im.dtype

    dy = im[2:, 1:-1, :] - im[:-2, 1:-1, :]
    dx = im[1:-1, 2:, :] - im[1:-1, :-2, :]
    ext_y = max(vh - h, 0)
    ext_x = max(vw - w, 0)
    pad_cfg = ((0, ext_y), (0, ext_x), (0, 0))
    dy = jnp.pad(dy, pad_cfg, mode="edge")[: vh - 2, : vw - 2]
    dx = jnp.pad(dx, pad_cfg, mode="edge")[: vh - 2, : vw - 2]

    v3 = dx * dx + dy * dy
    ci = jnp.argmax(v3, axis=-1)
    pick = jax.nn.one_hot(ci, 3, dtype=dtype)
    gdx = (dx * pick).sum(-1)
    gdy = (dy * pick).sum(-1)
    gv = (v3 * pick).sum(-1)

    uu, vv = _orientation_units(dtype)
    dots = gdx[..., None] * uu + gdy[..., None] * vv
    inter = jnp.stack([dots, -dots], axis=-1).reshape(*dots.shape[:-1], 18)
    idx = jnp.argmax(inter, axis=-1)
    best_o = (idx >> 1) + (NORIENT // 2) * (idx & 1)

    mag = jnp.sqrt(gv)
    onehot = jax.nn.one_hot(best_o, NORIENT, dtype=dtype) * mag[..., None]
    onehot = jnp.pad(onehot, ((1, 1), (1, 1), (0, 0)))
    hi = jax.lax.Precision.HIGHEST
    my = jnp.asarray(_hist_matrix(bh, vh, sbin), dtype)
    mx = jnp.asarray(_hist_matrix(bw, vw, sbin), dtype)
    tmp = jnp.matmul(my, onehot.reshape(vh, vw * NORIENT), precision=hi)
    return jnp.einsum(
        "yvc,xv->yxc", tmp.reshape(bh, vw, NORIENT), mx, precision=hi
    )


def hog_finalize_batched(hists: jax.Array, sizes: tuple) -> jax.Array:
    """Batched post-histogram stages: (S, bh_m, bw_m, 18) zero-padded
    histogram stack -> (S, bh_m-2, bw_m-2, 32) features.

    sizes: static per-scale (bh_s, bw_s) histogram extents. Each
    scale's valid (bh_s-2, bw_s-2) region reproduces hog_features
    exactly; entries beyond it are masked to exact zeros (the hist row
    bh_s-1 is real data the per-scale output excludes, so a final iota
    mask is required). The per-scale unrolled normalize/clamp chain was
    dispatch-bound on TPU (~15 ms of tiny ops for 46 scales —
    tools/profile_hog.py); this runs it as one batched program.
    """
    s_n, bh_m, bw_m, _ = hists.shape
    dtype = hists.dtype
    oh_m, ow_m = max(bh_m - 2, 0), max(bw_m - 2, 0)
    half = NORIENT // 2
    hist = hists
    norm = jnp.sum(jnp.square(hist[..., :half] + hist[..., half:]), axis=-1)
    s2 = (
        norm[:, :-1, :-1] + norm[:, :-1, 1:]
        + norm[:, 1:, :-1] + norm[:, 1:, 1:]
    )
    eps = jnp.asarray(reference.HOG_EPS, dtype)
    inv = jax.lax.rsqrt(s2 + eps)
    n1 = inv[:, 1 : 1 + oh_m, 1 : 1 + ow_m]
    n2 = inv[:, 0:oh_m, 1 : 1 + ow_m]
    n3 = inv[:, 1 : 1 + oh_m, 0:ow_m]
    n4 = inv[:, 0:oh_m, 0:ow_m]
    ns = jnp.stack([n1, n2, n3, n4], axis=-1)

    src = hist[:, 1 : 1 + oh_m, 1 : 1 + ow_m, :]
    hclamp = jnp.minimum(src[..., None] * ns[..., None, :], 0.2)
    sensitive = 0.5 * hclamp.sum(-1)
    texture = 0.2357 * hclamp.sum(-2)
    ssum = src[..., :half] + src[..., half:]
    insens = 0.5 * jnp.minimum(ssum[..., None] * ns[..., None, :], 0.2).sum(-1)
    occl = jnp.zeros((s_n, oh_m, ow_m, 1), dtype)
    feat = jnp.concatenate([sensitive, insens, texture, occl], axis=-1)

    ohs = np.array([max(bh - 2, 0) for bh, _ in sizes])
    ows = np.array([max(bw - 2, 0) for _, bw in sizes])
    orow = jnp.arange(oh_m)[None, :, None, None]
    ocol = jnp.arange(ow_m)[None, None, :, None]
    oh_j = jnp.asarray(ohs)[:, None, None, None]
    ow_j = jnp.asarray(ows)[:, None, None, None]
    return jnp.where(
        (orow < oh_j) & (ocol < ow_j), feat, jnp.asarray(0, dtype)
    )


def hog_features(im: jax.Array, sbin: int) -> jax.Array:
    """HOG of an (H, W, 3) float image -> (bh-2, bw-2, 32) features.

    All shapes are static functions of (H, W, sbin); safe under jit.
    """
    h, w, _ = im.shape
    bh = cround(h / sbin)
    bw = cround(w / sbin)
    oh, ow = max(bh - 2, 0), max(bw - 2, 0)
    vh, vw = bh * sbin, bw * sbin
    dtype = im.dtype

    # --- gradients on the interior grid, clamped-replicated to the
    # visible grid. grad maps cover pixel coords y in [1, h-2], x in [1, w-2].
    dy = im[2:, 1:-1, :] - im[:-2, 1:-1, :]  # (h-2, w-2, 3)
    dx = im[1:-1, 2:, :] - im[1:-1, :-2, :]
    # extend by edge replication to the visible interior [1, vh-2] x [1, vw-2]
    ext_y = max(vh - h, 0)
    ext_x = max(vw - w, 0)
    pad_cfg = ((0, ext_y), (0, ext_x), (0, 0))
    dy = jnp.pad(dy, pad_cfg, mode="edge")[: vh - 2, : vw - 2]
    dx = jnp.pad(dx, pad_cfg, mode="edge")[: vh - 2, : vw - 2]

    v3 = dx * dx + dy * dy  # (vh-2, vw-2, 3)
    ci = jnp.argmax(v3, axis=-1)  # first max wins: R,G,B order (MATLAB)
    pick = jax.nn.one_hot(ci, 3, dtype=dtype)
    gdx = (dx * pick).sum(-1)
    gdy = (dy * pick).sum(-1)
    gv = (v3 * pick).sum(-1)

    # --- orientation snapping: interleave (dot_o, -dot_o) pairs so that
    # argmax's first-max-wins reproduces the reference's comparison order.
    uu, vv = _orientation_units(dtype)
    dots = gdx[..., None] * uu + gdy[..., None] * vv  # (..., 9)
    inter = jnp.stack([dots, -dots], axis=-1).reshape(*dots.shape[:-1], 18)
    idx = jnp.argmax(inter, axis=-1)
    best_o = (idx >> 1) + (NORIENT // 2) * (idx & 1)

    mag = jnp.sqrt(gv)
    onehot = jax.nn.one_hot(best_o, NORIENT, dtype=dtype) * mag[..., None]

    # --- histogram stage: place the interior map back on the full pixel
    # frame (border pixels contribute nothing) and aggregate cells with
    # two separable strided tent matmuls on the MXU.
    onehot = jnp.pad(onehot, ((1, 1), (1, 1), (0, 0)))  # -> full (vh, vw) frame
    hi = jax.lax.Precision.HIGHEST
    my = jnp.asarray(_hist_matrix(bh, vh, sbin), dtype)  # (bh, vh)
    mx = jnp.asarray(_hist_matrix(bw, vw, sbin), dtype)  # (bw, vw)
    tmp = jnp.matmul(my, onehot.reshape(vh, vw * NORIENT), precision=hi)
    hist = jnp.einsum(
        "yvc,xv->yxc", tmp.reshape(bh, vw, NORIENT), mx, precision=hi
    )

    # --- block energy and 2x2 neighborhood sums
    half = NORIENT // 2
    norm = jnp.sum(jnp.square(hist[..., :half] + hist[..., half:]), axis=-1)
    s2 = norm[:-1, :-1] + norm[:-1, 1:] + norm[1:, :-1] + norm[1:, 1:]  # (bh-1, bw-1)
    eps = jnp.asarray(reference.HOG_EPS, dtype)
    inv = jax.lax.rsqrt(s2 + eps)
    n1 = inv[1 : 1 + oh, 1 : 1 + ow]
    n2 = inv[0:oh, 1 : 1 + ow]
    n3 = inv[1 : 1 + oh, 0:ow]
    n4 = inv[0:oh, 0:ow]
    ns = jnp.stack([n1, n2, n3, n4], axis=-1)  # (oh, ow, 4)

    src = hist[1 : 1 + oh, 1 : 1 + ow, :]  # (oh, ow, 18)

    hclamp = jnp.minimum(src[..., None] * ns[..., None, :], 0.2)  # (oh,ow,18,4)
    sensitive = 0.5 * hclamp.sum(-1)
    texture = 0.2357 * hclamp.sum(-2)  # (oh, ow, 4) = t1..t4

    ssum = src[..., :half] + src[..., half:]
    insens = 0.5 * jnp.minimum(ssum[..., None] * ns[..., None, :], 0.2).sum(-1)

    occl = jnp.zeros((oh, ow, 1), dtype)
    return jnp.concatenate([sensitive, insens, texture, occl], axis=-1)
