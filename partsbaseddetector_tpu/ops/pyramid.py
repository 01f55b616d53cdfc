"""HOG feature pyramid: static plan + jit-traceable builder.

The reference builds its pyramid with interval-many fractional resizes
followed by repeated 2x reductions (src/HOGFeatures.cpp:109-127,
detection/featpyramid.m:24-34), pads each level and writes the boundary
occlusion channel (featpyramid.m:36-45). Scale count:
nscales = 1 + floor(log(min(H,W)/(5*sbin)) / log(2^(1/interval))).

TPU-native structure: image size is static under jit, so the whole
ragged pyramid is *planned on the host* (exact per-scale shapes,
following the reference's iterative rounding chain) and the builder
unrolls into static-shaped ops. Scales are grouped into octave buckets
padded to a common shape so that downstream convolution / DP run as a
single batched op per bucket; bucket alignment padding is semantically
dead (valid-extent masks turn it to -inf after the response stage).

Bucket feature shapes add (fh_max-1, fw_max-1): filters are zero-padded
to a common size for the batched conv, and the extra feature margin
guarantees the shared valid-conv grid covers every filter's true valid
extent (see ops/conv.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.rounding import cround

from ..models.model import ModelSpec
from .hog import hog_features, hog_finalize_batched, hog_histogram
from .resize import reduce_image, resize_image


@dataclasses.dataclass(frozen=True)
class ScaleInfo:
    index: int
    im_h: int
    im_w: int
    feat_h: int  # HOG output rows (bh-2)
    feat_w: int
    pad_h: int  # meaningful padded rows = feat_h + 2*(pady+1)
    pad_w: int
    box_scale: float  # image pixels per feature cell at this scale


@dataclasses.dataclass(frozen=True)
class BucketInfo:
    scale_indices: Tuple[int, ...]
    feat_h: int  # common padded feature height (incl. conv margin)
    feat_w: int
    resp_h: int  # feat_h - fh_max + 1
    resp_w: int


@dataclasses.dataclass(frozen=True)
class PyramidPlan:
    imsize: Tuple[int, int]
    nscales: int
    scales: Tuple[ScaleInfo, ...]
    buckets: Tuple[BucketInfo, ...]
    buckets_per_octave: int = 1


def build_plan(
    imsize: Tuple[int, int],
    spec: ModelSpec,
    fh_max: int,
    fw_max: int,
    buckets_per_octave: int = 1,
) -> PyramidPlan:
    """buckets_per_octave > 1 splits each octave into finer buckets:
    less padding waste in the batched conv/DT (scales within a bucket
    span a smaller size range) at the cost of more program instances.
    Must divide the interval. Octave-offset parts keep working: a part
    d octaves down reads bucket b - d*buckets_per_octave."""
    if spec.interval % buckets_per_octave:
        raise ValueError("buckets_per_octave must divide the interval")
    h, w = imsize
    sc = 2.0 ** (1.0 / spec.interval)
    nscales = 1 + int(
        math.floor(math.log(min(h, w) / (5.0 * spec.sbin)) / math.log(sc))
    )
    if nscales < 1:
        raise ValueError(f"image {imsize} too small for sbin={spec.sbin}")

    sizes: List[Tuple[int, int]] = [None] * nscales
    for i in range(spec.interval):
        if i >= nscales:
            break
        f = 1.0 / (sc**i)
        sizes[i] = (cround(h * f), cround(w * f))
        j = i + spec.interval
        while j < nscales:
            ph, pw = sizes[j - spec.interval]
            sizes[j] = (cround(ph * 0.5), cround(pw * 0.5))
            j += spec.interval

    scales: List[ScaleInfo] = []
    for s in range(nscales):
        ih, iw = sizes[s]
        bh, bw = cround(ih / spec.sbin), cround(iw / spec.sbin)
        fh, fw = max(bh - 2, 0), max(bw - 2, 0)
        octave, frac = divmod(s, spec.interval)
        box_scale = spec.sbin * (sc**frac) * (2.0**octave)
        scales.append(
            ScaleInfo(
                index=s,
                im_h=ih,
                im_w=iw,
                feat_h=fh,
                feat_w=fw,
                pad_h=fh + 2 * (spec.pady + 1),
                pad_w=fw + 2 * (spec.padx + 1),
                box_scale=box_scale,
            )
        )

    buckets: List[BucketInfo] = []
    bsz = spec.interval // buckets_per_octave
    for start in range(0, nscales, bsz):
        idxs = tuple(range(start, min(start + bsz, nscales)))
        max_h = max(scales[i].pad_h for i in idxs)
        max_w = max(scales[i].pad_w for i in idxs)
        feat_h = max_h + fh_max - 1
        feat_w = max_w + fw_max - 1
        buckets.append(
            BucketInfo(
                scale_indices=idxs,
                feat_h=feat_h,
                feat_w=feat_w,
                resp_h=feat_h - fh_max + 1,
                resp_w=feat_w - fw_max + 1,
            )
        )
    return PyramidPlan(
        imsize=imsize,
        nscales=nscales,
        scales=tuple(scales),
        buckets=tuple(buckets),
        buckets_per_octave=buckets_per_octave,
    )


def _pad_feature(
    feat: jax.Array, info: ScaleInfo, spec: ModelSpec, bucket: BucketInfo
) -> jax.Array:
    """Apply the meaningful (pady+1, padx+1) padding with the boundary
    occlusion channel (featpyramid.m:36-45), then zero-align to the
    bucket shape."""
    py, px = spec.pady + 1, spec.padx + 1
    f = jnp.pad(feat, ((py, py), (px, px), (0, 0)))
    # occlusion channel = 1 in the meaningful pad frame
    ph, pw, c = f.shape
    row = jnp.arange(ph)[:, None]
    col = jnp.arange(pw)[None, :]
    border = (row < py) | (row >= ph - py) | (col < px) | (col >= pw - px)
    occ = jnp.where(border, jnp.asarray(1, f.dtype), f[..., -1])
    f = jnp.concatenate([f[..., :-1], occ[..., None]], axis=-1)
    return jnp.pad(
        f, ((0, bucket.feat_h - ph), (0, bucket.feat_w - pw), (0, 0))
    )


def _pad_feature_batched(
    feats: jax.Array,
    infos: List[ScaleInfo],
    spec: ModelSpec,
    bucket: BucketInfo,
) -> jax.Array:
    """Batched _pad_feature: (S, ohm, owm, 32) per-scale-valid features
    (exact zeros beyond each scale's extent) -> (S, H_b, W_b, 32) with
    each scale's occlusion border written at its own frame positions."""
    py, px = spec.pady + 1, spec.padx + 1
    s_n = feats.shape[0]
    f = jnp.pad(
        feats,
        (
            (0, 0),
            (py, bucket.feat_h - feats.shape[1] - py),
            (px, bucket.feat_w - feats.shape[2] - px),
            (0, 0),
        ),
    )
    row = jnp.arange(bucket.feat_h)[None, :, None]
    col = jnp.arange(bucket.feat_w)[None, None, :]
    ph = jnp.asarray([i.pad_h for i in infos])[:, None, None]
    pw = jnp.asarray([i.pad_w for i in infos])[:, None, None]
    inframe = (row < ph) & (col < pw)
    border = inframe & (
        (row < py) | (row >= ph - py) | (col < px) | (col >= pw - px)
    )
    occ = jnp.where(border, jnp.asarray(1, f.dtype), f[..., -1])
    return jnp.concatenate([f[..., :-1], occ[..., None]], axis=-1)


def _scale_images(
    im: jax.Array, plan: PyramidPlan, spec: ModelSpec
) -> List[jax.Array]:
    sc = 2.0 ** (1.0 / spec.interval)
    images: List[jax.Array] = [None] * plan.nscales
    for i in range(min(spec.interval, plan.nscales)):
        scaled = resize_image(im, 1.0 / (sc**i)) if i > 0 else im
        images[i] = scaled
        j = i + spec.interval
        while j < plan.nscales:
            scaled = reduce_image(scaled)
            images[j] = scaled
            j += spec.interval
    return images


def build_pyramid_features_hybrid(
    im: jax.Array, plan: PyramidPlan, spec: ModelSpec
) -> List[jax.Array]:
    """Hybrid per-scale/batched pyramid (EXPERIMENT — not the default).

    Pixel-grid stages (resample, gradients, orientation binning) stay
    per-scale — they fuse into the strided tent matmuls — while
    everything after the cell histograms runs as ONE batched program
    across all scales (hog_finalize_batched + _pad_feature_batched).
    Motivation was the per-scale tail looking dispatch-bound in
    isolated microbenches; the full-program A/B says otherwise: on v5e
    person-VGA this is STRICTLY SLOWER than the per-scale builder
    (hog-only 27.2 vs 22.8 ms, hog+conv+DP 45.6 vs 37.7 ms — measured
    2026-08-16) because XLA fuses the per-scale tail into the
    histogram matmul epilogues for free, while the batched variant
    pays stack/pad materialization of every histogram and feature
    stack through HBM. Kept (with its parity tests) as the
    measured-and-rejected record and for HLO-size experiments."""
    images = _scale_images(im, plan, spec)

    hists = [
        hog_histogram(images[s], spec.sbin) for s in range(plan.nscales)
    ]
    sizes = tuple(h.shape[:2] for h in hists)
    bh_m = max(h for h, _ in sizes)
    bw_m = max(w for _, w in sizes)
    stack = jnp.stack(
        [
            jnp.pad(
                h,
                ((0, bh_m - h.shape[0]), (0, bw_m - h.shape[1]), (0, 0)),
            )
            for h in hists
        ]
    )
    feats_all = hog_finalize_batched(stack, sizes)  # (S, oh_m, ow_m, 32)

    out: List[jax.Array] = []
    for bucket in plan.buckets:
        infos = [plan.scales[s] for s in bucket.scale_indices]
        ohm = max(i.feat_h for i in infos)
        owm = max(i.feat_w for i in infos)
        idxs = np.asarray(bucket.scale_indices)
        stack_b = feats_all[idxs, :ohm, :owm]
        out.append(_pad_feature_batched(stack_b, infos, spec, bucket))
    return out


def build_pyramid_features(
    im: jax.Array, plan: PyramidPlan, spec: ModelSpec
) -> List[jax.Array]:
    """Compute HOG features for every scale and return one padded
    (S_b, H_b, W_b, flen) stack per bucket. im: (H, W, 3) float.

    Per-scale HOG, then one stacked pad per bucket: each scale's
    normalize/clamp tail fuses into its histogram-matmul epilogue, so
    nothing round-trips HBM between stages. Beats the fully batched
    hybrid (build_pyramid_features_hybrid) by ~8 ms/img on v5e — see
    its docstring for the A/B."""
    images = _scale_images(im, plan, spec)
    feats = [hog_features(images[s], spec.sbin) for s in range(plan.nscales)]
    out: List[jax.Array] = []
    for bucket in plan.buckets:
        stack = [
            _pad_feature(feats[s], plan.scales[s], spec, bucket)
            for s in bucket.scale_indices
        ]
        out.append(jnp.stack(stack, axis=0))
    return out


def response_valid_extents(
    plan: PyramidPlan, bucket: BucketInfo, filter_sizes: np.ndarray,
    border: str = "matlab",
) -> Tuple[np.ndarray, np.ndarray]:
    """(S, F) true valid response extents.

    matlab: padded_size - fsize + 1 per filter (valid correlation);
    cpp: the 'same'-size grid equals the unpadded feature extent for
    every filter (anchor-offset filter placement aligns them)."""
    nf = filter_sizes.shape[0]
    if border == "cpp":
        fh_ = np.array([plan.scales[s].feat_h for s in bucket.scale_indices])
        fw_ = np.array([plan.scales[s].feat_w for s in bucket.scale_indices])
        vh = np.repeat(fh_[:, None], nf, axis=1)
        vw = np.repeat(fw_[:, None], nf, axis=1)
        return vh.astype(np.int32), vw.astype(np.int32)
    fh = filter_sizes[:, 0][None, :]
    fw = filter_sizes[:, 1][None, :]
    ph = np.array([plan.scales[s].pad_h for s in bucket.scale_indices])[:, None]
    pw = np.array([plan.scales[s].pad_w for s in bucket.scale_indices])[:, None]
    return (ph - fh + 1).astype(np.int32), (pw - fw + 1).astype(np.int32)


def mask_responses(
    resp: jax.Array, vh: np.ndarray, vw: np.ndarray, neg: float = -jnp.inf
) -> jax.Array:
    """Set response entries outside each (scale, filter) valid extent to
    `neg` so padded regions can never win any downstream max. Inference
    uses -inf; the differentiable training path passes a large finite
    value (non-finite arithmetic makes rematerialized VJPs NaN)."""
    s, hr, wr, f = resp.shape
    # host-precomputed boolean factors: comparing device-side against the
    # (S, F) int32 extent tables makes XLA stage those thin constants
    # through SMEM (a ~0.2-1.3 ms scalar-core copy per table per bucket
    # program, measured in the round-2 trace); bool vector constants
    # broadcast straight from HBM inside the consumer fusion instead
    my = np.arange(hr)[None, :, None] < np.asarray(vh)[:, None, :]  # (S,hr,F)
    mx = np.arange(wr)[None, :, None] < np.asarray(vw)[:, None, :]  # (S,wr,F)
    mask = jnp.asarray(my)[:, :, None, :] & jnp.asarray(mx)[:, None, :, :]
    return jnp.where(mask, resp, neg)
