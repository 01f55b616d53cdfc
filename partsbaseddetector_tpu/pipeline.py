"""Shared forward pipeline: image -> root score maps (+ DP tables).

One implementation serves both surfaces:
  - inference (detector.py): baked model constants, backtracking tables;
  - training (train/): filters/defs/biases as a traced params pytree —
    the whole pipeline (HOG, conv, distance transforms, tree DP) is
    differentiable, so structured-SVM losses train by subgradient
    descent on TPU instead of the reference's host-side dual QP
    (matlab/learning/qp_*.m). Both paths share identical semantics.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.model import PackedModel
from .ops.conv import filter_responses, filter_responses_fft
from .ops.conv_pallas import filter_responses_infer
from .ops.dp import tree_min_sum
from .ops.pyramid import (
    PyramidPlan,
    build_plan,
    build_pyramid_features,
    mask_responses,
    response_valid_extents,
)

ENGINES = {
    "spatial": filter_responses,
    "fourier": filter_responses_fft,
}


class BucketScores(NamedTuple):
    """Root scores for one (bucket, component) pair."""

    bucket_index: int
    component: int
    rootv: jax.Array  # (S, Hr, Wr)
    rooti: jax.Array  # (S, Hr, Wr) int32
    tables: Dict[int, Tuple[jax.Array, jax.Array, jax.Array]]


def make_plan(
    packed: PackedModel, imsize: Tuple[int, int], buckets_per_octave: int = 1
) -> PyramidPlan:
    fh_max, fw_max = packed.filters.shape[1], packed.filters.shape[2]
    return build_plan(
        imsize, packed.spec, fh_max, fw_max, buckets_per_octave
    )


def fourier_spectra_args(
    packed: PackedModel, plan: PyramidPlan
) -> List[np.ndarray]:
    """Host-side conjugate filter spectra, one per bucket, shaped for
    root_scores(fft_spectra=...) — the cached FourierConvolutionEngine
    `setFilters` state as RUNTIME arguments. device_put these once and
    pass them on every call instead of letting the trace bake them as
    constants: a person26 VGA bank's spectra are O(100 MB) of literals,
    which overflows the axon remote-compile HTTP payload limit (413)
    and bloats compile time. Memoized per (filters, feat_h, feat_w) by
    fft_filter_spectra."""
    from .ops.conv import fft_filter_spectra

    return [
        fft_filter_spectra(packed.filters, b.feat_h, b.feat_w)
        for b in plan.buckets
    ]


def depth_response_masks(
    depth: jax.Array,
    plan: PyramidPlan,
    spec,
    gate,
    dtype=jnp.float32,
) -> List[jax.Array]:
    """Device-side per-bucket plausible-depth response gates — the
    *intended* filterResponseByDepth (src/SearchSpacePruning.cpp:47-70;
    the reference computes Z = fx*X/scale per scale and discards it).

    Returns one (S_b, Hr, Wr) bool array per bucket: True where the
    local depth is plausible for that scale's expected object depth.
    Sample indices are host-precomputed per static grid with
    depth.gate_sample_indices, so the mask equals the host predictor
    (depth.depth_level_mask) bit-for-bit on every scale's valid extent;
    the device work is one gather + compare per bucket."""
    from . import depth as depth_mod

    h_im, w_im = plan.imsize
    dh, dw = depth.shape
    off_x = -1 if spec.border == "cpp" else -spec.padx
    off_y = -1 if spec.border == "cpp" else -spec.pady
    d = depth.astype(dtype)
    masks: List[jax.Array] = []
    for bucket in plan.buckets:
        iy = np.stack(
            [
                depth_mod.gate_sample_indices(
                    bucket.resp_h, off_y, plan.scales[s].box_scale, h_im, dh
                )
                for s in bucket.scale_indices
            ]
        )  # (S, Hr)
        ix = np.stack(
            [
                depth_mod.gate_sample_indices(
                    bucket.resp_w, off_x, plan.scales[s].box_scale, w_im, dw
                )
                for s in bucket.scale_indices
            ]
        )  # (S, Wr)
        z = jnp.asarray(
            [
                gate.fx * gate.object_width_m / plan.scales[s].box_scale
                for s in bucket.scale_indices
            ],
            dtype,
        )[:, None, None]
        sampled = d[jnp.asarray(iy)[:, :, None], jnp.asarray(ix)[:, None, :]]
        ok = (
            (jnp.abs(sampled - z) <= gate.tolerance * z)
            | (sampled <= 0)
            | ~jnp.isfinite(sampled)
        )
        masks.append(ok)
    return masks


def root_scores(
    im: jax.Array,
    packed: PackedModel,
    plan: PyramidPlan,
    params: Optional[dict] = None,
    engine: str = "spatial",
    dtype=jnp.float32,
    with_tables: bool = True,
    remat: bool = False,
    response_masks: Optional[List[jax.Array]] = None,
    features: Optional[List[jax.Array]] = None,
    conv_dtype=None,
    collect_responses: Optional[List[jax.Array]] = None,
    fft_spectra: Optional[List[jax.Array]] = None,
) -> List[BucketScores]:
    """Run HOG pyramid -> responses -> tree DP for every (bucket,
    component). params (optional) = {'filters', 'defs', 'biases'} traced
    pools for training. remat=True rematerializes the DP block in the
    backward pass (use for large-image training where activation memory
    dominates; off by default — jit+checkpoint has shown NaN
    miscompiles on the CPU backend). response_masks (optional): one
    (S_b, Hr, Wr) bool array per bucket (e.g. depth_response_masks);
    False cells are masked to the same neg value as the valid-extent
    masking, composing with it. features (optional): precomputed
    per-bucket HOG stacks (cast to the conv dtype here).

    conv_dtype (optional): dtype for the HOG pyramid + conv stage when
    it differs from the DP dtype — the hybrid serving profile runs
    HOG+conv in float32 (MXU-bound, cheap at fp32) and only the
    HBM-bound DT/DP in `dtype`, so the fp32 re-score can reconstruct
    exact f32 scores from the responses. collect_responses (optional):
    a list the RAW (pre-masking, conv-dtype) per-bucket response stacks
    are appended to — the rescore_from_responses input.

    fft_spectra (optional, fourier engine): one (2, feat_h, wf, C, F)
    float32 stacked [real, imag] conjugate-filter-spectrum array per
    bucket (fft_filter_spectra's format), threaded as a
    RUNTIME argument through the jit boundary (see
    fourier_spectra_args). Without it the serving path bakes the
    spectra as program constants — correct, but a person26-scale bank's
    spectra are hundreds of MB of literals, which overflows
    remote-compile payload limits (axon rejects the serialized program
    with HTTP 413) and bloats every compile."""
    spec = packed.spec
    conv = ENGINES[engine]
    if engine == "spatial" and params is None:
        # inference: the Pallas implicit-GEMM kernel on TPU (1.8x the
        # XLA conv lowering); training keeps the differentiable XLA conv
        conv = filter_responses_infer
    cdtype = dtype if conv_dtype is None else conv_dtype
    if features is None:
        im = im.astype(cdtype)
        feats = build_pyramid_features(im, plan, spec)
    else:
        feats = [f.astype(cdtype) for f in features]
    filters = (
        params["filters"].astype(cdtype)
        if params is not None
        else jnp.asarray(packed.filters, cdtype)
    )

    # responses + valid extents for every bucket first (parts with
    # octave offsets read finer buckets than their root's)
    neg = -1e10 if params is not None else -jnp.inf
    resps: List[jax.Array] = []
    vhs: List[np.ndarray] = []
    vws: List[np.ndarray] = []
    for b, bucket in enumerate(plan.buckets):
        if engine == "fourier" and fft_spectra is not None:
            # serving: cached conjugate filter spectra as runtime args.
            # Serving-only by construction: spectra are host-precomputed
            # from packed.filters, so a training caller threading traced
            # params here would silently detach filter gradients
            assert params is None, (
                "fft_spectra is a serving-path cache of packed.filters; "
                "training (params is not None) must let the engine "
                "derive spectra from the traced filters"
            )
            resp = conv(feats[b], filters, fft_spectra[b])
        elif engine == "fourier" and params is None:
            # small-model fallback: bake the conjugate filter spectra as
            # constants — the cached `setFilters` state the reference
            # engine intends (src/FourierConvolutionEngine.cpp:118-139
            # drops its DFTs)
            from .ops.conv import fft_filter_spectra

            spectra = fft_filter_spectra(
                packed.filters, feats[b].shape[1], feats[b].shape[2]
            )
            resp = conv(feats[b], filters, spectra)
        else:
            resp = conv(feats[b], filters)
        if collect_responses is not None:
            # raw conv-dtype responses, pre-masking: real placements
            # never index masked cells, and the rescore gathers scalars
            collect_responses.append(resp)
        resp = resp.astype(dtype)
        vh, vw = response_valid_extents(
            plan, bucket, packed.filter_sizes, spec.border
        )
        resp = mask_responses(resp, vh, vw, neg)
        if response_masks is not None:
            # (S, Hr, Wr) positional gates (plausible-depth) broadcast
            # over the filter axis; (S, Hr, Wr, F) per-filter gates
            # (latent-positive part constraints, train/detect_tpu.py)
            # apply as-is
            m = response_masks[b]
            if m.ndim == 3:
                m = m[..., None]
            resp = jnp.where(m, resp, neg)
        resps.append(resp)
        vhs.append(vh)
        vws.append(vw)

    bpo = spec.interval // len(plan.buckets[0].scale_indices)         if plan.buckets[0].scale_indices else 1
    out: List[BucketScores] = []
    for b, bucket in enumerate(plan.buckets):
        for c, comp in enumerate(packed.components):
            if b < comp.max_ds * bpo:
                # some part's octave-finer level would not exist at this
                # root scale (detect_fast.m level bound)
                continue
            tensors = comp.tensors(params) if params is not None else None
            if params is not None and not with_tables and remat:
                # training path: rematerialize the DP block in the
                # backward pass instead of storing every DT/message
                # intermediate (jax.checkpoint trades FLOPs for HBM)
                def scored(resps_, tensors_, comp=comp, b=b):
                    rv, ri, _ = tree_min_sum(
                        resps_,
                        comp,
                        tensors_,
                        valid_extents=(vhs, vws),
                        bucket_index=b,
                        buckets_per_octave=bpo,
                    )
                    return rv, ri

                rootv, rooti = jax.checkpoint(scored)(resps, tensors)
                tables = {}
            else:
                rootv, rooti, tables = tree_min_sum(
                    resps,
                    comp,
                    tensors,
                    valid_extents=(vhs, vws),
                    bucket_index=b,
                    buckets_per_octave=bpo,
                )
                if not with_tables:
                    tables = {}
            out.append(BucketScores(b, c, rootv, rooti, tables))
    return out


def max_root_score(
    im: jax.Array,
    packed: PackedModel,
    plan: PyramidPlan,
    params: Optional[dict] = None,
    engine: str = "spatial",
    dtype=jnp.float32,
    root_masks: Optional[List[jax.Array]] = None,
    remat: bool = False,
) -> jax.Array:
    """Best detection score anywhere in the image (differentiable).

    root_masks (optional): per-bucket (S_b, Hr, Wr) bool arrays
    restricting the max to ground-truth-overlapping root placements —
    the latent-positive constraint of the SSVM (detect.m testoverlap).
    """
    scores = root_scores(
        im, packed, plan, params, engine, dtype, with_tables=False,
        remat=remat,
    )
    best = []
    for s in scores:
        rv = s.rootv
        if root_masks is not None:
            # finite masking value (detect.m's INF=1e10): keeps the
            # hinge finite when an example has no valid placement, so
            # gradients stay NaN-free under rematerialization
            rv = jnp.where(root_masks[s.bucket_index], rv, -1e10)
        best.append(rv.max())
    return jnp.stack(best).max()


def build_root_masks(
    packed: PackedModel,
    plan: PyramidPlan,
    bbox: np.ndarray,
    overlap: float = 0.5,
) -> List[np.ndarray]:
    """Host-side per-bucket root-placement masks: positions whose root
    window (largest root filter) has IoU >= overlap with bbox
    (detect.m:338-375). Returns one (S_b, Hr, Wr) bool array per bucket."""
    from .ops.reference_pipeline import overlap_mask

    spec = packed.spec
    comp = packed.components[0]
    fh, fw = int(comp.fsize[0, 0, 0]), int(comp.fsize[0, 0, 1])
    masks = []
    for bucket in plan.buckets:
        m = np.zeros(
            (len(bucket.scale_indices), bucket.resp_h, bucket.resp_w), bool
        )
        for i, sidx in enumerate(bucket.scale_indices):
            info = plan.scales[sidx]
            ok = overlap_mask(
                (bucket.resp_h, bucket.resp_w),
                (fh, fw),
                info.box_scale,
                spec.padx,
                spec.pady,
                np.asarray(bbox, dtype=np.float64),
                overlap,
            )
            m[i] = ok
        masks.append(m)
    return masks
