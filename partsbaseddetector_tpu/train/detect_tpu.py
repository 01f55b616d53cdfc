"""TPU-driven detection for the QP/latent training loop.

The reference mines latent positives and hard negatives by running the
full detector inside the training loop (matlab/learning/train.m:75-106)
— the dominant training cost, which it pays per image per iteration on
the host. This module routes that mining through the jitted TPU
pipeline with the model weights as *traced arguments*: one compile per
(image shape, pyramid interval, latent?) is reused across every QP
iteration as the weights change, so re-mining after each weight update
costs only device time. Returned placements use the reference
convention (root pyramid level, per-part padded-grid coords, mixture
indices — the dict contract of ops/reference_pipeline.detect_reference)
so train/features.py can assemble QP feature vectors host-side
unchanged.

Latent-positive constraints (per-part ground-truth IoU masks,
detect.m:60-99) become per-filter response masks applied on device:
each (part, mixture) owns one filter in the packed bank, so one
(S, Hr, Wr, F) bool tensor per bucket expresses the reference's
per-part masking exactly — including the fixed-mixtures quirk where
ONLY the mixture constraint applies (detect.m:88-99).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import Model, pack_model
from ..ops.dp import backtrack
from ..ops.reference_pipeline import overlap_mask
from ..pipeline import make_plan, root_scores

# below any genuine score, above the finite masking value -1e10 the
# traced pipeline uses (detect.m's INF), so masked placements stay
# invalid in backtrack
_NEG_THRESH = -1e9


def _filters_unique_per_part(model: Model) -> bool:
    """Per-filter masks express per-part constraints only when no filter
    is shared between two (component, part) slots."""
    owner: Dict[int, Tuple[int, int]] = {}
    for c in range(model.ncomponents):
        for p in range(model.nparts(c)):
            for f in np.asarray(model.filterid[c][p]).ravel():
                key = int(f)
                if key in owner and owner[key] != (c, p):
                    return False
                owner[key] = (c, p)
    return True


class TPUMiner:
    """Jitted mining detector with traced weights.

    Static model structure (tree topology, filter sizes, index tables,
    pyramid interval) is baked at first use per (image shape, interval);
    weights flow in as a params pytree, so QP weight updates never
    recompile. Call set_model() after each update.
    """

    def __init__(self, model: Model, max_det: int = 64, dtype=jnp.float32):
        self._model = model
        self.max_det = int(max_det)
        self.dtype = dtype
        self._fns: Dict[Tuple, Tuple] = {}
        self._params = None
        self._struct = self._structure_key(model)

    @staticmethod
    def _structure_key(model: Model):
        return (
            len(model.filters),
            tuple(f.shape for f in model.filters),
            len(model.defs),
            model.sbin,
        )

    def set_model(self, model: Model) -> None:
        """Adopt updated weights (same structure; cached programs stay
        valid because only the traced params change)."""
        if self._structure_key(model) != self._struct:
            # structure changed: every baked index table is stale
            self._fns.clear()
            self._struct = self._structure_key(model)
        self._model = model
        self._params = None

    def _get_params(self) -> dict:
        if self._params is None:
            from .sgd import model_params

            self._params = jax.device_put(model_params(self._model))
        return self._params

    # -- program cache ---------------------------------------------------

    def _get_fn(self, imshape: Tuple[int, int], latent: bool):
        model = self._model
        key = (imshape[0], imshape[1], model.interval, latent)
        if key not in self._fns:
            packed = pack_model(model)  # weights ignored on the traced path
            assert packed.spec.border == "matlab"
            plan = make_plan(packed, imshape)
            self._fns[key] = (
                jax.jit(self._build(packed, plan, latent)),
                packed,
                plan,
            )
        return self._fns[key]

    def _build(self, packed, plan, latent: bool):
        spec = packed.spec
        dtype = self.dtype
        max_det = self.max_det
        off_x, off_y = -spec.padx, -spec.pady
        p_max = packed.max_nparts

        def fn(im, params, masks=None):
            scores = root_scores(
                im,
                packed,
                plan,
                params=params,
                dtype=dtype,
                with_tables=True,
                response_masks=list(masks) if masks is not None else None,
            )
            sc_l, lvl_l, comp_l, mx_l, xs_l, ys_l, bx_l, vd_l = (
                [], [], [], [], [], [], [], [],
            )
            for bs in scores:
                bucket = plan.buckets[bs.bucket_index]
                comp = packed.components[bs.component]
                box_scales = jnp.asarray(
                    [plan.scales[s].box_scale for s in bucket.scale_indices],
                    dtype,
                )
                bx, sc, mx, vd, (si, xs, ys) = backtrack(
                    bs.rootv,
                    bs.rooti,
                    bs.tables,
                    comp,
                    box_scales,
                    box_off_x=off_x,
                    box_off_y=off_y,
                    thresh=_NEG_THRESH,
                    max_det=max_det,
                )
                lvl = jnp.asarray(
                    np.asarray(bucket.scale_indices, np.int32)
                )[si]
                pc = comp.nparts
                if pc < p_max:
                    pad = ((0, 0), (0, p_max - pc))
                    mx = jnp.pad(mx, pad)
                    xs = jnp.pad(xs, pad)
                    ys = jnp.pad(ys, pad)
                    bx = jnp.concatenate(
                        [
                            bx,
                            jnp.broadcast_to(
                                bx[:, :1], (bx.shape[0], p_max - pc, 4)
                            ),
                        ],
                        axis=1,
                    )
                sc_l.append(sc)
                lvl_l.append(lvl)
                comp_l.append(jnp.full(sc.shape, bs.component, jnp.int32))
                mx_l.append(mx)
                xs_l.append(xs)
                ys_l.append(ys)
                bx_l.append(bx)
                vd_l.append(vd)
            sc = jnp.concatenate(sc_l)
            vd = jnp.concatenate(vd_l)
            masked = jnp.where(vd, sc, -jnp.inf)
            top, order = jax.lax.top_k(masked, max_det)
            return (
                top,
                jnp.concatenate(lvl_l)[order],
                jnp.concatenate(comp_l)[order],
                jnp.concatenate(mx_l)[order],
                jnp.concatenate(xs_l)[order],
                jnp.concatenate(ys_l)[order],
                jnp.concatenate(bx_l)[order],
            )

        return fn

    # -- latent masks ------------------------------------------------------

    def _latent_masks(
        self,
        packed,
        plan,
        part_boxes: np.ndarray,
        overlap: float,
        fixed_mixtures: Optional[np.ndarray],
    ) -> List[np.ndarray]:
        """Per-bucket (S, Hr, Wr, F) bool masks reproducing detect.m's
        latent per-part response masking on the shared padded grid
        (cells beyond a scale's valid extent are already -inf-masked by
        the pipeline, so over-wide masks there are harmless)."""
        spec = packed.spec
        nf = packed.filters.shape[0]
        part_boxes = np.asarray(part_boxes, dtype=np.float64)
        masks: List[np.ndarray] = []
        for bucket in plan.buckets:
            hr, wr = bucket.resp_h, bucket.resp_w
            sb = len(bucket.scale_indices)
            m = np.ones((sb, hr, wr, nf), dtype=bool)
            for comp in packed.components:
                for p in range(comp.nparts):
                    for k in range(int(comp.nmix[p])):
                        f = int(comp.filterid[p, k])
                        if fixed_mixtures is not None:
                            # detect.m:88-99 quirk: with fixed mixtures
                            # ONLY the mixture constraint applies
                            if k != int(fixed_mixtures[p]):
                                m[..., f] = False
                            continue
                        fh, fw = (
                            int(comp.fsize[p, k, 0]),
                            int(comp.fsize[p, k, 1]),
                        )
                        for i, s in enumerate(bucket.scale_indices):
                            m[i, :, :, f] &= overlap_mask(
                                (hr, wr),
                                (fh, fw),
                                plan.scales[s].box_scale,
                                spec.padx,
                                spec.pady,
                                part_boxes[p],
                                overlap,
                            )
            masks.append(m)
        return masks

    # -- the detect_reference-shaped entry --------------------------------

    def detect(
        self,
        im: np.ndarray,
        thresh: float,
        part_boxes: Optional[np.ndarray] = None,
        overlap: float = 0.7,
        fixed_mixtures: Optional[np.ndarray] = None,
    ) -> List[dict]:
        """detect_reference-contract mining through the TPU pipeline.

        Returns at most max_det detections (score-sorted; the QP writes
        only the top handful per image, train.m:100), or the single best
        constrained placement in latent mode (part_boxes given).
        """
        latent = part_boxes is not None
        if latent and not _filters_unique_per_part(self._model):
            # shared filters would entangle two parts' masks; fall back
            from ..ops.reference_pipeline import detect_reference

            return detect_reference(
                im,
                self._model,
                thresh=thresh,
                part_boxes=part_boxes,
                overlap=overlap,
                fixed_mixtures=fixed_mixtures,
            )
        im = np.asarray(im)
        fn, packed, plan = self._get_fn(im.shape[:2], latent)
        params = self._get_params()
        dev_im = jax.device_put(im.astype(np.float32, copy=False))
        if latent:
            masks = self._latent_masks(
                packed, plan, part_boxes, overlap, fixed_mixtures
            )
            out = fn(dev_im, params, tuple(jax.device_put(m) for m in masks))
        else:
            out = fn(dev_im, params)
        top, lvl, comp, mx, xs, ys, bx = jax.device_get(out)
        dets: List[dict] = []
        for i in range(top.shape[0]):
            s = float(top[i])
            if not np.isfinite(s) or s < thresh:
                break  # top_k output is sorted descending
            c = int(comp[i])
            pc = packed.components[c].nparts
            dets.append(
                dict(
                    score=s,
                    component=c,
                    level=int(lvl[i]),
                    mixtures=mx[i, :pc].astype(np.int64),
                    xs=xs[i, :pc].astype(np.int64),
                    ys=ys[i, :pc].astype(np.int64),
                    boxes=bx[i, :pc].astype(np.float64),
                )
            )
        if latent:
            return dets[:1]
        return dets
