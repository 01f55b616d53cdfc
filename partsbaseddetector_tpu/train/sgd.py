"""TPU-native structured-SVM training by subgradient descent.

The reference trains with a host-side dual coordinate-descent QP over a
block-sparse support-vector cache (matlab/learning/train.m,
qp_one_sparse.cc). On TPU the natural re-expression uses the fact that
the detection score is (sub)differentiable in every parameter pool —
filters (through the response convolution), deformation weights
(through the distance transform's quadratic) and biases — so the latent
SSVM objective

    C * sum_pos max(0, 1 - s(x))  +  C * sum_neg max(0, 1 + s(x))
    + 0.5 ||w||^2

trains by batched subgradient descent with optax, data-parallel over
images. The max over latent placements (position, scale, mixtures) is
exactly the pipeline's root-score max, so one forward pass per image
replaces the reference's per-iteration hard-negative detect loop.

Parameter pools mirror model2vec/vec2model (matlab/learning/): the
non-negativity constraint on quadratic deformation terms
(model2vec.m:22-33) becomes a projection after each update.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.model import Model, PackedModel, pack_model
from ..pipeline import build_root_masks, make_plan, max_root_score


def model_params(model: Model) -> dict:
    """Extract the trainable pools as a pytree (model2vec analog)."""
    packed = pack_model(model)
    # a single-part model (the per-part init stage of train_model) has
    # no deformations; keep one zero row so traced gathers stay valid
    defs = (
        np.stack(model.defs)
        if len(model.defs)
        else np.zeros((1, 4), np.float32)
    )
    return {
        "filters": jnp.asarray(packed.filters),
        "defs": jnp.asarray(defs),
        "biases": jnp.asarray(model.biases),
    }


def apply_params(model: Model, params: dict) -> Model:
    """Write trained pools back into the canonical model (vec2model
    analog). Filter padding introduced by packing is cropped away."""
    filters = np.asarray(params["filters"])
    new_filters = []
    for i, f in enumerate(model.filters):
        fh, fw = f.shape[:2]
        new_filters.append(filters[i, :fh, :fw, :].astype(np.float32))
    model = dataclasses.replace(model) if dataclasses.is_dataclass(model) else model
    model.filters = new_filters
    model.defs = [
        np.asarray(d, dtype=np.float32)
        for d in np.asarray(params["defs"])[: len(model.defs)]
    ]
    model.biases = np.asarray(params["biases"], dtype=np.float32)
    return model


def project_defs(params: dict, min_quad: float = 0.01) -> dict:
    """Clamp quadratic deformation terms to stay positive (the QP's
    non-negativity constraint on def weights, qp_one_sparse.cc:247-255 /
    vec2model.m:30-31)."""
    d = params["defs"]
    d = d.at[:, 0].set(jnp.maximum(d[:, 0], min_quad))
    d = d.at[:, 2].set(jnp.maximum(d[:, 2], min_quad))
    return {**params, "defs": d}


def make_loss_fn(
    packed: PackedModel,
    imsize: Tuple[int, int],
    reg: float = 1e-4,
    margin: float = 1.0,
    latent: bool = False,
):
    """Latent-hinge loss over a batch of images.

    labels: +1 (object present) / -1 (pure negative). For negatives and
    unconstrained positives the latent placement max is the global
    root-score max; with latent=True the loss also takes per-image
    root-placement masks (from batch_root_masks) restricting positive
    placements to ground-truth-overlapping ones — the latent SSVM
    positive constraint. SGD-normalized objective:
    mean hinge + 0.5*reg*||w||^2.
    """
    plan = make_plan(packed, imsize)

    def reg_term(params):
        return 0.5 * (
            jnp.sum(jnp.square(params["filters"]))
            + jnp.sum(jnp.square(params["defs"]))
            + jnp.sum(jnp.square(params["biases"]))
        )

    if not latent:

        def loss_fn(params, images, labels):
            scores = jax.vmap(
                lambda im: max_root_score(im, packed, plan, params=params)
            )(images)
            hinge = jnp.maximum(0.0, margin - labels * scores)
            return reg_term(params) * reg + hinge.mean()

        return loss_fn

    def loss_fn(params, images, masks, labels):
        def one(im, m):
            s_any = max_root_score(im, packed, plan, params=params)
            s_pos = max_root_score(
                im, packed, plan, params=params, root_masks=m
            )
            return s_any, s_pos

        s_any, s_pos = jax.vmap(one)(images, masks)
        pos = labels > 0
        # positives: best GT-constrained placement must clear +margin;
        # negatives: best placement anywhere must stay below -margin
        hinge = jnp.where(
            pos,
            jnp.maximum(0.0, margin - s_pos),
            jnp.maximum(0.0, margin + s_any),
        )
        return reg_term(params) * reg + hinge.mean()

    return loss_fn


def batch_root_masks(
    packed: PackedModel,
    imsize: Tuple[int, int],
    bboxes,
    overlap: float = 0.5,
):
    """Per-example root masks for the latent loss. bboxes: (B, 4) GT
    bounding boxes (use the whole image for negatives). Returns a list
    of (B, S_b, Hr, Wr) bool arrays, one per bucket."""
    plan = make_plan(packed, imsize)
    per_image = [
        build_root_masks(packed, plan, np.asarray(bb), overlap)
        for bb in bboxes
    ]
    return [
        jnp.asarray(np.stack([m[b] for m in per_image]))
        for b in range(len(plan.buckets))
    ]


def make_train_step(
    packed: PackedModel,
    imsize: Tuple[int, int],
    optimizer: Optional[optax.GradientTransformation] = None,
    reg: float = 1e-4,
    latent: bool = False,
):
    """Build a jittable training step.

    latent=False: step(params, opt_state, images, labels);
    latent=True:  step(params, opt_state, images, masks, labels) with
    masks from batch_root_masks (GT-constrained positive placements).
    """
    if optimizer is None:
        optimizer = optax.sgd(learning_rate=1e-3, momentum=0.9)
    loss_fn = make_loss_fn(packed, imsize, reg, latent=latent)

    if latent:

        def step(params, opt_state, images, masks, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, images, masks, labels
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = project_defs(params)
            return params, opt_state, loss

        return step, optimizer

    def step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = project_defs(params)
        return params, opt_state, loss

    return step, optimizer
