"""High-level SGD training driver: epochs, batching, checkpointing.

Convenience loop over train/sgd.py's step functions — the TPU-native
counterpart of trainmodel.m's outer driver. Handles shuffled
mini-batches, optional latent root masks, periodic orbax checkpoints,
and writing the trained pools back into a canonical Model.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import Model, pack_model
from .checkpoint import restore_checkpoint, save_checkpoint
from .sgd import (
    apply_params,
    batch_root_masks,
    make_train_step,
    model_params,
)


def fit(
    model: Model,
    images: Sequence[np.ndarray],
    labels: Sequence[float],
    bboxes: Optional[Sequence[np.ndarray]] = None,
    epochs: int = 10,
    batch_size: int = 8,
    optimizer=None,
    overlap: float = 0.5,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 5,
    seed: int = 0,
    verbose: bool = False,
) -> Tuple[Model, List[float]]:
    """Train by batched subgradient descent on TPU.

    images: same-shape (H, W, 3) arrays; labels: +-1; bboxes (optional):
    per-image GT boxes enabling the latent-positive constraint.
    Returns (trained model, per-epoch mean losses). Resumes from
    checkpoint_dir if a checkpoint exists.
    """
    packed = pack_model(model)
    imsize = images[0].shape[:2]
    latent = bboxes is not None
    step, opt = make_train_step(
        packed, imsize, optimizer=optimizer, latent=latent
    )
    jstep = jax.jit(step)

    params = model_params(model)
    opt_state = opt.init(params)
    start_epoch = 0
    if checkpoint_dir:
        restored = restore_checkpoint(checkpoint_dir, params, opt_state)
        if restored is not None:
            params, opt_state, start_epoch = restored
            if verbose:
                print(f"resumed from epoch {start_epoch}")

    images_d = jnp.asarray(np.stack(images).astype(np.float32))
    labels_d = np.asarray(labels, dtype=np.float32)
    masks_all = None
    if latent:
        masks_all = batch_root_masks(packed, imsize, bboxes, overlap)

    rng = np.random.RandomState(seed)
    n = len(images)
    history: List[float] = []
    for epoch in range(start_epoch, epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            sel = order[i : i + batch_size]
            bi = images_d[sel]
            bl = jnp.asarray(labels_d[sel])
            if latent:
                bm = [m[sel] for m in masks_all]
                params, opt_state, loss = jstep(params, opt_state, bi, bm, bl)
            else:
                params, opt_state, loss = jstep(params, opt_state, bi, bl)
            losses.append(float(loss))
        history.append(float(np.mean(losses)) if losses else float("nan"))
        if verbose:
            print(f"epoch {epoch}: loss {history[-1]:.4f}")
        if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, params, opt_state, epoch + 1)

    model = apply_params(model, params)
    return model, history
