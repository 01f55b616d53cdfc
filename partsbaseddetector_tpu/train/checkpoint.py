"""Training checkpoint/resume for the TPU SGD path.

The reference training resumes from per-stage .mat caches
(learning/trainmodel.m try/load/catch, globals.m cache dir); the QP
driver keeps that shape (train/trainmodel.py _cache). The SGD path
checkpoints its live state (params pytree + optimizer state + step)
with orbax so multi-hour runs survive preemption — the TPU-native
equivalent of the stage cache.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, params: dict, opt_state: Any, step: int) -> None:
    """Checkpoint to `path` (a directory) via orbax; falls back to npz
    if orbax is unavailable."""
    state = {"params": params, "opt_state": opt_state, "step": step}
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), state, force=True)
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    flat, treedef = jax.tree.flatten(state)
    os.makedirs(path, exist_ok=True)
    np.savez(
        os.path.join(path, "state.npz"),
        *[np.asarray(x) for x in flat],
        treedef=np.array(str(treedef)),
    )


def restore_checkpoint(
    path: str, params_like: dict, opt_state_like: Any, step_like: int = 0
) -> Optional[Tuple[dict, Any, int]]:
    """Restore a checkpoint saved by save_checkpoint; the *_like args
    provide the pytree structure/shapes. Returns None if absent."""
    target = {
        "params": params_like,
        "opt_state": opt_state_like,
        "step": step_like,
    }
    apath = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        state = ckpt.restore(apath, target)
        return state["params"], state["opt_state"], int(state["step"])
    except Exception:
        pass
    npz = os.path.join(path, "state.npz")
    if not os.path.exists(npz):
        return None
    data = np.load(npz, allow_pickle=False)
    flat_like, treedef = jax.tree.flatten(target)
    flat = [data[f"arr_{i}"] for i in range(len(flat_like))]
    state = jax.tree.unflatten(treedef, flat)
    return state["params"], state["opt_state"], int(state["step"])
