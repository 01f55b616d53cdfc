"""Multi-chip scaling via jax.sharding meshes.

The reference is single-process CPU; its only parallelism is OpenMP
across scales/filters (SURVEY.md §2.4). The TPU-native scaling story:

  - data parallelism: batched detection vmaps the single-image pipeline
    and shards the batch axis over the 'dp' mesh axis (the 64-image
    batched-throughput benchmark config);
  - tensor parallelism: the part-filter bank (the model's weight pool)
    shards its F axis over 'tp'; XLA inserts the all-gather where the
    per-part response gather needs cross-shard channels;
  - training: the SSVM subgradient step shards images over 'dp' and
    filters over 'tp', gradients psum automatically via GSPMD.

All shardings are NamedSharding annotations on jit boundaries —
collectives are chosen by the compiler and ride ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.model import PackedModel


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, tp: int = 1
) -> Mesh:
    """Build a (dp, tp) mesh over the first dp*tp devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if dp is None:
        dp = n // tp
    devices = np.array(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, axis_names=("dp", "tp"))


def batched_detect_fn(detector, imsize: Tuple[int, int], mesh: Optional[Mesh] = None):
    """vmap the detector over a batch; optionally shard batch over 'dp'.

    Returns a jitted fn (B, H, W, 3) -> (boxes, scores, components,
    valid, mixtures), batch-major.
    """
    single = detector._build_fn(imsize)
    spectra = getattr(single, "_fft_spectra", None)
    if spectra is not None:
        # fourier engine: spectra as runtime args broadcast across the
        # batch (baked constants overflow remote-compile payload limits
        # at flagship scale — see pipeline.fourier_spectra_args)
        import jax.numpy as jnp

        # commit the spectra WITH the mesh-replicated sharding up front:
        # default-device arrays fed to a jit declaring P() replication
        # get re-broadcast on every dispatch (O(100 MB) per call for a
        # person26-scale bank on real multichip)
        sp_sharding = (
            NamedSharding(mesh, P()) if mesh is not None else None
        )
        sp_dev = [
            jax.device_put(jnp.asarray(s), sp_sharding)
            if sp_sharding is not None
            else jax.device_put(jnp.asarray(s))
            for s in spectra
        ]
        batched = jax.vmap(
            lambda im, sp: single(im, None, sp), in_axes=(0, None)
        )
        if mesh is None:
            jfn = jax.jit(batched)
        else:
            jfn = jax.jit(
                batched,
                in_shardings=(
                    NamedSharding(mesh, P("dp")),
                    NamedSharding(mesh, P()),
                ),
                out_shardings=NamedSharding(mesh, P("dp")),
            )
        return lambda ims, _jfn=jfn, _sp=sp_dev: _jfn(ims, _sp)
    batched = jax.vmap(single)
    if mesh is None:
        return jax.jit(batched)
    in_sharding = NamedSharding(mesh, P("dp"))
    out_sharding = NamedSharding(mesh, P("dp"))
    return jax.jit(
        batched, in_shardings=in_sharding, out_shardings=out_sharding
    )


def sharded_train_step(
    packed: PackedModel,
    imsize: Tuple[int, int],
    mesh: Mesh,
    optimizer=None,
    reg: float = 1e-4,
):
    """Build a sharded SSVM training step over the mesh.

    Shardings: images/labels batch over 'dp'; the filter bank's F axis
    over 'tp'; defs/biases replicated. Returns (jitted_step, init_fn,
    shard_params_fn).
    """
    from ..train.sgd import make_train_step

    step, opt = make_train_step(packed, imsize, optimizer, reg)

    param_spec = {
        "filters": P("tp"),
        "defs": P(),
        "biases": P(),
    }
    param_sharding = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        param_spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    data_sharding = NamedSharding(mesh, P("dp"))

    def shard_params(params):
        return jax.device_put(params, param_sharding)

    jitted = jax.jit(
        step,
        in_shardings=(param_sharding, None, data_sharding, data_sharding),
    )
    return jitted, opt, shard_params
