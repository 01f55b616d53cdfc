"""Multi-host (DCN) wiring for pod-scale data parallelism.

The reference has no distributed backend at all — its only
inter-process plumbing is ROS pub/sub (SURVEY.md §2.4). For pod-scale
batched serving or SSVM training, the TPU-native story is:

  - `jax.distributed.initialize()` once per host process (coordinator
    address + process id from the launcher environment);
  - a global (dp_hosts, dp_local, tp) mesh built from
    `jax.devices()` — which, after initialize(), spans every host's
    chips. Axis layout keeps `tp` (and the local part of `dp`) on
    ICI-adjacent devices so the all-gathers of the filter bank ride
    ICI; only the batch gradient psum crosses DCN, once per step;
  - per-host input feeding via
    `jax.make_array_from_process_local_data`, so each host loads only
    its own batch shard (no global gather on any single host).

Everything below degrades gracefully to a single process: with
num_processes == 1 the same code paths build the single-host mesh
used by parallel/mesh.py, which is how the unit tests exercise them.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for multi-host execution.

    Arguments default to the standard launcher environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as
    set by e.g. a GKE/ray launcher); on TPU pods jax can also infer
    all three from the metadata server, in which case calling with no
    arguments is correct. Returns True if a multi-process runtime was
    initialized, False when running single-process (no coordinator
    configured) — the caller can then proceed with the local mesh.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh(tp: int = 1) -> Mesh:
    """Build the global (dp, tp) mesh over every addressable device of
    every process. `tp` consecutive devices (ICI neighbors under the
    default device order) form each tensor-parallel group; the rest is
    one global data-parallel axis whose cross-host edge rides DCN.
    """
    devs = np.array(jax.devices())
    n = len(devs)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    return Mesh(devs.reshape(n // tp, tp), axis_names=("dp", "tp"))


def host_local_batch_to_global(
    mesh: Mesh, local_batch: np.ndarray
) -> jax.Array:
    """Assemble the global sharded batch from this process's shard.

    Each host passes only its local images (B_local, H, W, 3); the
    returned global array is sharded P('dp') over the full mesh with
    no host ever materializing the global batch.
    """
    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def distributed_batched_detect_fn(
    detector, imsize: Tuple[int, int], tp: int = 1
):
    """Pod-scale batched detection: returns (fn, mesh) where fn takes a
    per-host local batch and runs the globally sharded detect program.
    Outputs are P('dp')-sharded; each host reads back its own shard
    via `jax.experimental.multihost_utils` or addressable_shards.
    """
    from .mesh import batched_detect_fn

    mesh = make_global_mesh(tp=tp)
    fn = batched_detect_fn(detector, imsize, mesh)

    def run(local_batch: np.ndarray):
        return fn(host_local_batch_to_global(mesh, local_batch))

    return run, mesh


def distributed_train_step(
    packed, imsize: Tuple[int, int], tp: int = 1, **kw
):
    """Pod-scale SSVM training step: the single-host sharded step from
    parallel/mesh.py over the global mesh. Gradient psum over 'dp'
    crosses DCN once per step (inserted by GSPMD); filter-bank
    all-gathers stay inside each host's ICI domain because 'tp' groups
    are ICI-adjacent.
    """
    from .mesh import sharded_train_step

    mesh = make_global_mesh(tp=tp)
    jitted, opt, shard_params = sharded_train_step(
        packed, imsize, mesh, **kw
    )
    return jitted, opt, shard_params, mesh
